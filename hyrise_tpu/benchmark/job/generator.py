"""Synthetic IMDB generator for the Join Order Benchmark (JOB).

The reference runs JOB on the real IMDB dump (ref:
src/benchmark/join_order_benchmark.cpp + scripts/setup_imdb.py downloads
~4 GB of data).  That dataset is not available in this environment
(zero egress), so this generator produces the SAME 21-table schema and
join graph with value domains covering the constants the query set
filters on — deep multi-join plans, string-dictionary joins and skewed
fan-outs, which is what JOB exists to stress.  When the real dataset IS
on disk, `benchmark/file_based_benchmark.py` runs the original queries
against it unchanged.

Row counts follow the real dataset's relative proportions (title 2.5M,
cast_info 36M, movie_info 15M, ... at sf=1 scaled down 10x so sf=1 is
laptop-sized; JOB has no official scale knob).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from hyrise_tpu.storage.table import Table, TableKeyConstraint
from hyrise_tpu.types import DataType

# ---- fixed dimension domains (JOB query constants live in these)

KIND_TYPES = ["movie", "tv movie", "video movie", "episode", "video game",
              "tv series", "tv mini series"]
COMPANY_TYPES = ["production companies", "distributors",
                 "special effects companies", "miscellaneous companies"]
INFO_TYPES = ["top 250 rank", "bottom 10 rank", "budget", "votes", "rating",
              "genres", "release dates", "languages", "countries", "trivia",
              "mini biography", "height", "birth notes", "gross",
              "opening weekend", "runtimes", "color info", "taglines",
              "sound mix", "camera"]
LINK_TYPES = ["follows", "followed by", "remake of", "remade as",
              "references", "referenced in", "spoofs", "spoofed in",
              "features", "featured in", "spin off from", "spin off",
              "version of", "similar to", "edited into", "edited from",
              "alternate language version of", "unknown link"]
ROLE_TYPES = ["actor", "actress", "producer", "writer", "cinematographer",
              "composer", "costume designer", "director", "editor",
              "miscellaneous crew", "production designer", "guest"]
COMP_CAST_TYPES = ["cast", "crew", "complete", "complete+verified"]
KEYWORDS = ["character-name-in-title", "superhero", "sequel",
            "based-on-novel", "based-on-comic", "marvel-cinematic-universe",
            "fight", "violence", "blood", "murder", "female-nudity",
            "hospital", "revenge", "magnet", "web", "claw", "laser",
            "10,000-mile-club", "nerd", "loner", "alienation", "dignity",
            "second-part", "computer-animation"] + [
            f"keyword-{i}" for i in range(176)]
GENRES = ["Drama", "Comedy", "Horror", "Thriller", "Sci-Fi", "Romance",
          "Action", "Crime", "Documentary", "Adventure", "Animation",
          "Murder", "Western", "Musical", "Short"]
LANGUAGES = ["English", "German", "Swedish", "French", "Japanese", "Danish",
             "Norwegian", "Spanish", "Italian"]
COUNTRIES = ["USA", "Germany", "Sweden", "UK", "France", "Japan", "Denmark",
             "Norway", "American", "Australia"]
COUNTRY_CODES = ["[us]", "[de]", "[gb]", "[nl]", "[fr]", "[jp]", "[sm]",
                 "[se]", "[pl]", "[ru]"]
COMPANY_BASES = ["Warner Bros", "Twentieth Century Fox", "Universal",
                 "Polygram", "Lionsgate", "Metro-Goldwyn-Mayer Pictures",
                 "DreamWorks", "Sokila", "YouTube", "Columbia", "Paramount",
                 "Channel 4", "independent film makers", "Canal+",
                 "Studio Babelsberg", "Shaw Brothers"]
MC_NOTES = ["(co-production)", "(presents)",
            "(as Metro-Goldwyn-Mayer Pictures)", "(VHS) (USA)", "(USA)",
            "(worldwide)", "(2006) (USA) (DVD)", "(France) (theatrical)",
            "(1994) (worldwide)", "(TV)", ""]
CI_NOTES = ["(voice)", "(voice: Japanese version)", "(voice) (uncredited)",
            "(voice: English version)", "(producer)",
            "(executive producer)", "(writer)", "(story)", "(screenplay)",
            "(head writer)", "(original author)", ""]
FIRST = ["Robert", "Tony", "Anna", "Yolanda", "Bert", "Angela", "Brad",
         "Zelda", "Ivan", "Ingrid", "Xavier", "Ann", "Yoshi", "Bianca"]
LAST = ["Downey", "Stark", "Bacall", "Zorro", "Bergman", "Xing", "Yoder",
        "Anderson", "Bell", "Brown", "Yokley", "Damme", "Arquette"]
CHAR_BASES = ["Tony Stark", "Sherlock Holmes", "Queen", "The Reporter",
              "Doctor", "Nurse", "Iron Man", "Miss Jones", "Sergeant",
              "King", "The Narrator", "Herself", "Himself"]


class IMDBTableGenerator:
    """JOB's 21-table IMDB schema, synthetically populated."""

    def __init__(self, scale_factor: float = 0.01, seed: int = 1871):
        self.sf = scale_factor
        self.rng = np.random.default_rng(seed)

    def generate(self) -> Dict[str, Table]:
        rng = self.rng
        sf = self.sf
        n_title = max(int(250_000 * sf), 400)
        n_company = max(int(23_000 * sf), 80)
        n_person = max(int(400_000 * sf), 600)
        n_char = max(int(300_000 * sf), 500)
        n_kw = len(KEYWORDS)

        tables: Dict[str, Table] = {}

        def fixed(name, col, values, extra=None):
            n = len(values)
            data = {"id": np.arange(1, n + 1, dtype=np.int32),
                    col: np.array(values)}
            types = {"id": DataType.INT, col: DataType.STRING}
            if extra:
                for k, v in extra.items():
                    data[k] = v
                    types[k] = DataType.STRING
            tables[name] = Table.from_numpy(data, types)

        fixed("kind_type", "kind", KIND_TYPES)
        fixed("company_type", "kind", COMPANY_TYPES)
        fixed("info_type", "info", INFO_TYPES)
        fixed("link_type", "link", LINK_TYPES)
        fixed("role_type", "role", ROLE_TYPES)
        fixed("comp_cast_type", "kind", COMP_CAST_TYPES)
        fixed("keyword", "keyword", KEYWORDS)

        # ---- title: years concentrated post-1990 like the real data
        year = np.where(
            rng.random(n_title) < 0.7,
            rng.integers(1990, 2011, size=n_title),
            rng.integers(1880, 1990, size=n_title),
        ).astype(np.int32)
        title_words = np.array(
            ["The Gold Rush", "Shadow of a Doubt", "Iron Man 3",
             "Champion du monde", "Dark Knight", "Money Train",
             "The Brave One", "One Night Stand", "Freddy Got Fingered",
             "Found Money"] + [f"Title {i}" for i in range(120)]
        )
        tables["title"] = Table.from_numpy(
            {
                "id": np.arange(1, n_title + 1, dtype=np.int32),
                "title": np.char.add(
                    title_words[rng.integers(0, len(title_words), n_title)],
                    np.char.add(" #", np.arange(n_title).astype(str)),
                ),
                "kind_id": rng.choice(
                    np.arange(1, len(KIND_TYPES) + 1),
                    size=n_title, p=[0.55, 0.05, 0.05, 0.2, 0.05, 0.07, 0.03]
                ).astype(np.int32),
                "production_year": year,
                "episode_nr": rng.integers(0, 100, n_title).astype(np.int32),
                "season_nr": rng.integers(0, 20, n_title).astype(np.int32),
            },
            {"id": DataType.INT, "title": DataType.STRING,
             "kind_id": DataType.INT, "production_year": DataType.INT,
             "episode_nr": DataType.INT, "season_nr": DataType.INT},
        )

        # ---- company_name
        cbase = np.array(COMPANY_BASES)
        tables["company_name"] = Table.from_numpy(
            {
                "id": np.arange(1, n_company + 1, dtype=np.int32),
                "name": np.char.add(
                    cbase[rng.integers(0, len(cbase), n_company)],
                    np.char.add(" ", np.arange(n_company).astype(str)),
                ),
                "country_code": np.array(COUNTRY_CODES)[
                    rng.choice(len(COUNTRY_CODES), size=n_company,
                               p=[0.35, 0.12, 0.1, 0.05, 0.08, 0.06, 0.04,
                                  0.05, 0.05, 0.1])
                ],
            },
            {"id": DataType.INT, "name": DataType.STRING,
             "country_code": DataType.STRING},
        )

        # ---- movie_companies (~2.4 per title)
        n_mc = int(n_title * 2.4)
        tables["movie_companies"] = Table.from_numpy(
            {
                "id": np.arange(1, n_mc + 1, dtype=np.int32),
                "movie_id": rng.integers(1, n_title + 1, n_mc).astype(np.int32),
                "company_id": rng.integers(1, n_company + 1, n_mc).astype(np.int32),
                "company_type_id": rng.choice(
                    np.arange(1, 5), size=n_mc, p=[0.45, 0.45, 0.05, 0.05]
                ).astype(np.int32),
                "note": np.array(MC_NOTES)[rng.integers(0, len(MC_NOTES), n_mc)],
            },
            {"id": DataType.INT, "movie_id": DataType.INT,
             "company_id": DataType.INT, "company_type_id": DataType.INT,
             "note": DataType.STRING},
        )

        # ---- movie_info (~5 per title) / movie_info_idx (~1.5 per title)
        n_mi = int(n_title * 5)
        it_mi = rng.choice(  # genres/release/languages/countries heavy
            np.array([6, 7, 8, 9, 3, 14, 16, 17, 10]), size=n_mi,
            p=[0.25, 0.2, 0.13, 0.13, 0.07, 0.05, 0.07, 0.05, 0.05],
        ).astype(np.int32)
        rel = np.char.add(
            np.array(COUNTRIES)[rng.integers(0, len(COUNTRIES), n_mi)],
            np.char.add(":", rng.integers(1950, 2011, n_mi).astype(str)),
        )
        info_vals = np.where(
            it_mi == 6, np.array(GENRES)[rng.integers(0, len(GENRES), n_mi)],
            np.where(
                it_mi == 7, rel,
                np.where(
                    it_mi == 8,
                    np.array(LANGUAGES)[rng.integers(0, len(LANGUAGES), n_mi)],
                    np.where(
                        it_mi == 9,
                        np.array(COUNTRIES)[
                            rng.integers(0, len(COUNTRIES), n_mi)],
                        np.where(
                            it_mi == 3,
                            np.char.add(
                                "$", (rng.integers(1, 200, n_mi)
                                      * 1_000_000).astype(str)),
                            np.char.add(
                                "misc ", rng.integers(0, 50, n_mi).astype(str)
                            ),
                        ),
                    ),
                ),
            ),
        )
        tables["movie_info"] = Table.from_numpy(
            {
                "id": np.arange(1, n_mi + 1, dtype=np.int32),
                "movie_id": rng.integers(1, n_title + 1, n_mi).astype(np.int32),
                "info_type_id": it_mi,
                "info": info_vals,
                "note": np.array(["", "(internet)", "(in-flight)"])[
                    rng.integers(0, 3, n_mi)],
            },
            {"id": DataType.INT, "movie_id": DataType.INT,
             "info_type_id": DataType.INT, "info": DataType.STRING,
             "note": DataType.STRING},
        )
        n_mix = int(n_title * 1.5)
        it_mix = rng.choice(np.array([5, 4, 1, 2]), size=n_mix,
                            p=[0.45, 0.45, 0.05, 0.05]).astype(np.int32)
        rating = np.char.add(
            rng.integers(1, 10, n_mix).astype(str),
            np.char.add(".", rng.integers(0, 10, n_mix).astype(str)),
        )
        votes = rng.integers(5, 500_000, n_mix).astype(str)
        tables["movie_info_idx"] = Table.from_numpy(
            {
                "id": np.arange(1, n_mix + 1, dtype=np.int32),
                "movie_id": rng.integers(1, n_title + 1, n_mix).astype(np.int32),
                "info_type_id": it_mix,
                "info": np.where(it_mix == 5, rating,
                                 np.where(it_mix == 4, votes,
                                          rng.integers(1, 250, n_mix).astype(str))),
            },
            {"id": DataType.INT, "movie_id": DataType.INT,
             "info_type_id": DataType.INT, "info": DataType.STRING},
        )

        # ---- movie_keyword (~3 per title, skewed to the famous keywords)
        n_mk = int(n_title * 3)
        kw_id = np.where(
            rng.random(n_mk) < 0.3, rng.integers(1, 25, n_mk),
            rng.integers(1, n_kw + 1, n_mk),
        ).astype(np.int32)
        tables["movie_keyword"] = Table.from_numpy(
            {
                "id": np.arange(1, n_mk + 1, dtype=np.int32),
                "movie_id": rng.integers(1, n_title + 1, n_mk).astype(np.int32),
                "keyword_id": kw_id,
            },
            {"id": DataType.INT, "movie_id": DataType.INT,
             "keyword_id": DataType.INT},
        )

        # ---- name / char_name
        pname = np.char.add(
            np.array(LAST)[rng.integers(0, len(LAST), n_person)],
            np.char.add(
                ", ", np.array(FIRST)[rng.integers(0, len(FIRST), n_person)]
            ),
        )
        pname = np.char.add(pname, np.char.add(" ", np.arange(n_person).astype(str)))
        gender = np.array(["m", "f", ""])[
            rng.choice(3, size=n_person, p=[0.6, 0.35, 0.05])]
        tables["name"] = Table.from_numpy(
            {"id": np.arange(1, n_person + 1, dtype=np.int32),
             "name": pname, "gender": gender,
             "name_pcode_cf": np.char.add(
                 "P", rng.integers(1000, 9999, n_person).astype(str))},
            {"id": DataType.INT, "name": DataType.STRING,
             "gender": DataType.STRING, "name_pcode_cf": DataType.STRING},
        )
        cname = np.char.add(
            np.array(CHAR_BASES)[rng.integers(0, len(CHAR_BASES), n_char)],
            np.char.add(" ", np.arange(n_char).astype(str)),
        )
        tables["char_name"] = Table.from_numpy(
            {"id": np.arange(1, n_char + 1, dtype=np.int32), "name": cname},
            {"id": DataType.INT, "name": DataType.STRING},
        )

        # ---- cast_info (~8 per title; the biggest fact, skewed persons)
        n_ci = int(n_title * 8)
        person = np.where(
            rng.random(n_ci) < 0.2,
            rng.integers(1, max(n_person // 100, 2), n_ci),  # busy actors
            rng.integers(1, n_person + 1, n_ci),
        ).astype(np.int32)
        tables["cast_info"] = Table.from_numpy(
            {
                "id": np.arange(1, n_ci + 1, dtype=np.int32),
                "movie_id": rng.integers(1, n_title + 1, n_ci).astype(np.int32),
                "person_id": person,
                "person_role_id": rng.integers(1, n_char + 1, n_ci).astype(np.int32),
                "role_id": rng.choice(
                    np.arange(1, len(ROLE_TYPES) + 1), size=n_ci,
                    p=[0.3, 0.2, 0.08, 0.08, 0.04, 0.04, 0.03, 0.06, 0.04,
                       0.08, 0.03, 0.02],
                ).astype(np.int32),
                "note": np.array(CI_NOTES)[rng.integers(0, len(CI_NOTES), n_ci)],
                "nr_order": rng.integers(1, 100, n_ci).astype(np.int32),
            },
            {"id": DataType.INT, "movie_id": DataType.INT,
             "person_id": DataType.INT, "person_role_id": DataType.INT,
             "role_id": DataType.INT, "note": DataType.STRING,
             "nr_order": DataType.INT},
        )

        # ---- aka_name / aka_title
        n_an = max(n_person // 3, 10)
        tables["aka_name"] = Table.from_numpy(
            {"id": np.arange(1, n_an + 1, dtype=np.int32),
             "person_id": rng.integers(1, n_person + 1, n_an).astype(np.int32),
             "name": np.char.add("aka ", pname[
                 rng.integers(0, n_person, n_an)])},
            {"id": DataType.INT, "person_id": DataType.INT,
             "name": DataType.STRING},
        )
        n_at = max(n_title // 5, 10)
        tables["aka_title"] = Table.from_numpy(
            {"id": np.arange(1, n_at + 1, dtype=np.int32),
             "movie_id": rng.integers(1, n_title + 1, n_at).astype(np.int32),
             "title": np.char.add("aka Title ", np.arange(n_at).astype(str))},
            {"id": DataType.INT, "movie_id": DataType.INT,
             "title": DataType.STRING},
        )

        # ---- movie_link / complete_cast / person_info
        n_ml = max(n_title // 10, 10)
        tables["movie_link"] = Table.from_numpy(
            {"id": np.arange(1, n_ml + 1, dtype=np.int32),
             "movie_id": rng.integers(1, n_title + 1, n_ml).astype(np.int32),
             "linked_movie_id": rng.integers(1, n_title + 1, n_ml).astype(np.int32),
             "link_type_id": rng.integers(1, len(LINK_TYPES) + 1, n_ml).astype(np.int32)},
            {"id": DataType.INT, "movie_id": DataType.INT,
             "linked_movie_id": DataType.INT, "link_type_id": DataType.INT},
        )
        n_cc = max(n_title // 3, 10)
        tables["complete_cast"] = Table.from_numpy(
            {"id": np.arange(1, n_cc + 1, dtype=np.int32),
             "movie_id": rng.integers(1, n_title + 1, n_cc).astype(np.int32),
             "subject_id": rng.integers(1, 3, n_cc).astype(np.int32),
             "status_id": rng.integers(3, 5, n_cc).astype(np.int32)},
            {"id": DataType.INT, "movie_id": DataType.INT,
             "subject_id": DataType.INT, "status_id": DataType.INT},
        )
        n_pi = n_person
        tables["person_info"] = Table.from_numpy(
            {"id": np.arange(1, n_pi + 1, dtype=np.int32),
             "person_id": rng.integers(1, n_person + 1, n_pi).astype(np.int32),
             "info_type_id": rng.choice(np.array([11, 10, 12, 13]), size=n_pi,
                                        p=[0.4, 0.3, 0.15, 0.15]).astype(np.int32),
             "info": np.char.add("bio ", rng.integers(0, 1000, n_pi).astype(str)),
             "note": np.array(["Volker Boehm", "", "Anonymous"])[
                 rng.choice(3, size=n_pi, p=[0.1, 0.8, 0.1])]},
            {"id": DataType.INT, "person_id": DataType.INT,
             "info_type_id": DataType.INT, "info": DataType.STRING,
             "note": DataType.STRING},
        )

        for name, t in tables.items():
            t.key_constraints.append(TableKeyConstraint(("id",), True))
        return tables

    def generate_into(self, storage_manager) -> Dict[str, Table]:
        from contextlib import nullcontext

        from hyrise_tpu.storage.column import bulk_encode
        from hyrise_tpu.storage.storage_manager import packed_encoding_enabled

        # pack host-side during generation (one upload per column, already
        # encoded) instead of re-pulling device columns in add_table
        with bulk_encode() if packed_encoding_enabled() else nullcontext():
            tables = self.generate()
        for name, t in tables.items():
            if storage_manager.has_table(name):
                storage_manager.drop_table(name)
            storage_manager.add_table(name, t, encode=True)
        return tables
