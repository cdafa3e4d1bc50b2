"""Acquire/convert the REAL IMDB dataset for the Join Order Benchmark
(ref: /root/reference/scripts/setup_imdb.py — downloads the ~1.2 GB JOB
imdb.tgz and loads it; benchmark/join_order_benchmark.cpp consumes the
resulting tables).

Two modes:

1. `--download DIR` — fetch the canonical JOB archive
   (http://homepages.cwi.nl/~boncz/job/imdb.tgz) and unpack the 21 CSVs
   into DIR.  Requires network egress; on an air-gapped machine, obtain
   imdb.tgz elsewhere and pass `--archive imdb.tgz` or drop the extracted
   CSVs in a directory for mode 2.

2. `--from-csv SRC --out DIR` — convert the 21 headerless JOB CSVs
   (escaped, comma-separated, as shipped in the archive) into the
   engine's .npz binary snapshots with the published JOB schema.  The
   output directory then runs with:

       python -m hyrise_tpu.benchmark.job_benchmark --tables DIR --verify

The synthetic generator (benchmark/job/generator.py) remains the CI
fallback when no dataset is local.
"""

from __future__ import annotations

import argparse
import os
import sys
import tarfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMDB_URL = "http://homepages.cwi.nl/~boncz/job/imdb.tgz"

# The published JOB schema (schema.sql of the benchmark; 21 tables).
# I = integer, S = text.  Column order matches the CSV column order.
SCHEMA = {
    "aka_name": [("id", "I"), ("person_id", "I"), ("name", "S"),
                 ("imdb_index", "S"), ("name_pcode_cf", "S"),
                 ("name_pcode_nf", "S"), ("surname_pcode", "S"),
                 ("md5sum", "S")],
    "aka_title": [("id", "I"), ("movie_id", "I"), ("title", "S"),
                  ("imdb_index", "S"), ("kind_id", "I"),
                  ("production_year", "I"), ("phonetic_code", "S"),
                  ("episode_of_id", "I"), ("season_nr", "I"),
                  ("episode_nr", "I"), ("note", "S"), ("md5sum", "S")],
    "cast_info": [("id", "I"), ("person_id", "I"), ("movie_id", "I"),
                  ("person_role_id", "I"), ("note", "S"), ("nr_order", "I"),
                  ("role_id", "I")],
    "char_name": [("id", "I"), ("name", "S"), ("imdb_index", "S"),
                  ("imdb_id", "I"), ("name_pcode_nf", "S"),
                  ("surname_pcode", "S"), ("md5sum", "S")],
    "comp_cast_type": [("id", "I"), ("kind", "S")],
    "company_name": [("id", "I"), ("name", "S"), ("country_code", "S"),
                     ("imdb_id", "I"), ("name_pcode_nf", "S"),
                     ("name_pcode_sf", "S"), ("md5sum", "S")],
    "company_type": [("id", "I"), ("kind", "S")],
    "complete_cast": [("id", "I"), ("movie_id", "I"), ("subject_id", "I"),
                      ("status_id", "I")],
    "info_type": [("id", "I"), ("info", "S")],
    "keyword": [("id", "I"), ("keyword", "S"), ("phonetic_code", "S")],
    "kind_type": [("id", "I"), ("kind", "S")],
    "link_type": [("id", "I"), ("link", "S")],
    "movie_companies": [("id", "I"), ("movie_id", "I"), ("company_id", "I"),
                        ("company_type_id", "I"), ("note", "S")],
    "movie_info": [("id", "I"), ("movie_id", "I"), ("info_type_id", "I"),
                   ("info", "S"), ("note", "S")],
    "movie_info_idx": [("id", "I"), ("movie_id", "I"), ("info_type_id", "I"),
                       ("info", "S"), ("note", "S")],
    "movie_keyword": [("id", "I"), ("movie_id", "I"), ("keyword_id", "I")],
    "movie_link": [("id", "I"), ("movie_id", "I"), ("linked_movie_id", "I"),
                   ("link_type_id", "I")],
    "name": [("id", "I"), ("name", "S"), ("imdb_index", "S"),
             ("imdb_id", "I"), ("gender", "S"), ("name_pcode_cf", "S"),
             ("name_pcode_nf", "S"), ("surname_pcode", "S"), ("md5sum", "S")],
    "person_info": [("id", "I"), ("person_id", "I"), ("info_type_id", "I"),
                    ("info", "S"), ("note", "S")],
    "role_type": [("id", "I"), ("role", "S")],
    "title": [("id", "I"), ("title", "S"), ("imdb_index", "S"),
              ("kind_id", "I"), ("production_year", "I"), ("imdb_id", "I"),
              ("phonetic_code", "S"), ("episode_of_id", "I"),
              ("season_nr", "I"), ("episode_nr", "I"),
              ("series_years", "S"), ("md5sum", "S")],
}


def download(out_dir: str, archive: str | None) -> str:
    os.makedirs(out_dir, exist_ok=True)
    tgz = archive or os.path.join(out_dir, "imdb.tgz")
    if not os.path.exists(tgz):
        print(f"downloading {IMDB_URL} -> {tgz} (~1.2 GB)", flush=True)
        try:
            urllib.request.urlretrieve(IMDB_URL, tgz)
        except Exception as exc:
            raise SystemExit(
                f"download failed ({exc}).  This machine may have no "
                f"network egress: fetch imdb.tgz elsewhere and re-run with "
                f"--archive imdb.tgz, or extract the CSVs and use "
                f"--from-csv."
            )
    print(f"extracting {tgz} -> {out_dir}", flush=True)
    with tarfile.open(tgz) as tf:
        tf.extractall(out_dir)
    return out_dir


def _normalize_escapes(src_path: str, dst_path: str) -> None:
    """The JOB CSVs use PostgreSQL backslash escapes (\\" inside quoted
    fields, \\\\ for a literal backslash); the engine's native parser is
    RFC 4180 (doubled quotes).  Streaming rewrite, safe across records
    with embedded newlines (replacements never span lines)."""
    ph = "\x00"
    with open(src_path, "r", newline="") as fin, \
            open(dst_path, "w", newline="") as fout:
        for line in fin:
            fout.write(
                line.replace("\\\\", ph).replace('\\"', '""')
                .replace(ph, "\\")
            )


def convert(src: str, out: str) -> None:
    import json
    import tempfile

    import jax

    jax.config.update("jax_platforms", "cpu")

    from hyrise_tpu.utils.load_table import load_csv, save_binary

    os.makedirs(out, exist_ok=True)
    for name, cols in SCHEMA.items():
        path = os.path.join(src, f"{name}.csv")
        if not os.path.exists(path):
            print(f"SKIP {name}: {path} not found", flush=True)
            continue
        t0 = time.perf_counter()
        with tempfile.TemporaryDirectory() as td:
            tmp = os.path.join(td, f"{name}.csv")
            _normalize_escapes(path, tmp)
            meta = {
                "columns": [
                    {"name": c,
                     "type": ("int" if t == "I" else "string")
                     + ("" if c == "id" else "_null")}
                    for c, t in cols
                ],
                "config": {"separator": ",", "header": False},
            }
            with open(tmp + ".json", "w") as fh:
                json.dump(meta, fh)
            table = load_csv(tmp)
        save_binary(table, os.path.join(out, f"{name}.npz"))
        print(f"{name}: {table.num_rows} rows in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
    print(f"done — run: python -m hyrise_tpu.benchmark.job_benchmark "
          f"--tables {out} --verify", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--download", metavar="DIR",
                    help="download + extract the JOB archive into DIR")
    ap.add_argument("--archive", default=None,
                    help="pre-fetched imdb.tgz to extract instead")
    ap.add_argument("--from-csv", metavar="SRC",
                    help="directory holding the 21 extracted JOB CSVs")
    ap.add_argument("--out", default="imdb_tables",
                    help="output directory for .npz snapshots")
    args = ap.parse_args()
    if args.download:
        src = download(args.download, args.archive)
        convert(src, args.out)
    elif args.from_csv:
        convert(args.from_csv, args.out)
    else:
        raise SystemExit("pass --download DIR or --from-csv SRC")


if __name__ == "__main__":
    main()
