"""Join Order Benchmark queries (ref: the published JOB query set the
reference vendors in third_party/join-order-benchmark and runs via
benchmark/join_order_benchmark.cpp).

The FULL 113-query set (all 33 families with their b/c/d/e/f variants,
matching the published benchmark's per-family counts: 4+4+3+3+3+6+3+4+4+
3+4+3+4+3+4+4+6+3+4+3+3+4+3+2+3+3+3+3+3+3+3+2+3 = 113), written from the
published benchmark: every variant keeps its family's FROM list and join
graph; string constants are adapted to the synthetic IMDB generator's
value domains (generator.py) so plans exercise the same join graphs with
non-empty intermediates.  All are MIN() aggregations over 4-17-way
equi-join chains with string predicates — the join-ordering stress test.
"""

JOB_QUERIES = {
    "1a": """
SELECT MIN(mc.note) AS production_note, MIN(t.title) AS movie_title,
       MIN(t.production_year) AS movie_year
FROM company_type ct, info_type it, movie_companies mc,
     movie_info_idx mi_idx, title t
WHERE ct.kind = 'production companies'
  AND it.info = 'top 250 rank'
  AND mc.note NOT LIKE '%(as Metro-Goldwyn-Mayer Pictures)%'
  AND (mc.note LIKE '%(co-production)%' OR mc.note LIKE '%(presents)%')
  AND ct.id = mc.company_type_id
  AND t.id = mc.movie_id
  AND t.id = mi_idx.movie_id
  AND mc.movie_id = mi_idx.movie_id
  AND it.id = mi_idx.info_type_id
""",
    "2a": """
SELECT MIN(t.title) AS movie_title
FROM company_name cn, keyword k, movie_companies mc, movie_keyword mk,
     title t
WHERE cn.country_code = '[de]'
  AND k.keyword = 'character-name-in-title'
  AND cn.id = mc.company_id
  AND mc.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND mc.movie_id = mk.movie_id
""",
    "3a": """
SELECT MIN(t.title) AS movie_title
FROM keyword k, movie_info mi, movie_keyword mk, title t
WHERE k.keyword LIKE '%sequel%'
  AND mi.info IN ('Sweden', 'Norway', 'Germany', 'Denmark', 'Swedish',
                  'Danish', 'Norwegian', 'German')
  AND t.production_year > 2005
  AND t.id = mi.movie_id
  AND t.id = mk.movie_id
  AND mk.movie_id = mi.movie_id
  AND k.id = mk.keyword_id
""",
    "4a": """
SELECT MIN(mi_idx.info) AS rating, MIN(t.title) AS movie_title
FROM info_type it, keyword k, movie_info_idx mi_idx, movie_keyword mk,
     title t
WHERE it.info = 'rating'
  AND k.keyword LIKE '%sequel%'
  AND mi_idx.info > '5.0'
  AND t.production_year > 2005
  AND t.id = mi_idx.movie_id
  AND t.id = mk.movie_id
  AND mk.movie_id = mi_idx.movie_id
  AND k.id = mk.keyword_id
  AND it.id = mi_idx.info_type_id
""",
    "5a": """
SELECT MIN(t.title) AS typical_european_movie
FROM company_type ct, info_type it, movie_companies mc, movie_info mi,
     title t
WHERE ct.kind = 'production companies'
  AND mc.note LIKE '%(theatrical)%'
  AND mc.note LIKE '%(France)%'
  AND mi.info IN ('Sweden', 'Norway', 'Germany', 'Denmark', 'Swedish',
                  'Danish', 'Norwegian', 'German')
  AND t.production_year > 2005
  AND t.id = mi.movie_id
  AND t.id = mc.movie_id
  AND mc.movie_id = mi.movie_id
  AND ct.id = mc.company_type_id
  AND it.id = mi.info_type_id
""",
    "6a": """
SELECT MIN(k.keyword) AS movie_keyword, MIN(n.name) AS actor_name,
       MIN(t.title) AS marvel_movie
FROM cast_info ci, keyword k, movie_keyword mk, name n, title t
WHERE k.keyword = 'marvel-cinematic-universe'
  AND n.name LIKE '%Downey%Robert%'
  AND t.production_year > 2005
  AND k.id = mk.keyword_id
  AND t.id = mk.movie_id
  AND t.id = ci.movie_id
  AND ci.movie_id = mk.movie_id
  AND n.id = ci.person_id
""",
    "7a": """
SELECT MIN(n.name) AS of_person, MIN(t.title) AS biography_movie
FROM aka_name an, cast_info ci, info_type it, link_type lt, movie_link ml,
     name n, person_info pi, title t
WHERE an.name LIKE '%a%'
  AND it.info = 'mini biography'
  AND lt.link = 'features'
  AND n.name_pcode_cf BETWEEN 'P1' AND 'P5'
  AND (n.gender = 'm' OR (n.gender = 'f' AND n.name LIKE 'B%'))
  AND pi.note = 'Volker Boehm'
  AND t.production_year BETWEEN 1980 AND 2010
  AND n.id = an.person_id
  AND n.id = pi.person_id
  AND ci.person_id = n.id
  AND t.id = ci.movie_id
  AND ml.linked_movie_id = t.id
  AND lt.id = ml.link_type_id
  AND it.id = pi.info_type_id
  AND pi.person_id = an.person_id
  AND pi.person_id = ci.person_id
  AND an.person_id = ci.person_id
  AND ci.movie_id = ml.linked_movie_id
""",
    "8a": """
SELECT MIN(an1.name) AS actress_pseudonym, MIN(t.title) AS movie
FROM aka_name an1, cast_info ci, company_name cn, movie_companies mc,
     name n1, role_type rt, title t
WHERE ci.note = '(voice: English version)'
  AND cn.country_code = '[jp]'
  AND mc.note LIKE '%(worldwide)%'
  AND mc.note NOT LIKE '%(USA)%'
  AND n1.name LIKE '%Yo%'
  AND n1.name NOT LIKE '%Yu%'
  AND rt.role = 'actress'
  AND an1.person_id = n1.id
  AND n1.id = ci.person_id
  AND ci.movie_id = t.id
  AND t.id = mc.movie_id
  AND mc.company_id = cn.id
  AND ci.role_id = rt.id
  AND an1.person_id = ci.person_id
  AND ci.movie_id = mc.movie_id
""",
    "9a": """
SELECT MIN(an.name) AS alternative_name, MIN(chn.name) AS character_name,
       MIN(t.title) AS movie
FROM aka_name an, char_name chn, cast_info ci, company_name cn,
     movie_companies mc, name n, role_type rt, title t
WHERE ci.note IN ('(voice)', '(voice: Japanese version)',
                  '(voice) (uncredited)', '(voice: English version)')
  AND cn.country_code = '[us]'
  AND (mc.note LIKE '%(USA)%' OR mc.note LIKE '%(worldwide)%')
  AND n.gender = 'f'
  AND n.name LIKE '%Ang%'
  AND rt.role = 'actress'
  AND t.production_year BETWEEN 2005 AND 2010
  AND ci.movie_id = t.id
  AND t.id = mc.movie_id
  AND ci.movie_id = mc.movie_id
  AND mc.company_id = cn.id
  AND ci.role_id = rt.id
  AND n.id = ci.person_id
  AND chn.id = ci.person_role_id
  AND an.person_id = n.id
  AND an.person_id = ci.person_id
""",
    "10a": """
SELECT MIN(chn.name) AS uncredited_voiced_character,
       MIN(t.title) AS russian_movie
FROM char_name chn, cast_info ci, company_name cn, company_type ct,
     movie_companies mc, role_type rt, title t
WHERE ci.note LIKE '%(voice)%'
  AND ci.note LIKE '%(uncredited)%'
  AND cn.country_code = '[ru]'
  AND rt.role = 'actor'
  AND t.production_year > 2005
  AND t.id = mc.movie_id
  AND t.id = ci.movie_id
  AND ci.movie_id = mc.movie_id
  AND chn.id = ci.person_role_id
  AND rt.id = ci.role_id
  AND cn.id = mc.company_id
  AND ct.id = mc.company_type_id
""",
    "11a": """
SELECT MIN(cn.name) AS from_company, MIN(lt.link) AS movie_link_type,
       MIN(t.title) AS non_polish_sequel_movie
FROM company_name cn, company_type ct, keyword k, link_type lt,
     movie_companies mc, movie_keyword mk, movie_link ml, title t
WHERE cn.country_code <> '[pl]'
  AND (cn.name LIKE '%Warner%' OR cn.name LIKE '%Universal%')
  AND ct.kind = 'production companies'
  AND k.keyword = 'sequel'
  AND lt.link LIKE '%follow%'
  AND mc.note = ''
  AND t.production_year BETWEEN 1950 AND 2010
  AND lt.id = ml.link_type_id
  AND ml.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND t.id = mc.movie_id
  AND mc.company_type_id = ct.id
  AND mc.company_id = cn.id
  AND ml.movie_id = mk.movie_id
  AND ml.movie_id = mc.movie_id
  AND mk.movie_id = mc.movie_id
""",
    "12a": """
SELECT MIN(cn.name) AS movie_company, MIN(mi_idx.info) AS rating,
       MIN(t.title) AS drama_horror_movie
FROM company_name cn, company_type ct, info_type it1, info_type it2,
     movie_companies mc, movie_info mi, movie_info_idx mi_idx, title t
WHERE cn.country_code = '[us]'
  AND ct.kind = 'production companies'
  AND it1.info = 'genres'
  AND it2.info = 'rating'
  AND mi.info IN ('Drama', 'Horror')
  AND mi_idx.info > '8.0'
  AND t.production_year BETWEEN 2005 AND 2008
  AND t.id = mi.movie_id
  AND t.id = mi_idx.movie_id
  AND mi.info_type_id = it1.id
  AND mi_idx.info_type_id = it2.id
  AND t.id = mc.movie_id
  AND ct.id = mc.company_type_id
  AND cn.id = mc.company_id
  AND mc.movie_id = mi.movie_id
  AND mc.movie_id = mi_idx.movie_id
  AND mi.movie_id = mi_idx.movie_id
""",
    "13a": """
SELECT MIN(mi.info) AS release_date, MIN(mi_idx.info) AS rating,
       MIN(t.title) AS german_movie
FROM company_name cn, company_type ct, info_type it1, info_type it2,
     kind_type kt, movie_companies mc, movie_info mi,
     movie_info_idx mi_idx, title t
WHERE cn.country_code = '[de]'
  AND ct.kind = 'production companies'
  AND it1.info = 'rating'
  AND it2.info = 'release dates'
  AND kt.kind = 'movie'
  AND mi.movie_id = t.id
  AND it2.id = mi.info_type_id
  AND kt.id = t.kind_id
  AND mc.movie_id = t.id
  AND cn.id = mc.company_id
  AND ct.id = mc.company_type_id
  AND mi_idx.movie_id = t.id
  AND it1.id = mi_idx.info_type_id
  AND mi.movie_id = mi_idx.movie_id
  AND mi.movie_id = mc.movie_id
  AND mi_idx.movie_id = mc.movie_id
""",
    "14a": """
SELECT MIN(mi_idx.info) AS rating, MIN(t.title) AS northern_dark_movie
FROM info_type it1, info_type it2, keyword k, kind_type kt, movie_info mi,
     movie_info_idx mi_idx, movie_keyword mk, title t
WHERE it1.info = 'countries'
  AND it2.info = 'rating'
  AND k.keyword IN ('murder', 'blood', 'violence')
  AND kt.kind = 'movie'
  AND mi.info IN ('Sweden', 'Norway', 'Germany', 'Denmark', 'USA',
                  'American')
  AND mi_idx.info < '8.5'
  AND t.production_year > 2005
  AND kt.id = t.kind_id
  AND t.id = mi.movie_id
  AND t.id = mk.movie_id
  AND t.id = mi_idx.movie_id
  AND mk.movie_id = mi.movie_id
  AND mk.movie_id = mi_idx.movie_id
  AND mi.movie_id = mi_idx.movie_id
  AND k.id = mk.keyword_id
  AND it1.id = mi.info_type_id
  AND it2.id = mi_idx.info_type_id
""",
    "15a": """
SELECT MIN(mi.info) AS release_date, MIN(t.title) AS internet_movie
FROM aka_title at, company_name cn, company_type ct, info_type it1,
     keyword k, movie_companies mc, movie_info mi, movie_keyword mk,
     title t
WHERE cn.country_code = '[us]'
  AND it1.info = 'release dates'
  AND mc.note LIKE '%(200%)%'
  AND mc.note LIKE '%(USA)%'
  AND mi.note LIKE '%internet%'
  AND mi.info LIKE 'USA:200%'
  AND t.production_year > 2000
  AND t.id = at.movie_id
  AND t.id = mi.movie_id
  AND t.id = mk.movie_id
  AND t.id = mc.movie_id
  AND mk.movie_id = mi.movie_id
  AND mk.movie_id = mc.movie_id
  AND mk.movie_id = at.movie_id
  AND mi.movie_id = mc.movie_id
  AND mi.movie_id = at.movie_id
  AND mc.movie_id = at.movie_id
  AND k.id = mk.keyword_id
  AND it1.id = mi.info_type_id
  AND cn.id = mc.company_id
  AND ct.id = mc.company_type_id
""",
    "16a": """
SELECT MIN(an.name) AS cool_actor_pseudonym,
       MIN(t.title) AS series_named_after_char
FROM aka_name an, cast_info ci, company_name cn, keyword k,
     movie_companies mc, movie_keyword mk, name n, title t
WHERE cn.country_code = '[us]'
  AND k.keyword = 'character-name-in-title'
  AND t.episode_nr >= 50
  AND t.episode_nr < 100
  AND an.person_id = n.id
  AND n.id = ci.person_id
  AND ci.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND t.id = mc.movie_id
  AND mc.company_id = cn.id
  AND an.person_id = ci.person_id
  AND ci.movie_id = mc.movie_id
  AND ci.movie_id = mk.movie_id
  AND mc.movie_id = mk.movie_id
""",
    "17a": """
SELECT MIN(n.name) AS member_in_charnamed_american_movie,
       MIN(n.name) AS a1
FROM cast_info ci, company_name cn, keyword k, movie_companies mc,
     movie_keyword mk, name n, title t
WHERE cn.country_code = '[us]'
  AND k.keyword = 'character-name-in-title'
  AND n.name LIKE 'B%'
  AND n.id = ci.person_id
  AND ci.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND t.id = mc.movie_id
  AND mc.company_id = cn.id
  AND ci.movie_id = mc.movie_id
  AND ci.movie_id = mk.movie_id
  AND mc.movie_id = mk.movie_id
""",
    "19a": """
SELECT MIN(n.name) AS voicing_actress, MIN(t.title) AS voiced_movie
FROM aka_name an, char_name chn, cast_info ci, company_name cn,
     info_type it, movie_companies mc, movie_info mi, name n,
     role_type rt, title t
WHERE ci.note IN ('(voice)', '(voice: Japanese version)',
                  '(voice) (uncredited)', '(voice: English version)')
  AND cn.country_code = '[us]'
  AND it.info = 'release dates'
  AND mi.info LIKE 'USA:200%'
  AND n.gender = 'f'
  AND n.name LIKE '%Ang%'
  AND rt.role = 'actress'
  AND t.production_year BETWEEN 2005 AND 2009
  AND t.id = mi.movie_id
  AND t.id = mc.movie_id
  AND t.id = ci.movie_id
  AND mc.movie_id = ci.movie_id
  AND mc.movie_id = mi.movie_id
  AND mi.movie_id = ci.movie_id
  AND cn.id = mc.company_id
  AND it.id = mi.info_type_id
  AND n.id = ci.person_id
  AND rt.id = ci.role_id
  AND n.id = an.person_id
  AND ci.person_id = an.person_id
  AND chn.id = ci.person_role_id
""",
    "20a": """
SELECT MIN(t.title) AS complete_downey_ironman_movie
FROM complete_cast cc, comp_cast_type cct1, comp_cast_type cct2,
     char_name chn, cast_info ci, keyword k, kind_type kt,
     movie_keyword mk, name n, title t
WHERE cct1.kind = 'cast'
  AND cct2.kind LIKE '%complete%'
  AND chn.name NOT LIKE '%Sherlock%'
  AND (chn.name LIKE '%Tony%Stark%' OR chn.name LIKE '%Iron%Man%')
  AND k.keyword IN ('superhero', 'sequel', 'second-part', 'fight',
                    'violence', 'based-on-comic')
  AND kt.kind = 'movie'
  AND t.production_year > 1950
  AND kt.id = t.kind_id
  AND t.id = mk.movie_id
  AND t.id = ci.movie_id
  AND t.id = cc.movie_id
  AND mk.movie_id = ci.movie_id
  AND mk.movie_id = cc.movie_id
  AND ci.movie_id = cc.movie_id
  AND chn.id = ci.person_role_id
  AND n.id = ci.person_id
  AND k.id = mk.keyword_id
  AND cct1.id = cc.subject_id
  AND cct2.id = cc.status_id
""",
    "22a": """
SELECT MIN(cn.name) AS movie_company, MIN(mi_idx.info) AS rating,
       MIN(t.title) AS western_violent_movie
FROM company_name cn, company_type ct, info_type it1, info_type it2,
     keyword k, kind_type kt, movie_companies mc, movie_info mi,
     movie_info_idx mi_idx, movie_keyword mk, title t
WHERE cn.country_code <> '[us]'
  AND it1.info = 'countries'
  AND it2.info = 'rating'
  AND k.keyword IN ('murder', 'blood', 'violence')
  AND kt.kind IN ('movie', 'episode')
  AND mc.note NOT LIKE '%(USA)%'
  AND mc.note LIKE '%(200%)%'
  AND mi.info IN ('Germany', 'Swedish', 'German', 'USA', 'American')
  AND mi_idx.info < '7.0'
  AND t.production_year > 2005
  AND kt.id = t.kind_id
  AND t.id = mi.movie_id
  AND t.id = mk.movie_id
  AND t.id = mi_idx.movie_id
  AND t.id = mc.movie_id
  AND mk.movie_id = mi.movie_id
  AND mk.movie_id = mi_idx.movie_id
  AND mk.movie_id = mc.movie_id
  AND mi.movie_id = mi_idx.movie_id
  AND mi.movie_id = mc.movie_id
  AND mc.movie_id = mi_idx.movie_id
  AND k.id = mk.keyword_id
  AND it1.id = mi.info_type_id
  AND it2.id = mi_idx.info_type_id
  AND ct.id = mc.company_type_id
  AND cn.id = mc.company_id
""",
    "25a": """
SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
       MIN(n.name) AS male_writer, MIN(t.title) AS violent_movie_title
FROM cast_info ci, info_type it1, info_type it2, keyword k,
     movie_info mi, movie_info_idx mi_idx, movie_keyword mk, name n,
     title t
WHERE ci.note IN ('(writer)', '(head writer)', '(story)', '(screenplay)')
  AND it1.info = 'genres'
  AND it2.info = 'votes'
  AND k.keyword IN ('murder', 'blood', 'violence')
  AND mi.info = 'Horror'
  AND n.gender = 'm'
  AND t.id = mi.movie_id
  AND t.id = mi_idx.movie_id
  AND t.id = ci.movie_id
  AND t.id = mk.movie_id
  AND ci.movie_id = mi.movie_id
  AND ci.movie_id = mi_idx.movie_id
  AND ci.movie_id = mk.movie_id
  AND mi.movie_id = mi_idx.movie_id
  AND mi.movie_id = mk.movie_id
  AND mi_idx.movie_id = mk.movie_id
  AND n.id = ci.person_id
  AND it1.id = mi.info_type_id
  AND it2.id = mi_idx.info_type_id
  AND k.id = mk.keyword_id
""",
    "28a": """
SELECT MIN(cn.name) AS movie_company, MIN(mi_idx.info) AS rating,
       MIN(t.title) AS complete_euro_dark_movie
FROM complete_cast cc, comp_cast_type cct1, comp_cast_type cct2,
     company_name cn, company_type ct, info_type it1, info_type it2,
     keyword k, kind_type kt, movie_companies mc, movie_info mi,
     movie_info_idx mi_idx, movie_keyword mk, title t
WHERE cct1.kind = 'crew'
  AND cct2.kind <> 'complete+verified'
  AND cn.country_code <> '[us]'
  AND it1.info = 'countries'
  AND it2.info = 'rating'
  AND k.keyword IN ('murder', 'blood', 'violence')
  AND kt.kind IN ('movie', 'episode')
  AND mc.note NOT LIKE '%(USA)%'
  AND mc.note LIKE '%(200%)%'
  AND mi.info IN ('Sweden', 'Germany', 'Swedish', 'German', 'USA')
  AND mi_idx.info < '8.5'
  AND t.production_year > 2000
  AND kt.id = t.kind_id
  AND t.id = mi.movie_id
  AND t.id = mk.movie_id
  AND t.id = mi_idx.movie_id
  AND t.id = mc.movie_id
  AND t.id = cc.movie_id
  AND mk.movie_id = mi.movie_id
  AND mk.movie_id = mi_idx.movie_id
  AND mk.movie_id = mc.movie_id
  AND mi.movie_id = mi_idx.movie_id
  AND mi.movie_id = mc.movie_id
  AND mc.movie_id = mi_idx.movie_id
  AND k.id = mk.keyword_id
  AND it1.id = mi.info_type_id
  AND it2.id = mi_idx.info_type_id
  AND ct.id = mc.company_type_id
  AND cn.id = mc.company_id
  AND cct1.id = cc.subject_id
  AND cct2.id = cc.status_id
""",
    "31a": """
SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
       MIN(n.name) AS writer, MIN(t.title) AS violent_liongate_movie
FROM cast_info ci, company_name cn, info_type it1, info_type it2,
     keyword k, movie_companies mc, movie_info mi, movie_info_idx mi_idx,
     movie_keyword mk, name n, title t
WHERE ci.note IN ('(writer)', '(head writer)', '(story)', '(screenplay)')
  AND cn.name LIKE 'Lionsgate%'
  AND it1.info = 'genres'
  AND it2.info = 'votes'
  AND k.keyword IN ('murder', 'violence', 'blood')
  AND mi.info IN ('Horror', 'Thriller')
  AND n.gender = 'm'
  AND t.id = mi.movie_id
  AND t.id = mi_idx.movie_id
  AND t.id = ci.movie_id
  AND t.id = mk.movie_id
  AND t.id = mc.movie_id
  AND ci.movie_id = mi.movie_id
  AND ci.movie_id = mi_idx.movie_id
  AND ci.movie_id = mk.movie_id
  AND ci.movie_id = mc.movie_id
  AND mi.movie_id = mi_idx.movie_id
  AND mi.movie_id = mk.movie_id
  AND mi.movie_id = mc.movie_id
  AND mi_idx.movie_id = mk.movie_id
  AND mi_idx.movie_id = mc.movie_id
  AND mk.movie_id = mc.movie_id
  AND n.id = ci.person_id
  AND it1.id = mi.info_type_id
  AND it2.id = mi_idx.info_type_id
  AND k.id = mk.keyword_id
  AND cn.id = mc.company_id
""",
    "32a": """
SELECT MIN(lt.link) AS link_type, MIN(t1.title) AS first_movie,
       MIN(t2.title) AS second_movie
FROM keyword k, link_type lt, movie_keyword mk, movie_link ml,
     title t1, title t2
WHERE k.keyword = '10,000-mile-club'
  AND mk.keyword_id = k.id
  AND t1.id = mk.movie_id
  AND ml.movie_id = t1.id
  AND ml.linked_movie_id = t2.id
  AND lt.id = ml.link_type_id
  AND mk.movie_id = t1.id
""",
    "33a": """
SELECT MIN(cn1.name) AS first_company, MIN(cn2.name) AS second_company,
       MIN(mi_idx1.info) AS first_rating, MIN(mi_idx2.info) AS second_rating,
       MIN(t1.title) AS first_movie, MIN(t2.title) AS second_movie
FROM company_name cn1, company_name cn2, info_type it1, info_type it2,
     kind_type kt1, kind_type kt2, link_type lt, movie_companies mc1,
     movie_companies mc2, movie_info_idx mi_idx1, movie_info_idx mi_idx2,
     movie_link ml, title t1, title t2
WHERE cn1.country_code = '[us]'
  AND it1.info = 'rating'
  AND it2.info = 'rating'
  AND kt1.kind = 'tv series'
  AND kt2.kind = 'tv series'
  AND lt.link IN ('sequel', 'follows', 'followed by')
  AND mi_idx2.info < '3.0'
  AND t2.production_year BETWEEN 2000 AND 2010
  AND lt.id = ml.link_type_id
  AND t1.id = ml.movie_id
  AND t2.id = ml.linked_movie_id
  AND it1.id = mi_idx1.info_type_id
  AND t1.id = mi_idx1.movie_id
  AND kt1.id = t1.kind_id
  AND cn1.id = mc1.company_id
  AND t1.id = mc1.movie_id
  AND ml.movie_id = mi_idx1.movie_id
  AND ml.movie_id = mc1.movie_id
  AND mi_idx1.movie_id = mc1.movie_id
  AND it2.id = mi_idx2.info_type_id
  AND t2.id = mi_idx2.movie_id
  AND kt2.id = t2.kind_id
  AND cn2.id = mc2.company_id
  AND t2.id = mc2.movie_id
  AND ml.linked_movie_id = mi_idx2.movie_id
  AND ml.linked_movie_id = mc2.movie_id
  AND mi_idx2.movie_id = mc2.movie_id
""",
    # ---- family 1 variants (ct, it, mc, mi_idx, t)
    "1b": """
SELECT MIN(mc.note) AS production_note, MIN(t.title) AS movie_title,
       MIN(t.production_year) AS movie_year
FROM company_type ct, info_type it, movie_companies mc,
     movie_info_idx mi_idx, title t
WHERE ct.kind = 'production companies'
  AND it.info = 'bottom 10 rank'
  AND mc.note NOT LIKE '%(as Metro-Goldwyn-Mayer Pictures)%'
  AND t.production_year BETWEEN 2005 AND 2010
  AND ct.id = mc.company_type_id
  AND t.id = mc.movie_id
  AND t.id = mi_idx.movie_id
  AND mc.movie_id = mi_idx.movie_id
  AND it.id = mi_idx.info_type_id
""",
    "1c": """
SELECT MIN(mc.note) AS production_note, MIN(t.title) AS movie_title,
       MIN(t.production_year) AS movie_year
FROM company_type ct, info_type it, movie_companies mc,
     movie_info_idx mi_idx, title t
WHERE ct.kind = 'production companies'
  AND it.info = 'top 250 rank'
  AND mc.note NOT LIKE '%(as Metro-Goldwyn-Mayer Pictures)%'
  AND mc.note LIKE '%(co-production)%'
  AND t.production_year > 2005
  AND ct.id = mc.company_type_id
  AND t.id = mc.movie_id
  AND t.id = mi_idx.movie_id
  AND mc.movie_id = mi_idx.movie_id
  AND it.id = mi_idx.info_type_id
""",
    "1d": """
SELECT MIN(mc.note) AS production_note, MIN(t.title) AS movie_title,
       MIN(t.production_year) AS movie_year
FROM company_type ct, info_type it, movie_companies mc,
     movie_info_idx mi_idx, title t
WHERE ct.kind = 'production companies'
  AND it.info = 'bottom 10 rank'
  AND mc.note NOT LIKE '%(as Metro-Goldwyn-Mayer Pictures)%'
  AND t.production_year > 2000
  AND ct.id = mc.company_type_id
  AND t.id = mc.movie_id
  AND t.id = mi_idx.movie_id
  AND mc.movie_id = mi_idx.movie_id
  AND it.id = mi_idx.info_type_id
""",
    # ---- family 2 variants (cn, k, mc, mk, t)
    "2b": """
SELECT MIN(t.title) AS movie_title
FROM company_name cn, keyword k, movie_companies mc, movie_keyword mk,
     title t
WHERE cn.country_code = '[nl]'
  AND k.keyword = 'character-name-in-title'
  AND cn.id = mc.company_id
  AND mc.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND mc.movie_id = mk.movie_id
""",
    "2c": """
SELECT MIN(t.title) AS movie_title
FROM company_name cn, keyword k, movie_companies mc, movie_keyword mk,
     title t
WHERE cn.country_code = '[sm]'
  AND k.keyword = 'character-name-in-title'
  AND cn.id = mc.company_id
  AND mc.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND mc.movie_id = mk.movie_id
""",
    "2d": """
SELECT MIN(t.title) AS movie_title
FROM company_name cn, keyword k, movie_companies mc, movie_keyword mk,
     title t
WHERE cn.country_code = '[us]'
  AND k.keyword = 'character-name-in-title'
  AND cn.id = mc.company_id
  AND mc.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND mc.movie_id = mk.movie_id
""",
    # ---- family 3 variants (k, mi, mk, t)
    "3b": """
SELECT MIN(t.title) AS movie_title
FROM keyword k, movie_info mi, movie_keyword mk, title t
WHERE k.keyword LIKE '%sequel%'
  AND mi.info IN ('Germany', 'Sweden')
  AND t.production_year > 2005
  AND t.id = mi.movie_id
  AND t.id = mk.movie_id
  AND mk.movie_id = mi.movie_id
  AND k.id = mk.keyword_id
""",
    "3c": """
SELECT MIN(t.title) AS movie_title
FROM keyword k, movie_info mi, movie_keyword mk, title t
WHERE k.keyword LIKE '%sequel%'
  AND mi.info IN ('Sweden', 'Norway', 'Germany', 'Denmark', 'Swedish',
                  'Danish', 'Norwegian', 'German', 'USA', 'American')
  AND t.production_year > 1990
  AND t.id = mi.movie_id
  AND t.id = mk.movie_id
  AND mk.movie_id = mi.movie_id
  AND k.id = mk.keyword_id
""",
    # ---- family 4 variants (it, k, mi_idx, mk, t)
    "4b": """
SELECT MIN(mi_idx.info) AS rating, MIN(t.title) AS movie_title
FROM info_type it, keyword k, movie_info_idx mi_idx, movie_keyword mk,
     title t
WHERE it.info = 'rating'
  AND k.keyword LIKE '%sequel%'
  AND mi_idx.info > '9.0'
  AND t.production_year > 2008
  AND t.id = mi_idx.movie_id
  AND t.id = mk.movie_id
  AND mk.movie_id = mi_idx.movie_id
  AND k.id = mk.keyword_id
  AND it.id = mi_idx.info_type_id
""",
    "4c": """
SELECT MIN(mi_idx.info) AS rating, MIN(t.title) AS movie_title
FROM info_type it, keyword k, movie_info_idx mi_idx, movie_keyword mk,
     title t
WHERE it.info = 'rating'
  AND k.keyword LIKE '%sequel%'
  AND mi_idx.info > '2.0'
  AND t.production_year > 1990
  AND t.id = mi_idx.movie_id
  AND t.id = mk.movie_id
  AND mk.movie_id = mi_idx.movie_id
  AND k.id = mk.keyword_id
  AND it.id = mi_idx.info_type_id
""",
    # ---- family 5 variants (ct, it, mc, mi, t)
    "5b": """
SELECT MIN(t.title) AS american_vhs_movie
FROM company_type ct, info_type it, movie_companies mc, movie_info mi,
     title t
WHERE ct.kind = 'production companies'
  AND mc.note LIKE '%(VHS)%'
  AND mc.note LIKE '%(USA)%'
  AND mi.info IN ('USA', 'America', 'American')
  AND t.production_year > 2000
  AND t.id = mi.movie_id
  AND t.id = mc.movie_id
  AND mc.movie_id = mi.movie_id
  AND ct.id = mc.company_type_id
  AND it.id = mi.info_type_id
""",
    "5c": """
SELECT MIN(t.title) AS american_movie
FROM company_type ct, info_type it, movie_companies mc, movie_info mi,
     title t
WHERE ct.kind = 'production companies'
  AND mc.note NOT LIKE '%(TV)%'
  AND mc.note LIKE '%(USA)%'
  AND mi.info IN ('Sweden', 'Norway', 'Germany', 'Denmark', 'Swedish',
                  'Danish', 'Norwegian', 'German', 'USA', 'American')
  AND t.production_year > 1990
  AND t.id = mi.movie_id
  AND t.id = mc.movie_id
  AND mc.movie_id = mi.movie_id
  AND ct.id = mc.company_type_id
  AND it.id = mi.info_type_id
""",
    # ---- family 6 variants (ci, k, mk, n, t)
    "6b": """
SELECT MIN(k.keyword) AS movie_keyword, MIN(n.name) AS actor_name,
       MIN(t.title) AS hero_movie
FROM cast_info ci, keyword k, movie_keyword mk, name n, title t
WHERE k.keyword IN ('superhero', 'sequel', 'second-part', 'marvel-cinematic-universe',
                    'based-on-comic', 'fight', 'violence')
  AND n.name LIKE '%Downey%Robert%'
  AND t.production_year > 2005
  AND k.id = mk.keyword_id
  AND t.id = mk.movie_id
  AND t.id = ci.movie_id
  AND ci.movie_id = mk.movie_id
  AND n.id = ci.person_id
""",
    "6c": """
SELECT MIN(k.keyword) AS movie_keyword, MIN(n.name) AS actor_name,
       MIN(t.title) AS marvel_movie
FROM cast_info ci, keyword k, movie_keyword mk, name n, title t
WHERE k.keyword = 'marvel-cinematic-universe'
  AND n.name LIKE '%Downey%Robert%'
  AND t.production_year > 2009
  AND k.id = mk.keyword_id
  AND t.id = mk.movie_id
  AND t.id = ci.movie_id
  AND ci.movie_id = mk.movie_id
  AND n.id = ci.person_id
""",
    "6d": """
SELECT MIN(k.keyword) AS movie_keyword, MIN(n.name) AS actor_name,
       MIN(t.title) AS hero_movie
FROM cast_info ci, keyword k, movie_keyword mk, name n, title t
WHERE k.keyword IN ('superhero', 'sequel', 'second-part', 'marvel-cinematic-universe',
                    'based-on-comic', 'fight', 'violence')
  AND n.name LIKE '%Downey%Robert%'
  AND t.production_year > 2000
  AND k.id = mk.keyword_id
  AND t.id = mk.movie_id
  AND t.id = ci.movie_id
  AND ci.movie_id = mk.movie_id
  AND n.id = ci.person_id
""",
    "6e": """
SELECT MIN(k.keyword) AS movie_keyword, MIN(n.name) AS actor_name,
       MIN(t.title) AS marvel_movie
FROM cast_info ci, keyword k, movie_keyword mk, name n, title t
WHERE k.keyword = 'marvel-cinematic-universe'
  AND n.name LIKE '%Downey%Robert%'
  AND t.production_year > 2000
  AND k.id = mk.keyword_id
  AND t.id = mk.movie_id
  AND t.id = ci.movie_id
  AND ci.movie_id = mk.movie_id
  AND n.id = ci.person_id
""",
    "6f": """
SELECT MIN(k.keyword) AS movie_keyword, MIN(n.name) AS actor_name,
       MIN(t.title) AS hero_movie
FROM cast_info ci, keyword k, movie_keyword mk, name n, title t
WHERE k.keyword IN ('superhero', 'sequel', 'second-part', 'marvel-cinematic-universe',
                    'based-on-comic', 'fight', 'violence')
  AND t.production_year > 2000
  AND k.id = mk.keyword_id
  AND t.id = mk.movie_id
  AND t.id = ci.movie_id
  AND ci.movie_id = mk.movie_id
  AND n.id = ci.person_id
""",
    # ---- family 7 variants (an, ci, it, lt, ml, n, pi, t)
    "7b": """
SELECT MIN(n.name) AS of_person, MIN(t.title) AS biography_movie
FROM aka_name an, cast_info ci, info_type it, link_type lt, movie_link ml,
     name n, person_info pi, title t
WHERE an.name LIKE '%a%'
  AND it.info = 'mini biography'
  AND lt.link = 'features'
  AND n.name_pcode_cf LIKE 'P4%'
  AND n.gender = 'm'
  AND pi.note = 'Volker Boehm'
  AND t.production_year BETWEEN 1980 AND 1995
  AND n.id = an.person_id
  AND n.id = pi.person_id
  AND ci.person_id = n.id
  AND t.id = ci.movie_id
  AND ml.linked_movie_id = t.id
  AND lt.id = ml.link_type_id
  AND it.id = pi.info_type_id
  AND pi.person_id = an.person_id
  AND pi.person_id = ci.person_id
  AND an.person_id = ci.person_id
  AND ci.movie_id = ml.linked_movie_id
""",
    "7c": """
SELECT MIN(n.name) AS cast_member_name, MIN(pi.info) AS cast_member_info
FROM aka_name an, cast_info ci, info_type it, link_type lt, movie_link ml,
     name n, person_info pi, title t
WHERE an.name LIKE '%a%'
  AND it.info = 'mini biography'
  AND lt.link IN ('references', 'referenced in', 'features', 'featured in')
  AND n.name_pcode_cf BETWEEN 'P1' AND 'P9'
  AND (n.gender = 'm' OR (n.gender = 'f' AND n.name LIKE 'A%'))
  AND pi.note <> ''
  AND t.production_year BETWEEN 1980 AND 2010
  AND n.id = an.person_id
  AND n.id = pi.person_id
  AND ci.person_id = n.id
  AND t.id = ci.movie_id
  AND ml.linked_movie_id = t.id
  AND lt.id = ml.link_type_id
  AND it.id = pi.info_type_id
  AND pi.person_id = an.person_id
  AND pi.person_id = ci.person_id
  AND an.person_id = ci.person_id
  AND ci.movie_id = ml.linked_movie_id
""",
    # ---- family 8 variants (an1, ci, cn, mc, n1, rt, t)
    "8b": """
SELECT MIN(an1.name) AS actress_pseudonym, MIN(t.title) AS japanese_anime_movie
FROM aka_name an1, cast_info ci, company_name cn, movie_companies mc,
     name n1, role_type rt, title t
WHERE ci.note = '(voice: English version)'
  AND cn.country_code = '[jp]'
  AND mc.note LIKE '%(2006)%'
  AND mc.note LIKE '%(USA)%'
  AND n1.name LIKE '%Yo%'
  AND n1.name NOT LIKE '%Yu%'
  AND rt.role = 'actress'
  AND t.production_year BETWEEN 2000 AND 2010
  AND an1.person_id = n1.id
  AND n1.id = ci.person_id
  AND ci.movie_id = t.id
  AND t.id = mc.movie_id
  AND mc.company_id = cn.id
  AND ci.role_id = rt.id
  AND an1.person_id = ci.person_id
  AND ci.movie_id = mc.movie_id
""",
    "8c": """
SELECT MIN(an1.name) AS writer_pseudo_name, MIN(t.title) AS movie_title
FROM aka_name an1, cast_info ci, company_name cn, movie_companies mc,
     name n1, role_type rt, title t
WHERE cn.country_code = '[us]'
  AND rt.role = 'writer'
  AND an1.person_id = n1.id
  AND n1.id = ci.person_id
  AND ci.movie_id = t.id
  AND t.id = mc.movie_id
  AND mc.company_id = cn.id
  AND ci.role_id = rt.id
  AND an1.person_id = ci.person_id
  AND ci.movie_id = mc.movie_id
""",
    "8d": """
SELECT MIN(an1.name) AS costume_designer_pseudo, MIN(t.title) AS movie_with_costumes
FROM aka_name an1, cast_info ci, company_name cn, movie_companies mc,
     name n1, role_type rt, title t
WHERE cn.country_code = '[us]'
  AND rt.role = 'costume designer'
  AND an1.person_id = n1.id
  AND n1.id = ci.person_id
  AND ci.movie_id = t.id
  AND t.id = mc.movie_id
  AND mc.company_id = cn.id
  AND ci.role_id = rt.id
  AND an1.person_id = ci.person_id
  AND ci.movie_id = mc.movie_id
""",
    # ---- family 9 variants (an, chn, ci, cn, mc, n, rt, t)
    "9b": """
SELECT MIN(an.name) AS alternative_name, MIN(chn.name) AS voiced_character,
       MIN(n.name) AS voicing_actress, MIN(t.title) AS american_movie
FROM aka_name an, char_name chn, cast_info ci, company_name cn,
     movie_companies mc, name n, role_type rt, title t
WHERE ci.note = '(voice)'
  AND cn.country_code = '[us]'
  AND mc.note LIKE '%(200%)%'
  AND (mc.note LIKE '%(USA)%' OR mc.note LIKE '%(worldwide)%')
  AND n.gender = 'f'
  AND n.name LIKE '%Ang%'
  AND rt.role = 'actress'
  AND t.production_year BETWEEN 2005 AND 2015
  AND ci.movie_id = t.id
  AND t.id = mc.movie_id
  AND ci.movie_id = mc.movie_id
  AND mc.company_id = cn.id
  AND ci.role_id = rt.id
  AND n.id = ci.person_id
  AND chn.id = ci.person_role_id
  AND an.person_id = n.id
  AND an.person_id = ci.person_id
""",
    "9c": """
SELECT MIN(an.name) AS alternative_name, MIN(chn.name) AS voiced_character_name,
       MIN(n.name) AS voicing_actress, MIN(t.title) AS american_movie
FROM aka_name an, char_name chn, cast_info ci, company_name cn,
     movie_companies mc, name n, role_type rt, title t
WHERE ci.note IN ('(voice)', '(voice: Japanese version)',
                  '(voice) (uncredited)', '(voice: English version)')
  AND cn.country_code = '[us]'
  AND n.gender = 'f'
  AND n.name LIKE '%An%'
  AND rt.role = 'actress'
  AND ci.movie_id = t.id
  AND t.id = mc.movie_id
  AND ci.movie_id = mc.movie_id
  AND mc.company_id = cn.id
  AND ci.role_id = rt.id
  AND n.id = ci.person_id
  AND chn.id = ci.person_role_id
  AND an.person_id = n.id
  AND an.person_id = ci.person_id
""",
    "9d": """
SELECT MIN(an.name) AS alternative_name, MIN(chn.name) AS voiced_char_name,
       MIN(n.name) AS voicing_actress, MIN(t.title) AS american_movie
FROM aka_name an, char_name chn, cast_info ci, company_name cn,
     movie_companies mc, name n, role_type rt, title t
WHERE ci.note IN ('(voice)', '(voice: Japanese version)',
                  '(voice) (uncredited)', '(voice: English version)')
  AND cn.country_code = '[us]'
  AND n.gender = 'f'
  AND rt.role = 'actress'
  AND ci.movie_id = t.id
  AND t.id = mc.movie_id
  AND ci.movie_id = mc.movie_id
  AND mc.company_id = cn.id
  AND ci.role_id = rt.id
  AND n.id = ci.person_id
  AND chn.id = ci.person_role_id
  AND an.person_id = n.id
  AND an.person_id = ci.person_id
""",
    # ---- family 10 variants (chn, ci, cn, ct, mc, rt, t)
    "10b": """
SELECT MIN(chn.name) AS character, MIN(t.title) AS russian_mov_with_actor_producer
FROM char_name chn, cast_info ci, company_name cn, company_type ct,
     movie_companies mc, role_type rt, title t
WHERE ci.note LIKE '%(producer)%'
  AND cn.country_code = '[ru]'
  AND rt.role = 'actor'
  AND t.production_year > 2005
  AND t.id = mc.movie_id
  AND t.id = ci.movie_id
  AND ci.movie_id = mc.movie_id
  AND chn.id = ci.person_role_id
  AND rt.id = ci.role_id
  AND cn.id = mc.company_id
  AND ct.id = mc.company_type_id
""",
    "10c": """
SELECT MIN(chn.name) AS character, MIN(t.title) AS movie_with_american_producer
FROM char_name chn, cast_info ci, company_name cn, company_type ct,
     movie_companies mc, role_type rt, title t
WHERE ci.note LIKE '%(producer)%'
  AND cn.country_code = '[us]'
  AND t.production_year > 1990
  AND t.id = mc.movie_id
  AND t.id = ci.movie_id
  AND ci.movie_id = mc.movie_id
  AND chn.id = ci.person_role_id
  AND rt.id = ci.role_id
  AND cn.id = mc.company_id
  AND ct.id = mc.company_type_id
""",
    # ---- family 11 variants (cn, ct, k, lt, mc, mk, ml, t)
    "11b": """
SELECT MIN(cn.name) AS from_company, MIN(lt.link) AS movie_link_type,
       MIN(t.title) AS sequel_movie
FROM company_name cn, company_type ct, keyword k, link_type lt,
     movie_companies mc, movie_keyword mk, movie_link ml, title t
WHERE cn.country_code <> '[pl]'
  AND (cn.name LIKE '%Warner%' OR cn.name LIKE '%Universal%')
  AND ct.kind = 'production companies'
  AND k.keyword = 'sequel'
  AND lt.link LIKE '%follows%'
  AND mc.note = ''
  AND t.production_year BETWEEN 1990 AND 2010
  AND lt.id = ml.link_type_id
  AND ml.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND t.id = mc.movie_id
  AND mc.company_type_id = ct.id
  AND mc.company_id = cn.id
  AND ml.movie_id = mk.movie_id
  AND ml.movie_id = mc.movie_id
  AND mk.movie_id = mc.movie_id
""",
    "11c": """
SELECT MIN(cn.name) AS from_company, MIN(mc.note) AS production_note,
       MIN(t.title) AS movie_based_on_book
FROM company_name cn, company_type ct, keyword k, link_type lt,
     movie_companies mc, movie_keyword mk, movie_link ml, title t
WHERE cn.country_code <> '[pl]'
  AND (cn.name LIKE 'Twentieth Century Fox%' OR cn.name LIKE 'Warner%')
  AND ct.kind <> 'production companies'
  AND k.keyword IN ('sequel', 'revenge', 'based-on-novel')
  AND mc.note <> ''
  AND t.production_year > 1950
  AND lt.id = ml.link_type_id
  AND ml.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND t.id = mc.movie_id
  AND mc.company_type_id = ct.id
  AND mc.company_id = cn.id
  AND ml.movie_id = mk.movie_id
  AND ml.movie_id = mc.movie_id
  AND mk.movie_id = mc.movie_id
""",
    "11d": """
SELECT MIN(cn.name) AS from_company, MIN(mc.note) AS production_note,
       MIN(t.title) AS movie_based_on_book
FROM company_name cn, company_type ct, keyword k, link_type lt,
     movie_companies mc, movie_keyword mk, movie_link ml, title t
WHERE cn.country_code <> '[pl]'
  AND ct.kind <> 'production companies'
  AND k.keyword IN ('sequel', 'revenge', 'based-on-novel')
  AND mc.note <> ''
  AND t.production_year > 1950
  AND lt.id = ml.link_type_id
  AND ml.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND t.id = mc.movie_id
  AND mc.company_type_id = ct.id
  AND mc.company_id = cn.id
  AND ml.movie_id = mk.movie_id
  AND ml.movie_id = mc.movie_id
  AND mk.movie_id = mc.movie_id
""",
    # ---- family 12 variants (cn, ct, it1, it2, mc, mi, mi_idx, t)
    "12b": """
SELECT MIN(mi.info) AS budget, MIN(t.title) AS unsuccsessful_movie
FROM company_name cn, company_type ct, info_type it1, info_type it2,
     movie_companies mc, movie_info mi, movie_info_idx mi_idx, title t
WHERE cn.country_code = '[us]'
  AND ct.kind IN ('production companies', 'distributors')
  AND it1.info = 'budget'
  AND it2.info = 'bottom 10 rank'
  AND t.production_year > 2000
  AND (t.title LIKE '%Money%' OR t.title LIKE '%Freddy%')
  AND t.id = mi.movie_id
  AND t.id = mi_idx.movie_id
  AND mi.info_type_id = it1.id
  AND mi_idx.info_type_id = it2.id
  AND t.id = mc.movie_id
  AND ct.id = mc.company_type_id
  AND cn.id = mc.company_id
  AND mc.movie_id = mi.movie_id
  AND mc.movie_id = mi_idx.movie_id
  AND mi.movie_id = mi_idx.movie_id
""",
    "12c": """
SELECT MIN(cn.name) AS movie_company, MIN(mi_idx.info) AS rating,
       MIN(t.title) AS mainstream_movie
FROM company_name cn, company_type ct, info_type it1, info_type it2,
     movie_companies mc, movie_info mi, movie_info_idx mi_idx, title t
WHERE cn.country_code = '[us]'
  AND ct.kind = 'production companies'
  AND it1.info = 'genres'
  AND it2.info = 'rating'
  AND mi.info IN ('Drama', 'Horror', 'Western', 'Comedy')
  AND mi_idx.info > '7.0'
  AND t.production_year BETWEEN 2000 AND 2010
  AND t.id = mi.movie_id
  AND t.id = mi_idx.movie_id
  AND mi.info_type_id = it1.id
  AND mi_idx.info_type_id = it2.id
  AND t.id = mc.movie_id
  AND ct.id = mc.company_type_id
  AND cn.id = mc.company_id
  AND mc.movie_id = mi.movie_id
  AND mc.movie_id = mi_idx.movie_id
  AND mi.movie_id = mi_idx.movie_id
""",
    # ---- family 13 variants (cn, ct, it1, it2, kt, mc, mi, mi_idx, t)
    "13b": """
SELECT MIN(mi.info) AS release_date, MIN(mi_idx.info) AS rating,
       MIN(t.title) AS american_movie
FROM company_name cn, company_type ct, info_type it1, info_type it2,
     kind_type kt, movie_companies mc, movie_info mi,
     movie_info_idx mi_idx, title t
WHERE cn.country_code = '[us]'
  AND ct.kind = 'production companies'
  AND it1.info = 'rating'
  AND it2.info = 'release dates'
  AND kt.kind = 'movie'
  AND (t.title LIKE '%Champion%' OR t.title LIKE '%Money%')
  AND mi.movie_id = t.id
  AND it2.id = mi.info_type_id
  AND kt.id = t.kind_id
  AND mc.movie_id = t.id
  AND cn.id = mc.company_id
  AND ct.id = mc.company_type_id
  AND mi_idx.movie_id = t.id
  AND it1.id = mi_idx.info_type_id
  AND mi.movie_id = mi_idx.movie_id
  AND mi.movie_id = mc.movie_id
  AND mi_idx.movie_id = mc.movie_id
""",
    "13c": """
SELECT MIN(mi.info) AS release_date, MIN(mi_idx.info) AS rating,
       MIN(t.title) AS american_movie
FROM company_name cn, company_type ct, info_type it1, info_type it2,
     kind_type kt, movie_companies mc, movie_info mi,
     movie_info_idx mi_idx, title t
WHERE cn.country_code = '[us]'
  AND ct.kind = 'production companies'
  AND it1.info = 'rating'
  AND it2.info = 'release dates'
  AND kt.kind = 'movie'
  AND (t.title LIKE 'Champion%' OR t.title LIKE 'Money%')
  AND mi.movie_id = t.id
  AND it2.id = mi.info_type_id
  AND kt.id = t.kind_id
  AND mc.movie_id = t.id
  AND cn.id = mc.company_id
  AND ct.id = mc.company_type_id
  AND mi_idx.movie_id = t.id
  AND it1.id = mi_idx.info_type_id
  AND mi.movie_id = mi_idx.movie_id
  AND mi.movie_id = mc.movie_id
  AND mi_idx.movie_id = mc.movie_id
""",
    "13d": """
SELECT MIN(cn.name) AS producing_company, MIN(mi.info) AS release_date,
       MIN(mi_idx.info) AS rating, MIN(t.title) AS movie
FROM company_name cn, company_type ct, info_type it1, info_type it2,
     kind_type kt, movie_companies mc, movie_info mi,
     movie_info_idx mi_idx, title t
WHERE cn.country_code = '[us]'
  AND ct.kind = 'production companies'
  AND it1.info = 'rating'
  AND it2.info = 'release dates'
  AND kt.kind = 'movie'
  AND mi.movie_id = t.id
  AND it2.id = mi.info_type_id
  AND kt.id = t.kind_id
  AND mc.movie_id = t.id
  AND cn.id = mc.company_id
  AND ct.id = mc.company_type_id
  AND mi_idx.movie_id = t.id
  AND it1.id = mi_idx.info_type_id
  AND mi.movie_id = mi_idx.movie_id
  AND mi.movie_id = mc.movie_id
  AND mi_idx.movie_id = mc.movie_id
""",
    # ---- family 14 variants (it1, it2, k, kt, mi, mi_idx, mk, t)
    "14b": """
SELECT MIN(mi_idx.info) AS rating, MIN(t.title) AS western_dark_production
FROM info_type it1, info_type it2, keyword k, kind_type kt, movie_info mi,
     movie_info_idx mi_idx, movie_keyword mk, title t
WHERE it1.info = 'countries'
  AND it2.info = 'rating'
  AND k.keyword IN ('murder', 'blood', 'violence')
  AND kt.kind = 'movie'
  AND mi.info IN ('Sweden', 'Norway', 'Germany', 'Denmark', 'USA',
                  'American')
  AND mi_idx.info > '6.0'
  AND t.production_year > 2005
  AND (t.title LIKE '%Money%' OR t.title LIKE '%Dark%')
  AND kt.id = t.kind_id
  AND t.id = mi.movie_id
  AND t.id = mk.movie_id
  AND t.id = mi_idx.movie_id
  AND mk.movie_id = mi.movie_id
  AND mk.movie_id = mi_idx.movie_id
  AND mi.movie_id = mi_idx.movie_id
  AND k.id = mk.keyword_id
  AND it1.id = mi.info_type_id
  AND it2.id = mi_idx.info_type_id
""",
    "14c": """
SELECT MIN(mi_idx.info) AS rating, MIN(t.title) AS north_european_dark_production
FROM info_type it1, info_type it2, keyword k, kind_type kt, movie_info mi,
     movie_info_idx mi_idx, movie_keyword mk, title t
WHERE it1.info = 'countries'
  AND it2.info = 'rating'
  AND k.keyword IN ('murder', 'blood', 'violence', 'revenge', 'fight')
  AND kt.kind IN ('movie', 'episode')
  AND mi.info IN ('Sweden', 'Norway', 'Germany', 'Denmark', 'USA',
                  'American', 'Swedish', 'Danish', 'Norwegian', 'German')
  AND mi_idx.info < '8.5'
  AND t.production_year > 1990
  AND kt.id = t.kind_id
  AND t.id = mi.movie_id
  AND t.id = mk.movie_id
  AND t.id = mi_idx.movie_id
  AND mk.movie_id = mi.movie_id
  AND mk.movie_id = mi_idx.movie_id
  AND mi.movie_id = mi_idx.movie_id
  AND k.id = mk.keyword_id
  AND it1.id = mi.info_type_id
  AND it2.id = mi_idx.info_type_id
""",
    # ---- family 15 variants (at, cn, ct, it1, k, mc, mi, mk, t)
    "15b": """
SELECT MIN(mi.info) AS release_date, MIN(t.title) AS youtube_movie
FROM aka_title at, company_name cn, company_type ct, info_type it1,
     keyword k, movie_companies mc, movie_info mi, movie_keyword mk,
     title t
WHERE cn.country_code = '[us]'
  AND cn.name LIKE 'YouTube%'
  AND it1.info = 'release dates'
  AND mc.note LIKE '%(200%)%'
  AND mc.note LIKE '%(worldwide)%'
  AND mi.note LIKE '%internet%'
  AND mi.info LIKE 'USA:200%'
  AND t.production_year BETWEEN 2005 AND 2010
  AND t.id = at.movie_id
  AND t.id = mi.movie_id
  AND t.id = mk.movie_id
  AND t.id = mc.movie_id
  AND mk.movie_id = mi.movie_id
  AND mk.movie_id = mc.movie_id
  AND mk.movie_id = at.movie_id
  AND mi.movie_id = mc.movie_id
  AND mi.movie_id = at.movie_id
  AND mc.movie_id = at.movie_id
  AND k.id = mk.keyword_id
  AND it1.id = mi.info_type_id
  AND cn.id = mc.company_id
  AND ct.id = mc.company_type_id
""",
    "15c": """
SELECT MIN(mi.info) AS release_date, MIN(t.title) AS modern_american_internet_movie
FROM aka_title at, company_name cn, company_type ct, info_type it1,
     keyword k, movie_companies mc, movie_info mi, movie_keyword mk,
     title t
WHERE cn.country_code = '[us]'
  AND it1.info = 'release dates'
  AND mi.note LIKE '%internet%'
  AND mi.info LIKE 'USA:%'
  AND t.production_year > 1990
  AND t.id = at.movie_id
  AND t.id = mi.movie_id
  AND t.id = mk.movie_id
  AND t.id = mc.movie_id
  AND mk.movie_id = mi.movie_id
  AND mk.movie_id = mc.movie_id
  AND mk.movie_id = at.movie_id
  AND mi.movie_id = mc.movie_id
  AND mi.movie_id = at.movie_id
  AND mc.movie_id = at.movie_id
  AND k.id = mk.keyword_id
  AND it1.id = mi.info_type_id
  AND cn.id = mc.company_id
  AND ct.id = mc.company_type_id
""",
    "15d": """
SELECT MIN(at.title) AS aka_title, MIN(t.title) AS internet_movie_title
FROM aka_title at, company_name cn, company_type ct, info_type it1,
     keyword k, movie_companies mc, movie_info mi, movie_keyword mk,
     title t
WHERE cn.country_code = '[us]'
  AND it1.info = 'release dates'
  AND mi.note LIKE '%internet%'
  AND t.production_year > 1990
  AND t.id = at.movie_id
  AND t.id = mi.movie_id
  AND t.id = mk.movie_id
  AND t.id = mc.movie_id
  AND mk.movie_id = mi.movie_id
  AND mk.movie_id = mc.movie_id
  AND mk.movie_id = at.movie_id
  AND mi.movie_id = mc.movie_id
  AND mi.movie_id = at.movie_id
  AND mc.movie_id = at.movie_id
  AND k.id = mk.keyword_id
  AND it1.id = mi.info_type_id
  AND cn.id = mc.company_id
  AND ct.id = mc.company_type_id
""",
    # ---- family 16 variants (an, ci, cn, k, mc, mk, n, t)
    "16b": """
SELECT MIN(an.name) AS cool_actor_pseudonym,
       MIN(t.title) AS series_named_after_char
FROM aka_name an, cast_info ci, company_name cn, keyword k,
     movie_companies mc, movie_keyword mk, name n, title t
WHERE cn.country_code = '[de]'
  AND k.keyword = 'character-name-in-title'
  AND an.person_id = n.id
  AND n.id = ci.person_id
  AND ci.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND t.id = mc.movie_id
  AND mc.company_id = cn.id
  AND an.person_id = ci.person_id
  AND ci.movie_id = mc.movie_id
  AND ci.movie_id = mk.movie_id
  AND mc.movie_id = mk.movie_id
""",
    "16c": """
SELECT MIN(an.name) AS cool_actor_pseudonym,
       MIN(t.title) AS series_named_after_char
FROM aka_name an, cast_info ci, company_name cn, keyword k,
     movie_companies mc, movie_keyword mk, name n, title t
WHERE cn.country_code = '[us]'
  AND k.keyword = 'character-name-in-title'
  AND t.episode_nr < 100
  AND an.person_id = n.id
  AND n.id = ci.person_id
  AND ci.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND t.id = mc.movie_id
  AND mc.company_id = cn.id
  AND an.person_id = ci.person_id
  AND ci.movie_id = mc.movie_id
  AND ci.movie_id = mk.movie_id
  AND mc.movie_id = mk.movie_id
""",
    "16d": """
SELECT MIN(an.name) AS cool_actor_pseudonym,
       MIN(t.title) AS series_named_after_char
FROM aka_name an, cast_info ci, company_name cn, keyword k,
     movie_companies mc, movie_keyword mk, name n, title t
WHERE cn.country_code = '[us]'
  AND k.keyword = 'character-name-in-title'
  AND t.episode_nr >= 5
  AND t.episode_nr < 100
  AND an.person_id = n.id
  AND n.id = ci.person_id
  AND ci.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND t.id = mc.movie_id
  AND mc.company_id = cn.id
  AND an.person_id = ci.person_id
  AND ci.movie_id = mc.movie_id
  AND ci.movie_id = mk.movie_id
  AND mc.movie_id = mk.movie_id
""",
    # ---- family 17 variants (ci, cn, k, mc, mk, n, t)
    "17b": """
SELECT MIN(n.name) AS member_in_charnamed_movie, MIN(n.name) AS a1
FROM cast_info ci, company_name cn, keyword k, movie_companies mc,
     movie_keyword mk, name n, title t
WHERE k.keyword = 'character-name-in-title'
  AND n.name LIKE 'Z%'
  AND n.id = ci.person_id
  AND ci.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND t.id = mc.movie_id
  AND mc.company_id = cn.id
  AND ci.movie_id = mc.movie_id
  AND ci.movie_id = mk.movie_id
  AND mc.movie_id = mk.movie_id
""",
    "17c": """
SELECT MIN(n.name) AS member_in_charnamed_movie, MIN(n.name) AS a1
FROM cast_info ci, company_name cn, keyword k, movie_companies mc,
     movie_keyword mk, name n, title t
WHERE k.keyword = 'character-name-in-title'
  AND n.name LIKE 'X%'
  AND n.id = ci.person_id
  AND ci.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND t.id = mc.movie_id
  AND mc.company_id = cn.id
  AND ci.movie_id = mc.movie_id
  AND ci.movie_id = mk.movie_id
  AND mc.movie_id = mk.movie_id
""",
    "17d": """
SELECT MIN(n.name) AS member_in_charnamed_movie
FROM cast_info ci, company_name cn, keyword k, movie_companies mc,
     movie_keyword mk, name n, title t
WHERE k.keyword = 'character-name-in-title'
  AND n.name LIKE '%Bert%'
  AND n.id = ci.person_id
  AND ci.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND t.id = mc.movie_id
  AND mc.company_id = cn.id
  AND ci.movie_id = mc.movie_id
  AND ci.movie_id = mk.movie_id
  AND mc.movie_id = mk.movie_id
""",
    "17e": """
SELECT MIN(n.name) AS member_in_charnamed_movie
FROM cast_info ci, company_name cn, keyword k, movie_companies mc,
     movie_keyword mk, name n, title t
WHERE cn.country_code = '[us]'
  AND k.keyword = 'character-name-in-title'
  AND n.id = ci.person_id
  AND ci.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND t.id = mc.movie_id
  AND mc.company_id = cn.id
  AND ci.movie_id = mc.movie_id
  AND ci.movie_id = mk.movie_id
  AND mc.movie_id = mk.movie_id
""",
    "17f": """
SELECT MIN(n.name) AS member_in_charnamed_movie
FROM cast_info ci, company_name cn, keyword k, movie_companies mc,
     movie_keyword mk, name n, title t
WHERE k.keyword = 'character-name-in-title'
  AND n.name LIKE '%B%'
  AND n.id = ci.person_id
  AND ci.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND t.id = mc.movie_id
  AND mc.company_id = cn.id
  AND ci.movie_id = mc.movie_id
  AND ci.movie_id = mk.movie_id
  AND mc.movie_id = mk.movie_id
""",
    # ---- family 18 (ci, it1, it2, mi, mi_idx, n, t)
    "18a": """
SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
       MIN(t.title) AS movie_title
FROM cast_info ci, info_type it1, info_type it2, movie_info mi,
     movie_info_idx mi_idx, name n, title t
WHERE ci.note IN ('(producer)', '(executive producer)')
  AND it1.info = 'budget'
  AND it2.info = 'votes'
  AND n.gender = 'm'
  AND n.name LIKE '%Tony%'
  AND t.id = mi.movie_id
  AND t.id = mi_idx.movie_id
  AND t.id = ci.movie_id
  AND ci.movie_id = mi.movie_id
  AND ci.movie_id = mi_idx.movie_id
  AND mi.movie_id = mi_idx.movie_id
  AND n.id = ci.person_id
  AND it1.id = mi.info_type_id
  AND it2.id = mi_idx.info_type_id
""",
    "18b": """
SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
       MIN(t.title) AS movie_title
FROM cast_info ci, info_type it1, info_type it2, movie_info mi,
     movie_info_idx mi_idx, name n, title t
WHERE ci.note IN ('(writer)', '(head writer)', '(story)', '(screenplay)')
  AND it1.info = 'genres'
  AND it2.info = 'rating'
  AND mi.info IN ('Horror', 'Thriller')
  AND mi_idx.info > '8.0'
  AND n.gender = 'f'
  AND t.production_year BETWEEN 2005 AND 2010
  AND t.id = mi.movie_id
  AND t.id = mi_idx.movie_id
  AND t.id = ci.movie_id
  AND ci.movie_id = mi.movie_id
  AND ci.movie_id = mi_idx.movie_id
  AND mi.movie_id = mi_idx.movie_id
  AND n.id = ci.person_id
  AND it1.id = mi.info_type_id
  AND it2.id = mi_idx.info_type_id
""",
    "18c": """
SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
       MIN(t.title) AS movie_title
FROM cast_info ci, info_type it1, info_type it2, movie_info mi,
     movie_info_idx mi_idx, name n, title t
WHERE ci.note IN ('(writer)', '(head writer)', '(story)', '(screenplay)')
  AND it1.info = 'genres'
  AND it2.info = 'votes'
  AND mi.info IN ('Horror', 'Action', 'Sci-Fi', 'Thriller', 'Crime',
                  'Western')
  AND n.gender = 'm'
  AND t.id = mi.movie_id
  AND t.id = mi_idx.movie_id
  AND t.id = ci.movie_id
  AND ci.movie_id = mi.movie_id
  AND ci.movie_id = mi_idx.movie_id
  AND mi.movie_id = mi_idx.movie_id
  AND n.id = ci.person_id
  AND it1.id = mi.info_type_id
  AND it2.id = mi_idx.info_type_id
""",
    # ---- family 19 variants (an, chn, ci, cn, it, mc, mi, n, rt, t)
    "19b": """
SELECT MIN(n.name) AS voicing_actress, MIN(t.title) AS kung_fu_panda
FROM aka_name an, char_name chn, cast_info ci, company_name cn,
     info_type it, movie_companies mc, movie_info mi, name n,
     role_type rt, title t
WHERE ci.note = '(voice)'
  AND cn.country_code = '[us]'
  AND it.info = 'release dates'
  AND mc.note LIKE '%(200%)%'
  AND (mc.note LIKE '%(USA)%' OR mc.note LIKE '%(worldwide)%')
  AND mi.info LIKE 'USA:200%'
  AND n.gender = 'f'
  AND n.name LIKE '%Ang%'
  AND rt.role = 'actress'
  AND t.production_year BETWEEN 2006 AND 2010
  AND t.id = mi.movie_id
  AND t.id = mc.movie_id
  AND t.id = ci.movie_id
  AND mc.movie_id = ci.movie_id
  AND mc.movie_id = mi.movie_id
  AND mi.movie_id = ci.movie_id
  AND cn.id = mc.company_id
  AND it.id = mi.info_type_id
  AND n.id = ci.person_id
  AND rt.id = ci.role_id
  AND n.id = an.person_id
  AND ci.person_id = an.person_id
  AND chn.id = ci.person_role_id
""",
    "19c": """
SELECT MIN(n.name) AS voicing_actress, MIN(t.title) AS jap_engl_voiced_movie
FROM aka_name an, char_name chn, cast_info ci, company_name cn,
     info_type it, movie_companies mc, movie_info mi, name n,
     role_type rt, title t
WHERE ci.note IN ('(voice)', '(voice: Japanese version)',
                  '(voice) (uncredited)', '(voice: English version)')
  AND cn.country_code = '[us]'
  AND it.info = 'release dates'
  AND mi.info LIKE 'USA:200%'
  AND n.gender = 'f'
  AND n.name LIKE '%An%'
  AND rt.role = 'actress'
  AND t.production_year > 2000
  AND t.id = mi.movie_id
  AND t.id = mc.movie_id
  AND t.id = ci.movie_id
  AND mc.movie_id = ci.movie_id
  AND mc.movie_id = mi.movie_id
  AND mi.movie_id = ci.movie_id
  AND cn.id = mc.company_id
  AND it.id = mi.info_type_id
  AND n.id = ci.person_id
  AND rt.id = ci.role_id
  AND n.id = an.person_id
  AND ci.person_id = an.person_id
  AND chn.id = ci.person_role_id
""",
    "19d": """
SELECT MIN(n.name) AS voicing_actress, MIN(t.title) AS jap_engl_voiced_movie
FROM aka_name an, char_name chn, cast_info ci, company_name cn,
     info_type it, movie_companies mc, movie_info mi, name n,
     role_type rt, title t
WHERE ci.note IN ('(voice)', '(voice: Japanese version)',
                  '(voice) (uncredited)', '(voice: English version)')
  AND cn.country_code = '[us]'
  AND it.info = 'release dates'
  AND n.gender = 'f'
  AND rt.role = 'actress'
  AND t.production_year > 2000
  AND t.id = mi.movie_id
  AND t.id = mc.movie_id
  AND t.id = ci.movie_id
  AND mc.movie_id = ci.movie_id
  AND mc.movie_id = mi.movie_id
  AND mi.movie_id = ci.movie_id
  AND cn.id = mc.company_id
  AND it.id = mi.info_type_id
  AND n.id = ci.person_id
  AND rt.id = ci.role_id
  AND n.id = an.person_id
  AND ci.person_id = an.person_id
  AND chn.id = ci.person_role_id
""",
    # ---- family 20 variants (cc, cct1, cct2, chn, ci, k, kt, mk, n, t)
    "20b": """
SELECT MIN(t.title) AS complete_downey_ironman_movie
FROM complete_cast cc, comp_cast_type cct1, comp_cast_type cct2,
     char_name chn, cast_info ci, keyword k, kind_type kt,
     movie_keyword mk, name n, title t
WHERE cct1.kind = 'cast'
  AND cct2.kind LIKE '%complete%'
  AND chn.name NOT LIKE '%Sherlock%'
  AND (chn.name LIKE '%Tony%Stark%' OR chn.name LIKE '%Iron%Man%')
  AND k.keyword IN ('superhero', 'sequel', 'second-part', 'fight',
                    'violence', 'based-on-comic')
  AND kt.kind = 'movie'
  AND n.name LIKE '%Downey%Robert%'
  AND t.production_year > 2000
  AND kt.id = t.kind_id
  AND t.id = mk.movie_id
  AND t.id = ci.movie_id
  AND t.id = cc.movie_id
  AND mk.movie_id = ci.movie_id
  AND mk.movie_id = cc.movie_id
  AND ci.movie_id = cc.movie_id
  AND chn.id = ci.person_role_id
  AND n.id = ci.person_id
  AND k.id = mk.keyword_id
  AND cct1.id = cc.subject_id
  AND cct2.id = cc.status_id
""",
    "20c": """
SELECT MIN(n.name) AS cast_member, MIN(t.title) AS complete_dynamic_hero_movie
FROM complete_cast cc, comp_cast_type cct1, comp_cast_type cct2,
     char_name chn, cast_info ci, keyword k, kind_type kt,
     movie_keyword mk, name n, title t
WHERE cct1.kind = 'cast'
  AND cct2.kind LIKE '%complete%'
  AND chn.name LIKE '%man%'
  AND k.keyword IN ('superhero', 'marvel-cinematic-universe', 'sequel',
                    'second-part', 'fight', 'violence', 'magnet', 'web',
                    'claw', 'laser')
  AND kt.kind = 'movie'
  AND t.production_year > 2000
  AND kt.id = t.kind_id
  AND t.id = mk.movie_id
  AND t.id = ci.movie_id
  AND t.id = cc.movie_id
  AND mk.movie_id = ci.movie_id
  AND mk.movie_id = cc.movie_id
  AND ci.movie_id = cc.movie_id
  AND chn.id = ci.person_role_id
  AND n.id = ci.person_id
  AND k.id = mk.keyword_id
  AND cct1.id = cc.subject_id
  AND cct2.id = cc.status_id
""",
    # ---- family 21 (cn, ct, k, lt, mc, mi, mk, ml, t)
    "21a": """
SELECT MIN(cn.name) AS company_name, MIN(lt.link) AS link_type,
       MIN(t.title) AS western_follow_up
FROM company_name cn, company_type ct, keyword k, link_type lt,
     movie_companies mc, movie_info mi, movie_keyword mk, movie_link ml,
     title t
WHERE cn.country_code <> '[pl]'
  AND (cn.name LIKE '%Warner%' OR cn.name LIKE '%Universal%')
  AND ct.kind = 'production companies'
  AND k.keyword = 'sequel'
  AND lt.link LIKE '%follow%'
  AND mc.note = ''
  AND mi.info IN ('Sweden', 'Norway', 'Germany', 'Denmark', 'Swedish',
                  'Danish', 'Norwegian', 'German')
  AND t.production_year BETWEEN 1950 AND 2010
  AND lt.id = ml.link_type_id
  AND ml.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND t.id = mc.movie_id
  AND mc.company_type_id = ct.id
  AND mc.company_id = cn.id
  AND mi.movie_id = t.id
  AND ml.movie_id = mk.movie_id
  AND ml.movie_id = mc.movie_id
  AND mk.movie_id = mc.movie_id
  AND ml.movie_id = mi.movie_id
  AND mk.movie_id = mi.movie_id
  AND mc.movie_id = mi.movie_id
""",
    "21b": """
SELECT MIN(cn.name) AS company_name, MIN(lt.link) AS link_type,
       MIN(t.title) AS german_follow_up
FROM company_name cn, company_type ct, keyword k, link_type lt,
     movie_companies mc, movie_info mi, movie_keyword mk, movie_link ml,
     title t
WHERE cn.country_code <> '[pl]'
  AND (cn.name LIKE '%Warner%' OR cn.name LIKE '%Universal%')
  AND ct.kind = 'production companies'
  AND k.keyword = 'sequel'
  AND lt.link LIKE '%follow%'
  AND mc.note = ''
  AND mi.info IN ('Germany', 'German')
  AND t.production_year BETWEEN 1990 AND 2010
  AND lt.id = ml.link_type_id
  AND ml.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND t.id = mc.movie_id
  AND mc.company_type_id = ct.id
  AND mc.company_id = cn.id
  AND mi.movie_id = t.id
  AND ml.movie_id = mk.movie_id
  AND ml.movie_id = mc.movie_id
  AND mk.movie_id = mc.movie_id
  AND ml.movie_id = mi.movie_id
  AND mk.movie_id = mi.movie_id
  AND mc.movie_id = mi.movie_id
""",
    "21c": """
SELECT MIN(cn.name) AS company_name, MIN(lt.link) AS link_type,
       MIN(t.title) AS western_follow_up
FROM company_name cn, company_type ct, keyword k, link_type lt,
     movie_companies mc, movie_info mi, movie_keyword mk, movie_link ml,
     title t
WHERE cn.country_code <> '[pl]'
  AND (cn.name LIKE '%Warner%' OR cn.name LIKE '%Universal%')
  AND ct.kind = 'production companies'
  AND k.keyword = 'sequel'
  AND lt.link LIKE '%follow%'
  AND mc.note = ''
  AND mi.info IN ('Sweden', 'Norway', 'Germany', 'Denmark', 'Swedish',
                  'Danish', 'Norwegian', 'German', 'English')
  AND t.production_year BETWEEN 1950 AND 2010
  AND lt.id = ml.link_type_id
  AND ml.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND t.id = mc.movie_id
  AND mc.company_type_id = ct.id
  AND mc.company_id = cn.id
  AND mi.movie_id = t.id
  AND ml.movie_id = mk.movie_id
  AND ml.movie_id = mc.movie_id
  AND mk.movie_id = mc.movie_id
  AND ml.movie_id = mi.movie_id
  AND mk.movie_id = mi.movie_id
  AND mc.movie_id = mi.movie_id
""",
    # ---- family 22 variants (cn, ct, it1, it2, k, kt, mc, mi, mi_idx, mk, t)
    "22b": """
SELECT MIN(cn.name) AS movie_company, MIN(mi_idx.info) AS rating,
       MIN(t.title) AS western_violent_movie
FROM company_name cn, company_type ct, info_type it1, info_type it2,
     keyword k, kind_type kt, movie_companies mc, movie_info mi,
     movie_info_idx mi_idx, movie_keyword mk, title t
WHERE cn.country_code <> '[us]'
  AND it1.info = 'countries'
  AND it2.info = 'rating'
  AND k.keyword IN ('murder', 'blood', 'violence')
  AND kt.kind IN ('movie', 'episode')
  AND mc.note NOT LIKE '%(USA)%'
  AND mc.note LIKE '%(200%)%'
  AND mi.info IN ('Germany', 'Swedish', 'German', 'USA', 'American')
  AND mi_idx.info < '7.0'
  AND t.production_year > 2008
  AND kt.id = t.kind_id
  AND t.id = mi.movie_id
  AND t.id = mk.movie_id
  AND t.id = mi_idx.movie_id
  AND t.id = mc.movie_id
  AND mk.movie_id = mi.movie_id
  AND mk.movie_id = mi_idx.movie_id
  AND mk.movie_id = mc.movie_id
  AND mi.movie_id = mi_idx.movie_id
  AND mi.movie_id = mc.movie_id
  AND mc.movie_id = mi_idx.movie_id
  AND k.id = mk.keyword_id
  AND it1.id = mi.info_type_id
  AND it2.id = mi_idx.info_type_id
  AND ct.id = mc.company_type_id
  AND cn.id = mc.company_id
""",
    "22c": """
SELECT MIN(cn.name) AS movie_company, MIN(mi_idx.info) AS rating,
       MIN(t.title) AS western_violent_movie
FROM company_name cn, company_type ct, info_type it1, info_type it2,
     keyword k, kind_type kt, movie_companies mc, movie_info mi,
     movie_info_idx mi_idx, movie_keyword mk, title t
WHERE cn.country_code <> '[us]'
  AND it1.info = 'countries'
  AND it2.info = 'rating'
  AND k.keyword IN ('murder', 'blood', 'violence', 'revenge', 'fight')
  AND kt.kind IN ('movie', 'episode')
  AND mc.note NOT LIKE '%(USA)%'
  AND mc.note LIKE '%(200%)%'
  AND mi.info IN ('Sweden', 'Norway', 'Germany', 'Denmark', 'Swedish',
                  'Danish', 'Norwegian', 'German', 'USA', 'American')
  AND mi_idx.info < '8.5'
  AND t.production_year > 2005
  AND kt.id = t.kind_id
  AND t.id = mi.movie_id
  AND t.id = mk.movie_id
  AND t.id = mi_idx.movie_id
  AND t.id = mc.movie_id
  AND mk.movie_id = mi.movie_id
  AND mk.movie_id = mi_idx.movie_id
  AND mk.movie_id = mc.movie_id
  AND mi.movie_id = mi_idx.movie_id
  AND mi.movie_id = mc.movie_id
  AND mc.movie_id = mi_idx.movie_id
  AND k.id = mk.keyword_id
  AND it1.id = mi.info_type_id
  AND it2.id = mi_idx.info_type_id
  AND ct.id = mc.company_type_id
  AND cn.id = mc.company_id
""",
    "22d": """
SELECT MIN(cn.name) AS movie_company, MIN(mi_idx.info) AS rating,
       MIN(t.title) AS western_violent_movie
FROM company_name cn, company_type ct, info_type it1, info_type it2,
     keyword k, kind_type kt, movie_companies mc, movie_info mi,
     movie_info_idx mi_idx, movie_keyword mk, title t
WHERE cn.country_code <> '[us]'
  AND it1.info = 'countries'
  AND it2.info = 'rating'
  AND k.keyword IN ('murder', 'blood', 'violence', 'revenge', 'fight')
  AND kt.kind IN ('movie', 'episode')
  AND mi.info IN ('Sweden', 'Norway', 'Germany', 'Denmark', 'Swedish',
                  'Danish', 'Norwegian', 'German', 'USA', 'American')
  AND mi_idx.info < '8.5'
  AND t.production_year > 2005
  AND kt.id = t.kind_id
  AND t.id = mi.movie_id
  AND t.id = mk.movie_id
  AND t.id = mi_idx.movie_id
  AND t.id = mc.movie_id
  AND mk.movie_id = mi.movie_id
  AND mk.movie_id = mi_idx.movie_id
  AND mk.movie_id = mc.movie_id
  AND mi.movie_id = mi_idx.movie_id
  AND mi.movie_id = mc.movie_id
  AND mc.movie_id = mi_idx.movie_id
  AND k.id = mk.keyword_id
  AND it1.id = mi.info_type_id
  AND it2.id = mi_idx.info_type_id
  AND ct.id = mc.company_type_id
  AND cn.id = mc.company_id
""",
    # ---- family 23 (cc, cct1, cn, ct, it1, k, kt, mc, mi, mk, t)
    "23a": """
SELECT MIN(kt.kind) AS movie_kind, MIN(t.title) AS complete_us_internet_movie
FROM complete_cast cc, comp_cast_type cct1, company_name cn,
     company_type ct, info_type it1, keyword k, kind_type kt,
     movie_companies mc, movie_info mi, movie_keyword mk, title t
WHERE cct1.kind = 'complete+verified'
  AND cn.country_code = '[us]'
  AND it1.info = 'release dates'
  AND kt.kind = 'movie'
  AND mi.note LIKE '%internet%'
  AND (mi.info LIKE 'USA:199%' OR mi.info LIKE 'USA:200%')
  AND t.production_year > 2000
  AND kt.id = t.kind_id
  AND t.id = mi.movie_id
  AND t.id = mk.movie_id
  AND t.id = mc.movie_id
  AND t.id = cc.movie_id
  AND mk.movie_id = mi.movie_id
  AND mk.movie_id = mc.movie_id
  AND mk.movie_id = cc.movie_id
  AND mi.movie_id = mc.movie_id
  AND mi.movie_id = cc.movie_id
  AND mc.movie_id = cc.movie_id
  AND k.id = mk.keyword_id
  AND it1.id = mi.info_type_id
  AND cn.id = mc.company_id
  AND ct.id = mc.company_type_id
  AND cct1.id = cc.status_id
""",
    "23b": """
SELECT MIN(kt.kind) AS movie_kind, MIN(t.title) AS complete_nerdy_internet_movie
FROM complete_cast cc, comp_cast_type cct1, company_name cn,
     company_type ct, info_type it1, keyword k, kind_type kt,
     movie_companies mc, movie_info mi, movie_keyword mk, title t
WHERE cct1.kind = 'complete+verified'
  AND cn.country_code = '[us]'
  AND it1.info = 'release dates'
  AND k.keyword IN ('nerd', 'loner', 'alienation', 'dignity')
  AND kt.kind = 'movie'
  AND mi.note LIKE '%internet%'
  AND mi.info LIKE 'USA:200%'
  AND t.production_year > 2000
  AND kt.id = t.kind_id
  AND t.id = mi.movie_id
  AND t.id = mk.movie_id
  AND t.id = mc.movie_id
  AND t.id = cc.movie_id
  AND mk.movie_id = mi.movie_id
  AND mk.movie_id = mc.movie_id
  AND mk.movie_id = cc.movie_id
  AND mi.movie_id = mc.movie_id
  AND mi.movie_id = cc.movie_id
  AND mc.movie_id = cc.movie_id
  AND k.id = mk.keyword_id
  AND it1.id = mi.info_type_id
  AND cn.id = mc.company_id
  AND ct.id = mc.company_type_id
  AND cct1.id = cc.status_id
""",
    "23c": """
SELECT MIN(kt.kind) AS movie_kind, MIN(t.title) AS complete_us_internet_movie
FROM complete_cast cc, comp_cast_type cct1, company_name cn,
     company_type ct, info_type it1, keyword k, kind_type kt,
     movie_companies mc, movie_info mi, movie_keyword mk, title t
WHERE cct1.kind = 'complete+verified'
  AND cn.country_code = '[us]'
  AND it1.info = 'release dates'
  AND kt.kind IN ('movie', 'tv movie', 'video movie', 'video game')
  AND mi.note LIKE '%internet%'
  AND (mi.info LIKE 'USA:199%' OR mi.info LIKE 'USA:200%')
  AND t.production_year > 1990
  AND kt.id = t.kind_id
  AND t.id = mi.movie_id
  AND t.id = mk.movie_id
  AND t.id = mc.movie_id
  AND t.id = cc.movie_id
  AND mk.movie_id = mi.movie_id
  AND mk.movie_id = mc.movie_id
  AND mk.movie_id = cc.movie_id
  AND mi.movie_id = mc.movie_id
  AND mi.movie_id = cc.movie_id
  AND mc.movie_id = cc.movie_id
  AND k.id = mk.keyword_id
  AND it1.id = mi.info_type_id
  AND cn.id = mc.company_id
  AND ct.id = mc.company_type_id
  AND cct1.id = cc.status_id
""",
    # ---- family 24 (an, chn, ci, cn, it, k, mc, mi, mk, n, rt, t)
    "24a": """
SELECT MIN(chn.name) AS voiced_char_name, MIN(n.name) AS voicing_actress,
       MIN(t.title) AS voiced_action_movie_jap_eng
FROM aka_name an, char_name chn, cast_info ci, company_name cn,
     info_type it, keyword k, movie_companies mc, movie_info mi,
     movie_keyword mk, name n, role_type rt, title t
WHERE ci.note IN ('(voice)', '(voice: Japanese version)',
                  '(voice) (uncredited)', '(voice: English version)')
  AND cn.country_code = '[us]'
  AND it.info = 'release dates'
  AND k.keyword IN ('superhero', 'fight', 'violence', 'magnet', 'web',
                    'claw', 'laser')
  AND mi.info LIKE 'USA:200%'
  AND n.gender = 'f'
  AND n.name LIKE '%An%'
  AND rt.role = 'actress'
  AND t.production_year > 2005
  AND t.id = mi.movie_id
  AND t.id = mc.movie_id
  AND t.id = ci.movie_id
  AND t.id = mk.movie_id
  AND mc.movie_id = ci.movie_id
  AND mc.movie_id = mi.movie_id
  AND mc.movie_id = mk.movie_id
  AND mi.movie_id = ci.movie_id
  AND mi.movie_id = mk.movie_id
  AND ci.movie_id = mk.movie_id
  AND cn.id = mc.company_id
  AND it.id = mi.info_type_id
  AND n.id = ci.person_id
  AND rt.id = ci.role_id
  AND n.id = an.person_id
  AND ci.person_id = an.person_id
  AND chn.id = ci.person_role_id
  AND k.id = mk.keyword_id
""",
    "24b": """
SELECT MIN(chn.name) AS voiced_char_name, MIN(n.name) AS voicing_actress,
       MIN(t.title) AS dreamworks_animation
FROM aka_name an, char_name chn, cast_info ci, company_name cn,
     info_type it, keyword k, movie_companies mc, movie_info mi,
     movie_keyword mk, name n, role_type rt, title t
WHERE ci.note IN ('(voice)', '(voice: Japanese version)',
                  '(voice) (uncredited)', '(voice: English version)')
  AND cn.country_code = '[us]'
  AND cn.name LIKE 'DreamWorks%'
  AND it.info = 'release dates'
  AND k.keyword IN ('computer-animation', 'superhero', 'web')
  AND mi.info LIKE 'USA:200%'
  AND n.gender = 'f'
  AND n.name LIKE '%An%'
  AND rt.role = 'actress'
  AND t.production_year > 2005
  AND t.id = mi.movie_id
  AND t.id = mc.movie_id
  AND t.id = ci.movie_id
  AND t.id = mk.movie_id
  AND mc.movie_id = ci.movie_id
  AND mc.movie_id = mi.movie_id
  AND mc.movie_id = mk.movie_id
  AND mi.movie_id = ci.movie_id
  AND mi.movie_id = mk.movie_id
  AND ci.movie_id = mk.movie_id
  AND cn.id = mc.company_id
  AND it.id = mi.info_type_id
  AND n.id = ci.person_id
  AND rt.id = ci.role_id
  AND n.id = an.person_id
  AND ci.person_id = an.person_id
  AND chn.id = ci.person_role_id
  AND k.id = mk.keyword_id
""",
    # ---- family 25 variants (ci, it1, it2, k, mi, mi_idx, mk, n, t)
    "25b": """
SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
       MIN(n.name) AS male_writer, MIN(t.title) AS violent_movie_title
FROM cast_info ci, info_type it1, info_type it2, keyword k,
     movie_info mi, movie_info_idx mi_idx, movie_keyword mk, name n,
     title t
WHERE ci.note IN ('(writer)', '(head writer)', '(story)', '(screenplay)')
  AND it1.info = 'genres'
  AND it2.info = 'votes'
  AND k.keyword IN ('murder', 'blood', 'violence')
  AND mi.info = 'Horror'
  AND n.gender = 'm'
  AND t.production_year > 2005
  AND (t.title LIKE '%Freddy%' OR t.title LIKE '%Dark%')
  AND t.id = mi.movie_id
  AND t.id = mi_idx.movie_id
  AND t.id = ci.movie_id
  AND t.id = mk.movie_id
  AND ci.movie_id = mi.movie_id
  AND ci.movie_id = mi_idx.movie_id
  AND ci.movie_id = mk.movie_id
  AND mi.movie_id = mi_idx.movie_id
  AND mi.movie_id = mk.movie_id
  AND mi_idx.movie_id = mk.movie_id
  AND n.id = ci.person_id
  AND it1.id = mi.info_type_id
  AND it2.id = mi_idx.info_type_id
  AND k.id = mk.keyword_id
""",
    "25c": """
SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
       MIN(n.name) AS male_writer, MIN(t.title) AS violent_movie_title
FROM cast_info ci, info_type it1, info_type it2, keyword k,
     movie_info mi, movie_info_idx mi_idx, movie_keyword mk, name n,
     title t
WHERE ci.note IN ('(writer)', '(head writer)', '(story)', '(screenplay)')
  AND it1.info = 'genres'
  AND it2.info = 'votes'
  AND k.keyword IN ('murder', 'blood', 'violence', 'revenge', 'fight',
                    'hospital')
  AND mi.info IN ('Horror', 'Action', 'Sci-Fi', 'Thriller', 'Crime',
                  'Western')
  AND n.gender = 'm'
  AND t.id = mi.movie_id
  AND t.id = mi_idx.movie_id
  AND t.id = ci.movie_id
  AND t.id = mk.movie_id
  AND ci.movie_id = mi.movie_id
  AND ci.movie_id = mi_idx.movie_id
  AND ci.movie_id = mk.movie_id
  AND mi.movie_id = mi_idx.movie_id
  AND mi.movie_id = mk.movie_id
  AND mi_idx.movie_id = mk.movie_id
  AND n.id = ci.person_id
  AND it1.id = mi.info_type_id
  AND it2.id = mi_idx.info_type_id
  AND k.id = mk.keyword_id
""",
    # ---- family 26 (cc, cct1, cct2, chn, ci, it2, k, kt, mi_idx, mk, n, t)
    "26a": """
SELECT MIN(chn.name) AS character_name, MIN(mi_idx.info) AS rating,
       MIN(n.name) AS playing_actor, MIN(t.title) AS complete_hero_movie
FROM complete_cast cc, comp_cast_type cct1, comp_cast_type cct2,
     char_name chn, cast_info ci, info_type it2, keyword k,
     kind_type kt, movie_info_idx mi_idx, movie_keyword mk, name n,
     title t
WHERE cct1.kind = 'cast'
  AND cct2.kind LIKE '%complete%'
  AND chn.name LIKE '%man%'
  AND it2.info = 'rating'
  AND k.keyword IN ('superhero', 'marvel-cinematic-universe', 'sequel',
                    'second-part', 'fight', 'violence', 'magnet', 'web',
                    'claw', 'laser')
  AND kt.kind = 'movie'
  AND mi_idx.info > '7.0'
  AND t.production_year > 2000
  AND kt.id = t.kind_id
  AND t.id = mk.movie_id
  AND t.id = ci.movie_id
  AND t.id = cc.movie_id
  AND t.id = mi_idx.movie_id
  AND mk.movie_id = ci.movie_id
  AND mk.movie_id = cc.movie_id
  AND mk.movie_id = mi_idx.movie_id
  AND ci.movie_id = cc.movie_id
  AND ci.movie_id = mi_idx.movie_id
  AND cc.movie_id = mi_idx.movie_id
  AND chn.id = ci.person_role_id
  AND n.id = ci.person_id
  AND k.id = mk.keyword_id
  AND cct1.id = cc.subject_id
  AND cct2.id = cc.status_id
  AND it2.id = mi_idx.info_type_id
""",
    "26b": """
SELECT MIN(chn.name) AS character_name, MIN(mi_idx.info) AS rating,
       MIN(t.title) AS complete_hero_movie
FROM complete_cast cc, comp_cast_type cct1, comp_cast_type cct2,
     char_name chn, cast_info ci, info_type it2, keyword k,
     kind_type kt, movie_info_idx mi_idx, movie_keyword mk, name n,
     title t
WHERE cct1.kind = 'cast'
  AND cct2.kind LIKE '%complete%'
  AND chn.name LIKE '%Tony%Stark%'
  AND it2.info = 'rating'
  AND k.keyword IN ('superhero', 'marvel-cinematic-universe', 'sequel',
                    'second-part', 'fight')
  AND kt.kind = 'movie'
  AND mi_idx.info > '8.0'
  AND t.production_year > 2000
  AND kt.id = t.kind_id
  AND t.id = mk.movie_id
  AND t.id = ci.movie_id
  AND t.id = cc.movie_id
  AND t.id = mi_idx.movie_id
  AND mk.movie_id = ci.movie_id
  AND mk.movie_id = cc.movie_id
  AND mk.movie_id = mi_idx.movie_id
  AND ci.movie_id = cc.movie_id
  AND ci.movie_id = mi_idx.movie_id
  AND cc.movie_id = mi_idx.movie_id
  AND chn.id = ci.person_role_id
  AND n.id = ci.person_id
  AND k.id = mk.keyword_id
  AND cct1.id = cc.subject_id
  AND cct2.id = cc.status_id
  AND it2.id = mi_idx.info_type_id
""",
    "26c": """
SELECT MIN(chn.name) AS character_name, MIN(mi_idx.info) AS rating,
       MIN(t.title) AS complete_hero_movie
FROM complete_cast cc, comp_cast_type cct1, comp_cast_type cct2,
     char_name chn, cast_info ci, info_type it2, keyword k,
     kind_type kt, movie_info_idx mi_idx, movie_keyword mk, name n,
     title t
WHERE cct1.kind = 'cast'
  AND cct2.kind LIKE '%complete%'
  AND it2.info = 'rating'
  AND k.keyword IN ('superhero', 'marvel-cinematic-universe', 'sequel',
                    'second-part', 'fight', 'violence', 'magnet', 'web',
                    'claw', 'laser')
  AND kt.kind = 'movie'
  AND t.production_year > 2000
  AND kt.id = t.kind_id
  AND t.id = mk.movie_id
  AND t.id = ci.movie_id
  AND t.id = cc.movie_id
  AND t.id = mi_idx.movie_id
  AND mk.movie_id = ci.movie_id
  AND mk.movie_id = cc.movie_id
  AND mk.movie_id = mi_idx.movie_id
  AND ci.movie_id = cc.movie_id
  AND ci.movie_id = mi_idx.movie_id
  AND cc.movie_id = mi_idx.movie_id
  AND chn.id = ci.person_role_id
  AND n.id = ci.person_id
  AND k.id = mk.keyword_id
  AND cct1.id = cc.subject_id
  AND cct2.id = cc.status_id
  AND it2.id = mi_idx.info_type_id
""",
    # ---- family 27 (cc, cct1, cct2, cn, ct, k, lt, mc, mi, mk, ml, t)
    "27a": """
SELECT MIN(cn.name) AS producing_company, MIN(lt.link) AS link_type,
       MIN(t.title) AS complete_western_sequel
FROM complete_cast cc, comp_cast_type cct1, comp_cast_type cct2,
     company_name cn, company_type ct, keyword k, link_type lt,
     movie_companies mc, movie_info mi, movie_keyword mk, movie_link ml,
     title t
WHERE cct1.kind IN ('cast', 'crew')
  AND cct2.kind = 'complete'
  AND cn.country_code <> '[pl]'
  AND (cn.name LIKE '%Warner%' OR cn.name LIKE '%Universal%')
  AND ct.kind = 'production companies'
  AND k.keyword = 'sequel'
  AND lt.link LIKE '%follow%'
  AND mc.note = ''
  AND mi.info IN ('Sweden', 'Norway', 'Germany', 'Denmark', 'Swedish',
                  'Danish', 'Norwegian', 'German', 'English')
  AND t.production_year BETWEEN 1950 AND 2010
  AND lt.id = ml.link_type_id
  AND ml.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND t.id = mc.movie_id
  AND mc.company_type_id = ct.id
  AND mc.company_id = cn.id
  AND mi.movie_id = t.id
  AND t.id = cc.movie_id
  AND cct1.id = cc.subject_id
  AND cct2.id = cc.status_id
  AND ml.movie_id = mk.movie_id
  AND ml.movie_id = mc.movie_id
  AND mk.movie_id = mc.movie_id
  AND ml.movie_id = mi.movie_id
  AND mk.movie_id = mi.movie_id
  AND mc.movie_id = mi.movie_id
  AND ml.movie_id = cc.movie_id
  AND mk.movie_id = cc.movie_id
  AND mc.movie_id = cc.movie_id
  AND mi.movie_id = cc.movie_id
""",
    "27b": """
SELECT MIN(cn.name) AS producing_company, MIN(lt.link) AS link_type,
       MIN(t.title) AS complete_western_sequel
FROM complete_cast cc, comp_cast_type cct1, comp_cast_type cct2,
     company_name cn, company_type ct, keyword k, link_type lt,
     movie_companies mc, movie_info mi, movie_keyword mk, movie_link ml,
     title t
WHERE cct1.kind IN ('cast', 'crew')
  AND cct2.kind = 'complete'
  AND cn.country_code <> '[pl]'
  AND (cn.name LIKE '%Warner%' OR cn.name LIKE '%Universal%')
  AND ct.kind = 'production companies'
  AND k.keyword = 'sequel'
  AND lt.link LIKE '%follow%'
  AND mc.note = ''
  AND mi.info IN ('Sweden', 'Germany', 'Swedish', 'German')
  AND t.production_year = 2008
  AND lt.id = ml.link_type_id
  AND ml.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND t.id = mc.movie_id
  AND mc.company_type_id = ct.id
  AND mc.company_id = cn.id
  AND mi.movie_id = t.id
  AND t.id = cc.movie_id
  AND cct1.id = cc.subject_id
  AND cct2.id = cc.status_id
  AND ml.movie_id = mk.movie_id
  AND ml.movie_id = mc.movie_id
  AND mk.movie_id = mc.movie_id
  AND ml.movie_id = mi.movie_id
  AND mk.movie_id = mi.movie_id
  AND mc.movie_id = mi.movie_id
  AND ml.movie_id = cc.movie_id
  AND mk.movie_id = cc.movie_id
  AND mc.movie_id = cc.movie_id
  AND mi.movie_id = cc.movie_id
""",
    "27c": """
SELECT MIN(cn.name) AS producing_company, MIN(lt.link) AS link_type,
       MIN(t.title) AS complete_western_sequel
FROM complete_cast cc, comp_cast_type cct1, comp_cast_type cct2,
     company_name cn, company_type ct, keyword k, link_type lt,
     movie_companies mc, movie_info mi, movie_keyword mk, movie_link ml,
     title t
WHERE cct1.kind = 'cast'
  AND cct2.kind LIKE 'complete%'
  AND cn.country_code <> '[pl]'
  AND (cn.name LIKE '%Warner%' OR cn.name LIKE '%Universal%')
  AND ct.kind = 'production companies'
  AND k.keyword = 'sequel'
  AND lt.link LIKE '%follow%'
  AND mc.note = ''
  AND mi.info IN ('Sweden', 'Norway', 'Germany', 'Denmark', 'Swedish',
                  'Danish', 'Norwegian', 'German', 'English')
  AND t.production_year BETWEEN 1950 AND 2010
  AND lt.id = ml.link_type_id
  AND ml.movie_id = t.id
  AND t.id = mk.movie_id
  AND mk.keyword_id = k.id
  AND t.id = mc.movie_id
  AND mc.company_type_id = ct.id
  AND mc.company_id = cn.id
  AND mi.movie_id = t.id
  AND t.id = cc.movie_id
  AND cct1.id = cc.subject_id
  AND cct2.id = cc.status_id
  AND ml.movie_id = mk.movie_id
  AND ml.movie_id = mc.movie_id
  AND mk.movie_id = mc.movie_id
  AND ml.movie_id = mi.movie_id
  AND mk.movie_id = mi.movie_id
  AND mc.movie_id = mi.movie_id
  AND ml.movie_id = cc.movie_id
  AND mk.movie_id = cc.movie_id
  AND mc.movie_id = cc.movie_id
  AND mi.movie_id = cc.movie_id
""",
    # ---- family 28 variants (cc, cct1, cct2, cn, ct, it1, it2, k, kt, mc, mi, mi_idx, mk, t)
    "28b": """
SELECT MIN(cn.name) AS movie_company, MIN(mi_idx.info) AS rating,
       MIN(t.title) AS complete_euro_dark_movie
FROM complete_cast cc, comp_cast_type cct1, comp_cast_type cct2,
     company_name cn, company_type ct, info_type it1, info_type it2,
     keyword k, kind_type kt, movie_companies mc, movie_info mi,
     movie_info_idx mi_idx, movie_keyword mk, title t
WHERE cct1.kind = 'crew'
  AND cct2.kind <> 'complete+verified'
  AND cn.country_code <> '[us]'
  AND it1.info = 'countries'
  AND it2.info = 'rating'
  AND k.keyword IN ('murder', 'blood', 'violence', 'revenge', 'fight')
  AND kt.kind IN ('movie', 'episode')
  AND mc.note NOT LIKE '%(USA)%'
  AND mc.note LIKE '%(200%)%'
  AND mi.info IN ('Sweden', 'Germany', 'Swedish', 'German')
  AND mi_idx.info > '6.5'
  AND t.production_year > 2005
  AND kt.id = t.kind_id
  AND t.id = mi.movie_id
  AND t.id = mk.movie_id
  AND t.id = mi_idx.movie_id
  AND t.id = mc.movie_id
  AND t.id = cc.movie_id
  AND mk.movie_id = mi.movie_id
  AND mk.movie_id = mi_idx.movie_id
  AND mk.movie_id = mc.movie_id
  AND mi.movie_id = mi_idx.movie_id
  AND mi.movie_id = mc.movie_id
  AND mc.movie_id = mi_idx.movie_id
  AND k.id = mk.keyword_id
  AND it1.id = mi.info_type_id
  AND it2.id = mi_idx.info_type_id
  AND ct.id = mc.company_type_id
  AND cn.id = mc.company_id
  AND cct1.id = cc.subject_id
  AND cct2.id = cc.status_id
""",
    "28c": """
SELECT MIN(cn.name) AS movie_company, MIN(mi_idx.info) AS rating,
       MIN(t.title) AS complete_euro_dark_movie
FROM complete_cast cc, comp_cast_type cct1, comp_cast_type cct2,
     company_name cn, company_type ct, info_type it1, info_type it2,
     keyword k, kind_type kt, movie_companies mc, movie_info mi,
     movie_info_idx mi_idx, movie_keyword mk, title t
WHERE cct1.kind = 'cast'
  AND cct2.kind <> 'complete+verified'
  AND cn.country_code <> '[us]'
  AND it1.info = 'countries'
  AND it2.info = 'rating'
  AND k.keyword IN ('murder', 'blood', 'violence', 'revenge', 'fight')
  AND kt.kind IN ('movie', 'episode')
  AND mc.note NOT LIKE '%(USA)%'
  AND mc.note LIKE '%(200%)%'
  AND mi.info IN ('Sweden', 'Norway', 'Germany', 'Denmark', 'Swedish',
                  'Danish', 'Norwegian', 'German', 'USA', 'American')
  AND mi_idx.info < '8.5'
  AND t.production_year > 2005
  AND kt.id = t.kind_id
  AND t.id = mi.movie_id
  AND t.id = mk.movie_id
  AND t.id = mi_idx.movie_id
  AND t.id = mc.movie_id
  AND t.id = cc.movie_id
  AND mk.movie_id = mi.movie_id
  AND mk.movie_id = mi_idx.movie_id
  AND mk.movie_id = mc.movie_id
  AND mi.movie_id = mi_idx.movie_id
  AND mi.movie_id = mc.movie_id
  AND mc.movie_id = mi_idx.movie_id
  AND k.id = mk.keyword_id
  AND it1.id = mi.info_type_id
  AND it2.id = mi_idx.info_type_id
  AND ct.id = mc.company_type_id
  AND cn.id = mc.company_id
  AND cct1.id = cc.subject_id
  AND cct2.id = cc.status_id
""",
    # ---- family 29 (an, cc, cct1, cct2, chn, ci, cn, it, it3, k, mc,
    #                 mi, mk, n, pi, rt, t) — the 17-table monster
    "29a": """
SELECT MIN(chn.name) AS voiced_char, MIN(n.name) AS voicing_actress,
       MIN(t.title) AS voiced_animation
FROM aka_name an, complete_cast cc, comp_cast_type cct1,
     comp_cast_type cct2, char_name chn, cast_info ci, company_name cn,
     info_type it, info_type it3, keyword k, movie_companies mc,
     movie_info mi, movie_keyword mk, name n, person_info pi,
     role_type rt, title t
WHERE cct1.kind = 'cast'
  AND cct2.kind = 'complete+verified'
  AND chn.name LIKE 'Queen%'
  AND ci.note IN ('(voice)', '(voice) (uncredited)',
                  '(voice: English version)')
  AND cn.country_code = '[us]'
  AND it.info = 'release dates'
  AND it3.info = 'trivia'
  AND k.keyword = 'computer-animation'
  AND mi.info LIKE 'USA:200%'
  AND n.gender = 'f'
  AND n.name LIKE '%An%'
  AND rt.role = 'actress'
  AND t.production_year BETWEEN 2000 AND 2010
  AND t.id = mi.movie_id
  AND t.id = mc.movie_id
  AND t.id = ci.movie_id
  AND t.id = mk.movie_id
  AND t.id = cc.movie_id
  AND mc.movie_id = ci.movie_id
  AND mc.movie_id = mi.movie_id
  AND mc.movie_id = mk.movie_id
  AND mc.movie_id = cc.movie_id
  AND mi.movie_id = ci.movie_id
  AND mi.movie_id = mk.movie_id
  AND mi.movie_id = cc.movie_id
  AND ci.movie_id = mk.movie_id
  AND ci.movie_id = cc.movie_id
  AND mk.movie_id = cc.movie_id
  AND cn.id = mc.company_id
  AND it.id = mi.info_type_id
  AND n.id = ci.person_id
  AND rt.id = ci.role_id
  AND n.id = an.person_id
  AND ci.person_id = an.person_id
  AND chn.id = ci.person_role_id
  AND n.id = pi.person_id
  AND ci.person_id = pi.person_id
  AND it3.id = pi.info_type_id
  AND k.id = mk.keyword_id
  AND cct1.id = cc.subject_id
  AND cct2.id = cc.status_id
""",
    "29b": """
SELECT MIN(chn.name) AS voiced_char, MIN(n.name) AS voicing_actress,
       MIN(t.title) AS voiced_animation
FROM aka_name an, complete_cast cc, comp_cast_type cct1,
     comp_cast_type cct2, char_name chn, cast_info ci, company_name cn,
     info_type it, info_type it3, keyword k, movie_companies mc,
     movie_info mi, movie_keyword mk, name n, person_info pi,
     role_type rt, title t
WHERE cct1.kind = 'cast'
  AND cct2.kind = 'complete+verified'
  AND chn.name LIKE 'Queen%'
  AND ci.note IN ('(voice)', '(voice) (uncredited)',
                  '(voice: English version)')
  AND cn.country_code = '[us]'
  AND it.info = 'release dates'
  AND it3.info = 'height'
  AND k.keyword = 'computer-animation'
  AND mi.info LIKE 'USA:200%'
  AND n.gender = 'f'
  AND n.name_pcode_cf LIKE 'P2%'
  AND rt.role = 'actress'
  AND t.production_year BETWEEN 2000 AND 2010
  AND t.id = mi.movie_id
  AND t.id = mc.movie_id
  AND t.id = ci.movie_id
  AND t.id = mk.movie_id
  AND t.id = cc.movie_id
  AND mc.movie_id = ci.movie_id
  AND mc.movie_id = mi.movie_id
  AND mc.movie_id = mk.movie_id
  AND mc.movie_id = cc.movie_id
  AND mi.movie_id = ci.movie_id
  AND mi.movie_id = mk.movie_id
  AND mi.movie_id = cc.movie_id
  AND ci.movie_id = mk.movie_id
  AND ci.movie_id = cc.movie_id
  AND mk.movie_id = cc.movie_id
  AND cn.id = mc.company_id
  AND it.id = mi.info_type_id
  AND n.id = ci.person_id
  AND rt.id = ci.role_id
  AND n.id = an.person_id
  AND ci.person_id = an.person_id
  AND chn.id = ci.person_role_id
  AND n.id = pi.person_id
  AND ci.person_id = pi.person_id
  AND it3.id = pi.info_type_id
  AND k.id = mk.keyword_id
  AND cct1.id = cc.subject_id
  AND cct2.id = cc.status_id
""",
    "29c": """
SELECT MIN(chn.name) AS voiced_char, MIN(n.name) AS voicing_actress,
       MIN(t.title) AS voiced_animation
FROM aka_name an, complete_cast cc, comp_cast_type cct1,
     comp_cast_type cct2, char_name chn, cast_info ci, company_name cn,
     info_type it, info_type it3, keyword k, movie_companies mc,
     movie_info mi, movie_keyword mk, name n, person_info pi,
     role_type rt, title t
WHERE cct1.kind = 'cast'
  AND cct2.kind = 'complete+verified'
  AND ci.note IN ('(voice)', '(voice: Japanese version)',
                  '(voice) (uncredited)', '(voice: English version)')
  AND cn.country_code = '[us]'
  AND it.info = 'release dates'
  AND it3.info = 'trivia'
  AND k.keyword = 'computer-animation'
  AND mi.info LIKE 'USA:%'
  AND n.gender = 'f'
  AND rt.role = 'actress'
  AND t.production_year BETWEEN 1990 AND 2010
  AND t.id = mi.movie_id
  AND t.id = mc.movie_id
  AND t.id = ci.movie_id
  AND t.id = mk.movie_id
  AND t.id = cc.movie_id
  AND mc.movie_id = ci.movie_id
  AND mc.movie_id = mi.movie_id
  AND mc.movie_id = mk.movie_id
  AND mc.movie_id = cc.movie_id
  AND mi.movie_id = ci.movie_id
  AND mi.movie_id = mk.movie_id
  AND mi.movie_id = cc.movie_id
  AND ci.movie_id = mk.movie_id
  AND ci.movie_id = cc.movie_id
  AND mk.movie_id = cc.movie_id
  AND cn.id = mc.company_id
  AND it.id = mi.info_type_id
  AND n.id = ci.person_id
  AND rt.id = ci.role_id
  AND n.id = an.person_id
  AND ci.person_id = an.person_id
  AND chn.id = ci.person_role_id
  AND n.id = pi.person_id
  AND ci.person_id = pi.person_id
  AND it3.id = pi.info_type_id
  AND k.id = mk.keyword_id
  AND cct1.id = cc.subject_id
  AND cct2.id = cc.status_id
""",
    # ---- family 30 (cc, cct1, cct2, ci, it1, it2, k, mi, mi_idx, mk, n, t)
    "30a": """
SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
       MIN(n.name) AS writer, MIN(t.title) AS complete_violent_movie
FROM complete_cast cc, comp_cast_type cct1, comp_cast_type cct2,
     cast_info ci, info_type it1, info_type it2, keyword k,
     movie_info mi, movie_info_idx mi_idx, movie_keyword mk, name n,
     title t
WHERE cct1.kind IN ('cast', 'crew')
  AND cct2.kind = 'complete+verified'
  AND ci.note IN ('(writer)', '(head writer)', '(story)', '(screenplay)')
  AND it1.info = 'genres'
  AND it2.info = 'votes'
  AND k.keyword IN ('murder', 'blood', 'violence')
  AND mi.info IN ('Horror', 'Thriller')
  AND n.gender = 'm'
  AND t.production_year > 2000
  AND t.id = mi.movie_id
  AND t.id = mi_idx.movie_id
  AND t.id = ci.movie_id
  AND t.id = mk.movie_id
  AND t.id = cc.movie_id
  AND ci.movie_id = mi.movie_id
  AND ci.movie_id = mi_idx.movie_id
  AND ci.movie_id = mk.movie_id
  AND ci.movie_id = cc.movie_id
  AND mi.movie_id = mi_idx.movie_id
  AND mi.movie_id = mk.movie_id
  AND mi.movie_id = cc.movie_id
  AND mi_idx.movie_id = mk.movie_id
  AND mi_idx.movie_id = cc.movie_id
  AND mk.movie_id = cc.movie_id
  AND n.id = ci.person_id
  AND it1.id = mi.info_type_id
  AND it2.id = mi_idx.info_type_id
  AND k.id = mk.keyword_id
  AND cct1.id = cc.subject_id
  AND cct2.id = cc.status_id
""",
    "30b": """
SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
       MIN(n.name) AS writer, MIN(t.title) AS complete_gore_movie
FROM complete_cast cc, comp_cast_type cct1, comp_cast_type cct2,
     cast_info ci, info_type it1, info_type it2, keyword k,
     movie_info mi, movie_info_idx mi_idx, movie_keyword mk, name n,
     title t
WHERE cct1.kind IN ('cast', 'crew')
  AND cct2.kind = 'complete+verified'
  AND ci.note IN ('(writer)', '(head writer)', '(story)', '(screenplay)')
  AND it1.info = 'genres'
  AND it2.info = 'votes'
  AND k.keyword IN ('murder', 'blood', 'violence')
  AND mi.info IN ('Horror', 'Thriller')
  AND n.gender = 'm'
  AND t.production_year > 2000
  AND (t.title LIKE '%Freddy%' OR t.title LIKE '%Dark%')
  AND t.id = mi.movie_id
  AND t.id = mi_idx.movie_id
  AND t.id = ci.movie_id
  AND t.id = mk.movie_id
  AND t.id = cc.movie_id
  AND ci.movie_id = mi.movie_id
  AND ci.movie_id = mi_idx.movie_id
  AND ci.movie_id = mk.movie_id
  AND ci.movie_id = cc.movie_id
  AND mi.movie_id = mi_idx.movie_id
  AND mi.movie_id = mk.movie_id
  AND mi.movie_id = cc.movie_id
  AND mi_idx.movie_id = mk.movie_id
  AND mi_idx.movie_id = cc.movie_id
  AND mk.movie_id = cc.movie_id
  AND n.id = ci.person_id
  AND it1.id = mi.info_type_id
  AND it2.id = mi_idx.info_type_id
  AND k.id = mk.keyword_id
  AND cct1.id = cc.subject_id
  AND cct2.id = cc.status_id
""",
    "30c": """
SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
       MIN(n.name) AS writer, MIN(t.title) AS complete_violent_movie
FROM complete_cast cc, comp_cast_type cct1, comp_cast_type cct2,
     cast_info ci, info_type it1, info_type it2, keyword k,
     movie_info mi, movie_info_idx mi_idx, movie_keyword mk, name n,
     title t
WHERE cct1.kind = 'cast'
  AND cct2.kind LIKE '%complete%'
  AND ci.note IN ('(writer)', '(head writer)', '(story)', '(screenplay)')
  AND it1.info = 'genres'
  AND it2.info = 'votes'
  AND k.keyword IN ('murder', 'blood', 'violence', 'revenge', 'fight',
                    'hospital')
  AND mi.info IN ('Horror', 'Action', 'Sci-Fi', 'Thriller', 'Crime',
                  'Western')
  AND n.gender = 'm'
  AND t.id = mi.movie_id
  AND t.id = mi_idx.movie_id
  AND t.id = ci.movie_id
  AND t.id = mk.movie_id
  AND t.id = cc.movie_id
  AND ci.movie_id = mi.movie_id
  AND ci.movie_id = mi_idx.movie_id
  AND ci.movie_id = mk.movie_id
  AND ci.movie_id = cc.movie_id
  AND mi.movie_id = mi_idx.movie_id
  AND mi.movie_id = mk.movie_id
  AND mi.movie_id = cc.movie_id
  AND mi_idx.movie_id = mk.movie_id
  AND mi_idx.movie_id = cc.movie_id
  AND mk.movie_id = cc.movie_id
  AND n.id = ci.person_id
  AND it1.id = mi.info_type_id
  AND it2.id = mi_idx.info_type_id
  AND k.id = mk.keyword_id
  AND cct1.id = cc.subject_id
  AND cct2.id = cc.status_id
""",
    # ---- family 31 variants (ci, cn, it1, it2, k, mc, mi, mi_idx, mk, n, t)
    "31b": """
SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
       MIN(n.name) AS writer, MIN(t.title) AS violent_liongate_movie
FROM cast_info ci, company_name cn, info_type it1, info_type it2,
     keyword k, movie_companies mc, movie_info mi, movie_info_idx mi_idx,
     movie_keyword mk, name n, title t
WHERE ci.note IN ('(writer)', '(head writer)', '(story)', '(screenplay)')
  AND cn.name LIKE 'Lionsgate%'
  AND it1.info = 'genres'
  AND it2.info = 'votes'
  AND k.keyword IN ('murder', 'violence', 'blood')
  AND mc.note LIKE '%(DVD)%'
  AND mi.info IN ('Horror', 'Thriller')
  AND n.gender = 'm'
  AND t.production_year > 2000
  AND (t.title LIKE '%Freddy%' OR t.title LIKE '%Dark%')
  AND t.id = mi.movie_id
  AND t.id = mi_idx.movie_id
  AND t.id = ci.movie_id
  AND t.id = mk.movie_id
  AND t.id = mc.movie_id
  AND ci.movie_id = mi.movie_id
  AND ci.movie_id = mi_idx.movie_id
  AND ci.movie_id = mk.movie_id
  AND ci.movie_id = mc.movie_id
  AND mi.movie_id = mi_idx.movie_id
  AND mi.movie_id = mk.movie_id
  AND mi.movie_id = mc.movie_id
  AND mi_idx.movie_id = mk.movie_id
  AND mi_idx.movie_id = mc.movie_id
  AND mk.movie_id = mc.movie_id
  AND n.id = ci.person_id
  AND it1.id = mi.info_type_id
  AND it2.id = mi_idx.info_type_id
  AND k.id = mk.keyword_id
  AND cn.id = mc.company_id
""",
    "31c": """
SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
       MIN(n.name) AS writer, MIN(t.title) AS violent_liongate_movie
FROM cast_info ci, company_name cn, info_type it1, info_type it2,
     keyword k, movie_companies mc, movie_info mi, movie_info_idx mi_idx,
     movie_keyword mk, name n, title t
WHERE ci.note IN ('(writer)', '(head writer)', '(story)', '(screenplay)')
  AND cn.name LIKE 'Lionsgate%'
  AND it1.info = 'genres'
  AND it2.info = 'votes'
  AND k.keyword IN ('murder', 'violence', 'blood', 'revenge', 'fight',
                    'hospital')
  AND mi.info IN ('Horror', 'Action', 'Sci-Fi', 'Thriller', 'Crime',
                  'Western')
  AND t.id = mi.movie_id
  AND t.id = mi_idx.movie_id
  AND t.id = ci.movie_id
  AND t.id = mk.movie_id
  AND t.id = mc.movie_id
  AND ci.movie_id = mi.movie_id
  AND ci.movie_id = mi_idx.movie_id
  AND ci.movie_id = mk.movie_id
  AND ci.movie_id = mc.movie_id
  AND mi.movie_id = mi_idx.movie_id
  AND mi.movie_id = mk.movie_id
  AND mi.movie_id = mc.movie_id
  AND mi_idx.movie_id = mk.movie_id
  AND mi_idx.movie_id = mc.movie_id
  AND mk.movie_id = mc.movie_id
  AND n.id = ci.person_id
  AND it1.id = mi.info_type_id
  AND it2.id = mi_idx.info_type_id
  AND k.id = mk.keyword_id
  AND cn.id = mc.company_id
""",
    # ---- family 32 variant (k, lt, mk, ml, t1, t2)
    "32b": """
SELECT MIN(lt.link) AS link_type, MIN(t1.title) AS first_movie,
       MIN(t2.title) AS second_movie
FROM keyword k, link_type lt, movie_keyword mk, movie_link ml,
     title t1, title t2
WHERE k.keyword = 'character-name-in-title'
  AND mk.keyword_id = k.id
  AND t1.id = mk.movie_id
  AND ml.movie_id = t1.id
  AND ml.linked_movie_id = t2.id
  AND lt.id = ml.link_type_id
  AND mk.movie_id = t1.id
""",
    # ---- family 33 variants (cn1, cn2, it1, it2, kt1, kt2, lt, mc1,
    #                          mc2, mi_idx1, mi_idx2, ml, t1, t2)
    "33b": """
SELECT MIN(cn1.name) AS first_company, MIN(cn2.name) AS second_company,
       MIN(mi_idx1.info) AS first_rating, MIN(mi_idx2.info) AS second_rating,
       MIN(t1.title) AS first_movie, MIN(t2.title) AS second_movie
FROM company_name cn1, company_name cn2, info_type it1, info_type it2,
     kind_type kt1, kind_type kt2, link_type lt, movie_companies mc1,
     movie_companies mc2, movie_info_idx mi_idx1, movie_info_idx mi_idx2,
     movie_link ml, title t1, title t2
WHERE cn1.country_code = '[nl]'
  AND it1.info = 'rating'
  AND it2.info = 'rating'
  AND kt1.kind = 'tv series'
  AND kt2.kind = 'tv series'
  AND lt.link LIKE '%follow%'
  AND mi_idx2.info < '3.0'
  AND t2.production_year BETWEEN 2005 AND 2008
  AND lt.id = ml.link_type_id
  AND t1.id = ml.movie_id
  AND t2.id = ml.linked_movie_id
  AND it1.id = mi_idx1.info_type_id
  AND t1.id = mi_idx1.movie_id
  AND kt1.id = t1.kind_id
  AND cn1.id = mc1.company_id
  AND t1.id = mc1.movie_id
  AND ml.movie_id = mi_idx1.movie_id
  AND ml.movie_id = mc1.movie_id
  AND mi_idx1.movie_id = mc1.movie_id
  AND it2.id = mi_idx2.info_type_id
  AND t2.id = mi_idx2.movie_id
  AND kt2.id = t2.kind_id
  AND cn2.id = mc2.company_id
  AND t2.id = mc2.movie_id
  AND ml.linked_movie_id = mi_idx2.movie_id
  AND ml.linked_movie_id = mc2.movie_id
  AND mi_idx2.movie_id = mc2.movie_id
""",
    "33c": """
SELECT MIN(cn1.name) AS first_company, MIN(cn2.name) AS second_company,
       MIN(mi_idx1.info) AS first_rating, MIN(mi_idx2.info) AS second_rating,
       MIN(t1.title) AS first_movie, MIN(t2.title) AS second_movie
FROM company_name cn1, company_name cn2, info_type it1, info_type it2,
     kind_type kt1, kind_type kt2, link_type lt, movie_companies mc1,
     movie_companies mc2, movie_info_idx mi_idx1, movie_info_idx mi_idx2,
     movie_link ml, title t1, title t2
WHERE cn1.country_code <> '[us]'
  AND it1.info = 'rating'
  AND it2.info = 'rating'
  AND kt1.kind IN ('tv series', 'episode')
  AND kt2.kind IN ('tv series', 'episode')
  AND lt.link IN ('sequel', 'follows', 'followed by')
  AND mi_idx2.info < '3.5'
  AND t2.production_year BETWEEN 2000 AND 2010
  AND lt.id = ml.link_type_id
  AND t1.id = ml.movie_id
  AND t2.id = ml.linked_movie_id
  AND it1.id = mi_idx1.info_type_id
  AND t1.id = mi_idx1.movie_id
  AND kt1.id = t1.kind_id
  AND cn1.id = mc1.company_id
  AND t1.id = mc1.movie_id
  AND ml.movie_id = mi_idx1.movie_id
  AND ml.movie_id = mc1.movie_id
  AND mi_idx1.movie_id = mc1.movie_id
  AND it2.id = mi_idx2.info_type_id
  AND t2.id = mi_idx2.movie_id
  AND kt2.id = t2.kind_id
  AND cn2.id = mc2.company_id
  AND t2.id = mc2.movie_id
  AND ml.linked_movie_id = mi_idx2.movie_id
  AND ml.linked_movie_id = mc2.movie_id
  AND mi_idx2.movie_id = mc2.movie_id
""",
}
