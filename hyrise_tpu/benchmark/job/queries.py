"""Join Order Benchmark queries (ref: the published JOB query set the
reference vendors in third_party/join-order-benchmark and runs via
benchmark/join_order_benchmark.cpp).

24 of the 33 query FAMILIES ("a" variants), written from the published
benchmark; string constants are adapted to the synthetic IMDB generator's
value domains (generator.py) so plans exercise the same join graphs with
non-empty intermediates.  All are MIN() aggregations over 4-14-way
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
}
