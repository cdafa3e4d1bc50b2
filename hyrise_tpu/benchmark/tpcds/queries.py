"""TPC-DS store-channel query set (12 of the 99; written from the TPC-DS
v3 specification with fixed substitution parameters; ref:
resources/benchmark/tpcds/ in the reference repo).  Queries touching only
the catalog/web channels land with those tables (PARITY.md)."""

TPCDS_QUERIES = {
    3: """
SELECT d_year, i_brand_id AS brand_id, i_brand AS brand,
       SUM(ss_ext_sales_price) AS sum_agg
FROM date_dim, store_sales, item
WHERE d_date_sk = ss_sold_date_sk AND ss_item_sk = i_item_sk
  AND i_manufact_id = 128 AND d_moy = 11
GROUP BY d_year, i_brand_id, i_brand
ORDER BY d_year, sum_agg DESC, brand_id
LIMIT 100
""",
    7: """
SELECT i_item_id, AVG(ss_quantity) AS agg1, AVG(ss_list_price) AS agg2,
       AVG(ss_coupon_amt) AS agg3, AVG(ss_sales_price) AS agg4
FROM store_sales, customer_demographics, date_dim, item, promotion
WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
  AND ss_cdemo_sk = cd_demo_sk AND ss_promo_sk = p_promo_sk
  AND cd_gender = 'M' AND cd_marital_status = 'S'
  AND cd_education_status = 'College'
  AND (p_channel_email = 'N' OR p_channel_event = 'N') AND d_year = 2000
GROUP BY i_item_id
ORDER BY i_item_id
LIMIT 100
""",
    19: """
SELECT i_brand_id AS brand_id, i_brand AS brand, i_manufact_id,
       i_manufact, SUM(ss_ext_sales_price) AS ext_price
FROM date_dim, store_sales, item, customer, customer_address, store
WHERE d_date_sk = ss_sold_date_sk AND ss_item_sk = i_item_sk
  AND i_manager_id = 8 AND d_moy = 11 AND d_year = 1998
  AND ss_customer_sk = c_customer_sk
  AND c_current_addr_sk = ca_address_sk AND ss_store_sk = s_store_sk
  AND SUBSTR(ca_zip, 1, 5) <> SUBSTR(s_zip, 1, 5)
GROUP BY i_brand_id, i_brand, i_manufact_id, i_manufact
ORDER BY ext_price DESC, brand_id, i_manufact_id
LIMIT 100
""",
    42: """
SELECT d_year, i_category_id, i_category, SUM(ss_ext_sales_price)
FROM date_dim, store_sales, item
WHERE d_date_sk = ss_sold_date_sk AND ss_item_sk = i_item_sk
  AND i_manager_id = 1 AND d_moy = 11 AND d_year = 2000
GROUP BY d_year, i_category_id, i_category
ORDER BY SUM(ss_ext_sales_price) DESC, d_year, i_category_id, i_category
LIMIT 100
""",
    52: """
SELECT d_year, i_brand_id AS brand_id, i_brand AS brand,
       SUM(ss_ext_sales_price) AS ext_price
FROM date_dim, store_sales, item
WHERE d_date_sk = ss_sold_date_sk AND ss_item_sk = i_item_sk
  AND i_manager_id = 1 AND d_moy = 11 AND d_year = 2000
GROUP BY d_year, i_brand_id, i_brand
ORDER BY d_year, ext_price DESC, brand_id
LIMIT 100
""",
    55: """
SELECT i_brand_id AS brand_id, i_brand AS brand,
       SUM(ss_ext_sales_price) AS ext_price
FROM date_dim, store_sales, item
WHERE d_date_sk = ss_sold_date_sk AND ss_item_sk = i_item_sk
  AND i_manager_id = 28 AND d_moy = 11 AND d_year = 1999
GROUP BY i_brand_id, i_brand
ORDER BY ext_price DESC, brand_id
LIMIT 100
""",
    61: """
SELECT SUM(ss_ext_sales_price) AS promotions
FROM store_sales, store, promotion, date_dim, customer,
     customer_address, item
WHERE ss_sold_date_sk = d_date_sk AND ss_store_sk = s_store_sk
  AND ss_promo_sk = p_promo_sk AND ss_customer_sk = c_customer_sk
  AND ca_address_sk = c_current_addr_sk AND ss_item_sk = i_item_sk
  AND ca_gmt_offset = -5 AND i_category = 'Jewelry'
  AND (p_channel_dmail = 'Y' OR p_channel_email = 'Y'
       OR p_channel_tv = 'Y')
  AND s_gmt_offset = -5 AND d_year = 1998 AND d_moy = 11
""",
    68: """
SELECT c_last_name, c_first_name, ca_city, extended_price, list_price
FROM (SELECT ss_ticket_number, ss_customer_sk, ca_city,
             SUM(ss_ext_sales_price) AS extended_price,
             SUM(ss_ext_list_price) AS list_price
      FROM store_sales, date_dim, store, household_demographics,
           customer_address
      WHERE ss_sold_date_sk = d_date_sk AND ss_store_sk = s_store_sk
        AND ss_hdemo_sk = hd_demo_sk AND ss_addr_sk = ca_address_sk
        AND (d_dom BETWEEN 1 AND 2) AND (hd_dep_count = 4
             OR hd_vehicle_count = 3)
        AND d_year IN (1999, 2000, 2001)
        AND s_city IN ('Midway', 'Fairview')
      GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn,
     customer
WHERE ss_customer_sk = c_customer_sk
ORDER BY c_last_name, ss_ticket_number
LIMIT 100
""",
    73: """
SELECT c_last_name, c_first_name, c_customer_sk AS salutation, cnt
FROM (SELECT ss_ticket_number, ss_customer_sk, COUNT(*) AS cnt
      FROM store_sales, date_dim, store, household_demographics
      WHERE ss_sold_date_sk = d_date_sk AND ss_store_sk = s_store_sk
        AND ss_hdemo_sk = hd_demo_sk AND d_dom BETWEEN 1 AND 2
        AND (hd_buy_potential = '>10000' OR hd_buy_potential = '0-500')
        AND hd_vehicle_count > 0 AND d_year IN (1999, 2000, 2001)
      GROUP BY ss_ticket_number, ss_customer_sk) dj, customer
WHERE ss_customer_sk = c_customer_sk AND cnt BETWEEN 1 AND 5
ORDER BY cnt DESC, c_last_name
LIMIT 100
""",
    96: """
SELECT COUNT(*) AS cnt
FROM store_sales, household_demographics, time_dim, store
WHERE ss_sold_time_sk = t_time_sk AND ss_hdemo_sk = hd_demo_sk
  AND ss_store_sk = s_store_sk AND t_hour = 20 AND t_minute >= 30
  AND hd_dep_count = 7 AND s_store_name = 'ese'
""",
    98: """
SELECT i_item_id, i_item_desc, i_category, i_current_price,
       SUM(ss_ext_sales_price) AS itemrevenue
FROM store_sales, item, date_dim
WHERE ss_item_sk = i_item_sk
  AND i_category IN ('Sports', 'Books', 'Home')
  AND ss_sold_date_sk = d_date_sk
  AND d_date BETWEEN DATE '1999-02-22' AND DATE '1999-03-24'
GROUP BY i_item_id, i_item_desc, i_category, i_current_price
ORDER BY i_category, i_item_id
LIMIT 100
""",
    6: """
SELECT a.ca_state AS state, COUNT(*) AS cnt
FROM customer_address a, customer c, store_sales s, date_dim d, item i
WHERE a.ca_address_sk = c.c_current_addr_sk
  AND c.c_customer_sk = s.ss_customer_sk AND s.ss_sold_date_sk = d.d_date_sk
  AND s.ss_item_sk = i.i_item_sk AND d.d_year = 2001 AND d.d_moy = 1
  AND i.i_current_price / 1.2 > (SELECT AVG(j.i_current_price)
                                 FROM item j
                                 WHERE j.i_category = i.i_category)
GROUP BY a.ca_state
HAVING COUNT(*) >= 10
ORDER BY cnt, state
LIMIT 100
""",
    59: """
SELECT s_store_name, d_year, d_moy, SUM(ss_sales_price) AS sales
FROM store_sales, date_dim, store
WHERE ss_sold_date_sk = d_date_sk AND ss_store_sk = s_store_sk
  AND d_year = 2000
GROUP BY s_store_name, d_year, d_moy
ORDER BY s_store_name, d_moy
""",
}
