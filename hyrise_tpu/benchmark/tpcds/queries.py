"""TPC-DS query set (19 of the 99; written from the TPC-DS v3
specification with fixed substitution parameters, adapted where the
generator's statistical approximation lacks a column; ref:
resources/benchmark/tpcds/ in the reference repo).  Covers the store
channel plus the catalog/web channels (Q33/Q60/Q71 multi-channel)."""

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
    34: """
SELECT c_last_name, c_first_name, ss_ticket_number, cnt
FROM (SELECT ss_ticket_number, ss_customer_sk, COUNT(*) AS cnt
      FROM store_sales, date_dim, store, household_demographics
      WHERE ss_sold_date_sk = d_date_sk AND ss_store_sk = s_store_sk
        AND ss_hdemo_sk = hd_demo_sk
        AND (d_dom BETWEEN 1 AND 3 OR d_dom BETWEEN 25 AND 28)
        AND (hd_buy_potential = '>10000' OR hd_buy_potential = '0-500')
        AND hd_vehicle_count > 0
        AND (d_year = 1998 OR d_year = 1999 OR d_year = 2000)
        AND s_county = 'Williamson County'
      GROUP BY ss_ticket_number, ss_customer_sk) dn, customer
WHERE ss_customer_sk = c_customer_sk AND cnt BETWEEN 1 AND 8
ORDER BY c_last_name, c_first_name, ss_ticket_number
LIMIT 100
""",
    48: """
SELECT SUM(ss_quantity) AS total
FROM store_sales, store, customer_demographics, customer_address, date_dim
WHERE s_store_sk = ss_store_sk AND ss_sold_date_sk = d_date_sk
  AND d_year = 1999 AND ss_cdemo_sk = cd_demo_sk
  AND ((cd_marital_status = 'M' AND cd_education_status = '4 yr Degree'
        AND ss_sales_price BETWEEN 100.00 AND 150.00)
    OR (cd_marital_status = 'D' AND cd_education_status = '2 yr Degree'
        AND ss_sales_price BETWEEN 50.00 AND 100.00)
    OR (cd_marital_status = 'S' AND cd_education_status = 'College'
        AND ss_sales_price BETWEEN 150.00 AND 200.00))
  AND ss_addr_sk = ca_address_sk AND ca_country = 'United States'
  AND ((ca_state IN ('TX', 'OH') AND ss_net_profit BETWEEN 100 AND 200)
    OR (ca_state IN ('NY', 'GA', 'IL') AND ss_net_profit BETWEEN 150 AND 300)
    OR (ca_state IN ('CA', 'WA', 'TN') AND ss_net_profit BETWEEN 50 AND 250))
""",
    79: """
SELECT c_last_name, c_first_name, s_city, profit, ss_ticket_number, amt
FROM (SELECT ss_ticket_number, ss_customer_sk, s_city,
             SUM(ss_coupon_amt) AS amt, SUM(ss_net_profit) AS profit
      FROM store_sales, date_dim, store, household_demographics
      WHERE ss_sold_date_sk = d_date_sk AND ss_store_sk = s_store_sk
        AND ss_hdemo_sk = hd_demo_sk
        AND (hd_dep_count = 6 OR hd_vehicle_count > 2) AND d_dow = 1
        AND (d_year = 1998 OR d_year = 1999 OR d_year = 2000)
        AND s_number_employees BETWEEN 200 AND 295
      GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, s_city) ms,
     customer
WHERE ss_customer_sk = c_customer_sk
ORDER BY c_last_name, c_first_name, s_city, profit, ss_ticket_number
LIMIT 100
""",
    # ---- multi-channel (store + catalog + web)
    33: """
SELECT i_manufact_id, SUM(total_sales) AS total_sales
FROM (
  SELECT i_manufact_id, SUM(ss_ext_sales_price) AS total_sales
  FROM store_sales, date_dim, customer_address, item
  WHERE i_manufact_id IN (SELECT i_manufact_id FROM item
                          WHERE i_category = 'Electronics')
    AND ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
    AND d_year = 1998 AND d_moy = 5
    AND ss_addr_sk = ca_address_sk AND ca_gmt_offset = -5
  GROUP BY i_manufact_id
  UNION ALL
  SELECT i_manufact_id, SUM(cs_ext_sales_price) AS total_sales
  FROM catalog_sales, date_dim, customer_address, item
  WHERE i_manufact_id IN (SELECT i_manufact_id FROM item
                          WHERE i_category = 'Electronics')
    AND cs_item_sk = i_item_sk AND cs_sold_date_sk = d_date_sk
    AND d_year = 1998 AND d_moy = 5
    AND cs_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -5
  GROUP BY i_manufact_id
  UNION ALL
  SELECT i_manufact_id, SUM(ws_ext_sales_price) AS total_sales
  FROM web_sales, date_dim, customer_address, item
  WHERE i_manufact_id IN (SELECT i_manufact_id FROM item
                          WHERE i_category = 'Electronics')
    AND ws_item_sk = i_item_sk AND ws_sold_date_sk = d_date_sk
    AND d_year = 1998 AND d_moy = 5
    AND ws_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -5
  GROUP BY i_manufact_id
) tmp1
GROUP BY i_manufact_id
ORDER BY total_sales
LIMIT 100
""",
    60: """
SELECT i_item_id, SUM(total_sales) AS total_sales
FROM (
  SELECT i_item_id, SUM(ss_ext_sales_price) AS total_sales
  FROM store_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item WHERE i_category = 'Music')
    AND ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
    AND d_year = 1998 AND d_moy = 9
    AND ss_addr_sk = ca_address_sk AND ca_gmt_offset = -5
  GROUP BY i_item_id
  UNION ALL
  SELECT i_item_id, SUM(cs_ext_sales_price) AS total_sales
  FROM catalog_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item WHERE i_category = 'Music')
    AND cs_item_sk = i_item_sk AND cs_sold_date_sk = d_date_sk
    AND d_year = 1998 AND d_moy = 9
    AND cs_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -5
  GROUP BY i_item_id
  UNION ALL
  SELECT i_item_id, SUM(ws_ext_sales_price) AS total_sales
  FROM web_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item WHERE i_category = 'Music')
    AND ws_item_sk = i_item_sk AND ws_sold_date_sk = d_date_sk
    AND d_year = 1998 AND d_moy = 9
    AND ws_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -5
  GROUP BY i_item_id
) tmp1
GROUP BY i_item_id
ORDER BY i_item_id, total_sales
LIMIT 100
""",
    71: """
SELECT i_brand_id AS brand_id, i_brand AS brand, t_hour, t_minute,
       SUM(ext_price) AS ext_price
FROM item,
     (SELECT ws_ext_sales_price AS ext_price,
             ws_sold_date_sk AS sold_date_sk,
             ws_item_sk AS sold_item_sk,
             ws_sold_time_sk AS time_sk
      FROM web_sales, date_dim
      WHERE d_date_sk = ws_sold_date_sk AND d_moy = 11 AND d_year = 1999
      UNION ALL
      SELECT cs_ext_sales_price AS ext_price,
             cs_sold_date_sk AS sold_date_sk,
             cs_item_sk AS sold_item_sk,
             cs_sold_time_sk AS time_sk
      FROM catalog_sales, date_dim
      WHERE d_date_sk = cs_sold_date_sk AND d_moy = 11 AND d_year = 1999
      UNION ALL
      SELECT ss_ext_sales_price AS ext_price,
             ss_sold_date_sk AS sold_date_sk,
             ss_item_sk AS sold_item_sk,
             ss_sold_time_sk AS time_sk
      FROM store_sales, date_dim
      WHERE d_date_sk = ss_sold_date_sk AND d_moy = 11 AND d_year = 1999
     ) tmp, time_dim
WHERE sold_item_sk = i_item_sk AND i_manager_id = 1
  AND time_sk = t_time_sk
  AND (t_meal_time = 'breakfast' OR t_meal_time = 'dinner')
GROUP BY i_brand, i_brand_id, t_hour, t_minute
ORDER BY ext_price DESC, i_brand_id, t_hour, t_minute
""",
}
