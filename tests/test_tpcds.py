"""TPC-DS store-channel differential test vs sqlite at tiny scale."""

import pytest

from hyrise_tpu.benchmark.tpcds.generator import TPCDSTableGenerator
from hyrise_tpu.benchmark.tpcds.queries import TPCDS_QUERIES
from hyrise_tpu.database import Database
from hyrise_tpu.sql.pipeline import SQLPipelineBuilder

from tests.sqlite_oracle import SQLiteOracle, rows_match
from tests.test_tpch import sqlite_compat

_GENERATED = {}


@pytest.fixture
def tpcds_env():
    sf = 0.003
    if sf not in _GENERATED:
        _GENERATED[sf] = TPCDSTableGenerator(
            scale_factor=sf, demo_density=0.05
        ).generate()
    db = Database.get()
    oracle = SQLiteOracle()
    for name, t in _GENERATED[sf].items():
        db.storage_manager.add_table(name, t)
        oracle.load_table(name, t)
    return oracle


from hyrise_tpu.benchmark.tpcds.queries import ROLLUP_QIDS


@pytest.mark.parametrize(
    "qid", [q for q in sorted(TPCDS_QUERIES) if q not in ROLLUP_QIDS]
)
def test_tpcds_query(tpcds_env, qid):
    sql = TPCDS_QUERIES[qid]
    ours = SQLPipelineBuilder(sql).create_pipeline().get_result_table().to_pylist()
    theirs = tpcds_env.execute(sqlite_compat(sql))
    assert rows_match(ours, theirs, ordered=False), (
        f"TPC-DS {qid}: ours={len(ours)} sqlite={len(theirs)}\n"
        f"{ours[:5]}\n{theirs[:5]}"
    )


def _rollup_union(select_keys, aggs, from_where, order_limit):
    """sqlite has no ROLLUP: build the equivalent UNION ALL over key
    prefixes (keys beyond the prefix project as NULL)."""
    branches = []
    n = len(select_keys)
    for k in range(n, -1, -1):
        cols = select_keys[:k] + [f"NULL AS {c.split('.')[-1]}"
                                  for c in select_keys[k:]]
        gb = f" GROUP BY {', '.join(select_keys[:k])}" if k else ""
        branches.append(
            f"SELECT {', '.join(cols + aggs)} {from_where}{gb}"
        )
    return " UNION ALL ".join(branches) + " " + order_limit


def _channel_rollup_oracle(sql: str) -> str:
    """q5/q77/q80 shape: SELECT channel, id, aggs FROM (...) x
    GROUP BY ROLLUP (channel, id) — expand the rollup into the 3-level
    UNION ALL sqlite understands."""
    marker = "GROUP BY ROLLUP (channel, id)"
    assert marker in sql, "channel-rollup shape changed; oracle is stale"
    head, tail = sql.split(marker)
    final = head[head.index("SELECT channel"):]
    assert "channel, id," in final
    return (head + "GROUP BY channel, id UNION ALL "
            + final.replace("channel, id,", "channel, NULL,", 1)
            + "GROUP BY channel UNION ALL "
            + final.replace("SELECT channel, id,", "SELECT NULL, NULL,", 1)
            + tail)


def _q70_oracle() -> str:
    """q70: ROLLUP(s_state, s_county) with GROUPING() in the RANK
    partition — per-branch GROUPING constants, like the q86 oracle."""
    base = """SELECT SUM(ss_net_profit) AS total_sum, {st} AS s_state,
  {co} AS s_county, {loch} AS lochierarchy,
  RANK() OVER (PARTITION BY {loch}, CASE WHEN {gco} = 0 THEN {st} END
               ORDER BY SUM(ss_net_profit) DESC) AS rank_within_parent
FROM store_sales, date_dim d1, store
WHERE d1.d_month_seq BETWEEN 24 AND 35 AND d1.d_date_sk = ss_sold_date_sk
  AND s_store_sk = ss_store_sk
  AND s_state IN (SELECT s_state FROM (SELECT s_state,
      RANK() OVER (PARTITION BY s_state
                   ORDER BY SUM(ss_net_profit) DESC) AS ranking
      FROM store_sales, store, date_dim
      WHERE d_month_seq BETWEEN 24 AND 35 AND d_date_sk = ss_sold_date_sk
        AND s_store_sk = ss_store_sk GROUP BY s_state) tmp1
      WHERE ranking <= 5)
{gb}"""
    union = " UNION ALL ".join([
        base.format(st="s_state", co="s_county", loch=0, gco=0,
                    gb="GROUP BY s_state, s_county"),
        base.format(st="s_state", co="NULL", loch=1, gco=1,
                    gb="GROUP BY s_state"),
        base.format(st="NULL", co="NULL", loch=2, gco=1, gb=""),
    ])
    return ("SELECT * FROM (" + union + ") u ORDER BY lochierarchy DESC, "
            "CASE WHEN lochierarchy = 0 THEN s_state END, "
            "rank_within_parent LIMIT 100")


@pytest.mark.parametrize("qid", [q for q in sorted(ROLLUP_QIDS) if q not in (36, 86)])
def test_tpcds_rollup_query(tpcds_env, qid):  # 36,86 have dedicated tests
    if qid != 67:  # 67 runs a canonicalized variant below
        ours = (SQLPipelineBuilder(TPCDS_QUERIES[qid]).create_pipeline()
                .get_result_table().to_pylist())
    if qid == 22:
        theirs = tpcds_env.execute(_rollup_union(
            ["i_product_name", "i_brand", "i_class", "i_category"],
            ["AVG(inv_quantity_on_hand) AS qoh"],
            "FROM inventory, date_dim, item "
            "WHERE inv_date_sk = d_date_sk AND inv_item_sk = i_item_sk "
            "AND d_month_seq BETWEEN 24 AND 35",
            "ORDER BY qoh, i_product_name, i_brand, i_class, i_category "
            "LIMIT 100",
        ))
    elif qid == 27:
        rollup_sql = _rollup_union(
            ["i_item_id", "s_state"],
            ["0 AS g_state", "AVG(ss_quantity) AS agg1",
             "AVG(ss_list_price) AS agg2", "AVG(ss_coupon_amt) AS agg3",
             "AVG(ss_sales_price) AS agg4"],
            "FROM store_sales, customer_demographics, date_dim, store, item "
            "WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk "
            "AND ss_store_sk = s_store_sk AND ss_cdemo_sk = cd_demo_sk "
            "AND cd_gender = 'M' AND cd_marital_status = 'S' "
            "AND cd_education_status = 'College' "
            "AND d_year = 2000 AND s_state = 'TN'",
            "ORDER BY i_item_id, s_state LIMIT 100",
        )
        # Higher rollup levels NULL out s_state, so GROUPING(s_state)=1 there.
        assert "NULL AS s_state, 0 AS g_state" in rollup_sql, \
            "_rollup_union output format changed; q27 GROUPING oracle is stale"
        theirs = tpcds_env.execute(rollup_sql.replace(
            "NULL AS s_state, 0 AS g_state", "NULL AS s_state, 1 AS g_state"))
    elif qid in (5, 77, 80):
        theirs = tpcds_env.execute(sqlite_compat(
            _channel_rollup_oracle(TPCDS_QUERIES[qid])))
    elif qid == 70:
        theirs = tpcds_env.execute(sqlite_compat(_q70_oracle()))
    elif qid == 18:
        theirs = tpcds_env.execute(_rollup_union(
            ["i_item_id", "ca_country", "ca_state", "ca_county"],
            ["AVG(cs_quantity)", "AVG(cs_list_price)", "AVG(cs_coupon_amt)",
             "AVG(cs_sales_price)", "AVG(cs_net_profit)",
             "AVG(c_birth_year)", "AVG(cd_dep_count)"],
            "FROM catalog_sales, customer_demographics, customer, "
            "customer_address, date_dim, item "
            "WHERE cs_sold_date_sk = d_date_sk AND cs_item_sk = i_item_sk "
            "AND cs_cdemo_sk = cd_demo_sk "
            "AND cs_bill_customer_sk = c_customer_sk AND cd_gender = 'F' "
            "AND c_current_addr_sk = ca_address_sk AND d_year = 2000",
            "ORDER BY ca_country, ca_state, ca_county, i_item_id LIMIT 100",
        ))
    else:  # 67
        # Canonicalize the float SUM to 2 decimals BEFORE the RANK: summation
        # -order drift (engine vs sqlite) otherwise flips near-ties at the
        # rk<=10 / LIMIT 100 boundaries and the row SETS genuinely differ
        # (ref: utils/check_table_equal.cpp canonicalizes before comparing).
        # Both engines get the same rounding, so ties become exact ties and
        # RANK selects identical sets.
        ours = (SQLPipelineBuilder(TPCDS_QUERIES[qid].replace(
            "SUM(ss_sales_price * ss_quantity) AS sumsales",
            "ROUND(SUM(ss_sales_price * ss_quantity), 2) AS sumsales"))
            .create_pipeline().get_result_table().to_pylist())
        inner = _rollup_union(
            ["i_category", "i_class", "i_brand", "i_product_name",
             "d_year", "d_qoy", "d_moy", "s_store_id"],
            ["ROUND(SUM(ss_sales_price * ss_quantity), 2) AS sumsales"],
            "FROM store_sales, date_dim, store, item "
            "WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk "
            "AND ss_store_sk = s_store_sk AND d_month_seq BETWEEN 24 AND 35",
            "",
        )
        theirs = tpcds_env.execute(
            "SELECT * FROM (SELECT i_category, i_class, i_brand, "
            "i_product_name, d_year, d_qoy, d_moy, s_store_id, sumsales, "
            "RANK() OVER (PARTITION BY i_category ORDER BY sumsales DESC) "
            f"AS rk FROM ({inner}) dw1) dw2 WHERE rk <= 10 "
            "ORDER BY i_category, i_class, i_brand, i_product_name, d_year,"
            " d_qoy, d_moy, s_store_id, sumsales, rk LIMIT 100"
        )
    assert rows_match(ours, theirs, ordered=False), (
        f"TPC-DS rollup {qid}: ours={len(ours)} sqlite={len(theirs)}\n"
        f"{ours[:4]}\n{theirs[:4]}"
    )


def test_tpcds_q86_rollup_window(tpcds_env):
    """Q86: ROLLUP + GROUPING() inside the RANK window's partition."""
    ours = (SQLPipelineBuilder(TPCDS_QUERIES[86]).create_pipeline()
            .get_result_table().to_pylist())
    base = (
        "SELECT SUM(ws_net_paid) AS total_sum, {cat} AS i_category, "
        "{cls} AS i_class, {loch} AS lochierarchy "
        "FROM web_sales, date_dim, item "
        "WHERE d_month_seq BETWEEN 24 AND 35 "
        "AND d_date_sk = ws_sold_date_sk AND i_item_sk = ws_item_sk {gb}"
    )
    union = " UNION ALL ".join([
        base.format(cat="i_category", cls="i_class", loch=0,
                    gb="GROUP BY i_category, i_class"),
        base.format(cat="i_category", cls="NULL", loch=1,
                    gb="GROUP BY i_category"),
        base.format(cat="NULL", cls="NULL", loch=2, gb=""),
    ])
    theirs = tpcds_env.execute(
        "SELECT total_sum, i_category, i_class, lochierarchy, "
        "RANK() OVER (PARTITION BY lochierarchy, "
        "CASE WHEN lochierarchy = 0 THEN i_category END "
        "ORDER BY total_sum DESC) AS rank_within_parent "
        f"FROM ({union}) u "
        "ORDER BY lochierarchy DESC, rank_within_parent LIMIT 100"
    )
    assert rows_match(ours, theirs, ordered=False), (
        f"Q86: ours={len(ours)} sqlite={len(theirs)}\n{ours[:4]}\n{theirs[:4]}"
    )


def test_tpcds_q36_rollup_window(tpcds_env):
    """Q36: store-channel gross-margin rollup + grouping-level RANK."""
    ours = (SQLPipelineBuilder(TPCDS_QUERIES[36]).create_pipeline()
            .get_result_table().to_pylist())
    base = (
        "SELECT SUM(ss_net_profit)*1.0 / SUM(ss_ext_sales_price) "
        "AS gross_margin, {cat} AS i_category, {cls} AS i_class, "
        "{loch} AS lochierarchy "
        "FROM store_sales, date_dim, item, store "
        "WHERE d_year = 2000 AND d_date_sk = ss_sold_date_sk "
        "AND i_item_sk = ss_item_sk AND s_store_sk = ss_store_sk {gb}"
    )
    union = " UNION ALL ".join([
        base.format(cat="i_category", cls="i_class", loch=0,
                    gb="GROUP BY i_category, i_class"),
        base.format(cat="i_category", cls="NULL", loch=1,
                    gb="GROUP BY i_category"),
        base.format(cat="NULL", cls="NULL", loch=2, gb=""),
    ])
    theirs = tpcds_env.execute(
        "SELECT gross_margin, i_category, i_class, lochierarchy, "
        "RANK() OVER (PARTITION BY lochierarchy, "
        "CASE WHEN lochierarchy = 0 THEN i_category END "
        "ORDER BY gross_margin ASC) AS rank_within_parent "
        f"FROM ({union}) u "
        "ORDER BY lochierarchy DESC, rank_within_parent LIMIT 100"
    )
    assert rows_match(ours, theirs, ordered=False), (
        f"Q36: ours={len(ours)} sqlite={len(theirs)}\n{ours[:4]}\n{theirs[:4]}"
    )
