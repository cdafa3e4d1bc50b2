"""Window function SQL tests vs sqlite (the reference only PLANS window
functions — lqp_translator.cpp:523-526 refuses execution; we execute them)."""

import pytest

from tests.sqlite_oracle import make_env, check_query


@pytest.fixture
def env():
    return make_env(
        {
            "t": {
                "g": ["a", "a", "a", "b", "b", "c"],
                "v": [10, 20, 20, 5, 15, 7],
                "ord": [1, 2, 3, 4, 5, 6],
            }
        }
    )


def test_row_number(env):
    check_query(
        env,
        "SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) FROM t "
        "ORDER BY g, v, ord",
    )


def test_rank_dense_rank(env):
    check_query(
        env,
        "SELECT g, v, RANK() OVER (PARTITION BY g ORDER BY v) FROM t "
        "ORDER BY g, v, ord",
    )
    check_query(
        env,
        "SELECT g, v, DENSE_RANK() OVER (PARTITION BY g ORDER BY v) FROM t "
        "ORDER BY g, v, ord",
    )


def test_window_sum_whole_partition(env):
    check_query(
        env,
        "SELECT g, v, SUM(v) OVER (PARTITION BY g) FROM t ORDER BY g, v, ord",
    )
    check_query(
        env,
        "SELECT g, COUNT(*) OVER (PARTITION BY g) FROM t ORDER BY g, ord",
    )


def test_window_running_sum(env):
    # ROWS-style running sum: make peers unique so frame semantics agree
    check_query(
        env,
        "SELECT g, ord, SUM(ord) OVER (PARTITION BY g ORDER BY ord) FROM t "
        "ORDER BY g, ord",
    )


def test_global_window(env):
    check_query(env, "SELECT v, ROW_NUMBER() OVER (ORDER BY v, ord) FROM t "
                     "ORDER BY v, ord")


def test_lag_lead(env):
    check_query(
        env,
        "SELECT g, ord, LAG(v) OVER (PARTITION BY g ORDER BY ord) FROM t "
        "ORDER BY g, ord",
    )
    check_query(
        env,
        "SELECT g, ord, LEAD(v) OVER (PARTITION BY g ORDER BY ord) FROM t "
        "ORDER BY g, ord",
    )
    check_query(
        env,
        "SELECT g, ord, LAG(v, 2, -1) OVER (PARTITION BY g ORDER BY ord) "
        "FROM t ORDER BY g, ord",
    )
    check_query(
        env,
        "SELECT g, ord, LEAD(v, 2, 0) OVER (PARTITION BY g ORDER BY ord) "
        "FROM t ORDER BY g, ord",
    )


def test_lag_string(env):
    check_query(
        env,
        "SELECT ord, LAG(g) OVER (ORDER BY ord) FROM t ORDER BY ord",
    )


def test_first_last_value(env):
    check_query(
        env,
        "SELECT g, ord, FIRST_VALUE(v) OVER (PARTITION BY g ORDER BY ord) "
        "FROM t ORDER BY g, ord",
    )
    check_query(
        env,
        "SELECT g, ord, LAST_VALUE(v) OVER (PARTITION BY g ORDER BY ord) "
        "FROM t ORDER BY g, ord",
    )


def test_ntile(env):
    check_query(
        env,
        "SELECT ord, NTILE(2) OVER (ORDER BY ord) FROM t ORDER BY ord",
    )
    check_query(
        env,
        "SELECT ord, NTILE(4) OVER (ORDER BY ord) FROM t ORDER BY ord",
    )
    check_query(
        env,
        "SELECT g, ord, NTILE(2) OVER (PARTITION BY g ORDER BY ord) FROM t "
        "ORDER BY g, ord",
    )
