"""The full SQL corpus re-run against 8-way DISTRIBUTED tables — the
analogue of the reference forcing multi-chunk execution paths by running
its sqlite suite at chunk size 10 (ref: sqlite_testrunner.hpp:41).  Every
query either lowers onto the mesh (shard-local stages + collectives) or
takes the gather fallback; both must stay row-equal with sqlite."""

import pytest

from hyrise_tpu.database import Database

from tests.sqlite_oracle import check_query, make_env
from tests.test_sql_corpus import (
    AGG_SHAPES,
    CORRELATED_SHAPES,
    DISTINCT_SHAPES,
    EXPR_SHAPES,
    JOIN_SHAPES,
    NESTED_SHAPES,
    ORDER_SHAPES,
    OUTER_SHAPES,
    PREDICATES,
    SETOP_SHAPES,
    WINDOW_SHAPES,
)
from tests.test_sql_corpus import corpus_tables  # noqa: F401

ALL_SHAPES = (
    [f"SELECT id, grp, val FROM a WHERE {p}" for p in PREDICATES]
    + AGG_SHAPES + JOIN_SHAPES + ORDER_SHAPES + EXPR_SHAPES + SETOP_SHAPES
    + NESTED_SHAPES + CORRELATED_SHAPES + OUTER_SHAPES + DISTINCT_SHAPES
    + WINDOW_SHAPES
)


@pytest.fixture(scope="module")
def denv(corpus_tables):
    # the per-test reset is disabled for this module, so clear whatever
    # the previous module left behind before building the shared env
    Database.reset()
    oracle = make_env(corpus_tables)
    Database.get().distribute(["a", "b"])
    yield oracle
    Database.reset()


# module-scoped Database must survive across the parametrized cases; the
# autouse per-test reset is disabled for this file
@pytest.fixture(autouse=True)
def reset_database():
    yield


@pytest.mark.parametrize("q", ALL_SHAPES)
def test_corpus_distributed(denv, q):
    check_query(denv, q)
