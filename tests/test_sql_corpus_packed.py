"""Encoding-forced SQL corpus: the FULL differential corpus re-runs with
every eligible column FOR/bit-packed or run-length encoded, exercising the
encodings' interaction surface with all query shapes (ref:
base_test.hpp:84-119 — tests parameterized over all segment encodings;
sqlite_testrunner_encodings.cpp runs the sqlite corpus per encoding).

Profitability gates are bypassed (min_ratio=0) so even tiny corpus
columns actually encode — the stock heuristics would decline them and the
run would silently test nothing."""

import numpy as np
import pytest

import hyrise_tpu.storage.column as C
from hyrise_tpu.storage.compression import encode_numpy, encode_rle_numpy
from tests.sqlite_oracle import make_env

# Reuse every corpus test (fixtures below override by name).
from tests.test_sql_corpus import *  # noqa: F401,F403


@pytest.fixture(autouse=True)
def force_encodings(monkeypatch):
    def forced(data, valid, n, data_type):
        packed = None
        if data_type not in (C.DataType.FLOAT, C.DataType.DOUBLE):
            packed = encode_numpy(data, valid, n, min_ratio=0.0)
        if packed is not None:
            return packed
        return encode_rle_numpy(data, valid, n, min_ratio=0.0)

    monkeypatch.setattr(C, "_choose_encoding", forced)
    yield


@pytest.fixture
def env(corpus_tables):  # noqa: F811 — overrides the imported fixture
    oracle = make_env(corpus_tables, encode=True)
    from hyrise_tpu.database import Database

    db = Database.get()
    encoded = sum(
        1
        for name in corpus_tables
        for c in db.storage_manager.get_table(name).columns
        if c.is_encoded
    )
    assert encoded >= 4, "forced encoding did not take effect"
    return oracle
