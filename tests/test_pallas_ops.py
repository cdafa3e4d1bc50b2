"""Pallas kernel tests (interpret mode on the CPU mesh) + the engine
integration path (HYRISE_TPU_PALLAS routes dense grouped sums through
the MXU one-hot kernel)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from hyrise_tpu.kernels.pallas_ops import (
    BLOCK_ROWS,
    pallas_dense_group_sum,
    pallas_scan_reduce,
)


def test_pallas_dense_group_sum():
    n = 2 * BLOCK_ROWS
    rng = np.random.default_rng(0)
    slots = rng.integers(0, 16, size=n)
    values = rng.random(n).astype(np.float32)
    mask = rng.random(n) < 0.6
    out = pallas_dense_group_sum(
        jnp.asarray(slots), jnp.asarray(values), jnp.asarray(mask), 128
    )
    for s in range(16):
        expect = values[(slots == s) & mask].sum()
        assert abs(float(out[s]) - expect) < 1e-2
    assert float(jnp.sum(out[16:])) == 0.0


def test_pallas_dense_group_sum_unpadded_rows():
    # non-BLOCK_ROWS-multiple inputs pad internally with mask=False
    n = BLOCK_ROWS + 77
    rng = np.random.default_rng(2)
    slots = rng.integers(0, 4, size=n)
    values = np.ones(n, dtype=np.float32)
    mask = np.ones(n, dtype=bool)
    out = pallas_dense_group_sum(
        jnp.asarray(slots), jnp.asarray(values), jnp.asarray(mask), 8
    )
    assert float(jnp.sum(out)) == float(n)


def test_pallas_scan_reduce_parameterized():
    n = 2 * BLOCK_ROWS
    rng = np.random.default_rng(1)
    shipdate = rng.integers(8500, 9500, size=n).astype(np.int32)
    discount = (rng.integers(0, 11, size=n) / 100).astype(np.float32)
    quantity = rng.integers(1, 51, size=n).astype(np.float32)
    price = (rng.random(n) * 1000).astype(np.float32)
    for lo, hi, dlo, dhi, qhi in ((8766, 9131, 0.05, 0.07, 24.0),
                                  (8600, 9400, 0.02, 0.09, 40.0)):
        out = pallas_scan_reduce(
            jnp.asarray(shipdate), jnp.asarray(discount),
            jnp.asarray(quantity), jnp.asarray(price),
            lo, hi, dlo - 1e-9, dhi + 1e-9, qhi,
        )
        m = (
            (shipdate >= lo) & (shipdate < hi) & (discount >= dlo - 1e-9)
            & (discount <= dhi + 1e-9) & (quantity < qhi)
        )
        expect_rev = (price[m] * discount[m]).sum()
        assert abs(float(out[0]) - expect_rev) / max(expect_rev, 1) < 1e-3
        assert int(out[1]) == int(m.sum())


def test_engine_dense_aggregate_via_pallas(monkeypatch):
    """SQL GROUP BY routes its dense-slot sums/counts through the Pallas
    kernel when HYRISE_TPU_PALLAS=1 — results match the XLA path."""
    monkeypatch.setenv("HYRISE_TPU_PALLAS", "1")
    from hyrise_tpu.database import Database
    from hyrise_tpu.sql.pipeline import sql
    from hyrise_tpu.storage.table import Table

    # unique row count so no earlier-traced stage shape is reused (the
    # flag is read at trace time)
    n = 4321
    rng = np.random.default_rng(3)
    db = Database.get()
    db.storage_manager.add_table("p", Table.from_dict({
        "g": [int(x) for x in rng.integers(0, 6, size=n)],
        "v": [float(np.float32(x)) for x in rng.random(n)],
    }))
    got = sql("SELECT g, COUNT(*), SUM(v) FROM p GROUP BY g ORDER BY g"
              ).to_pylist()
    base = db.storage_manager.get_table("p")
    gs = np.asarray(base.column("g").data)[:n]
    vs = np.asarray(base.column("v").data)[:n]
    for g, cnt, s in got:
        assert cnt == int((gs == g).sum())
        assert abs(s - float(vs[gs == g].sum())) < 1e-3

