"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hyrise_tpu.kernels.pallas_ops import (
    BLOCK_ROWS,
    pallas_dense_group_sum,
    pallas_q6_scan,
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


def test_pallas_q6_scan():
    n = 2 * BLOCK_ROWS
    rng = np.random.default_rng(1)
    shipdate = rng.integers(8500, 9500, size=n).astype(np.int32)
    discount = (rng.integers(0, 11, size=n) / 100).astype(np.float32)
    quantity = rng.integers(1, 51, size=n).astype(np.float32)
    price = (rng.random(n) * 1000).astype(np.float32)
    lo, hi = 8766, 9131
    out = pallas_q6_scan(
        jnp.asarray(shipdate), jnp.asarray(discount), jnp.asarray(quantity),
        jnp.asarray(price), jnp.asarray(lo), jnp.asarray(hi),
    )
    m = (
        (shipdate >= lo) & (shipdate < hi) & (discount >= 0.05 - 1e-9)
        & (discount <= 0.07 + 1e-9) & (quantity < 24)
    )
    expect_rev = (price[m] * discount[m]).sum()
    assert abs(float(out[0]) - expect_rev) / max(expect_rev, 1) < 1e-3
    assert int(out[1]) == int(m.sum())
