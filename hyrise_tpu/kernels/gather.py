"""Gather kernels tuned for the TPU random-access cliff.

XLA lowers `jnp.take` to per-element HBM random access: ~9-10 ns/row on
v5e regardless of source size (ROOFLINE_TPU.json gather_f32 = 0.9 GB/s,
0.1% of the streaming roofline).  When the SOURCE is small enough to sit
in VMEM, a one-hot compare + masked-sum select replaces the random access
with dense VPU compute at N x K compares — measured 15.3 ms vs 38.8 ms
for 4M lookups into a 2048-slot source (GATHER_EXPERIMENTS.json
xla_onehot_gather), a 2.5x win that grows with column count because the
compare matrix is reused across stacked columns.

Used by Table.take / Column.take for small-capacity sources (dimension
tables: nation, region, SSB date, ...) on accelerator backends; CPU keeps
plain jnp.take (vectorized gathers are already fast there).
Ref analogue: join_hash_steps.hpp output writing gathers the build-side
payload per match; here the small build side is broadcast instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# one-hot cost is N*K compares: profitable vs the ~10 ns/row take up to
# K ~ 4096 (15-30 ms vs 39 ms at 4M lookups); beyond that dense compute
# loses to the latency-bound gather
ONEHOT_SRC_MAX = 4096
# below this many lookups both paths are sub-ms — not worth the extra
# compiled variants
ONEHOT_MIN_IDX = 1 << 16
_CHUNK = 8192


def use_onehot(src_len: int, n_idx: int) -> bool:
    from hyrise_tpu.operators.base import _sync_is_expensive

    return (
        src_len <= ONEHOT_SRC_MAX
        and n_idx >= ONEHOT_MIN_IDX
        and n_idx % _CHUNK == 0  # capacities are powers of two >= 64k
        and _sync_is_expensive()  # accelerator backends only
    )


def onehot_take(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """arr[idx] for small arr (1-D (K,) or 2-D (K, C) row-stacked) via
    chunked one-hot select.  idx must be in [0, K).  Exact for every
    dtype: exactly one slot matches per lookup, so the masked sum adds a
    single value to zeros."""
    k = arr.shape[0]
    was_bool = arr.dtype == jnp.bool_
    vals = arr.astype(jnp.int8) if was_bool else arr
    zero = jnp.zeros((), vals.dtype)
    slots = jnp.arange(k, dtype=jnp.int32)

    def chunkf(ic):
        oh = ic[:, None] == slots[None, :]                 # (CHUNK, K)
        # dtype pinned: jnp.sum would widen small ints to the default int
        if vals.ndim == 1:
            return jnp.sum(jnp.where(oh, vals[None, :], zero), axis=1,
                           dtype=vals.dtype)
        # per-column masked sums keep intermediates at (CHUNK, K); the
        # compare matrix is built once and reused across columns
        return jnp.stack(
            [jnp.sum(jnp.where(oh, vals[None, :, j], zero), axis=1,
                     dtype=vals.dtype)
             for j in range(vals.shape[1])],
            axis=1,
        )

    idx32 = idx.astype(jnp.int32).reshape(-1, _CHUNK)
    out = jax.lax.map(chunkf, idx32)
    out = out.reshape((-1,) if vals.ndim == 1 else (-1, vals.shape[1]))
    return out.astype(jnp.bool_) if was_bool else out
