"""Measure candidate TPU gather implementations against the XLA baseline.

The engine's SF1 join tail (Q3/Q5/Q7/Q10: 1-2.7 s) is dominated by random
`jnp.take` at 6M rows, which ROOFLINE_TPU.json pins at ~0.1% of HBM
bandwidth.  This script times the alternatives on the real chip so the
engine's gather dispatch can be cost-based:

  A. XLA jnp.take: random / sorted (+promise-in-bounds / sorted hints)
  B. lane-batched take_along_axis: out[i,j] = x[idx[i,j], j] — the shape
     Mosaic lowers to tpu.dynamic_gather; measured at BOTH the XLA level
     and inside a Pallas kernel, for several operand heights S
  C. segmented monotonic gather: source pre-laid as (N/128, 128) with one
     source SEGMENT per lane; monotonic indices partition into per-lane
     contiguous runs -> ONE take_along_axis + two parallel scatters
  D. one-hot select gather for tiny sources (VPU compare+sum)

Run: python scripts/gather_experiments.py [--rows 4194304]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 22)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from hyrise_tpu.benchmark.micro_benchmarks import (
        _calibrate_sync,
        _time,
    )

    N = args.rows
    rng = np.random.default_rng(7)
    rtt = _calibrate_sync()
    print(f"# sync RTT floor: {rtt * 1e3:.2f} ms, N={N}", flush=True)
    results = []

    def rec(name, ms, note=""):
        print(f"{name:44s} {ms:9.3f} ms  {note}", flush=True)
        results.append({"name": name, "ms": round(ms, 3), "note": note})

    # ---------------------------------------------------------------- A: XLA
    src = jnp.asarray(rng.standard_normal(N), dtype=jnp.float32)
    idx_rand = jnp.asarray(rng.integers(0, N, N), dtype=jnp.int32)
    idx_sorted = jnp.sort(idx_rand)

    @jax.jit
    def take(s, i):
        return jnp.take(s, i)

    @jax.jit
    def take_pib(s, i):
        return s.at[i].get(mode="promise_in_bounds")

    @jax.jit
    def take_pib_sorted(s, i):
        return s.at[i].get(mode="promise_in_bounds", indices_are_sorted=True)

    rec("xla_take_random", _time(take, src, idx_rand, iters=args.iters))
    rec("xla_take_random_pib", _time(take_pib, src, idx_rand, iters=args.iters))
    rec("xla_take_sorted", _time(take, src, idx_sorted, iters=args.iters))
    rec("xla_take_sorted_pib+hint",
        _time(take_pib_sorted, src, idx_sorted, iters=args.iters))

    # source-size sweep: gather a FIXED 4M indices from growing sources —
    # ROOFLINE_TPU.json's 54 ms was at a 16M-row (64 MB) source while 4M
    # (16 MB) rows measure ~0.03 ms; find the cliff (VMEM capacity?)
    n_out_fixed = min(N, 1 << 22)
    for logS in (22, 23, 24, 25):
        Ssz = 1 << logS
        big = jnp.asarray(rng.standard_normal(Ssz), dtype=jnp.float32)
        ib = jnp.asarray(rng.integers(0, Ssz, n_out_fixed), dtype=jnp.int32)
        rec(f"xla_take_random(src=2^{logS})",
            _time(take, big, ib, iters=args.iters),
            f"{Ssz * 4 // (1 << 20)} MB source")
        del big, ib
    # row-batched: 8 f32 columns stacked, 4M rows source
    mat = jnp.asarray(
        rng.standard_normal((1 << 22, 8)), dtype=jnp.float32)
    im = jnp.asarray(rng.integers(0, 1 << 22, n_out_fixed), dtype=jnp.int32)

    @jax.jit
    def take_rows(m, i):
        return jnp.take(m, i, axis=0)

    rec("xla_take_rows_f32x8(src=2^22)",
        _time(take_rows, mat, im, iters=args.iters), "128 MB source")
    del mat, im

    # ------------------------------------ B: lane-batched take_along_axis
    # out[i,j] = x[idx[i,j], j]: per-lane gather across S sublanes.  The
    # scaling over S reveals the hardware dynamic-gather cost model.
    for S in (8, 512, 4096, 32768):
        if S * 128 > N:
            continue
        n_ops = max(S * 128, min(N, 1 << 22))
        reps = n_ops // (S * 128)
        x2d = src[: S * 128].reshape(S, 128)
        i3d = jnp.asarray(
            rng.integers(0, S, (reps, S, 128)).astype(np.int32))

        def run(x2d, i3d):
            return jax.lax.map(
                lambda ib: jnp.take_along_axis(x2d, ib, axis=0), i3d)

        ms = _time(jax.jit(run), x2d, i3d, iters=args.iters)
        scaled = ms * (N / n_ops)
        rec(f"xla_take_along_axis(S={S})", ms,
            f"{n_ops} outs; {scaled:.3f} ms scaled to N")

    # Pallas versions: same op inside a kernel, operand resident in VMEM
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _taa_kernel(x_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)

    for S in (512, 4096, 8192):
        T = S * 128
        if T > N:
            continue
        n_out = max(T, (min(N, 1 << 22) // T) * T)
        grid = n_out // T
        x2d = src[:T].reshape(S, 128)
        i2d = jnp.asarray(rng.integers(0, S, (grid * S, 128)).astype(np.int32))

        def run(x2d, i2d, S=S, grid=grid):
            return pl.pallas_call(
                _taa_kernel,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((S, 128), lambda g: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((S, 128), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((S, 128), lambda g: (g, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((grid * S, 128), jnp.float32),
            )(x2d, i2d)

        try:
            ms = _time(jax.jit(run), x2d, i2d, iters=args.iters)
            scaled = ms * (N / n_out)
            rec(f"pallas_take_along_axis(S={S})", ms,
                f"{n_out} outs; {scaled:.3f} ms scaled to N")
        except Exception as exc:
            rec(f"pallas_take_along_axis(S={S})", -1.0,
                f"FAILED: {type(exc).__name__}: {str(exc)[:110]}")

    # --------------------------------------- C: segmented monotonic gather
    # src laid out as (R, 128), column s = contiguous source segment s
    # (a one-time relayout per stored column).  For MONOTONIC indices the
    # outputs hitting segment s are a contiguous run; build the per-lane
    # index matrix with a parallel scatter, gather with ONE
    # take_along_axis, scatter results back to flat order.
    R = N // 128
    src2d = src.reshape(128, R).T  # column s holds src[s*R:(s+1)*R]

    @jax.jit
    def segmented_gather(src2d, idx):
        R = src2d.shape[0]
        n = idx.shape[0]
        seg = (idx // R).astype(jnp.int32)          # target lane, sorted
        off = (idx % R).astype(jnp.int32)
        # run starts per segment: searchsorted over the sorted seg vector
        seg_start = jnp.searchsorted(
            seg, jnp.arange(128, dtype=jnp.int32), side="left")
        within = jnp.arange(n, dtype=jnp.int32) - jnp.take(seg_start, seg)
        H = R + 8192  # per-lane capacity: ~uniform counts + skew slack
        # scatter offsets into the (H, 128) lane layout (unique positions)
        I = jnp.zeros((H, 128), dtype=jnp.int32).at[within, seg].set(
            off, mode="drop", unique_indices=True)
        y = jnp.take_along_axis(src2d, I, axis=0)
        # scatter back to flat output order
        out = jnp.zeros(n, dtype=src2d.dtype).at[
            jnp.take(seg_start, seg) + within
        ].set(y[within, seg], mode="drop", unique_indices=True)
        return out

    # NOTE: y[within, seg] above is itself a 2D gather — replace with the
    # identity layout: read back via the same (within, seg) positions used
    # to scatter.  Equivalent formulation: flatten y in lane-major order
    # and gather flat positions within*128+seg — measure as-is first.
    try:
        ms = _time(segmented_gather, src2d, idx_sorted, iters=args.iters)
        ok = bool(jnp.array_equal(segmented_gather(src2d, idx_sorted),
                                  take(src, idx_sorted)))
        rec("xla_segmented_monotonic", ms, f"correct={ok}")
    except Exception as exc:
        rec("xla_segmented_monotonic", -1.0,
            f"FAILED: {type(exc).__name__}: {str(exc)[:110]}")

    # ---------------------------------------------------- D: one-hot select
    @functools.partial(jax.jit, static_argnames=("K",))
    def onehot_gather(s, i, K):
        def chunkf(ic):
            oh = (ic[:, None] == jnp.arange(K)[None, :])
            return jnp.sum(jnp.where(oh, s[None, :K], 0.0), axis=1)

        return jax.lax.map(chunkf, i.reshape(-1, 8192)).reshape(-1)

    for K in (256, 2048):
        ik = jnp.asarray(rng.integers(0, K, N), dtype=jnp.int32)
        rec(f"xla_onehot_gather(K={K})",
            _time(lambda s, i: onehot_gather(s, i, K), src, ik,
                  iters=args.iters))

    with open("GATHER_EXPERIMENTS.json", "w") as fh:
        json.dump({"n": N, "rtt_ms": round(rtt * 1e3, 3),
                   "date": time.strftime("%Y-%m-%d"),
                   "results": results}, fh, indent=1)
    print("# wrote GATHER_EXPERIMENTS.json")


if __name__ == "__main__":
    main()
