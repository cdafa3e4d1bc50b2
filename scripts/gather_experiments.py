"""Measure candidate TPU gather implementations against the XLA baseline.

TIMING RULE (hard-won): the axon tunnel MEMOIZES identical dispatches —
timing a chain of calls on the SAME input arrays reports ~0 for
arbitrarily expensive work (this produced a bogus round of results that
claimed 4M random gathers cost 0.03 ms; they cost ~37 ms).  Every
iteration here therefore uses a DISTINCT index array, and kernels are
timed as wall clock over k independent dispatches with a terminal D2H.

The engine's SF1 join tail (Q3/Q5/Q7/Q10: 1-3.5 s) is gather-bound:
join2 stages spend ~85% of their time in ~10 XLA gathers at 6-8M rows
(SF1_STAGE_PROFILE.json + HLO cycle analysis).  This script times the
alternatives on the real chip so the gather path can be redesigned:

  A. XLA jnp.take: random / sorted, flat and row-stacked
  B. lane-batched take_along_axis (tpu.dynamic_gather shape) at several
     operand heights, XLA level and Pallas (VMEM-resident operand)
  C. one-hot select gather for small sources
  D. Pallas replica gather: source chunk broadcast across 128 lanes

Run: python scripts/gather_experiments.py [--rows 4194304]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 22)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    N = args.rows
    reps = args.reps
    rng = np.random.default_rng(7)
    results = []

    # flip the tunnel into real-wait mode
    x = jnp.ones(16)
    jax.block_until_ready(x)
    _ = np.asarray(x)

    def rec(name, ms, note=""):
        print(f"{name:44s} {ms:9.3f} ms  {note}", flush=True)
        results.append({"name": name, "ms": round(ms, 3), "note": note})

    def timeit(fn, inputs, name, note="", per=1.0):
        """Wall clock over len(inputs) independent dispatches on DISTINCT
        inputs, terminal D2H sync; reports per-dispatch ms."""
        outs = fn(*inputs[0])
        jax.block_until_ready(outs)
        _ = np.asarray(jax.tree_util.tree_leaves(outs)[0].ravel()[:1])
        t0 = time.perf_counter()
        outs = [fn(*inp) for inp in inputs]
        jax.block_until_ready(outs)
        _ = np.asarray(jax.tree_util.tree_leaves(outs[-1])[0].ravel()[:1])
        dt = (time.perf_counter() - t0) / len(inputs)
        rec(name, dt * 1e3 * per, note)
        return dt

    # ---------------------------------------------------------------- A: XLA
    src = jnp.asarray(rng.standard_normal(N), dtype=jnp.float32)
    idxs = [jnp.asarray(rng.integers(0, N, N), dtype=jnp.int32)
            for _ in range(reps)]
    sidxs = [jnp.sort(i) for i in idxs]

    @jax.jit
    def take(s, i):
        return jnp.take(s, i)

    timeit(take, [(src, i) for i in idxs], "xla_take_random")
    timeit(take, [(src, i) for i in sidxs], "xla_take_sorted")

    @jax.jit
    def take_sorted_hint(s, i):
        return s.at[i].get(mode="promise_in_bounds", indices_are_sorted=True)

    timeit(take_sorted_hint, [(src, i) for i in sidxs],
           "xla_take_sorted_pib+hint")

    mat8 = jnp.asarray(rng.standard_normal((N, 8)), dtype=jnp.float32)

    @jax.jit
    def take_rows(m, i):
        return jnp.take(m, i, axis=0)

    timeit(take_rows, [(mat8, i) for i in idxs], "xla_take_rows_f32x8",
           "8 cols per row")

    # ------------------------------------ B: lane-batched take_along_axis
    @jax.jit
    def taa(x2d, i2d):
        return jnp.take_along_axis(x2d, i2d, axis=0)

    for S in (8, 512, 4096, 32768):
        if S * 128 > N:
            continue
        x2d = src[: S * 128].reshape(S, 128)
        i2ds = [jnp.asarray(rng.integers(0, S, (S, 128)).astype(np.int32))
                for _ in range(reps)]
        # one op gathers S*128 elements; scale to N
        timeit(taa, [(x2d, i) for i in i2ds], f"xla_take_along_axis(S={S})",
               f"scaled to N from {S * 128}", per=N / (S * 128))

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _taa_kernel(x_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(
            x_ref[:], idx_ref[:].astype(jnp.int32), axis=0)

    for S in (512, 4096):
        T = S * 128
        if T > N:
            continue
        grid = max(1, min(N, 1 << 22) // T)
        x2d = src[:T].reshape(S, 128)
        i2ds = [jnp.asarray(
            rng.integers(0, S, (grid * S, 128)).astype(np.int32))
            for _ in range(reps)]

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
            timeit(jax.jit(run), [(x2d, i) for i in i2ds],
                   f"pallas_take_along_axis(S={S})",
                   f"scaled to N from {grid * T}", per=N / (grid * T))
        except Exception as exc:
            rec(f"pallas_take_along_axis(S={S})", -1.0,
                f"FAILED: {type(exc).__name__}: {str(exc)[:110]}")

    # ---------------------------------------------------- C: one-hot select
    for K in (256, 2048):
        iks = [jnp.asarray(rng.integers(0, K, N), dtype=jnp.int32)
               for _ in range(reps)]

        @jax.jit
        def onehot_gather(s, i, K=K):
            def chunkf(ic):
                oh = ic[:, None] == jnp.arange(K, dtype=jnp.int32)[None, :]
                return jnp.sum(jnp.where(oh, s[None, :K], 0.0), axis=1)

            return jax.lax.map(chunkf, i.reshape(-1, 8192)).reshape(-1)

        timeit(onehot_gather, [(src, i) for i in iks],
               f"xla_onehot_gather(K={K})")

    # ------------------------------- D: Pallas replica gather (small source)
    def _replica_kernel(src_ref, idx_ref, out_ref):
        rep = jnp.broadcast_to(src_ref[:], (src_ref.shape[0], 128))
        out_ref[:] = jnp.take_along_axis(
            rep, idx_ref[:].astype(jnp.int32), axis=0)

    for S in (4096, 8192):
        T = S * 128
        if T > N:
            continue
        grid = max(1, min(N, 1 << 22) // T)
        chunk = src[:S].reshape(S, 1)
        i2ds = [jnp.asarray(
            rng.integers(0, S, (grid * S, 128)).astype(np.int32))
            for _ in range(reps)]

        def run(c, i2d, S=S, grid=grid):
            return pl.pallas_call(
                _replica_kernel,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((S, 1), lambda g: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((S, 128), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((S, 128), lambda g: (g, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((grid * S, 128), jnp.float32),
            )(c, i2d)

        try:
            timeit(jax.jit(run), [(chunk, i) for i in i2ds],
                   f"pallas_replica_gather(S={S})",
                   f"scaled to N from {grid * T}", per=N / (grid * T))
        except Exception as exc:
            rec(f"pallas_replica_gather(S={S})", -1.0,
                f"FAILED: {type(exc).__name__}: {str(exc)[:110]}")

    with open("GATHER_EXPERIMENTS.json", "w") as fh:
        json.dump({"n": N,
                   "date": time.strftime("%Y-%m-%d"),
                   "timing": "wall over distinct-input dispatches "
                             "(tunnel memoizes identical calls)",
                   "results": results}, fh, indent=1)
    print("# wrote GATHER_EXPERIMENTS.json")


if __name__ == "__main__":
    main()
