"""Operator micro-benchmarks against a speed-of-light HBM roofline
(ref: benchmark/operators/ google-benchmark microbenches — ours additionally
reports the fraction of the memory-bandwidth roofline each kernel reaches,
per the project's performance gate).

Run: python -m hyrise_tpu.benchmark.micro_benchmarks [--rows 16777216]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# Peak HBM bandwidth per chip (GB/s); v5e ~819, v4 ~1228, CPU fallback ~50
HBM_GBPS = {
    "tpu v5 lite": 819.0,
    "tpu v5": 819.0,
    "tpu v4": 1228.0,
    "cpu": 50.0,
}


def _device_bw() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for k, v in HBM_GBPS.items():
        if k in kind:
            return v
    return HBM_GBPS["cpu"] if jax.default_backend() == "cpu" else 819.0


_SYNC_RTT = 0.0  # measured once per process by _calibrate_sync


def _calibrate_sync() -> float:
    """Force real-wait sync semantics and measure the per-sync floor.

    Through the axon tunnel, block_until_ready does not actually wait
    until the process has performed its first device->host transfer;
    afterwards EVERY sync pays a ~24 ms round trip.  Kernels are timed as
    a chain of dispatches per sync with the measured sync floor
    subtracted — per-iteration syncs would read as RTT for every sub-ms
    kernel, and no-D2H timing reads impossibly fast (the >100%-roofline
    artifact in earlier ROOFLINE_TPU.json revisions)."""
    global _SYNC_RTT
    import jax
    import jax.numpy as jnp

    x = jnp.ones(16)
    jax.block_until_ready(x)
    _ = np.asarray(x)  # switch the tunnel into real-wait mode
    times = []
    for _i in range(5):
        y = x + 1.0
        t0 = time.perf_counter()
        jax.block_until_ready(y)
        _ = np.asarray(y[:1])
        times.append(time.perf_counter() - t0)
    _SYNC_RTT = min(times)
    return _SYNC_RTT


_CHAIN = 8  # dispatches per sync when timing


def _time(fn, *args, iters=5, variants=None):
    """Time fn as wall clock over _CHAIN dispatches per sync.

    CRITICAL: the axon tunnel MEMOIZES identical dispatches — a chain of
    calls on the SAME input arrays reports ~0 for arbitrarily expensive
    work (a whole round of gather measurements was bogus-fast because of
    this).  `variants` must supply _CHAIN argument tuples with DISTINCT
    array contents; when omitted, the chain varies the FIRST argument by
    a cheap elementwise rotation so every dispatch is unique."""
    import jax
    import jax.numpy as jnp

    if variants is None:
        first = args[0]

        def variant(k):
            if jnp.issubdtype(first.dtype, jnp.floating):
                head = first + jnp.float32(k).astype(first.dtype)
            elif first.dtype == jnp.bool_:
                head = first
            else:
                head = jnp.bitwise_xor(first, jnp.asarray(k, first.dtype))
            return (head,) + args[1:]

        variants = [variant(k) for k in range(_CHAIN)]
        jax.block_until_ready([v[0] for v in variants])
    out = fn(*variants[0])
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [fn(*v) for v in variants]
        jax.block_until_ready(outs)
        best = min(best, time.perf_counter() - t0)
    return max((best - _SYNC_RTT) / len(variants), 1e-9)


def run_micro_benchmarks(n_rows: int = 1 << 24, iters: int = 5):
    import jax
    import jax.numpy as jnp

    bw = _device_bw() * 1e9
    rng = np.random.default_rng(0)
    results = []
    rtt = _calibrate_sync()
    print(f"# sync floor: {rtt * 1e3:.1f} ms (subtracted; {_CHAIN} "
          f"dispatches per sync)", file=sys.stderr, flush=True)

    def record(name, seconds, bytes_touched, rows):
        achieved = bytes_touched / seconds
        results.append({
            "name": name,
            "ms": round(seconds * 1e3, 3),
            "rows_per_s": round(rows / seconds / 1e6, 1),
            "gb_per_s": round(achieved / 1e9, 1),
            "roofline_fraction": round(achieved / bw, 3),
        })
        # stream progress: remote-tunnel compiles are slow, and a killed
        # run should still leave partial evidence
        print(f"# {results[-1]}", file=sys.stderr, flush=True)

    # ---- scan/filter: 3-predicate fused mask over f32+i32 columns (Q6 shape)
    shipdate = jnp.asarray(rng.integers(8000, 11000, n_rows), dtype=jnp.int32)
    disc = jnp.asarray(rng.random(n_rows), dtype=jnp.float32)
    qty = jnp.asarray(rng.random(n_rows) * 50, dtype=jnp.float32)
    price = jnp.asarray(rng.random(n_rows) * 1000, dtype=jnp.float32)

    @jax.jit
    def scan_agg(shipdate, disc, qty, price):
        m = (shipdate >= 8766) & (shipdate < 9131) & (disc >= 0.05) & \
            (disc <= 0.07) & (qty < 24)
        return jnp.sum(jnp.where(m, price * disc, 0.0), dtype=jnp.float32)

    t = _time(scan_agg, shipdate, disc, qty, price, iters=iters)
    record("scan_filter_agg(q6)", t, n_rows * 16, n_rows)

    # ---- grouped aggregation: dense small-domain groups (Q1 shape)
    slots = jnp.asarray(rng.integers(0, 8, n_rows), dtype=jnp.int32)

    @jax.jit
    def dense_group(slots, price):
        return jax.ops.segment_sum(price, slots, num_segments=8)

    t = _time(dense_group, slots, price, iters=iters)
    record("dense_group_sum(8 groups)", t, n_rows * 8, n_rows)

    # ---- same grouped sum via the Pallas MXU one-hot kernel
    from hyrise_tpu.kernels.pallas_ops import pallas_dense_group_sum

    mask = jnp.ones(n_rows, dtype=bool)
    t = _time(lambda s, p: pallas_dense_group_sum(s, p, mask, 8),
              slots, price, iters=iters)
    record("dense_group_sum_pallas(8 groups)", t, n_rows * 9, n_rows)

    # ---- sort: single int32 key + permutation
    keys32 = jnp.asarray(rng.integers(0, 1 << 30, n_rows), dtype=jnp.int32)

    @jax.jit
    def sort_perm(keys):
        iota = jnp.arange(keys.shape[0], dtype=jnp.int32)
        return jax.lax.sort((keys, iota), num_keys=1)[1]

    t = _time(sort_perm, keys32, iters=iters)
    # sort reads/writes log passes; count 2x as the roofline floor
    record("sort_i32+perm", t, n_rows * 8 * 2, n_rows)

    # ---- join: sorted-build binary-search probe (counts only)
    n_build = n_rows // 8
    bkeys = jnp.asarray(
        np.sort(rng.integers(0, 1 << 30, n_build)), dtype=jnp.int64
    )
    pkeys = jnp.asarray(rng.integers(0, 1 << 30, n_rows), dtype=jnp.int64)

    @jax.jit
    def probe(bkeys, pkeys):
        left = jnp.searchsorted(bkeys, pkeys, side="left")
        right = jnp.searchsorted(bkeys, pkeys, side="right")
        return jnp.sum(right - left)

    t = _time(probe, bkeys, pkeys, iters=iters)
    record("join_probe_binsearch", t, n_rows * 8 + n_build * 8, n_rows)

    # ---- dense direct-address probe (the unique-int-key fast path)
    from hyrise_tpu.kernels import joins as joink

    dkeys = jnp.asarray(rng.permutation(n_build).astype("int32"))
    dprobe = jnp.asarray(rng.integers(0, n_build, n_rows), dtype=jnp.int32)
    ones_b = jnp.ones(n_build, dtype=bool)
    ones_p = jnp.ones(n_rows, dtype=bool)
    slot = joink.dense_build(dkeys, ones_b, 0, n_build)

    @jax.jit
    def dense(slot, pkeys):
        _, counts = joink.dense_probe(slot, pkeys, ones_p, 0, n_build)
        return jnp.sum(counts)

    t = _time(dense, slot, dprobe, iters=iters)
    record("join_probe_dense", t, n_rows * 4 + n_build * 4, n_rows)

    # ---- gather (late materialization)
    idx = jnp.asarray(rng.integers(0, n_rows, n_rows), dtype=jnp.int32)

    @jax.jit
    def gather(price, idx):
        return jnp.take(price, idx)

    t = _time(gather, price, idx, iters=iters)
    record("gather_f32", t, n_rows * 12, n_rows)

    # ---- row-batched gather: the late-materialization fix.  One random
    # access that pulls a whole k-column row amortizes the per-access
    # latency that bounds TPU gathers; Table.take groups same-dtype
    # columns into one such row gather.
    mat8 = jnp.stack([price] * 8, axis=1)

    @jax.jit
    def gather_rows(mat, i):
        return jnp.take(mat, i, axis=0)

    t = _time(gather_rows, mat8, idx, iters=iters)
    record("gather_rows_f32x8", t, n_rows * 8 * 4 + n_rows * 4, n_rows)

    # small-source gather (dense-slot / dictionary-LUT shape): the
    # random-access floor is size-independent — evidence for the
    # cost model notes in kernels/joins.py
    for m in (4096, 32768):
        small = jnp.asarray(rng.integers(0, 1 << 20, m), dtype=jnp.int32)
        sidx = jnp.asarray(rng.integers(0, m, n_rows), dtype=jnp.int32)

        @jax.jit
        def take_small(src, i):
            return jnp.take(src, i)

        t = _time(take_small, small, sidx, iters=iters)
        record(f"gather_small_take(m={m})", t, n_rows * 8 + m * 4, n_rows)

    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 24)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args(argv)
    import jax

    results = run_micro_benchmarks(args.rows, args.iters)
    print(f"# device: {jax.devices()[0].device_kind}, "
          f"roofline {_device_bw()} GB/s, rows={args.rows}", file=sys.stderr)
    for r in results:
        print(
            f"{r['name']:<28} {r['ms']:>9.3f} ms  {r['gb_per_s']:>7.1f} GB/s  "
            f"{r['roofline_fraction']*100:>5.1f}% of roofline",
            file=sys.stderr,
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
