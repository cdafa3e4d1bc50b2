"""Compiled operator stages: trace an operator's device computation once
per (plan-node, table-shape) signature and reuse the XLA executable.

This is the "static dataflow of kernels" execution model from the north
star: instead of eagerly dispatching each jnp op (host overhead per op —
ruinous through a remote TPU tunnel), each operator's whole device stage
becomes ONE fused jitted computation.  Shape decisions (join expansion
size, group counts) remain the only host sync points, and row counts are
passed as traced scalars so changing data does NOT retrace.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from hyrise_tpu.storage.column import Column
from hyrise_tpu.storage.table import Table

_CACHE: Dict[tuple, Callable] = {}
# stage executables close over their first-execution inputs (builder
# closures reference the operator graph), so an unbounded cache pins
# device memory; FIFO-evict beyond the cap (re-execution recompiles)
_CACHE_CAP = int(os.environ.get("HYRISE_TPU_STAGE_CACHE_CAP", "8192"))


def _cache_put(key, value) -> None:
    if len(_CACHE) >= _CACHE_CAP:
        _CACHE.pop(next(iter(_CACHE)))
    _CACHE[key] = value

# Opt-in per-stage wall timing (forces a device sync per stage — only for
# profiling; ref: step-level OperatorPerformanceData,
# operator_performance_data.hpp:29-68)
PROFILE_STAGES = os.environ.get("HYRISE_TPU_PROFILE_STAGES", "0") == "1"
STAGE_TIMES: Dict[str, float] = {}


def _record(tag: str, out, t0: float) -> None:
    if PROFILE_STAGES:
        jax.block_until_ready(out)
        STAGE_TIMES[tag] = STAGE_TIMES.get(tag, 0.0) + (time.perf_counter() - t0)


class _ParamSlot:
    """Marker: numeric parameter pid lives at `idx` of the int64/float64
    parameter vector (kind 'i'/'f')."""

    __slots__ = ("kind", "idx")

    def __init__(self, kind: str, idx: int):
        self.kind = kind
        self.idx = idx


def split_params(parameters: Optional[Dict[int, object]]):
    """Split parameter bindings into traced scalars vs static key material.

    Numeric parameter VALUES pack into ONE int64 + ONE float64 device
    vector fed to the stage as traced inputs, so a prepared statement
    executed with new values reuses the SAME compiled executable (the
    OLTP make-or-break: without this, every TPC-C statement recompiles)
    and binding costs two uploads regardless of parameter count (the
    batched TPC-C statements carry 76 parameters — one 0-d upload each
    dominated statement latency).  Strings / None / exotic types stay
    baked into the trace and keyed by value (string literals drive HOST
    dictionary lookups and cannot be traced).

    -> (bound: dict pid->value-or-slot, traced_vals: tuple, key: tuple)
    """
    if not parameters:
        return {}, (), ()
    import numpy as np

    ints: List[int] = []
    longs: List[int] = []
    floats: List[float] = []
    key: List = []
    bound: Dict[int, object] = {}
    for pid in sorted(parameters):
        v = parameters[pid]
        if isinstance(v, bool) or not isinstance(
            v, (int, float, np.integer, np.floating)
        ):
            bound[pid] = v
            key.append((pid, "static", v))
            continue
        if isinstance(v, (int, np.integer)):
            # int32 when the value fits: an int64 parameter promotes every
            # comparison against int32 columns to 64-bit — 2x the passes
            # on CPU and the emulated-64-bit tax on TPU (values >= 2^31
            # re-key the stage and recompile once, which OLTP ids never do)
            if -(2**31) <= int(v) < 2**31:
                bound[pid] = _ParamSlot("i", len(ints))
                ints.append(int(v))
                key.append((pid, "int32"))
            else:
                bound[pid] = _ParamSlot("l", len(longs))
                longs.append(int(v))
                key.append((pid, "int64"))
        else:
            bound[pid] = _ParamSlot("f", len(floats))
            floats.append(float(v))
            key.append((pid, "float64"))
    # empty groups stay None: an empty device vector still costs a
    # device_put per stage dispatch, and most OLTP statements bind only
    # one numeric kind (pkey records the kinds, so cache keys agree)
    traced_vals = (
        jnp.asarray(np.asarray(ints, dtype=np.int32)) if ints else None,
        jnp.asarray(np.asarray(longs, dtype=np.int64)) if longs else None,
        jnp.asarray(np.asarray(floats, dtype=np.float64)) if floats else None,
    )
    return bound, traced_vals, tuple(key)


def rebind_params(bound: Dict[int, object], traced: tuple) -> Dict[int, object]:
    """Swap the parameter slots in `bound` for scalar slices of their
    traced parameter vectors."""
    if not traced:
        return dict(bound)
    ivec, lvec, fvec = traced
    vecs = {"i": ivec, "l": lvec, "f": fvec}
    out = {}
    for pid, v in bound.items():
        if isinstance(v, _ParamSlot):
            out[pid] = vecs[v.kind][v.idx]
        else:
            out[pid] = v
    return out


def table_signature(table: Table, used_cols=None) -> tuple:
    """Cache-key material for a stage input table.

    `used_cols` (frozenset of column indices, from the stage's expression
    set) scopes DICTIONARY identity to the columns the builder actually
    consults: a stage bakes dictionary values (LUTs, literal codes, output
    metadata) only for referenced columns, so growth of an unreferenced
    column's dictionary must not re-key — and recompile — the stage.
    OLTP inserts of fresh strings (TPC-C ol_dist_info/h_data) otherwise
    recompile every statement on the table.  None = conservative (all)."""
    return (
        table.capacity,
        tuple(table.column_names),
        table.selection is not None,
        tuple(
            (
                c.data_type,
                c.data.signature() if c.is_encoded else str(c.data.dtype),
                c.validity is not None,
                (id(c.dictionary)
                 if c.dictionary is not None
                 and (used_cols is None or i in used_cols)
                 else None),
                c.dict_sorted,
            )
            for i, c in enumerate(table.columns)
        ),
    )


def _flatten(table: Table):
    # encoded columns ship their payload arrays; decode happens inside
    # the traced stage (_rebuild) so XLA fuses the shift+mask (packed) or
    # searchsorted+gather (RLE) into consumers.  The traced FOR reference
    # keeps packed executables reusable across datasets w/ different minima
    datas = [
        (c.data.words, c.data.reference_scalar()) if c.is_packed
        else (c.data.values, c.data.run_ends) if c.is_rle
        else c.data
        for c in table.columns
    ]
    valids = [c.validity for c in table.columns]
    sel = table.selection
    nr = _nr_scalar(table.num_rows)
    return datas, valids, sel, nr


# row-count scalars repeat across dispatches; reusing the device array
# avoids one tiny host->device transfer per stage run
_NR_CACHE: Dict[object, jax.Array] = {}


def _nr_scalar(n) -> jax.Array:
    if isinstance(n, jax.Array) or hasattr(n, "aval"):
        # already on device (deferred counts) or traced — forcing int(n)
        # here would introduce the very sync the deferred-count design
        # removes
        return jnp.asarray(n, dtype=jnp.int64)
    key = int(n)
    a = _NR_CACHE.get(key)
    if a is None:
        if len(_NR_CACHE) > 8192:
            _NR_CACHE.clear()
        a = jnp.asarray(key, dtype=jnp.int64)
        _NR_CACHE[key] = a
    return a


def _rebuild(table: Table, datas, valids, sel, nr) -> Table:
    from hyrise_tpu.storage.compression import unpack_device, unrle_device

    cols = [
        Column(
            c.data_type,
            unpack_device(d[0], c.data, reference=d[1]) if c.is_packed
            else unrle_device(d[0], d[1], c.data) if c.is_rle
            else d,
            v,
            c.dictionary,
            c.dict_sorted,
        )
        for c, d, v in zip(table.columns, datas, valids)
    ]
    t = Table(table.column_names, cols, 0, sel)
    t.num_rows = nr  # traced scalar; only used in vectorized row_mask math
    return t


def flatten_subs(subs: Dict[tuple, Table]):
    """Uncorrelated-subquery result tables as traced stage inputs.

    Data/validity arrays are traced (per-execution values flow through the
    SAME executable); num_rows, capacity, dtypes and dictionaries are
    static key material.  -> (ordered_items, traced_vals, key)."""
    items = sorted(subs.items(), key=lambda kv: repr(kv[0]))
    traced = []
    key = []
    for k, t in items:
        datas, valids, sel, _ = _flatten(t)
        traced.append((datas, valids))
        key.append((k, table_signature(t), t.num_rows))
    return items, tuple(traced), tuple(key)


def rebuild_subs(items, traced) -> Dict[tuple, Table]:
    """Rebuild the sub-result dict from traced stand-ins inside a stage
    (num_rows stays the concrete host value — evaluator branches on it)."""
    out: Dict[tuple, Table] = {}
    for (k, t), (datas, valids) in zip(items, traced):
        out[k] = _rebuild(t, datas, valids, t.selection, t.num_rows)
    return out


def subs_traceable(subs: Optional[Dict[tuple, Table]]) -> bool:
    """String results carry per-execution dictionary objects (host
    metadata, id() is key material) — caching those executables would
    grow the cache without hits, so they keep the uncached path."""
    if not subs:
        return False
    return all(
        c.dictionary is None for t in subs.values() for c in t.columns
    )


def used_column_indices(column_map: Dict[tuple, int], exprs) -> frozenset:
    """Column indices an expression set can touch (superset is safe: a
    false positive only loses a cache hit; a false negative would reuse a
    stage with stale baked dictionary values).  Walks every node so
    common-subexpression shortcuts in the evaluator stay covered."""
    used = set()
    for e in exprs:
        if e is None:
            continue
        for node in e.walk():
            i = column_map.get(node.key())
            if i is not None:
                used.add(i)
    return frozenset(used)


def run_stage(
    tag: str,
    table: Table,
    builder: Callable[[Table], object],
    extra_key: tuple = (),
    cacheable: bool = True,
    params: Optional[Dict[int, object]] = None,
    subs: Optional[Dict[tuple, Table]] = None,
    used_cols: Optional[frozenset] = None,
):
    """Run `builder(traced_table) -> (arrays_pytree, static_meta)` as one
    jitted stage; returns (arrays, meta).

    `tag` + `extra_key` identify the computation (expression keys etc.);
    the table's shape/dtype/dictionary signature completes the cache key.
    `static_meta` is host metadata produced during tracing (result dtypes,
    dictionaries); it is cached alongside the executable.  Set
    cacheable=False when the builder closes over per-execution values
    (e.g. uncorrelated subquery results) — it still runs jitted/fused, just
    without cross-execution reuse.

    `params` (prepared-statement / correlated bindings) are fed through
    split_params: numeric values enter the stage as traced scalars keyed
    only by dtype, so re-execution with new values is a cache hit; the
    builder is then called as builder(table, bound_param_dict).
    """
    datas, valids, sel, nr = _flatten(table)
    bound, pvals, pkey = split_params(params)
    if params is not None:
        extra_key = extra_key + (pkey,)
    sub_items, svals, skey = (None, (), ())
    if subs:
        sub_items, svals, skey = flatten_subs(subs)
        extra_key = extra_key + (skey,)
    key: Optional[tuple] = None
    if cacheable:
        key = (tag, extra_key, table_signature(table, used_cols))
        hit = _CACHE.get(key)
        if hit is not None:
            fn, meta = hit
            t0 = time.perf_counter()
            out = fn(datas, valids, sel, nr, pvals, svals)
            _record(tag, out, t0)
            return out, meta

    meta_cell = {}

    @jax.jit
    def fn(datas, valids, sel, nr, pvals, svals):
        t = _rebuild(table, datas, valids, sel, nr)
        kw = {}
        if sub_items is not None:
            kw["subs"] = rebuild_subs(sub_items, svals)
        if params is not None:
            arrays, meta = builder(t, rebind_params(bound, pvals), **kw)
        else:
            arrays, meta = builder(t, **kw)
        meta_cell["meta"] = meta
        return arrays

    t0 = time.perf_counter()
    out = fn(datas, valids, sel, nr, pvals, svals)
    _record(tag, out, t0)
    meta = meta_cell.get("meta")
    if key is not None:
        _cache_put(key, (fn, meta))
    return out, meta


def run_stage2(
    tag: str,
    table_a: Table,
    table_b: Table,
    builder: Callable[[Table, Table], object],
    extra_key: tuple = (),
    cacheable: bool = True,
):
    """Two-table variant (joins); builder returns (arrays, meta)."""
    da, va, sa, na = _flatten(table_a)
    db_, vb, sb, nb = _flatten(table_b)
    key: Optional[tuple] = None
    if cacheable:
        key = (
            tag, extra_key, table_signature(table_a), table_signature(table_b)
        )
        hit = _CACHE.get(key)
        if hit is not None:
            fn, meta = hit
            t0 = time.perf_counter()
            out = fn(da, va, sa, na, db_, vb, sb, nb)
            _record(tag, out, t0)
            return out, meta

    meta_cell = {}

    @jax.jit
    def fn(da, va, sa, na, db_, vb, sb, nb):
        arrays, meta = builder(
            _rebuild(table_a, da, va, sa, na), _rebuild(table_b, db_, vb, sb, nb)
        )
        meta_cell["meta"] = meta
        return arrays

    t0 = time.perf_counter()
    out = fn(da, va, sa, na, db_, vb, sb, nb)
    _record(tag, out, t0)
    meta = meta_cell.get("meta")
    if key is not None:
        _cache_put(key, (fn, meta))
    return out, meta


def run_stage2_extra(
    tag: str,
    table_a: Table,
    table_b: Table,
    extra_arrays: tuple,
    builder: Callable,
    extra_key: tuple = (),
    cacheable: bool = True,
):
    """Two tables + extra per-execution arrays (join expansion stages).
    builder(ta, tb, *extra) -> (arrays, meta)."""
    da, va, sa, na = _flatten(table_a)
    db_, vb, sb, nb = _flatten(table_b)
    key: Optional[tuple] = None
    if cacheable:
        leaves, treedef = jax.tree_util.tree_flatten(extra_arrays)
        key = (
            tag, extra_key, table_signature(table_a), table_signature(table_b),
            str(treedef), tuple((str(x.dtype), x.shape) for x in leaves),
        )
        hit = _CACHE.get(key)
        if hit is not None:
            fn, meta = hit
            t0 = time.perf_counter()
            out = fn(da, va, sa, na, db_, vb, sb, nb, extra_arrays)
            _record(tag, out, t0)
            return out, meta

    meta_cell = {}

    @jax.jit
    def fn(da, va, sa, na, db_, vb, sb, nb, extra):
        arrays, meta = builder(
            _rebuild(table_a, da, va, sa, na),
            _rebuild(table_b, db_, vb, sb, nb),
            *extra,
        )
        meta_cell["meta"] = meta
        return arrays

    t0 = time.perf_counter()
    out = fn(da, va, sa, na, db_, vb, sb, nb, extra_arrays)
    _record(tag, out, t0)
    meta = meta_cell.get("meta")
    if key is not None:
        _cache_put(key, (fn, meta))
    return out, meta


def run_arrays(
    tag: str,
    builder: Callable,
    arrays: tuple,
    extra_key: tuple = (),
    cacheable: bool = True,
):
    """Array-input variant (post-sync stages like join expansion or
    aggregate reductions).  builder(*arrays) -> (arrays_out, meta).
    jit handles shape specialization; the cache key keeps distinct plans
    apart."""
    key: Optional[tuple] = None
    if cacheable:
        leaves, treedef = jax.tree_util.tree_flatten(arrays)
        key = (
            tag, extra_key, str(treedef),
            tuple((str(a.dtype), a.shape) for a in leaves),
        )
        hit = _CACHE.get(key)
        if hit is not None:
            fn, meta = hit
            t0 = time.perf_counter()
            out = fn(*arrays)
            _record(tag, out, t0)
            return out, meta

    meta_cell = {}

    @jax.jit
    def fn(*args):
        out, meta = builder(*args)
        meta_cell["meta"] = meta
        return out

    t0 = time.perf_counter()
    out = fn(*arrays)
    _record(tag, out, t0)
    meta = meta_cell.get("meta")
    if key is not None:
        _cache_put(key, (fn, meta))
    return out, meta


def clear_cache() -> None:
    _CACHE.clear()
