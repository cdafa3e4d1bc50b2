"""Join operators (ref: operators/join_hash.hpp:24 radix hash join,
join_sort_merge.hpp:26, join_nested_loop.hpp:19, join_helper/
join_output_writing.*, multi_predicate_join/*).

One TPU-native `Join` covers all equi-join modes via the sorted-build +
binary-search-probe kernels (kernels/joins.py); secondary predicates are
evaluated vectorized on the expanded pair table (the reference's
MultiPredicateJoinEvaluator).  Two-column equi keys pack into one int64
when both sides are 32-bit (int/date/dict-code), mirroring the reference's
composite-key fast path.  `Product` is the cross join
(ref: operators/product.hpp:20); pure non-equi joins go through
Product + filter (the JoinNestedLoop fallback).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hyrise_tpu.expression import ast
from hyrise_tpu.expression.evaluator import ExpressionEvaluator, ExprResult
from hyrise_tpu.kernels import joins as joink
from hyrise_tpu.kernels import masks
from hyrise_tpu.operators.base import AbstractReadOnlyOperator
from hyrise_tpu.storage.column import (
    Column,
    merge_dictionaries,
    recode_to_dictionary,
)
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import (
    DataType,
    FLIPPED_CONDITION,
    JoinMode,
    PredicateCondition,
    size_bucket,
)


@dataclass
class JoinPredicate:
    """left/right expressions resolve against the respective input ops."""

    left: ast.Expression
    right: ast.Expression
    condition: PredicateCondition = PredicateCondition.EQUALS


class Join(AbstractReadOnlyOperator):
    def __init__(
        self,
        left_op,
        right_op,
        mode: JoinMode,
        predicates: Sequence[JoinPredicate],
    ):
        super().__init__(left_op, right_op)
        self.mode = mode
        self.predicates = list(predicates)
        self._set_output_expressions()

    def _set_output_expressions(self):
        left_exprs = list(self._left.output_expressions)
        right_exprs = list(self._right.output_expressions)
        if self.mode in (JoinMode.SEMI, JoinMode.ANTI_NULL_AS_TRUE,
                         JoinMode.ANTI_NULL_AS_FALSE):
            self.output_expressions = left_exprs
        else:
            self.output_expressions = left_exprs + right_exprs

    # ------------------------------------------------------------------

    def _on_execute(self) -> Table:
        self._set_output_expressions()
        L = self.input_table_left()
        R = self.input_table_right()
        mode = self.mode

        if mode == JoinMode.CROSS:
            return _cross_product(self, L, R)

        equi = [p for p in self.predicates
                if p.condition == PredicateCondition.EQUALS]
        non_equi = [p for p in self.predicates
                    if p.condition != PredicateCondition.EQUALS]
        if not equi:
            return self._nested_loop(L, R)

        # probe side is the "outer"-preserved side; build side gets sorted
        swap = mode == JoinMode.RIGHT
        if mode == JoinMode.INNER and L.num_rows < R.num_rows:
            swap = True  # build the smaller side (ref: join_hash.cpp:197)
        probe_op, build_op = (self._right, self._left) if swap else (self._left, self._right)
        probe_t, build_t = (R, L) if swap else (L, R)
        eff_mode = JoinMode.LEFT if mode == JoinMode.RIGHT else mode

        # --- keys for (up to two) primary equi predicates
        probe_keys, build_keys, used = self._make_keys(
            equi, probe_op, build_op, probe_t, build_t, swap
        )
        secondary = equi[used:] + non_equi

        pv = probe_keys[1] & probe_t.row_mask()
        bv = build_keys[1] & build_t.row_mask()
        sorted_keys, build_perm, n_build_valid = joink.build_sorted(build_keys[0], bv)
        left_pos, counts = joink.probe_counts(sorted_keys, n_build_valid,
                                              probe_keys[0], pv)

        if eff_mode in (JoinMode.SEMI, JoinMode.ANTI_NULL_AS_TRUE,
                        JoinMode.ANTI_NULL_AS_FALSE) and not secondary:
            return self._semi_anti_fast(probe_t, counts, pv, bv, build_t, eff_mode)

        # --- expand matching pairs
        total = int(joink.total_matches(counts))
        out_cap = size_bucket(total)
        probe_idx, build_idx, pair_valid = joink.expand_matches(
            left_pos, counts, build_perm, out_cap
        )
        if secondary:
            pair_valid = pair_valid & self._secondary_mask(
                secondary, probe_op, build_op, probe_t, build_t,
                probe_idx, build_idx, swap,
            )

        if eff_mode in (JoinMode.SEMI, JoinMode.ANTI_NULL_AS_TRUE,
                        JoinMode.ANTI_NULL_AS_FALSE):
            matched = _scatter_any(probe_idx, pair_valid, probe_t.capacity)
            if eff_mode == JoinMode.SEMI:
                mask = matched
            elif eff_mode == JoinMode.ANTI_NULL_AS_FALSE:
                mask = ~matched & probe_t.row_mask()
            else:
                mask = self._anti_null_as_true_mask(matched, pv, bv, build_t, probe_t)
            return self.compact(probe_t, mask & probe_t.row_mask())

        # --- assemble (left_idx, right_idx) pair lists
        if swap:
            l_idx, r_idx = build_idx, probe_idx
        else:
            l_idx, r_idx = probe_idx, build_idx

        pieces_l = [l_idx]
        pieces_r = [r_idx]
        pieces_valid = [pair_valid]
        if eff_mode in (JoinMode.LEFT, JoinMode.FULL):
            matched = _scatter_any(probe_idx, pair_valid, probe_t.capacity)
            unmatched = ~matched & probe_t.row_mask()
            n_un = int(masks.mask_count(unmatched))
            cap_un = size_bucket(n_un)
            un_idx = masks.mask_to_indices(unmatched, cap_un)
            minus = jnp.full(cap_un, -1, dtype=jnp.int64)
            if swap:
                pieces_l.append(minus)
                pieces_r.append(un_idx.astype(jnp.int64))
            else:
                pieces_l.append(un_idx.astype(jnp.int64))
                pieces_r.append(minus)
            pieces_valid.append(jnp.arange(cap_un) < n_un)
        if eff_mode == JoinMode.FULL:
            matched_b = _scatter_any(build_idx, pair_valid, build_t.capacity)
            unmatched_b = ~matched_b & build_t.row_mask()
            n_ub = int(masks.mask_count(unmatched_b))
            cap_ub = size_bucket(n_ub)
            ub_idx = masks.mask_to_indices(unmatched_b, cap_ub)
            minus = jnp.full(cap_ub, -1, dtype=jnp.int64)
            if swap:
                pieces_l.append(ub_idx.astype(jnp.int64))
                pieces_r.append(minus)
            else:
                pieces_l.append(minus)
                pieces_r.append(ub_idx.astype(jnp.int64))
            pieces_valid.append(jnp.arange(cap_ub) < n_ub)

        all_l = jnp.concatenate(pieces_l)
        all_r = jnp.concatenate(pieces_r)
        all_valid = jnp.concatenate(pieces_valid)
        n_out = int(masks.mask_count(all_valid))
        cap_out = size_bucket(n_out)
        sel = masks.mask_to_indices(all_valid, cap_out)
        final_l = jnp.take(all_l, sel)
        final_r = jnp.take(all_r, sel)

        right_nullable = eff_mode in (JoinMode.LEFT, JoinMode.FULL)
        lt = L.take(final_l, n_out,
                    null_where_negative=(eff_mode == JoinMode.FULL) or (swap and right_nullable))
        rt = R.take(final_r, n_out,
                    null_where_negative=(eff_mode == JoinMode.FULL) or (not swap and right_nullable))
        return Table(
            L.column_names + R.column_names, lt.columns + rt.columns, n_out
        )

    # ------------------------------------------------------------------

    def _make_keys(self, equi, probe_op, build_op, probe_t, build_t, swap):
        """Build int64 primary keys for the probe/build sides, packing two
        32-bit-typed equi predicates into one key when possible.  Returns
        ((probe_key, probe_valid), (build_key, build_valid), n_used)."""
        pev = self.make_evaluator(probe_t, self._column_map(probe_op))
        bev = self.make_evaluator(build_t, self._column_map(build_op))

        def side_exprs(p: JoinPredicate):
            return (p.right, p.left) if swap else (p.left, p.right)

        def one_key(p: JoinPredicate):
            pe, be = side_exprs(p)
            pr = pev.evaluate(pe)
            br = bev.evaluate(be)
            if pr.dtype == DataType.STRING or br.dtype == DataType.STRING:
                assert pr.dtype == br.dtype == DataType.STRING
                merged = merge_dictionaries(pr.dictionary, br.dictionary)
                pc = Column(DataType.STRING, pr.data, pr.validity,
                            pr.dictionary, pr.dict_sorted)
                bc = Column(DataType.STRING, br.data, br.validity,
                            br.dictionary, br.dict_sorted)
                pk = recode_to_dictionary(pc, merged).astype(jnp.int64)
                bk = recode_to_dictionary(bc, merged).astype(jnp.int64)
                narrow = True
            else:
                pk = joink.normalize_key(pr.data)
                bk = joink.normalize_key(br.data)
                narrow = pr.dtype in (DataType.INT, DataType.DATE) and \
                    br.dtype in (DataType.INT, DataType.DATE)
            pvv = pr.validity if pr.validity is not None else jnp.ones(probe_t.capacity, bool)
            bvv = br.validity if br.validity is not None else jnp.ones(build_t.capacity, bool)
            return pk, bk, pvv, bvv, narrow

        pk1, bk1, pv1, bv1, n1 = one_key(equi[0])
        used = 1
        if len(equi) > 1:
            pk2, bk2, pv2, bv2, n2 = one_key(equi[1])
            if n1 and n2:
                pk1 = joink.pack_keys(pk1.astype(jnp.int32), pk2.astype(jnp.int32))
                bk1 = joink.pack_keys(bk1.astype(jnp.int32), bk2.astype(jnp.int32))
                pv1 = pv1 & pv2
                bv1 = bv1 & bv2
                used = 2
        return (pk1, pv1), (bk1, bv1), used

    def _secondary_mask(self, secondary, probe_op, build_op, probe_t, build_t,
                        probe_idx, build_idx, swap) -> jax.Array:
        """Evaluate remaining predicates on the expanded pair table."""
        pt = probe_t.take(probe_idx, probe_idx.shape[0])
        bt = build_t.take(build_idx, build_idx.shape[0])
        pair_table = Table(
            pt.column_names + bt.column_names,
            pt.columns + bt.columns,
            probe_idx.shape[0],
        )
        cmap = {}
        for i, e in enumerate(probe_op.output_expressions):
            cmap[e.key()] = i
        off = len(pt.columns)
        for i, e in enumerate(build_op.output_expressions):
            cmap[e.key()] = off + i
        ev = self.make_evaluator(pair_table, cmap)
        mask = None
        for p in secondary:
            pred = ast.Predicate(p.condition, [p.left, p.right])
            m = ev.selection_mask(pred)
            mask = m if mask is None else (mask & m)
        return mask

    def _semi_anti_fast(self, probe_t, counts, pv, bv, build_t, eff_mode):
        if eff_mode == JoinMode.SEMI:
            mask = counts > 0
        elif eff_mode == JoinMode.ANTI_NULL_AS_FALSE:
            mask = counts == 0
        else:
            mask = self._anti_null_as_true_mask(counts > 0, pv, bv, build_t, probe_t)
        return self.compact(probe_t, mask & probe_t.row_mask())

    def _anti_null_as_true_mask(self, matched, pv, bv, build_t, probe_t):
        """NOT IN semantics (ref: JoinMode::AntiNullAsTrue): any NULL on the
        build side, or a NULL probe key, makes non-matching rows unknown
        (filtered); an empty build side keeps everything."""
        n_build_real = build_t.num_rows
        build_has_null = bool(
            jnp.any(build_t.row_mask() & ~bv)
        ) if n_build_real else False
        if n_build_real == 0:
            return probe_t.row_mask()
        if build_has_null:
            return jnp.zeros(probe_t.capacity, dtype=bool)
        return ~matched & pv

    def _nested_loop(self, L: Table, R: Table) -> Table:
        """Pure non-equi join: cross product + predicate filter
        (ref: join_nested_loop.hpp:19)."""
        cross = _cross_product(self, L, R, materialize=False)
        l_idx, r_idx, n_pairs = cross
        lt = L.take(l_idx, n_pairs)
        rt = R.take(r_idx, n_pairs)
        pair_table = Table(L.column_names + R.column_names,
                           lt.columns + rt.columns, n_pairs)
        cmap = {}
        for i, e in enumerate(self._left.output_expressions):
            cmap[e.key()] = i
        off = len(lt.columns)
        for i, e in enumerate(self._right.output_expressions):
            cmap[e.key()] = off + i
        ev = self.make_evaluator(pair_table, cmap)
        mask = pair_table.row_mask()
        for p in self.predicates:
            pred = ast.Predicate(p.condition, [p.left, p.right])
            mask = mask & ev.selection_mask(pred)
        if self.mode == JoinMode.INNER:
            return self.compact(pair_table, mask)
        if self.mode in (JoinMode.SEMI, JoinMode.ANTI_NULL_AS_FALSE,
                         JoinMode.ANTI_NULL_AS_TRUE):
            matched = _scatter_any(l_idx, mask, L.capacity)
            if self.mode == JoinMode.SEMI:
                keep = matched & L.row_mask()
            else:
                keep = ~matched & L.row_mask()
            return self.compact(L, keep)
        if self.mode in (JoinMode.LEFT, JoinMode.RIGHT, JoinMode.FULL):
            out_parts = [self.compact(pair_table, mask)]
            if self.mode in (JoinMode.LEFT, JoinMode.FULL):
                matched = _scatter_any(l_idx, mask, L.capacity)
                un = ~matched & L.row_mask()
                n_un = int(masks.mask_count(un))
                li = masks.mask_to_indices(un, size_bucket(n_un))
                lt2 = L.take(li, n_un)
                rt2 = R.take(jnp.full(li.shape, -1), n_un, null_where_negative=True)
                out_parts.append(Table(L.column_names + R.column_names,
                                       lt2.columns + rt2.columns, n_un))
            if self.mode in (JoinMode.RIGHT, JoinMode.FULL):
                matched_r = _scatter_any(r_idx, mask, R.capacity)
                un = ~matched_r & R.row_mask()
                n_un = int(masks.mask_count(un))
                ri = masks.mask_to_indices(un, size_bucket(n_un))
                rt2 = R.take(ri, n_un)
                lt2 = L.take(jnp.full(ri.shape, -1), n_un, null_where_negative=True)
                out_parts.append(Table(L.column_names + R.column_names,
                                       lt2.columns + rt2.columns, n_un))
            return concat_tables(out_parts)
        raise NotImplementedError(self.mode)

    def _describe_self(self) -> str:
        preds = ", ".join(
            f"{p.left.description()} {p.condition.value} {p.right.description()}"
            for p in self.predicates
        )
        return f"Join({self.mode.value}, [{preds}])"


class Product(AbstractReadOnlyOperator):
    """Cross join (ref: operators/product.hpp:20)."""

    def __init__(self, left_op, right_op):
        super().__init__(left_op, right_op)
        self.output_expressions = (
            list(left_op.output_expressions) + list(right_op.output_expressions)
        )

    def _on_execute(self) -> Table:
        self.output_expressions = (
            list(self._left.output_expressions) + list(self._right.output_expressions)
        )
        return _cross_product(self, self.input_table_left(), self.input_table_right())

    def _describe_self(self) -> str:
        return "Product"


def _cross_product(op, L: Table, R: Table, materialize: bool = True):
    n = L.num_rows * R.num_rows
    cap = size_bucket(n)
    j = jnp.arange(cap, dtype=jnp.int64)
    nr = max(R.num_rows, 1)
    l_idx = jnp.clip(j // nr, 0, max(L.capacity - 1, 0))
    r_idx = jnp.clip(j % nr, 0, max(R.capacity - 1, 0))
    if not materialize:
        return l_idx, r_idx, n
    lt = L.take(l_idx, n)
    rt = R.take(r_idx, n)
    return Table(L.column_names + R.column_names, lt.columns + rt.columns, n)


def _scatter_any(idx: jax.Array, flags: jax.Array, capacity: int) -> jax.Array:
    """matched[i] = OR of flags where idx == i (bounded scatter-max)."""
    safe = jnp.clip(idx, 0, capacity - 1)
    out = jnp.zeros(capacity, dtype=jnp.int32)
    out = out.at[safe].max(flags.astype(jnp.int32))
    return out > 0


def concat_tables(tables: List[Table]) -> Table:
    """Row-concatenate tables with identical schemas (ref:
    operators/union_all.hpp:14)."""
    assert tables
    first = tables[0]
    n_total = sum(t.num_rows for t in tables)
    cap = size_bucket(n_total)
    names = first.column_names
    out_cols = []
    for ci in range(len(names)):
        cols = [t.columns[ci] for t in tables]
        dt = cols[0].data_type
        if dt == DataType.STRING:
            merged = cols[0].dictionary
            for c in cols[1:]:
                merged = merge_dictionaries(merged, c.dictionary)
            datas, valids = [], []
            for t, c in zip(tables, cols):
                data = recode_to_dictionary(c, merged)
                datas.append(data[: t.num_rows])
                valids.append(_validity_slice(c, t.num_rows))
            data = _pad_concat(datas, cap, jnp.int32)
            validity = _concat_validity(valids, cap)
            out_cols.append(Column(dt, data, validity, merged, True))
        else:
            datas = [c.data[: t.num_rows].astype(cols[0].data.dtype)
                     for t, c in zip(tables, cols)]
            valids = [_validity_slice(c, t.num_rows) for t, c in zip(tables, cols)]
            data = _pad_concat(datas, cap, cols[0].data.dtype)
            validity = _concat_validity(valids, cap)
            out_cols.append(Column(dt, data, validity))
    return Table(names, out_cols, n_total)


def _validity_slice(c: Column, n: int):
    """(validity-or-None, length) pair for _concat_validity."""
    if c.validity is None:
        return (None, n)
    return (c.validity[:n], n)


def _pad_concat(pieces, cap, dtype):
    total = sum(int(p.shape[0]) for p in pieces)
    pad = cap - total
    parts = [p.astype(dtype) for p in pieces]
    if pad > 0:
        parts.append(jnp.zeros(pad, dtype=dtype))
    return jnp.concatenate(parts)


def _concat_validity(valids, cap):
    """valids: list of (validity-or-None, length) pairs."""
    if all(v is None for v, _ in valids):
        return None
    parts = []
    total = 0
    for v, n in valids:
        parts.append(v if v is not None else jnp.ones(n, dtype=bool))
        total += n
    pad = cap - total
    if pad > 0:
        parts.append(jnp.ones(pad, dtype=bool))
    return jnp.concatenate(parts)
