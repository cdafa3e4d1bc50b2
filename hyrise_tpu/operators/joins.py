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
from hyrise_tpu.operators.compiled import used_column_indices
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


# above this bound, assembling a unique-key join at the bounding side's
# full capacity costs more in padded 10 ns/row gathers than the one sync
# RTT it avoids (see _bounded_cap)
_SYNC_SKIP_CAP = 1 << 21


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
        # demand-driven output pruning (set by the LQP translator): the
        # expression keys ancestors reference.  None = assemble all.
        self.required_output_keys = None
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
        from hyrise_tpu.operators.compiled import (
            run_stage2,
            run_stage2_extra,
        )

        self._set_output_expressions()
        L = self.maybe_compact(self.input_table_left(),
                               est_rows=self.input_estimated_rows("left"))
        R = self.maybe_compact(self.input_table_right(),
                               est_rows=self.input_estimated_rows("right"))
        mode = self.mode

        if mode == JoinMode.CROSS:
            return _cross_product(self, L.materialize().decoded(),
                                  R.materialize().decoded())

        equi = [p for p in self.predicates
                if p.condition == PredicateCondition.EQUALS]
        non_equi = [p for p in self.predicates
                    if p.condition != PredicateCondition.EQUALS]
        if not equi:
            return self._nested_loop(L.materialize().decoded(),
                                     R.materialize().decoded())

        # probe side is the "outer"-preserved side; build side gets sorted
        swap = mode == JoinMode.RIGHT
        if mode == JoinMode.INNER and L.num_rows < R.num_rows:
            swap = True  # build the smaller side (ref: join_hash.cpp:197)
        probe_op, build_op = (self._right, self._left) if swap else (self._left, self._right)
        probe_t, build_t = (R, L) if swap else (L, R)
        eff_mode = JoinMode.LEFT if mode == JoinMode.RIGHT else mode
        cacheable = not self.uncorrelated_subquery_plans

        def side_exprs(p: JoinPredicate):
            return (p.right, p.left) if swap else (p.left, p.right)

        # static key-packing decision from declared dtypes
        def narrow(p: JoinPredicate) -> bool:
            pe, be = side_exprs(p)
            td = (DataType.INT, DataType.DATE, DataType.STRING)
            return pe.data_type() in td and be.data_type() in td

        used = 2 if len(equi) > 1 and narrow(equi[0]) and narrow(equi[1]) else 1
        secondary = equi[used:] + non_equi
        pred_key = tuple(
            (p.condition, p.left.key(), p.right.key()) for p in self.predicates
        ) + (swap, used, eff_mode)

        def make_keys(pt: Table, bt: Table, extra: Optional[JoinPredicate] = None):
            pev = self.make_evaluator(pt, self._column_map(probe_op))
            bev = self.make_evaluator(bt, self._column_map(build_op))

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
                elif jnp.issubdtype(pr.data.dtype, jnp.floating) or \
                        jnp.issubdtype(br.data.dtype, jnp.floating):
                    # numeric cross-type equality: compare as floats
                    common = jnp.promote_types(pr.data.dtype, br.data.dtype)
                    pk = pr.data.astype(common)
                    bk = br.data.astype(common)
                else:
                    pk = joink.normalize_key(pr.data)
                    bk = joink.normalize_key(br.data)
                    dt = joink.common_key_dtype(pk, bk)
                    pk = pk.astype(dt)
                    bk = bk.astype(dt)
                pvv = (pr.validity if pr.validity is not None
                       else jnp.ones(pt.capacity, bool))
                bvv = (br.validity if br.validity is not None
                       else jnp.ones(bt.capacity, bool))
                return pk, bk, pvv, bvv

            pk1, bk1, pv1, bv1 = one_key(equi[0])
            pks, bks = (pk1,), (bk1,)
            if used == 2:
                # composite keys stay SEPARATE int32 sort operands — the
                # reference packs into one uint64 (join_hash_steps.hpp),
                # but TPU emulates 64-bit integers as pairs (2x sort tax)
                pk2, bk2, pv2, bv2 = one_key(equi[1])
                pks = pks + (pk2.astype(jnp.int32),)
                bks = bks + (bk2.astype(jnp.int32),)
                pv1 = pv1 & pv2
                bv1 = bv1 & bv2
            if extra is not None:
                pe2, be2, pv2e, bv2e = one_key(extra)
                return (pks, pv1), (bks, bv1), (pe2, pv2e), (be2, bv2e)
            return (pks, pv1), (bks, bv1)

        # dense direct-address fast path: int build key with fresh
        # statistics bounds -> scatter build + 1-gather probes (no sort,
        # no searchsorted); see kernels/joins.py dense_build/dense_probe.
        # Membership (semi/anti) tolerates duplicate build keys (slot
        # clobbering still answers "any match"); the inner/outer path
        # additionally requires declared-unique build keys.
        dense_range = (
            _dense_join_spec(*side_exprs(equi[0])[::-1]) if used == 1 else None
        )
        if dense_range is not None:
            pred_key = pred_key + (dense_range,)

        # ------------- fast path: semi/anti without secondary predicates —
        # a pure selection mask on the probe side, zero host syncs.
        # A single `<>` residual (the TPC-H Q21 self-join shape) also
        # avoids pair expansion: EXISTS(build: K match AND s differs)
        # <=> count(builds with key K) > count(builds with key (K, s)),
        # two merged-sort count queries instead of a multi-million-row
        # expansion + gather + evaluator pass.
        neq_fast = (
            eff_mode in (JoinMode.SEMI, JoinMode.ANTI_NULL_AS_FALSE)
            and len(secondary) == 1
            and secondary[0].condition == PredicateCondition.NOT_EQUALS
            and used == 1
            and narrow(equi[0])
            and narrow(secondary[0])
        )
        if eff_mode in (JoinMode.SEMI, JoinMode.ANTI_NULL_AS_TRUE,
                        JoinMode.ANTI_NULL_AS_FALSE) and (
                            not secondary or neq_fast):
            def build_fast(pt: Table, bt: Table):
                if neq_fast:
                    ((pks, pkv), (bks, bkv),
                     (ps, psv), (bs, bsv)) = make_keys(pt, bt, secondary[0])
                    pv = pkv & pt.row_mask()
                    # builds with NULL s can never satisfy `<>`
                    bv = bkv & bt.row_mask() & bsv
                    _, _, cnt_k = joink.merge_probe(bks, bv, pks, pv)
                    _, _, cnt_ks = joink.merge_probe(
                        bks + (bs.astype(jnp.int32),), bv,
                        pks + (ps.astype(jnp.int32),), pv & psv,
                    )
                    member = pv & psv & (cnt_k > cnt_ks)
                else:
                    (pks, pkv), (bks, bkv) = make_keys(pt, bt)
                    pv = pkv & pt.row_mask()
                    bv = bkv & bt.row_mask()
                    if dense_range is not None:
                        lo, dsize = dense_range
                        slot = joink.dense_build(bks[0], bv, lo, dsize)
                        _, cnt = joink.dense_probe(slot, pks[0], pv,
                                                   lo, dsize)
                        member = cnt > 0
                    else:
                        _, _, cnt = joink.merge_probe(bks, bv, pks, pv)
                        member = cnt > 0
                if eff_mode == JoinMode.SEMI:
                    mask = member
                elif eff_mode == JoinMode.ANTI_NULL_AS_FALSE:
                    mask = ~member & pt.row_mask()
                else:
                    mask = _anti_nat_mask(member, pv, bkv, bt)
                return mask & pt.row_mask(), None

            mask, _ = run_stage2(
                "join_semi", probe_t, build_t, build_fast,
                extra_key=pred_key, cacheable=cacheable,
            )
            out = Table(probe_t.column_names, probe_t.columns,
                        probe_t.num_rows, selection=mask)
            return out

        # unique build keys (declared PK/UCC) bound the expansion by the
        # probe side alone — the expansion-size host sync disappears
        # (soft constraints are assumed valid, as in the reference's
        # optimizer rules; ref table.hpp:215-218)
        build_unique = _build_key_unique(
            [side_exprs(p)[1] for p in equi[:used]], build_op
        )
        dense_spec = dense_range if build_unique else None

        # ------------- stage 1: keys + build + probe counts ---------------
        def build1(pt: Table, bt: Table):
            (pks, pkv), (bks, bkv) = make_keys(pt, bt)
            pv = pkv & pt.row_mask()
            bv = bkv & bt.row_mask()
            if dense_spec is not None:
                lo, dsize = dense_spec
                slot = joink.dense_build(bks[0], bv, lo, dsize)
                left_pos, counts = joink.dense_probe(slot, pks[0], pv,
                                                     lo, dsize)
                total = jnp.sum(counts, dtype=jnp.int64)
                return (left_pos, counts, slot, pv, bkv, total), None
            build_perm, left_pos, counts = joink.merge_probe(bks, bv, pks, pv)
            total = jnp.sum(counts, dtype=jnp.int64)
            return (left_pos, counts, build_perm, pv, bkv, total), None

        (left_pos, counts, build_perm, pv, bkv_raw, total_dev), _ = run_stage2(
            "join1", probe_t, build_t, build1,
            extra_key=pred_key, cacheable=cacheable,
        )
        from hyrise_tpu.operators.base import _sync_is_expensive

        est_out = getattr(self, "estimated_rows", None)
        probe_unique = _build_key_unique(
            [side_exprs(p)[0] for p in equi[:used]], probe_op
        )

        # secondary predicates evaluate on (probe, build) pairs
        sec_preds = [
            ast.Predicate(p.condition, [p.left, p.right]) for p in secondary
        ]

        # demand-driven assembly pruning: gather at expansion width ONLY
        # the columns ancestors reference (translator-provided).  Spent
        # join keys otherwise ride through every later join; Q7's final
        # SF1 join gathered 15 six-million-row columns where 5 are used.
        req = self.required_output_keys
        p_out = list(probe_op.output_expressions)
        b_out = list(build_op.output_expressions)
        if req is not None and eff_mode in (JoinMode.INNER, JoinMode.LEFT,
                                            JoinMode.FULL):
            keep_p = [i for i, e in enumerate(p_out) if e.key() in req]
            keep_b = [i for i, e in enumerate(b_out) if e.key() in req]
            if not keep_p and not keep_b:
                keep_p = [0] if p_out else []  # retain row extent
        else:
            keep_p = list(range(len(p_out)))
            keep_b = list(range(len(b_out)))

        # ------------- row-aligned path: unique-build INNER/LEFT joins ----
        # counts ∈ {0,1} make the join a probe-aligned column EXTENSION:
        # probe columns pass through UNTOUCHED (the probe-side payload
        # gathers at expansion width dominated SF1 join2 per
        # SF1_STAGE_PROFILE.json), matches become a selection mask, and
        # only ancestor-referenced build columns gather once at probe
        # width.  No expansion scatter, no host sync.  (Ref analogue:
        # join_hash_steps.hpp output writing + PosList single-chunk
        # shortcut — here the "pos list" is the identity.)
        if build_unique and eff_mode in (JoinMode.INNER, JoinMode.LEFT):
            use_aligned = True
            near_full = (
                est_out is not None
                and size_bucket(max(int(est_out), 1)) * 4 > probe_t.capacity
            )
            if probe_t.capacity > _SYNC_SKIP_CAP and not near_full:
                # selective join at large width: a synced narrow expansion
                # gathers probe+build at the (much smaller) match count,
                # beating keep_b full-probe-width build gathers
                if size_bucket(max(int(total_dev), 1)) * 4 < probe_t.capacity:
                    use_aligned = False
            if use_aligned:
                return self._aligned_join(
                    probe_t, build_t, probe_op, build_op, eff_mode,
                    (left_pos, counts, build_perm), sec_preds,
                    keep_p, keep_b, pred_key, cacheable, swap,
                )

        # Unique-key joins bound the expansion by one side, so the
        # expansion-size sync CAN be skipped by assembling at that side's
        # full capacity.  Whether it SHOULD be is a cost call: assembly
        # gathers run ~10 ns/row on v5e, so a 6M-row padded assembly
        # costs ~8x the ~50 ms sync RTT, while below ~2M rows padding is
        # cheaper than the RTT (the SF0.1 driver regime).  Sync only when
        # the avoided width exceeds _SYNC_SKIP_CAP and the estimate does
        # not already predict a near-full expansion.
        def _bounded_cap(bound_cap: int) -> int:
            near_full = (
                est_out is not None
                and size_bucket(max(int(est_out), 1)) * 4 > bound_cap
            )
            if bound_cap <= _SYNC_SKIP_CAP or near_full or not _sync_is_expensive():
                if not _sync_is_expensive() and est_out is not None \
                        and not near_full:
                    return size_bucket(int(total_dev))  # cheap sync: exact
                return bound_cap
            return size_bucket(max(int(total_dev), 1))  # one RTT, narrow

        if build_unique:
            # <=1 match per probe row: expansion fits probe capacity
            out_cap = _bounded_cap(probe_t.capacity)
        elif probe_unique:
            # <=1 match per BUILD row (the preserved probe side owns the
            # unique key — the Q13 LEFT-join orientation)
            out_cap = _bounded_cap(build_t.capacity)
        else:
            total = int(total_dev)
            out_cap = size_bucket(total)

        # ------------- stage 2: expansion + secondary + assembly ----------
        # (orientation does not matter: the pair table holds both sides)
        def build2(pt: Table, bt: Table, left_pos, counts, build_perm, pv, bkv):
            if build_unique:
                # counts ∈ {0,1}: compaction scatter, no searchsorted
                probe_idx, build_idx, pair_valid = joink.expand_unique(
                    left_pos, counts, build_perm, out_cap
                )
            else:
                probe_idx, build_idx, pair_valid = joink.expand_matches(
                    left_pos, counts, build_perm, out_cap
                )
            if sec_preds:
                # the pair table only feeds secondary-predicate evaluation
                # (output assembly gathers separately below): gather only
                # the columns the predicates reference — a full two-sided
                # take at expansion width dominated joins with residual
                # predicates, e.g. TPC-H Q21's semi/anti self-joins
                sec_children = [c for pr in sec_preds for c in pr.children]
                p_keep = sorted(used_column_indices(
                    {e.key(): i
                     for i, e in enumerate(probe_op.output_expressions)},
                    sec_children,
                ))
                b_keep = sorted(used_column_indices(
                    {e.key(): i
                     for i, e in enumerate(build_op.output_expressions)},
                    sec_children,
                ))
                pred = Table(
                    [pt.column_names[i] for i in p_keep],
                    [pt.columns[i] for i in p_keep],
                    pt.num_rows,
                )
                bred = Table(
                    [bt.column_names[i] for i in b_keep],
                    [bt.columns[i] for i in b_keep],
                    bt.num_rows,
                )
                ptbl = pred.take(probe_idx, out_cap)
                btbl = bred.take(build_idx, out_cap)
                pair_table = Table(
                    ptbl.column_names + btbl.column_names,
                    ptbl.columns + btbl.columns,
                    out_cap,
                )
                cmap2 = {}
                for pos, i in enumerate(p_keep):
                    cmap2[probe_op.output_expressions[i].key()] = pos
                off = len(ptbl.columns)
                for pos, i in enumerate(b_keep):
                    cmap2[build_op.output_expressions[i].key()] = off + pos
                ev2 = self.make_evaluator(pair_table, cmap2)
                for pr in sec_preds:
                    # secondary predicate operands are (probe, build) pairs
                    m = ev2.selection_mask(
                        ast.Predicate(pr.condition, pr.children)
                    )
                    pair_valid = pair_valid & m

            if eff_mode in (JoinMode.SEMI, JoinMode.ANTI_NULL_AS_TRUE,
                            JoinMode.ANTI_NULL_AS_FALSE):
                matched = _scatter_any(probe_idx, pair_valid, pt.capacity)
                if eff_mode == JoinMode.SEMI:
                    mask = matched
                elif eff_mode == JoinMode.ANTI_NULL_AS_FALSE:
                    mask = ~matched & pt.row_mask()
                else:
                    mask = _anti_nat_mask(matched, pv, bkv, bt)
                return (mask & pt.row_mask(),), "mask"

            # assemble (probe_idx, build_idx, valid) pieces incl. outer rows
            pieces_p = [probe_idx]
            pieces_b = [build_idx]
            pieces_v = [pair_valid]
            if eff_mode in (JoinMode.LEFT, JoinMode.FULL):
                matched = _scatter_any(probe_idx, pair_valid, pt.capacity)
                unmatched = ~matched & pt.row_mask()
                pieces_p.append(jnp.arange(pt.capacity, dtype=jnp.int64))
                pieces_b.append(jnp.full(pt.capacity, -1, dtype=jnp.int64))
                pieces_v.append(unmatched)
            if eff_mode == JoinMode.FULL:
                matched_b = _scatter_any(build_idx, pair_valid, bt.capacity)
                unmatched_b = ~matched_b & bt.row_mask()
                pieces_p.append(jnp.full(bt.capacity, -1, dtype=jnp.int64))
                pieces_b.append(jnp.arange(bt.capacity, dtype=jnp.int64))
                pieces_v.append(unmatched_b)
            all_p = jnp.concatenate(pieces_p)
            all_b = jnp.concatenate(pieces_b)
            all_v = jnp.concatenate(pieces_v)
            null_p = eff_mode == JoinMode.FULL
            null_b = eff_mode in (JoinMode.LEFT, JoinMode.FULL)
            psub = Table([pt.column_names[i] for i in keep_p],
                         [pt.columns[i] for i in keep_p], pt.num_rows)
            bsub = Table([bt.column_names[i] for i in keep_b],
                         [bt.columns[i] for i in keep_b], bt.num_rows)
            ptab = psub.take(all_p, all_p.shape[0], null_where_negative=null_p)
            btab = bsub.take(all_b, all_b.shape[0], null_where_negative=null_b)
            datas = [c.data for c in ptab.columns] + [c.data for c in btab.columns]
            valids = [c.validity for c in ptab.columns] + [
                c.validity for c in btab.columns
            ]
            return (datas, valids, all_v), "rows"

        out_arrays, kind = run_stage2_extra(
            "join2", probe_t, build_t,
            (left_pos, counts, build_perm, pv, bkv_raw),
            build2,
            extra_key=pred_key + (out_cap, tuple(keep_p), tuple(keep_b)),
            cacheable=cacheable,
        )

        if kind == "mask":
            (mask,) = out_arrays
            return Table(probe_t.column_names, probe_t.columns,
                         probe_t.num_rows, selection=mask)

        datas, valids, sel = out_arrays
        p_cols = [probe_t.columns[i] for i in keep_p]
        b_cols = [build_t.columns[i] for i in keep_b]
        src_cols = p_cols + b_cols
        out_cols = [
            Column(c.data_type, d, v, c.dictionary, c.dict_sorted)
            for c, d, v in zip(src_cols, datas, valids)
        ]
        names = ([probe_t.column_names[i] for i in keep_p]
                 + [build_t.column_names[i] for i in keep_b])
        out_exprs = [p_out[i] for i in keep_p] + [b_out[i] for i in keep_b]
        out = Table(names, out_cols, int(sel.shape[0]), selection=sel)
        if swap:
            # restore left-right column order (probe side was the right)
            n_p = len(p_cols)
            reorder = list(range(n_p, len(out_cols))) + list(range(n_p))
            out = Table(
                [names[i] for i in reorder],
                [out_cols[i] for i in reorder],
                out.num_rows, selection=sel,
            )
            out_exprs = [out_exprs[i] for i in reorder]
        self.output_expressions = out_exprs
        return out

    def _aligned_join(self, probe_t: Table, build_t: Table, probe_op,
                      build_op, eff_mode, stage1_arrays, sec_preds,
                      keep_p, keep_b, pred_key, cacheable, swap) -> Table:
        """Unique-build INNER/LEFT join as a probe-aligned column
        extension: output row j IS probe row j; matches form a selection
        mask (INNER) or build-side validity (LEFT).  Probe columns are
        reused without any data movement; only the kept build columns
        gather, at probe width."""
        from hyrise_tpu.operators.compiled import run_stage2_extra

        p_out = list(probe_op.output_expressions)
        b_out = list(build_op.output_expressions)

        def build2(pt: Table, bt: Table, left_pos, counts, build_perm):
            brow = jnp.take(
                build_perm,
                jnp.clip(left_pos, 0,
                         build_perm.shape[0] - 1).astype(jnp.int32),
            )
            matched = counts > 0
            build_idx = jnp.where(matched, brow.astype(jnp.int64),
                                  jnp.int64(-1))
            if sec_preds:
                # evaluate residual predicates on the aligned pairs: probe
                # columns directly, referenced build columns gathered once
                sec_children = [c for pr in sec_preds for c in pr.children]
                b_keep = sorted(used_column_indices(
                    {e.key(): i for i, e in enumerate(b_out)}, sec_children
                ))
                bred = Table([bt.column_names[i] for i in b_keep],
                             [bt.columns[i] for i in b_keep], bt.num_rows)
                btab = bred.take(build_idx, pt.capacity,
                                 null_where_negative=True)
                pair = Table(pt.column_names + btab.column_names,
                             pt.columns + btab.columns, 0)
                pair.num_rows = pt.num_rows
                cmap2 = {e.key(): i for i, e in enumerate(p_out)}
                off = len(pt.columns)
                for pos, i in enumerate(b_keep):
                    cmap2[b_out[i].key()] = off + pos
                ev2 = self.make_evaluator(pair, cmap2)
                for pr in sec_preds:
                    matched = matched & ev2.selection_mask(
                        ast.Predicate(pr.condition, pr.children)
                    )
                build_idx = jnp.where(matched, build_idx, jnp.int64(-1))
            bsub = Table([bt.column_names[i] for i in keep_b],
                         [bt.columns[i] for i in keep_b], bt.num_rows)
            btab = bsub.take(build_idx, pt.capacity,
                             null_where_negative=True)
            datas = [c.data for c in btab.columns]
            valids = [c.validity for c in btab.columns]
            return (datas, valids, matched), None

        left_pos, counts, build_perm = stage1_arrays
        out_arrays, _ = run_stage2_extra(
            "join2a", probe_t, build_t, (left_pos, counts, build_perm),
            build2,
            extra_key=pred_key + (tuple(keep_p), tuple(keep_b)),
            cacheable=cacheable,
        )
        datas, valids, matched = out_arrays
        p_cols = [probe_t.columns[i] for i in keep_p]
        b_src = [build_t.columns[i] for i in keep_b]
        b_cols = [
            Column(c.data_type, d, v, c.dictionary, c.dict_sorted)
            for c, d, v in zip(b_src, datas, valids)
        ]
        names = ([probe_t.column_names[i] for i in keep_p]
                 + [build_t.column_names[i] for i in keep_b])
        out_cols = p_cols + b_cols
        out_exprs = [p_out[i] for i in keep_p] + [b_out[i] for i in keep_b]
        if eff_mode == JoinMode.INNER:
            # matched already excludes probe padding / deselected rows
            # (stage-1 counts carry the probe row mask)
            sel = matched
        else:  # LEFT: every probe row survives; unmatched build side NULL
            sel = probe_t.selection
        out = Table(names, out_cols, probe_t.num_rows, selection=sel)
        if swap:
            n_p = len(p_cols)
            reorder = list(range(n_p, len(out_cols))) + list(range(n_p))
            out = Table(
                [names[i] for i in reorder],
                [out_cols[i] for i in reorder],
                out.num_rows, selection=sel,
            )
            out_exprs = [out_exprs[i] for i in reorder]
        self.output_expressions = out_exprs
        return out

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
        return _cross_product(
            self,
            self.input_table_left().materialize().decoded(),
            self.input_table_right().materialize().decoded(),
        )

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


DENSE_JOIN_LIMIT = 1 << 24  # 16M slots (64 MB int32) max direct table


def _dense_join_spec(build_expr, probe_expr):
    """(lo, size) when the build key is a plain int/date column whose
    FRESH statistics bound a small dense range — the bounds are only
    trusted when no rows were appended since the statistics were built
    (soft invalidation keeps stale histograms around; a later insert
    could exceed the recorded max and silently drop matches)."""
    from hyrise_tpu.database import Database
    from hyrise_tpu.statistics.table_statistics import get_table_statistics
    from hyrise_tpu.types import DataType

    ok_types = (DataType.INT, DataType.LONG, DataType.DATE)
    if not isinstance(build_expr, ast.ColumnRef) or not build_expr.origin:
        return None
    if build_expr.data_type() not in ok_types:
        return None
    if probe_expr.data_type() not in ok_types:
        return None
    try:
        table = Database.get().storage_manager.get_table(build_expr.origin)
    except KeyError:
        return None
    stats = get_table_statistics(table)
    if stats.row_count != table.num_rows:
        return None  # stale bounds: rows appended since the build
    cs = stats.columns.get(build_expr.display_name)
    if cs is None or cs.min_value is None or cs.max_value is None:
        return None
    lo = int(cs.min_value)
    size = int(cs.max_value) - lo + 1
    if not (0 < size <= DENSE_JOIN_LIMIT):
        return None
    return (lo, size)


def _op_origins(op) -> set:
    return {
        e.origin for e in op.output_expressions
        if isinstance(e, ast.ColumnRef) and getattr(e, "origin", None)
    }


def _rows_unique_for(op, origin: str) -> bool:
    """True when each row of base table `origin` appears AT MOST ONCE in
    op's output — the condition under which a declared key of `origin`
    stays unique through the subtree.  Joins below may duplicate rows
    (TPC-H Q5: customer x supplier on nationkey multiplies each customer
    ~4x, silently breaking a custkey-unique assumption above)."""
    if isinstance(op, Join):
        if op.mode in (JoinMode.SEMI, JoinMode.ANTI_NULL_AS_TRUE,
                       JoinMode.ANTI_NULL_AS_FALSE):
            return _rows_unique_for(op._left, origin)
        if op.mode == JoinMode.CROSS:
            return False
        left_has = origin in _op_origins(op._left)
        right_has = origin in _op_origins(op._right)
        if left_has == right_has:
            return False
        side, other = (
            (op._left, op._right) if left_has else (op._right, op._left)
        )
        eq = [p for p in op.predicates
              if p.condition == PredicateCondition.EQUALS]
        if not eq:
            return False
        other_origins = _op_origins(other)
        other_keys = []
        for p in eq:
            for cand in (p.left, p.right):
                if (isinstance(cand, ast.ColumnRef)
                        and getattr(cand, "origin", None) in other_origins):
                    other_keys.append(cand)
                    break
            else:
                return False
        if _derived_unique(other_keys, other):
            # the other side is an aggregate/distinct keyed by the join
            # columns: at most one matching row per key, so `side`'s rows
            # cannot multiply (TPC-H Q17: lineitem x per-part AVG)
            return _rows_unique_for(side, origin)
        if not _declared_unique(other_keys):
            return False
        return (
            _rows_unique_for(side, origin)
            and _rows_unique_for(other, other_keys[0].origin)
        )
    inputs = op.inputs()
    if not inputs:
        return True
    if len(inputs) > 1:
        return False  # unions / products / set ops may duplicate
    return _rows_unique_for(inputs[0], origin)


def _declared_unique(exprs) -> bool:
    """All exprs are columns of ONE base table and COVER a declared key
    (a superset of a unique key is itself unique — Q5's packed
    [c_custkey, c_nationkey] over the c_custkey PK)."""
    from hyrise_tpu.database import Database

    names = []
    origin = None
    for e in exprs:
        if not isinstance(e, ast.ColumnRef) or not e.origin:
            return False
        if origin is None:
            origin = e.origin
        elif e.origin != origin:
            return False
        names.append(e.display_name)
    try:
        table = Database.get().storage_manager.get_table(origin)
    except KeyError:
        return False
    key_set = set(names)
    return any(key_set >= set(kc.columns) for kc in table.key_constraints)


def _build_key_unique(build_exprs, build_op=None) -> bool:
    """True when the build-side equi key(s) are a declared unique key of
    their base table AND the build subtree cannot have duplicated that
    table's rows (ref: join_graph uniqueness reasoning in
    join_to_semi_join_rule.cpp / UCC validation) — or when the build side
    is an aggregate/distinct keyed by the join columns (GROUP BY columns
    form a UCC of the output; ref: the FD the reference derives in
    aggregate_node.cpp unique_column_combinations)."""
    if build_op is not None and _derived_unique(build_exprs, build_op):
        return True
    if not _declared_unique(build_exprs):
        return False
    if build_op is None:
        return True
    return _rows_unique_for(build_op, build_exprs[0].origin)


def _derived_unique(build_exprs, op) -> bool:
    """Walk through row-preserving unary operators (filters, projections,
    sorts, limits never INCREASE multiplicity); True when the subtree
    bottoms out in an Aggregate whose group-by keys — or a Distinct whose
    full column set — are covered by the join keys."""
    from hyrise_tpu.operators.aggregate import Aggregate
    from hyrise_tpu.operators.projection import Projection
    from hyrise_tpu.operators.set_ops import Distinct
    from hyrise_tpu.operators.sort import Sort
    from hyrise_tpu.operators.table_scan import TableScan
    from hyrise_tpu.operators.validate import Validate

    keys = {e.key() for e in build_exprs if isinstance(e, ast.Expression)}
    while op is not None:
        if isinstance(op, Aggregate):
            gb = {e.key() for e in op.group_by}
            return bool(gb) and gb <= keys
        if isinstance(op, Distinct):
            cols = {e.key() for e in op.output_expressions}
            return bool(cols) and cols <= keys
        from hyrise_tpu.operators.alias import AliasOperator
        from hyrise_tpu.operators.limit import Limit

        if isinstance(op, (TableScan, Projection, Validate, Sort, Limit,
                           AliasOperator)):
            op = op._left
            continue
        return False
    return False


def _anti_nat_mask(matched, probe_key_valid_masked, build_key_valid_raw, bt):
    """Device-side NOT IN semantics (ref: JoinMode::AntiNullAsTrue): any
    NULL build key, or a NULL probe key, makes non-matching rows unknown
    (filtered); an empty build side keeps everything."""
    build_rows = bt.row_mask()
    n_build_real = jnp.sum(build_rows, dtype=jnp.int64)
    build_has_null = jnp.any(build_rows & ~build_key_valid_raw)
    base = ~matched & probe_key_valid_masked
    empty = jnp.ones_like(base)
    return jnp.where(
        n_build_real == 0, empty,
        jnp.where(build_has_null, jnp.zeros_like(base), base),
    )


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
