"""DML operators: Insert / Delete / Update (ref: operators/insert.hpp:22,
delete.hpp:18, update.hpp:28).

Insert appends rows to the target table (growing the padded device arrays),
marking them with the transaction id; begin-CIDs are set on commit
(ref: insert.cpp flow §3.3 of SURVEY).  Delete locks rows via CAS on the
MVCC tid and sets end-CIDs on commit.  Update composes Delete + Insert.

Row identity: DML target scans carry a hidden __rowid__ column added by
GetTable (the TPU analogue of the reference's RowID pos lists).
"""

from __future__ import annotations

from functools import partial
import jax
import threading
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from hyrise_tpu.concurrency.mvcc import MvccData
from hyrise_tpu.database import Database
from hyrise_tpu.expression import ast
from hyrise_tpu.operators.base import AbstractReadWriteOperator
from hyrise_tpu.storage.column import Column, recode_to_dictionary
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import DataType, padded_size, physical_dtype

ROWID_COLUMN = "__rowid__"

_global_append_lock = threading.Lock()


def ensure_mvcc(table: Table) -> MvccData:
    if table.mvcc is None:
        table.mvcc = MvccData(table.capacity, table.num_rows, initial_cid=0)
    return table.mvcc


class Insert(AbstractReadWriteOperator):
    def __init__(self, table_name: str, source_op,
                 column_names: Optional[Sequence[str]] = None):
        super().__init__(source_op)
        self.table_name = table_name
        self.column_names = list(column_names) if column_names else None
        self._inserted_rows: List[int] = []
        self._target: Optional[Table] = None

    def _on_execute(self) -> Optional[Table]:
        src = self.input_table_left().materialize()
        if any(c.is_encoded for c in src.columns):
            # INSERT ... SELECT straight off an encoded base table
            src = Table(src.column_names,
                        [c.decoded() for c in src.columns], src.num_rows)
        target = Database.get().storage_manager.get_table(self.table_name)
        self._target = target
        mvcc = ensure_mvcc(target)
        with _global_append_lock:
            # packed (encoded) columns are immutable — decode before append
            # (ref: encoded chunks never take writes; inserts go to a new
            # mutable chunk.  One padded array per column here, so unpack.)
            target.decode_packed()
            old_n = target.num_rows
            n_new = src.num_rows
            new_n = old_n + n_new
            new_cap = max(target.capacity, padded_size(new_n))
            if new_cap > target.capacity:
                new_cap = max(new_cap, padded_size(target.capacity * 2))
            tcols = [
                (tname, tcol)
                for tname, tcol in zip(target.column_names, target.columns)
                if tname != ROWID_COLUMN
            ]
            # SQL maps INSERT source columns POSITIONALLY: the i-th select
            # item feeds the i-th target column (or the i-th name in an
            # explicit column list) regardless of the select item's name
            if self.column_names:
                src_names = self.column_names
            else:
                if src.num_columns != len(tcols):
                    raise ValueError(
                        f"INSERT into {self.table_name!r}: {src.num_columns}"
                        f" source columns for {len(tcols)} target columns"
                    )
                src_names = [tname for tname, _ in tcols]
            name_to_src = {n: i for i, n in enumerate(src_names)}
            batch = _batched_append(
                tcols, src, name_to_src, old_n, n_new, new_cap
            )
            if batch is not None:
                new_cols = batch
            else:
                new_cols = []
                for tname, tcol in tcols:
                    if tname in name_to_src and n_new > 0:
                        scol = src.columns[name_to_src[tname]]
                        new_cols.append(
                            _append_column(tcol, scol, old_n, n_new, new_cap)
                        )
                    else:
                        new_cols.append(
                            _append_nulls(tcol, old_n, n_new, new_cap)
                        )
            target.columns = new_cols
            target.num_rows = new_n
            # appended rows need not follow the load order
            target.sorted_by = []
            # soft invalidation: histograms stay usable until the row count
            # drifts ~10% (ref: chunk statistics are immutable-per-chunk,
            # chunk_statistics aren't rebuilt per insert) — rebuilding per
            # OLTP statement would dominate transaction latency
            st = target.statistics
            if st is None or new_n > st.row_count * 1.1 + 64:
                target.statistics = None
                target.pruning_statistics = None
            mvcc.grow(new_cap)
            self._inserted_rows = list(range(old_n, new_n))
            mvcc.register_insert(self._inserted_rows,
                                 self.transaction_context.transaction_id)
            Database.get().index_registry.invalidate(self.table_name)
        return None

    def commit_records(self, commit_id: int) -> None:
        self._target.mvcc.commit_insert(self._inserted_rows, commit_id)

    def rollback_records(self) -> None:
        if self._target is not None and self._inserted_rows:
            self._target.mvcc.rollback_insert(self._inserted_rows)


class Delete(AbstractReadWriteOperator):
    def __init__(self, table_name: str, in_op):
        super().__init__(in_op)
        self.table_name = table_name
        self._locked_rows: List[int] = []
        self._target: Optional[Table] = None

    def _on_execute(self) -> Optional[Table]:
        rows_table = self.input_table_left()
        target = Database.get().storage_manager.get_table(self.table_name)
        self._target = target
        mvcc = ensure_mvcc(target)
        rowids = _extract_rowids(rows_table)
        ok, locked = mvcc.try_lock_rows(
            rowids, self.transaction_context.transaction_id
        )
        if not ok:
            self.failed = True
            self.transaction_context.mark_as_conflicted()
            return None
        self._locked_rows = locked
        return None

    def commit_records(self, commit_id: int) -> None:
        if self._locked_rows:
            self._target.mvcc.commit_delete(self._locked_rows, commit_id)

    def rollback_records(self) -> None:
        if self._locked_rows:
            self._target.mvcc.unlock_rows(self._locked_rows)


class Update(AbstractReadWriteOperator):
    """Composed Delete + Insert (ref: update.hpp:28)."""

    def __init__(self, table_name: str, update_expressions, in_op):
        super().__init__(in_op)
        self.table_name = table_name
        self.update_expressions = list(update_expressions)
        self._delete: Optional[Delete] = None
        self._insert: Optional[Insert] = None

    # rows a fused point update handles before falling back to the
    # general path (OLTP updates touch a handful of rows; the general
    # path costs ~4 stages + 3 compactions per statement).  192 covers
    # a full batched TPC-C Delivery (10 districts x 15 order lines).
    POINT_UPDATE_CAP = 192

    def _on_execute(self) -> Optional[Table]:
        from hyrise_tpu.operators.projection import Projection
        from hyrise_tpu.operators.table_wrapper import TableWrapper

        if self._try_fused_point_update():
            return None

        rows_table = self.input_table_left().materialize()
        target = Database.get().storage_manager.get_table(self.table_name)

        # 1. delete the matched rows
        self._delete = Delete(self.table_name, self._left)
        self._delete.transaction_context = self.transaction_context
        self.transaction_context.register_read_write_operator(self._delete)
        self._delete._on_execute()
        if self._delete.failed:
            self.failed = True
            return None

        # 2. insert the updated values
        wrapper = TableWrapper(rows_table)
        wrapper.output_expressions = list(self._left.output_expressions)
        wrapper.execute()
        target_names = [
            n for n in target.column_names if n != ROWID_COLUMN
        ]
        proj = Projection(wrapper, self.update_expressions, target_names)
        proj.uncorrelated_subquery_plans = self.uncorrelated_subquery_plans
        proj.parameters = self.parameters
        proj.execute()
        self._insert = Insert(self.table_name, proj, target_names)
        self._insert.transaction_context = self.transaction_context
        self.transaction_context.register_read_write_operator(self._insert)
        self._insert.execute()
        return None

    def _try_fused_point_update(self) -> bool:
        """OLTP fast path: ONE jitted stage computes the matched rowids AND
        the projected replacement rows straight off the (unmaterialized)
        scan output — the general path paid a compaction, a projection
        stage and a rowid extraction per statement.  Returns True when the
        statement was fully handled (including the conflict case)."""
        from hyrise_tpu.operators.compiled import run_stage
        from hyrise_tpu.operators.table_wrapper import TableWrapper

        if self.uncorrelated_subquery_plans:
            return False
        raw = self.input_table_left()
        K = self.POINT_UPDATE_CAP
        if raw.selection is None and raw.num_rows > K:
            return False  # whole-table update: general path
        if any(c.is_encoded for c in raw.columns):
            return False
        if ROWID_COLUMN not in raw.column_names:
            return False
        if any(
            isinstance(s, ast.Subquery)
            for e in self.update_expressions for s in e.walk()
        ):
            return False
        target = Database.get().storage_manager.get_table(self.table_name)
        target_names = [n for n in target.column_names if n != ROWID_COLUMN]
        if len(self.update_expressions) != len(target_names):
            return False
        cmap = self._column_map(self._left)
        rowid_idx = raw.column_names.index(ROWID_COLUMN)
        exprs = self.update_expressions

        def build(t: Table, bound=None):
            mask = t.row_mask()
            cnt = jnp.sum(mask, dtype=jnp.int64)
            (idx,) = jnp.nonzero(mask, size=K, fill_value=-1)
            g = t.take(idx, K)
            rowids = jnp.where(
                idx >= 0, g.columns[rowid_idx].data.astype(jnp.int64), -1
            )
            head = jnp.concatenate([cnt[None], rowids])
            ev = self.make_evaluator(g, cmap, parameters=bound,
                                     sub_results={})
            arrays, meta = [], []
            for e in exprs:
                r = ev.evaluate(e)
                data = r.data
                if data.dtype == jnp.bool_:
                    data = data.astype(jnp.int32)
                arrays.append((data, r.validity))
                meta.append((r.dtype, r.dictionary, r.dict_sorted))
            return (head, arrays), meta

        from hyrise_tpu.operators.compiled import used_column_indices

        (head, arrays), meta = run_stage(
            "point_update", raw, build,
            extra_key=(K, tuple(e.key() for e in exprs)),
            params=self.parameters if self.parameters else None,
            used_cols=used_column_indices(cmap, exprs),
        )
        head = np.asarray(head)  # the statement's one host sync
        cnt = int(head[0])
        if cnt > K:
            return False  # more matches than the fused bound: general path
        rowids = [int(x) for x in head[1:1 + cnt]]

        target = Database.get().storage_manager.get_table(self.table_name)
        mvcc = ensure_mvcc(target)
        dl = Delete(self.table_name, self._left)
        dl.transaction_context = self.transaction_context
        dl._target = target
        ok, locked = mvcc.try_lock_rows(
            rowids, self.transaction_context.transaction_id
        )
        if not ok:
            self.failed = True
            self.transaction_context.mark_as_conflicted()
            return True
        dl._locked_rows = locked
        self.transaction_context.register_read_write_operator(dl)
        self._delete = dl

        cols = [
            Column(dtype, data, validity, dictionary, ds)
            for (data, validity), (dtype, dictionary, ds) in zip(arrays, meta)
        ]
        src = Table(target_names, cols, cnt)
        wrapper = TableWrapper(src)
        wrapper.execute()
        self._insert = Insert(self.table_name, wrapper, target_names)
        self._insert.transaction_context = self.transaction_context
        self.transaction_context.register_read_write_operator(self._insert)
        self._insert.execute()
        return True

    def commit_records(self, commit_id: int) -> None:
        pass  # the registered Delete/Insert commit themselves

    def rollback_records(self) -> None:
        pass


# ------------------------------------------------------------------ helpers


def _extract_rowids(table: Table) -> List[int]:
    table = table.materialize()
    try:
        idx = table.column_names.index(ROWID_COLUMN)
    except ValueError:
        raise RuntimeError(
            "DML input lacks __rowid__ column (GetTable must include row ids)"
        )
    data = np.asarray(table.columns[idx].data[: table.num_rows])
    return [int(x) for x in data]


@jax.jit
def _jit_place(dst, src, start):
    """One fused row-append write (the OLTP fast path: jit specializes per
    (capacity, n_new, dtype) and reuses across all inserts, vs the eager
    zero+scatter+scatter chain that dominated per-statement latency)."""
    return jax.lax.dynamic_update_slice(dst, src.astype(dst.dtype), (start,))


def _place(dst, src, start: int):
    return _jit_place(dst, src, jnp.asarray(start, dtype=jnp.int32))


def _batched_append(tcols, src, name_to_src, old_n: int, n_new: int,
                    new_cap: int):
    """Single-dispatch whole-row append, or None when a column needs the
    general path (capacity growth, nullability widening, dictionary
    growth).  Nullable columns append their validity bitmaps inside the
    SAME dispatch (per-column eager validity merges cost ~20 dispatches
    per OLTP update on wide tables like TPC-C customer)."""
    if n_new <= 0 or not tcols or new_cap != tcols[0][1].capacity:
        return None
    datas, srcs, rebuild = [], [], []
    for tname, tcol in tcols:
        if tname not in name_to_src:
            return None
        scol = src.columns[name_to_src[tname]]
        if tcol.validity is None and scol.validity is not None:
            return None  # target would need a fresh validity: general path
        if tcol.data_type == DataType.STRING:
            if scol.data_type != DataType.STRING:
                return None
            if scol.dictionary is tcol.dictionary:
                # UPDATE re-insert: codes already reference the target
                # dictionary — no host sync, no merge (the 11 string
                # columns of TPC-C stock paid one device->host round
                # trip each per statement here)
                s = scol.data
            else:
                merged, tgt_codes = _src_string_codes(tcol, scol, n_new)
                if merged is not tcol.dictionary:
                    return None  # dictionary growth: general path
                s = jnp.asarray(tgt_codes)
        elif scol.data_type == DataType.STRING:
            if tcol.data_type != DataType.DATE:
                return None
            from hyrise_tpu.utils.dates import date_str_to_days

            lut = jnp.asarray(date_str_to_days(scol.dictionary))
            s = jnp.take(lut, jnp.clip(scol.data, 0, len(scol.dictionary) - 1))
        else:
            s = scol.data
        datas.append(tcol.data)
        srcs.append(s)
        if tcol.validity is not None:
            datas.append(tcol.validity)
            srcs.append(scol.validity if scol.validity is not None
                        else jnp.ones(n_new, dtype=bool))
        rebuild.append((tcol, tcol.validity is not None))
    if len({id(d) for d in datas}) != len(datas):
        return None  # aliased target buffers cannot be donated twice
    from hyrise_tpu.utils.runtime import exclusive_access

    append = _jit_append_all if exclusive_access() else _jit_append_all_copy
    out = append(
        tuple(datas), tuple(srcs), jnp.asarray(old_n, dtype=jnp.int32), n_new
    )
    cols, k = [], 0
    for c, has_valid in rebuild:
        data = out[k]
        k += 1
        validity = None
        if has_valid:
            validity = out[k]
            k += 1
        cols.append(Column(c.data_type, data, validity, c.dictionary,
                           c.dict_sorted))
    return cols


def _src_string_codes(tcol, scol, n_new: int):
    """Target-dictionary codes for the first n_new rows of a STRING source
    column, merging ONLY the values those rows reference.  An UPDATE's
    projection carries the full table dictionary for a 1-row insert, so
    merging whole dictionaries binary-searched thousands of long strings
    per statement.  Returns (merged_dict, np.int32 codes of length n_new);
    merged_dict is tcol.dictionary itself when nothing new appears."""
    from hyrise_tpu.storage.column import merge_with_luts

    if scol.dictionary is None or len(scol.dictionary) == 0:
        return tcol.dictionary, np.zeros(n_new, dtype=np.int32)
    codes = np.clip(np.asarray(scol.data[:n_new]), 0,
                    len(scol.dictionary) - 1)
    vals = scol.dictionary[codes]
    merged, _, _ = merge_with_luts(tcol.dictionary, np.unique(vals))
    tgt = np.searchsorted(merged, vals).astype(np.int32)
    return merged, tgt


@partial(jax.jit, static_argnames=("n_new",), donate_argnums=(0,))
def _jit_append_all(datas, srcs, start, n_new):
    """Whole-row append across all columns in ONE dispatch: slice, cast and
    dynamic-update every column inside a single executable (per-column
    eager ops made each TPC-C insert ~10 dispatches per column).

    The target buffers are DONATED: without donation every
    dynamic_update_slice copies the full column capacity (40 MB/txn on a
    1-warehouse order_line — the copy, not the write, was ~90% of TPC-C
    statement latency).  Callers must drop every reference to the old
    arrays (Insert swaps target.columns right after), and only call this
    under runtime.exclusive_access() — a concurrent statement may still
    hold the old buffers (use _jit_append_all_copy then)."""
    out = []
    for d, s in zip(datas, srcs):
        out.append(
            jax.lax.dynamic_update_slice(
                d, s[:n_new].astype(d.dtype), (start,)
            )
        )
    return tuple(out)


@partial(jax.jit, static_argnames=("n_new",))
def _jit_append_all_copy(datas, srcs, start, n_new):
    """Non-donating variant for concurrent execution (immutable-copy
    semantics; readers in other threads keep valid buffers)."""
    out = []
    for d, s in zip(datas, srcs):
        out.append(
            jax.lax.dynamic_update_slice(
                d, s[:n_new].astype(d.dtype), (start,)
            )
        )
    return tuple(out)


def _append_column(tcol: Column, scol: Column, old_n: int, n_new: int,
                   new_cap: int) -> Column:
    same_cap = new_cap == tcol.capacity
    if tcol.data_type == DataType.STRING:
        from hyrise_tpu.storage.column import merge_with_luts

        merged, tgt_codes = _src_string_codes(tcol, scol, n_new)
        src_codes = jnp.asarray(tgt_codes)
        if same_cap and merged is tcol.dictionary:
            data = _place(tcol.data, src_codes, old_n)
        else:
            # old codes keep their positions for values already in the
            # dictionary only if merged preserves order — recompute LUT
            _, lut_old, _ = merge_with_luts(tcol.dictionary, merged)
            old_codes = recode_to_dictionary(tcol, merged, lut=lut_old)
            data = jnp.zeros(new_cap, dtype=jnp.int32)
            data = data.at[: old_codes.shape[0]].set(old_codes)
            data = data.at[old_n:old_n + n_new].set(src_codes)
        new_col = Column(DataType.STRING, data, None, merged, True)
    else:
        np_dt = physical_dtype(tcol.data_type)
        if scol.data_type == DataType.STRING:
            if tcol.data_type == DataType.DATE:
                # coerce date-string values through the dictionary
                from hyrise_tpu.utils.dates import date_str_to_days

                lut = jnp.asarray(date_str_to_days(scol.dictionary))
                src_data = jnp.take(
                    lut, jnp.clip(scol.data, 0, len(scol.dictionary) - 1)
                ).astype(np_dt)
            else:
                raise RuntimeError("cannot insert string into non-string column")
        else:
            src_data = scol.data
        if same_cap and tcol.data.dtype == np_dt:
            data = _place(tcol.data, src_data[:n_new], old_n)
        else:
            data = jnp.zeros(new_cap, dtype=np_dt)
            data = data.at[: tcol.data.shape[0]].set(tcol.data.astype(np_dt))
            data = data.at[old_n:old_n + n_new].set(
                src_data[:n_new].astype(np_dt)
            )
        new_col = Column(tcol.data_type, data)
    validity = _merge_append_validity(tcol, scol, old_n, n_new, new_cap)
    new_col.validity = validity
    return new_col


def _append_nulls(tcol: Column, old_n: int, n_new: int, new_cap: int) -> Column:
    same_cap = new_cap == tcol.capacity
    if same_cap:
        data = tcol.data
    elif tcol.data_type == DataType.STRING:
        data = jnp.zeros(new_cap, dtype=jnp.int32)
        data = data.at[: tcol.data.shape[0]].set(tcol.data)
    else:
        data = jnp.zeros(new_cap, dtype=tcol.data.dtype)
        data = data.at[: tcol.data.shape[0]].set(tcol.data)
    if tcol.data_type == DataType.STRING:
        col = Column(DataType.STRING, data, None, tcol.dictionary, tcol.dict_sorted)
    else:
        col = Column(tcol.data_type, data)
    if same_cap and tcol.validity is not None:
        valid = _place(
            tcol.validity, jnp.zeros(n_new, dtype=bool), old_n
        )
    else:
        valid = jnp.ones(new_cap, dtype=bool)
        if tcol.validity is not None:
            valid = valid.at[: tcol.validity.shape[0]].set(tcol.validity)
        valid = valid.at[old_n:old_n + n_new].set(False)
    col.validity = valid
    return col


def _merge_append_validity(tcol: Column, scol: Column, old_n: int, n_new: int,
                           new_cap: int):
    if tcol.validity is None and scol.validity is None:
        return None
    valid = jnp.ones(new_cap, dtype=bool)
    if tcol.validity is not None:
        valid = valid.at[: tcol.validity.shape[0]].set(tcol.validity)
    if scol.validity is not None:
        valid = valid.at[old_n:old_n + n_new].set(scol.validity[:n_new])
    return valid
