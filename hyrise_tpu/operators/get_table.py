"""Leaf operator reading a stored table with column/block pruning
(ref: operators/get_table.hpp:23 — static+dynamic chunk pruning and column
pruning applied at the leaf)."""

from __future__ import annotations

from typing import List, Optional, Sequence

from hyrise_tpu.database import Database
from hyrise_tpu.expression import ast
from hyrise_tpu.operators.base import AbstractReadOnlyOperator
from hyrise_tpu.storage.table import Table


class GetTable(AbstractReadOnlyOperator):
    def __init__(
        self,
        table_name: str,
        pruned_column_names: Sequence[str] = (),
        output_expressions: Optional[List[ast.Expression]] = None,
        include_row_ids: bool = False,
        pruning_predicates: Sequence[ast.Expression] = (),
    ):
        super().__init__()
        self.table_name = table_name
        self.pruned_column_names = set(pruned_column_names)
        self.include_row_ids = include_row_ids
        self.pruning_predicates = list(pruning_predicates)
        # observability: how many blocks the last execution read
        self.blocks_total = 0
        self.blocks_kept = 0
        if output_expressions is not None:
            self.output_expressions = output_expressions

    def _on_execute(self) -> Table:
        import jax.numpy as jnp

        from hyrise_tpu.storage.column import Column
        from hyrise_tpu.types import DataType

        sm = Database.get().storage_manager
        table = sm.get_table(self.table_name)
        keep = [n for n in table.column_names if n not in self.pruned_column_names]
        out = table.select(keep) if self.pruned_column_names else table
        out.mvcc = table.mvcc
        if (self.pruning_predicates and not self.include_row_ids
                and table.selection is None and table.mvcc is None
                and table.num_rows):
            out = self._apply_block_pruning(table, out)
        if self.include_row_ids:
            rowid = Column(
                DataType.LONG, jnp.arange(out.capacity, dtype=jnp.int64)
            )
            with_ids = Table(
                out.column_names + ["__rowid__"],
                out.columns + [rowid],
                out.num_rows,
            )
            with_ids.mvcc = table.mvcc
            with_ids.sorted_by = out.sorted_by
            out = with_ids
        if not self.output_expressions:
            self.output_expressions = [
                ast.ColumnRef(n, c.data_type, c.validity is not None,
                              origin=self.table_name)
                for n, c in zip(out.column_names, out.columns)
            ]
        return out

    def _apply_block_pruning(self, base: Table, out: Table) -> Table:
        """Skip blocks whose min/max prove no row matches; surviving
        blocks re-pack with ONE device gather (ref: get_table.cpp chunk
        pruning).  Statistics (soft-)rebuild at the current row count."""
        import jax.numpy as jnp
        import numpy as np

        from hyrise_tpu.statistics.pruning import (
            blocks_surviving,
            build_pruning_statistics,
            ensure_column,
        )

        stats = base.pruning_statistics
        if stats is None or stats.row_count != base.num_rows:
            stats = build_pruning_statistics(base, column_names=())
            base.pruning_statistics = stats
        predicates = self._resolve_dynamic_predicates(stats)
        if not predicates:
            return out
        # only the predicate columns ever pull to the host
        for p in predicates:
            ensure_column(stats, base, p.children[0].display_name)
        keep = blocks_surviving(stats, base, predicates)
        self.blocks_total = stats.n_blocks
        self.blocks_kept = int(keep.sum())
        if self.blocks_kept >= stats.n_blocks:
            return out
        kept_idx = np.flatnonzero(keep)
        B = stats.block_rows
        if len(kept_idx) == 0:
            # keep one lane of capacity: zero-capacity arrays break any
            # downstream stage that gathers with static-size index vectors
            # (e.g. a join expansion sized from the other side)
            from hyrise_tpu.types import LANE

            empty = Table(out.column_names,
                          [c.take(jnp.zeros(LANE, dtype=jnp.int32)) for c in
                           out.columns], 0)
            return empty
        rows = (jnp.asarray(kept_idx.astype(np.int64))[:, None] * B
                + jnp.arange(B, dtype=jnp.int64)[None, :]).reshape(-1)
        rows = jnp.minimum(rows, out.capacity - 1)
        counts = jnp.asarray(stats.block_counts[kept_idx].astype(np.int64))
        valid = (jnp.arange(B, dtype=jnp.int64)[None, :]
                 < counts[:, None]).reshape(-1)
        packed = Table(
            out.column_names,
            [c.take(rows) for c in out.columns],
            int(len(kept_idx) * B),
            selection=valid,
        )
        # blocks re-pack in ascending block order: row order is preserved
        packed.sorted_by = out.sorted_by
        return packed

    def _resolve_dynamic_predicates(self, stats):
        """Replace uncorrelated-subquery operands with their concrete
        scalar values (ref: get_table.hpp:57-58 dynamic chunk pruning).
        The scalar extraction is a device->host sync, so it only happens
        when the table spans >1 block (pruning can actually pay); a
        missing / NULL / non-scalar result drops that predicate (keeping
        every block is always sound — the scan above still filters)."""
        resolved = []
        for p in self.pruning_predicates:
            if not any(isinstance(c, ast.Subquery) for c in p.children[1:]):
                resolved.append(p)
                continue
            if stats.n_blocks < 2:
                continue
            operands = [p.children[0]]
            ok = True
            for c in p.children[1:]:
                if not isinstance(c, ast.Subquery):
                    operands.append(c)
                    continue
                result = getattr(self, "_sub_results", {}).get(c.key())
                if result is None:
                    ok = False
                    break
                rows = result.to_pylist()
                if len(rows) != 1 or len(rows[0]) != 1 or rows[0][0] is None:
                    ok = False
                    break
                v = rows[0][0]
                import numpy as np

                if isinstance(v, np.integer):
                    v = int(v)
                elif isinstance(v, np.floating):
                    v = float(v)
                operands.append(ast.Literal(v))
            if ok:
                resolved.append(ast.Predicate(p.condition, operands))
        return resolved

    def _describe_self(self) -> str:
        return f"GetTable({self.table_name})"
