"""SQL statement AST -> logical query plan
(ref: sql/sql_translator.cpp, 2513 LoC — SELECT with joins incl.
natural/USING, set operations, GROUP BY/HAVING, DISTINCT, ORDER BY, LIMIT,
WITH, correlated & uncorrelated subqueries, DML, DDL, meta tables).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

from hyrise_tpu.database import Database
from hyrise_tpu.expression import ast
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.sql import statements as st
from hyrise_tpu.types import (
    DataType,
    JoinMode,
    PredicateCondition,
    SetOperationMode,
)


class TranslationError(ValueError):
    pass


@dataclass
class Relation:
    """One FROM-clause entry: alias + ordered named columns."""

    alias: Optional[str]
    names: List[str]
    exprs: List[ast.Expression]

    def find(self, name: str) -> Optional[ast.Expression]:
        try:
            return self.exprs[self.names.index(name)]
        except ValueError:
            return None


class Scope:
    def __init__(self, parent: Optional["Scope"] = None):
        self.relations: List[Relation] = []
        self.parent = parent
        # aliases from the select list (for ORDER BY/GROUP BY/HAVING)
        self.select_aliases: Dict[str, ast.Expression] = {}
        # correlated parameter bookkeeping (filled when parent lookups hit)
        self.correlated: List[Tuple[int, ast.Expression]] = []
        self._param_ids = itertools.count(1000)
        self._param_cache: Dict[tuple, ast.Parameter] = {}

    def add_relation(self, rel: Relation):
        self.relations.append(rel)

    def resolve(self, parts: Tuple[str, ...]) -> ast.Expression:
        expr = self._resolve_local(parts)
        if expr is not None:
            return expr
        if self.parent is not None:
            outer = self.parent.resolve(parts)
            # correlated reference: replace with a Parameter bound to the
            # outer expression (ref: sql_translator external expressions)
            key = outer.key()
            if key in self._param_cache:
                return self._param_cache[key]
            pid = next(self._param_ids)
            param = ast.Parameter(pid, outer.data_type(), outer.nullable())
            self._param_cache[key] = param
            self.correlated.append((pid, outer))
            return param
        raise TranslationError(f"unknown column {'.'.join(parts)!r}")

    def _resolve_local(self, parts):
        if len(parts) == 2:
            tbl, col = parts
            for rel in self.relations:
                if rel.alias == tbl:
                    e = rel.find(col)
                    if e is None:
                        raise TranslationError(
                            f"no column {col!r} in relation {tbl!r}"
                        )
                    return e
            return None
        (name,) = parts
        matches = []
        for rel in self.relations:
            e = rel.find(name)
            if e is not None:
                matches.append(e)
        if len(matches) > 1 and any(m is not matches[0] for m in matches):
            raise TranslationError(f"ambiguous column {name!r}")
        if matches:
            return matches[0]
        if name in self.select_aliases:
            return self.select_aliases[name]
        return None

    def all_columns(self, table: Optional[str] = None):
        out_names, out_exprs = [], []
        for rel in self.relations:
            if table is not None and rel.alias != table:
                continue
            out_names.extend(rel.names)
            out_exprs.extend(rel.exprs)
        if table is not None and not out_exprs:
            raise TranslationError(f"unknown relation {table!r}")
        return out_names, out_exprs


class SQLTranslator:
    """Ref: sql/sql_translator.hpp:53.  use_mvcc inserts ValidateNodes below
    stored tables (snapshot visibility)."""

    def __init__(self, use_mvcc: bool = True,
                 with_statements: Optional[Dict[str, st.SelectStatement]] = None):
        self.use_mvcc = use_mvcc
        self._withs: Dict[str, st.SelectStatement] = dict(with_statements or {})

    # ------------------------------------------------------------------ API

    def translate(self, stmt: st.Statement) -> L.LQPNode:
        if isinstance(stmt, st.SelectStatement):
            root, _ = self._translate_select(stmt, outer_scope=None)
            return root
        if isinstance(stmt, st.InsertStatement):
            return self._translate_insert(stmt)
        if isinstance(stmt, st.UpdateStatement):
            return self._translate_update(stmt)
        if isinstance(stmt, st.DeleteStatement):
            return self._translate_delete(stmt)
        if isinstance(stmt, st.CreateTableStatement):
            return self._translate_create_table(stmt)
        if isinstance(stmt, st.DropTableStatement):
            return L.DropTableNode(stmt.table_name, stmt.if_exists)
        if isinstance(stmt, st.CreateViewStatement):
            from hyrise_tpu.storage.storage_manager import LQPView

            return L.CreateViewNode(
                stmt.view_name, stmt.if_not_exists,
                LQPView(stmt.select, stmt.column_aliases),
            )
        if isinstance(stmt, st.DropViewStatement):
            return L.DropViewNode(stmt.view_name, stmt.if_exists)
        if isinstance(stmt, st.CopyStatement):
            if stmt.direction == "from":
                return L.ImportNode(stmt.table_name, stmt.file_path, stmt.file_format)
            root, _ = self._translate_select(
                _select_star(stmt.table_name), outer_scope=None
            )
            return L.ExportNode(stmt.file_path, stmt.file_format, root)
        raise TranslationError(f"cannot translate {type(stmt).__name__}")

    # --------------------------------------------------------------- SELECT

    def _translate_select(self, stmt: st.SelectStatement,
                          outer_scope: Optional[Scope]):
        # WITH ctes visible in this statement and nested ones
        saved_withs = dict(self._withs)
        for w in stmt.with_clauses:
            self._withs[w.name] = (
                w.select if w.column_aliases is None
                else _aliased_select(w.select, w.column_aliases)
            )
        try:
            if stmt.set_op is not None:
                return self._translate_set_op(stmt, outer_scope)
            return self._translate_select_core(stmt, outer_scope)
        finally:
            self._withs = saved_withs

    def _translate_grouping_sets(self, stmt, outer_scope):
        """Desugar GROUP BY ROLLUP/CUBE/GROUPING SETS into a UNION ALL of
        per-set aggregates: each branch groups by its subset and projects
        typed NULLs for the suppressed keys (beyond the reference, which
        excludes rollup queries; GROUPING(key) folds to a per-branch
        0/1 constant).  Window functions evaluate per grouping set —
        equivalent to the standard whenever the window partitions by the
        grouping level (the Q86 pattern), since partitions then never
        span sets.  ORDER BY / LIMIT apply once on top of the union.

        Known inefficiency: each branch re-executes the FROM/WHERE
        pipeline (ROLLUP(n) scans n+1 times).  The standard optimization
        — aggregate once at the finest level, re-aggregate coarser sets
        from that result (decomposing AVG into SUM/COUNT) — is future
        work; plan-stage caching already dedupes the compiled scans."""
        import copy as _copy

        if any(isinstance(e, st.Star) for e, _ in stmt.select_list):
            raise TranslationError("SELECT * with GROUPING SETS/ROLLUP")

        def matches(ge, item_expr, alias):
            if ge is item_expr:
                return True
            if isinstance(ge, st.UnresolvedColumn):
                if isinstance(item_expr, st.UnresolvedColumn):
                    if ge.parts == item_expr.parts:
                        return True
                    # qualified vs unqualified reference to the same
                    # column: resolvable queries are unambiguous, so the
                    # last part decides when either side is bare
                    if (ge.parts[-1] == item_expr.parts[-1]
                            and (len(ge.parts) == 1
                                 or len(item_expr.parts) == 1)):
                        return True
                if alias and len(ge.parts) == 1 and ge.parts[0] == alias:
                    return True
                return False
            if isinstance(item_expr, st.UnresolvedColumn):
                return False
            # expression keys (a || b, EXTRACT(...)): structural match
            try:
                return (type(ge) is type(item_expr)
                        and ge.description() == item_expr.description())
            except Exception:
                return False

        def contains_grouping(expr) -> bool:
            if (isinstance(expr, ast.Function)
                    and expr.fname.lower() == "grouping"):
                return True
            return any(contains_grouping(c) for c in expr.children)

        # windows evaluate per grouping set; that equals the standard only
        # when every window partitions by the grouping level (its
        # partition keys include a GROUPING() term) — reject the
        # non-equivalent shape loudly instead of returning wrong ranks
        def check_windows(expr):
            for sub in expr.walk():
                if isinstance(sub, ast.WindowExpression):
                    if not any(contains_grouping(p)
                               for p in sub.partition_by):
                        raise TranslationError(
                            "window functions combined with ROLLUP/"
                            "GROUPING SETS must PARTITION BY the grouping"
                            " level (a GROUPING() expression); other"
                            " shapes would rank across grouping sets"
                        )

        for e, _ in stmt.select_list:
            check_windows(e)

        def subst_grouping(expr, suppressed, nested=False):
            # GROUPING(key) is a per-branch constant under the desugar:
            # 1 when the key is suppressed in this grouping set, else 0.
            # A suppressed key referenced INSIDE a composite expression is
            # NULL in that branch (standard ROLLUP semantics — Q86's
            # CASE WHEN GROUPING(c)=0 THEN category END); top-level select
            # items instead get a typed cast (union column alignment).
            if (isinstance(expr, ast.Function)
                    and expr.fname.lower() == "grouping"
                    and len(expr.children) == 1):
                inner = expr.children[0]
                val = 1 if any(matches(g, inner, None) for g in suppressed) \
                    else 0
                return ast.Literal(val)
            if (nested and isinstance(expr, st.UnresolvedColumn)
                    and any(matches(g, expr, None) for g in suppressed)):
                return ast.Literal(None)
            kids = [subst_grouping(c, suppressed, nested=True)
                    for c in expr.children]
            return _rebuild(expr, kids)

        # typing pre-pass: translate with the FULL key list to learn every
        # select item's output type (NULL literals must cast to it);
        # GROUPING() is 0 everywhere in the full set
        probe = _copy.copy(stmt)
        probe.grouping_sets = None
        probe.order_by = []
        probe.limit = None
        probe.offset = None
        probe.select_list = [(subst_grouping(e, []), a)
                             for e, a in stmt.select_list]
        if stmt.having is not None:
            probe.having = subst_grouping(stmt.having, [])
        probe_root, names = self._translate_select_core(probe, outer_scope)
        out_types = [e.data_type() for e in probe_root.output_expressions()]

        roots = []
        for s in stmt.grouping_sets:
            branch = _copy.copy(stmt)
            branch.grouping_sets = None
            branch.order_by = []
            branch.limit = None
            branch.offset = None
            branch.group_by = [stmt.group_by[i] for i in s]
            suppressed = [g for i, g in enumerate(stmt.group_by)
                          if i not in s]
            if stmt.having is not None:
                branch.having = subst_grouping(stmt.having, suppressed)
            new_list = []
            for pos, (expr, alias) in enumerate(stmt.select_list):
                expr = subst_grouping(expr, suppressed)
                if any(matches(g, expr, alias) for g in suppressed):
                    if alias:
                        name = alias
                    elif isinstance(expr, st.UnresolvedColumn):
                        name = expr.parts[-1]
                    else:
                        name = names[pos]
                    new_list.append(
                        (ast.Cast(ast.Literal(None), out_types[pos]), name)
                    )
                else:
                    new_list.append((expr, alias))
            branch.select_list = new_list
            root, _ = self._translate_select_core(branch, outer_scope)
            roots.append(root)

        node = roots[0]
        for r in roots[1:]:
            node = L.UnionNode(SetOperationMode.ALL, node, r)
        root: L.LQPNode = node
        if stmt.order_by:
            scope = Scope()
            out_exprs = root.output_expressions()
            scope.add_relation(Relation(None, names, out_exprs))
            items = []
            for item in stmt.order_by:
                if (isinstance(item.expr, ast.Literal)
                        and isinstance(item.expr.value, int)):
                    idx = item.expr.value - 1
                    if not 0 <= idx < len(out_exprs):
                        raise TranslationError(
                            f"ORDER BY position {idx + 1} out of range")
                    e = out_exprs[idx]
                else:
                    e = self._resolve_expr(item.expr, scope)
                items.append((e, item.sort_mode))
            root = L.SortNode(items, root)
        root = self._apply_limit(stmt, root)
        return root, names

    def _translate_set_op(self, stmt, outer_scope):
        kind, all_mode, rhs = stmt.set_op
        left_stmt = getattr(stmt, "_set_op_left")
        lroot, lnames = self._translate_select(left_stmt, outer_scope)
        rroot, _ = self._translate_select(rhs, outer_scope)
        mode = SetOperationMode.ALL if all_mode else SetOperationMode.UNIQUE
        if kind == "union":
            node = L.UnionNode(mode, lroot, rroot)
        elif kind == "intersect":
            node = L.IntersectNode(mode, lroot, rroot)
        else:
            node = L.ExceptNode(mode, lroot, rroot)
        root: L.LQPNode = node
        if stmt.order_by:
            scope = Scope()
            out_exprs = root.output_expressions()
            scope.add_relation(Relation(None, lnames, out_exprs))
            items = []
            for item in stmt.order_by:
                if (isinstance(item.expr, ast.Literal)
                        and isinstance(item.expr.value, int)):
                    idx = item.expr.value - 1
                    if not 0 <= idx < len(out_exprs):
                        raise TranslationError(
                            f"ORDER BY position {idx + 1} out of range")
                    e = out_exprs[idx]
                else:
                    e = self._resolve_expr(item.expr, scope)
                items.append((e, item.sort_mode))
            root = L.SortNode(items, root)
        root = self._apply_limit(stmt, root)
        return root, lnames

    def _translate_select_core(self, stmt, outer_scope):
        if getattr(stmt, "grouping_sets", None):
            return self._translate_grouping_sets(stmt, outer_scope)
        if stmt.group_by and (
            any(_contains_grouping_fn(e) for e, _ in stmt.select_list)
            or (stmt.having is not None
                and _contains_grouping_fn(stmt.having))
        ):
            # plain GROUP BY: GROUPING() is the constant 0 by definition
            stmt = _fold_plain_grouping(stmt)
        scope = Scope(outer_scope)

        # ---- FROM
        if stmt.from_clause is None:
            root: L.LQPNode = L.DummyTableNode()
        else:
            root = self._translate_table_ref(stmt.from_clause, scope)

        # ---- WHERE
        if stmt.where is not None:
            pred = self._resolve_expr(stmt.where, scope)
            root = self._predicates_from_conjunction(pred, root, scope)

        # ---- select list resolution
        select_exprs: List[ast.Expression] = []
        select_names: List[str] = []
        for expr, alias in stmt.select_list:
            if isinstance(expr, st.Star):
                names, exprs = scope.all_columns(expr.table)
                select_exprs.extend(exprs)
                select_names.extend(names)
            else:
                e = self._resolve_expr(expr, scope)
                select_exprs.append(e)
                name = alias if alias else _expr_name(expr, e)
                select_names.append(name)
                if alias:
                    scope.select_aliases[alias] = e

        # ---- HAVING / ORDER BY resolution (may reference aliases)
        having_expr = (
            self._resolve_expr(stmt.having, scope) if stmt.having is not None else None
        )
        order_items: List[Tuple[ast.Expression, object]] = []
        for item in stmt.order_by:
            if isinstance(item.expr, ast.Literal) and isinstance(item.expr.value, int):
                idx = item.expr.value - 1
                if not 0 <= idx < len(select_exprs):
                    raise TranslationError(f"ORDER BY position {idx+1} out of range")
                e = select_exprs[idx]
            elif (
                isinstance(item.expr, st.UnresolvedColumn)
                and len(item.expr.parts) == 1
                and item.expr.parts[0] in scope.select_aliases
            ):
                # SQL: a bare ORDER BY name matching a SELECT output alias
                # binds to the OUTPUT column, even when a FROM column has
                # the same name (PostgreSQL/sqlite semantics; e.g. TPC-DS
                # Q33's ORDER BY total_sales over a derived total_sales)
                e = scope.select_aliases[item.expr.parts[0]]
            else:
                e = self._resolve_expr(item.expr, scope)
            order_items.append((e, item.sort_mode))

        group_exprs = [self._resolve_expr(g, scope) for g in stmt.group_by]

        # ---- aggregates (skip ones already produced by the FROM clause,
        # e.g. columns of a derived table that happen to be aggregates)
        available = {
            e.key() for rel in scope.relations for e in rel.exprs
        }

        def walk_local(e: ast.Expression):
            # Walk only the parts of the tree written in THIS query block:
            # an expression produced by the FROM clause (derived table /
            # view output) is an opaque column here, so its internals —
            # e.g. the SUM inside an exposed AVG(SUM(x)) OVER (...) —
            # must not be re-collected as this block's aggregates.
            yield e
            if e.key() in available:
                return
            for c in e.children:
                yield from walk_local(c)

        agg_exprs: List[ast.AggregateExpression] = []

        def collect_aggs(e: Optional[ast.Expression]):
            if e is None:
                return
            for sub in walk_local(e):
                if (
                    isinstance(sub, ast.AggregateExpression)
                    and sub.key() not in available
                    and sub not in agg_exprs
                ):
                    agg_exprs.append(sub)

        for e in select_exprs:
            collect_aggs(e)
        collect_aggs(having_expr)
        for e, _ in order_items:
            collect_aggs(e)

        window_exprs = [
            sub
            for e in select_exprs
            for sub in walk_local(e)
            if isinstance(sub, ast.WindowExpression) and sub.key() not in available
        ]

        if agg_exprs or group_exprs:
            root = L.AggregateNode(group_exprs, agg_exprs, root)
        if having_expr is not None:
            root = self._predicates_from_conjunction(having_expr, root, scope)
        for w in window_exprs:
            root = L.WindowNode(w, root)

        # ---- projection (+ extra order-by columns), distinct, sort, limit
        extras = [e for e, _ in order_items if e not in select_exprs]
        needs_pre = bool(extras)
        if needs_pre and not stmt.distinct:
            root = L.ProjectionNode(select_exprs + extras, root)
        else:
            root = L.ProjectionNode(select_exprs, root)
        if stmt.distinct:
            root = L.DistinctNode(root)
        if order_items:
            if stmt.distinct and extras:
                raise TranslationError(
                    "ORDER BY columns must appear in SELECT DISTINCT list"
                )
            root = L.SortNode(order_items, root)
        if needs_pre and not stmt.distinct:
            root = L.ProjectionNode(select_exprs, root)
        root = self._apply_limit(stmt, root)
        root = L.AliasNode(select_exprs, select_names, root)
        # propagate correlation info upward
        if outer_scope is not None and scope.correlated:
            root._correlated_params = scope.correlated  # type: ignore[attr-defined]
        return root, select_names

    def _apply_limit(self, stmt, root):
        if stmt.limit is not None:
            root = L.LimitNode(stmt.limit, stmt.offset, root)
        elif stmt.offset is not None:
            root = L.LimitNode(ast.Literal(2**62), stmt.offset, root)
        return root

    # ----------------------------------------------------------- table refs

    def _translate_table_ref(self, ref: st.TableRef, scope: Scope) -> L.LQPNode:
        if isinstance(ref, st.NamedTable):
            return self._translate_named_table(ref, scope)
        if isinstance(ref, st.DerivedTable):
            sub_root, sub_names = self._translate_select(
                ref.select, outer_scope=scope.parent
            )
            names = ref.column_aliases or sub_names
            exprs = sub_root.output_expressions()
            if len(names) != len(exprs):
                raise TranslationError("column alias count mismatch")
            scope.add_relation(Relation(ref.alias, list(names), list(exprs)))
            return sub_root
        if isinstance(ref, st.JoinRef):
            return self._translate_join(ref, scope)
        raise TranslationError(f"bad table ref {ref!r}")

    def _translate_named_table(self, ref: st.NamedTable, scope: Scope) -> L.LQPNode:
        db = Database.get()
        name = ref.name
        alias = ref.alias or name
        if name in self._withs:
            sub_root, sub_names = self._translate_select(
                self._withs[name], outer_scope=None
            )
            names = ref.column_aliases or sub_names
            scope.add_relation(
                Relation(alias, list(names), list(sub_root.output_expressions()))
            )
            return sub_root
        if db.storage_manager.has_view(name):
            view = db.storage_manager.get_view(name)
            sub_root, sub_names = self._translate_select(view.lqp, outer_scope=None)
            names = view.column_names or sub_names
            scope.add_relation(
                Relation(alias, list(names), list(sub_root.output_expressions()))
            )
            return sub_root
        if db.meta_table_manager.has_table(name):
            table = db.meta_table_manager.generate_table(name)
            cols = [
                ast.ColumnRef(n, c.data_type, c.validity is not None, origin=name)
                for n, c in zip(table.column_names, table.columns)
            ]
            node = L.StaticTableNode(table, cols)
            scope.add_relation(Relation(alias, list(table.column_names), cols))
            return node
        table = db.storage_manager.get_table(name)  # raises if unknown
        node = L.StoredTableNode(name)
        cols = [
            ast.ColumnRef(n, c.data_type, c.validity is not None, origin=name)
            for n, c in zip(table.column_names, table.columns)
        ]
        node.set_columns(cols)
        root: L.LQPNode = node
        if self.use_mvcc and table.mvcc is not None:
            root = L.ValidateNode(root)
        scope.add_relation(Relation(alias, list(table.column_names), cols))
        return root

    def _translate_join(self, ref: st.JoinRef, scope: Scope) -> L.LQPNode:
        left_root = self._translate_table_ref(ref.left, scope)
        n_before = len(scope.relations)
        right_root = self._translate_table_ref(ref.right, scope)
        right_rels = scope.relations[n_before:]

        if ref.join_type == "cross":
            return L.JoinNode(JoinMode.CROSS, [], left_root, right_root)

        mode = {
            "inner": JoinMode.INNER,
            "left": JoinMode.LEFT,
            "right": JoinMode.RIGHT,
            "full": JoinMode.FULL,
        }[ref.join_type]

        if ref.natural or ref.using_columns is not None:
            left_rels = scope.relations[:n_before]
            if ref.natural:
                left_names = {n for r in left_rels for n in r.names}
                common = [
                    n for r in right_rels for n in r.names if n in left_names
                ]
            else:
                common = list(ref.using_columns)
            preds = []
            for cname in common:
                le = _find_in_relations(left_rels, cname)
                re_ = _find_in_relations(right_rels, cname)
                preds.append(ast.eq(le, re_))
            return L.JoinNode(mode, preds, left_root, right_root)

        cond = self._resolve_expr(ref.condition, scope)
        preds = _split_conjunction(cond)
        return L.JoinNode(mode, preds, left_root, right_root)

    # ------------------------------------------------------------------ DML

    def _translate_insert(self, stmt: st.InsertStatement) -> L.LQPNode:
        db = Database.get()
        if db.meta_table_manager.has_table(stmt.table_name):
            src = self._insert_source(stmt)
            return L.ChangeMetaTableNode(stmt.table_name, "insert", src)
        src = self._insert_source(stmt)
        node = L.InsertNode(stmt.table_name, src)
        node.column_names = stmt.columns  # type: ignore[attr-defined]
        return node

    def _insert_source(self, stmt: st.InsertStatement) -> L.LQPNode:
        db = Database.get()
        target = None
        if db.storage_manager.has_table(stmt.table_name):
            target = db.storage_manager.get_table(stmt.table_name)
        if stmt.select is not None:
            root, _ = self._translate_select(stmt.select, outer_scope=None)
            return root
        # VALUES rows -> static table
        from hyrise_tpu.storage.table import Table

        columns = stmt.columns
        if columns is None and target is not None:
            columns = list(target.column_names)
        if columns is not None:
            for row in stmt.values:
                if len(row) != len(columns):
                    raise TranslationError(
                        f"INSERT INTO {stmt.table_name}: {len(row)} values "
                        f"for {len(columns)} columns"
                    )
        has_params = any(
            isinstance(sub, ast.Parameter)
            for row in stmt.values for e in row for sub in e.walk()
        )
        if has_params:
            # parameterized VALUES (prepared INSERT): a projection over the
            # dummy row evaluates literals AND parameters at execution time,
            # so the plan is reusable across bindings (ref: the reference
            # binds placeholders into the cached PQP,
            # operators/insert.cpp + prepared_plan.cpp).
            if columns is None:
                raise TranslationError(
                    "parameterized INSERT needs a known target table"
                )
            if len(stmt.values) != 1:
                # multi-row: rows materialize from bound params at
                # execution (ParamValues leaf) — one statement appends
                # the whole batch (e.g. all TPC-C order lines)
                if target is None:
                    raise TranslationError(
                        "parameterized multi-row INSERT needs an existing "
                        "target table"
                    )
                for row in stmt.values:
                    for e in row:
                        if not isinstance(e, (ast.Literal, ast.Parameter,
                                              ast.UnaryMinus)):
                            raise TranslationError(
                                "parameterized multi-row INSERT values must "
                                "be literals or placeholders"
                            )
                types = {c: target.column(c).data_type for c in columns}
                return L.ParamValuesNode(stmt.values, columns, types)
            exprs = list(stmt.values[0])
            proj = L.ProjectionNode(exprs, L.DummyTableNode())
            return L.AliasNode(exprs, list(columns), proj)
        rows = []
        for row in stmt.values:
            vals = []
            for e in row:
                if isinstance(e, ast.UnaryMinus) and isinstance(
                    e.children[0], ast.Literal
                ):
                    vals.append(-e.children[0].value)
                elif isinstance(e, ast.Literal):
                    vals.append(e.value)
                else:
                    raise TranslationError("INSERT VALUES must be literals")
            rows.append(vals)
        data = {c: [r[i] for r in rows] for i, c in enumerate(columns)}
        types = None
        if target is not None:
            types = {
                c: target.column(c).data_type for c in columns
            }
        table = Table.from_dict(data, types)
        cols = [
            ast.ColumnRef(n, c.data_type, c.validity is not None)
            for n, c in zip(table.column_names, table.columns)
        ]
        return L.StaticTableNode(table, cols)

    def _translate_update(self, stmt: st.UpdateStatement) -> L.LQPNode:
        scope = Scope()
        target_root = self._translate_named_table(
            st.NamedTable(stmt.table_name), scope
        )
        is_meta = Database.get().meta_table_manager.has_table(stmt.table_name)
        if not is_meta:
            self._enable_rowids(target_root)
        if stmt.where is not None:
            pred = self._resolve_expr(stmt.where, scope)
            target_root = self._predicates_from_conjunction(pred, target_root, scope)
        names, exprs = scope.all_columns()
        assign = dict(
            (name, self._resolve_expr(e, scope)) for name, e in stmt.assignments
        )
        update_exprs = [assign.get(n, e) for n, e in zip(names, exprs)]
        db = Database.get()
        if db.meta_table_manager.has_table(stmt.table_name):
            node = L.ChangeMetaTableNode(stmt.table_name, "update", target_root)
            node.update_expressions = update_exprs  # type: ignore[attr-defined]
            return node
        return L.UpdateNode(stmt.table_name, update_exprs, target_root)

    def _translate_delete(self, stmt: st.DeleteStatement) -> L.LQPNode:
        scope = Scope()
        target_root = self._translate_named_table(
            st.NamedTable(stmt.table_name), scope
        )
        self._enable_rowids(target_root)
        if stmt.where is not None:
            pred = self._resolve_expr(stmt.where, scope)
            target_root = self._predicates_from_conjunction(pred, target_root, scope)
        return L.DeleteNode(stmt.table_name, target_root)

    def _enable_rowids(self, root: L.LQPNode) -> None:
        for node in root.walk():
            if isinstance(node, L.StoredTableNode):
                node.enable_row_ids()
                return
        raise TranslationError("DML target must be a stored table")

    def _translate_create_table(self, stmt: st.CreateTableStatement) -> L.LQPNode:
        if stmt.as_select is not None:
            root, _ = self._translate_select(stmt.as_select, outer_scope=None)
            return L.CreateTableNode(stmt.table_name, stmt.if_not_exists, None, root)
        return L.CreateTableNode(
            stmt.table_name, stmt.if_not_exists, stmt.columns, None
        )

    # ------------------------------------------------------------ expr utils

    def _predicates_from_conjunction(self, pred, root, scope):
        """Split top-level ANDs into a PredicateNode chain (the reference's
        PredicateSplitUp rule does this in the optimizer; doing it here too
        gives rules smaller units to push around)."""
        for p in _split_conjunction(pred):
            root = L.PredicateNode(p, root)
        return root

    def _resolve_expr(self, expr: ast.Expression, scope: Scope) -> ast.Expression:
        if isinstance(expr, st.UnresolvedColumn):
            return scope.resolve(expr.parts)
        if isinstance(expr, st.Star):
            raise TranslationError("* not allowed here")
        if isinstance(expr, st.SelectSubquery):
            sub_scope_root, _ = self._translate_select(expr.select, outer_scope=scope)
            params = getattr(sub_scope_root, "_correlated_params", [])
            return ast.Subquery(sub_scope_root, params)
        if isinstance(expr, ast.InSubquery):
            operand = self._resolve_expr(expr.operand, scope)
            sub = self._resolve_expr(expr.subquery, scope)
            return ast.InSubquery(operand, sub, expr.negated)
        if isinstance(expr, ast.Exists):
            sub = self._resolve_expr(expr.subquery, scope)
            return ast.Exists(sub, expr.negated)
        # generic: rebuild children
        return _rebuild(expr, [self._resolve_expr(c, scope) for c in expr.children])


def _contains_grouping_fn(expr) -> bool:
    return any(
        isinstance(s, ast.Function) and s.fname.lower() == "grouping"
        for s in expr.walk()
    )


def _fold_plain_grouping(stmt):
    """Replace GROUPING(...) with 0 under a plain GROUP BY (standard
    semantics: nothing is ever rolled up)."""
    import copy

    def fold(expr):
        if (isinstance(expr, ast.Function)
                and expr.fname.lower() == "grouping"):
            return ast.Literal(0)
        return _rebuild(expr, [fold(c) for c in expr.children])

    out = copy.copy(stmt)
    out.select_list = [(fold(e), a) for e, a in stmt.select_list]
    if stmt.having is not None:
        out.having = fold(stmt.having)
    return out


def _rebuild(expr: ast.Expression, children: List[ast.Expression]) -> ast.Expression:
    if not expr.children:
        return expr
    import copy

    if all(a is b for a, b in zip(expr.children, children)):
        return expr
    if isinstance(expr, ast.Arithmetic):
        return ast.Arithmetic(expr.op, children[0], children[1])
    if isinstance(expr, ast.UnaryMinus):
        return ast.UnaryMinus(children[0])
    if isinstance(expr, ast.Predicate):
        return ast.Predicate(expr.condition, children)
    if isinstance(expr, ast.Logical):
        return ast.Logical(expr.op, children[0], children[1])
    if isinstance(expr, ast.Not):
        return ast.Not(children[0])
    if isinstance(expr, ast.InList):
        return ast.InList(children[0], children[1:], expr.negated)
    if isinstance(expr, ast.Case):
        n = len(expr.whens)
        whens = [(children[2 * i], children[2 * i + 1]) for i in range(n)]
        else_ = children[2 * n] if expr.else_ is not None else None
        return ast.Case(whens, else_)
    if isinstance(expr, ast.Cast):
        return ast.Cast(children[0], expr.target)
    if isinstance(expr, ast.Function):
        return ast.Function(expr.fname, children)
    if isinstance(expr, ast.Extract):
        return ast.Extract(expr.field, children[0])
    if isinstance(expr, ast.AggregateExpression):
        return ast.AggregateExpression(expr.function, children[0] if children else None,
                                       expr.distinct)
    if isinstance(expr, ast.WindowExpression):
        n_arg = 1 if expr.argument is not None else 0
        arg = children[0] if n_arg else None
        np_ = len(expr.partition_by)
        part = children[n_arg:n_arg + np_]
        order = [
            (children[n_arg + np_ + i], m)
            for i, (_, m) in enumerate(expr.order_by)
        ]
        return ast.WindowExpression(expr.function, arg, part, order,
                                    expr.extra, frame=expr.frame)
    raise TranslationError(f"cannot rebuild {type(expr).__name__}")


def _split_conjunction(expr: ast.Expression) -> List[ast.Expression]:
    if isinstance(expr, ast.Logical) and expr.op == "and":
        return _split_conjunction(expr.children[0]) + _split_conjunction(
            expr.children[1]
        )
    return [expr]


def _find_in_relations(rels: List[Relation], name: str) -> ast.Expression:
    for r in rels:
        e = r.find(name)
        if e is not None:
            return e
    raise TranslationError(f"unknown column {name!r}")


def _expr_name(parsed: ast.Expression, resolved: ast.Expression) -> str:
    if isinstance(parsed, st.UnresolvedColumn):
        return parsed.parts[-1]
    return resolved.name()


def _select_star(table_name: str) -> st.SelectStatement:
    s = st.SelectStatement()
    s.select_list = [(st.Star(), None)]
    s.from_clause = st.NamedTable(table_name)
    return s


def _aliased_select(select: st.SelectStatement, aliases: List[str]):
    import copy

    s = copy.copy(select)
    # alias application happens at use-site via Relation names; wrap so the
    # names carry through by renaming the select list
    new_list = []
    for (e, _), name in zip(select.select_list, aliases):
        new_list.append((e, name))
    s.select_list = new_list
    return s
