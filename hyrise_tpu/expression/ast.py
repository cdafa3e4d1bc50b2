"""Expression tree (ref: src/lib/expression/ — one class per node kind,
abstract_expression.hpp).  Host-side, immutable-ish nodes with structural
equality; evaluation happens vectorized on device
(expression/evaluator.py).

Expressions double as column identities in plans (as in the reference:
an LQP column IS the expression that produced it).  `key()` returns the
structural identity used for plan hashing and input-column matching.
"""

from __future__ import annotations

import itertools
from typing import Any, List, Optional, Sequence, Tuple

from hyrise_tpu.types import (
    AggregateFunction,
    DataType,
    JoinMode,
    PredicateCondition,
    SortMode,
)


class Expression:
    children: List["Expression"] = []

    def key(self) -> Tuple:
        raise NotImplementedError

    def data_type(self) -> DataType:
        raise NotImplementedError

    def nullable(self) -> bool:
        return any(c.nullable() for c in self.children)

    def name(self) -> str:
        """Display / result column name."""
        return self.description()

    def description(self) -> str:
        raise NotImplementedError

    # --- traversal helpers -------------------------------------------------

    def walk(self):
        yield self
        for c in self.children:
            yield from c.walk()

    def contains_aggregate(self) -> bool:
        return any(isinstance(e, AggregateExpression) for e in self.walk())

    def referenced_columns(self) -> List["ColumnRef"]:
        return [e for e in self.walk() if isinstance(e, ColumnRef)]

    def __eq__(self, other):
        return isinstance(other, Expression) and self.key() == other.key()

    def __hash__(self):
        return hash(self.key())

    def __repr__(self):
        return f"<{self.description()}>"


_column_ids = itertools.count()


class ColumnRef(Expression):
    """A column produced by some plan node (ref: lqp_column_expression.hpp).
    Identity is a process-unique integer assigned at creation."""

    def __init__(self, display_name: str, dtype: DataType, is_nullable: bool,
                 origin: str = "", cid: Optional[int] = None):
        self.children = []
        self.cid = cid if cid is not None else next(_column_ids)
        self.display_name = display_name
        self._dtype = dtype
        self._nullable = is_nullable
        self.origin = origin  # e.g. table name, for EXPLAIN output

    def key(self):
        return ("col", self.cid)

    def data_type(self):
        return self._dtype

    def nullable(self):
        return self._nullable

    def name(self):
        return self.display_name

    def description(self):
        return self.display_name


class Literal(Expression):
    def __init__(self, value: Any, dtype: Optional[DataType] = None):
        self.children = []
        self.value = value
        if dtype is None:
            if value is None:
                dtype = DataType.NULL
            elif isinstance(value, bool):
                dtype = DataType.INT
            elif isinstance(value, int):
                dtype = DataType.LONG if abs(value) > 2**31 - 1 else DataType.INT
            elif isinstance(value, float):
                dtype = DataType.DOUBLE
            elif isinstance(value, str):
                dtype = DataType.STRING
            else:
                raise TypeError(f"unsupported literal {value!r}")
        self._dtype = dtype

    def key(self):
        return ("lit", self.value, self._dtype)

    def data_type(self):
        return self._dtype

    def nullable(self):
        return self.value is None

    def description(self):
        if isinstance(self.value, str):
            return f"'{self.value}'"
        return "NULL" if self.value is None else str(self.value)


class IntervalLiteral(Expression):
    """INTERVAL 'n' unit (ref: expression/interval_expression.hpp)."""

    def __init__(self, count: int, unit: str):
        self.children = []
        self.count = count
        self.unit = unit.lower().rstrip("s")  # day/month/year

    def key(self):
        return ("interval", self.count, self.unit)

    def data_type(self):
        return DataType.LONG

    def description(self):
        return f"INTERVAL '{self.count}' {self.unit}"


class Arithmetic(Expression):
    def __init__(self, op: str, left: Expression, right: Expression):
        assert op in ("+", "-", "*", "/", "%")
        self.op = op
        self.children = [left, right]

    def key(self):
        return ("arith", self.op, self.children[0].key(), self.children[1].key())

    def data_type(self):
        from hyrise_tpu.types import common_numeric_type

        l, r = self.children[0].data_type(), self.children[1].data_type()
        if isinstance(self.children[1], IntervalLiteral):
            return l
        if DataType.NULL in (l, r):
            return l if r == DataType.NULL else r
        if self.op == "/" and l in (DataType.INT, DataType.LONG) and r in (
            DataType.INT,
            DataType.LONG,
        ):
            # SQL integer division stays integral (matches reference/sqlite)
            return common_numeric_type(l, r)
        return common_numeric_type(l, r)

    def nullable(self):
        return True if self.op in ("/", "%") else super().nullable()

    def description(self):
        return f"({self.children[0].description()} {self.op} {self.children[1].description()})"


class UnaryMinus(Expression):
    def __init__(self, operand: Expression):
        self.children = [operand]

    def key(self):
        return ("neg", self.children[0].key())

    def data_type(self):
        return self.children[0].data_type()

    def description(self):
        return f"(-{self.children[0].description()})"


class Predicate(Expression):
    """Binary/between/is-null comparison returning SQL boolean
    (ref: binary_predicate_expression.hpp, between_expression.hpp,
    is_null_expression.hpp, like-conditions in the same enum)."""

    def __init__(self, condition: PredicateCondition, operands: Sequence[Expression]):
        self.condition = condition
        self.children = list(operands)

    def key(self):
        return ("pred", self.condition, tuple(c.key() for c in self.children))

    def data_type(self):
        return DataType.INT  # SQL boolean as 0/1 with validity

    def nullable(self):
        if self.condition in (
            PredicateCondition.IS_NULL,
            PredicateCondition.IS_NOT_NULL,
        ):
            return False
        return super().nullable()

    def description(self):
        c = self.children
        cond = self.condition
        if cond in (PredicateCondition.IS_NULL, PredicateCondition.IS_NOT_NULL):
            return f"{c[0].description()} {cond.value}"
        between_bounds = {
            PredicateCondition.BETWEEN_INCLUSIVE: ("", ""),
            PredicateCondition.BETWEEN_LOWER_EXCLUSIVE: (" (excl)", ""),
            PredicateCondition.BETWEEN_UPPER_EXCLUSIVE: ("", " (excl)"),
            PredicateCondition.BETWEEN_EXCLUSIVE: (" (excl)", " (excl)"),
        }
        if cond in between_bounds:
            lx, ux = between_bounds[cond]
            return (f"{c[0].description()} BETWEEN {c[1].description()}{lx}"
                    f" AND {c[2].description()}{ux}")
        return f"{c[0].description()} {cond.value} {c[1].description()}"


class InList(Expression):
    """x IN (v1, v2, ...) (ref: in_expression.hpp with a list operand)."""

    def __init__(self, operand: Expression, values: Sequence[Expression], negated: bool):
        self.children = [operand, *values]
        self.negated = negated

    @property
    def operand(self):
        return self.children[0]

    @property
    def values(self):
        return self.children[1:]

    def key(self):
        return ("inlist", self.negated, tuple(c.key() for c in self.children))

    def data_type(self):
        return DataType.INT

    def description(self):
        vals = ", ".join(v.description() for v in self.values)
        op = "NOT IN" if self.negated else "IN"
        return f"{self.operand.description()} {op} ({vals})"


class InSubquery(Expression):
    def __init__(self, operand: Expression, subquery: "Subquery", negated: bool):
        self.children = [operand, subquery]
        self.negated = negated

    @property
    def operand(self):
        return self.children[0]

    @property
    def subquery(self):
        return self.children[1]

    def key(self):
        return ("insub", self.negated, self.operand.key(), self.subquery.key())

    def data_type(self):
        return DataType.INT

    def description(self):
        op = "NOT IN" if self.negated else "IN"
        return f"{self.operand.description()} {op} (SUBQUERY)"


class Exists(Expression):
    def __init__(self, subquery: "Subquery", negated: bool):
        self.children = [subquery]
        self.negated = negated

    @property
    def subquery(self):
        return self.children[0]

    def key(self):
        return ("exists", self.negated, self.subquery.key())

    def data_type(self):
        return DataType.INT

    def nullable(self):
        return False

    def description(self):
        return ("NOT EXISTS" if self.negated else "EXISTS") + " (SUBQUERY)"


class Logical(Expression):
    def __init__(self, op: str, left: Expression, right: Expression):
        assert op in ("and", "or")
        self.op = op
        self.children = [left, right]

    def key(self):
        return ("logic", self.op, self.children[0].key(), self.children[1].key())

    def data_type(self):
        return DataType.INT

    def description(self):
        return f"({self.children[0].description()} {self.op.upper()} {self.children[1].description()})"


class Not(Expression):
    def __init__(self, operand: Expression):
        self.children = [operand]

    def key(self):
        return ("not", self.children[0].key())

    def data_type(self):
        return DataType.INT

    def description(self):
        return f"NOT ({self.children[0].description()})"


class Case(Expression):
    """CASE WHEN c THEN t [...] ELSE e END (ref: case_expression.hpp)."""

    def __init__(self, whens: Sequence[Tuple[Expression, Expression]],
                 else_: Optional[Expression]):
        self.whens = [(c, t) for c, t in whens]
        self.else_ = else_
        self.children = [x for pair in whens for x in pair] + (
            [else_] if else_ is not None else []
        )

    def key(self):
        return (
            "case",
            tuple((c.key(), t.key()) for c, t in self.whens),
            self.else_.key() if self.else_ is not None else None,
        )

    def data_type(self):
        from hyrise_tpu.types import common_numeric_type

        dt = None
        for _, t in self.whens:
            tdt = t.data_type()
            if tdt == DataType.NULL:
                continue
            dt = tdt if dt is None else common_numeric_type(dt, tdt)
        if self.else_ is not None and self.else_.data_type() != DataType.NULL:
            edt = self.else_.data_type()
            dt = edt if dt is None else common_numeric_type(dt, edt)
        return dt if dt is not None else DataType.INT

    def nullable(self):
        return True

    def description(self):
        parts = " ".join(
            f"WHEN {c.description()} THEN {t.description()}" for c, t in self.whens
        )
        e = f" ELSE {self.else_.description()}" if self.else_ is not None else ""
        return f"CASE {parts}{e} END"


class Cast(Expression):
    def __init__(self, operand: Expression, target: DataType):
        self.children = [operand]
        self.target = target

    def key(self):
        return ("cast", self.target, self.children[0].key())

    def data_type(self):
        return self.target

    def description(self):
        return f"CAST({self.children[0].description()} AS {self.target.value})"


class Function(Expression):
    """Scalar functions (ref: function_expression.hpp: substr/concat; we add
    upper/lower/length/abs/round/coalesce/extract-like helpers)."""

    def __init__(self, fname: str, args: Sequence[Expression]):
        self.fname = fname.lower()
        self.children = list(args)

    def key(self):
        return ("fn", self.fname, tuple(c.key() for c in self.children))

    def data_type(self):
        if self.fname in ("substr", "substring", "concat", "upper", "lower", "trim",
                          "ltrim", "rtrim"):
            return DataType.STRING
        if self.fname in ("length", "char_length"):
            return DataType.LONG
        if self.fname in ("abs", "round", "floor", "ceil", "mod"):
            return self.children[0].data_type()
        if self.fname == "coalesce":
            for c in self.children:
                if c.data_type() != DataType.NULL:
                    return c.data_type()
            return DataType.NULL
        if self.fname in ("sqrt", "exp", "ln", "log", "power"):
            return DataType.DOUBLE
        raise NotImplementedError(f"function {self.fname}")

    def description(self):
        args = ", ".join(c.description() for c in self.children)
        return f"{self.fname.upper()}({args})"


class Extract(Expression):
    """EXTRACT(field FROM date) (ref: extract_expression.hpp)."""

    FIELDS = ("year", "month", "day")

    def __init__(self, field: str, operand: Expression):
        self.field = field.lower()
        assert self.field in self.FIELDS, field
        self.children = [operand]

    def key(self):
        return ("extract", self.field, self.children[0].key())

    def data_type(self):
        return DataType.INT

    def description(self):
        return f"EXTRACT({self.field.upper()} FROM {self.children[0].description()})"


class AggregateExpression(Expression):
    """min/max/sum/avg/count/count-distinct/stddev/any over an argument
    (ref: aggregate_expression.hpp + window_function_expression.hpp)."""

    def __init__(self, function: AggregateFunction,
                 argument: Optional[Expression], distinct: bool = False):
        self.function = function
        self.distinct = distinct
        self.children = [argument] if argument is not None else []
        # Aggregates are COLUMN IDENTITIES like ColumnRefs: two
        # structurally-equal aggregates from different plan branches (e.g.
        # COUNT(*) in two derived tables, TPC-DS Q88) are different
        # columns, so the key carries an instance id.  The translator
        # resolves textual references (HAVING/ORDER BY) to the SAME object.
        self.uid = next(_column_ids)

    @property
    def argument(self) -> Optional[Expression]:
        return self.children[0] if self.children else None

    def key(self):
        return ("agg", self.uid)

    def structural_key(self):
        """Identity-free shape, used by the translator to match textual
        re-occurrences (HAVING COUNT(*) = the select list's COUNT(*))."""
        return (
            "agg",
            self.function,
            self.distinct,
            self.argument.key() if self.argument is not None else None,
        )

    def data_type(self):
        f = self.function
        if f in (AggregateFunction.COUNT, AggregateFunction.COUNT_DISTINCT):
            return DataType.LONG
        if f in (AggregateFunction.AVG, AggregateFunction.STDDEV_SAMP):
            return DataType.DOUBLE
        if f == AggregateFunction.SUM:
            at = self.argument.data_type()
            if at in (DataType.INT, DataType.LONG):
                return DataType.LONG
            return DataType.DOUBLE
        if f in (AggregateFunction.RANK, AggregateFunction.DENSE_RANK,
                 AggregateFunction.ROW_NUMBER):
            return DataType.LONG
        if f in (AggregateFunction.CUME_DIST, AggregateFunction.PERCENT_RANK):
            return DataType.DOUBLE
        return self.argument.data_type()

    def nullable(self):
        if self.function in (AggregateFunction.COUNT, AggregateFunction.COUNT_DISTINCT):
            return False
        return True  # empty groups yield NULL

    def description(self):
        arg = self.argument.description() if self.argument is not None else "*"
        d = "DISTINCT " if self.distinct else ""
        return f"{self.function.value.upper()}({d}{arg})"


class WindowExpression(Expression):
    """fn() OVER (PARTITION BY ... ORDER BY ...) — executable here, the
    reference only plans these (ref: window_expression.hpp;
    lqp_translator.cpp:523-526 refuses execution)."""

    def __init__(self, function: AggregateFunction,
                 argument: Optional[Expression],
                 partition_by: Sequence[Expression],
                 order_by: Sequence[Tuple[Expression, SortMode]],
                 extra: Tuple = (), frame: Optional[Tuple[str, str]] = None):
        self.function = function
        self.partition_by = list(partition_by)
        self.order_by = list(order_by)
        # host-side literal parameters: (offset, default) for LAG/LEAD,
        # (n,) for NTILE — not expressions, they must be constants
        self.extra = tuple(extra)
        # window frame: None = SQL default (RANGE UNBOUNDED PRECEDING ..
        # CURRENT ROW when ORDER BY present), else ('rows'|'range',
        # 'current'|'following') — only UNBOUNDED PRECEDING starts are
        # representable (the shapes TPC-DS uses)
        self.frame = frame
        self.children = (
            ([argument] if argument is not None else [])
            + list(partition_by)
            + [e for e, _ in order_by]
        )
        self._argument = argument
        # column identity, like AggregateExpression (branch-local)
        self.uid = next(_column_ids)

    @property
    def argument(self):
        return self._argument

    def key(self):
        return ("window", self.uid)

    def data_type(self):
        if self.function == AggregateFunction.NTILE:
            return DataType.LONG
        if self.function in (AggregateFunction.LAG, AggregateFunction.LEAD,
                             AggregateFunction.FIRST_VALUE,
                             AggregateFunction.LAST_VALUE):
            return self._argument.data_type()
        return AggregateExpression(self.function, self._argument).data_type()

    def description(self):
        arg = self._argument.description() if self._argument is not None else ""
        return f"{self.function.value.upper()}({arg}) OVER (...)"


class Subquery(Expression):
    """Scalar or row-set subquery carried as a nested LQP (ref:
    lqp_subquery_expression.hpp).  `parameters` maps outer-column
    expressions to parameter ids for correlated subqueries."""

    _keys = itertools.count()

    def __init__(self, lqp, parameters: Optional[List[Tuple[int, Expression]]] = None):
        self.lqp = lqp
        self.parameters = parameters or []  # [(parameter_id, outer expr)]
        self.children = []
        self._key = next(Subquery._keys)

    def key(self):
        return ("subquery", self._key)

    def is_correlated(self) -> bool:
        return bool(self.parameters)

    def data_type(self):
        cols = self.lqp.output_expressions()
        return cols[0].data_type() if cols else DataType.NULL

    def nullable(self):
        return True

    def description(self):
        return "(SUBQUERY)"


class Parameter(Expression):
    """Placeholder for prepared statements / correlated params (ref:
    correlated_parameter_expression.hpp, placeholder_expression.hpp)."""

    def __init__(self, parameter_id: int, dtype: DataType = DataType.NULL,
                 is_nullable: bool = True):
        self.children = []
        self.parameter_id = parameter_id
        self._dtype = dtype
        self._nullable = is_nullable

    def key(self):
        return ("param", self.parameter_id)

    def data_type(self):
        return self._dtype

    def nullable(self):
        return self._nullable

    def description(self):
        return f"${self.parameter_id}"


# --------------------------------------------------------------------- DSL
# (ref: expression_functional.hpp — terse builders used by tests/optimizer)


def col(name: str, dtype: DataType = DataType.INT, nullable: bool = False) -> ColumnRef:
    return ColumnRef(name, dtype, nullable)


def lit(v) -> Literal:
    return Literal(v)


def and_(a, b):
    return Logical("and", a, b)


def or_(a, b):
    return Logical("or", a, b)


def eq(a, b):
    return Predicate(PredicateCondition.EQUALS, [a, b])


def ne(a, b):
    return Predicate(PredicateCondition.NOT_EQUALS, [a, b])


def lt(a, b):
    return Predicate(PredicateCondition.LESS_THAN, [a, b])


def le(a, b):
    return Predicate(PredicateCondition.LESS_THAN_EQUALS, [a, b])


def gt(a, b):
    return Predicate(PredicateCondition.GREATER_THAN, [a, b])


def ge(a, b):
    return Predicate(PredicateCondition.GREATER_THAN_EQUALS, [a, b])


def between(x, lo, hi):
    return Predicate(PredicateCondition.BETWEEN_INCLUSIVE, [x, lo, hi])


def add(a, b):
    return Arithmetic("+", a, b)


def sub(a, b):
    return Arithmetic("-", a, b)


def mul(a, b):
    return Arithmetic("*", a, b)


def div(a, b):
    return Arithmetic("/", a, b)


def sum_(x, distinct=False):
    return AggregateExpression(AggregateFunction.SUM, x, distinct)


def avg(x):
    return AggregateExpression(AggregateFunction.AVG, x)


def min_(x):
    return AggregateExpression(AggregateFunction.MIN, x)


def max_(x):
    return AggregateExpression(AggregateFunction.MAX, x)


def count(x=None, distinct=False):
    fn = AggregateFunction.COUNT_DISTINCT if distinct else AggregateFunction.COUNT
    return AggregateExpression(fn, x, distinct)
