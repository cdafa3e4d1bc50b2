"""Expression evaluator tests (ref model: test/lib/expression/
expression_evaluator_to_values_test.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hyrise_tpu.expression import ast
from hyrise_tpu.expression.evaluator import ExpressionEvaluator, like_to_regex
from hyrise_tpu.storage import Table
from hyrise_tpu.types import DataType, PredicateCondition


def make_eval(data, types=None):
    t = Table.from_dict(data, types)
    cmap = {}
    cols = {}
    for i, name in enumerate(t.column_names):
        c = ast.ColumnRef(name, t.columns[i].data_type,
                          t.columns[i].validity is not None)
        cmap[c.key()] = i
        cols[name] = c
    return ExpressionEvaluator(t, cmap), cols, t


def rows(res, n):
    vals = np.asarray(res.data[:n])
    if res.validity is not None:
        valid = np.asarray(res.validity[:n])
        return [v.item() if ok else None for v, ok in zip(vals, valid)]
    return [v.item() for v in vals]


def test_arithmetic_basic():
    ev, c, t = make_eval({"a": [1, 2, 3], "b": [10, 20, 30]})
    r = ev.evaluate(ast.add(c["a"], c["b"]))
    assert rows(r, 3) == [11, 22, 33]
    r = ev.evaluate(ast.mul(c["a"], ast.lit(5)))
    assert rows(r, 3) == [5, 10, 15]


def test_arithmetic_nulls_and_divzero():
    ev, c, t = make_eval({"a": [1, None, 3], "b": [0, 2, 2]})
    r = ev.evaluate(ast.add(c["a"], c["b"]))
    assert rows(r, 3) == [1, None, 5]
    r = ev.evaluate(ast.div(c["a"], c["b"]))
    assert rows(r, 3) == [None, None, 1]


def test_comparisons_and_3vl():
    ev, c, t = make_eval({"a": [1, None, 3, 4]})
    mask = ev.selection_mask(ast.gt(c["a"], ast.lit(1)))
    assert np.asarray(mask[:4]).tolist() == [False, False, True, True]
    # a > 1 OR a IS NULL
    pred = ast.or_(
        ast.gt(c["a"], ast.lit(1)),
        ast.Predicate(PredicateCondition.IS_NULL, [c["a"]]),
    )
    mask = ev.selection_mask(pred)
    assert np.asarray(mask[:4]).tolist() == [False, True, True, True]


def test_string_compare_literal():
    ev, c, t = make_eval({"s": ["apple", "banana", "cherry", "date"]})
    mask = ev.selection_mask(ast.gt(c["s"], ast.lit("banana")))
    assert np.asarray(mask[:4]).tolist() == [False, False, True, True]
    mask = ev.selection_mask(ast.ge(c["s"], ast.lit("banana")))
    assert np.asarray(mask[:4]).tolist() == [False, True, True, True]
    # literal not in dictionary: strict order must still hold
    mask = ev.selection_mask(ast.gt(c["s"], ast.lit("bb")))
    assert np.asarray(mask[:4]).tolist() == [False, False, True, True]
    mask = ev.selection_mask(ast.eq(c["s"], ast.lit("bb")))
    assert np.asarray(mask[:4]).tolist() == [False, False, False, False]


def test_string_column_vs_column():
    ev, c, t = make_eval({"x": ["a", "b", "c"], "y": ["a", "c", "b"]})
    mask = ev.selection_mask(ast.eq(c["x"], c["y"]))
    assert np.asarray(mask[:3]).tolist() == [True, False, False]
    mask = ev.selection_mask(ast.lt(c["x"], c["y"]))
    assert np.asarray(mask[:3]).tolist() == [False, True, False]


def test_like():
    ev, c, t = make_eval({"s": ["apple", "apricot", "banana", "grape"]})
    mask = ev.selection_mask(
        ast.Predicate(PredicateCondition.LIKE, [c["s"], ast.lit("ap%")])
    )
    assert np.asarray(mask[:4]).tolist() == [True, True, False, False]
    mask = ev.selection_mask(
        ast.Predicate(PredicateCondition.NOT_LIKE, [c["s"], ast.lit("%ap%")])
    )
    assert np.asarray(mask[:4]).tolist() == [False, False, True, False]
    mask = ev.selection_mask(
        ast.Predicate(PredicateCondition.LIKE, [c["s"], ast.lit("_rape")])
    )
    assert np.asarray(mask[:4]).tolist() == [False, False, False, True]


def test_between_and_in():
    ev, c, t = make_eval({"a": [1, 5, 10, 15]})
    mask = ev.selection_mask(ast.between(c["a"], ast.lit(5), ast.lit(10)))
    assert np.asarray(mask[:4]).tolist() == [False, True, True, False]
    mask = ev.selection_mask(
        ast.InList(c["a"], [ast.lit(1), ast.lit(10)], negated=False)
    )
    assert np.asarray(mask[:4]).tolist() == [True, False, True, False]
    mask = ev.selection_mask(
        ast.InList(c["a"], [ast.lit(1), ast.lit(10)], negated=True)
    )
    assert np.asarray(mask[:4]).tolist() == [False, True, False, True]


def test_case():
    ev, c, t = make_eval({"a": [1, 2, 3, 4]})
    expr = ast.Case(
        [
            (ast.le(c["a"], ast.lit(1)), ast.lit(100)),
            (ast.le(c["a"], ast.lit(3)), ast.lit(200)),
        ],
        ast.lit(300),
    )
    assert rows(ev.evaluate(expr), 4) == [100, 200, 200, 300]
    expr_no_else = ast.Case([(ast.eq(c["a"], ast.lit(2)), ast.lit(7))], None)
    assert rows(ev.evaluate(expr_no_else), 4) == [None, 7, None, None]


def test_dates_extract_interval():
    ev, c, t = make_eval(
        {"d": ["1994-01-01", "1996-12-31", "2000-02-29"]},
        types={"d": DataType.DATE},
    )
    r = ev.evaluate(ast.Extract("year", c["d"]))
    assert rows(r, 3) == [1994, 1996, 2000]
    r = ev.evaluate(ast.Extract("month", c["d"]))
    assert rows(r, 3) == [1, 12, 2]
    r = ev.evaluate(ast.Extract("day", c["d"]))
    assert rows(r, 3) == [1, 31, 29]
    # date + interval year (with leap clamp)
    plus = ast.Arithmetic("+", c["d"], ast.IntervalLiteral(1, "year"))
    res = ev.evaluate(plus)
    col = res.to_column()
    assert col.to_pylist(3) == ["1995-01-01", "1997-12-31", "2001-02-28"]
    # comparison with date string literal
    mask = ev.selection_mask(ast.lt(c["d"], ast.lit("1995-01-01")))
    assert np.asarray(mask[:3]).tolist() == [True, False, False]


def test_string_functions():
    ev, c, t = make_eval({"s": ["Apple", "  hi  ", "xyz"]})
    r = ev.evaluate(ast.Function("upper", [c["s"]]))
    assert [r.dictionary[x] for x in np.asarray(r.data[:3])] == ["APPLE", "  HI  ", "XYZ"]
    r = ev.evaluate(ast.Function("length", [c["s"]]))
    assert rows(r, 3) == [5, 6, 3]
    r = ev.evaluate(ast.Function("substr", [c["s"], ast.lit(1), ast.lit(2)]))
    assert [r.dictionary[x] for x in np.asarray(r.data[:3])] == ["Ap", "  ", "xy"]


def test_coalesce():
    ev, c, t = make_eval({"a": [1, None, 3], "b": [9, 8, None]})
    r = ev.evaluate(ast.Function("coalesce", [c["a"], c["b"]]))
    assert rows(r, 3) == [1, 8, 3]


def test_cast():
    ev, c, t = make_eval({"a": [1, 2, 3]})
    r = ev.evaluate(ast.Cast(c["a"], DataType.DOUBLE))
    assert r.dtype == DataType.DOUBLE
    assert rows(r, 3) == [1.0, 2.0, 3.0]
    ev2, c2, _ = make_eval({"s": ["1.5", "2", "x"]})
    r = ev2.evaluate(ast.Cast(c2["s"], DataType.DOUBLE))
    assert rows(r, 3) == [1.5, 2.0, None]


def test_like_regex():
    assert like_to_regex("a%b_c").fullmatch("aXXbYc")
    assert not like_to_regex("a%").fullmatch("ba")
    assert like_to_regex("100\\%").pattern  # escaping literal handled as chars
