"""Plan-shape + differential tests for BetweenComposition and
JoinToSemiJoin (ref: between_composition_rule_test.cpp,
join_to_semi_join_rule_test.cpp)."""

import pytest

from hyrise_tpu.database import Database
from hyrise_tpu.optimizer import Optimizer
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.sql.parser import parse_sql
from hyrise_tpu.sql.pipeline import sql as run_sql
from hyrise_tpu.sql.translator import SQLTranslator
from hyrise_tpu.storage.table import TableKeyConstraint
from hyrise_tpu.types import JoinMode, PredicateCondition

from tests.sqlite_oracle import make_env, rows_match


def _optimize(sqltext: str) -> L.LQPNode:
    lqp = SQLTranslator().translate(parse_sql(sqltext)[0])
    return Optimizer.create_default_optimizer().optimize(lqp)


@pytest.fixture()
def env():
    oracle = make_env({
        "fact": {
            "k": [1, 2, 2, 3, 4, 4, 4, 9],
            "v": [10.0, 20.0, 21.0, 30.0, 40.0, 41.0, 42.0, 90.0],
        },
        "dim": {
            "k": [1, 2, 3, 4, 5],
            "name": ["a", "b", "c", "d", "e"],
        },
    })
    db = Database.get()
    db.storage_manager.get_table("dim").key_constraints.append(
        TableKeyConstraint(("k",), True)
    )
    return oracle


def _predicates(root):
    return [n for n in root.walk() if isinstance(n, L.PredicateNode)]


def _joins(root):
    return [n for n in root.walk() if isinstance(n, L.JoinNode)]


def test_between_composition_fuses_bounds(env):
    root = _optimize("SELECT v FROM fact WHERE k >= 2 AND k < 4")
    preds = _predicates(root)
    assert len(preds) == 1
    assert preds[0].predicate.condition == \
        PredicateCondition.BETWEEN_UPPER_EXCLUSIVE
    q = "SELECT v FROM fact WHERE k >= 2 AND k < 4"
    assert rows_match(run_sql(q).to_pylist(), env.execute(q), ordered=False)


def test_between_composition_leaves_single_bounds(env):
    root = _optimize("SELECT v FROM fact WHERE k >= 2 AND v < 40.0")
    for p in _predicates(root):
        for e in p.predicate.walk():
            assert getattr(e, "condition", None) not in (
                PredicateCondition.BETWEEN_INCLUSIVE,
                PredicateCondition.BETWEEN_LOWER_EXCLUSIVE,
                PredicateCondition.BETWEEN_UPPER_EXCLUSIVE,
                PredicateCondition.BETWEEN_EXCLUSIVE,
            )


def test_join_to_semi_join_rewrites_filter_join(env):
    q = "SELECT f.v FROM fact f JOIN dim d ON f.k = d.k"
    joins = _joins(_optimize(q))
    assert len(joins) == 1 and joins[0].mode == JoinMode.SEMI
    assert rows_match(run_sql(q).to_pylist(), env.execute(q), ordered=False)


def test_join_to_semi_join_keeps_join_when_right_used(env):
    q = "SELECT f.v, d.name FROM fact f JOIN dim d ON f.k = d.k"
    joins = _joins(_optimize(q))
    assert len(joins) == 1 and joins[0].mode == JoinMode.INNER
    assert rows_match(run_sql(q).to_pylist(), env.execute(q), ordered=False)


def test_join_to_predicate_rewrites_single_row_semi(env):
    # dim filtered by its unique key to one row; dim columns unused above
    # -> the (semi) join becomes a scalar-subquery predicate
    q = "SELECT f.v FROM fact f JOIN dim d ON f.k = d.k WHERE d.k = 2"
    root = _optimize(q)
    assert not _joins(root), "join should be rewritten to a predicate"
    assert rows_match(run_sql(q).to_pylist(), env.execute(q), ordered=False)


def test_join_to_predicate_no_match_returns_empty(env):
    q = "SELECT f.v FROM fact f JOIN dim d ON f.k = d.k WHERE d.k = 77"
    assert not _joins(_optimize(q))
    assert run_sql(q).to_pylist() == []


def test_join_to_semi_join_requires_unique_key(env):
    # fact.k is NOT unique: join against it must stay inner even though
    # no fact columns are used above
    q = "SELECT d.name FROM dim d JOIN fact f ON d.k = f.k"
    joins = _joins(_optimize(q))
    assert len(joins) == 1 and joins[0].mode == JoinMode.INNER
    ours = run_sql(q).to_pylist()
    assert rows_match(ours, env.execute(q), ordered=False)


# ---------------------------------------------------------------- cost model


def test_expression_cost_multiplier_counts_column_streams(env):
    """ref: cost_estimator_logical.cpp:23-68 — one per column reference,
    floored at 1 for tautologies."""
    from hyrise_tpu.statistics.cost_model import expression_cost_multiplier

    lqp = SQLTranslator().translate(
        parse_sql("SELECT * FROM fact WHERE k = 4 OR v > 20.0")[0]
    )
    pred = next(n for n in lqp.walk() if isinstance(n, L.PredicateNode))
    assert expression_cost_multiplier(pred.predicate) == 2.0

    lqp1 = SQLTranslator().translate(
        parse_sql("SELECT * FROM fact WHERE 1 = 1")[0]
    )
    pred1 = next(n for n in lqp1.walk() if isinstance(n, L.PredicateNode))
    assert expression_cost_multiplier(pred1.predicate) == 1.0


def test_plan_cost_prefers_filter_below_join(env):
    """The logical cost model must price filter-below-join cheaper than
    filter-above-join (the quantity PredicatePlacement optimizes)."""
    from hyrise_tpu.statistics.cost_model import CostEstimator

    pushed = _optimize("SELECT * FROM fact JOIN dim ON fact.k = dim.k "
                       "WHERE fact.v > 35.0")
    # un-optimized: the filter sits above the join
    raw = SQLTranslator().translate(
        parse_sql("SELECT * FROM fact JOIN dim ON fact.k = dim.k "
                  "WHERE fact.v > 35.0")[0]
    )
    est = CostEstimator()
    assert est.estimate_plan_cost(pushed) < est.estimate_plan_cost(raw)


def test_join_ordering_minimizes_logical_cost(env):
    """Three-way join: DP must put the selective filtered fact-side join
    first; verified by differential result equality + a join-count check."""
    oracle = env
    sqltext = ("SELECT fact.v, dim.name FROM fact, dim, dim AS d2 "
               "WHERE fact.k = dim.k AND fact.k = d2.k AND fact.v < 25.0 "
               "ORDER BY fact.v")
    rows = run_sql(sqltext).to_pylist()
    assert rows_match(rows, oracle.execute(sqltext), ordered=True)
    plan = _optimize(sqltext)
    joins = _joins(plan)
    # d2 contributes no output columns, so JoinToSemiJoin may legally turn
    # that join into a SEMI; either way the region must stay cross-free
    assert len(joins) == 2
    assert all(j.mode in (JoinMode.INNER, JoinMode.SEMI) for j in joins)


# ------------------------------------------------- review-pass regressions
# Differential regressions for the rewrite-correctness findings of the
# fourth review pass (self-join FD conflation, multi-key uniqueness,
# null-extended IS NOT NULL, correlated-subquery hoist boundaries).


@pytest.fixture()
def renv():
    return make_env({
        "outer_t": {
            "k": [1, 2, 3, 4],
            "x": [10, 20, 30, 40],
        },
        "inner_t": {
            "k": [1, 1, 2, None],
            "y": [10, 11, 20, 99],
            "g": [0, 1, 0, 1],
        },
        "pairs": {
            "k": [1, 1, 2, 2, 3],
            "y": [7, 8, 7, 7, 9],
        },
    })


def test_not_null_filter_survives_left_join(renv):
    """NullScanRemoval must NOT drop IS NOT NULL over a null-extending
    join even when the base column has no NULLs (review finding #3)."""
    q = ("SELECT o.k FROM outer_t o LEFT JOIN pairs p ON o.k = p.k "
         "WHERE p.y IS NOT NULL")
    assert rows_match(run_sql(q).to_pylist(), renv.execute(q), ordered=False)


def test_join_to_semi_multikey_group_stays_inner(renv):
    """Grouping by (k, y) does NOT make k unique: the join must stay
    INNER so duplicate matches multiply (review finding #4)."""
    q = ("SELECT SUM(o.x) FROM outer_t o JOIN "
         "(SELECT k, y FROM pairs GROUP BY k, y) g ON o.k = g.k")
    assert rows_match(run_sql(q).to_pylist(), renv.execute(q), ordered=False)


def test_dependent_group_by_self_join_not_reduced(renv):
    """Two aliases of one table: the key constraint of one alias must not
    erase the other alias's group-by column (review finding #5)."""
    from hyrise_tpu.storage.table import TableKeyConstraint

    db = Database.get()
    db.storage_manager.get_table("outer_t").key_constraints.append(
        TableKeyConstraint(("k",), True)
    )
    q = ("SELECT a.k, b.x, COUNT(*) FROM outer_t a JOIN outer_t b "
         "ON a.k = b.k GROUP BY a.k, b.x")
    assert rows_match(run_sql(q).to_pylist(), renv.execute(q), ordered=False)


def test_correlated_exists_below_aggregate_declines(renv):
    """Hoisting a correlated filter past an aggregate changes what the
    aggregate sums over — the rewrite must refuse (review finding #1),
    which today surfaces as a clear translation error, never wrong rows."""
    q = ("SELECT k FROM outer_t o WHERE EXISTS "
         "(SELECT 1 FROM inner_t i WHERE i.k = o.k "
         "GROUP BY i.g HAVING SUM(i.y) > 10)")
    with pytest.raises(Exception, match="correlated"):
        run_sql(q)


def test_correlated_not_in_nullable_declines(renv):
    """Correlated NOT IN with a nullable correlation column cannot use
    the packed anti-null-as-true key (review finding #2)."""
    q = ("SELECT k FROM outer_t o WHERE o.x NOT IN "
         "(SELECT i.y FROM inner_t i WHERE i.k = o.k)")
    with pytest.raises(Exception, match="correlated"):
        run_sql(q)


def test_correlated_count_scalar_declines_unless_zero_rejected(renv):
    """COUNT over an empty correlated group is 0, not NULL: the INNER
    join rewrite drops those outer rows, so only comparisons that reject
    0 anyway may rewrite (review finding #6)."""
    bad = ("SELECT k FROM outer_t o WHERE 5 > "
           "(SELECT COUNT(*) FROM inner_t i WHERE i.k = o.k)")
    with pytest.raises(Exception, match="correlated"):
        run_sql(bad)
    ok = ("SELECT k FROM outer_t o WHERE "
          "(SELECT COUNT(*) FROM inner_t i WHERE i.k = o.k) > 0")
    assert rows_match(run_sql(ok).to_pylist(), renv.execute(ok),
                      ordered=False)


def test_join_ordering_reaches_subquery_inside_region(renv):
    """An IN-subquery sitting on a predicate INSIDE a join region must
    still get its comma-join chain ordered (review finding #9)."""
    q = ("SELECT o.k FROM outer_t o JOIN pairs p ON o.k = p.k "
         "WHERE o.x > (SELECT MIN(a.y + b.g) FROM pairs a, inner_t b "
         "WHERE a.k = b.k)")
    root = _optimize(q)
    from hyrise_tpu.expression import ast as A
    subs = [s for n in root.walk() for e in n.node_expressions()
            for s in e.walk() if isinstance(s, A.Subquery)]
    assert subs, "scalar subquery should survive as a predicate operand"
    inner_joins = _joins(subs[0].lqp)
    assert inner_joins and all(
        j.mode != JoinMode.CROSS for j in inner_joins
    ), "comma-join chain inside the subquery must be ordered into equi joins"
    assert rows_match(run_sql(q).to_pylist(), renv.execute(q), ordered=False)


def test_disjunction_prefilter_derives_in_lists():
    """OR-of-conjunctions implies per-column IN prefilters that placement
    pushes below joins (the TPC-H Q7 nation-pair shape)."""
    oracle = make_env({
        "f": {"a": [1, 2, 3, 4], "b": [10, 20, 30, 40]},
        "d1": {"k": [1, 2, 3, 4], "n": ["w", "x", "y", "z"]},
        "d2": {"k": [1, 2, 3, 4], "n": ["w", "x", "y", "z"]},
    })
    q = ("SELECT f.b FROM f, d1, d2 WHERE f.a = d1.k AND f.b / 10 = d2.k "
         "AND ((d1.n = 'w' AND d2.n = 'x') OR (d1.n = 'x' AND d2.n = 'w'))")
    root = _optimize(q)
    from hyrise_tpu.expression.ast import InList

    ins = [
        p for p in _predicates(root)
        if isinstance(p.predicate, InList) and not p.predicate.negated
    ]
    assert len(ins) == 2, root.description()
    assert rows_match(run_sql(q).to_pylist(), oracle.execute(q),
                      ordered=False)


def test_disjunction_prefilter_no_common_column():
    oracle = make_env({
        "t": {"a": [1, 2, 3], "b": [1, 2, 3]},
    })
    q = "SELECT a FROM t WHERE (a = 1 AND b = 2) OR (b = 3)"
    root = _optimize(q)
    from hyrise_tpu.expression.ast import InList

    # b is pinned in both disjuncts -> one derived IN; a is not
    ins = [p for p in _predicates(root) if isinstance(p.predicate, InList)]
    assert all(p.predicate.operand.display_name == "b" for p in ins)
    assert rows_match(run_sql(q).to_pylist(), oracle.execute(q),
                      ordered=False)


def test_aggregate_reduction_inserts_semi_reducer():
    """Q17-shape: a decorrelated scalar-aggregate subquery over the fact
    table inner-joins a highly selective partner — the AggregateReduction
    rule must semi-filter the aggregate's INPUT by the partner's keys
    (optimizer/strategy/aggregate_reduction.py)."""
    import numpy as np

    n_k = 2000
    rng = np.random.default_rng(3)
    oracle = make_env({
        "fact": {
            "k": np.repeat(np.arange(n_k), 4).tolist(),
            "v": rng.uniform(1, 100, size=n_k * 4).round(2).tolist(),
        },
        "dim": {
            "k": list(range(n_k)),
            "name": [f"n{i}" for i in range(n_k)],
        },
    })
    q = ("SELECT d.name, s.t FROM dim d, "
         "(SELECT k, SUM(v) AS t FROM fact GROUP BY k) s "
         "WHERE d.k = s.k AND d.name = 'n7'")
    root = _optimize(q)
    reduced = [
        n for n in root.walk()
        if isinstance(n, L.AggregateNode) and n.group_by
        and isinstance(n.left, L.JoinNode) and n.left.mode == JoinMode.SEMI
    ]
    assert reduced, root.tree_string()
    assert rows_match(run_sql(q).to_pylist(), oracle.execute(q),
                      ordered=False)


def test_aggregate_reduction_declines_unselective_partner():
    """Q18-shape: the partner (full orders) is NOT selective — reducing
    the aggregate input would add work, so the rule must not fire."""
    oracle = make_env({
        "fact": {"k": [1, 1, 2, 2, 3, 3], "v": [1, 2, 3, 4, 5, 6]},
        "dim": {"k": [1, 2, 3], "name": ["a", "b", "c"]},
    })
    q = ("SELECT d.name, s.t FROM dim d, "
         "(SELECT k, SUM(v) AS t FROM fact GROUP BY k) s "
         "WHERE d.k = s.k")
    root = _optimize(q)
    reduced = [
        n for n in root.walk()
        if isinstance(n, L.AggregateNode) and n.group_by
        and isinstance(n.left, L.JoinNode) and n.left.mode == JoinMode.SEMI
    ]
    assert not reduced, root.tree_string()
    assert rows_match(run_sql(q).to_pylist(), oracle.execute(q),
                      ordered=False)


def test_aggregate_reduction_declines_fk_complete_partner():
    """Q15-shape: the partner table covers the aggregate's whole key
    domain (every group key matches) — a reducer would filter nothing."""
    import numpy as np

    n_k = 500
    oracle = make_env({
        "fact": {
            "k": np.repeat(np.arange(n_k), 8).tolist(),
            "v": (np.arange(n_k * 8) % 97).tolist(),
        },
        # partner has EXACTLY the fact's key domain (an FK parent)
        "dim": {"k": list(range(n_k)), "name": ["x"] * n_k},
    })
    q = ("SELECT d.k, s.t FROM dim d, "
         "(SELECT k, SUM(v) AS t FROM fact GROUP BY k) s "
         "WHERE d.k = s.k")
    root = _optimize(q)
    reduced = [
        n for n in root.walk()
        if isinstance(n, L.AggregateNode) and n.group_by
        and isinstance(n.left, L.JoinNode) and n.left.mode == JoinMode.SEMI
    ]
    assert not reduced, root.tree_string()
    assert rows_match(run_sql(q).to_pylist(), oracle.execute(q),
                      ordered=False)
