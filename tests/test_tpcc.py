"""TPC-C tests: generator row counts/constraints + transactional procedure
semantics under MVCC (ref model: test/benchmarklib/tpcc/*)."""

import random

import pytest

from hyrise_tpu.benchmark.tpcc.generator import TPCCTableGenerator
from hyrise_tpu.benchmark.tpcc.procedures import (
    Delivery,
    NewOrder,
    OrderStatus,
    Payment,
    StockLevel,
)
from hyrise_tpu.database import Database
from hyrise_tpu.sql.pipeline import sql


@pytest.fixture
def tpcc():
    gen = TPCCTableGenerator(warehouses=1, density=0.005)
    gen.generate_into(Database.get().storage_manager)
    return gen


def q1(query):
    return sql(query).to_pylist()[0][0]


def test_generator_row_counts(tpcc):
    assert q1("SELECT COUNT(*) FROM warehouse") == 1
    assert q1("SELECT COUNT(*) FROM district") == 10
    assert q1("SELECT COUNT(*) FROM item") == tpcc.n_items
    assert q1("SELECT COUNT(*) FROM stock") == tpcc.n_items
    assert q1("SELECT COUNT(*) FROM customer") == 10 * tpcc.customers_per_d
    n_orders = q1('SELECT COUNT(*) FROM "order"')
    assert n_orders == 10 * tpcc.orders_per_d
    # every order has 5-15 lines
    lo, hi = sql(
        "SELECT MIN(o_ol_cnt), MAX(o_ol_cnt) FROM \"order\""
    ).to_pylist()[0]
    assert lo >= 5 and hi <= 15


def test_new_order_procedure(tpcc):
    rng = random.Random(1)
    before_orders = q1('SELECT COUNT(*) FROM "order"')
    before_next = q1(
        "SELECT d_next_o_id FROM district WHERE d_w_id = 1 AND d_id = 1"
    )
    proc = NewOrder(rng, 1, tpcc.n_items, 10, tpcc.customers_per_d)
    # pin to district 1 by controlling the RNG path deterministically
    assert proc.run() is True
    after_orders = q1('SELECT COUNT(*) FROM "order"')
    assert after_orders == before_orders + 1


def test_payment_procedure(tpcc):
    rng = random.Random(2)
    before = q1("SELECT SUM(w_ytd) FROM warehouse")
    assert Payment(rng, 1, tpcc.n_items, 10, tpcc.customers_per_d).run()
    after = q1("SELECT SUM(w_ytd) FROM warehouse")
    assert after > before
    assert q1("SELECT COUNT(*) FROM history") == 10 * tpcc.customers_per_d + 1


def test_delivery_procedure(tpcc):
    rng = random.Random(3)
    before_new = q1("SELECT COUNT(*) FROM new_order")
    assert Delivery(rng, 1, tpcc.n_items, 10, tpcc.customers_per_d).run()
    after_new = q1("SELECT COUNT(*) FROM new_order")
    assert after_new < before_new


def test_read_only_procedures(tpcc):
    rng = random.Random(4)
    assert OrderStatus(rng, 1, tpcc.n_items, 10, tpcc.customers_per_d).run()
    assert StockLevel(rng, 1, tpcc.n_items, 10, tpcc.customers_per_d).run()
