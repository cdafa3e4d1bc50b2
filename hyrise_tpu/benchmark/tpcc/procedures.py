"""TPC-C transaction procedures (ref: benchmarklib/tpcc/procedures/ —
NewOrder, Payment, OrderStatus, Delivery, StockLevel; each runs as one
MVCC transaction over the SQL surface and rolls back on conflict).

All statements run as PREPARE/EXECUTE: the optimized LQP (and therefore
the compiled XLA stage cache keys) is built once per statement SHAPE, and
each execution binds new parameter values as traced scalars — the TPU
analogue of the reference caching its PQPs per procedure
(benchmarklib/abstract_benchmark_item_runner.hpp)."""

from __future__ import annotations

import random
import time
from typing import Optional

from hyrise_tpu.database import Database
from hyrise_tpu.sql.pipeline import SQLPipelineBuilder, TransactionConflict

_PREPARED: set = set()


def _fmt(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


class AbstractProcedure:
    def __init__(self, rng: random.Random, warehouses: int, items: int,
                 districts: int = 10, customers: int = 3000):
        self.rng = rng
        self.w = warehouses
        self.items = items
        self.districts = districts
        self.customers = customers

    def _sql(self, query: str, ctx):
        pipeline = (
            SQLPipelineBuilder(query).with_transaction_context(ctx)
            .create_pipeline()
        )
        tables = pipeline.get_result_tables()
        return tables[-1].to_pylist() if tables and tables[-1] is not None else []

    def _exec(self, name: str, text: str, params, ctx):
        """EXECUTE the named prepared statement (PREPARE on first use)."""
        sm = Database.get().storage_manager
        if name not in _PREPARED or not sm.has_prepared_plan(name):
            self._sql(f"PREPARE {name} AS {text}", ctx)
            _PREPARED.add(name)
        args = ", ".join(_fmt(p) for p in params)
        return self._sql(f"EXECUTE {name} ({args})", ctx)

    def run(self) -> bool:
        """Execute under a fresh transaction; True on commit."""
        tm = Database.get().transaction_manager
        ctx = tm.new_transaction_context()
        try:
            self._execute(ctx)
            ctx.commit()
            return True
        except TransactionConflict:
            return False
        except Exception:
            if not ctx.aborted:
                ctx.rollback()
            raise

    def _execute(self, ctx) -> None:
        raise NotImplementedError


class NewOrder(AbstractProcedure):
    """Ref: tpcc_new_order.cpp — insert an order with 5-15 lines, update
    district next-o-id and stock quantities."""

    def _execute(self, ctx) -> None:
        rng = self.rng
        w_id = rng.randint(1, self.w)
        d_id = rng.randint(1, self.districts)
        c_id = rng.randint(1, self.customers)
        n_lines = rng.randint(5, 15)

        rows = self._exec(
            "no_get_district",
            "SELECT d_next_o_id, d_tax FROM district "
            "WHERE d_w_id = ? AND d_id = ?",
            (w_id, d_id), ctx,
        )
        o_id, _ = rows[0]
        self._exec(
            "no_bump_district",
            "UPDATE district SET d_next_o_id = ? WHERE d_w_id = ? AND d_id = ?",
            (o_id + 1, w_id, d_id), ctx,
        )
        self._exec(
            "no_insert_order",
            "INSERT INTO \"order\" (o_w_id, o_d_id, o_id, o_c_id, o_entry_d,"
            " o_carrier_id, o_ol_cnt, o_all_local) VALUES "
            "(?, ?, ?, ?, '2026-08-17', 0, ?, 1)",
            (w_id, d_id, o_id, c_id, n_lines), ctx,
        )
        self._exec(
            "no_insert_new_order",
            "INSERT INTO new_order (no_w_id, no_d_id, no_o_id) VALUES (?, ?, ?)",
            (w_id, d_id, o_id), ctx,
        )
        for ol in range(1, n_lines + 1):
            i_id = rng.randint(1, self.items)
            qty = rng.randint(1, 10)
            srow = self._exec(
                "no_get_stock",
                "SELECT s_quantity FROM stock WHERE s_w_id = ? AND s_i_id = ?",
                (w_id, i_id), ctx,
            )
            s_qty = srow[0][0] if srow else 50
            new_qty = s_qty - qty if s_qty - qty >= 10 else s_qty - qty + 91
            self._exec(
                "no_update_stock",
                "UPDATE stock SET s_quantity = ?, "
                "s_order_cnt = s_order_cnt + 1, s_ytd = s_ytd + ? "
                "WHERE s_w_id = ? AND s_i_id = ?",
                (new_qty, qty, w_id, i_id), ctx,
            )
            price_row = self._exec(
                "no_get_price",
                "SELECT i_price FROM item WHERE i_id = ?", (i_id,), ctx,
            )
            price = price_row[0][0] if price_row else 1.0
            self._exec(
                "no_insert_order_line",
                "INSERT INTO order_line (ol_w_id, ol_d_id, ol_o_id, "
                "ol_number, ol_i_id, ol_supply_w_id, ol_delivery_d, "
                "ol_quantity, ol_amount, ol_dist_info) VALUES "
                "(?, ?, ?, ?, ?, ?, '1970-01-01', ?, ?, 'dist')",
                (w_id, d_id, o_id, ol, i_id, w_id, qty,
                 round(price * qty, 2)), ctx,
            )


class Payment(AbstractProcedure):
    """Ref: tpcc_payment.cpp."""

    def _execute(self, ctx) -> None:
        rng = self.rng
        w_id = rng.randint(1, self.w)
        d_id = rng.randint(1, self.districts)
        c_id = rng.randint(1, self.customers)
        amount = round(rng.uniform(1.0, 5000.0), 2)
        self._exec(
            "pay_warehouse",
            "UPDATE warehouse SET w_ytd = w_ytd + ? WHERE w_id = ?",
            (amount, w_id), ctx,
        )
        self._exec(
            "pay_district",
            "UPDATE district SET d_ytd = d_ytd + ? "
            "WHERE d_w_id = ? AND d_id = ?",
            (amount, w_id, d_id), ctx,
        )
        self._exec(
            "pay_customer",
            "UPDATE customer SET c_balance = c_balance - ?, "
            "c_ytd_payment = c_ytd_payment + ?, "
            "c_payment_cnt = c_payment_cnt + 1 "
            "WHERE c_w_id = ? AND c_d_id = ? AND c_id = ?",
            (amount, amount, w_id, d_id, c_id), ctx,
        )
        self._exec(
            "pay_history",
            "INSERT INTO history (h_c_id, h_c_d_id, h_c_w_id, h_d_id, "
            "h_w_id, h_date, h_amount, h_data) "
            "VALUES (?, ?, ?, ?, ?, '2026-08-17', ?, 'payment')",
            (c_id, d_id, w_id, d_id, w_id, amount), ctx,
        )


class OrderStatus(AbstractProcedure):
    """Ref: tpcc_order_status.cpp (read-only)."""

    def _execute(self, ctx) -> None:
        rng = self.rng
        w_id = rng.randint(1, self.w)
        d_id = rng.randint(1, self.districts)
        c_id = rng.randint(1, self.customers)
        rows = self._exec(
            "os_last_order",
            "SELECT o_id FROM \"order\" WHERE o_w_id = ? "
            "AND o_d_id = ? AND o_c_id = ? ORDER BY o_id DESC LIMIT 1",
            (w_id, d_id, c_id), ctx,
        )
        if rows:
            o_id = rows[0][0]
            self._exec(
                "os_lines",
                "SELECT ol_i_id, ol_quantity, ol_amount FROM order_line "
                "WHERE ol_w_id = ? AND ol_d_id = ? AND ol_o_id = ?",
                (w_id, d_id, o_id), ctx,
            )


class Delivery(AbstractProcedure):
    """Ref: tpcc_delivery.cpp — deliver the oldest new order per district."""

    def _execute(self, ctx) -> None:
        rng = self.rng
        w_id = rng.randint(1, self.w)
        carrier = rng.randint(1, 10)
        for d_id in range(1, self.districts + 1):
            rows = self._exec(
                "dl_oldest",
                "SELECT MIN(no_o_id) FROM new_order "
                "WHERE no_w_id = ? AND no_d_id = ?",
                (w_id, d_id), ctx,
            )
            if not rows or rows[0][0] is None:
                continue
            o_id = rows[0][0]
            self._exec(
                "dl_pop_new_order",
                "DELETE FROM new_order WHERE no_w_id = ? "
                "AND no_d_id = ? AND no_o_id = ?",
                (w_id, d_id, o_id), ctx,
            )
            self._exec(
                "dl_carrier",
                "UPDATE \"order\" SET o_carrier_id = ? "
                "WHERE o_w_id = ? AND o_d_id = ? AND o_id = ?",
                (carrier, w_id, d_id, o_id), ctx,
            )
            self._exec(
                "dl_lines_date",
                "UPDATE order_line SET ol_delivery_d = '2026-08-17' "
                "WHERE ol_w_id = ? AND ol_d_id = ? AND ol_o_id = ?",
                (w_id, d_id, o_id), ctx,
            )
            amount_rows = self._exec(
                "dl_amount",
                "SELECT SUM(ol_amount), MAX(ol_number) FROM order_line "
                "WHERE ol_w_id = ? AND ol_d_id = ? AND ol_o_id = ?",
                (w_id, d_id, o_id), ctx,
            )
            c_rows = self._exec(
                "dl_customer_of",
                "SELECT o_c_id FROM \"order\" WHERE o_w_id = ? "
                "AND o_d_id = ? AND o_id = ?",
                (w_id, d_id, o_id), ctx,
            )
            if amount_rows and c_rows and amount_rows[0][0] is not None:
                self._exec(
                    "dl_pay_customer",
                    "UPDATE customer SET c_balance = c_balance + ?, "
                    "c_delivery_cnt = c_delivery_cnt + 1 "
                    "WHERE c_w_id = ? AND c_d_id = ? AND c_id = ?",
                    (amount_rows[0][0], w_id, d_id, c_rows[0][0]), ctx,
                )


class StockLevel(AbstractProcedure):
    """Ref: tpcc_stock_level.cpp (read-only analytics)."""

    def _execute(self, ctx) -> None:
        rng = self.rng
        w_id = rng.randint(1, self.w)
        d_id = rng.randint(1, self.districts)
        threshold = rng.randint(10, 20)
        rows = self._exec(
            "sl_next_o",
            "SELECT d_next_o_id FROM district WHERE d_w_id = ? AND d_id = ?",
            (w_id, d_id), ctx,
        )
        next_o = rows[0][0] if rows else 1
        self._exec(
            "sl_count",
            "SELECT COUNT(DISTINCT s_i_id) FROM order_line, stock "
            "WHERE ol_w_id = ? AND ol_d_id = ? "
            "AND ol_o_id >= ? AND ol_o_id < ? "
            "AND s_w_id = ? AND s_i_id = ol_i_id AND s_quantity < ?",
            (w_id, d_id, next_o - 20, next_o, w_id, threshold), ctx,
        )


PROCEDURES = {
    "new_order": (NewOrder, 0.45),
    "payment": (Payment, 0.43),
    "order_status": (OrderStatus, 0.04),
    "delivery": (Delivery, 0.04),
    "stock_level": (StockLevel, 0.04),
}
