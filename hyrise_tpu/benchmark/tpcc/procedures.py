"""TPC-C transaction procedures (ref: benchmarklib/tpcc/procedures/ —
NewOrder, Payment, OrderStatus, Delivery, StockLevel; each runs as one
MVCC transaction over the SQL surface and rolls back on conflict)."""

from __future__ import annotations

import random
import time
from typing import Optional

from hyrise_tpu.database import Database
from hyrise_tpu.sql.pipeline import SQLPipelineBuilder, TransactionConflict


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

        rows = self._sql(
            f"SELECT d_next_o_id, d_tax FROM district "
            f"WHERE d_w_id = {w_id} AND d_id = {d_id}", ctx,
        )
        o_id, _ = rows[0]
        self._sql(
            f"UPDATE district SET d_next_o_id = {o_id + 1} "
            f"WHERE d_w_id = {w_id} AND d_id = {d_id}", ctx,
        )
        self._sql(
            f"INSERT INTO \"order\" (o_w_id, o_d_id, o_id, o_c_id, o_entry_d,"
            f" o_carrier_id, o_ol_cnt, o_all_local) VALUES "
            f"({w_id}, {d_id}, {o_id}, {c_id}, '2026-08-17', 0, {n_lines}, 1)",
            ctx,
        )
        self._sql(
            f"INSERT INTO new_order (no_w_id, no_d_id, no_o_id) "
            f"VALUES ({w_id}, {d_id}, {o_id})", ctx,
        )
        for ol in range(1, n_lines + 1):
            i_id = rng.randint(1, self.items)
            qty = rng.randint(1, 10)
            srow = self._sql(
                f"SELECT s_quantity FROM stock "
                f"WHERE s_w_id = {w_id} AND s_i_id = {i_id}", ctx,
            )
            s_qty = srow[0][0] if srow else 50
            new_qty = s_qty - qty if s_qty - qty >= 10 else s_qty - qty + 91
            self._sql(
                f"UPDATE stock SET s_quantity = {new_qty}, "
                f"s_order_cnt = s_order_cnt + 1, s_ytd = s_ytd + {qty} "
                f"WHERE s_w_id = {w_id} AND s_i_id = {i_id}", ctx,
            )
            price_row = self._sql(
                f"SELECT i_price FROM item WHERE i_id = {i_id}", ctx
            )
            price = price_row[0][0] if price_row else 1.0
            self._sql(
                f"INSERT INTO order_line (ol_w_id, ol_d_id, ol_o_id, "
                f"ol_number, ol_i_id, ol_supply_w_id, ol_delivery_d, "
                f"ol_quantity, ol_amount, ol_dist_info) VALUES "
                f"({w_id}, {d_id}, {o_id}, {ol}, {i_id}, {w_id}, "
                f"'1970-01-01', {qty}, {round(price * qty, 2)}, 'dist')", ctx,
            )


class Payment(AbstractProcedure):
    """Ref: tpcc_payment.cpp."""

    def _execute(self, ctx) -> None:
        rng = self.rng
        w_id = rng.randint(1, self.w)
        d_id = rng.randint(1, self.districts)
        c_id = rng.randint(1, self.customers)
        amount = round(rng.uniform(1.0, 5000.0), 2)
        self._sql(
            f"UPDATE warehouse SET w_ytd = w_ytd + {amount} "
            f"WHERE w_id = {w_id}", ctx,
        )
        self._sql(
            f"UPDATE district SET d_ytd = d_ytd + {amount} "
            f"WHERE d_w_id = {w_id} AND d_id = {d_id}", ctx,
        )
        self._sql(
            f"UPDATE customer SET c_balance = c_balance - {amount}, "
            f"c_ytd_payment = c_ytd_payment + {amount}, "
            f"c_payment_cnt = c_payment_cnt + 1 "
            f"WHERE c_w_id = {w_id} AND c_d_id = {d_id} AND c_id = {c_id}",
            ctx,
        )
        self._sql(
            f"INSERT INTO history (h_c_id, h_c_d_id, h_c_w_id, h_date, "
            f"h_amount, h_data) VALUES ({c_id}, {d_id}, {w_id}, "
            f"'2026-08-17', {amount}, 'payment')", ctx,
        )


class OrderStatus(AbstractProcedure):
    """Ref: tpcc_order_status.cpp (read-only)."""

    def _execute(self, ctx) -> None:
        rng = self.rng
        w_id = rng.randint(1, self.w)
        d_id = rng.randint(1, self.districts)
        c_id = rng.randint(1, self.customers)
        rows = self._sql(
            f"SELECT o_id FROM \"order\" WHERE o_w_id = {w_id} "
            f"AND o_d_id = {d_id} AND o_c_id = {c_id} "
            f"ORDER BY o_id DESC LIMIT 1", ctx,
        )
        if rows:
            o_id = rows[0][0]
            self._sql(
                f"SELECT ol_i_id, ol_quantity, ol_amount FROM order_line "
                f"WHERE ol_w_id = {w_id} AND ol_d_id = {d_id} "
                f"AND ol_o_id = {o_id}", ctx,
            )


class Delivery(AbstractProcedure):
    """Ref: tpcc_delivery.cpp — deliver the oldest new order per district."""

    def _execute(self, ctx) -> None:
        rng = self.rng
        w_id = rng.randint(1, self.w)
        carrier = rng.randint(1, 10)
        for d_id in range(1, self.districts + 1):
            rows = self._sql(
                f"SELECT MIN(no_o_id) FROM new_order "
                f"WHERE no_w_id = {w_id} AND no_d_id = {d_id}", ctx,
            )
            if not rows or rows[0][0] is None:
                continue
            o_id = rows[0][0]
            self._sql(
                f"DELETE FROM new_order WHERE no_w_id = {w_id} "
                f"AND no_d_id = {d_id} AND no_o_id = {o_id}", ctx,
            )
            self._sql(
                f"UPDATE \"order\" SET o_carrier_id = {carrier} "
                f"WHERE o_w_id = {w_id} AND o_d_id = {d_id} AND o_id = {o_id}",
                ctx,
            )
            self._sql(
                f"UPDATE order_line SET ol_delivery_d = '2026-08-17' "
                f"WHERE ol_w_id = {w_id} AND ol_d_id = {d_id} "
                f"AND ol_o_id = {o_id}", ctx,
            )
            amount_rows = self._sql(
                f"SELECT SUM(ol_amount), MAX(ol_number) FROM order_line "
                f"WHERE ol_w_id = {w_id} AND ol_d_id = {d_id} "
                f"AND ol_o_id = {o_id}", ctx,
            )
            c_rows = self._sql(
                f"SELECT o_c_id FROM \"order\" WHERE o_w_id = {w_id} "
                f"AND o_d_id = {d_id} AND o_id = {o_id}", ctx,
            )
            if amount_rows and c_rows and amount_rows[0][0] is not None:
                self._sql(
                    f"UPDATE customer SET c_balance = c_balance + "
                    f"{amount_rows[0][0]}, c_delivery_cnt = c_delivery_cnt + 1 "
                    f"WHERE c_w_id = {w_id} AND c_d_id = {d_id} "
                    f"AND c_id = {c_rows[0][0]}", ctx,
                )


class StockLevel(AbstractProcedure):
    """Ref: tpcc_stock_level.cpp (read-only analytics)."""

    def _execute(self, ctx) -> None:
        rng = self.rng
        w_id = rng.randint(1, self.w)
        d_id = rng.randint(1, self.districts)
        threshold = rng.randint(10, 20)
        rows = self._sql(
            f"SELECT d_next_o_id FROM district "
            f"WHERE d_w_id = {w_id} AND d_id = {d_id}", ctx,
        )
        next_o = rows[0][0] if rows else 1
        self._sql(
            f"SELECT COUNT(DISTINCT s_i_id) FROM order_line, stock "
            f"WHERE ol_w_id = {w_id} AND ol_d_id = {d_id} "
            f"AND ol_o_id >= {next_o - 20} AND ol_o_id < {next_o} "
            f"AND s_w_id = {w_id} AND s_i_id = ol_i_id "
            f"AND s_quantity < {threshold}", ctx,
        )


PROCEDURES = {
    "new_order": (NewOrder, 0.45),
    "payment": (Payment, 0.43),
    "order_status": (OrderStatus, 0.04),
    "delivery": (Delivery, 0.04),
    "stock_level": (StockLevel, 0.04),
}
