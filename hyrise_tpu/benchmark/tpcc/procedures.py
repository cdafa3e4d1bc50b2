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

from hyrise_tpu.database import Database
from hyrise_tpu.sql.pipeline import SQLPipelineBuilder, TransactionConflict

_PREPARED: set = set()


def _fmt(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


class AbstractProcedure:
    def __init__(self, rng: random.Random, warehouses: int, items: int,
                 districts: int = 10, customers: int = 3000,
                 home=None):
        self.rng = rng
        self.w = warehouses
        self.items = items
        self.districts = districts
        self.customers = customers
        # (w_id, d_id) terminal binding: the TPC-C spec assigns each
        # terminal to one district, which is what makes multi-client
        # throughput scale — unpinned clients collide on the district
        # row (d_next_o_id / d_ytd CAS) and abort each other
        self.home = home

    def _pick_wd(self):
        if self.home is not None:
            return self.home
        return (self.rng.randint(1, self.w),
                self.rng.randint(1, self.districts))

    def _sql(self, query: str, ctx):
        pipeline = (
            SQLPipelineBuilder(query).with_transaction_context(ctx)
            .create_pipeline()
        )
        tables = pipeline.get_result_tables()
        return tables[-1].to_pylist() if tables and tables[-1] is not None else []

    def _exec(self, name: str, text: str, params, ctx):
        """EXECUTE the named prepared statement (PREPARE on first use).
        Executions take the no-parse fast path: parameters are already
        Python values, so formatting them into an EXECUTE statement only
        to re-tokenize it cost ~10% of TPC-C wall time."""
        sm = Database.get().storage_manager
        if name not in _PREPARED or not sm.has_prepared_plan(name):
            self._sql(f"PREPARE {name} AS {text}", ctx)
            _PREPARED.add(name)
        from hyrise_tpu.sql.pipeline import execute_prepared

        res = execute_prepared(name, params, ctx)
        return res.to_pylist() if res is not None else []

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


_LINE_PAD = 15  # max order lines; padded IN lists keep ONE plan per shape


def _in_list(n: int) -> str:
    return ", ".join("?" for _ in range(n))


def _case_pairs(col: str, n: int, else_: str) -> str:
    return ("CASE " + col + " " + " ".join("WHEN ? THEN ?" for _ in range(n))
            + f" ELSE {else_} END")


def _or_pairs(col_a: str, col_b: str, n: int) -> str:
    return " OR ".join(f"({col_a} = ? AND {col_b} = ?)" for _ in range(n))


# Pair-membership via ONE packed derived key: (a, b) IN {...} evaluates as
# a*2^24 + b IN (?, ...) — 12 vectorized passes over the column instead of
# ~4 per OR-branch (the Delivery statements scan order_line, the biggest
# table, so predicate passes dominate their latency).  Sound while
# b < 2^24, which holds for every TPC-C id at any benchmark duration.
_PAIR_BASE = 1 << 24


def _packed_pairs(col_a: str, col_b: str, n: int) -> str:
    return (f"{col_a} * {_PAIR_BASE} + {col_b} IN ("
            + ", ".join("?" for _ in range(n)) + ")")


def _pack_pair_params(pairs) -> list:
    return [a * _PAIR_BASE + b for a, b in pairs]


class NewOrder(AbstractProcedure):
    """Ref: tpcc_new_order.cpp — insert an order with 5-15 lines, update
    district next-o-id and stock quantities.

    SET-BASED: the per-line loop (3 statements x 5-15 lines in the
    reference) collapses into 4 batched statements — one padded-IN stock
    fetch, one CASE-driven stock update, one padded-IN price fetch, one
    multi-row order-line insert — because every statement here costs a
    full device dispatch round; TPU OLTP throughput is statement-count
    bound, not row-count bound."""

    def _execute(self, ctx) -> None:
        rng = self.rng
        w_id, d_id = self._pick_wd()
        c_id = rng.randint(1, self.customers)
        n_lines = rng.randint(5, 15)
        line_items = [rng.randint(1, self.items) for _ in range(n_lines)]
        line_qty = [rng.randint(1, 10) for _ in range(n_lines)]

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
        if len(set(line_items)) != n_lines:
            # rare duplicate-item order: the sequential per-line loop
            # preserves order-dependent stock-update semantics
            self._per_line_fallback(ctx, w_id, d_id, o_id, line_items,
                                    line_qty)
            return

        pad_i = line_items + [line_items[-1]] * (_LINE_PAD - n_lines)
        srows = self._exec(
            "no_get_stock_batch",
            "SELECT s_i_id, s_quantity FROM stock WHERE s_w_id = ? "
            f"AND s_i_id IN ({_in_list(_LINE_PAD)})",
            tuple([w_id] + pad_i), ctx,
        )
        s_qty = {i: q for i, q in srows}
        new_qty, ytd_add = {}, {}
        for i, q in zip(line_items, line_qty):
            sq = s_qty.get(i, 50)
            new_qty[i] = sq - q if sq - q >= 10 else sq - q + 91
            ytd_add[i] = q
        case_q, case_y = [], []
        for i in line_items:
            case_q += [i, new_qty[i]]
            case_y += [i, ytd_add[i]]
        pad_pair_q = case_q[-2:] * (_LINE_PAD - n_lines)
        pad_pair_y = case_y[-2:] * (_LINE_PAD - n_lines)
        self._exec(
            "no_update_stock_batch",
            "UPDATE stock SET "
            f"s_quantity = {_case_pairs('s_i_id', _LINE_PAD, 's_quantity')}, "
            "s_order_cnt = s_order_cnt + 1, "
            f"s_ytd = s_ytd + {_case_pairs('s_i_id', _LINE_PAD, '0')} "
            f"WHERE s_w_id = ? AND s_i_id IN ({_in_list(_LINE_PAD)})",
            tuple(case_q + pad_pair_q + case_y + pad_pair_y
                  + [w_id] + pad_i), ctx,
        )
        prows = self._exec(
            "no_get_price_batch",
            f"SELECT i_id, i_price FROM item WHERE i_id IN "
            f"({_in_list(_LINE_PAD)})",
            tuple(pad_i), ctx,
        )
        price = {i: p for i, p in prows}
        line_params = []
        for ol, (i, q) in enumerate(zip(line_items, line_qty), start=1):
            line_params += [w_id, d_id, o_id, ol, i, w_id, q,
                            round(price.get(i, 1.0) * q, 2)]
        row_sql = "(?, ?, ?, ?, ?, ?, '1970-01-01', ?, ?, 'dist')"
        self._exec(
            f"no_insert_lines_{n_lines}",
            "INSERT INTO order_line (ol_w_id, ol_d_id, ol_o_id, "
            "ol_number, ol_i_id, ol_supply_w_id, ol_delivery_d, "
            "ol_quantity, ol_amount, ol_dist_info) VALUES "
            + ", ".join(row_sql for _ in range(n_lines)),
            tuple(line_params), ctx,
        )

    def _per_line_fallback(self, ctx, w_id, d_id, o_id, line_items,
                           line_qty) -> None:
        for ol, (i_id, qty) in enumerate(zip(line_items, line_qty), start=1):
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
        w_id, d_id = self._pick_wd()
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
    """Ref: tpcc_order_status.cpp (read-only).  The latest order id is a
    MAX aggregate, not a sort: ORDER BY DESC LIMIT 1 paid a full padded
    device sort per execution."""

    def _execute(self, ctx) -> None:
        rng = self.rng
        w_id, d_id = self._pick_wd()
        c_id = rng.randint(1, self.customers)
        rows = self._exec(
            "os_last_order",
            "SELECT MAX(o_id) FROM \"order\" WHERE o_w_id = ? "
            "AND o_d_id = ? AND o_c_id = ?",
            (w_id, d_id, c_id), ctx,
        )
        if rows and rows[0][0] is not None:
            o_id = rows[0][0]
            self._exec(
                "os_lines",
                "SELECT ol_i_id, ol_quantity, ol_amount FROM order_line "
                "WHERE ol_w_id = ? AND ol_d_id = ? AND ol_o_id = ?",
                (w_id, d_id, o_id), ctx,
            )


class Delivery(AbstractProcedure):
    """Ref: tpcc_delivery.cpp — deliver the oldest new order per district.

    SET-BASED: the reference loops 10 districts x 7 statements; here all
    districts process in 7 batched statements (one GROUP BY finds every
    district's oldest order, padded (district, order) OR-pair predicates
    drive the deletes/updates, a CASE keyed on district pays customers)."""

    def _execute(self, ctx) -> None:
        rng = self.rng
        # Delivery is warehouse-scoped (all 10 districts batched); a
        # home-bound terminal delivers for its own warehouse
        w_id = self.home[0] if self.home else rng.randint(1, self.w)
        carrier = rng.randint(1, 10)
        rows = self._exec(
            "dl_oldest_all",
            "SELECT no_d_id, MIN(no_o_id) FROM new_order "
            "WHERE no_w_id = ? GROUP BY no_d_id",
            (w_id,), ctx,
        )
        pairs = [(d, o) for d, o in rows if o is not None]
        if not pairs:
            return
        n = self.districts
        pad = pairs + [pairs[-1]] * (n - len(pairs))
        packed = _pack_pair_params(pad)
        self._exec(
            "dl_pop_batch",
            "DELETE FROM new_order WHERE no_w_id = ? AND "
            f"({_packed_pairs('no_d_id', 'no_o_id', n)})",
            tuple([w_id] + packed), ctx,
        )
        self._exec(
            "dl_carrier_batch",
            "UPDATE \"order\" SET o_carrier_id = ? WHERE o_w_id = ? AND "
            f"({_packed_pairs('o_d_id', 'o_id', n)})",
            tuple([carrier, w_id] + packed), ctx,
        )
        self._exec(
            "dl_lines_date_batch",
            "UPDATE order_line SET ol_delivery_d = '2026-08-17' "
            "WHERE ol_w_id = ? AND "
            f"({_packed_pairs('ol_d_id', 'ol_o_id', n)})",
            tuple([w_id] + packed), ctx,
        )
        amount_rows = self._exec(
            "dl_amount_batch",
            "SELECT ol_d_id, SUM(ol_amount) FROM order_line "
            "WHERE ol_w_id = ? AND "
            f"({_packed_pairs('ol_d_id', 'ol_o_id', n)}) GROUP BY ol_d_id",
            tuple([w_id] + packed), ctx,
        )
        c_rows = self._exec(
            "dl_customer_batch",
            "SELECT o_d_id, o_c_id FROM \"order\" WHERE o_w_id = ? AND "
            f"({_packed_pairs('o_d_id', 'o_id', n)})",
            tuple([w_id] + packed), ctx,
        )
        amount = {d: a for d, a in amount_rows if a is not None}
        cust = {d: c for d, c in c_rows}
        pay = [(d, cust[d], amount[d]) for d, _ in pairs
               if d in amount and d in cust]
        if not pay:
            return
        pay_pad = pay + [pay[-1]] * (n - len(pay))
        case_amt = [x for d, _, a in pay_pad for x in (d, a)]
        cust_packed = _pack_pair_params([(d, c) for d, c, _ in pay_pad])
        self._exec(
            "dl_pay_batch",
            "UPDATE customer SET c_balance = c_balance + "
            f"{_case_pairs('c_d_id', n, '0.0')}, "
            "c_delivery_cnt = c_delivery_cnt + 1 "
            "WHERE c_w_id = ? AND "
            f"({_packed_pairs('c_d_id', 'c_id', n)})",
            tuple(case_amt + [w_id] + cust_packed), ctx,
        )


class StockLevel(AbstractProcedure):
    """Ref: tpcc_stock_level.cpp (read-only analytics)."""

    def _execute(self, ctx) -> None:
        rng = self.rng
        w_id, d_id = self._pick_wd()
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
