"""TPC-C table generator (vectorized numpy from the TPC-C v5 spec clause
4.3; ref: benchmarklib/tpcc/tpcc_table_generator.cpp — native generator in
the reference too, no dbgen).

Scale unit = warehouses.  `density` scales per-warehouse row counts down
for tests (1.0 = spec sizes: 10 districts/WH, 3000 customers/district,
100k items, 100k stock/WH, 3000 initial orders/district).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from hyrise_tpu.benchmark.tpch.generator import _money, _texts
from hyrise_tpu.storage.table import Table, TableKeyConstraint
from hyrise_tpu.types import DataType


class TPCCTableGenerator:
    def __init__(self, warehouses: int = 1, density: float = 1.0, seed: int = 7):
        self.w = warehouses
        self.density = density
        self.rng = np.random.default_rng(seed)
        self.n_items = max(int(100_000 * density), 10)
        self.districts_per_w = 10
        self.customers_per_d = max(int(3000 * density), 3)
        self.orders_per_d = max(int(3000 * density), 3)

    def generate(self) -> Dict[str, Table]:
        tables = {
            "item": self._item(),
            "warehouse": self._warehouse(),
            "stock": self._stock(),
            "district": self._district(),
            "customer": self._customer(),
            "history": self._history(),
        }
        orders, order_line, new_order = self._orders()
        tables["order"] = orders
        tables["order_line"] = order_line
        tables["new_order"] = new_order
        pk = {
            "item": ("i_id",), "warehouse": ("w_id",),
            "stock": ("s_w_id", "s_i_id"), "district": ("d_w_id", "d_id"),
            "customer": ("c_w_id", "c_d_id", "c_id"),
            "order": ("o_w_id", "o_d_id", "o_id"),
            "order_line": ("ol_w_id", "ol_d_id", "ol_o_id", "ol_number"),
            "new_order": ("no_w_id", "no_d_id", "no_o_id"),
        }
        for name, cols in pk.items():
            if name in tables:
                tables[name].key_constraints.append(TableKeyConstraint(cols, True))
        return tables

    def generate_into(self, storage_manager) -> Dict[str, Table]:
        from hyrise_tpu.concurrency.mvcc import MvccData

        tables = self.generate()
        for name, t in tables.items():
            # reserve insert headroom: growth reshapes re-key every compiled
            # stage on a table, so give the write-hot tables 2x slack (plus
            # a floor for the tiny ones) before MVCC arrays are sized
            if name in ("orders", "order_line", "new_order", "history"):
                # append-only growth: generous slack
                t.reserve(max(int(1.5 * t.num_rows), t.num_rows + 2048))
            elif name in ("customer", "stock"):
                # update churn only: the MVCC GC pass reclaims versions
                # every ~2s, so modest slack suffices — every statement's
                # device work is proportional to CAPACITY, and the 2x
                # headroom these tables used to get doubled OLTP scan cost
                t.reserve(max(int(1.25 * t.num_rows), t.num_rows + 4096))
            t.mvcc = MvccData(t.capacity, t.num_rows, initial_cid=0)
            if storage_manager.has_table(name):
                storage_manager.drop_table(name)
            # OLTP tables stay unencoded: TPC-C writes immediately, and the
            # first INSERT would decode (and re-key every compiled stage of)
            # a packed table anyway — mirrors the reference encoding only
            # full immutable chunks (ref: chunk_encoder.hpp:28)
            storage_manager.add_table(name, t)
        return tables

    # -------------------------------------------------------------- tables

    def _item(self) -> Table:
        rng = self.rng
        n = self.n_items
        ids = np.arange(1, n + 1, dtype=np.int32)
        return Table.from_numpy(
            {
                "i_id": ids,
                "i_im_id": rng.integers(1, 10001, size=n).astype(np.int32),
                "i_name": _texts(rng, n, 2),
                "i_price": _money(rng.integers(100, 10001, size=n)),
                "i_data": _texts(rng, n, 4),
            },
            {
                "i_id": DataType.INT, "i_im_id": DataType.INT,
                "i_name": DataType.STRING, "i_price": DataType.DOUBLE,
                "i_data": DataType.STRING,
            },
        )

    def _warehouse(self) -> Table:
        rng = self.rng
        n = self.w
        return Table.from_numpy(
            {
                "w_id": np.arange(1, n + 1, dtype=np.int32),
                "w_name": _texts(rng, n, 1),
                "w_street_1": _texts(rng, n, 2),
                "w_street_2": _texts(rng, n, 2),
                "w_city": _texts(rng, n, 1),
                "w_state": np.array(["CA"] * n),
                "w_zip": np.array(["123456789"] * n),
                "w_tax": rng.integers(0, 2001, size=n) / 10000.0,
                "w_ytd": np.full(n, 300000.0),
            },
            {
                "w_id": DataType.INT, "w_name": DataType.STRING,
                "w_street_1": DataType.STRING, "w_street_2": DataType.STRING,
                "w_city": DataType.STRING, "w_state": DataType.STRING,
                "w_zip": DataType.STRING, "w_tax": DataType.DOUBLE,
                "w_ytd": DataType.DOUBLE,
            },
        )

    def _stock(self) -> Table:
        rng = self.rng
        n = self.w * self.n_items
        w_ids = np.repeat(np.arange(1, self.w + 1, dtype=np.int32), self.n_items)
        i_ids = np.tile(np.arange(1, self.n_items + 1, dtype=np.int32), self.w)
        return Table.from_numpy(
            {
                "s_w_id": w_ids,
                "s_i_id": i_ids,
                "s_quantity": rng.integers(10, 101, size=n).astype(np.int32),
                "s_ytd": np.zeros(n, dtype=np.int32),
                "s_order_cnt": np.zeros(n, dtype=np.int32),
                "s_remote_cnt": np.zeros(n, dtype=np.int32),
                "s_data": _texts(rng, n, 3),
            },
            {
                "s_w_id": DataType.INT, "s_i_id": DataType.INT,
                "s_quantity": DataType.INT, "s_ytd": DataType.INT,
                "s_order_cnt": DataType.INT, "s_remote_cnt": DataType.INT,
                "s_data": DataType.STRING,
            },
        )

    def _district(self) -> Table:
        rng = self.rng
        n = self.w * self.districts_per_w
        return Table.from_numpy(
            {
                "d_w_id": np.repeat(np.arange(1, self.w + 1, dtype=np.int32),
                                    self.districts_per_w),
                "d_id": np.tile(np.arange(1, self.districts_per_w + 1,
                                          dtype=np.int32), self.w),
                "d_name": _texts(rng, n, 1),
                "d_street_1": _texts(rng, n, 2),
                "d_city": _texts(rng, n, 1),
                "d_state": np.array(["CA"] * n),
                "d_zip": np.array(["123456789"] * n),
                "d_tax": rng.integers(0, 2001, size=n) / 10000.0,
                "d_ytd": np.full(n, 30000.0),
                "d_next_o_id": np.full(n, self.orders_per_d + 1, dtype=np.int32),
            },
            {
                "d_w_id": DataType.INT, "d_id": DataType.INT,
                "d_name": DataType.STRING, "d_street_1": DataType.STRING,
                "d_city": DataType.STRING, "d_state": DataType.STRING,
                "d_zip": DataType.STRING, "d_tax": DataType.DOUBLE,
                "d_ytd": DataType.DOUBLE, "d_next_o_id": DataType.INT,
            },
        )

    def _customer(self) -> Table:
        rng = self.rng
        per_w = self.districts_per_w * self.customers_per_d
        n = self.w * per_w
        w_ids = np.repeat(np.arange(1, self.w + 1, dtype=np.int32), per_w)
        d_ids = np.tile(
            np.repeat(np.arange(1, self.districts_per_w + 1, dtype=np.int32),
                      self.customers_per_d),
            self.w,
        )
        c_ids = np.tile(
            np.arange(1, self.customers_per_d + 1, dtype=np.int32),
            self.w * self.districts_per_w,
        )
        lasts = np.array(
            ["BARBARBAR", "OUGHTPRES", "ABLEABLE", "PRIPRI", "ESEESE",
             "ANTIANTI", "CALLYCALLY", "ATIONATION", "EINGEING", "BARPRES"]
        )
        return Table.from_numpy(
            {
                "c_w_id": w_ids, "c_d_id": d_ids, "c_id": c_ids,
                "c_first": _texts(rng, n, 1),
                "c_middle": np.array(["OE"] * n),
                "c_last": lasts[(c_ids - 1) % 10],
                "c_street_1": _texts(rng, n, 2),
                "c_city": _texts(rng, n, 1),
                "c_state": np.array(["CA"] * n),
                "c_zip": np.array(["123456789"] * n),
                "c_phone": np.array(["555-0000"] * n),
                "c_since": np.array(["2026-01-01"] * n),
                "c_credit": np.where(rng.random(n) < 0.1, "BC", "GC"),
                "c_credit_lim": np.full(n, 50000.0),
                "c_discount": rng.integers(0, 5001, size=n) / 10000.0,
                "c_balance": np.full(n, -10.0),
                "c_ytd_payment": np.full(n, 10.0),
                "c_payment_cnt": np.ones(n, dtype=np.int32),
                "c_delivery_cnt": np.zeros(n, dtype=np.int32),
                "c_data": _texts(rng, n, 6),
            },
            {
                "c_w_id": DataType.INT, "c_d_id": DataType.INT,
                "c_id": DataType.INT, "c_first": DataType.STRING,
                "c_middle": DataType.STRING, "c_last": DataType.STRING,
                "c_street_1": DataType.STRING, "c_city": DataType.STRING,
                "c_state": DataType.STRING, "c_zip": DataType.STRING,
                "c_phone": DataType.STRING, "c_since": DataType.DATE,
                "c_credit": DataType.STRING, "c_credit_lim": DataType.DOUBLE,
                "c_discount": DataType.DOUBLE, "c_balance": DataType.DOUBLE,
                "c_ytd_payment": DataType.DOUBLE,
                "c_payment_cnt": DataType.INT,
                "c_delivery_cnt": DataType.INT, "c_data": DataType.STRING,
            },
        )

    def _history(self) -> Table:
        n = self.w * self.districts_per_w * self.customers_per_d
        rng = self.rng
        return Table.from_numpy(
            {
                "h_c_id": np.tile(
                    np.arange(1, self.customers_per_d + 1, dtype=np.int32),
                    self.w * self.districts_per_w,
                ),
                "h_c_d_id": np.tile(
                    np.repeat(np.arange(1, self.districts_per_w + 1,
                                        dtype=np.int32), self.customers_per_d),
                    self.w,
                ),
                "h_c_w_id": np.repeat(
                    np.arange(1, self.w + 1, dtype=np.int32),
                    self.districts_per_w * self.customers_per_d,
                ),
                # home district/warehouse = customer's (spec initial load;
                # ref: tpcc_table_generator.cpp:408 H_D_ID/H_W_ID)
                "h_d_id": np.tile(
                    np.repeat(np.arange(1, self.districts_per_w + 1,
                                        dtype=np.int32), self.customers_per_d),
                    self.w,
                ),
                "h_w_id": np.repeat(
                    np.arange(1, self.w + 1, dtype=np.int32),
                    self.districts_per_w * self.customers_per_d,
                ),
                "h_date": np.array(["2026-01-01"] * n),
                "h_amount": np.full(n, 10.0),
                "h_data": _texts(rng, n, 3),
            },
            {
                "h_c_id": DataType.INT, "h_c_d_id": DataType.INT,
                "h_c_w_id": DataType.INT, "h_d_id": DataType.INT,
                "h_w_id": DataType.INT, "h_date": DataType.DATE,
                "h_amount": DataType.DOUBLE, "h_data": DataType.STRING,
            },
        )

    def _orders(self):
        rng = self.rng
        n_o = self.w * self.districts_per_w * self.orders_per_d
        o_w = np.repeat(np.arange(1, self.w + 1, dtype=np.int32),
                        self.districts_per_w * self.orders_per_d)
        o_d = np.tile(
            np.repeat(np.arange(1, self.districts_per_w + 1, dtype=np.int32),
                      self.orders_per_d),
            self.w,
        )
        o_id = np.tile(np.arange(1, self.orders_per_d + 1, dtype=np.int32),
                       self.w * self.districts_per_w)
        # customers permuted per district
        o_c_id = np.zeros(n_o, dtype=np.int32)
        per_d = self.orders_per_d
        for i in range(self.w * self.districts_per_w):
            o_c_id[i * per_d:(i + 1) * per_d] = rng.permutation(
                np.arange(1, self.customers_per_d + 1)
            )[:per_d] if self.customers_per_d >= per_d else rng.integers(
                1, self.customers_per_d + 1, size=per_d
            )
        ol_cnt = rng.integers(5, 16, size=n_o).astype(np.int32)
        # last 30% of orders per district are "new" (undelivered)
        new_cut = int(self.orders_per_d * 0.7)
        is_new = o_id > new_cut
        carrier = np.where(is_new, 0, rng.integers(1, 11, size=n_o)).astype(np.int32)

        orders = Table.from_numpy(
            {
                "o_w_id": o_w, "o_d_id": o_d, "o_id": o_id,
                "o_c_id": o_c_id,
                "o_entry_d": np.array(["2026-01-01"] * n_o),
                "o_carrier_id": carrier,
                "o_ol_cnt": ol_cnt,
                "o_all_local": np.ones(n_o, dtype=np.int32),
            },
            {
                "o_w_id": DataType.INT, "o_d_id": DataType.INT,
                "o_id": DataType.INT, "o_c_id": DataType.INT,
                "o_entry_d": DataType.DATE, "o_carrier_id": DataType.INT,
                "o_ol_cnt": DataType.INT, "o_all_local": DataType.INT,
            },
        )

        n_ol = int(ol_cnt.sum())
        ol_order_idx = np.repeat(np.arange(n_o), ol_cnt)
        starts = np.concatenate([[0], np.cumsum(ol_cnt)[:-1]])
        ol_number = (np.arange(n_ol) - np.repeat(starts, ol_cnt) + 1).astype(np.int32)
        ol_delivered = ~is_new[ol_order_idx]
        order_line = Table.from_numpy(
            {
                "ol_w_id": o_w[ol_order_idx],
                "ol_d_id": o_d[ol_order_idx],
                "ol_o_id": o_id[ol_order_idx],
                "ol_number": ol_number,
                "ol_i_id": rng.integers(1, self.n_items + 1, size=n_ol).astype(np.int32),
                "ol_supply_w_id": o_w[ol_order_idx],
                "ol_delivery_d": np.where(ol_delivered, "2026-01-01", "1970-01-01"),
                "ol_quantity": np.full(n_ol, 5, dtype=np.int32),
                "ol_amount": np.where(
                    ol_delivered, 0.0,
                    _money(rng.integers(1, 999999, size=n_ol)),
                ),
                "ol_dist_info": _texts(rng, n_ol, 1),
            },
            {
                "ol_w_id": DataType.INT, "ol_d_id": DataType.INT,
                "ol_o_id": DataType.INT, "ol_number": DataType.INT,
                "ol_i_id": DataType.INT, "ol_supply_w_id": DataType.INT,
                "ol_delivery_d": DataType.DATE, "ol_quantity": DataType.INT,
                "ol_amount": DataType.DOUBLE, "ol_dist_info": DataType.STRING,
            },
        )

        new_mask = is_new
        new_order = Table.from_numpy(
            {
                "no_w_id": o_w[new_mask],
                "no_d_id": o_d[new_mask],
                "no_o_id": o_id[new_mask],
            },
            {
                "no_w_id": DataType.INT, "no_d_id": DataType.INT,
                "no_o_id": DataType.INT,
            },
        )
        return orders, order_line, new_order
