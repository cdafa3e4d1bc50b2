"""Star Schema Benchmark table generator (vectorized numpy, from the SSB
paper's population rules; ref: benchmarklib/ssb/ssb_table_generator.cpp
wrapping third_party/ssb-dbgen — no dbgen code used).

Tables: lineorder (fact), customer, supplier, part, date (dims).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from hyrise_tpu.benchmark.tpch.generator import (
    COLORS,
    NATIONS,
    REGIONS,
    SEGMENTS,
    SHIP_MODE,
    PRIORITIES,
    _money,
    _texts,
)
from hyrise_tpu.storage.table import Table, TableKeyConstraint
from hyrise_tpu.types import DataType
from hyrise_tpu.utils.dates import days_to_ymd, single_date_to_days

START = single_date_to_days("1992-01-01")
END = single_date_to_days("1998-08-02")

_CITY_SUFFIX = [f"{i}" for i in range(10)]


def _cities(nations: np.ndarray) -> np.ndarray:
    # SSB: city = first 9 chars of nation + digit 0-9
    names = np.array([n for n, _ in NATIONS])
    base = names[nations]
    digit = np.char.mod("%d", np.arange(len(nations)) % 10)
    return np.char.add(np.char.ljust(base.astype("U9"), 9), digit)


class SSBTableGenerator:
    def __init__(self, scale_factor: float = 1.0, seed: int = 42):
        self.sf = scale_factor
        self.rng = np.random.default_rng(seed)

    @property
    def n_customer(self):
        return max(int(30_000 * self.sf), 1)

    @property
    def n_supplier(self):
        return max(int(2_000 * self.sf), 1)

    @property
    def n_part(self):
        return max(int(200_000 * (1 + np.log2(max(self.sf, 1)))) if self.sf >= 1
                   else int(200_000 * self.sf), 1)

    @property
    def n_lineorder(self):
        return max(int(6_000_000 * self.sf), 1)

    def generate(self) -> Dict[str, Table]:
        tables = {
            "date": self._date_dim(),
            "customer": self._customer(),
            "supplier": self._supplier(),
            "part": self._part(),
        }
        tables["lineorder"] = self._lineorder()
        for name, t in tables.items():
            pk = {
                "date": ("d_datekey",), "customer": ("c_custkey",),
                "supplier": ("s_suppkey",), "part": ("p_partkey",),
                "lineorder": ("lo_orderkey", "lo_linenumber"),
            }[name]
            t.key_constraints.append(TableKeyConstraint(pk, True))
            # generation order is PK order (order_of_line is sorted) —
            # record physical sortedness for sort-skipping consumers
            from hyrise_tpu.types import SortMode

            t.sorted_by = [(c, SortMode.ASC_NULLS_LAST) for c in pk]
        return tables

    def generate_into(self, storage_manager) -> Dict[str, Table]:
        from contextlib import nullcontext

        from hyrise_tpu.storage.column import bulk_encode
        from hyrise_tpu.storage.storage_manager import packed_encoding_enabled

        # pack host-side during generation (one upload per column, already
        # encoded) instead of re-pulling device columns in add_table
        with bulk_encode() if packed_encoding_enabled() else nullcontext():
            tables = self.generate()
        for name, t in tables.items():
            if storage_manager.has_table(name):
                storage_manager.drop_table(name)
            storage_manager.add_table(name, t, encode=True)
        return tables

    # ------------------------------------------------------------- tables

    def _date_dim(self) -> Table:
        days = np.arange(START, END + 1, dtype=np.int64)
        y, m, d = days_to_ymd(days)
        datekey = y * 10000 + m * 100 + d
        months = np.array(
            ["January", "February", "March", "April", "May", "June", "July",
             "August", "September", "October", "November", "December"]
        )
        weekday = (days + 4) % 7  # 1970-01-01 was a Thursday
        daynames = np.array(
            ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday",
             "Friday", "Saturday"]
        )
        return Table.from_numpy(
            {
                "d_datekey": datekey.astype(np.int32),
                "d_date": np.char.add(
                    np.char.add(months[m - 1], " "),
                    np.char.add(np.char.mod("%d, ", d), np.char.mod("%d", y)),
                ),
                "d_dayofweek": daynames[(weekday + 1) % 7],
                "d_month": months[m - 1],
                "d_year": y.astype(np.int32),
                "d_yearmonthnum": (y * 100 + m).astype(np.int32),
                "d_yearmonth": np.char.add(
                    np.char.ljust(months[m - 1].astype("U3"), 3),
                    np.char.mod("%d", y),
                ),
                "d_daynuminweek": (weekday + 1).astype(np.int32),
                "d_daynuminmonth": d.astype(np.int32),
                "d_daynuminyear": (
                    days - np.array(
                        [single_date_to_days(f"{yy}-01-01") for yy in y]
                    ) + 1
                ).astype(np.int32),
                "d_monthnuminyear": m.astype(np.int32),
                "d_weeknuminyear": (
                    (days - np.array(
                        [single_date_to_days(f"{yy}-01-01") for yy in y]
                    )) // 7 + 1
                ).astype(np.int32),
                "d_sellingseason": np.where(
                    m <= 2, "Winter", np.where(m <= 5, "Spring",
                                               np.where(m <= 8, "Summer", "Fall"))
                ),
                "d_lastdayinweekfl": (weekday == 6).astype(np.int32),
                "d_lastdayinmonthfl": np.concatenate(
                    [(m[1:] != m[:-1]), [True]]
                ).astype(np.int32),
                "d_holidayfl": ((m == 12) & (d == 25)).astype(np.int32),
                "d_weekdayfl": (weekday < 5).astype(np.int32),
            },
            {
                "d_datekey": DataType.INT, "d_date": DataType.STRING,
                "d_dayofweek": DataType.STRING, "d_month": DataType.STRING,
                "d_year": DataType.INT, "d_yearmonthnum": DataType.INT,
                "d_yearmonth": DataType.STRING,
                "d_daynuminweek": DataType.INT,
                "d_daynuminmonth": DataType.INT,
                "d_daynuminyear": DataType.INT,
                "d_monthnuminyear": DataType.INT,
                "d_weeknuminyear": DataType.INT,
                "d_sellingseason": DataType.STRING,
                "d_lastdayinweekfl": DataType.INT,
                "d_lastdayinmonthfl": DataType.INT,
                "d_holidayfl": DataType.INT,
                "d_weekdayfl": DataType.INT,
            },
        )

    def _customer(self) -> Table:
        rng = self.rng
        n = self.n_customer
        keys = np.arange(1, n + 1, dtype=np.int32)
        nat = rng.integers(0, 25, size=n)
        regions = np.array(REGIONS)
        nat_region = np.array([r for _, r in NATIONS])
        return Table.from_numpy(
            {
                "c_custkey": keys,
                "c_name": np.array([f"Customer#{k:09d}" for k in keys], dtype=object),
                "c_address": _texts(rng, n, 3),
                "c_city": _cities(nat),
                "c_nation": np.array([NATIONS[i][0] for i in nat]),
                "c_region": regions[nat_region[nat]],
                "c_phone": np.array(
                    [f"{10+i}-{rng.integers(100,999)}-{rng.integers(100,999)}"
                     for i in nat], dtype=object,
                ),
                "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, size=n)],
            },
            {
                "c_custkey": DataType.INT, "c_name": DataType.STRING,
                "c_address": DataType.STRING, "c_city": DataType.STRING,
                "c_nation": DataType.STRING, "c_region": DataType.STRING,
                "c_phone": DataType.STRING, "c_mktsegment": DataType.STRING,
            },
        )

    def _supplier(self) -> Table:
        rng = self.rng
        n = self.n_supplier
        keys = np.arange(1, n + 1, dtype=np.int32)
        nat = rng.integers(0, 25, size=n)
        regions = np.array(REGIONS)
        nat_region = np.array([r for _, r in NATIONS])
        return Table.from_numpy(
            {
                "s_suppkey": keys,
                "s_name": np.array([f"Supplier#{k:09d}" for k in keys], dtype=object),
                "s_address": _texts(rng, n, 3),
                "s_city": _cities(nat),
                "s_nation": np.array([NATIONS[i][0] for i in nat]),
                "s_region": regions[nat_region[nat]],
                "s_phone": np.array(
                    [f"{10+i}-{rng.integers(100,999)}-{rng.integers(100,999)}"
                     for i in nat], dtype=object,
                ),
            },
            {
                "s_suppkey": DataType.INT, "s_name": DataType.STRING,
                "s_address": DataType.STRING, "s_city": DataType.STRING,
                "s_nation": DataType.STRING, "s_region": DataType.STRING,
                "s_phone": DataType.STRING,
            },
        )

    def _part(self) -> Table:
        rng = self.rng
        n = self.n_part
        keys = np.arange(1, n + 1, dtype=np.int32)
        colors = np.array(COLORS)
        mfgr_num = rng.integers(1, 6, size=n)
        cat_num = rng.integers(1, 6, size=n)
        brand_num = rng.integers(1, 41, size=n)
        return Table.from_numpy(
            {
                "p_partkey": keys,
                "p_name": np.array(
                    [" ".join(colors[rng.integers(0, len(COLORS), 2)]) for _ in keys],
                    dtype=object,
                ),
                "p_mfgr": np.array([f"MFGR#{x}" for x in mfgr_num], dtype=object),
                "p_category": np.array(
                    [f"MFGR#{a}{b}" for a, b in zip(mfgr_num, cat_num)], dtype=object
                ),
                "p_brand1": np.array(
                    [f"MFGR#{a}{b}{c}" for a, b, c in
                     zip(mfgr_num, cat_num, brand_num)], dtype=object
                ),
                "p_color": colors[rng.integers(0, len(COLORS), size=n)],
                "p_type": _texts(rng, n, 2),
                "p_size": rng.integers(1, 51, size=n).astype(np.int32),
                "p_container": _texts(rng, n, 1),
            },
            {
                "p_partkey": DataType.INT, "p_name": DataType.STRING,
                "p_mfgr": DataType.STRING, "p_category": DataType.STRING,
                "p_brand1": DataType.STRING, "p_color": DataType.STRING,
                "p_type": DataType.STRING, "p_size": DataType.INT,
                "p_container": DataType.STRING,
            },
        )

    def _lineorder(self) -> Table:
        rng = self.rng
        n = self.n_lineorder
        n_orders = max(n // 4, 1)
        order_of_line = rng.integers(0, n_orders, size=n)
        order_of_line.sort()
        linenumber = np.ones(n, dtype=np.int64)
        # line numbers within order
        change = np.concatenate([[True], order_of_line[1:] != order_of_line[:-1]])
        idx_in_order = np.arange(n) - np.maximum.accumulate(
            np.where(change, np.arange(n), 0)
        )
        linenumber = (idx_in_order + 1).astype(np.int32)
        orderkey = (order_of_line + 1).astype(np.int32)
        days = rng.integers(START, END - 150, size=n)
        y, m, d = days_to_ymd(days)
        datekey = (y * 10000 + m * 100 + d).astype(np.int32)
        quantity = rng.integers(1, 51, size=n).astype(np.int32)
        extprice = _money(rng.integers(90001, 1100000, size=n))
        discount = rng.integers(0, 11, size=n).astype(np.int32)
        revenue = np.round(extprice * (100 - discount)) / 100 * 100
        revenue = np.round(extprice * (100 - discount) / 100 * 100) / 100
        supplycost = _money(rng.integers(1000, 100000, size=n))
        commit_days = days + rng.integers(30, 91, size=n)
        cy, cm, cd = days_to_ymd(commit_days)
        return Table.from_numpy(
            {
                "lo_orderkey": orderkey,
                "lo_linenumber": linenumber,
                "lo_custkey": rng.integers(1, self.n_customer + 1, size=n).astype(np.int32),
                "lo_partkey": rng.integers(1, self.n_part + 1, size=n).astype(np.int32),
                "lo_suppkey": rng.integers(1, self.n_supplier + 1, size=n).astype(np.int32),
                "lo_orderdate": datekey,
                "lo_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, size=n)],
                "lo_shippriority": np.zeros(n, dtype=np.int32),
                "lo_quantity": quantity,
                "lo_extendedprice": extprice,
                "lo_ordtotalprice": extprice,
                "lo_discount": discount,
                "lo_revenue": revenue,
                "lo_supplycost": supplycost,
                "lo_tax": rng.integers(0, 9, size=n).astype(np.int32),
                "lo_commitdate": (cy * 10000 + cm * 100 + cd).astype(np.int32),
                "lo_shipmode": np.array(SHIP_MODE)[rng.integers(0, 7, size=n)],
            },
            {
                "lo_orderkey": DataType.INT, "lo_linenumber": DataType.INT,
                "lo_custkey": DataType.INT, "lo_partkey": DataType.INT,
                "lo_suppkey": DataType.INT, "lo_orderdate": DataType.INT,
                "lo_orderpriority": DataType.STRING,
                "lo_shippriority": DataType.INT,
                "lo_quantity": DataType.INT,
                "lo_extendedprice": DataType.DOUBLE,
                "lo_ordtotalprice": DataType.DOUBLE,
                "lo_discount": DataType.INT,
                "lo_revenue": DataType.DOUBLE,
                "lo_supplycost": DataType.DOUBLE,
                "lo_tax": DataType.INT,
                "lo_commitdate": DataType.INT,
                "lo_shipmode": DataType.STRING,
            },
        )
