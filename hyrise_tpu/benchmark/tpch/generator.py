"""TPC-H table generator — vectorized numpy implementation of the TPC-H
v3 specification's population rules (clause 4.2).  A from-scratch
replacement for the reference's vendored dbgen
(ref: benchmarklib/tpch/tpch_table_generator.cpp wrapping
third_party/tpch-dbgen); no dbgen code is used.

Deterministic per (scale factor, seed).  Text columns reproduce the
spec's value lists and the pattern words the TPC-H queries filter on
(colors in p_name, 'special…requests' in o_comment, 'Customer…Complaints'
in ps/s_comment) with spec-calibrated frequencies so query selectivities
are realistic.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from hyrise_tpu.storage.table import (
    ForeignKeyConstraint,
    Table,
    TableKeyConstraint,
)
from hyrise_tpu.types import DataType, SortMode
from hyrise_tpu.utils.dates import single_date_to_days

# ---- spec value lists (TPC-H v3 clause 4.2.2.13) -------------------------

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

NATIONS = [
    ("ALGERIA", 0), ("ARGENTINA", 1), ("BRAZIL", 1), ("CANADA", 1),
    ("EGYPT", 4), ("ETHIOPIA", 0), ("FRANCE", 3), ("GERMANY", 3),
    ("INDIA", 2), ("INDONESIA", 2), ("IRAN", 4), ("IRAQ", 4),
    ("JAPAN", 2), ("JORDAN", 4), ("KENYA", 0), ("MOROCCO", 0),
    ("MOZAMBIQUE", 0), ("PERU", 1), ("CHINA", 2), ("ROMANIA", 3),
    ("SAUDI ARABIA", 4), ("VIETNAM", 2), ("RUSSIA", 3),
    ("UNITED KINGDOM", 3), ("UNITED STATES", 1),
]

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
SHIP_INSTRUCT = ["DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN"]
SHIP_MODE = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]

COLORS = (
    "almond antique aquamarine azure beige bisque black blanched blue blush "
    "brown burlywood burnished chartreuse chiffon chocolate coral cornflower "
    "cornsilk cream cyan dark deep dim dodger drab firebrick floral forest "
    "frosted gainsboro ghost goldenrod green grey honeydew hot indian ivory "
    "khaki lace lavender lawn lemon light lime linen magenta maroon medium "
    "metallic midnight mint misty moccasin navajo navy olive orange orchid "
    "pale papaya peach peru pink plum powder puff purple red rose rosy royal "
    "saddle salmon sandy seashell sienna sky slate smoke snow spring steel "
    "tan thistle tomato turquoise violet wheat white yellow"
).split()

TYPE_SYL1 = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
TYPE_SYL2 = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
TYPE_SYL3 = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
CONTAINER_SYL1 = ["SM", "LG", "MED", "JUMBO", "WRAP"]
CONTAINER_SYL2 = ["CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN", "DRUM"]

# noise words for comment text (selectivity-neutral filler)
_WORDS = (
    "furiously carefully slyly quickly blithely deposits requests accounts "
    "packages theodolites pinto beans foxes ideas dependencies instructions "
    "excuses platelets asymptotes courts dolphins multipliers sauternes "
    "warhorses frets dinos attainments somas sheaves braids hockey players "
    "frays warthogs epitaphs grouches gifts waters orbits sentiments "
).split()

START_DATE = single_date_to_days("1992-01-01")
CURRENT_DATE = single_date_to_days("1995-06-17")
END_DATE = single_date_to_days("1998-12-31")


def _money(cents: np.ndarray) -> np.ndarray:
    return np.round(cents.astype(np.float64)) / 100.0


_TEXT_POOL = 1 << 16


def _texts(rng: np.random.Generator, n: int, n_words: int) -> np.ndarray:
    """Cheap filler comments: n_words random words each.  Above the pool
    size, rows sample from a pool of distinct comments — sorted-dictionary
    encoding of millions of UNIQUE free-text values is pathological (and
    the TPC-H queries never distinguish individual comments; pattern
    frequencies are injected per-row afterwards)."""
    w = np.array(_WORDS)

    def gen(k: int) -> np.ndarray:
        out = w[rng.integers(0, len(_WORDS), size=k)]
        for _ in range(n_words - 1):
            out = np.char.add(
                np.char.add(out, " "), w[rng.integers(0, len(_WORDS), size=k)]
            )
        return out

    if n <= _TEXT_POOL:
        return gen(n)
    pool = gen(_TEXT_POOL)
    return pool[rng.integers(0, _TEXT_POOL, size=n)]


def _inject(rng, comments: np.ndarray, count: int, pattern_words) -> None:
    """Inject spec text patterns into `count` randomly chosen comments."""
    if count <= 0 or len(comments) == 0:
        return
    pos = rng.choice(len(comments), size=min(count, len(comments)), replace=False)
    for p in pos:
        mid = " ".join(rng.choice(_WORDS, size=2))
        comments[p] = f"{pattern_words[0]} {mid} {pattern_words[1]} " + comments[p]


class TPCHTableGenerator:
    """Generate all 8 TPC-H tables at a scale factor (ref entry point:
    tpch_table_generator.cpp:generate)."""

    def __init__(self, scale_factor: float = 1.0, seed: int = 19920101,
                 skewed: bool = False, keep_host: bool = False):
        """skewed=True generates the JCC-H-style skew variant (ref:
        benchmarklib/tpch `-j` flag wrapping third_party/jcch-dbgen): hot
        customers/parts/suppliers receive zipf-distributed traffic, the
        stress case for distributed shuffles.

        keep_host=True additionally retains the raw numpy column dicts in
        `self.host_tables[name] = (data, types)`.  Differential baselines
        (sqlite) must load from THIS, not from device tables: the TPU
        emulates f64 with ~48-bit mantissas, so a device round-trip
        perturbs values like 0.07 past their exact-f64 literals and
        silently shifts predicate boundaries in the oracle."""
        self.sf = scale_factor
        self.skewed = skewed
        self.keep_host = keep_host
        self.rng = np.random.default_rng(seed)
        self.host_tables: Dict[str, tuple] = {}
        self._host_by_id: Dict[int, tuple] = {}

    def _make(self, data, types) -> Table:
        t = Table.from_numpy(data, types)
        if self.keep_host:
            self._host_by_id[id(t)] = (data, types)
        return t

    def _skewed_keys(self, n_keys: int, size: int) -> np.ndarray:
        """Zipf-skewed foreign keys over [1, n_keys]."""
        ranks = self.rng.zipf(1.5, size=size)
        ranks = np.minimum(ranks, n_keys)
        # map rank r -> a stable pseudo-random key so hot keys spread
        keys = (ranks * 2654435761) % n_keys + 1
        return keys.astype(np.int64)

    # ----------------------------------------------------------------- sizes

    @property
    def n_part(self) -> int:
        return max(int(200_000 * self.sf), 1)

    @property
    def n_supplier(self) -> int:
        return max(int(10_000 * self.sf), 1)

    @property
    def n_customer(self) -> int:
        return max(int(150_000 * self.sf), 1)

    @property
    def n_orders(self) -> int:
        return self.n_customer * 10

    # ------------------------------------------------------------ generation

    def generate(self) -> Dict[str, Table]:
        rng = self.rng
        tables: Dict[str, Table] = {}
        tables["region"] = self._region()
        tables["nation"] = self._nation()
        tables["supplier"] = self._supplier()
        tables["part"] = self._part()
        tables["partsupp"] = self._partsupp()
        tables["customer"] = self._customer()
        orders, lineitem = self._orders_lineitem()
        tables["orders"] = orders
        tables["lineitem"] = lineitem
        _add_constraints(tables)
        if self.keep_host:
            self.host_tables = {
                name: self._host_by_id[id(t)] for name, t in tables.items()
            }
            self._host_by_id.clear()
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

    # ------------------------------------------------------------- per table

    def _region(self) -> Table:
        n = len(REGIONS)
        return self._make(
            {
                "r_regionkey": np.arange(n, dtype=np.int32),
                "r_name": np.array(REGIONS),
                "r_comment": _texts(self.rng, n, 8),
            },
            {"r_regionkey": DataType.INT, "r_name": DataType.STRING,
             "r_comment": DataType.STRING},
        )

    def _nation(self) -> Table:
        n = len(NATIONS)
        return self._make(
            {
                "n_nationkey": np.arange(n, dtype=np.int32),
                "n_name": np.array([x for x, _ in NATIONS]),
                "n_regionkey": np.array([r for _, r in NATIONS], dtype=np.int32),
                "n_comment": _texts(self.rng, n, 8),
            },
            {"n_nationkey": DataType.INT, "n_name": DataType.STRING,
             "n_regionkey": DataType.INT, "n_comment": DataType.STRING},
        )

    def _supplier(self) -> Table:
        rng = self.rng
        n = self.n_supplier
        keys = np.arange(1, n + 1, dtype=np.int32)
        comments = _texts(rng, n, 6)
        # spec 4.2.3: SF*5 rows 'Customer Complaints', SF*5 'Customer
        # Recommends'
        n_pat = max(int(5 * self.sf), 1 if n >= 20 else 0)
        _inject(rng, comments, n_pat, ("Customer", "Complaints"))
        _inject(rng, comments, n_pat, ("Customer", "Recommends"))
        nat = rng.integers(0, 25, size=n).astype(np.int32)
        return self._make(
            {
                "s_suppkey": keys,
                "s_name": np.char.add("Supplier#", np.char.zfill(keys.astype(str), 9)),
                "s_address": _texts(rng, n, 3),
                "s_nationkey": nat,
                "s_phone": _phones(nat),
                "s_acctbal": _money(rng.integers(-99999, 999999, size=n)),
                "s_comment": comments,
            },
            {
                "s_suppkey": DataType.INT, "s_name": DataType.STRING,
                "s_address": DataType.STRING, "s_nationkey": DataType.INT,
                "s_phone": DataType.STRING, "s_acctbal": DataType.DOUBLE,
                "s_comment": DataType.STRING,
            },
        )

    def _part(self) -> Table:
        rng = self.rng
        n = self.n_part
        keys = np.arange(1, n + 1, dtype=np.int32)
        colors = np.array(COLORS)
        names = colors[rng.integers(0, len(COLORS), size=n)]
        for _ in range(4):
            names = np.char.add(
                np.char.add(names, " "),
                colors[rng.integers(0, len(COLORS), size=n)],
            )
        mfgr = rng.integers(1, 6, size=n)
        brand = mfgr * 10 + rng.integers(1, 6, size=n)
        s1 = np.array(TYPE_SYL1)[rng.integers(0, 6, size=n)]
        s2 = np.array(TYPE_SYL2)[rng.integers(0, 5, size=n)]
        s3 = np.array(TYPE_SYL3)[rng.integers(0, 5, size=n)]
        types = np.char.add(np.char.add(np.char.add(np.char.add(s1, " "), s2), " "), s3)
        containers = np.char.add(
            np.char.add(np.array(CONTAINER_SYL1)[rng.integers(0, 5, size=n)], " "),
            np.array(CONTAINER_SYL2)[rng.integers(0, 8, size=n)],
        )
        retail = (
            90000 + (keys.astype(np.int64) // 10) % 20001 + 100 * (keys % 1000)
        )
        return self._make(
            {
                "p_partkey": keys,
                "p_name": names,
                "p_mfgr": np.array([f"Manufacturer#{m}" for m in mfgr], dtype=object),
                "p_brand": np.array([f"Brand#{b}" for b in brand], dtype=object),
                "p_type": types,
                "p_size": rng.integers(1, 51, size=n).astype(np.int32),
                "p_container": containers,
                "p_retailprice": _money(retail),
                "p_comment": _texts(rng, n, 4),
            },
            {
                "p_partkey": DataType.INT, "p_name": DataType.STRING,
                "p_mfgr": DataType.STRING, "p_brand": DataType.STRING,
                "p_type": DataType.STRING, "p_size": DataType.INT,
                "p_container": DataType.STRING,
                "p_retailprice": DataType.DOUBLE, "p_comment": DataType.STRING,
            },
        )

    def _partsupp(self) -> Table:
        rng = self.rng
        n_part = self.n_part
        n_supp = self.n_supplier
        partkeys = np.repeat(np.arange(1, n_part + 1, dtype=np.int32), 4)
        # spec 4.2.3 supplier spread: s = (p + i*(S/4 + floor((p-1)/S))) % S + 1
        i = np.tile(np.arange(4, dtype=np.int64), n_part)
        p = partkeys.astype(np.int64)
        suppkeys = (
            (p + i * (n_supp // 4 + (p - 1) // n_supp)) % n_supp + 1
        ).astype(np.int32)
        n = len(partkeys)
        return self._make(
            {
                "ps_partkey": partkeys,
                "ps_suppkey": suppkeys,
                "ps_availqty": rng.integers(1, 10000, size=n).astype(np.int32),
                "ps_supplycost": _money(rng.integers(100, 100001, size=n)),
                "ps_comment": _texts(rng, n, 10),
            },
            {
                "ps_partkey": DataType.INT, "ps_suppkey": DataType.INT,
                "ps_availqty": DataType.INT,
                "ps_supplycost": DataType.DOUBLE, "ps_comment": DataType.STRING,
            },
        )

    def _customer(self) -> Table:
        rng = self.rng
        n = self.n_customer
        keys = np.arange(1, n + 1, dtype=np.int32)
        nat = rng.integers(0, 25, size=n).astype(np.int32)
        return self._make(
            {
                "c_custkey": keys,
                "c_name": np.char.add("Customer#", np.char.zfill(keys.astype(str), 9)),
                "c_address": _texts(rng, n, 3),
                "c_nationkey": nat,
                "c_phone": _phones(nat),
                "c_acctbal": _money(rng.integers(-99999, 999999, size=n)),
                "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, size=n)],
                "c_comment": _texts(rng, n, 8),
            },
            {
                "c_custkey": DataType.INT, "c_name": DataType.STRING,
                "c_address": DataType.STRING, "c_nationkey": DataType.INT,
                "c_phone": DataType.STRING, "c_acctbal": DataType.DOUBLE,
                "c_mktsegment": DataType.STRING, "c_comment": DataType.STRING,
            },
        )

    def _orders_lineitem(self):
        rng = self.rng
        n_orders = self.n_orders
        n_cust = self.n_customer
        # spec: orderkeys are sparse (8 of each 32); custkeys never %3==0
        ok_base = np.arange(n_orders, dtype=np.int64)
        # int32 up to SF ~350 — keeps orderkey joins 2-key-packable
        ok_dtype = np.int32 if n_orders * 4 + 32 < 2**31 else np.int64
        orderkeys = ((ok_base // 8) * 32 + ok_base % 8 + 1).astype(ok_dtype)
        if self.skewed:
            cust = self._skewed_keys(n_cust, n_orders)
        else:
            cust = rng.integers(1, n_cust + 1, size=n_orders).astype(np.int64)
        cust = np.where(cust % 3 == 0, (cust % (n_cust - 1)) + 1, cust)
        cust = np.where(cust % 3 == 0, cust + 1, cust)
        cust = np.where(cust > n_cust, 1, cust).astype(np.int32)
        odate = rng.integers(
            START_DATE, END_DATE - 151 + 1, size=n_orders
        ).astype(np.int32)

        n_items = rng.integers(1, 8, size=n_orders)
        total_items = int(n_items.sum())
        li_order_idx = np.repeat(np.arange(n_orders), n_items)
        linenumber = (
            np.arange(total_items) - np.repeat(
                np.concatenate([[0], np.cumsum(n_items)[:-1]]), n_items
            ) + 1
        ).astype(np.int32)

        li_orderkey = orderkeys[li_order_idx]
        li_odate = odate[li_order_idx]
        n_li = total_items
        if self.skewed:
            partkey = self._skewed_keys(self.n_part, n_li).astype(np.int32)
        else:
            partkey = rng.integers(1, self.n_part + 1, size=n_li).astype(np.int32)
        # supplier chosen among the part's 4 suppliers (spec formula, i in 0..3)
        i4 = rng.integers(0, 4, size=n_li)
        p64 = partkey.astype(np.int64)
        ns = self.n_supplier
        suppkey = (
            (p64 + i4 * (ns // 4 + (p64 - 1) // ns)) % ns + 1
        ).astype(np.int32)
        quantity = rng.integers(1, 51, size=n_li).astype(np.float64)
        # extendedprice = quantity * part retail price
        retail = (
            90000 + (p64 // 10) % 20001 + 100 * (p64 % 1000)
        ).astype(np.float64) / 100.0
        extprice = np.round(quantity * retail * 100) / 100
        discount = rng.integers(0, 11, size=n_li).astype(np.float64) / 100.0
        tax = rng.integers(0, 9, size=n_li).astype(np.float64) / 100.0
        shipdate = li_odate + rng.integers(1, 122, size=n_li)
        commitdate = li_odate + rng.integers(30, 91, size=n_li)
        receiptdate = shipdate + rng.integers(1, 31, size=n_li)
        returnflag = np.where(
            receiptdate <= CURRENT_DATE,
            np.where(rng.random(n_li) < 0.5, "R", "A"),
            "N",
        )
        linestatus = np.where(shipdate > CURRENT_DATE, "O", "F")

        li_comments = _texts(rng, n_li, 4)

        # order status from its items
        any_o = np.zeros(n_orders, dtype=bool)
        any_f = np.zeros(n_orders, dtype=bool)
        np.logical_or.at(any_o, li_order_idx, linestatus == "O")
        np.logical_or.at(any_f, li_order_idx, linestatus == "F")
        orderstatus = np.where(any_o & any_f, "P", np.where(any_o, "O", "F"))

        # totalprice = sum(extprice*(1+tax)*(1-discount)) per order
        item_total = extprice * (1 + tax) * (1 - discount)
        totalprice = np.zeros(n_orders, dtype=np.float64)
        np.add.at(totalprice, li_order_idx, item_total)
        totalprice = np.round(totalprice * 100) / 100

        o_comments = _texts(rng, n_orders, 6)
        # Q13 pattern: 'special ... requests' — spec text grammar yields
        # roughly 1% of orders containing the pattern
        _inject(rng, o_comments, int(0.01 * n_orders), ("special", "requests"))
        clerks = np.char.add(
            "Clerk#",
            np.char.zfill(
                rng.integers(1, max(int(1000 * self.sf), 2),
                             size=n_orders).astype(str), 9
            ),
        )

        orders = self._make(
            {
                "o_orderkey": orderkeys,
                "o_custkey": cust,
                "o_orderstatus": orderstatus,
                "o_totalprice": totalprice,
                "o_orderdate": odate,
                "o_orderpriority": np.array(PRIORITIES)[
                    rng.integers(0, 5, size=n_orders)
                ],
                "o_clerk": clerks,
                "o_shippriority": np.zeros(n_orders, dtype=np.int32),
                "o_comment": o_comments,
            },
            {
                "o_orderkey": DataType.INT if ok_dtype == np.int32 else DataType.LONG,
                "o_custkey": DataType.INT,
                "o_orderstatus": DataType.STRING,
                "o_totalprice": DataType.DOUBLE, "o_orderdate": DataType.DATE,
                "o_orderpriority": DataType.STRING, "o_clerk": DataType.STRING,
                "o_shippriority": DataType.INT, "o_comment": DataType.STRING,
            },
        )
        lineitem = self._make(
            {
                "l_orderkey": li_orderkey,
                "l_partkey": partkey,
                "l_suppkey": suppkey,
                "l_linenumber": linenumber,
                "l_quantity": quantity,
                "l_extendedprice": extprice,
                "l_discount": discount,
                "l_tax": tax,
                "l_returnflag": returnflag,
                "l_linestatus": linestatus,
                "l_shipdate": shipdate.astype(np.int32),
                "l_commitdate": commitdate.astype(np.int32),
                "l_receiptdate": receiptdate.astype(np.int32),
                "l_shipinstruct": np.array(SHIP_INSTRUCT)[
                    rng.integers(0, 4, size=n_li)
                ],
                "l_shipmode": np.array(SHIP_MODE)[rng.integers(0, 7, size=n_li)],
                "l_comment": li_comments,
            },
            {
                "l_orderkey": DataType.INT if ok_dtype == np.int32 else DataType.LONG,
                "l_partkey": DataType.INT,
                "l_suppkey": DataType.INT, "l_linenumber": DataType.INT,
                "l_quantity": DataType.DOUBLE,
                "l_extendedprice": DataType.DOUBLE,
                "l_discount": DataType.DOUBLE, "l_tax": DataType.DOUBLE,
                "l_returnflag": DataType.STRING,
                "l_linestatus": DataType.STRING,
                "l_shipdate": DataType.DATE, "l_commitdate": DataType.DATE,
                "l_receiptdate": DataType.DATE,
                "l_shipinstruct": DataType.STRING,
                "l_shipmode": DataType.STRING, "l_comment": DataType.STRING,
            },
        )
        return orders, lineitem


def _phones(nationkeys: np.ndarray) -> np.ndarray:
    """spec: country code = nationkey + 10, then 3 random 3-4 digit groups."""
    rng = np.random.default_rng(421)
    n = len(nationkeys)
    a = rng.integers(100, 1000, size=n).astype(str)
    b = rng.integers(100, 1000, size=n).astype(str)
    c = rng.integers(1000, 10000, size=n).astype(str)
    cc = (nationkeys + 10).astype(str)
    out = np.char.add(cc, "-")
    out = np.char.add(np.char.add(out, a), "-")
    out = np.char.add(np.char.add(out, b), "-")
    return np.char.add(out, c)


def _add_constraints(tables: Dict[str, Table]) -> None:
    """Soft PK/FK constraints (ref: abstract_table_generator.cpp adds key
    constraints + indexes after generation)."""
    pk = {
        "region": ("r_regionkey",),
        "nation": ("n_nationkey",),
        "supplier": ("s_suppkey",),
        "part": ("p_partkey",),
        "partsupp": ("ps_partkey", "ps_suppkey"),
        "customer": ("c_custkey",),
        "orders": ("o_orderkey",),
        "lineitem": ("l_orderkey", "l_linenumber"),
    }
    for name, cols in pk.items():
        tables[name].key_constraints.append(TableKeyConstraint(cols, True))
        # generation order IS primary-key order (dbgen emits rows keyed
        # ascending) — record physical sortedness so aggregates/joins can
        # skip their sort passes (chunk.hpp:156 individually_sorted_by)
        tables[name].sorted_by = [(c, SortMode.ASC_NULLS_LAST) for c in cols]
    fks = [
        ("nation", ("n_regionkey",), "region", ("r_regionkey",)),
        ("supplier", ("s_nationkey",), "nation", ("n_nationkey",)),
        ("customer", ("c_nationkey",), "nation", ("n_nationkey",)),
        ("partsupp", ("ps_partkey",), "part", ("p_partkey",)),
        ("partsupp", ("ps_suppkey",), "supplier", ("s_suppkey",)),
        ("orders", ("o_custkey",), "customer", ("c_custkey",)),
        ("lineitem", ("l_orderkey",), "orders", ("o_orderkey",)),
        ("lineitem", ("l_partkey", "l_suppkey"), "partsupp",
         ("ps_partkey", "ps_suppkey")),
    ]
    for tname, cols, rt, rcols in fks:
        tables[tname].foreign_key_constraints.append(
            ForeignKeyConstraint(cols, rt, rcols)
        )
