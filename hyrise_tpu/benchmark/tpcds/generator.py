"""TPC-DS table generator — the store-sales channel star schema
(vectorized numpy from the TPC-DS v3 spec's population rules; ref:
benchmarklib/tpcds/tpcds_table_generator.cpp wrapping
third_party/tpcds-kit — no dsdgen code used).

Covers all 23 tables the supported query set touches: the store,
catalog and web sales channels with their returns tables (returns sample
their originating sales so sale->return joins match), inventory, and the
full dimension set (date/time/item/store/promotion/customer/address/
demographics/income_band/warehouse/ship_mode/web_site/web_page/
call_center/reason).  `demo_density` scales the fixed-size demographics
cross products down for tests.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from hyrise_tpu.benchmark.tpch.generator import _money, _texts
from hyrise_tpu.storage.table import Table, TableKeyConstraint
from hyrise_tpu.types import DataType
from hyrise_tpu.utils.dates import days_to_ymd, single_date_to_days

D_START = single_date_to_days("1998-01-01")
D_END = single_date_to_days("2003-12-31")

_CATEGORIES = ["Books", "Home", "Electronics", "Jewelry", "Sports",
               "Men", "Women", "Music", "Children", "Shoes"]
_BRAND_BASE = ["amalg", "edu pack", "exporti", "importo", "scholar",
               "brand", "corp", "maxi", "univ", "nameless"]
_ED = ["Primary", "Secondary", "College", "2 yr Degree", "4 yr Degree",
       "Advanced Degree", "Unknown"]
_MS = ["M", "S", "D", "W", "U"]
_GENDER = ["M", "F"]
_CREDIT = ["Low Risk", "High Risk", "Good", "Unknown"]
_BUY = [">10000", "5001-10000", "1001-5000", "501-1000", "0-500"]


class TPCDSTableGenerator:
    def __init__(self, scale_factor: float = 1.0, seed: int = 20030101,
                 demo_density: float = None):
        self.sf = scale_factor
        self.rng = np.random.default_rng(seed)
        self.demo_density = (
            demo_density if demo_density is not None
            else min(1.0, max(scale_factor, 0.001))
        )

    @property
    def n_item(self):
        return max(int(18_000 * min(self.sf, 10) ** 0.5), 20)

    @property
    def n_customer(self):
        return max(int(100_000 * self.sf), 20)

    @property
    def n_store(self):
        return max(int(12 * max(self.sf, 1) ** 0.5), 2)

    @property
    def n_promo(self):
        return max(int(300 * max(self.sf, 1) ** 0.5), 5)

    @property
    def n_store_sales(self):
        return max(int(2_880_000 * self.sf), 100)

    def generate(self) -> Dict[str, Table]:
        tables = {
            "date_dim": self._date_dim(),
            "time_dim": self._time_dim(),
            "item": self._item(),
            "store": self._store(),
            "promotion": self._promotion(),
            "customer_address": self._customer_address(),
            "customer_demographics": self._customer_demographics(),
            "income_band": self._income_band(),
            "warehouse": self._warehouse(),
            "ship_mode": self._ship_mode(),
            "web_site": self._web_site(),
            "web_page": self._web_page(),
            "call_center": self._call_center(),
            "reason": self._reason(),
            "catalog_page": self._catalog_page(),
        }
        tables["household_demographics"] = self._household_demographics(tables)
        tables["customer"] = self._customer(tables)
        tables["store_sales"] = self._store_sales(tables)
        # catalog + web channels (ref: tpcds catalog_sales.dat /
        # web_sales.dat — same sale grain, channel-prefixed columns; spec
        # sizing: catalog ~= store/2, web ~= store/4)
        tables["catalog_sales"] = self._channel_sales(
            "cs", max(self.n_store_sales // 2, 10), tables,
            customer_col="cs_bill_customer_sk", addr_col="cs_bill_addr_sk",
        )
        tables["web_sales"] = self._channel_sales(
            "ws", max(self.n_store_sales // 4, 10), tables,
            customer_col="ws_bill_customer_sk", addr_col="ws_bill_addr_sk",
        )
        tables["store_returns"] = self._store_returns(tables)
        tables["catalog_returns"] = self._channel_returns(
            "cr", "cs", tables["catalog_sales"], tables)
        tables["web_returns"] = self._channel_returns(
            "wr", "ws", tables["web_sales"], tables)
        tables["inventory"] = self._inventory(tables)
        pk = {
            "date_dim": ("d_date_sk",), "time_dim": ("t_time_sk",),
            "item": ("i_item_sk",), "store": ("s_store_sk",),
            "promotion": ("p_promo_sk",), "customer": ("c_customer_sk",),
            "customer_address": ("ca_address_sk",),
            "customer_demographics": ("cd_demo_sk",),
            "household_demographics": ("hd_demo_sk",),
            "income_band": ("ib_income_band_sk",),
            "warehouse": ("w_warehouse_sk",),
            "ship_mode": ("sm_ship_mode_sk",),
            "web_site": ("web_site_sk",), "web_page": ("wp_web_page_sk",),
            "call_center": ("cc_call_center_sk",), "reason": ("r_reason_sk",),
            "catalog_page": ("cp_catalog_page_sk",),
        }
        for name, cols in pk.items():
            tables[name].key_constraints.append(TableKeyConstraint(cols, True))
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
        days = np.arange(D_START, D_END + 1, dtype=np.int64)
        y, m, d = days_to_ymd(days)
        sk = (days - D_START + 2450815).astype(np.int32)
        dow = ((days + 4) % 7).astype(np.int32)
        return Table.from_numpy(
            {
                "d_date_sk": sk,
                "d_date": days.astype(np.int32),
                "d_year": y.astype(np.int32),
                "d_moy": m.astype(np.int32),
                "d_dom": d.astype(np.int32),
                "d_qoy": ((m - 1) // 3 + 1).astype(np.int32),
                "d_day_name": np.array(
                    ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday",
                     "Friday", "Saturday"]
                )[(dow + 1) % 7],
                "d_dow": dow,
                "d_month_seq": ((y - 1998) * 12 + m - 1).astype(np.int32),
                "d_week_seq": ((days - D_START) // 7 + 1).astype(np.int32),
                "d_quarter_name": np.char.add(
                    np.char.add(y.astype(str), "Q"),
                    ((m - 1) // 3 + 1).astype(str),
                ),
            },
            {
                "d_date_sk": DataType.INT, "d_date": DataType.DATE,
                "d_year": DataType.INT, "d_moy": DataType.INT,
                "d_dom": DataType.INT, "d_qoy": DataType.INT,
                "d_day_name": DataType.STRING, "d_dow": DataType.INT,
                "d_month_seq": DataType.INT, "d_week_seq": DataType.INT,
                "d_quarter_name": DataType.STRING,
            },
        )

    def _time_dim(self) -> Table:
        secs = np.arange(0, 86400, 60, dtype=np.int32)  # minute granularity
        return Table.from_numpy(
            {
                "t_time_sk": np.arange(len(secs), dtype=np.int32),
                "t_time": secs,
                "t_hour": (secs // 3600).astype(np.int32),
                "t_minute": ((secs % 3600) // 60).astype(np.int32),
                "t_meal_time": np.where(
                    (secs >= 6 * 3600) & (secs < 9 * 3600), "breakfast",
                    np.where((secs >= 11 * 3600) & (secs < 14 * 3600),
                             "dinner", ""),
                ),
            },
            {
                "t_time_sk": DataType.INT, "t_time": DataType.INT,
                "t_hour": DataType.INT, "t_minute": DataType.INT,
                "t_meal_time": DataType.STRING,
            },
        )

    def _item(self) -> Table:
        rng = self.rng
        n = self.n_item
        sk = np.arange(1, n + 1, dtype=np.int32)
        cat_id = rng.integers(0, len(_CATEGORIES), size=n)
        brand_id = rng.integers(1, 10, size=n) * 1000 + cat_id * 100 + \
            rng.integers(1, 10, size=n)
        manufact_id = rng.integers(1, 1000, size=n).astype(np.int32)
        return Table.from_numpy(
            {
                "i_item_sk": sk,
                "i_item_id": np.char.add(
                    "AAAAAAAA", np.char.zfill(sk.astype(str), 8)
                ),
                "i_item_desc": _texts(rng, n, 6),
                "i_current_price": _money(rng.integers(9, 100000, size=n)),
                "i_brand_id": brand_id.astype(np.int32),
                "i_brand": np.char.add(
                    np.array(_BRAND_BASE)[rng.integers(0, 10, size=n)],
                    np.char.add(" #", brand_id.astype(str)),
                ),
                "i_category_id": (cat_id + 1).astype(np.int32),
                "i_category": np.array(_CATEGORIES)[cat_id],
                "i_manufact_id": manufact_id,
                "i_manufact": np.char.add("mfg#", manufact_id.astype(str)),
                "i_color": _texts(rng, n, 1),
                "i_manager_id": rng.integers(1, 101, size=n).astype(np.int32),
                "i_product_name": _texts(rng, n, 3),
                "i_class_id": (cat_id * 16 + rng.integers(1, 17, size=n)).astype(np.int32),
                "i_class": np.char.add("class#", (cat_id * 16 + rng.integers(1, 17, size=n)).astype(str)),
                "i_size": np.array(["small", "medium", "large", "petite",
                                    "extra large", "N/A", "economy"])[rng.integers(0, 7, size=n)],
                "i_units": np.array(["Unknown", "Each", "Dozen", "Case", "Pallet",
                                     "Gross", "Oz", "Lb"])[rng.integers(0, 8, size=n)],
                "i_container": np.array(["Unknown"] * n),
                "i_wholesale_cost": _money(rng.integers(100, 9000, size=n)),
            },
            {
                "i_item_sk": DataType.INT, "i_item_id": DataType.STRING,
                "i_item_desc": DataType.STRING,
                "i_current_price": DataType.DOUBLE,
                "i_brand_id": DataType.INT, "i_brand": DataType.STRING,
                "i_category_id": DataType.INT, "i_category": DataType.STRING,
                "i_manufact_id": DataType.INT, "i_manufact": DataType.STRING,
                "i_color": DataType.STRING, "i_manager_id": DataType.INT,
                "i_product_name": DataType.STRING,
                "i_class_id": DataType.INT, "i_class": DataType.STRING,
                "i_size": DataType.STRING, "i_units": DataType.STRING,
                "i_container": DataType.STRING,
                "i_wholesale_cost": DataType.DOUBLE,
            },
        )

    def _store(self) -> Table:
        rng = self.rng
        n = self.n_store
        sk = np.arange(1, n + 1, dtype=np.int32)
        return Table.from_numpy(
            {
                "s_store_sk": sk,
                "s_store_id": np.char.add("store_", sk.astype(str)),
                "s_store_name": np.array(
                    ["ought", "able", "pri", "ese", "anti", "cally", "ation",
                     "eing", "bar", "ought2", "able2", "pri2"][:n]
                    if n <= 12 else [f"store{i}" for i in sk]
                ),
                "s_number_employees": rng.integers(200, 301, size=n).astype(np.int32),
                "s_city": np.array(["Midway", "Fairview"])[sk % 2],
                "s_county": np.array(["Williamson County"] * n),
                "s_state": np.array(["TN"] * n),
                # stores draw from the '3'-prefixed head of the shared zip
                # pool so s_zip = ca_zip joins (q24) and zip-prefix
                # correlations (q8/q19) have matches at every scale
                "s_zip": self._zip_pool_draw(n, stores_only=True),
                "s_gmt_offset": np.full(n, -5.0),
                "s_company_id": np.ones(n, dtype=np.int32),
                "s_company_name": np.array(["Unknown"] * n),
                "s_street_number": rng.integers(1, 1000, size=n).astype(str),
                "s_street_name": _texts(rng, n, 1),
                "s_street_type": np.array(["Street", "Ave", "Blvd", "Ln"])[sk % 4],
                "s_suite_number": np.char.add("Suite ", (sk * 10 % 300).astype(str)),
                "s_market_id": rng.integers(1, 11, size=n).astype(np.int32),
            },
            {
                "s_store_sk": DataType.INT, "s_store_id": DataType.STRING,
                "s_store_name": DataType.STRING,
                "s_number_employees": DataType.INT,
                "s_city": DataType.STRING, "s_county": DataType.STRING,
                "s_state": DataType.STRING, "s_zip": DataType.STRING,
                "s_gmt_offset": DataType.DOUBLE,
                "s_company_id": DataType.INT,
                "s_company_name": DataType.STRING,
                "s_street_number": DataType.STRING,
                "s_street_name": DataType.STRING,
                "s_street_type": DataType.STRING,
                "s_suite_number": DataType.STRING,
                "s_market_id": DataType.INT,
            },
        )

    def _promotion(self) -> Table:
        rng = self.rng
        n = self.n_promo
        sk = np.arange(1, n + 1, dtype=np.int32)
        return Table.from_numpy(
            {
                "p_promo_sk": sk,
                "p_promo_id": np.char.add("promo_", sk.astype(str)),
                "p_channel_dmail": np.array(["Y", "N"])[rng.integers(0, 2, n)],
                "p_channel_email": np.array(["Y", "N"])[rng.integers(0, 2, n)],
                "p_channel_tv": np.array(["Y", "N"])[rng.integers(0, 2, n)],
                "p_channel_event": np.array(["Y", "N"])[rng.integers(0, 2, n)],
            },
            {
                "p_promo_sk": DataType.INT, "p_promo_id": DataType.STRING,
                "p_channel_dmail": DataType.STRING,
                "p_channel_email": DataType.STRING,
                "p_channel_tv": DataType.STRING,
                "p_channel_event": DataType.STRING,
            },
        )

    def _zip_pool_draw(self, n: int, stores_only: bool = False) -> "np.ndarray":
        """Addresses cluster into a deterministic zip pool (real zips
        cluster; uniform 5-digit draws never repeat at bench scales, which
        starves q8-style preferred-customer-per-zip HAVING counts).  The
        master list is scale-independent, small scales use its prefix, and
        its first entries share the store zip prefix '3', so zip-list
        substitution parameters can be fixed in query text across scales."""
        zrng = np.random.default_rng(424242)
        master = np.concatenate([
            30000 + zrng.choice(10000, size=10, replace=False),
            10000 + zrng.choice(90000, size=400, replace=False),
        ])
        _, idx = np.unique(master, return_index=True)
        master = master[np.sort(idx)][:400]
        pool_n = 10 if stores_only else int(min(len(master), max(n // 25, 4)))
        return np.char.zfill(
            master[self.rng.integers(0, pool_n, size=n)].astype(str), 5
        )

    def _customer_address(self) -> Table:
        rng = self.rng
        n = max(int(self.n_customer * 0.5), 10)
        sk = np.arange(1, n + 1, dtype=np.int32)
        state = np.array(
            ["TN", "CA", "TX", "NY", "OH", "GA", "IL", "WA"]
        )[rng.integers(0, 8, size=n)]
        # TN addresses share the stores' county so customer-near-store
        # (ca_county = s_county AND ca_state = s_state) joins match (q54)
        county = _texts(rng, n, 1).astype(object)
        county[state == "TN"] = "Williamson County"
        return Table.from_numpy(
            {
                "ca_address_sk": sk,
                "ca_street_number": rng.integers(1, 1000, size=n).astype(str),
                "ca_street_name": _texts(rng, n, 2),
                "ca_city": _texts(rng, n, 1),
                "ca_county": county.astype(str),
                "ca_state": state,
                "ca_zip": self._zip_pool_draw(n),
                "ca_country": np.array(["United States"] * n),
                "ca_gmt_offset": np.array([-5.0, -6.0, -7.0, -8.0])[
                    rng.integers(0, 4, size=n)
                ],
            },
            {
                "ca_address_sk": DataType.INT,
                "ca_street_number": DataType.STRING,
                "ca_street_name": DataType.STRING,
                "ca_city": DataType.STRING,
                "ca_county": DataType.STRING, "ca_state": DataType.STRING,
                "ca_zip": DataType.STRING, "ca_country": DataType.STRING,
                "ca_gmt_offset": DataType.DOUBLE,
            },
        )

    def _customer_demographics(self) -> Table:
        # spec: fixed cross product of attribute values; scaled by density
        full = []
        for g in _GENDER:
            for ms in _MS:
                for ed in _ED:
                    for pe in range(500, 10001, 500):
                        full.append((g, ms, ed, pe))
        step = max(int(1 / self.demo_density), 1)
        rows = full[::step] if step > 1 else full
        n = len(rows)
        return Table.from_numpy(
            {
                "cd_demo_sk": np.arange(1, n + 1, dtype=np.int32),
                "cd_gender": np.array([r[0] for r in rows]),
                "cd_marital_status": np.array([r[1] for r in rows]),
                "cd_education_status": np.array([r[2] for r in rows]),
                "cd_purchase_estimate": np.array([r[3] for r in rows],
                                                 dtype=np.int32),
                "cd_credit_rating": np.array(_CREDIT)[
                    np.arange(n) % len(_CREDIT)
                ],
                "cd_dep_count": (np.arange(n) % 7).astype(np.int32),
                "cd_dep_employed_count": (np.arange(n) % 7).astype(np.int32),
                "cd_dep_college_count": ((np.arange(n) // 7) % 7).astype(np.int32),
            },
            {
                "cd_demo_sk": DataType.INT, "cd_gender": DataType.STRING,
                "cd_marital_status": DataType.STRING,
                "cd_education_status": DataType.STRING,
                "cd_purchase_estimate": DataType.INT,
                "cd_credit_rating": DataType.STRING,
                "cd_dep_count": DataType.INT,
                "cd_dep_employed_count": DataType.INT,
                "cd_dep_college_count": DataType.INT,
            },
        )

    def _household_demographics(self, tables) -> Table:
        rows = []
        for buy in _BUY:
            for dep in range(0, 10):
                for veh in range(-1, 5):
                    rows.append((buy, dep, veh))
        n = len(rows)
        n_ib = tables["income_band"].num_rows
        return Table.from_numpy(
            {
                "hd_demo_sk": np.arange(1, n + 1, dtype=np.int32),
                "hd_income_band_sk": (
                    np.arange(n) % n_ib + 1
                ).astype(np.int32),
                "hd_buy_potential": np.array([r[0] for r in rows]),
                "hd_dep_count": np.array([r[1] for r in rows], dtype=np.int32),
                "hd_vehicle_count": np.array([r[2] for r in rows],
                                             dtype=np.int32),
            },
            {
                "hd_demo_sk": DataType.INT,
                "hd_income_band_sk": DataType.INT,
                "hd_buy_potential": DataType.STRING,
                "hd_dep_count": DataType.INT,
                "hd_vehicle_count": DataType.INT,
            },
        )

    # ------------------------------------------------- small dimensions
    # (ref: tpcds spec §2 fixed-size dimensions; sized per spec)

    def _income_band(self) -> Table:
        lo = np.arange(0, 200001, 10000, dtype=np.int32)[:20]
        return Table.from_numpy(
            {
                "ib_income_band_sk": np.arange(1, 21, dtype=np.int32),
                "ib_lower_bound": lo,
                "ib_upper_bound": lo + 10000,
            },
            {
                "ib_income_band_sk": DataType.INT,
                "ib_lower_bound": DataType.INT,
                "ib_upper_bound": DataType.INT,
            },
        )

    def _warehouse(self) -> Table:
        n = max(int(5 * max(self.sf, 1) ** 0.5), 2)
        sk = np.arange(1, n + 1, dtype=np.int32)
        return Table.from_numpy(
            {
                "w_warehouse_sk": sk,
                "w_warehouse_id": np.char.add("wh_", sk.astype(str)),
                "w_warehouse_name": np.char.add("Warehouse#", sk.astype(str)),
                "w_warehouse_sq_ft": (sk * 100000 % 900000 + 50000).astype(np.int32),
                "w_city": np.array(["Midway", "Fairview"])[sk % 2],
                "w_county": np.array(["Williamson County"] * n),
                "w_state": np.array(["TN", "CA"])[sk % 2],
                "w_country": np.array(["United States"] * n),
            },
            {
                "w_warehouse_sk": DataType.INT,
                "w_warehouse_id": DataType.STRING,
                "w_warehouse_name": DataType.STRING,
                "w_warehouse_sq_ft": DataType.INT,
                "w_city": DataType.STRING, "w_county": DataType.STRING,
                "w_state": DataType.STRING, "w_country": DataType.STRING,
            },
        )

    def _ship_mode(self) -> Table:
        types = ["EXPRESS", "NEXT DAY", "OVERNIGHT", "REGULAR", "TWO DAY"]
        carriers = ["UPS", "FEDEX", "AIRBORNE", "USPS", "DHL",
                    "TBS", "ZHOU", "LATVIAN", "MSC", "ORIENTAL"]
        n = 20
        sk = np.arange(1, n + 1, dtype=np.int32)
        return Table.from_numpy(
            {
                "sm_ship_mode_sk": sk,
                "sm_ship_mode_id": np.char.add("sm_", sk.astype(str)),
                "sm_type": np.array(types)[(sk - 1) % len(types)],
                "sm_code": np.array(["AIR", "SURFACE", "SEA", "LIBRARY"])[
                    (sk - 1) % 4
                ],
                "sm_carrier": np.array(carriers)[(sk - 1) % len(carriers)],
            },
            {
                "sm_ship_mode_sk": DataType.INT,
                "sm_ship_mode_id": DataType.STRING,
                "sm_type": DataType.STRING, "sm_code": DataType.STRING,
                "sm_carrier": DataType.STRING,
            },
        )

    def _web_site(self) -> Table:
        n = max(int(10 * max(self.sf, 1) ** 0.5), 2)
        sk = np.arange(1, n + 1, dtype=np.int32)
        return Table.from_numpy(
            {
                "web_site_sk": sk,
                "web_site_id": np.char.add("site_", sk.astype(str)),
                "web_name": np.char.add("site_", ((sk - 1) % 4).astype(str)),
                "web_company_name": np.array(
                    ["pri", "able", "ought", "ese", "anti", "cally"]
                )[(sk - 1) % 6],
            },
            {
                "web_site_sk": DataType.INT, "web_site_id": DataType.STRING,
                "web_name": DataType.STRING,
                "web_company_name": DataType.STRING,
            },
        )

    def _web_page(self) -> Table:
        rng = self.rng
        n = max(int(30 * max(self.sf, 1) ** 0.5), 4)
        sk = np.arange(1, n + 1, dtype=np.int32)
        return Table.from_numpy(
            {
                "wp_web_page_sk": sk,
                "wp_web_page_id": np.char.add("page_", sk.astype(str)),
                "wp_char_count": rng.integers(100, 8000, size=n).astype(np.int32),
            },
            {
                "wp_web_page_sk": DataType.INT,
                "wp_web_page_id": DataType.STRING,
                "wp_char_count": DataType.INT,
            },
        )

    def _call_center(self) -> Table:
        n = max(int(3 * max(self.sf, 1) ** 0.5), 2)
        sk = np.arange(1, n + 1, dtype=np.int32)
        return Table.from_numpy(
            {
                "cc_call_center_sk": sk,
                "cc_call_center_id": np.char.add("cc_", sk.astype(str)),
                "cc_name": np.array(
                    ["NY Metro", "Mid Atlantic", "North Midwest", "Pacific"]
                )[(sk - 1) % 4],
                "cc_county": np.array(["Williamson County"] * n),
                "cc_manager": np.char.add("Manager#", sk.astype(str)),
            },
            {
                "cc_call_center_sk": DataType.INT,
                "cc_call_center_id": DataType.STRING,
                "cc_name": DataType.STRING, "cc_county": DataType.STRING,
                "cc_manager": DataType.STRING,
            },
        )

    def _reason(self) -> Table:
        descs = ["Package was damaged", "Stopped working",
                 "Did not get it on time", "Not the product that was ordred",
                 "Parts missing", "Does not work with a product that I have",
                 "Gift exchange", "Did not like the color",
                 "Did not like the model", "Did not fit",
                 "Found a better price in a store", "Found a better extension",
                 "No service location in my area", "duplicate purchase",
                 "Its the best", "reason 16", "reason 17", "reason 18",
                 "reason 19", "reason 20", "reason 21", "reason 22",
                 "reason 23", "reason 24", "reason 25", "reason 26",
                 "reason 27", "reason 28", "reason 29", "reason 30",
                 "reason 31", "reason 32", "reason 33", "reason 34",
                 "reason 35"]
        n = len(descs)
        return Table.from_numpy(
            {
                "r_reason_sk": np.arange(1, n + 1, dtype=np.int32),
                "r_reason_id": np.char.add(
                    "reason_", np.arange(1, n + 1).astype(str)
                ),
                "r_reason_desc": np.array(descs),
            },
            {
                "r_reason_sk": DataType.INT, "r_reason_id": DataType.STRING,
                "r_reason_desc": DataType.STRING,
            },
        )

    def _catalog_page(self) -> Table:
        rng = self.rng
        n = max(int(60 * max(self.sf, 1) ** 0.5), 10)
        sk = np.arange(1, n + 1, dtype=np.int32)
        return Table.from_numpy(
            {
                "cp_catalog_page_sk": sk,
                "cp_catalog_page_id": np.char.add("page_", sk.astype(str)),
                "cp_catalog_number": ((sk - 1) // 20 + 1).astype(np.int32),
                "cp_catalog_page_number": ((sk - 1) % 20 + 1).astype(np.int32),
                "cp_department": np.array(["DEPARTMENT"] * n),
                "cp_type": np.array(
                    ["bi-annual", "quarterly", "monthly"])[(sk - 1) % 3],
                "cp_description": _texts(rng, n, 4),
            },
            {
                "cp_catalog_page_sk": DataType.INT,
                "cp_catalog_page_id": DataType.STRING,
                "cp_catalog_number": DataType.INT,
                "cp_catalog_page_number": DataType.INT,
                "cp_department": DataType.STRING,
                "cp_type": DataType.STRING,
                "cp_description": DataType.STRING,
            },
        )

    def _customer(self, tables) -> Table:
        rng = self.rng
        n = self.n_customer
        sk = np.arange(1, n + 1, dtype=np.int32)
        n_addr = tables["customer_address"].num_rows
        n_cd = tables["customer_demographics"].num_rows
        n_hd = tables["household_demographics"].num_rows
        return Table.from_numpy(
            {
                "c_customer_sk": sk,
                "c_customer_id": np.char.add(
                    "AAAAAAAA", np.char.zfill(sk.astype(str), 8)
                ),
                "c_current_addr_sk": rng.integers(1, n_addr + 1, size=n).astype(np.int32),
                "c_current_cdemo_sk": rng.integers(1, n_cd + 1, size=n).astype(np.int32),
                "c_current_hdemo_sk": rng.integers(1, n_hd + 1, size=n).astype(np.int32),
                "c_first_name": _texts(rng, n, 1),
                "c_last_name": _texts(rng, n, 1),
                "c_birth_year": rng.integers(1930, 1995, size=n).astype(np.int32),
                "c_birth_month": rng.integers(1, 13, size=n).astype(np.int32),
                "c_birth_day": rng.integers(1, 29, size=n).astype(np.int32),
                "c_birth_country": np.array(
                    ["UNITED STATES", "CANADA", "MEXICO", "GERMANY", "JAPAN",
                     "FRANCE", "BRAZIL", "INDIA"])[rng.integers(0, 8, size=n)],
                "c_preferred_cust_flag": np.array(["Y", "N"])[rng.integers(0, 2, size=n)],
                "c_salutation": np.array(
                    ["Mr.", "Mrs.", "Ms.", "Dr.", "Miss", "Sir"])[rng.integers(0, 6, size=n)],
                "c_email_address": np.char.add(_texts(rng, n, 1), "@example.com"),
                "c_first_shipto_date_sk": (rng.integers(0, 2000, size=n) + 2450815).astype(np.int32),
                "c_first_sales_date_sk": (rng.integers(0, 2000, size=n) + 2450815).astype(np.int32),
            },
            {
                "c_customer_sk": DataType.INT,
                "c_customer_id": DataType.STRING,
                "c_current_addr_sk": DataType.INT,
                "c_current_cdemo_sk": DataType.INT,
                "c_current_hdemo_sk": DataType.INT,
                "c_first_name": DataType.STRING,
                "c_last_name": DataType.STRING,
                "c_birth_year": DataType.INT,
                "c_birth_month": DataType.INT,
                "c_birth_day": DataType.INT,
                "c_birth_country": DataType.STRING,
                "c_preferred_cust_flag": DataType.STRING,
                "c_salutation": DataType.STRING,
                "c_email_address": DataType.STRING,
                "c_first_shipto_date_sk": DataType.INT,
                "c_first_sales_date_sk": DataType.INT,
            },
        )

    def _skewed_items(self, n: int) -> "np.ndarray":
        """Item popularity skew: ~30% of sales concentrate on a hot set of
        ~2% of items, so cross-channel item intersections (Q83-style) are
        populated at small scales."""
        rng = self.rng
        items = rng.integers(1, self.n_item + 1, size=n).astype(np.int32)
        hot = np.flatnonzero(rng.random(n) < 0.3)
        n_hot = max(self.n_item // 50, 5)
        items[hot] = rng.integers(1, n_hot + 1, size=len(hot))
        return items

    def _channel_sales(self, p: str, n: int, tables,
                       customer_col: str, addr_col: str) -> Table:
        """Catalog/web sales fact at the same grain as store_sales (ref:
        tpcds spec §2.4/§2.5; only the columns the query set touches)."""
        rng = self.rng
        n_dates = tables["date_dim"].num_rows
        quantity = rng.integers(1, 101, size=n).astype(np.int32)
        wholesale = _money(rng.integers(100, 10000, size=n))
        list_price = np.round(wholesale * (1 + rng.random(n)) * 100) / 100
        discount = rng.random(n) * 0.4
        sales_price = np.round(list_price * (1 - discount) * 100) / 100
        ext_sales = np.round(sales_price * quantity * 100) / 100
        ext_list = np.round(list_price * quantity * 100) / 100
        ext_wholesale = np.round(wholesale * quantity * 100) / 100
        sold = (rng.integers(0, n_dates - 125, size=n) + 2450815).astype(np.int32)
        # cross-channel shoppers: ~20% of channel rows reuse a store-sales
        # (item, customer) pair so sale->return->other-channel chains
        # (Q17/Q25/Q29) produce matches, as dsdgen's behavior model does
        item_sk = self._skewed_items(n)
        cust_sk = rng.integers(1, self.n_customer + 1, size=n).astype(np.int32)
        ss = tables.get("store_sales")
        if ss is not None and ss.num_rows:
            cross = np.flatnonzero(rng.random(n) < 0.3)
            src = rng.integers(0, ss.num_rows, size=len(cross))
            item_sk[cross] = ss.column("ss_item_sk").host_raw()[src]
            cust_sk[cross] = ss.column("ss_customer_sk").host_raw()[src]
            # repeat purchases cluster in time near the store visit
            sold[cross] = np.minimum(
                ss.column("ss_sold_date_sk").host_raw()[src]
                + rng.integers(0, 60, size=len(cross)),
                2450815 + n_dates - 126,
            ).astype(np.int32)
        data = {
            f"{p}_sold_date_sk": sold,
            f"{p}_sold_time_sk": rng.integers(
                0, tables["time_dim"].num_rows, size=n
            ).astype(np.int32),
            # orders group ~4 lines; ship dates trail the sale ≤120 days
            f"{p}_order_number": (np.arange(n) // 4 + 1).astype(np.int32),
            f"{p}_ship_date_sk": (
                sold + rng.integers(1, 121, size=n)
            ).astype(np.int32),
            f"{p}_item_sk": item_sk,
            customer_col: cust_sk,
            f"{p}_ship_customer_sk": rng.integers(
                1, self.n_customer + 1, size=n
            ).astype(np.int32),
            addr_col: rng.integers(
                1, tables["customer_address"].num_rows + 1, size=n
            ).astype(np.int32),
            f"{p}_ship_addr_sk": rng.integers(
                1, tables["customer_address"].num_rows + 1, size=n
            ).astype(np.int32),
            f"{p}_cdemo_sk": rng.integers(
                1, tables["customer_demographics"].num_rows + 1, size=n
            ).astype(np.int32),
            f"{p}_hdemo_sk": rng.integers(
                1, tables["household_demographics"].num_rows + 1, size=n
            ).astype(np.int32),
            f"{p}_promo_sk": rng.integers(
                1, self.n_promo + 1, size=n
            ).astype(np.int32),
            f"{p}_warehouse_sk": rng.integers(
                1, tables["warehouse"].num_rows + 1, size=n
            ).astype(np.int32),
            f"{p}_ship_mode_sk": rng.integers(
                1, tables["ship_mode"].num_rows + 1, size=n
            ).astype(np.int32),
            f"{p}_quantity": quantity,
            f"{p}_wholesale_cost": wholesale,
            f"{p}_list_price": list_price,
            f"{p}_sales_price": sales_price,
            f"{p}_ext_discount_amt": np.round((ext_list - ext_sales) * 100) / 100,
            f"{p}_ext_sales_price": ext_sales,
            f"{p}_ext_list_price": ext_list,
            f"{p}_ext_wholesale_cost": ext_wholesale,
            f"{p}_ext_ship_cost": np.round(ext_sales * 0.05 * 100) / 100,
            f"{p}_coupon_amt": np.where(
                rng.random(n) < 0.1, np.round(ext_sales * 0.1 * 100) / 100, 0.0
            ),
            f"{p}_net_paid": ext_sales,
            f"{p}_net_profit": np.round((ext_sales - ext_wholesale) * 100) / 100,
        }
        if p == "cs":
            data["cs_call_center_sk"] = rng.integers(
                1, tables["call_center"].num_rows + 1, size=n
            ).astype(np.int32)
            data["cs_catalog_page_sk"] = rng.integers(
                1, tables["catalog_page"].num_rows + 1, size=n
            ).astype(np.int32)
        else:
            data["ws_web_site_sk"] = rng.integers(
                1, tables["web_site"].num_rows + 1, size=n
            ).astype(np.int32)
            data["ws_web_page_sk"] = rng.integers(
                1, tables["web_page"].num_rows + 1, size=n
            ).astype(np.int32)
        types = {
            name: (DataType.INT if arr.dtype.kind == "i" else DataType.DOUBLE)
            for name, arr in data.items()
        }
        # dsdgen leaves a few percent of foreign keys NULL; q76-style
        # "unattributed sales" scans depend on them
        null_col = ("cs_ship_addr_sk" if p == "cs"
                    else "ws_ship_customer_sk")
        return Table.from_numpy(
            data, types,
            validity={null_col: rng.random(n) >= 0.04},
        )

    # ---------------------------------------------------------- returns

    def _store_returns(self, tables) -> Table:
        """~10% of store sales return; returns share (item_sk,
        ticket_number, customer_sk) with the originating sale so
        sale-to-return joins (Q17/Q25/Q29/Q50/Q93) produce matches."""
        rng = self.rng
        ss = tables["store_sales"]
        n_ss = ss.num_rows
        idx = np.flatnonzero(rng.random(n_ss) < 0.15)
        n = len(idx)

        def col(name):
            return ss.column(name).host_raw(n_ss)[idx]

        def colv(name):
            """(values, validity) for a NULLABLE sales column.  Filler at
            NULL slots is normalized to 1: host_raw of a packed column
            yields clipped fillers, so carrying raw fillers as non-NULL
            values made encoded and unencoded generation produce
            DIFFERENT data (the round-4 'TPC-DS Q1 TPU rows-mismatch' was
            exactly this, via a baseline built without packing)."""
            c = ss.column(name)
            vals = c.host_raw(n_ss)[idx]
            if c.validity is None:
                return vals, None
            v = np.asarray(c.validity)[:n_ss][idx]
            return np.where(v, vals, 1).astype(vals.dtype), v

        sold = col("ss_sold_date_sk")
        quantity = np.maximum(
            (col("ss_quantity") * rng.random(n)).astype(np.int32), 1
        )
        amt = np.round(col("ss_sales_price") * quantity * 100) / 100
        # a slice of returns come back through a DIFFERENT customer (gift
        # returns) — Q1-style per-customer return analysis needs both
        returning = col("ss_customer_sk").copy()
        other = rng.random(n) < 0.2
        returning[other] = rng.integers(
            1, self.n_customer + 1, size=int(other.sum()))
        data = {
            "sr_returned_date_sk": (
                sold + rng.integers(1, 91, size=n)
            ).astype(np.int32),
            "sr_return_time_sk": rng.integers(
                0, tables["time_dim"].num_rows, size=n).astype(np.int32),
            "sr_item_sk": col("ss_item_sk"),
            "sr_customer_sk": returning.astype(np.int32),
            "sr_cdemo_sk": col("ss_cdemo_sk"),
            "sr_hdemo_sk": col("ss_hdemo_sk"),
            "sr_addr_sk": (addr_vals := colv("ss_addr_sk"))[0],
            "sr_store_sk": (store_vals := colv("ss_store_sk"))[0],
            "sr_reason_sk": rng.integers(
                1, tables["reason"].num_rows + 1, size=n).astype(np.int32),
            "sr_ticket_number": col("ss_ticket_number"),
            "sr_return_quantity": quantity,
            "sr_return_amt": amt,
            "sr_return_tax": np.round(amt * 0.08 * 100) / 100,
            "sr_return_amt_inc_tax": np.round(amt * 1.08 * 100) / 100,
            "sr_fee": _money(rng.integers(50, 10000, size=n)),
            "sr_return_ship_cost": np.round(amt * 0.05 * 100) / 100,
            "sr_refunded_cash": np.round(amt * rng.random(n) * 100) / 100,
            "sr_net_loss": np.round(amt * 0.2 * 100) / 100,
        }
        types = {
            name: (DataType.INT if arr.dtype.kind == "i" else DataType.DOUBLE)
            for name, arr in data.items()
        }
        validity = {
            name: v for name, v in (("sr_addr_sk", addr_vals[1]),
                                    ("sr_store_sk", store_vals[1]))
            if v is not None
        }
        return Table.from_numpy(data, types, validity=validity)

    def _channel_returns(self, p: str, sp: str, sales: Table, tables) -> Table:
        """Catalog (cr_) / web (wr_) returns sampled from their channel's
        sales, sharing (item_sk, order_number)."""
        rng = self.rng
        n_s = sales.num_rows
        idx = np.flatnonzero(rng.random(n_s) < 0.15)
        n = len(idx)

        def col(name):
            return sales.column(name).host_raw(n_s)[idx]

        sold = col(f"{sp}_sold_date_sk")
        quantity = np.maximum(
            (col(f"{sp}_quantity") * rng.random(n)).astype(np.int32), 1
        )
        amt = np.round(col(f"{sp}_sales_price") * quantity * 100) / 100
        amount_col = "cr_return_amount" if p == "cr" else "wr_return_amt"
        data = {
            f"{p}_returned_date_sk": (
                sold + rng.integers(1, 91, size=n)).astype(np.int32),
            f"{p}_item_sk": col(f"{sp}_item_sk"),
            f"{p}_order_number": col(f"{sp}_order_number"),
            f"{p}_returning_customer_sk": rng.integers(
                1, self.n_customer + 1, size=n).astype(np.int32),
            f"{p}_refunded_customer_sk": col(
                f"{sp}_bill_customer_sk"),
            f"{p}_returning_addr_sk": rng.integers(
                1, tables["customer_address"].num_rows + 1, size=n
            ).astype(np.int32),
            f"{p}_refunded_addr_sk": col(f"{sp}_ship_addr_sk"),
            f"{p}_refunded_cdemo_sk": col(f"{sp}_cdemo_sk"),
            # most returns come back through the purchaser (same
            # demographics) — Q85-style cd1=cd2 joins need matches
            f"{p}_returning_cdemo_sk": np.where(
                rng.random(n) < 0.7,
                col(f"{sp}_cdemo_sk"),
                rng.integers(
                    1, tables["customer_demographics"].num_rows + 1, size=n
                ),
            ).astype(np.int32),
            f"{p}_refunded_hdemo_sk": col(f"{sp}_hdemo_sk"),
            f"{p}_reason_sk": rng.integers(
                1, tables["reason"].num_rows + 1, size=n).astype(np.int32),
            f"{p}_return_quantity": quantity,
            amount_col: amt,
            f"{p}_return_amt_inc_tax": np.round(amt * 1.08 * 100) / 100,
            f"{p}_fee": _money(rng.integers(50, 10000, size=n)),
            f"{p}_refunded_cash": np.round(amt * rng.random(n) * 100) / 100,
            f"{p}_net_loss": np.round(amt * 0.2 * 100) / 100,
        }
        if p == "cr":
            data["cr_call_center_sk"] = col("cs_call_center_sk")
            data["cr_catalog_page_sk"] = col("cs_catalog_page_sk")
            # refund splits across payment channels (q64's cs_ui sums all)
            cash = data["cr_refunded_cash"]
            rev = np.round(cash * rng.random(n) * 0.5 * 100) / 100
            data["cr_reversed_charge"] = rev
            data["cr_store_credit"] = np.round((cash - rev) * 0.5 * 100) / 100
        else:
            data["wr_web_page_sk"] = col("ws_web_page_sk")
        types = {
            name: (DataType.INT if arr.dtype.kind == "i" else DataType.DOUBLE)
            for name, arr in data.items()
        }
        return Table.from_numpy(data, types)

    def _inventory(self, tables) -> Table:
        """Weekly item × warehouse stock levels (ref: tpcds spec §2.4.11);
        item stride caps the cross product at test/bench scales."""
        rng = self.rng
        dates = tables["date_dim"].column("d_date_sk").host_raw()[
            : tables["date_dim"].num_rows
        ]
        weeks = dates[::7]
        n_wh = tables["warehouse"].num_rows
        cap = max(int(1_000_000 * self.sf), 50_000)
        stride = max(1, (len(weeks) * self.n_item * n_wh) // cap)
        items = np.arange(1, self.n_item + 1, dtype=np.int32)[::max(stride, 1)]
        grid = np.stack(
            [a.ravel() for a in np.meshgrid(weeks, items,
                                            np.arange(1, n_wh + 1))],
            axis=1,
        )
        n = len(grid)
        return Table.from_numpy(
            {
                "inv_date_sk": grid[:, 0].astype(np.int32),
                "inv_item_sk": grid[:, 1].astype(np.int32),
                "inv_warehouse_sk": grid[:, 2].astype(np.int32),
                # right-skewed stock levels (most items lightly stocked)
                # so the Q39-style coefficient of variation exceeds 1
                "inv_quantity_on_hand": (
                    rng.random(n) ** 4 * 1000
                ).astype(np.int32),
            },
            {
                "inv_date_sk": DataType.INT, "inv_item_sk": DataType.INT,
                "inv_warehouse_sk": DataType.INT,
                "inv_quantity_on_hand": DataType.INT,
            },
        )

    def _store_sales(self, tables) -> Table:
        rng = self.rng
        n = self.n_store_sales
        n_dates = tables["date_dim"].num_rows
        quantity = rng.integers(1, 101, size=n).astype(np.int32)
        wholesale = _money(rng.integers(100, 10000, size=n))
        list_price = np.round(wholesale * (1 + rng.random(n)) * 100) / 100
        discount = rng.random(n) * 0.4
        sales_price = np.round(list_price * (1 - discount) * 100) / 100
        ext_sales = np.round(sales_price * quantity * 100) / 100
        ext_list = np.round(list_price * quantity * 100) / 100
        ext_wholesale = np.round(wholesale * quantity * 100) / 100
        return Table.from_numpy(
            {
                "ss_sold_date_sk": (
                    rng.integers(0, n_dates, size=n) + 2450815
                ).astype(np.int32),
                "ss_sold_time_sk": rng.integers(
                    0, tables["time_dim"].num_rows, size=n
                ).astype(np.int32),
                "ss_item_sk": self._skewed_items(n),
                "ss_customer_sk": rng.integers(1, self.n_customer + 1, size=n).astype(np.int32),
                "ss_cdemo_sk": rng.integers(
                    1, tables["customer_demographics"].num_rows + 1, size=n
                ).astype(np.int32),
                "ss_hdemo_sk": rng.integers(
                    1, tables["household_demographics"].num_rows + 1, size=n
                ).astype(np.int32),
                "ss_addr_sk": rng.integers(
                    1, tables["customer_address"].num_rows + 1, size=n
                ).astype(np.int32),
                "ss_store_sk": rng.integers(1, self.n_store + 1, size=n).astype(np.int32),
                "ss_promo_sk": rng.integers(1, self.n_promo + 1, size=n).astype(np.int32),
                "ss_ticket_number": (np.arange(n) // 8 + 1).astype(np.int32),
                "ss_quantity": quantity,
                "ss_wholesale_cost": wholesale,
                "ss_list_price": list_price,
                "ss_sales_price": sales_price,
                "ss_ext_discount_amt": np.round(
                    (ext_list - ext_sales) * 100
                ) / 100,
                "ss_ext_sales_price": ext_sales,
                "ss_ext_list_price": ext_list,
                "ss_ext_wholesale_cost": ext_wholesale,
                "ss_coupon_amt": np.where(
                    rng.random(n) < 0.1,
                    np.round(ext_sales * 0.1 * 100) / 100, 0.0
                ),
                "ss_net_paid": ext_sales,
                "ss_net_profit": np.round(
                    (ext_sales - ext_wholesale) * 100
                ) / 100,
            },
            {
                "ss_sold_date_sk": DataType.INT,
                "ss_sold_time_sk": DataType.INT,
                "ss_item_sk": DataType.INT, "ss_customer_sk": DataType.INT,
                "ss_cdemo_sk": DataType.INT, "ss_hdemo_sk": DataType.INT,
                "ss_addr_sk": DataType.INT, "ss_store_sk": DataType.INT,
                "ss_promo_sk": DataType.INT,
                "ss_ticket_number": DataType.INT,
                "ss_quantity": DataType.INT,
                "ss_wholesale_cost": DataType.DOUBLE,
                "ss_list_price": DataType.DOUBLE,
                "ss_sales_price": DataType.DOUBLE,
                "ss_ext_discount_amt": DataType.DOUBLE,
                "ss_ext_sales_price": DataType.DOUBLE,
                "ss_ext_list_price": DataType.DOUBLE,
                "ss_ext_wholesale_cost": DataType.DOUBLE,
                "ss_coupon_amt": DataType.DOUBLE,
                "ss_net_paid": DataType.DOUBLE,
                "ss_net_profit": DataType.DOUBLE,
            },
            # dsdgen leaves a few percent of foreign keys NULL
            # (q76 scans ss_store_sk IS NULL; q44 averages the
            # ss_addr_sk IS NULL slice as its baseline)
            validity={"ss_store_sk": rng.random(n) >= 0.04,
                      "ss_addr_sk": rng.random(n) >= 0.04},
        )
