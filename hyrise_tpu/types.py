"""Core types and enums.

Reference: src/lib/types.hpp (strong typedefs, PredicateCondition enum
types.hpp:160-208, JoinMode types.hpp:120-140, SortMode types.hpp:219) and
src/lib/all_type_variant.hpp (5 data types).  Re-designed for device arrays:
strings are dictionary codes, dates are days-since-epoch int32.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Any

import numpy as np


class DataType(enum.Enum):
    """Logical column types (ref: all_type_variant.hpp:34-39 plus DATE).

    The reference stores 5 physical types (int32/int64/float/double/string).
    On TPU, STRING columns are dictionary codes (int32) with a host-side
    dictionary; DATE is int32 days since 1970-01-01 (the reference keeps
    dates as strings — we keep a native date type but can render as string).
    """

    NULL = "null"
    INT = "int"        # int32
    LONG = "long"      # int64
    FLOAT = "float"    # float32
    DOUBLE = "double"  # float64
    STRING = "string"  # dictionary codes int32
    DATE = "date"      # int32 days since epoch


_NUMPY_DTYPES = {
    DataType.INT: np.int32,
    DataType.LONG: np.int64,
    DataType.FLOAT: np.float32,
    DataType.DOUBLE: np.float64,
    DataType.STRING: np.int32,
    DataType.DATE: np.int32,
}

NUMERIC_TYPES = (DataType.INT, DataType.LONG, DataType.FLOAT, DataType.DOUBLE)
INTEGRAL_TYPES = (DataType.INT, DataType.LONG)
FLOATING_TYPES = (DataType.FLOAT, DataType.DOUBLE)


def physical_dtype(data_type: DataType) -> np.dtype:
    """Numpy/JAX storage dtype for a logical type."""
    return np.dtype(_NUMPY_DTYPES[data_type])


def common_numeric_type(a: DataType, b: DataType) -> DataType:
    """Type promotion lattice for arithmetic/comparison (ref: Hyrise uses
    C++ promotion; we mirror SQL semantics: any float -> widest float)."""
    if a == b:
        return a
    order = [DataType.INT, DataType.LONG, DataType.FLOAT, DataType.DOUBLE]
    if a in order and b in order:
        # int64 + float32 -> float64 to avoid precision loss (SQL-ish)
        if {a, b} == {DataType.LONG, DataType.FLOAT}:
            return DataType.DOUBLE
        return order[max(order.index(a), order.index(b))]
    if DataType.DATE in (a, b):
        other = b if a == DataType.DATE else a
        if other in INTEGRAL_TYPES or other == DataType.DATE:
            return DataType.DATE
    raise TypeError(f"no common type for {a} and {b}")


class PredicateCondition(enum.Enum):
    """Ref: types.hpp:160-208."""

    EQUALS = "="
    NOT_EQUALS = "<>"
    LESS_THAN = "<"
    LESS_THAN_EQUALS = "<="
    GREATER_THAN = ">"
    GREATER_THAN_EQUALS = ">="
    BETWEEN_INCLUSIVE = "BETWEEN"
    BETWEEN_LOWER_EXCLUSIVE = "BETWEEN_LX"
    BETWEEN_UPPER_EXCLUSIVE = "BETWEEN_UX"
    BETWEEN_EXCLUSIVE = "BETWEEN_X"
    IN = "IN"
    NOT_IN = "NOT IN"
    LIKE = "LIKE"
    NOT_LIKE = "NOT LIKE"
    IS_NULL = "IS NULL"
    IS_NOT_NULL = "IS NOT NULL"


FLIPPED_CONDITION = {
    PredicateCondition.EQUALS: PredicateCondition.EQUALS,
    PredicateCondition.NOT_EQUALS: PredicateCondition.NOT_EQUALS,
    PredicateCondition.LESS_THAN: PredicateCondition.GREATER_THAN,
    PredicateCondition.LESS_THAN_EQUALS: PredicateCondition.GREATER_THAN_EQUALS,
    PredicateCondition.GREATER_THAN: PredicateCondition.LESS_THAN,
    PredicateCondition.GREATER_THAN_EQUALS: PredicateCondition.LESS_THAN_EQUALS,
}

NEGATED_CONDITION = {
    PredicateCondition.EQUALS: PredicateCondition.NOT_EQUALS,
    PredicateCondition.NOT_EQUALS: PredicateCondition.EQUALS,
    PredicateCondition.LESS_THAN: PredicateCondition.GREATER_THAN_EQUALS,
    PredicateCondition.LESS_THAN_EQUALS: PredicateCondition.GREATER_THAN,
    PredicateCondition.GREATER_THAN: PredicateCondition.LESS_THAN_EQUALS,
    PredicateCondition.GREATER_THAN_EQUALS: PredicateCondition.LESS_THAN,
    PredicateCondition.IN: PredicateCondition.NOT_IN,
    PredicateCondition.NOT_IN: PredicateCondition.IN,
    PredicateCondition.LIKE: PredicateCondition.NOT_LIKE,
    PredicateCondition.NOT_LIKE: PredicateCondition.LIKE,
    PredicateCondition.IS_NULL: PredicateCondition.IS_NOT_NULL,
    PredicateCondition.IS_NOT_NULL: PredicateCondition.IS_NULL,
}


class JoinMode(enum.Enum):
    """Ref: types.hpp:120-140."""

    INNER = "inner"
    LEFT = "left"
    RIGHT = "right"
    FULL = "full"
    CROSS = "cross"
    SEMI = "semi"
    ANTI_NULL_AS_TRUE = "anti_null_as_true"    # NOT IN semantics
    ANTI_NULL_AS_FALSE = "anti_null_as_false"  # NOT EXISTS semantics


class SortMode(enum.Enum):
    """Ref: types.hpp:219 — four null-order modes."""

    ASC_NULLS_FIRST = "asc_nf"
    ASC_NULLS_LAST = "asc_nl"
    DESC_NULLS_FIRST = "desc_nf"
    DESC_NULLS_LAST = "desc_nl"

    @property
    def ascending(self) -> bool:
        return self in (SortMode.ASC_NULLS_FIRST, SortMode.ASC_NULLS_LAST)

    @property
    def nulls_first(self) -> bool:
        return self in (SortMode.ASC_NULLS_FIRST, SortMode.DESC_NULLS_FIRST)


class AggregateFunction(enum.Enum):
    """Ref: expression/window_function_expression.hpp:19-43."""

    MIN = "min"
    MAX = "max"
    SUM = "sum"
    AVG = "avg"
    COUNT = "count"
    COUNT_DISTINCT = "count_distinct"
    STDDEV_SAMP = "stddev_samp"
    ANY = "any"
    # Ranking window functions (executable here, unlike the reference which
    # plans but refuses them — lqp_translator.cpp:523-526):
    RANK = "rank"
    DENSE_RANK = "dense_rank"
    ROW_NUMBER = "row_number"
    CUME_DIST = "cume_dist"
    PERCENT_RANK = "percent_rank"
    # Navigation window functions (beyond the reference, which has no
    # executable window layer at all):
    LAG = "lag"
    LEAD = "lead"
    FIRST_VALUE = "first_value"
    LAST_VALUE = "last_value"
    NTILE = "ntile"


class SetOperationMode(enum.Enum):
    UNIQUE = "unique"  # UNION / INTERSECT / EXCEPT (distinct)
    ALL = "all"        # UNION ALL / ...
    POSITIONS = "positions"  # positional set-union of reference tables


class TableType(enum.Enum):
    """Ref: types.hpp — Data vs References tables (late materialization)."""

    DATA = "data"
    REFERENCES = "references"


@dataclass(frozen=True)
class ColumnDefinition:
    """Ref: storage/table_column_definition.hpp."""

    name: str
    data_type: DataType
    nullable: bool = False


NULL_VALUE = None  # Python-side null marker inside AllTypeVariant-like values


def is_null(value: Any) -> bool:
    return value is None


# Row padding granularity.  1-D device arrays are padded to a multiple of
# LANE (the TPU lane width) so reshapes to (n/LANE, LANE) tiles stay free.
LANE = 128
# Block size for per-block pruning statistics (ref: chunk.hpp:52 uses 65535;
# we use a power of two so block index math is shift/mask).
BLOCK_ROWS = 65536


def padded_size(n: int, multiple: int = LANE) -> int:
    """Round n up to a multiple (min one lane) for static device shapes."""
    if n <= 0:
        return multiple
    return -(-n // multiple) * multiple


def size_bucket(n: int) -> int:
    """Bucket a dynamic row count to a static capacity to bound the number
    of distinct compiled shapes: next power of two, at least LANE."""
    if n <= LANE:
        return LANE
    return 1 << (n - 1).bit_length()
