"""Date <-> int32 days-since-epoch conversion (host side, vectorized).

The reference stores dates as strings and uses `utils/date_time_utils.*`
for parsing; we store DATE columns as int32 days since 1970-01-01, which
makes date comparisons/arithmetic native TPU integer ops.
"""

from __future__ import annotations

import numpy as np

_EPOCH = np.datetime64("1970-01-01", "D")


def date_str_to_days(values) -> np.ndarray:
    """Parse an array of 'YYYY-MM-DD' strings to int32 day numbers."""
    arr = np.asarray(values, dtype="datetime64[D]")
    return (arr - _EPOCH).astype(np.int32)


def days_to_date_str(days) -> np.ndarray:
    """Render int day numbers back to 'YYYY-MM-DD' strings."""
    arr = _EPOCH + np.asarray(days).astype("timedelta64[D]")
    return np.datetime_as_string(arr, unit="D")


def single_date_to_days(s: str) -> int:
    return int((np.datetime64(s, "D") - _EPOCH).astype(np.int64))


def days_to_ymd(days: np.ndarray):
    """Vectorized civil-date split: returns (year, month, day) int arrays."""
    d = _EPOCH + np.asarray(days).astype("timedelta64[D]")
    y = d.astype("datetime64[Y]").astype(np.int64) + 1970
    m = d.astype("datetime64[M]").astype(np.int64) % 12 + 1
    day = (d - d.astype("datetime64[M]")).astype(np.int64) + 1
    return y, m, day
