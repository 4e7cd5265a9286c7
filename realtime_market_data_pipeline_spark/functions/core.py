"""Scalar expression helpers — the reference's §2.6 function surface.

All are thin compositions of ``pyspark.sql.functions`` Column expressions so
they stay inside whole-stage codegen (no Python UDFs on the hot path).

Reference citations:
- duration shorthand normalizer: src/consumer/spark_streaming.py:25-43
- ms → timestamp cast:           src/consumer/spark_streaming.py:68
- log_return:                    src/consumer/spark_streaming.py:89
- volatility proxy:              src/consumer/spark_streaming.py:96-97
- symbol normalization:          src/producer/synthetic_ticks.py:86
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_DURATION_SHORTHAND = re.compile(r"^\s*(\d+)\s*(ms|s|m|min|h|d)\s*$", re.IGNORECASE)
_UNIT_LONG = {
    "ms": "milliseconds",
    "s": "seconds",
    "m": "minutes",
    "min": "minutes",
    "h": "hours",
    "d": "days",
}


def normalize_duration(text: str) -> str:
    """``"60s" -> "60 seconds"``; long forms pass through unchanged.

    Engine-level (config) utility, not a row expression — Spark's window /
    watermark APIs take the long form.
    """
    m = _DURATION_SHORTHAND.match(text)
    if m:
        return f"{m.group(1)} {_UNIT_LONG[m.group(2).lower()]}"
    return text.strip()


def duration_seconds(text: str) -> int:
    """Duration string → whole seconds (for oracle-side epoch bucketing)."""
    qty, unit = normalize_duration(text).split(" ", 1)
    if not unit.endswith("s"):  # Spark accepts singular forms ("1 day")
        unit += "s"
    factor = {
        "milliseconds": None,
        "seconds": 1,
        "minutes": 60,
        "hours": 3600,
        "days": 86400,
    }[unit]
    if factor is None:
        raise ValueError(f"sub-second duration not supported here: {text}")
    return int(qty) * factor


def ms_to_timestamp(col: Column | str) -> Column:
    """Epoch-millis → timestamp (``timestamp_millis`` keeps it exact)."""
    return F.timestamp_millis(F.col(col) if isinstance(col, str) else col)


def timestamp_to_ms(col: Column | str) -> Column:
    return F.unix_millis(F.col(col) if isinstance(col, str) else col)


def normalize_symbol(col: Column | str) -> Column:
    return F.upper(F.trim(F.col(col) if isinstance(col, str) else col))


def log_return(last_price: Column, first_price: Column) -> Column:
    """``log(last/first)``, guarded to NULL for non-positive prices (the
    reference assumes positive GBM prices; at scale dirty input must not
    poison the whole aggregate)."""
    ok = (first_price > 0) & (last_price > 0)
    return F.when(ok, F.log(last_price / first_price))


def volatility_proxy(log_ret: Column, num_ticks: Column) -> Column:
    """``abs(log_return) / sqrt(num_ticks + 1)`` — the reference's proxy
    formula (the faithful-intent intra-window stddev lives in
    ``operators.features.intra_window_volatility``)."""
    return F.abs(log_ret) / F.sqrt(num_ticks + F.lit(1))
