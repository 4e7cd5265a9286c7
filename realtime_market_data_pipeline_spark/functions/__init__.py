from realtime_market_data_pipeline_spark.functions.core import (
    normalize_duration,
    ms_to_timestamp,
    timestamp_to_ms,
    log_return,
    volatility_proxy,
    normalize_symbol,
)

__all__ = [
    "normalize_duration",
    "ms_to_timestamp",
    "timestamp_to_ms",
    "log_return",
    "volatility_proxy",
    "normalize_symbol",
]
