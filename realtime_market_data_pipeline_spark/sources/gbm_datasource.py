"""Pluggable Spark data source for the GBM tick generator (S7) using the
Python DataSource API (PySpark 4): after ``register_gbm_source(spark)``,

    spark.read.format("gbm_ticks").option("n_per_symbol", 1000).load()
    spark.readStream.format("gbm_ticks").option("ticks_per_batch", 100).load()

yield the reference producer's tick contract (symbol, price, event_time_ms,
event_time) — the same geometric-Brownian walk as
``sources.ticks.synthetic_ticks_batch`` (reference
src/producer/synthetic_ticks.py:51-57), but as a first-class source instead
of a DataFrame-building helper, so downstream code is source-agnostic
(swap "gbm_ticks" ↔ "kafka" ↔ "parquet" without touching the plan).

Distribution model: one input partition per symbol — each executor task
generates its symbol's whole path locally (a price walk is sequential per
symbol, so the symbol is the natural parallelism unit). Determinism: the
z-draws are md5-hash-based functions of (seed, symbol, tick_idx), so any
partition re-run reproduces identical rows (Spark task retries stay
exactly-once). The streaming reader carries the walk's running log-price in
the OFFSET json — replaying a micro-batch from its checkpointed start offset
regenerates bit-identical rows, which is what makes the source recoverable.

Note the hash family differs from the expression-side xxhash64 generator in
``sources.ticks`` (JVM xxhash vs md5 here) — both are deterministic GBM
paths with the same (mu, sigma, pacing) but not bit-identical to each other.
"""

from __future__ import annotations

import hashlib
import json
import math
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TICK_SCHEMA = StructType(
    [
        StructField("symbol", StringType(), False),
        StructField("price", DoubleType(), False),
        StructField("event_time_ms", LongType(), False),
        StructField("event_time", TimestampType(), False),
    ]
)

_DEFAULTS = {
    "symbols": "AAPL,MSFT,GOOG",
    "n_per_symbol": "1000",
    "tps": "50",
    "base_price": "100.0",
    "drift": "0.05",
    "vol": "0.2",
    "seed": "42",
    "start_ms": "1704067200000",  # 2024-01-01T00:00:00Z
    "ticks_per_batch": "100",  # streaming: per symbol per micro-batch
    "max_ticks": "1000000000",  # streaming: stop advancing after this many
}


def _gauss(seed: int, symbol: str, tick_idx: int) -> float:
    """Deterministic N(0,1) from (seed, symbol, tick_idx): md5 → two
    uniforms → Box-Muller. Pure function ⇒ retries and replays reproduce
    identical paths."""
    h = hashlib.md5(f"gbm:{seed}:{symbol}:{tick_idx}".encode()).hexdigest()
    u1 = (int(h[:15], 16) + 1) / (16**15 + 1)  # (0, 1]
    u2 = int(h[15:30], 16) / 16**15  # [0, 1)
    return math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.pi * u2)


class _Params:
    def __init__(self, options: dict):
        get = lambda k: options.get(k, _DEFAULTS[k])  # noqa: E731
        self.symbols: Sequence[str] = [
            s.strip().upper() for s in get("symbols").split(",") if s.strip()
        ]
        self.n_per_symbol = int(get("n_per_symbol"))
        self.tps = int(get("tps"))
        self.base_price = float(get("base_price"))
        self.drift = float(get("drift"))
        self.vol = float(get("vol"))
        self.seed = int(get("seed"))
        self.start_ms = int(get("start_ms"))
        self.ticks_per_batch = int(get("ticks_per_batch"))
        self.max_ticks = int(get("max_ticks"))
        self.per_symbol_tps = max(1, self.tps // max(1, len(self.symbols)))
        self.dt = 1.0 / self.per_symbol_tps

    def increment(self, symbol: str, tick_idx: int) -> float:
        z = _gauss(self.seed, symbol, tick_idx)
        return (self.drift - self.vol**2 / 2.0) * self.dt + self.vol * math.sqrt(
            self.dt
        ) * z

    def row(self, symbol: str, tick_idx: int, log_price: float):
        import datetime as dt

        event_ms = self.start_ms + int(tick_idx * 1000 * self.dt)
        return (
            symbol,
            round(self.base_price * math.exp(log_price), 4),
            event_ms,
            dt.datetime.fromtimestamp(event_ms / 1000.0, dt.timezone.utc).replace(
                tzinfo=None
            ),
        )


class _SymbolPartition(InputPartition):
    def __init__(self, symbol: str):
        self.symbol = symbol


class GbmBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.p = _Params(options)

    def partitions(self) -> Sequence[InputPartition]:
        return [_SymbolPartition(s) for s in self.p.symbols]

    def read(self, partition: _SymbolPartition) -> Iterator[tuple]:
        p, s = self.p, partition.symbol
        log_price = 0.0
        for i in range(p.n_per_symbol):
            log_price += p.increment(s, i)
            yield p.row(s, i, log_price)


class GbmStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch GBM stream: offset = {"tick": next_idx, "logp": {sym:
    running_log_price}} — read(start) is a pure function of the start
    offset, so checkpoint replay regenerates identical micro-batches."""

    def __init__(self, options: dict):
        self.p = _Params(options)

    def initialOffset(self) -> dict:
        return {"tick": 0, "logp": json.dumps({s: 0.0 for s in self.p.symbols})}

    def read(self, start: dict):
        p = self.p
        lo = int(start["tick"])
        hi = min(lo + p.ticks_per_batch, p.max_ticks)
        logp = json.loads(start["logp"])
        rows = []
        for s in p.symbols:
            lp = logp[s]
            for i in range(lo, hi):
                lp += p.increment(s, i)
                rows.append(p.row(s, i, lp))
            logp[s] = lp
        end = {"tick": hi, "logp": json.dumps(logp)}
        return iter(rows), end


class GbmTickDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "gbm_ticks"

    def schema(self) -> StructType:
        return TICK_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return GbmBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> GbmStreamReader:
        return GbmStreamReader(self.options)


def register_gbm_source(spark) -> None:
    spark.dataSource.register(GbmTickDataSource)
