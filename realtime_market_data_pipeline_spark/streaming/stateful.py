"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference skipped the faithful intra-window volatility in streaming
("Requires expanding data rows", spark_streaming.py:92-93) because built-in
streaming aggregates cannot express it: the per-tick log return needs the
*previous* tick's price per symbol, and that previous tick can live in an
earlier micro-batch. This operator keeps (last_price, per-window Welford
accumulators) as keyed state per symbol — the applyInPandasWithState pattern
SURVEY.md §7.3(a) calls for.

Scale notes:
- state per symbol is O(open windows) — bounded by the event-time horizon,
  not input size; at 100 TB keys partition across executors and RocksDB
  holds the state off-heap (session.get_spark pins the provider);
- Welford accumulation is single-pass and mergeable per batch; each batch
  emits only the windows it touched (update semantics);
- ordering contract: per-symbol arrival must be event-time ordered ACROSS
  batches (Kafka per-key partition ordering / time-ordered backfill files —
  the same assumption the reference documents for its backfill,
  README.md:140). Within a batch, rows are sorted here.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from realtime_market_data_pipeline_spark.functions.core import (
    duration_seconds,
    normalize_duration,
)

OUTPUT_SCHEMA = (
    "symbol string, window_start_ms long, window_end_ms long, "
    "realized_vol double, num_returns long"
)
# parallel arrays instead of map<long,struct> — simplest Arrow-stable state
STATE_SCHEMA = (
    "last_price double, last_time_ms long, wkeys array<long>, "
    "wn array<long>, wmean array<double>, wm2 array<double>"
)


def intra_window_vol_stream(
    ticks: DataFrame,
    window: str = "60 seconds",
    horizon: str | None = None,
) -> DataFrame:
    """Streaming twin of ``operators.features.intra_window_volatility``
    (tumbling windows): stddev_samp of per-tick log returns, each return
    assigned to the window of its own tick, with the return chain crossing
    window and batch boundaries exactly like the batch lag() does.

    Emits (symbol, window_start_ms, window_end_ms, realized_vol,
    num_returns) for every window touched in the batch — realized_vol is
    NULL until a window holds ≥2 returns (matching stddev_samp).

    ``horizon`` bounds state for unbounded streams: window accumulators
    whose end falls more than ``horizon`` behind the symbol's latest event
    are dropped after emission (an event-time TTL, the manual analog of a
    watermark for this custom operator). None keeps all windows — fine for
    bounded replays/tests, required OFF at 100 TB."""
    win_ms = duration_seconds(normalize_duration(window)) * 1000
    horizon_ms = (
        duration_seconds(normalize_duration(horizon)) * 1000 if horizon else None
    )

    def update(key, pdf_iter, state):
        import pandas as pd

        (symbol,) = key
        if state.exists:
            last_price, last_time, wkeys, wn, wmean, wm2 = state.get
            stats = {
                int(k): [int(n), float(m), float(s)]
                for k, n, m, s in zip(wkeys, wn, wmean, wm2)
            }
        else:
            last_price, last_time, stats = None, None, {}
        touched: set[int] = set()

        for pdf in pdf_iter:
            pdf = pdf.sort_values("event_time_ms")
            for price, t in zip(
                pdf["price"].astype(float), pdf["event_time_ms"].astype("int64")
            ):
                wk = int((t // win_ms) * win_ms)
                ent = stats.setdefault(wk, [0, 0.0, 0.0])
                touched.add(wk)
                if last_price is not None and last_price > 0 and price > 0:
                    r = math.log(price / last_price)
                    ent[0] += 1
                    delta = r - ent[1]
                    ent[1] += delta / ent[0]
                    ent[2] += delta * (r - ent[1])
                last_price, last_time = float(price), int(t)

        if horizon_ms is not None and last_time is not None:
            cutoff = last_time - horizon_ms
            stats = {k: v for k, v in stats.items() if k + win_ms >= cutoff}
        ks = sorted(stats)
        state.update(
            (
                last_price,
                last_time,
                ks,
                [stats[k][0] for k in ks],
                [stats[k][1] for k in ks],
                [stats[k][2] for k in ks],
            )
        )
        rows = []
        for wk in sorted(touched & set(stats)):  # late-touched may be pruned
            n, _, m2 = stats[wk]
            vol = math.sqrt(m2 / (n - 1)) if n >= 2 else None
            rows.append((symbol, wk, wk + win_ms, vol, n))
        yield pd.DataFrame(
            rows,
            columns=[
                "symbol",
                "window_start_ms",
                "window_end_ms",
                "realized_vol",
                "num_returns",
            ],
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return ticks.groupBy("symbol").applyInPandasWithState(
        update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
