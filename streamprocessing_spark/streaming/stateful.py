"""Custom stateful streaming operator via applyInPandasWithState.

The reference's op contract is an arbitrary per-record program holding
per-key state in the worker's memory map, replayed from the WAL on
failure (rainstorm/server.go:344-361; SURVEY.md §2.1 O6/O11). Spark's
built-in streaming aggregates cover the reference's only stateful op
(count), but a USER-DEFINED state machine — state that resets, emits
conditionally, or tracks arbitrary structure — needs the escape hatch:
``groupBy(key).applyInPandasWithState``. The state store plays the WAL's
role (checkpointed, restored on recovery), and the kernel is
Arrow-batched pandas, never per-row Python.

Operator implemented here: per-user THRESHOLD-CROSSING ALERTS. Each
user's purchases accumulate; whenever the running total crosses a new
multiple of the threshold, emit one alert row carrying the crossing
ordinal. This is the canonical "emit on condition, keep running state"
shape (fraud/budget alerting) that windowed aggregation cannot express:
output rows are data-dependent events, not per-window summaries.

Determinism contract (what makes an exact SQL oracle possible):
- money is scaled to int64 tenths-of-basis-points (``floor(v*1e4+0.5)``)
  so accumulation is exact integer arithmetic — no float-order drift
  between Spark, pandas, and DuckDB;
- within a micro-batch each user's rows are sorted by (ts, event_id),
  and the bounded replay delivers batches in file order, so the
  crossing sequence equals the batch ``SUM() OVER (ORDER BY ts,
  event_id)`` — the oracle in queries/streaming.py.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

# Alert every 500.00 of cumulative purchase value, in scaled int units.
ALERT_THRESHOLD_SCALED = 500 * 10_000

_OUT_SCHEMA = "user_id long, event_id long, ts string, crossing_n long"
_STATE_SCHEMA = "cum long"


def _crossings_kernel(key, pdf_iter: Iterator["pd.DataFrame"], state):
    """Kernel: fold this batch's rows for one user into the running
    total; emit a row per threshold crossing; persist the new total.

    State is a single int64 per user — at 100 TB that is one long per
    distinct key in the state store, the minimum any stateful op can
    hold. The per-group sort is local to one Arrow batch."""
    import numpy as np
    import pandas as pd

    (user_id,) = key
    cum = state.get[0] if state.exists else 0

    rows = pd.concat(list(pdf_iter), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
    scaled = np.floor(rows["value"].to_numpy(dtype="float64") * 10_000.0 + 0.5).astype(
        "int64"
    )
    cums = cum + np.cumsum(scaled)
    prevs = np.concatenate(([cum], cums[:-1]))
    k = np.floor_divide(cums, ALERT_THRESHOLD_SCALED)
    k_prev = np.floor_divide(prevs, ALERT_THRESHOLD_SCALED)
    mask = k > k_prev

    state.update((int(cums[-1]) if len(cums) else cum,))

    hit = rows[mask]
    out = pd.DataFrame(
        {
            "user_id": np.full(len(hit), user_id, dtype="int64"),
            "event_id": hit["event_id"].to_numpy(dtype="int64"),
            "ts": hit["ts"].dt.strftime("%Y-%m-%d %H:%M:%S") + " UTC",
            "crossing_n": k[mask].astype("int64"),
        }
    )
    yield out


def threshold_crossing_alerts(events: DataFrame) -> DataFrame:
    """Apply the per-user threshold-crossing state machine to a streaming
    (or batch-replayed) events DataFrame. Shuffles once on user_id — the
    same key the state store partitions by, so every micro-batch routes a
    user's rows to the executor already holding that user's state."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.where(events.event_type == "purchase")
        .select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _crossings_kernel,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
