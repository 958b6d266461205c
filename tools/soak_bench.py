"""Unbounded-source streaming soak (VERDICT r04 item #6): run the three
custom-stateful pipelines against a RATE source for a bounded wall time
and record state-store rows per micro-batch — state boundedness as a
MEASUREMENT (plateau), not an argument.

Every other streaming check in this repo drains a finite file source
with AvailableNow; this is the one run where the source never ends and
only watermark eviction / state-machine removal keeps state flat.

Design of the synthetic stream (rate source gives (timestamp, value)):
- event time advances ~STEP_S seconds per row (so hours of event time
  pass per wall minute and the 1-hour watermark evicts many times over),
- user_id = hash(value) % N_KEYS — recurring keys with geometric
  inter-arrival gaps, so timeout sessions OPEN AND CLOSE continuously,
- event_id = value (unique; the dedup state exercises insert+evict),
- a quarter of rows are 'purchase' with a value driving the
  threshold-crossing machine.

Pipelines (same operator graphs as queries/streaming.py, fed by rate):
  stateful_alerts    applyInPandasWithState, NoTimeout   (state ~ users)
  session_timeout    applyInPandasWithState, EventTimeTimeout
  dedup_then_window  dropDuplicatesWithinWatermark -> windowed agg

Writes SOAK.json: per query, per-batch {batch, input_rows, state_rows}
plus a plateau verdict: max(state) over the last third of batches must
not exceed PLATEAU_SLACK x the max over the middle third (a leak grows
monotonically; a plateau doesn't).

Usage: python tools/soak_bench.py [--secs 45] [--out SOAK.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_KEYS = 500
STEP_S = 2          # event-time seconds per row
RATE = 2000         # rows per wall second
PLATEAU_SLACK = 1.5


def rate_events(spark):
    from pyspark.sql import functions as F

    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(RATE))
        .load()
        .select(
            F.col("value").alias("event_id"),
            F.expr(f"pmod(hash(value), {N_KEYS})").cast("string").alias("user_id"),
            F.expr(
                "element_at(array('view','click','purchase','view','signup','view','click','view'), "
                "CAST(pmod(value, 8) + 1 AS INT))"
            ).alias("event_type"),
            F.timestamp_micros(
                (F.lit(1_700_000_000_000_000) + F.col("value") * (STEP_S * 1_000_000))
            ).alias("ts"),
            (F.expr("pmod(value, 97)") * 7.5).alias("value"),
        )
    )


def build_stateful_alerts(spark):
    from streamprocessing_spark.streaming.stateful import threshold_crossing_alerts

    return threshold_crossing_alerts(rate_events(spark))


def build_session_timeout(spark):
    from streamprocessing_spark.streaming.stateful import timeout_sessions

    return timeout_sessions(rate_events(spark))


def build_dedup_then_window(spark):
    from pyspark.sql import functions as F

    ev = rate_events(spark).withWatermark("ts", "1 hour")
    return (
        ev.select("event_id", "event_type", "ts")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("window.start").alias("window_start"), "event_type", "cnt")
    )


PIPELINES = {
    "streaming_stateful_alerts": build_stateful_alerts,
    "streaming_session_timeout": build_session_timeout,
    "streaming_dedup_then_window": build_dedup_then_window,
}


def soak_one(spark, name, build, secs, scratch):
    df = build(spark)
    q = (
        df.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", f"{scratch}/ckpt_{name}")
        .start()
    )
    progress = []
    deadline = time.time() + secs
    seen = set()
    try:
        while time.time() < deadline:
            time.sleep(1.0)
            for p in q.recentProgress:
                bid = p["batchId"]
                if bid in seen:
                    continue
                seen.add(bid)
                state = sum(
                    op.get("numRowsTotal", 0) for op in p.get("stateOperators", [])
                )
                progress.append(
                    {
                        "batch": bid,
                        "input_rows": p.get("numInputRows", 0),
                        "state_rows": state,
                    }
                )
    finally:
        q.stop()
    progress.sort(key=lambda r: r["batch"])
    # plateau verdict over batches that have state populated
    st = [r["state_rows"] for r in progress if r["state_rows"] > 0]
    verdict = None
    if len(st) >= 9:
        third = len(st) // 3
        mid, last = max(st[third : 2 * third]), max(st[2 * third :])
        verdict = {
            "mid_third_max": mid,
            "last_third_max": last,
            "plateau": last <= mid * PLATEAU_SLACK,
        }
    return {"batches": progress, "verdict": verdict}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=int, default=45)
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent / "SOAK.json"))
    args = ap.parse_args()

    import tempfile

    from streamprocessing_spark.session import get_spark

    spark = get_spark("soak")
    out = {
        "config": {
            "rows_per_sec": RATE,
            "event_secs_per_row": STEP_S,
            "n_keys": N_KEYS,
            "secs_per_query": args.secs,
            "watermark": "1 hour (event time)",
        }
    }
    with tempfile.TemporaryDirectory() as td:
        for name, build in PIPELINES.items():
            t0 = time.time()
            res = soak_one(spark, name, build, args.secs, td)
            res["wall_secs"] = round(time.time() - t0, 1)
            out[name] = res
            v = res["verdict"]
            print(f"{name}: {len(res['batches'])} batches, verdict={v}")
    Path(args.out).write_text(json.dumps(out, indent=1))
    ok = all(
        out[n]["verdict"] and out[n]["verdict"]["plateau"] for n in PIPELINES
    )
    print("PLATEAU" if ok else "STATE GROWTH DETECTED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
