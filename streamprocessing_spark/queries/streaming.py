"""Streaming queries — the reference's raison d'être on Structured
Streaming, still oracle-checked: each stream is replayed to completion
(AvailableNow) and its end-of-stream result must equal the batch SQL.

Streaming-only semantics (update-mode emission per input, checkpoint
recovery across restarts — the RainStormWithFail analogue) are asserted in
tests/test_streaming.py, where a batch oracle can't express them.

Execution shape: all the pipelines are independent bounded replays of
the same source, so the first query call starts ALL of them concurrently
and awaits the batch (start_memory_sink); results are memoized per
(session, sf_dir). Sequential drains would each pay stream startup +
state-store spin-up; the concurrent batch costs roughly the slowest one.
This mirrors a production deployment too — multiple streaming queries
sharing one SparkSession is the normal multi-sink topology.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamprocessing_spark.functions import money as M

from streamprocessing_spark.registry import register
from streamprocessing_spark.streaming.replay import (
    run_to_memory_sink,
    start_memory_sink,
    stream_events,
)

# ---------------------------------------------------------------------------
# Pipeline builders: (spark, sf_dir) -> streaming DataFrame, plus the output
# mode each needs. Registered query fns below are thin memoized wrappers.


def _build_count_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        stream_events(spark, sf_dir)
        .select(F.col("event_type").alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _build_append_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        stream_events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("key"),
            # double→string rendering differs across engines (scientific
            # vs shortest-decimal; printf halfway modes differ too) —
            # scale to integer first: integer→string is identical anywhere
            F.floor(F.col("value") * 10000 + 0.5).cast("long").cast("string").alias("value"),
        )
    )


def _build_dedup_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        stream_events(spark, sf_dir)
        .select("event_id", "event_type")
        .dropDuplicates(["event_id"])
    )


def _build_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        stream_events(spark, sf_dir)
        .select("event_id", "event_type", "ts")
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type")
    )


def _build_windowed_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.concat(
                F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss"), F.lit(" UTC")
            ).alias("window_start"),
            "event_type",
            "cnt",
        )
    )


def _build_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir).withWatermark("ts", "2 hours")
    return (
        ev.groupBy(F.session_window("ts", "2 hours"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.concat(
                F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss"),
                F.lit(" UTC"),
            ).alias("session_start"),
            "n_events",
        )
    )


def _build_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.concat(
                F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss"), F.lit(" UTC")
            ).alias("window_start"),
            "event_type",
            "cnt",
        )
    )


def _build_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocessing_spark.sources.readers import load_table

    ev = stream_events(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("cnt"),
        M.money(F.sum(M.tt(F.col("value")))).alias("total_value"),
    )


def _build_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    def ev(t: str, pre: str) -> DataFrame:
        return (
            stream_events(spark, sf_dir)
            .where(F.col("event_type") == t)
            .select(
                F.col("user_id").alias(f"{pre}_user"),
                F.col("ts").alias(f"{pre}_ts"),
                F.col("event_id").alias(f"{pre}_id"),
            )
            .withWatermark(f"{pre}_ts", "1 hour")
        )

    p, c = ev("purchase", "p"), ev("click", "c")
    joined = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
    )
    return joined.select(F.col("p_id").alias("purchase_id"), F.col("c_id").alias("click_id"))


def _build_stateful_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocessing_spark.streaming.stateful import threshold_crossing_alerts

    return threshold_crossing_alerts(stream_events(spark, sf_dir))


def _build_dedup_then_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    return (
        ev.select("event_id", "event_type", "ts")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.concat(
                F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss"),
                F.lit(" UTC"),
            ).alias("window_start"),
            "event_type",
            "cnt",
        )
    )


def _build_complete_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        stream_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("user_id"))
        .limit(10)
    )


def _build_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    def side(t: str, pre: str) -> DataFrame:
        return (
            stream_events(spark, sf_dir)
            .where(F.col("event_type") == t)
            .select(
                F.col("user_id").alias(f"{pre}_user"),
                F.col("ts").alias(f"{pre}_ts"),
                F.col("event_id").alias(f"{pre}_id"),
            )
            .withWatermark(f"{pre}_ts", "1 hour")
        )

    p, c = side("purchase", "p"), side("click", "c")
    return (
        p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts")),
            "left_outer",
        )
        .select(F.col("p_id").alias("purchase_id"), "p_ts", F.col("c_id").alias("click_id"))
    )


def _build_hourly_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    hourly = ev.groupBy(F.window("ts", "1 hour")).agg(F.count(F.lit(1)).alias("cnt"))
    return (
        hourly.groupBy(F.window(F.col("window"), "1 day"))
        .agg(
            F.sum("cnt").alias("n_events"),
            F.max("cnt").alias("max_hourly"),
            F.count(F.lit(1)).alias("n_hours"),
        )
        .select(
            F.concat(
                F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss"),
                F.lit(" UTC"),
            ).alias("window_start"),
            "n_events",
            "max_hourly",
            "n_hours",
        )
    )


def _build_windowed_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact windowed uniques via CHAINED streaming aggregations: the
    # first agg dedups (window, user), the second counts survivors —
    # the production form of "hourly unique users" that needs no sketch
    # (approx_count_distinct) and no unbounded dedup state (the
    # watermark closes windows, so per-window state retires)
    ev = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    per_user = ev.groupBy(F.window("ts", "1 hour"), "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        per_user.groupBy("window")
        .agg(F.count(F.lit(1)).alias("distinct_users"), F.sum("n").alias("n_events"))
        .select(
            F.concat(
                F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss"), F.lit(" UTC")
            ).alias("window_start"),
            "distinct_users",
            "n_events",
        )
    )


def _build_session_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocessing_spark.streaming.stateful import timeout_sessions

    return timeout_sessions(stream_events(spark, sf_dir))


def _build_malformed_json_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir).select("event_id", "event_type", "value")
    js = ev.select(
        F.when(
            F.col("event_id") % 11 == 0,
            F.concat(F.lit("x"), F.to_json(F.struct("event_id", "event_type", "value"))),
        )
        .otherwise(F.to_json(F.struct("event_id", "event_type", "value")))
        .alias("raw")
    )
    # PERMISSIVE from_json returns an ALL-NULL ROW (not NULL) for a
    # malformed record — measured, not assumed; the in-struct corrupt
    # field is the reliable detector (and carries the raw line, the
    # dead-letter payload)
    parsed = js.select(
        F.from_json(
            F.col("raw"),
            "event_id bigint, event_type string, value double, _corrupt string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("r"),
    )
    bad = F.col("r._corrupt").isNotNull()
    return parsed.select(F.col("r.event_type").alias("event_type"), "r", bad.alias("bad")).groupBy(
        "event_type"
    ).agg(
        F.sum(F.when(~F.col("bad"), 1).otherwise(0)).cast("long").alias("n_parsed"),
        F.sum(F.when(F.col("bad"), 1).otherwise(0)).cast("long").alias("n_quarantined"),
        F.coalesce(
            F.sum(
                F.when(
                    ~F.col("bad"),
                    F.floor(F.col("r.value") * 100.0 + F.lit(0.5)).cast("long"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("clean_cents"),
    )


_PIPELINES: dict[str, tuple] = {
    "streaming_count_update": (_build_count_update, "complete"),
    "streaming_append_sink": (_build_append_sink, "append"),
    "streaming_dedup_by_id": (_build_dedup_by_id, "append"),
    "streaming_dedup_watermarked": (_build_dedup_watermarked, "append"),
    "streaming_windowed_count": (_build_windowed_count, "complete"),
    "streaming_session_window": (_build_session_window, "complete"),
    "streaming_sliding_window": (_build_sliding_window, "complete"),
    "streaming_static_join": (_build_static_join, "complete"),
    "streaming_interval_join": (_build_interval_join, "append"),
    "streaming_stateful_alerts": (_build_stateful_alerts, "append"),
    "streaming_session_timeout": (_build_session_timeout, "append"),
    "streaming_dedup_then_window": (_build_dedup_then_window, "append"),
    "streaming_hourly_daily_rollup": (_build_hourly_daily_rollup, "append"),
    "streaming_left_outer_join": (_build_left_outer_join, "append"),
    "streaming_complete_topk": (_build_complete_topk, "complete"),
    "streaming_windowed_distinct_users": (_build_windowed_distinct_users, "append"),
    "streaming_malformed_json_quarantine": (_build_malformed_json_quarantine, "complete"),
}

# (applicationId, sf_dir) -> {query_name: memory-sink table name}
_DRAINED: dict[tuple[str, str], dict[str, str]] = {}


def _drained(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Return `name`'s end-of-stream result, draining ALL pipelines
    concurrently on first use (memoized per session + sf_dir). Falls back
    to a solo sequential drain if the batch start fails."""
    key = (spark.sparkContext.applicationId, sf_dir)
    sinks = _DRAINED.get(key)
    if sinks is not None and name in sinks:
        return spark.table(sinks[name])
    started = []
    try:
        table_names: dict[str, str] = {}
        for qname, (build, mode) in _PIPELINES.items():
            q, sink_name, cleanup = start_memory_sink(build(spark, sf_dir), mode)
            started.append((q, cleanup))
            table_names[qname] = sink_name
        for q, cleanup in started:
            q.awaitTermination()
            cleanup()
        _DRAINED[key] = table_names
        return spark.table(table_names[name])
    except Exception as exc:
        # concurrent batch failed (e.g. another test holds conflicting
        # session state) — surface the root cause (a silent fallback
        # would hide a broken pipeline behind uniformly slow results),
        # stop stragglers and drop their throwaway checkpoints, then run
        # just the requested pipeline sequentially, unmemoized
        import sys

        print(
            f"streaming concurrent drain failed ({type(exc).__name__}: {exc}); "
            f"falling back to a solo drain of {name!r}",
            file=sys.stderr,
        )
        for q, cleanup in started:
            try:
                q.stop()
            except Exception:  # noqa: BLE001
                pass
            cleanup()
        build, mode = _PIPELINES[name]
        return run_to_memory_sink(build(spark, sf_dir), mode)


@register(
    "streaming_count_update",
    oracle="""
    SELECT event_type AS key, count(*) AS cnt FROM events GROUP BY event_type
    """,
    tags=("streaming", "reference", "aggregate"),
)
def streaming_count_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 as a true stream (rainstorm/server.go:344-355): keyed running
    count with managed state, replayed to end-of-stream. The state store
    plays the role of the reference's in-memory map + WAL replay; the
    batch oracle checks the final counts (SURVEY.md §4.3.1)."""
    return _drained(spark, sf_dir, "streaming_count_update")


@register(
    "streaming_append_sink",
    oracle="""
    SELECT event_id AS key,
           CAST(CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS VARCHAR) AS value
    FROM events WHERE event_type = 'purchase'
    """,
    tags=("streaming", "reference", "sink"),
)
def streaming_append_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O10/D2 (rainstorm/server.go:306-310, batchLogger.go): stateless
    filter+project streamed to an append sink. The reference's 500 ms
    batch flush is the micro-batch trigger; here AvailableNow drains the
    bounded replay."""
    return _drained(spark, sf_dir, "streaming_append_sink")


@register(
    "streaming_dedup_by_id",
    oracle="""
    SELECT event_id, event_type FROM events
    """,
    tags=("streaming", "reference", "dedup"),
)
def streaming_dedup_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9 exactly-once dedup as streaming state (rainstorm/server.go:292-298):
    dropDuplicates over the stream holds seen-ids in the state store — the
    reference's unbounded processedRecordIDs map (SURVEY.md §4.3.4), which
    production jobs bound with withWatermark before dropDuplicates."""
    return _drained(spark, sf_dir, "streaming_dedup_by_id")


@register(
    "streaming_dedup_watermarked",
    oracle="""
    SELECT event_id, event_type FROM events
    """,
    tags=("streaming", "reference", "dedup", "watermark"),
)
def streaming_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BOUNDED-state form of streaming_dedup_by_id —
    dropDuplicatesWithinWatermark holds a seen-id only until the
    watermark passes its event time, fixing the reference's unbounded
    processedRecordIDs map (rainstorm/server.go:34,292-298; SURVEY.md
    §4.3.4 flags exactly this leak). On this bounded replay every id is
    unique, so end-of-stream output equals the plain dedup; on an
    infinite stream this variant is the only one whose state does not
    grow forever."""
    return _drained(spark, sf_dir, "streaming_dedup_watermarked")


@register(
    "streaming_windowed_count",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS VARCHAR) || ' UTC' AS window_start,
           event_type,
           count(*) AS cnt
    FROM events GROUP BY 1, 2
    """,
    tags=("streaming", "window", "event-time"),
)
def streaming_windowed_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window + watermark — the operator family the
    reference lacks entirely (SURVEY.md §2.1: no event-time, no
    watermarks). Complete output mode so end-of-stream equals the batch
    rollup including still-open windows."""
    return _drained(spark, sf_dir, "streaming_windowed_count")


@register(
    "streaming_session_window",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 2 HOUR
                  THEN 1 ELSE 0 END AS new_sess
      FROM events),
    sess AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM marked)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') || ' UTC' AS session_start,
           count(*) AS n_events
    FROM sess GROUP BY user_id, sess_id
    """,
    tags=("streaming", "window", "event-time", "session"),
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (2-hour inactivity gap) — gap-based sessionization
    with managed state, an operator class the reference cannot express.
    The oracle rebuilds identical sessions with the SQL islands technique
    (new-session flag -> running sum -> group)."""
    return _drained(spark, sf_dir, "streaming_session_window")


@register(
    "streaming_session_timeout",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sidx
      FROM ordered),
    s AS (
      SELECT user_id, sidx, min(ts) AS t_start, max(ts) AS t_end, count(*) AS n
      FROM sess GROUP BY 1, 2),
    mxs AS (SELECT user_id, max(sidx) AS mx_idx FROM s GROUP BY 1),
    w AS (SELECT max(ts) AS mx FROM events)
    SELECT s.user_id,
           strftime(s.t_start, '%Y-%m-%d %H:%M:%S') || ' UTC' AS session_start,
           CAST(s.n AS BIGINT) AS n_events
    FROM s JOIN mxs ON mxs.user_id = s.user_id CROSS JOIN w
    WHERE s.sidx < mxs.mx_idx
       OR (epoch_us(s.t_end) // 1000 + 1800000) < (epoch_us(w.mx) // 1000 - 3600000)
    """,
    tags=("streaming", "stateful", "event-time", "session", "timeout"),
)
def streaming_session_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVENT-TIME-TIMEOUT sessionization (applyInPandasWithState +
    GroupStateTimeout.EventTimeTimeout) — the third custom state machine,
    and the one that exercises the timeout surface: sessions close either
    when a later event reveals a > 30-min gap (data-driven, in-kernel) or
    when the WATERMARK passes last_event + gap and Spark invokes the
    kernel with state.hasTimedOut for a key that went silent — the
    mechanism a pure batch fold cannot express. Sessions still open at
    end-of-stream never emit.

    The oracle states that contract exactly in SQL: islands
    sessionization, emit every non-final session (its closing event
    always arrives) plus final sessions whose timeout timestamp
    (last_ms + 30 min) lies strictly below the final watermark
    (global max event time in ms − the 1-hour delay) — that final
    timeout round runs in the no-data micro-batch AvailableNow schedules
    after the last data batch to advance the watermark. State is 3 longs
    per live session and is REMOVED at close — bounded by active users,
    the production sizing story for timeout-based state."""
    return _drained(spark, sf_dir, "streaming_session_timeout")


@register(
    "streaming_dedup_then_window",
    oracle="""
    WITH mx AS (SELECT max(ts) AS mx FROM events)
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') || ' UTC'
             AS window_start,
           event_type,
           count(*) AS cnt
    FROM events CROSS JOIN mx
    GROUP BY date_trunc('hour', ts), event_type, mx.mx
    HAVING epoch_us(date_trunc('hour', ts) + INTERVAL 1 HOUR)
           <= epoch_us(mx.mx) - CAST(3600 AS BIGINT) * 1000000
    """,
    tags=("streaming", "stateful", "dedup", "window", "event-time"),
)
def streaming_dedup_then_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED STATEFUL OPERATORS in one streaming query — the Spark
    3.5/4 capability older engines (and older Spark) lack: a
    watermark-bounded dedup (dropDuplicatesWithinWatermark state)
    feeding an event-time tumbling aggregation (window state) in a
    single micro-batch pipeline, no intermediate sink. Append mode, so
    only FINALIZED windows emit — the oracle states the exact contract:
    the batch rollup restricted to windows whose end precedes the final
    watermark (global max event time − 1 h; the no-data batch
    AvailableNow schedules after the last data batch advances it).
    Ids are unique on this replay so the dedup stage passes everything
    through — its state machinery still runs; duplicate-collapse
    semantics are pinned by the standalone dedup queries."""
    return _drained(spark, sf_dir, "streaming_dedup_then_window")


@register(
    "streaming_complete_topk",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY user_id
    ORDER BY cnt DESC, user_id ASC
    LIMIT 10
    """,
    tags=("streaming", "stateful", "topk", "sort"),
)
def streaming_complete_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS LEADERBOARD — sorted top-10 users by event count in
    COMPLETE output mode: Structured Streaming forbids sorting in
    append/update (rows could still be displaced by late data), so a
    live top-k REQUIRES complete mode, where every trigger re-emits the
    whole (tiny) result; the memory/console/foreachBatch sink swaps the
    leaderboard atomically per batch. That mode-capability coupling is
    the surface under test. Deterministic tiebreak (cnt DESC, user
    ASC); end-of-stream table equals the batch top-10 exactly. State is
    the per-user count map (entity-dimension); the sort runs on the
    aggregated dimension, never on events."""
    return _drained(spark, sf_dir, "streaming_complete_topk")


@register(
    "streaming_left_outer_join",
    oracle="""
    WITH mx AS (
      SELECT least(
        (SELECT max(ts) FROM events WHERE event_type = 'purchase'),
        (SELECT max(ts) FROM events WHERE event_type = 'click')) AS mx),
    p AS (SELECT event_id AS purchase_id, user_id, ts
          FROM events WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS click_id, user_id AS cu, ts AS cts
          FROM events WHERE event_type = 'click')
    SELECT p.purchase_id, c.click_id
    FROM p
    LEFT JOIN c ON c.cu = p.user_id
               AND c.cts >= p.ts - INTERVAL 1 HOUR
               AND c.cts <= p.ts
    CROSS JOIN mx
    WHERE c.click_id IS NOT NULL
       OR epoch_us(p.ts) < epoch_us(mx.mx) - CAST(7200 AS BIGINT) * 1000000
    """,
    tags=("streaming", "join", "event-time", "stateful"),
)
def streaming_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the attribution shape
    where a purchase with NO preceding click must still emit (with a
    NULL click) so the funnel's denominator is complete. Completes the
    registered stream-join family (inner interval join:
    streaming_interval_join; outer NULL-emission previously only
    test-asserted).

    The oracled region is chosen from the JOIN'S OWN watermark algebra,
    not from observation: matched rows emit as they arrive (all kept);
    an unmatched left row is GUARANTEED evicted-and-emitted only once
    the watermark passes its entire match window plus the right side's
    state retention — p_ts < wm − 1h under the final AvailableNow
    watermark, where wm = min(max purchase ts, max click ts) − 1h: each
    side's withWatermark sits AFTER its event_type filter, so only the
    join's own inputs advance it (the hostile sweep's far-future
    unrelated event proved the global max(ts) overclaims the region).
    Rows between that bound and the stream end may legally still sit in
    state; Spark's actual boundary was measured mid-region and is an
    implementation detail. Both the query and the
    batch oracle restrict the unmatched set to the guaranteed region
    with the identical strict epoch comparison, so the check is exact.
    Production consumers apply the same restriction when reconciling an
    outer-join stream against batch truth."""
    from streamprocessing_spark.sources.readers import load_table

    drained = _drained(spark, sf_dir, "streaming_left_outer_join")
    # the join's watermark tracks its FILTERED inputs (each side's
    # withWatermark sits after the event_type filter), so the guaranteed
    # region derives from min(max purchase ts, max click ts) — NOT the
    # global max(ts): an unrelated far-future event (hostile fixture's
    # solo_type outlier) never advances this join's watermark
    ev = load_table(spark, sf_dir, "events")
    mx = (
        ev.where(F.col("event_type") == "purchase")
        .agg(F.max("ts").alias("mp"))
        .crossJoin(ev.where(F.col("event_type") == "click").agg(F.max("ts").alias("mc")))
        .select(F.least("mp", "mc").alias("mx"))
    )
    return (
        drained.crossJoin(F.broadcast(mx))
        .where(
            F.col("click_id").isNotNull()
            | (
                F.col("p_ts").cast("long")
                < F.col("mx").cast("long") - F.lit(7200)
            )
        )
        .select("purchase_id", "click_id")
    )


@register(
    "streaming_hourly_daily_rollup",
    oracle="""
    WITH mx AS (SELECT max(ts) AS mx FROM events),
    hourly AS (
      SELECT date_trunc('hour', ts) AS h, count(*) AS cnt
      FROM events GROUP BY 1),
    daily AS (
      SELECT date_trunc('day', h) AS d,
             CAST(sum(cnt) AS BIGINT) AS n_events,
             CAST(max(cnt) AS BIGINT) AS max_hourly,
             CAST(count(*) AS BIGINT) AS n_hours
      FROM hourly GROUP BY 1)
    SELECT strftime(d, '%Y-%m-%d %H:%M:%S') || ' UTC' AS window_start,
           n_events, max_hourly, n_hours
    FROM daily CROSS JOIN mx
    WHERE epoch_us(d + INTERVAL 1 DAY)
          <= epoch_us(mx.mx) - CAST(3600 AS BIGINT) * 1000000
    """,
    tags=("streaming", "stateful", "window", "event-time", "aggregation"),
)
def streaming_hourly_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED event-time AGGREGATIONS in one streaming query (the
    second multi-stateful-operator shape, complementing
    streaming_dedup_then_window's dedup→window): an hourly tumbling
    count feeding a daily rollup of the finalized hourly rows —
    window-on-window via F.window over the upstream window column
    (SPARK-40925), no intermediate sink, one shared watermark. The
    production topology this stands for is the metrics-downsampling
    cascade (raw → 1 h → 1 d retention tiers) as a single pipeline.

    Append-mode contract, stated exactly by the oracle: a day emits iff
    its end precedes the final watermark (global max event time − 1 h);
    every emitted day is COMPLETE — all its hours finalized first (hour
    end ≤ day end ≤ watermark), propagated within the same micro-batch,
    so n_events is the full-day event count, max_hourly the true peak
    hour, n_hours the day's distinct hours that had data."""
    return _drained(spark, sf_dir, "streaming_hourly_daily_rollup")


@register(
    "streaming_sliding_window",
    oracle="""
    WITH win AS (
      SELECT date_trunc('hour', ts) AS ws, event_type FROM events
      UNION ALL
      SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws, event_type FROM events
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') || ' UTC' AS window_start,
           event_type, count(*) AS cnt
    FROM win GROUP BY 1, 2
    """,
    tags=("streaming", "window", "event-time"),
)
def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2 h width, 1 h slide): every event lands in exactly
    two windows; the oracle materializes both grid alignments with a
    UNION ALL."""
    return _drained(spark, sf_dir, "streaming_sliding_window")


@register(
    "streaming_static_join",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS cnt, floor(sum(CAST(floor(e.value * 10000.0 + 0.5) AS BIGINT))
                                          / 10000.0 * 100.0 + 0.5) / 100.0 AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("streaming", "join"),
)
def streaming_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: each micro-batch joins against the (broadcast)
    customer dimension — the standard enrichment topology; state is only
    held for the aggregate, not the join."""
    return _drained(spark, sf_dir, "streaming_static_join")


@register(
    "streaming_interval_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    """,
    tags=("streaming", "join", "event-time"),
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: each purchase joined to the same
    user's clicks in the hour before it. Watermarks on BOTH sides bound
    the join state (the reference cannot express any join, let alone a
    time-bounded streaming one). State is keyed by user and pruned as the
    watermark passes ts + 1 h."""
    return _drained(spark, sf_dir, "streaming_interval_join")


@register(
    "streaming_stateful_alerts",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id, ts,
             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
    c AS (
      SELECT user_id, event_id, ts, v,
             sum(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM s)
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') || ' UTC' AS ts,
           CAST(cum // 5000000 AS BIGINT) AS crossing_n
    FROM c
    WHERE cum // 5000000 > (cum - v) // 5000000
    """,
    tags=("streaming", "stateful", "custom-operator"),
)
def streaming_stateful_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """USER-DEFINED stateful operator (applyInPandasWithState): per-user
    running purchase total emitting an alert row each time the total
    crosses a new multiple of 500.00 — the reference's arbitrary-stateful
    -op contract (rainstorm/server.go:344-361) beyond what built-in
    streaming aggregates express (conditional, data-dependent emission).
    Exact-integer money arithmetic makes the crossing sequence
    reproducible by the batch running-sum oracle; see
    streaming/stateful.py for the determinism contract."""
    return _drained(spark, sf_dir, "streaming_stateful_alerts")


def _build_transition_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocessing_spark.streaming.stateful import event_transitions

    return event_transitions(stream_events(spark, sf_dir))


_PIPELINES["streaming_transition_pairs"] = (_build_transition_pairs, "append")


@register(
    "streaming_transition_pairs",
    oracle="""
    SELECT user_id,
           event_id AS from_event_id,
           nid AS to_event_id,
           event_type AS from_type,
           ntype AS to_type
    FROM (
      SELECT user_id, event_id, event_type,
             lead(event_id) OVER w AS nid,
             lead(event_type) OVER w AS ntype
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    WHERE nid IS NOT NULL
    """,
    tags=("streaming", "stateful", "custom-operator"),
)
def streaming_transition_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING event-transition linking (applyInPandasWithState): each
    user's events are chained into (previous → current) pairs with the
    last event carried in per-key state, so pairs form correctly ACROSS
    micro-batch boundaries — the streaming producer of
    event_transition_matrix's input, and the second custom state
    machine next to streaming_stateful_alerts (that one accumulates and
    emits conditionally; this one emits per-row with a lookback — the
    lag()/lead() shape no built-in streaming aggregate expresses).

    End-of-stream output must equal the batch lead() window exactly —
    the oracle — which holds precisely because the state carry works;
    dropping the state would lose one pair per (user, batch boundary).
    State per key: one long + one short string, the minimum a lookback
    can hold; shuffles once on user_id, the state store's own key."""
    return _drained(spark, sf_dir, "streaming_transition_pairs")


@register(
    "streaming_windowed_distinct_users",
    oracle="""
    WITH mx AS (SELECT max(ts) AS mx FROM events),
    win AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS h,
             CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1)
    SELECT strftime(h, '%Y-%m-%d %H:%M:%S') || ' UTC' AS window_start,
           distinct_users, n_events
    FROM win CROSS JOIN mx
    WHERE epoch_us(h + INTERVAL 1 HOUR)
          <= epoch_us(mx.mx) - CAST(3600 AS BIGINT) * 1000000
    """,
    tags=("streaming", "window", "aggregate"),
)
def streaming_windowed_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly EXACT unique users as a stream — the chained-aggregation
    shape (dedup agg feeding a count agg) Spark only allows on streams
    with watermarked windows on both levels: level 1 holds (window,
    user) state, level 2 counts survivors; the watermark retires whole
    windows so neither level's state is unbounded (the
    dropDuplicates-without-watermark leak, §4.3.4, structurally can't
    happen here). The production "hourly uniques" dashboard query with
    no sketch error bar. Append-mode contract stated exactly by the
    oracle (the hourly_daily_rollup algebra): a window emits iff its end
    precedes the final watermark (max event time − 1 h), and every
    emitted window is complete."""
    return _drained(spark, sf_dir, "streaming_windowed_distinct_users")


@register(
    "streaming_malformed_json_quarantine",
    oracle="""
    SELECT CASE WHEN event_id % 11 = 0 THEN NULL ELSE event_type END AS event_type,
           CAST(count(*) FILTER (event_id % 11 <> 0) AS BIGINT) AS n_parsed,
           CAST(count(*) FILTER (event_id % 11 = 0) AS BIGINT) AS n_quarantined,
           CAST(coalesce(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                         FILTER (event_id % 11 <> 0), 0) AS BIGINT) AS clean_cents
    FROM events
    GROUP BY 1
    """,
    tags=("streaming", "source", "json", "dirty-data", "aggregate"),
)
def streaming_malformed_json_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-data ingest AS A STREAM — the from_json quarantine law,
    which differs from BOTH batch readers: the DSV reader partial-parses
    (corrupt rows keep their parseable prefix), the JSONL reader nulls
    the whole row but keeps the raw line in _corrupt_record, and
    from_json — the only option when the payload arrives as a COLUMN of
    an already-running stream (Kafka value, log line) — returns an
    ALL-NULL row with the raw text preserved in the in-struct corrupt
    field (measured: it does NOT return a null struct). Same deterministic
    corruption fixture as the batch twins (event_id % 11 prefix
    garbage); running per-type parsed/quarantined counts + exact clean
    cents as update-state aggregates, replayed to end-of-stream and
    checked against the batch oracle. At 100 TB this is the first stage
    of every streaming crawl ingester: quarantined rows fork to a
    dead-letter sink by the same `r IS NULL` predicate the counts use."""
    return _drained(spark, sf_dir, "streaming_malformed_json_quarantine")


def _build_ivf_pairs_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocessing_spark.queries.similarity import SRP_THRESHOLD
    from streamprocessing_spark.streaming.ivf_pairs import ivf_pairs_stream

    return ivf_pairs_stream(spark, sf_dir, SRP_THRESHOLD)


_PIPELINES["streaming_ivf_pairs_ingest"] = (_build_ivf_pairs_ingest, "append")


def _ivf_pairs_oracle() -> str:
    from streamprocessing_spark.queries.similarity import (
        SRP_THRESHOLD,
        _sql_ivf_pairs_oracle,
    )

    return _sql_ivf_pairs_oracle(SRP_THRESHOLD, 3)


@register(
    "streaming_ivf_pairs_ingest",
    oracle=_ivf_pairs_oracle(),
    tags=("streaming", "similarity", "dedup", "llm-pipeline", "approx"),
)
def streaming_ivf_pairs_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the cell-local IVF pair tier (round 9, VERDICT
    r08 next #7): embeddings stream in, a stateless kernel assigns each
    to its nassign=3 nearest cells against the OFFLINE-TRAINED
    quantizer (same deterministic K = ceil(sqrt(n)) smallest-id
    centroids as the batch tier), and applyInPandasWithState keyed on
    cent_id holds each cell's vectors as managed state — every
    micro-batch emits exactly the NEW qualifying pairs (new×state cross
    + new×new triangle, the cell_verify dim-order fold, blockwise under
    hot cells). End-of-stream output is bit-identical to
    ivf_cosine_pairs — same full oracle, the strongest check a stateful
    streaming operator can carry. State is cell-partitioned exactly
    like the batch layout (streaming/ivf_pairs.py docstring for the
    100 TB shape); checkpoint-restart equality is pinned in
    tests/test_round9_ops.py."""
    from streamprocessing_spark.functions.text import portable_round

    out = _drained(spark, sf_dir, "streaming_ivf_pairs_ingest")
    return out.select(
        "id_a", "id_b", portable_round(F.col("cos"), 6).alias("cos_sim")
    ).distinct()


# Streaming paragraph-ingest dedup state: (applicationId, sf_dir) -> the
# completed store's base path (a STRING — module globals must never hold
# a DataFrame; shipping.ensure_shippable pickles this module by value).
_PARA_INGEST: dict[tuple[str, str], str] = {}


def _para_ingest_base(spark: SparkSession, sf_dir: str) -> str:
    """Drain the documents table through ParagraphIngestDedup once per
    (session, sf_dir) — three doc_id%3 single-file chunks replayed as
    one-batch-per-file micro-batches (the same staging law as the
    ingest-dedup and checkpoint-restart tests) — and return the
    completed store's base dir. Lives under the non-/tmp scratch root
    (the harness box reaps /tmp mid-run)."""
    import hashlib
    import os
    import shutil
    from pathlib import Path

    from streamprocessing_spark.queries.dedup import JACCARD_THRESHOLD
    from streamprocessing_spark.sources.readers import load_table
    from streamprocessing_spark.streaming.ingest_dedup import ParagraphIngestDedup
    from streamprocessing_spark.operators import dedup as D

    key = (spark.sparkContext.applicationId, sf_dir)
    base = _PARA_INGEST.get(key)
    if base is not None and os.path.isfile(os.path.join(base, "_DONE")):
        return base

    scratch = os.environ.get(
        "SPARK_GRAFT_LOCAL_DIR",
        str(Path(__file__).resolve().parent.parent.parent / ".spark-local"),
    )
    tag = hashlib.md5(f"{key[0]}:{sf_dir}".encode()).hexdigest()[:12]
    base = os.path.join(scratch, "graft_para_ingest", tag)
    shutil.rmtree(base, ignore_errors=True)  # a half-built prior attempt
    src = os.path.join(base, "src")
    os.makedirs(src, exist_ok=True)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_total = D.paragraph_df(docs, "doc_id", "text").count()
    for i in range(3):
        d = os.path.join(base, f"chunk{i}")
        docs.where((F.col("doc_id") % 3) == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        shutil.copyfile(os.path.join(d, part), os.path.join(src, f"c{i}.parquet"))

    sink = ParagraphIngestDedup(
        base=os.path.join(base, "state"),
        threshold=JACCARD_THRESHOLD,
        n_total_units=n_total,
    )
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(sink.foreach_batch)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    with open(os.path.join(base, "_DONE"), "w") as fh:
        fh.write("ok")
    _PARA_INGEST[key] = base
    return base


# safe top-level import: queries.dedup precedes queries.streaming in
# registry._QUERY_MODULES and imports nothing from this module
from streamprocessing_spark.queries.dedup import SQL_PARA_PROFILE as _SQL_PARA_PROFILE  # noqa: E402


@register(
    "streaming_paragraph_dedup_ingest",
    oracle=_SQL_PARA_PROFILE,
    tags=("streaming", "dedup", "llm-pipeline", "lsh", "scale-tier"),
)
def streaming_paragraph_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the PARAGRAPH dedup tier (round 10, VERDICT r09
    next #4): documents stream in as micro-batches, each batch explodes
    into paragraphs and probes the PERSISTED band store under the
    count-scaled banding law — (r, b) trained offline from the corpus
    paragraph count, the ivf_pairs_stream precedent — emitting each
    verified pair exactly once (new×stored probe + new×new self-join;
    streaming/ingest_dedup.ParagraphIngestDedup). Per-batch work is
    O(batch × bands) against bucketed state: the corpus is never
    re-paired, which is the whole point at a 100 TB crawl cadence.

    END state equals the batch tier bit-for-bit: this query derives the
    per-document duplication profile from the streamed pair store and
    carries dedup_paragraph_minhash's oracle VERBATIM
    (queries.dedup.SQL_PARA_PROFILE) — same keep-first law (a paragraph
    is a duplicate iff it pairs at Jaccard ≥ 0.8 with any lower pid),
    same rounding, same packing. Checkpoint-restart equality is pinned
    in tests/test_round10_ops.py."""
    from streamprocessing_spark.functions.text import portable_round
    from streamprocessing_spark.operators import dedup as D
    from streamprocessing_spark.sources.readers import load_table
    from streamprocessing_spark.streaming.ingest_dedup import ParagraphIngestDedup

    base = _para_ingest_base(spark, sf_dir)
    sink = ParagraphIngestDedup(base=f"{base}/state", threshold=0.0)
    pairs = sink.dup_pairs(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    per_doc = (
        D.paragraph_df(docs, "doc_id", "text")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_paras"))
        .hint("merge")
    )
    dup_doc = (
        pairs.select(F.col("id_b").alias("pid"))
        .distinct()
        .groupBy(F.expr(f"pid div {D.PARA_ID_STRIDE}").alias("doc_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup_paras"))
    )
    return per_doc.join(dup_doc, "doc_id").select(
        "doc_id",
        "n_paras",
        "n_dup_paras",
        portable_round(F.col("n_dup_paras") / F.col("n_paras"), 4).alias(
            "dup_fraction"
        ),
    )




_CDC_INGEST: dict[tuple[str, str], str] = {}


def _cdc_ingest_base(spark: SparkSession, sf_dir: str) -> str:
    """Drain the documents table through CdcIngestDedup once per
    (session, sf_dir) — the same three doc_id%3 single-file chunks /
    one-batch-per-file staging law as the paragraph twin — and return
    the completed store's base dir."""
    import hashlib
    import os
    import shutil
    from pathlib import Path

    from streamprocessing_spark.sources.readers import load_table
    from streamprocessing_spark.streaming.ingest_dedup import CdcIngestDedup

    key = (spark.sparkContext.applicationId, sf_dir)
    base = _CDC_INGEST.get(key)
    if base is not None and os.path.isfile(os.path.join(base, "_DONE")):
        return base

    scratch = os.environ.get(
        "SPARK_GRAFT_LOCAL_DIR",
        str(Path(__file__).resolve().parent.parent.parent / ".spark-local"),
    )
    tag = hashlib.md5(f"{key[0]}:{sf_dir}".encode()).hexdigest()[:12]
    base = os.path.join(scratch, "graft_cdc_ingest", tag)
    shutil.rmtree(base, ignore_errors=True)  # a half-built prior attempt
    src = os.path.join(base, "src")
    os.makedirs(src, exist_ok=True)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for i in range(3):
        d = os.path.join(base, f"chunk{i}")
        docs.where((F.col("doc_id") % 3) == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        shutil.copyfile(os.path.join(d, part), os.path.join(src, f"c{i}.parquet"))

    sink = CdcIngestDedup(base=os.path.join(base, "state"), threshold=0.0)
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(sink.foreach_batch)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    with open(os.path.join(base, "_DONE"), "w") as fh:
        fh.write("ok")
    _CDC_INGEST[key] = base
    return base


from streamprocessing_spark.queries.dedup import SQL_CDC_PROFILE as _SQL_CDC_PROFILE  # noqa: E402


@register(
    "streaming_cdc_chunks_ingest",
    oracle=_SQL_CDC_PROFILE,
    tags=("streaming", "dedup", "llm-pipeline", "exact-tier"),
)
def streaming_cdc_chunks_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the CDC chunk tier (round 10): documents stream
    in as micro-batches, each batch chunks under the shared content-
    defined boundary law (boundaries are LOCAL — the stream split can
    never move them; the shift-resistance that makes CDC the right
    streaming unit), fingerprints, and probes the persisted fp-min
    store, emitting min-links whose forest carries the keep-first law
    exactly (streaming/ingest_dedup.CdcIngestDedup — an instance is a
    duplicate iff demoted by some link). Per-batch work is O(batch)
    against the fp-keyed min store, corpus never re-chunked.

    END state equals the batch tier bit-for-bit: this query derives the
    per-document profile from the streamed link store and carries
    dedup_cdc_chunks's oracle VERBATIM (queries.dedup.SQL_CDC_PROFILE)
    — same chunking, same keep-first law, same rounding. Checkpoint-
    restart equality and retry idempotence pinned in
    tests/test_round10_ops.py."""
    from streamprocessing_spark.functions.text import portable_round
    from streamprocessing_spark.operators import dedup as D
    from streamprocessing_spark.sources.readers import load_table
    from streamprocessing_spark.streaming.ingest_dedup import (
        CDC_ID_STRIDE,
        CdcIngestDedup,
    )

    base = _cdc_ingest_base(spark, sf_dir)
    sink = CdcIngestDedup(base=f"{base}/state", threshold=0.0)
    dups = sink.dup_instances(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    per_doc = (
        D.cdc_chunk_df(docs, "doc_id", "text")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_chunks"))
        .hint("merge")
    )
    dup_doc = dups.groupBy(
        F.expr(f"id div {CDC_ID_STRIDE}").alias("doc_id")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_dup_chunks"))
    return per_doc.join(dup_doc, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce(F.col("n_dup_chunks"), F.lit(0)).cast("long").alias("n_dup_chunks"),
        portable_round(
            F.coalesce(F.col("n_dup_chunks"), F.lit(0)) / F.col("n_chunks"), 4
        ).alias("dup_fraction"),
    )


_CONT_INGEST: dict[tuple[str, str], str] = {}


def _containment_ingest_base(spark: SparkSession, sf_dir: str) -> str:
    """Drain the documents table through ContainmentIngestDedup once per
    (session, sf_dir) — same three doc_id%3 single-file staging law as
    the other ingest twins."""
    import hashlib
    import os
    import shutil
    from pathlib import Path

    from streamprocessing_spark.sources.readers import load_table
    from streamprocessing_spark.streaming.ingest_dedup import ContainmentIngestDedup

    key = (spark.sparkContext.applicationId, sf_dir)
    base = _CONT_INGEST.get(key)
    if base is not None and os.path.isfile(os.path.join(base, "_DONE")):
        return base

    scratch = os.environ.get(
        "SPARK_GRAFT_LOCAL_DIR",
        str(Path(__file__).resolve().parent.parent.parent / ".spark-local"),
    )
    tag = hashlib.md5(f"{key[0]}:{sf_dir}".encode()).hexdigest()[:12]
    base = os.path.join(scratch, "graft_cont_ingest", tag)
    shutil.rmtree(base, ignore_errors=True)  # a half-built prior attempt
    src = os.path.join(base, "src")
    os.makedirs(src, exist_ok=True)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for i in range(3):
        d = os.path.join(base, f"chunk{i}")
        docs.where((F.col("doc_id") % 3) == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        shutil.copyfile(os.path.join(d, part), os.path.join(src, f"c{i}.parquet"))

    sink = ContainmentIngestDedup(base=os.path.join(base, "state"), threshold=0.0)
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(sink.foreach_batch)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    with open(os.path.join(base, "_DONE"), "w") as fh:
        fh.write("ok")
    _CONT_INGEST[key] = base
    return base


from streamprocessing_spark.queries.dedup import SQL_CONTAINMENT_PAIRS as _SQL_CONT_PAIRS  # noqa: E402


@register(
    "streaming_containment_ingest",
    oracle=_SQL_CONT_PAIRS,
    tags=("streaming", "dedup", "llm-pipeline", "exact-tier"),
)
def streaming_containment_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the EXACT-CONTAINMENT tier (round 10) —
    completing streaming coverage of every dedup granularity: documents
    stream in as micro-batches, each batch extracts positional
    3-shingles under the shared law and runs the per-offset alignment
    verify in three directional slices against the persisted shingle
    store (new⊂new, new⊂stored, stored⊂new — the last is the direction
    a fingerprint store cannot see: a newly arrived superstring demotes
    documents ingested long ago). Each directional pair is emitted
    exactly once, in the batch where the later document arrives; probe
    join volume concentrates on duplicated spans (the Σf² law of the
    batch tier, f split across arrival times).

    END state equals dedup_substring_containment bit-for-bit — this
    query returns the streamed pair store under the batch tier's oracle
    VERBATIM (queries.dedup.SQL_CONTAINMENT_PAIRS). Checkpoint-restart
    and retry idempotence pinned in tests/test_round10_ops.py."""
    from streamprocessing_spark.streaming.ingest_dedup import ContainmentIngestDedup

    base = _containment_ingest_base(spark, sf_dir)
    sink = ContainmentIngestDedup(base=f"{base}/state", threshold=0.0)
    return sink.containment_pairs(spark)
