"""RainStormJob facade: plugin contract semantics (the reference's
stdout-line classification), CSV quoting fidelity, native/plugin parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamprocessing_spark import engine as E


@pytest.fixture()
def records(spark):
    rows = [
        ("f:1", "10,a,1,Stop Sign,\"16\\\" X 42\\\"\",s,Punched Telespar,2010,Warning,n"),
        ("f:2", "11,a,2,\"Streetname, Mast Arm\",sz,s,Square Tube,2011,Regulatory,n"),
        ("f:3", "12,a,3,Yield,sz,s,Punched Telespar,2012,Warning,n"),
    ]
    return spark.createDataFrame(rows, E.RECORD_SCHEMA)


def test_csv_quoting_respected(spark, records):
    """Quoted fields with embedded commas must parse as ONE column
    (FIXTURES.md: the reference uses encoding/csv, not split(','))."""
    job = E.RainStormJob(op1=E.PluginOp(E.app1_op1), op2=E.PluginOp(E.app1_op2), pattern="Mast Arm")
    out = {(r.key, r.value) for r in job.run(records).collect()}
    assert out == {("2", "Streetname, Mast Arm")}


@pytest.mark.slow
def test_vectorized_equals_plugin(spark, records):
    """BatchPluginOp (pandas column ops) must reproduce the per-record
    PluginOp output exactly on both demo apps, including CSV quoting."""
    for ops_pr, ops_vec, pattern in [
        ((E.app1_op1, E.app1_op2), (E.vec_app1_op1, E.vec_app1_op2), "Mast Arm"),
        ((E.app2_op1, E.app2_op2), (E.vec_app2_op1, E.vec_app2_op2), "Punched Telespar"),
    ]:
        pr = E.RainStormJob(op1=E.PluginOp(ops_pr[0]), op2=E.PluginOp(ops_pr[1]), pattern=pattern)
        vec = E.RainStormJob(
            op1=E.BatchPluginOp(ops_vec[0]), op2=E.BatchPluginOp(ops_vec[1]), pattern=pattern
        )
        got_pr = {(r.key, r.value) for r in pr.run(records).collect()}
        got_vec = {(r.key, r.value) for r in vec.run(records).collect()}
        assert got_vec == got_pr, f"pattern={pattern}: {got_vec} != {got_pr}"


def test_batch_csv_parse_fails_loudly_on_malformed_input():
    """The per-record ops raise on empty/short CSV records; the batch
    parse must fail loudly too, never silently drop or NaN-pad
    (engine._parse_csv_batch). Pure-pandas unit test — no Spark."""
    import pandas as pd

    with pytest.raises(ValueError, match="empty CSV record"):
        E._parse_csv_batch(pd.Series(["a,b,c", ""]))
    with pytest.raises(ValueError, match="ragged CSV"):
        E._parse_csv_batch(pd.Series(["a,b,c", "x,y"]))
    ok = E._parse_csv_batch(pd.Series(["a,b,c", "x,y,z"]))
    assert ok.shape == (2, 3) and ok.iloc[1, 2] == "z"


def test_count_contract(spark, records):
    """op returning a bare string routes into the count path and the
    framework emits (key, running-total) — server.go:344-355."""
    job = E.RainStormJob(op1=E.PluginOp(E.app2_op1), op2=E.PluginOp(E.app2_op2), pattern="Punched Telespar")
    out = {(r.key, r.value) for r in job.run(records).collect()}
    assert out == {("Warning", "2")}


def test_mixed_contract_single_op(spark, records):
    """One op may filter, count and flatMap per record in the same run —
    the classification is per record, as in the reference framework."""

    def chaotic(key, value, pattern):
        n = int(value.split(",")[0])
        if n == 10:
            return None  # filtered
        if n == 11:
            return "bucket"  # count path
        return [("a", "1"), ("b", "2")]  # flatMap

    job = E.RainStormJob(op1=E.PluginOp(chaotic), op2=E.PluginOp(lambda k, v, p: [(k, v)]))
    out = sorted((r.key, r.value) for r in job.run(records).collect())
    assert out == [("a", "1"), ("b", "2"), ("bucket", "1")]


def test_native_equals_plugin(spark, records):
    """The declarative fast path must agree with the plugin path."""
    native = E.RainStormJob(
        op1=E.NativeOp(lambda df, p: df.filter(F.col("value").contains(p))),
        op2=E.NativeOp(
            lambda df, p: df.select(
                F.split_part(F.col("value"), F.lit(","), F.lit(3)).alias("key"),
                F.split_part(F.col("value"), F.lit(","), F.lit(4)).alias("value"),
            )
        ),
        pattern="Yield",
    )
    plugin = E.RainStormJob(
        op1=E.PluginOp(E.app1_op1), op2=E.PluginOp(E.app1_op2), pattern="Yield"
    )
    n_out = {(r.key, r.value) for r in native.run(records).collect()}
    p_out = {(r.key, r.value) for r in plugin.run(records).collect()}
    assert n_out == p_out == {("3", "Yield")}


def test_num_tasks_repartition(spark, records):
    job = E.RainStormJob(
        op1=E.PluginOp(E.app1_op1),
        op2=E.PluginOp(lambda k, v, p: [(k, v)]),
        pattern="Sign",
        num_tasks=3,
    )
    assert job.run(records).count() == 1


def test_mixed_contract_cache_released(spark, records):
    """A mixed-contract job persists its tagged stream (both union
    branches consume it); release_plugin_caches must leave no pinned
    RDDs behind — a long-lived session running many jobs must not
    accumulate cached partitions (VERDICT r01 'What's wrong' #3)."""
    E.release_plugin_caches(blocking=True)
    # Track RDD *ids*, not counts: other tests' localCheckpoint RDDs (e.g.
    # connected components) stay pinned until GC and may disappear between
    # the two measurements — only ids NEW since the baseline are ours.
    def _ids():
        return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())

    baseline = _ids()
    job = E.RainStormJob(op1=E.PluginOp(E.app2_op1), op2=E.PluginOp(E.app2_op2), pattern="F")
    out = job.run(records)
    out.collect()
    ours = _ids() - baseline
    assert ours  # cache was live
    released = E.release_plugin_caches(blocking=True)
    assert released >= 1
    assert not (_ids() & ours)


@pytest.mark.slow
def test_plugin_cache_registry_bounded(spark, records):
    """Even without explicit release, the cache registry is bounded:
    running many mixed-contract jobs keeps at most _PLUGIN_CACHE_KEEP
    tagged caches pinned (oldest evicted first)."""
    E.release_plugin_caches(blocking=True)
    baseline = len(spark.sparkContext._jsc.getPersistentRDDs())
    job = E.RainStormJob(op1=E.PluginOp(E.app2_op1), op2=E.PluginOp(E.app2_op2), pattern="F")
    for _ in range(E._PluginCacheRegistry.KEEP + 3):
        job.run(records).collect()
    assert len(E._PLUGIN_CACHES.dfs) <= E._PluginCacheRegistry.KEEP
    E.release_plugin_caches(blocking=True)
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) <= baseline


def test_plugin_cache_registry_pickle_preserves_keep():
    """__reduce__ must carry the instance KEEP bound (ADVICE r09): a
    pickled _QUERY_CACHES (keep=16) reconstructing with the class
    default 4 would silently reintroduce mid-flight eviction. The
    DataFrame list still pickles empty (driver-only state)."""
    import pickle

    rt = pickle.loads(pickle.dumps(E._PluginCacheRegistry(keep=16)))
    assert rt.KEEP == 16 and rt.dfs == []
    rt_q = pickle.loads(pickle.dumps(E._QUERY_CACHES))
    assert rt_q.KEEP == E._QUERY_CACHES.KEEP == 16 and rt_q.dfs == []


@pytest.mark.slow
def test_exec_op_matches_plugin(spark, records):
    """ExecOp (argv/stdout subprocess contract, the reference's literal
    op surface) must agree record-for-record with the in-process plugin
    path on both demo apps."""
    import os

    ops_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "streamprocessing_spark",
        "ops",
    )
    exec_job = E.RainStormJob(
        op1=E.ExecOp(f"{ops_dir}/app2op1.py"),
        op2=E.ExecOp(f"{ops_dir}/app2op2.py"),
        pattern="Punched Telespar",
    )
    plugin_job = E.RainStormJob(
        op1=E.PluginOp(E.app2_op1),
        op2=E.PluginOp(E.app2_op2),
        pattern="Punched Telespar",
    )
    got = {(r.key, r.value) for r in exec_job.run(records).collect()}
    want = {(r.key, r.value) for r in plugin_job.run(records).collect()}
    assert got == want and got
    E.release_plugin_caches(blocking=True)
