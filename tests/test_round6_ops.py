"""Round-3 additions: graph view eviction + this round's operators."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_release_op_views_unpins_graph_cache(spark, sf_dir):
    """The shared graph view is an eagerly-built cache; release_op_views
    must drop the temp view AND leave no pinned RDD behind (a session
    touching many sf_dirs must not accumulate blocks — the round-1
    plugin-cache lesson applied to graph state)."""
    from streamprocessing_spark.queries import graph as G

    G.release_op_views(spark)  # clean slate (other tests may have built it)
    baseline = len(spark.sparkContext._jsc.getPersistentRDDs())
    df = G._op_view(spark, sf_dir)
    assert df.count() > 0
    assert len(G._OP_VIEWS) == 1
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) > baseline

    released = G.release_op_views(spark)
    assert released == 1
    assert len(G._OP_VIEWS) == 0
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) <= baseline
    # idempotent, and the view is really gone from the catalog
    assert G.release_op_views(spark) == 0
    import hashlib

    name = "graft_op_" + hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    assert not spark.catalog.tableExists(name)
    # a fresh call transparently rebuilds (staleness contract: snapshot
    # until release, fresh data after)
    assert G._op_view(spark, sf_dir).count() == df.count()
    G.release_op_views(spark)


def test_op_view_registry_pickles_empty():
    """graph.py ships by value to executors — its view registry must
    serialize as an EMPTY mapping (a DataFrame holds a SparkContext,
    which must never ride along in a task closure)."""
    import pickle

    from streamprocessing_spark.queries.graph import _OpViewRegistry

    reg = _OpViewRegistry()
    reg["k"] = object()  # stand-in for a DataFrame
    clone = pickle.loads(pickle.dumps(reg))
    assert isinstance(clone, _OpViewRegistry) and len(clone) == 0
