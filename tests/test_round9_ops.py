"""Round-9 hardening tests.

1. The hot-cell law for the cell-local IVF verify (VERDICT r08 What's
   wrong #1 / ADVICE medium): cell_verify must generate upper-triangle
   pairs blockwise — a single near-duplicate cluster landing in one
   cent_id (the shape dedup corpora actually produce) must run with
   bounded kernel memory and produce exactly the brute-force answer.
   The test crafts a corpus where every non-centroid vector assigns to
   ONE cell, sized so the kernel's row-block loop runs multiple blocks.
2. The publish-time GC spare laws (ADVICE r08 low): '*.build-*'
   siblings are never reaped (a concurrent builder of a NEWER
   fingerprint would ENOENT on its os.rename), and published siblings
   younger than _IVF_GC_MIN_AGE_S survive (a live session on an older
   fingerprint may still be scanning them).
"""

from __future__ import annotations

import numpy as np
import pytest

from streamprocessing_spark.registry import all_specs

SPECS = all_specs()


@pytest.mark.slow
def test_cell_verify_hot_cell_blockwise(spark):
    """Every tail vector lands in centroid 0's cell (~2.4k rows in one
    cent_id → the kernel's 2M-pair row-block loop runs 3+ blocks); the
    output must equal the brute-force threshold pairs over that cell."""
    from streamprocessing_spark.operators import similarity as S

    m, d = 2500, 8
    thr = 0.99999
    # k = ceil(sqrt(2500)) = 50 centroids = the 50 smallest ids.
    # id 0: the hot direction e0. ids 1..49: deterministic random unit
    # vectors orthogonal to e0, so every tail vector (e0 + eps*e1, eps
    # small) has cos≈1 with centroid 0 and small cos with every other
    # centroid — the tail co-assigns to cent 0 with nassign=1: ONE hot
    # cell. The expected set is computed from a numpy replica of the
    # operator's own assignment law (argmax cos, ties to lowest cent).
    rng = np.random.default_rng(9)
    vecs = np.zeros((m, d))
    vecs[0, 0] = 1.0
    w = rng.normal(size=(49, d - 1))
    vecs[1:50, 1:] = w / np.linalg.norm(w, axis=1, keepdims=True)
    # eps caps at 0.49 so cos with cent 0 (≥0.898) always beats any
    # random centroid (≤~0.4) — the whole tail lands in cent 0's cell.
    eps = np.arange(50, m) * 2e-4
    vecs[50:, 0] = 1.0
    vecs[50:, 1] = eps

    nrm = np.linalg.norm(vecs, axis=1)
    cos_cent = (vecs @ vecs[:50].T) / np.outer(nrm, nrm[:50])
    assign = np.argmax(cos_cent, axis=1)  # ties → lowest cent, like the op
    hot_size = int((assign == 0).sum())
    assert hot_size > 2_000  # the construction really is one hot cell

    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(m)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r.id_a, r.id_b): r.cos_sim
        for r in S.ivf_cosine_pairs(emb, thr, nassign=1).collect()
    }

    # Brute force per assigned cell: exactly the pairs the op must emit.
    want: dict[tuple[int, int], float] = {}
    for c in np.unique(assign):
        ids = np.nonzero(assign == c)[0]
        if len(ids) < 2:
            continue
        M = vecs[ids]
        cs = (M @ M.T) / np.outer(nrm[ids], nrm[ids])
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = cs[ii, jj] >= thr
        for a, b in zip(ii[keep], jj[keep]):
            lo, hi = int(min(ids[a], ids[b])), int(max(ids[a], ids[b]))
            want[(lo, hi)] = cs[a, b]

    assert len(want) > 10_000  # non-vacuous: a genuinely hot cell
    assert set(got) == set(want)
    for k_, v in want.items():
        # matmul vs dim-order fold differ in final bits; both round to
        # the same 6 decimals except exactly on a rounding boundary
        assert got[k_] == pytest.approx(round(v, 6), abs=2e-6)


@pytest.mark.slow
def test_persisted_ivf_gc_spares_builds_and_young(spark, tmp_path, monkeypatch):
    """Publish-time GC must skip YOUNG '*.build-*' siblings (a live
    concurrent builder) and YOUNG published siblings; OLD superseded
    published indexes AND old orphaned build dirs (dead builders — a
    live one writes continuously, so old-mtime means crashed; ADVICE
    r09) are reaped."""
    import hashlib
    import os
    import shutil

    from streamprocessing_spark.queries import similarity as SIM

    scratch = str(tmp_path / "scratch")
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", scratch)

    src = "/root/testdata/sf0.001/embeddings.parquet"
    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    shutil.copyfile(src, os.path.join(corpus, "embeddings.parquet"))

    fn = SPECS["ann_ivf_persisted_topk"].fn
    assert fn(spark, corpus).count() > 0

    sf_root = os.path.join(
        scratch,
        "graft_ivf",
        SIM._IVF_LAYOUT_V,
        hashlib.md5(corpus.encode()).hexdigest()[:12],
    )
    # Plant four foreign siblings: a LIVE concurrent builder's tmp dir
    # (mtime = now), a YOUNG published index, an OLD published index,
    # and an OLD orphaned build dir (crashed builder — contains a stale
    # part file so the recursive newest-mtime walk sees only old files).
    build_sib = os.path.join(sf_root, "feedfacefeedface.build-deadbeef")
    young_sib = os.path.join(sf_root, "0123456789abcdef")
    old_sib = os.path.join(sf_root, "fedcba9876543210")
    dead_build = os.path.join(sf_root, "deadc0dedeadc0de.build-cafebabe")
    for p in (build_sib, young_sib, old_sib, dead_build):
        os.makedirs(p)
    past = 10**9  # 2001 — far beyond any grace window
    with open(os.path.join(dead_build, "part-00000.parquet"), "w") as fh:
        fh.write("stale")
    os.utime(os.path.join(dead_build, "part-00000.parquet"), (past, past))
    os.utime(old_sib, (past, past))
    os.utime(dead_build, (past, past))

    # Regenerate the corpus (new mtime → new fingerprint → publish+GC).
    ep = os.path.join(corpus, "embeddings.parquet")
    os.utime(ep, ns=(os.stat(ep).st_atime_ns, os.stat(ep).st_mtime_ns + 10**9))
    assert fn(spark, corpus).count() > 0

    assert os.path.isdir(build_sib), "young (live) build dirs are never reaped"
    assert os.path.isdir(young_sib), "young published siblings survive the grace window"
    assert not os.path.isdir(old_sib), "old superseded indexes are reaped"
    assert not os.path.isdir(dead_build), "old orphaned build dirs are reaped (ADVICE r09)"
    # The previous fingerprint of THIS corpus was young → also spared.
    live = [s for s in os.listdir(sf_root) if ".build-" not in s]
    assert len(live) == 3  # new index + previous young index + planted young


@pytest.mark.slow
def test_streaming_ivf_pairs_checkpoint_restart(spark, tmp_path):
    """The streaming IVF pair tier must survive a stop/restart on one
    checkpoint: run 1 drains only chunk 0, run 2 (same checkpoint, new
    sink) drains the late-arriving chunks, and (a) the union of
    emissions equals the batch tier bit-for-bit, (b) no pair is emitted
    twice across runs (a pair emits when its LATER vector arrives —
    exactly-once over restarts is the state-store contract)."""
    import os
    import shutil

    import pyspark.sql.functions as F

    from streamprocessing_spark.operators.similarity import ivf_cosine_pairs
    from streamprocessing_spark.queries.similarity import SRP_THRESHOLD
    from streamprocessing_spark.sources.readers import load_table
    from streamprocessing_spark.streaming.ivf_pairs import ivf_pairs_stream

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    src = str(tmp_path / "src")
    os.makedirs(src)
    chunk_files = []
    for i in range(3):
        d = str(tmp_path / f"chunk{i}")
        emb.where((F.col("vec_id") % 3) == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        chunk_files.append((os.path.join(d, part), os.path.join(src, f"c{i}.parquet")))
    schema = spark.read.parquet(chunk_files[0][0]).schema
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run_once():
        # a FILE sink: memory sinks refuse checkpoint recovery, and the
        # restart is exactly what this test exists to exercise
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            ivf_pairs_stream(spark, sf, SRP_THRESHOLD, source=stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def part_files():
        return {
            os.path.join(r, f)
            for r, _, fs in os.walk(out_dir)
            for f in fs
            if f.endswith(".parquet")
        }

    shutil.copyfile(*chunk_files[0])
    run_once()
    files1 = part_files()
    first = [tuple(r) for r in spark.read.parquet(*files1).collect()]

    shutil.copyfile(*chunk_files[1])
    shutil.copyfile(*chunk_files[2])
    run_once()
    files2 = part_files() - files1
    second = [tuple(r) for r in spark.read.parquet(*files2).collect()]

    assert first and second  # both runs really emitted pairs
    assert not (set(first) & set(second))  # exactly-once across restart

    import math

    # the consumer's portable_round(·, 6) law, applied driver-side
    got = sorted(
        {(a, b, math.floor(c * 1e6 + 0.5) / 1e6) for a, b, c in first + second}
    )
    want_df = ivf_cosine_pairs(emb, SRP_THRESHOLD, nassign=3)
    want = sorted(tuple(r) for r in want_df.collect())
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    for g, w in zip(got, want):
        assert g[2] == w[2]


def test_paragraph_df_window_law(spark):
    """paragraph_df partitions the token stream into exact 25-token
    windows: pid packing, per-doc window count, boundary (len % 25), and
    the lossless space-join/re-tokenize round trip."""
    from streamprocessing_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [
            (7, " ".join(f"w{i}" for i in range(60))),   # 3 windows: 25/25/10
            (8, " ".join(f"w{i}" for i in range(25))),   # exactly 1 window
            (9, "one two"),                               # 1 short window
            (10, "!!! ???"),                              # no tokens → no paras
        ],
        "doc_id long, text string",
    )
    rows = {r.pid: r for r in D.paragraph_df(docs, "doc_id", "text").collect()}
    by_doc = {}
    for pid, r in rows.items():
        by_doc.setdefault(r.doc_id, []).append(pid)
    assert sorted(by_doc[7]) == [7 * D.PARA_ID_STRIDE + j for j in range(3)]
    assert by_doc[8] == [8 * D.PARA_ID_STRIDE]
    assert by_doc[9] == [9 * D.PARA_ID_STRIDE]
    assert 10 not in by_doc
    assert rows[7 * D.PARA_ID_STRIDE].ptext == " ".join(f"w{i}" for i in range(25))
    assert rows[7 * D.PARA_ID_STRIDE + 2].ptext == " ".join(
        f"w{i}" for i in range(50, 60)
    )


def test_substring_containment_law(spark):
    """Containment is CONTIGUOUS-substring exact: a doc embedded verbatim
    in a larger doc is found (with its occurrence count), a doc sharing
    all tokens in a different ORDER is not, and exact duplicates appear
    in both directions."""
    inner = "alpha beta gamma delta"
    host = f"intro words {inner} middle filler {inner} closing words"
    scrambled = "delta gamma beta alpha"  # same tokens, wrong order
    twin_a = "same exact twin text here"
    docs = spark.createDataFrame(
        [(1, inner), (2, host), (3, scrambled), (4, twin_a), (5, twin_a)],
        "doc_id long, text string",
    )
    from streamprocessing_spark.operators import dedup as D

    got = {
        (r.id_inner, r.id_outer): r.n_occurrences
        for r in D.substring_containment_pairs(docs, "doc_id", "text").collect()
    }
    assert got[(1, 2)] == 2  # inner occurs twice in host
    assert (3, 2) not in got and (2, 3) not in got  # order matters
    assert got[(4, 5)] == 1 and got[(5, 4)] == 1  # exact dups both ways
    assert (2, 1) not in got  # host not contained in inner


def test_parapairs_build_never_broadcasts(spark):
    """The ×100 broadcast cliff (round 9): Catalyst's static size
    estimate for the explode-derived paragraph relation collapses, so
    without the merge hint every join in the pair build — including the
    band-bucket SELF-join — planned BroadcastHashJoin and collected the
    bucket relation to the driver (maxResultSize abort at ×100). Pin
    the fixed shape: zero broadcast anywhere in the pair-build plan, at
    every corpus size (paragraph-derived relations are corpus-sized by
    construction — never a dimension)."""
    from streamprocessing_spark.operators import dedup as D
    from streamprocessing_spark.queries.dedup import JACCARD_THRESHOLD
    from streamprocessing_spark.sources.readers import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    paras = D.paragraph_df(d, "doc_id", "text")
    # round 10: the build checkpoints its shingle set (a materialization
    # barrier a caller-side hint cannot cross), so the anti-broadcast
    # discipline rides the merge_hint parameter instead of a df hint
    pairs = D.minhash_lsh_pairs_scaled(
        paras, "pid", "ptext", JACCARD_THRESHOLD, paras.count(), merge_hint=True
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, plan
    assert "BroadcastExchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan


@pytest.mark.slow
def test_paragraph_query_plans_never_broadcast_corpus_relations(spark):
    """Extend the broadcast-cliff pin to the FULL registered queries
    (ADVICE r09): dedup_paragraph_minhash's whole plan must carry zero
    broadcasts (both join sides are one-row-per-doc, corpus-sized at
    100 TB), and dedup_paragraph_keep's only permissible broadcast is
    the left-anti dup-pid sliver — a relation derived from the
    MATERIALIZED pair view, so AQE sizes it from runtime stats rather
    than the collapsed static estimate that caused the ×100 cliff; its
    counts-onto-agg reassembly join must stay SortMergeJoin."""
    from streamprocessing_spark.queries import dedup as QD

    sf = "/root/testdata/sf0.001"
    prof = QD.dedup_paragraph_minhash(spark, sf)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, plan
    assert "BroadcastExchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan

    keep = QD.dedup_paragraph_keep(spark, sf)
    kplan = keep._jdf.queryExecution().executedPlan().toString()
    for line in kplan.splitlines():
        if "BroadcastHashJoin" in line:
            assert "LeftAnti" in line, kplan  # only the dup-pid sliver
    assert "SortMergeJoin" in kplan, kplan  # the hinted reassembly join
