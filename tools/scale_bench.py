"""Scale-curve bench for the top-cost operators.

VERDICT r01 asked for measured evidence that the LSH tiers scale the way
their docstrings claim (shuffle O(docs x bands), candidate pairs from
band buckets — never all-pairs) before the 100x story is trusted. The
driver ships sf0.1 at most, so this tool synthesizes a 10x "sf1.0 proxy"
from sf0.1 and measures the sf0.1 -> sf1.0 wall-clock ratio of:

- dedup_minhash_lsh   (documents, 10x rows)
- dedup_simhash       (documents, 10x rows)
- srp_lsh_cosine_pairs (embeddings, 10x rows)
- copurchase_lift     (lineitem, 10x orders)

Proxy construction (deterministic, no RNG):
- documents: 10 replicas; replica k>0 suffixes every token with the
  replica digit — intra-replica duplicate structure is preserved (the
  corpus dup-rate stays constant, as a real bigger crawl would) while
  cross-replica similarity is zero (no artificial 10-way dup blowup).
- embeddings: 10 replicas; replica k multiplies element d by the sign
  bit of md5(k, d) — norms and intra-replica pairwise similarities are
  EXACTLY preserved (cos(v*p, w*p) == cos(v, w) for a shared +-1
  pattern), while cross-replica cosines are near zero (the product
  pattern p_k * p_j is itself a ~random +-1 vector). A rotation was
  tried first and rejected: rotated copies keep substantial
  autocorrelation with their originals, which inflated the true pair
  count ~12x and made the operator look superlinear when the WORKLOAD
  was superlinear.
- lineitem: 10 replicas with BOTH keys shifted (order AND part) — 10x
  orders and a 10x distinct-part universe with identical basket-size
  distribution, so the pair join's O(orders x basket^2) driver AND the
  co-purchase graph (distinct part pairs — what pagerank/BFS/components
  traverse) both genuinely grow; shifting only the orderkey replicated
  rows while leaving the graph unchanged, silently exempting the
  iterative operators from the measurement.

A linear operator should land near ratio 10 (modulo fixed overheads,
which push it BELOW 10 at these sizes); a quadratic one lands near 100.

Usage: python tools/scale_bench.py [--base /root/testdata/sf0.1]
Prints one JSON line with per-query seconds at both scales and ratios.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from streamprocessing_spark.registry import all_specs  # noqa: E402
from streamprocessing_spark.session import get_spark  # noqa: E402

QUERIES = (
    "dedup_minhash_lsh",
    "dedup_simhash",
    "srp_lsh_cosine_pairs",
    # the SAME near-dup task with IVF-cell candidates (K grows with n):
    # the head-to-head that measures the banding-law remedy
    "ivf_cosine_pairs",
    # ...and the in-family remedy: band resolution r derived from n
    "srp_lsh_cosine_pairs_scaled",
    # ...and with recall-held band growth b(r) ~ p^-r (round 4): the
    # frontier where signature cost buys recall back at high r
    "srp_lsh_cosine_pairs_recall_held",
    # ...and with the verify stage on the Arrow/numpy fast path
    "srp_lsh_cosine_pairs_fast",
    "copurchase_lift",
    # documents-table linear ops: curve + the text-vs-hashed
    # decontamination head-to-head (quantifies the 8-byte-key shuffle win)
    "dedup_exact",
    "decontaminate_benchmark_overlap",
    "decontaminate_hashed",
    "token_rarity_score",
    "corpus_composition_card",
    "pack_documents_greedy",
    "chunk_documents_windows",
    "duplicate_span_coverage",
    "prototypicality_prune",
    # round-2 late additions: iterative graph, semantic dedup, ranking
    "pagerank_copurchase",
    "triangle_count_copurchase",
    "semantic_dedup_keep_srp_baseline",
    # the same cascade on the IVF pair stage: inherits the n^1.5 curve
    # (since round 4 also registered under the unsuffixed production name)
    "semantic_dedup_keep_ivf",
    "kmeans_embeddings",
    "bm25_rank_docs",
    # round-2 final additions: fixpoint peel + LPA (lineitem graph),
    # prefix-filtered exact similarity vs its quadratic baseline,
    # sketch + PQ tiers
    "kcore_parts",
    "label_prop_communities",
    "dedup_jaccard_prefix_filter",
    "countmin_heavy_hitters",
    "inverted_index_postings",
    "ann_pq_adc_topk",
    # round-2 fourth-continuation additions: weighted SSSP (lineitem
    # graph — edges grow with the part universe), the two whole-corpus
    # LSH/audit passes, the Arrow-batched linear kernels, and the
    # BPE-composition fertility audit (vocabulary-sized rounds)
    "sssp_weighted_parts",
    "minhash_jaccard_estimate_audit",
    "embedding_gram_matrix",
    "multimodal_audio_energy",
    "url_domain_stats",
    "tokenizer_fertility_by_source",
    # later round-2 fourth-continuation additions: the FIFO interval
    # join (per-part windows + range join), the ER-components golden
    # record cascade, nested assembly, bitmap words, and the two
    # pair-pipeline composition audits
    "fifo_match_returns",
    # golden_record_parts deliberately absent: its cost driver is the
    # NAME dimension (62 distinct names at every sf) which the proxy
    # does not grow - a ratio would measure fixed overhead only
    "nest_order_lineitems",
    "daily_active_user_bitmap",
    "split_leakage_audit",
    "dedup_tier_agreement",
    # round-3 additions: the de-globalized entity ranks, the bucketed
    # id-gap audit, the zero-shuffle repetition filter, the drift
    # monitor, URL dedup, the KN bigram LM (vocabulary-bounded tail),
    # the cogrouped merge, fanout audit, preference pairs, and the
    # cluster-size histogram (rides the minhash + components curves)
    "rfm_customer_segments",
    "bot_rate_flags",
    "sequence_gap_audit",
    "repetition_dup_trigram_fraction",
    "embedding_drift_chi2_by_dim",
    "url_canonical_dedup",
    "kneser_ney_bigram_lm",
    "cogroup_asof_enrich",
    "join_fanout_audit",
    "preference_pair_assembly",
    "dedup_cluster_size_histogram",
    "multimodal_phash_arrow",
    # round-3 second-session additions over the proxied tables
    # (group_by_all / script_transform ride orders/part — pass-through
    # dimensions, nothing to measure)
    "ccnet_perplexity_buckets",
    "dsir_importance_weights",
    "char_entropy_filter",
    "zipf_law_audit",
    "dedup_signal_auc",
    "weighted_reservoir_sample",
    "degree_assortativity_parts",
    # sketch-guided exact selection over the proxied lineitem
    "exact_median_two_scan",
    # round-4 additions over the proxied documents/events tables
    # (l_diversity / clustering_skipping / blocking ride orders/part —
    # pass-through dimensions, nothing to measure; ann_hubness_audit is
    # the labeled quadratic baseline, same exclusion as knn_label_audit)
    "dedup_containment_join",
    "ngram_novelty_score",
    "interval_overlap_peak_sessions",
    "max_concurrent_sessions_daily",
    "sessionization_gap_sensitivity",
    "late_arrival_audit",
    "variance_optimal_allocation_sample",
    "ann_shard_plan",
    "multimodal_dedup_manifest",
    "longest_duplicated_span",
    "funnel_steps_dropoff",
    # round-5 additions over the proxied documents/embeddings/lineitem
    # tables. Excluded with golden_record-style rationale:
    # fellegi_sunter_scores (part dimension — the proxy does not grow
    # part, a ratio would measure fixed overhead); hits_part_authorities
    # (joins orders⋈lineitem — the proxy shifts l_orderkey without a
    # matching orders proxy, so replicas would drop at the join);
    # psi/emd/hill/acf (events/orders — not proxied).
    "calibration_ece_audit",
    "mutual_information_source_lang",
    "annotator_agreement_kappa",
    "hybrid_rrf_retrieval",
    "matryoshka_truncation_audit",
    "decontaminate_semantic",
    "hard_negative_mining",
    "modularity_communities",
    "multimodal_silence_ratio",
    "source_ablation_impact",
    "conformal_quality_threshold",
    # round-6 additions: the count-scaled MinHash tier (the in-family
    # remedy for dedup_minhash_lsh's frozen 16×4 law), the unsuffixed
    # semantic production name (its r05 row predated the round-4 repoint
    # to the IVF cascade — stale SRP-era curve), and the bucketed join
    # under the proxy-warm discipline (the join alone, not the write)
    "dedup_minhash_lsh_scaled",
    "semantic_dedup_keep",
    "bucketed_join_revenue",
    "bitext_mine_margin",
    "bitext_mine_margin_ivf",
    "dedup_aware_split",
    "ann_ivf_persisted_topk",
    "multimodal_resize_real",
    "multimodal_phash_neardup_real",
    # round-9 additions: paragraph-granularity + exact-containment dedup,
    # the contamination matrix (rides the shared pair view), and the
    # persisted pair-mining serving tier. streaming_ivf_pairs_ingest is
    # deliberately absent: its gate path drains ALL 19 streaming
    # pipelines through the shared session drain, so a ratio would
    # measure the whole drain, not the operator — its scale law is the
    # batch tier's (bit-identical kernel over the same cells).
    "dedup_paragraph_minhash",
    "dedup_substring_containment",
    "contamination_matrix",
    "ivf_cosine_pairs_persisted",
    "quantization_recall_sweep",
    "dedup_paragraph_keep",
    # round-10 additions: the ExactSubstr span-removal emit path, the
    # compacted-index serving tier (index build+OPTIMIZE+serve, honest
    # cold cost at each scale — the proxy corpus gets its own index),
    # and the cross-lingual contamination matrix over the bitext IVF tier
    "dedup_substring_keep",
    "ivf_cosine_pairs_compacted",
    "contamination_matrix_crosslingual",
    # round-10 second ring: quality-priority keep (pair-graph-sliver
    # argmax + broadcast anti-join), CDC chunk dedup (token-sized
    # running-sum window + fp-keyed chunk window), incremental
    # append+serve (prewarmed like the other persisted tiers)
    "dedup_keep_best_quality",
    "dedup_cdc_chunks",
    "ivf_cosine_pairs_incremental",
    # round-10 third ring: the CDC emit path (shares the chunk
    # machinery) and the cross-lingual decon evidence rows (rides the
    # bitext IVF tier like the matrix)
    "dedup_cdc_keep",
    "decontaminate_crosslingual",
    # round-10 fourth ring: the containment drop decision (rides the
    # shared containment view), the quality-priority paragraph emit
    # (rides the memoized parapairs view), cross-lingual dedup keep
    # (bitext IVF mining + sliver components), and the erased-index
    # serving tier. streaming_cdc_chunks_ingest is deliberately absent
    # (same rationale as the paragraph twin): its gate path stages and
    # drains a dedicated store, so a ratio would price the drain
    # harness; its scale law is the batch tier's shared chunking law.
    "dedup_containment_keep",
    "dedup_paragraph_keep_best",
    "dedup_crosslingual_keep",
    "ivf_cosine_pairs_erased",
    # the balance audit pays the shared n·K assignment honestly
    # (un-prewarmed — ivf_cosine_pairs' law) and emits K rows
    "ivf_cell_balance_audit",
    # the retrain comparison pays TWO assignment+verify passes
    # (deliberately un-prewarmed — 2× the ivf_cosine_pairs law)
    "ivf_retrain_recall_gain",
    # quality-priority cross-lingual keep: the min-id tier's law plus
    # one sliver aggregate (rides the same bitext IVF mining cost)
    "dedup_crosslingual_keep_best",
    # substring decon rides the shared containment view (prewarmed —
    # the profile op's row prices the build; marginal = split probes)
    "decontaminate_substring",
)
REPLICAS = 10
PROXY_DIR = str(Path(__file__).resolve().parent.parent / ".scalebench" / "sf1.0")

# Queries whose fn memoizes a ONE-TIME layout write (bucketed catalog
# tables) per (session, sf): measured after a warm run at BOTH scales so
# the curve is the recurring join, not the amortized write.
PREWARM_PROXY = frozenset({
    "bucketed_join_revenue",
    # persisted IVF index: the serve path is the op, the index write is
    # the one-time layout
    "ann_ivf_persisted_topk",
    # ride the session-shared pair/components views whose build the
    # BASE measurement already amortizes (the base warm run memoizes
    # them): warm at proxy too so both sides measure the op's own
    # marginal work, not one side marginal vs the other full-build
    "dedup_aware_split",
    # same shared-view amortization artifact (VERDICT r06 item #4: the
    # r06 ×11.3 row measured the view build, not the ≤max-cluster-size
    # histogram over the memoized components)
    "dedup_cluster_size_histogram",
    # marginal op = broadcast anti-join over the memoized components; the
    # FULL cascade (view build included) is measured separately by the
    # dedup100 COLD_CASCADE two-decade run
    "dedup_keep_canonical",
    # round 9: rides the memoized pair view (same rationale as
    # dedup_aware_split)
    "contamination_matrix",
    # round 9: rides the memoized PARAGRAPH pair view — the marginal op
    # is the anti-join + per-doc reassembly; the builder's cold curve is
    # dedup_paragraph_minhash's COLD_VIEW_BUILD row
    "dedup_paragraph_keep",
    # round 9: serve path is the op; the cent_id-partitioned index write
    # is the one-time layout (same rationale as ann_ivf_persisted_topk)
    "ivf_cosine_pairs_persisted",
    # round 10: serve path over the COMPACTED index is the op; the index
    # build + OPTIMIZE rewrite are the one-time layout
    "ivf_cosine_pairs_compacted",
    # round 10 second ring: the appended index is likewise one-time
    # layout; and keep_best rides the memoized pair/components views
    # (marginal op = sliver argmax + broadcast anti-join)
    "ivf_cosine_pairs_incremental",
    "dedup_keep_best_quality",
    # round 10 fourth ring: containment keep rides the shared
    # containment view (the profile op's un-prewarmed row prices the
    # build); keep_best rides the memoized parapairs view (marginal op
    # = sliver components + argmax + anti-join + reassembly); the
    # erased index's build+erase writes are one-time layout
    "dedup_containment_keep",
    "dedup_paragraph_keep_best",
    "ivf_cosine_pairs_erased",
    # substring decon: marginal = two split probes over the memoized
    # containment view (the profile op's un-prewarmed row is the build)
    "decontaminate_substring",
    # round 11: semantic decon rides the shared srppairs view — its
    # marginal op is the split-orientation join; the cascade's cold
    # curve is srp_lsh_cosine_pairs_scaled's COLD_VIEW_BUILD row
    "decontaminate_semantic",
})


def _base_fingerprint(base: str) -> str:
    """Content fingerprint (file sizes + mtimes) of the three base tables
    the proxy derives from. Folded into the .base marker so a REGENERATED
    base fixture at the same path — or a --rebuild — invalidates the 100x
    tree too (ADVICE r07: a path-only marker let x100 silently serve a
    corpus derived from the OLD base while x1/x10 measured the new one)."""
    import hashlib

    h = hashlib.md5()
    for tbl in ("documents", "embeddings", "lineitem"):
        p = os.path.join(base, f"{tbl}.parquet")
        if os.path.isdir(p):
            for f in sorted(os.listdir(p)):
                st = os.stat(os.path.join(p, f))
                h.update(f"{tbl}/{f}:{st.st_size}:{st.st_mtime_ns}".encode())
        elif os.path.isfile(p):
            st = os.stat(p)
            h.update(f"{tbl}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


def build_proxy(spark, base: str, out: str) -> None:
    docs = spark.read.parquet(f"{base}/documents.parquet")
    emb = spark.read.parquet(f"{base}/embeddings.parquet")
    li = spark.read.parquet(f"{base}/lineitem.parquet")
    n_docs = docs.count()
    n_emb = emb.count()
    # the k*n_docs vec_id shift below is only collision-free when
    # n_emb <= n_docs; enforce the precondition instead of silently
    # minting duplicate vec_ids across replicas (ADVICE r07)
    if n_emb > n_docs:
        raise ValueError(
            f"proxy replica shift needs n_emb <= n_docs, got {n_emb} > {n_docs}"
        )

    doc_parts = []
    for k in range(REPLICAS):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * n_docs))
        if k:
            # suffix every token with the replica digit: replica-local
            # shingles/minhashes shift, cross-replica similarity -> 0
            d = d.withColumn(
                "text", F.regexp_replace(F.col("text"), r"(\w+)", rf"$1{k}")
            )
        doc_parts.append(d)
    _union_all(doc_parts).coalesce(8).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )

    import hashlib

    dim = len(emb.select("embedding").head()[0])
    emb_parts = []
    for k in range(REPLICAS):
        # shift by n_DOCS, not n_emb: vec_id joins doc_id (bitext mining
        # takes lang labels through d.doc_id == emb.vec_id), and the
        # fixture's alignment is vec i ↔ doc i. A k*n_emb shift landed
        # replica-k VECTORS on replica-j DOCUMENTS (j = id div n_docs),
        # scrambling the lang labeling across replicas — the workload
        # still grew 10×, but its composition drifted from "10
        # independent copies of the base task" (round-7 review finding).
        # With k*n_docs the flipped replica vector pairs with the same
        # base document's lang, n_emb ≤ n_docs keeps ids collision-free.
        e = emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * n_docs))
        if k:
            signs = [
                1.0 if int(hashlib.md5(f"sb:{k}:{d}".encode()).hexdigest()[:2], 16) % 2 else -1.0
                for d in range(dim)
            ]
            sign_arr = "array(" + ", ".join(f"{s}D" for s in signs) + ")"
            e = e.withColumn(
                "embedding",
                F.expr(
                    f"zip_with(embedding, {sign_arr},"
                    " (v, s) -> CAST(CAST(v AS DOUBLE) * s AS FLOAT))"
                ),
            )
        emb_parts.append(e)
    _union_all(emb_parts).coalesce(8).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )

    # shift BOTH keys per replica: orderkey alone would replicate rows but
    # leave the distinct part universe — and thus the co-purchase graph
    # (distinct part pairs) — unchanged, so graph operators (pagerank,
    # lift's distinct pairs) would never actually grow 10×
    li_parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * 10_000_000))
        .withColumn("l_partkey", F.col("l_partkey") + F.lit(k * 10_000_000))
        for k in range(REPLICAS)
    ]
    _union_all(li_parts).coalesce(16).write.mode("overwrite").parquet(
        f"{out}/lineitem.parquet"
    )

    # events: replicate with BOTH ids shifted (10x events over a 10x user
    # universe, identical per-user temporal density) so behavioral
    # operators (bitmaps, RLE, transitions) genuinely grow
    ev = spark.read.parquet(f"{base}/events.parquet")
    ev_parts = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(k * 10_000_000))
        .withColumn("user_id", F.col("user_id") + F.lit(k * 10_000_000))
        for k in range(REPLICAS)
    ]
    _union_all(ev_parts).coalesce(8).write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )

    # remaining dimension tables pass through unchanged so every
    # registered query can run against the proxy dir (ops whose cost is
    # driven by these dimensions are deliberately NOT in QUERIES - their
    # curves would measure nothing)
    for t in ("orders", "customer", "part", "supplier", "nation", "region"):
        spark.read.parquet(f"{base}/{t}.parquet").coalesce(4).write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")


def _union_all(dfs):
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def time_query(spec, spark, sf_dir: str) -> tuple[float, int]:
    t0 = time.time()
    n = spec.fn(spark, sf_dir).count()
    return time.time() - t0, n


# --- 100x proxy for the ITERATIVE GRAPH family (VERDICT r03 item #8) -------
# The 10x ratios for triangle/kcore/pagerank sit inside their theoretical
# bands, but one decade cannot confirm an exponent. This second decade
# replicates the 10x proxy's LINEITEM another 10x (both keys shifted, the
# same graph-growth construction — edge tables only, documents/embeddings
# untouched), times each graph query at base/10x/100x, and fits the
# growth exponent by least squares on the three log-log points.

GRAPH_QUERIES = (
    "copurchase_lift",
    "pagerank_copurchase",
    "triangle_count_copurchase",
    "kcore_parts",
    "label_prop_communities",
    "sssp_weighted_parts",
    "degree_assortativity_parts",
)
PROXY100_DIR = str(Path(__file__).resolve().parent.parent / ".scalebench" / "sf10.0")


def build_proxy100(spark, proxy10: str, out: str) -> None:
    """100x lineitem from 10 shifted replicas of the 10x proxy (the 10x
    replicas occupy key ranges k*1e7; these shift by k*1e9 so all 100
    replica key spaces stay disjoint). Other tables pass through."""
    li = spark.read.parquet(f"{proxy10}/lineitem.parquet")
    parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * 1_000_000_000))
        .withColumn("l_partkey", F.col("l_partkey") + F.lit(k * 1_000_000_000))
        for k in range(10)
    ]
    _union_all(parts).coalesce(64).write.mode("overwrite").parquet(
        f"{out}/lineitem.parquet"
    )
    for t in ("orders", "customer", "part", "supplier", "nation", "region",
              "events", "documents", "embeddings"):
        spark.read.parquet(f"{proxy10}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")


DEDUP100_QUERIES = (
    "dedup_minhash_lsh_scaled",
    "dedup_exact",
    # the full production cascade (scaled pairs -> components -> anti-join)
    # measured COLD at every scale — shared views released before each
    # timed run so the curve covers build+consume, not memoized-consume
    # at x1 vs full-build at x100 (VERDICT r06 item #8)
    "dedup_keep_canonical",
    # embeddings-driven production miner (needs the 100x embeddings proxy)
    "bitext_mine_margin_ivf",
    # round 7: the remaining expensive production tiers get two-decade
    # exponents too — IVF near-dup pairs, the IVF semantic-dedup cascade,
    # and the PQ/ADC top-k (quantizer K grows ~sqrt(n) at every scale)
    "ivf_cosine_pairs",
    "semantic_dedup_keep_ivf",
    "ann_pq_adc_topk",
    # text tiers with EXACT replica decorrelation (token suffixing ⇒
    # zero shared shingles across replicas — the clean second decade
    # the 64-dim embedding proxies can't give threshold queries)
    "dedup_jaccard_prefix_filter",
    "decontaminate_hashed",
    # round 9: the paragraph-granularity scaled tier and the exact
    # containment tier — both documents-driven, so the token-suffixed
    # replicas give exact cross-replica decorrelation (clean decades)
    "dedup_paragraph_minhash",
    "dedup_substring_containment",
    # round 10: the ExactSubstr span-removal EMIT path (same gram-keyed
    # shuffle as the containment tier, plus the per-row excision)
    "dedup_substring_keep",
)

# Queries measured with the session-shared views RELEASED before every
# timed run: their registered fn rides memoized pair/component views, so
# without the release x1 would measure the cheap consume while x10/x100
# measure the full cascade build — an exponent artifact, the inverse of
# the PREWARM_PROXY one. dedup_minhash_lsh_scaled IS the view builder
# since round 7: its row must measure the build at every scale (cold),
# not memoized-read at x1 vs full-build at x10.
# dedup_paragraph_minhash serves the parapairs view since round 9 —
# same builder-measures-cold law.
COLD_CASCADE = frozenset(
    {"dedup_keep_canonical", "dedup_minhash_lsh_scaled", "dedup_paragraph_minhash"}
)

# Main (10x) runner twin of COLD_CASCADE: only the view BUILDER runs
# cold there — the consumers keep PREWARM_PROXY marginal-op rows (their
# full-cascade curve lives in the dedup100 COLD_CASCADE artifact).
COLD_VIEW_BUILD = frozenset({
    "dedup_minhash_lsh_scaled",
    "dedup_paragraph_minhash",
    # round 11: the scaled SRP pair set became the session-shared
    # srppairs view — without a release, the base measurement reads the
    # cache another query built and the row degenerates to a
    # cold-vs-warm artifact (the r06 ×7.13 lesson); release before BOTH
    # scales so the row prices the full cascade at each
    "srp_lsh_cosine_pairs_scaled",
})

# Queries that read the embeddings table — trigger the 100x embeddings
# proxy build (same sign-flip construction as the 10x proxy, second-level
# salt, vec_id shifted by the SAME constant as doc_id so the fixture's
# vec_id↔doc_id alignment survives at 100x).
EMB100_QUERIES = frozenset(
    {
        "bitext_mine_margin_ivf",
        "ivf_cosine_pairs",
        "semantic_dedup_keep_ivf",
        "ann_pq_adc_topk",
    }
)


def build_emb100(spark, proxy10: str, out: str) -> None:
    """100x embeddings from 10 replicas of the 10x proxy's embeddings —
    per-replica deterministic sign flips (norms preserved, cross-replica
    cosine decorrelated) keyed by a second-level salt so replicas of
    replicas stay distinct; vec_id shifted by the same 10M constant
    build_docs100 uses for doc_id, preserving the 1:1 alignment the
    bitext/ANN queries join on."""
    import hashlib

    emb = spark.read.parquet(f"{proxy10}/embeddings.parquet")
    dim = len(emb.select("embedding").head()[0])
    parts = []
    for k in range(10):
        e = emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * 10_000_000))
        if k:
            signs = [
                1.0
                if int(hashlib.md5(f"sb2:{k}:{d}".encode()).hexdigest()[:2], 16) % 2
                else -1.0
                for d in range(dim)
            ]
            sign_arr = "array(" + ", ".join(f"{s}D" for s in signs) + ")"
            e = e.withColumn(
                "embedding",
                F.expr(
                    f"zip_with(embedding, {sign_arr},"
                    " (v, s) -> CAST(CAST(v AS DOUBLE) * s AS FLOAT))"
                ),
            )
        parts.append(e)
    _union_all(parts).coalesce(64).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )


def build_docs100(spark, proxy10: str, out: str) -> None:
    """100x documents from 10 replicas of the 10x proxy's documents —
    same construction law (token suffix per replica: intra-replica dup
    structure preserved, cross-replica similarity ~0; ids shifted to a
    disjoint range). Lets the count-scaled MinHash tier be measured
    across TWO decades, including the r == RMAX saturated regime."""
    docs = spark.read.parquet(f"{proxy10}/documents.parquet")
    parts = []
    for k in range(10):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * 10_000_000))
        if k:
            d = d.withColumn(
                "text", F.regexp_replace(F.col("text"), r"(\w+)", rf"$1x{k}")
            )
        parts.append(d)
    _union_all(parts).coalesce(64).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )


# --- 256-dim sparse-regime proxy for the THRESHOLD-PAIR tiers --------------
# VERDICT r07 missing #2: the 64-dim x100 corpus PERCOLATES at θ=0.45
# (σ = d^-1/2 = 0.125 ⇒ the threshold is 3.6σ; 5×10¹² cross pairs cross
# it ~10⁶ times and transitive closure merges nearly everything), so the
# 1.082/1.128 exponents recorded for ivf_cosine_pairs /
# semantic_dedup_keep_ivf measured a pair-dense degenerate regime. Real
# corpora run 512–1024-dim where θ=0.45 is 10–14σ. This proxy re-measures
# the two tiers at 256 dims — θ=0.45 = 7.2σ, expected noise-floor
# crossings ≤ ~1 even at x100's 2×10¹⁰ cross pairs — with the SAME decade
# construction law as build_emb100 (per-replica deterministic sign flips,
# dense id shifts) and PLANTED near-dup pairs (5% of vectors, cos ≈ 0.94)
# so the qualifying-pair universe grows exactly linearly by construction.

EMB256_DIR = str(Path(__file__).resolve().parent.parent / ".scalebench" / "emb256")
EMB256_V = "v1"
EMB256_QUERIES = ("ivf_cosine_pairs", "semantic_dedup_keep_ivf")
EMB256_N, EMB256_DIM = 2000, 256  # x1 matches the sf0.1 embeddings count


def build_emb256(spark) -> None:
    import hashlib

    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(20260816)
    v = rng.standard_normal((EMB256_N, EMB256_DIM))
    # plant near-dups: every id ≡ 1 (mod 20) perturbs its predecessor —
    # cos ≈ 1/sqrt(1+0.35²) ≈ 0.94, far above θ=0.45, so the planted pair
    # count (and nothing else) drives the output at every scale
    for i in range(1, EMB256_N, 20):
        v[i] = v[i - 1] + 0.35 * rng.standard_normal(EMB256_DIM)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(EMB256_N, dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in v],
            "label": (np.arange(EMB256_N) % 10).astype(np.int32),
        }
    )
    x1 = f"{EMB256_DIR}/x1"
    spark.createDataFrame(pdf).coalesce(4).write.mode("overwrite").parquet(
        f"{x1}/embeddings.parquet"
    )

    def replicate(src: str, out: str, shift: int, salt: str) -> None:
        emb = spark.read.parquet(f"{src}/embeddings.parquet")
        parts = []
        for k in range(10):
            e = emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * shift))
            if k:
                signs = [
                    1.0
                    if int(hashlib.md5(f"{salt}:{k}:{d}".encode()).hexdigest()[:2], 16) % 2
                    else -1.0
                    for d in range(EMB256_DIM)
                ]
                sign_arr = "array(" + ", ".join(f"{s}D" for s in signs) + ")"
                e = e.withColumn(
                    "embedding",
                    F.expr(
                        f"zip_with(embedding, {sign_arr},"
                        " (v, s) -> CAST(CAST(v AS DOUBLE) * s AS FLOAT))"
                    ),
                )
            parts.append(e)
        _union_all(parts).coalesce(32).write.mode("overwrite").parquet(
            f"{out}/embeddings.parquet"
        )

    replicate(x1, f"{EMB256_DIR}/x10", EMB256_N, "e256a")
    replicate(f"{EMB256_DIR}/x10", f"{EMB256_DIR}/x100", 10 * EMB256_N, "e256b")


def run_emb256(spark, queries: list[str]) -> None:
    """Two-decade curve for the threshold-pair tiers on the 256-dim
    sparse-regime corpus; rows land in SCALEBENCH100.json keyed
    ``<name>@256d`` so the 64-dim stress rows stay as the labeled
    degenerate case."""
    marker = f"{EMB256_DIR}/.v"
    fresh = (
        os.path.isdir(f"{EMB256_DIR}/x100/embeddings.parquet")
        and os.path.isfile(marker)
        and open(marker).read().strip() == EMB256_V
    )
    if not fresh:
        if os.path.isfile(marker):
            os.remove(marker)
        print("building 256-dim embeddings fixtures...", file=sys.stderr)
        build_emb256(spark)
        with open(marker, "w") as fh:
            fh.write(EMB256_V)

    specs = all_specs()
    result: dict = {"scales": [1, 10, 100], "base": f"{EMB256_DIR}/x1", "queries": {}}
    for name in queries:
        spec = specs[name]
        time_query(spec, spark, f"{EMB256_DIR}/x1")  # warm
        rows = {"dim": EMB256_DIM, "regime": "sparse (theta=0.45 at 7.2 sigma)"}
        ts = []
        for label, nparts in (("x1", 32), ("x10", 64), ("x100", 256)):
            spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
            secs, nrows = time_query(spec, spark, f"{EMB256_DIR}/{label}")
            rows[label] = {"sec": round(secs, 2), "rows": nrows}
            ts.append(secs)
            print(f"# {name}@256d {label}: {secs:.2f}s ({nrows} rows)", file=sys.stderr)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        expo = fit_exponent([1.0, 10.0, 100.0], ts)
        rows["fitted_exponent"] = round(expo, 3)
        result["queries"][f"{name}@256d"] = rows
        print(f"# {name}@256d: exponent {expo:.3f}", file=sys.stderr)
    out = Path(__file__).resolve().parent.parent / "SCALEBENCH100.json"
    if out.is_file():
        prior = json.loads(out.read_text())
        merged = dict(prior.get("queries", {}))
        merged.update(result["queries"])
        result["queries"] = merged
        result["scales"] = prior.get("scales", result["scales"])
        result["base"] = prior.get("base", result["base"])
    out.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))


def _ensure_proxy100_fresh(spark) -> None:
    """Key the ENTIRE 100x tree to the 10x proxy's .base marker: if the
    10x proxy was rebuilt (different base, --rebuild, or a proxy-format
    version bump), every 100x family derived from it is stale — without
    this, the x100 points silently mix corpora from two different bases
    while x1/x10 measure the new one (round-7 review finding: the old
    per-family markers checked only their own existence)."""
    src_m = f"{PROXY_DIR}/.base"
    cur = open(src_m).read().strip() if os.path.isfile(src_m) else "unknown"
    marker = f"{PROXY100_DIR}/.src"
    fresh = (
        os.path.isdir(f"{PROXY100_DIR}/lineitem.parquet")
        and os.path.isfile(marker)
        and open(marker).read().strip() == cur
    )
    if not fresh:
        for fam in (".docs100", ".emb100", ".src"):
            p = f"{PROXY100_DIR}/{fam}"
            if os.path.isfile(p):
                os.remove(p)
        print("building 100x lineitem proxy...", file=sys.stderr)
        build_proxy100(spark, PROXY_DIR, PROXY100_DIR)
        with open(marker, "w") as fh:
            fh.write(cur)


def run_dedup100(spark, base: str, queries: list[str]) -> None:
    """1x/10x/100x curve for documents-driven dedup tiers (the graph100
    pattern applied to the round-6 count-scaled MinHash tier)."""
    _ensure_proxy100_fresh(spark)
    marker = f"{PROXY100_DIR}/.docs100"
    if not os.path.isfile(marker):
        print("building 100x documents proxy...", file=sys.stderr)
        build_docs100(spark, PROXY_DIR, PROXY100_DIR)
        with open(marker, "w") as fh:
            fh.write("v1")
    if any(q in EMB100_QUERIES for q in queries):
        emb_marker = f"{PROXY100_DIR}/.emb100"
        if not os.path.isfile(emb_marker):
            print("building 100x embeddings proxy...", file=sys.stderr)
            build_emb100(spark, PROXY_DIR, PROXY100_DIR)
            with open(emb_marker, "w") as fh:
                fh.write("v1")
    from streamprocessing_spark.shared_views import release_shared_views

    specs = all_specs()
    result: dict = {"scales": [1, 10, 100], "base": base, "queries": {}}
    for name in queries:
        spec = specs[name]
        cold = name in COLD_CASCADE
        time_query(spec, spark, base)  # warm
        rows = {}
        ts = []
        for label, d, nparts in (("x1", base, 32), ("x10", PROXY_DIR, 64),
                                 ("x100", PROXY100_DIR, 256)):
            spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
            if cold:
                release_shared_views(spark)
            secs, nrows = time_query(spec, spark, d)
            rows[label] = {"sec": round(secs, 2), "rows": nrows}
            ts.append(secs)
            print(f"# {name} {label}: {secs:.2f}s ({nrows} rows)", file=sys.stderr)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        if cold:
            # ...and release AFTER the last timed run too: the x100
            # pair/component caches would otherwise stay pinned through
            # every later query's measurement, skewing their exponents
            # with storage-memory pressure (round-7 review finding)
            release_shared_views(spark)
        expo = fit_exponent([1.0, 10.0, 100.0], ts)
        rows["fitted_exponent"] = round(expo, 3)
        result["queries"][name] = rows
        print(f"# {name}: exponent {expo:.3f}", file=sys.stderr)
    out = Path(__file__).resolve().parent.parent / "SCALEBENCH100.json"
    if out.is_file():
        prior = json.loads(out.read_text())
        merged = dict(prior.get("queries", {}))
        merged.update(result["queries"])
        result["queries"] = merged
        result["scales"] = prior.get("scales", result["scales"])
    out.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))


def fit_exponent(ns: list[float], ts: list[float]) -> float:
    """Least-squares slope of log(t) vs log(n) — the fitted growth
    exponent over however many decades were measured."""
    import math

    xs = [math.log(n) for n in ns]
    ys = [math.log(t) for t in ts]
    mx = sum(xs) / len(xs)
    my = sum(ys) / len(ys)
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return num / den


def run_graph100(spark, base: str, queries: list[str]) -> None:
    _ensure_proxy100_fresh(spark)
    specs = all_specs()
    result: dict = {"scales": [1, 10, 100], "base": base, "queries": {}}
    for name in queries:
        spec = specs[name]
        time_query(spec, spark, base)  # warm
        rows = {}
        ts = []
        for label, d, n, nparts in (("x1", base, 1.0, 32), ("x10", PROXY_DIR, 10.0, 64),
                                    ("x100", PROXY100_DIR, 100.0, 256)):
            # partition count scales with the data — the discipline a real
            # cluster applies (static 32 partitions OOM'd pagerank's
            # per-round join at 100x: per-partition hash state outgrew
            # execution memory; 256 partitions of the same join fit)
            spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
            secs, nrows = time_query(spec, spark, d)
            rows[label] = {"sec": round(secs, 2), "rows": nrows}
            ts.append(secs)
            print(f"# {name} {label}: {secs:.2f}s ({nrows} rows)", file=sys.stderr)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        expo = fit_exponent([1.0, 10.0, 100.0], ts)
        rows["fitted_exponent"] = round(expo, 3)
        result["queries"][name] = rows
        print(f"# {name}: exponent {expo:.3f}", file=sys.stderr)
    out = Path(__file__).resolve().parent.parent / "SCALEBENCH100.json"
    # merge with prior runs so the family can be measured in chunks
    if out.is_file():
        prior = json.loads(out.read_text())
        merged = dict(prior.get("queries", {}))
        merged.update(result["queries"])
        result["queries"] = merged
    out.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--graph100", action="store_true",
                    help="run the graph family at 1x/10x/100x and fit exponents")
    ap.add_argument("--dedup100", action="store_true",
                    help="run the dedup tiers at 1x/10x/100x documents and fit exponents")
    ap.add_argument("--emb256", action="store_true",
                    help="run the threshold-pair tiers on the 256-dim sparse-regime "
                         "fixtures at 1x/10x/100x and fit exponents")
    ap.add_argument("queries", nargs="*", help="subset of QUERIES to run")
    args = ap.parse_args()

    spark = get_spark("scale-bench")

    if args.emb256:
        # self-contained fixtures — no 10x/100x proxy needed
        run_emb256(spark, args.queries or list(EMB256_QUERIES))
        return

    # the cached proxy is only valid for the base it was derived from —
    # key the cache on the base path so `--base X` after a run with base Y
    # rebuilds instead of silently measuring against a stale proxy
    marker = f"{PROXY_DIR}/.base"
    # the key embeds a proxy-format version: bump it whenever build_proxy
    # changes so proxies built by older code self-invalidate (a stale
    # pre-partkey-shift proxy would silently exempt the graph operators
    # from the 10x measurement)
    # v4: vec_id replica shift aligned to doc_id space (k*n_docs).
    # The key also folds in a CONTENT fingerprint of the base tables
    # (ADVICE r07): a regenerated base at the same path now yields a new
    # key, so _ensure_proxy100_fresh — which compares the 100x tree's
    # .src marker against this marker — invalidates the derived 100x
    # corpora in BOTH the regenerated-base and --rebuild cases instead of
    # only on a path change.
    base_key = f"v4:{os.path.abspath(args.base)}:{_base_fingerprint(args.base)}"
    stale = True
    if os.path.isdir(f"{PROXY_DIR}/documents.parquet") and os.path.isfile(marker):
        with open(marker) as fh:
            stale = fh.read().strip() != base_key
    if args.rebuild or stale:
        # drop the marker FIRST: a failed/interrupted build must leave the
        # cache invalid, not a half-overwritten mixed-base proxy that the
        # next run validates
        if os.path.isfile(marker):
            os.remove(marker)
        # an explicit --rebuild with an UNCHANGED base re-derives the 10x
        # proxy under the same key; the 100x tree derived from the old
        # build must not survive it — drop its .src so the next 100x run
        # rebuilds from the fresh proxy
        src100 = f"{PROXY100_DIR}/.src"
        if os.path.isfile(src100):
            os.remove(src100)
        build_proxy(spark, args.base, PROXY_DIR)
        os.makedirs(PROXY_DIR, exist_ok=True)
        with open(marker, "w") as fh:
            fh.write(base_key)

    if args.graph100:
        run_graph100(spark, args.base, args.queries or list(GRAPH_QUERIES))
        return

    if args.dedup100:
        run_dedup100(spark, args.base, args.queries or list(DEDUP100_QUERIES))
        return

    from streamprocessing_spark.shared_views import release_shared_views

    specs = all_specs()
    result: dict = {"base_sf": 0.1, "proxy_sf": 1.0, "queries": {}}
    run_list = args.queries or QUERIES
    for name in run_list:
        spec = specs[name]
        cold = name in COLD_VIEW_BUILD
        # warm (JIT/codegen/broadcast-threshold effects), then measure
        time_query(spec, spark, args.base)
        if cold:
            release_shared_views(spark)
        small_s, small_n = time_query(spec, spark, args.base)
        if cold:
            release_shared_views(spark)
        if name in PREWARM_PROXY:
            # one-time-layout queries memoize a catalog write per
            # (session, sf): the base warm run above already absorbs it
            # at sf0.1, but without a proxy warm run the measured proxy
            # time includes re-WRITING the layout — the r05 ×7.13 curve
            # for a join whose plan test proves zero exchanges. Warm at
            # proxy too so both sides measure the JOIN alone.
            time_query(spec, spark, PROXY_DIR)
        big_s, big_n = time_query(spec, spark, PROXY_DIR)
        result["queries"][name] = {
            "sf0.1_sec": round(small_s, 3),
            "sf1.0_sec": round(big_s, 3),
            "ratio": round(big_s / small_s, 2),
            "sf0.1_rows": small_n,
            "sf1.0_rows": big_n,
        }
        print(f"# {name}: {small_s:.2f}s -> {big_s:.2f}s (x{big_s / small_s:.1f})",
              file=sys.stderr)
    # merge into SCALEBENCH.json so subset runs accumulate (the graph100
    # path already does this; the manual-merge era ends here)
    out = Path(__file__).resolve().parent.parent / "SCALEBENCH.json"
    if out.is_file():
        prior = json.loads(out.read_text())
        merged = dict(prior.get("queries", {}))
        merged.update(result["queries"])
        result["queries"] = merged
    out.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
