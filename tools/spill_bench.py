"""Memory-pressure validation for the heavy queries (VERDICT r03 item #6).

local[32] with an 8 GiB heap never spills at sf0.1 — which means the
SCALE.md curves say nothing about whether the heavy plans SURVIVE the
memory regime a real 100 TB cluster runs in, where the LSH verify joins
and graph contractions will not fit execution memory and must spill.
This tool re-runs the top-10 heavy queries against the 10× proxy
(tools/scale_bench.py's .scalebench/sf1.0) inside a SQUEEZED session —
3 GiB heap, spark.memory.fraction=0.15 (~450 MiB execution+storage for
32 tasks, an executor-memory-per-core ratio far tighter than any sane
cluster) — and records per-query spill bytes from the status-store REST
API, plus row counts compared against the unsqueezed SCALEBENCH run to
show the plans produce the SAME results under pressure.

The squeeze runs in a SUBPROCESS (`--worker`): driver memory is a
JVM-launch-time setting, so it cannot be changed on the harness session.

Usage: python tools/spill_bench.py            # writes SPILLBENCH.json
       python tools/spill_bench.py --queries q1 q2   # subset
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PROXY_DIR = str(REPO / ".scalebench" / "sf1.0")
UI_PORT = 4099
SQUEEZE_MEM = "3g"
SQUEEZE_FRACTION = "0.15"

# The top-10 heavy bench/gate queries whose cost tables the proxy grows
# (documents/embeddings/lineitem/events — see scale_bench's exclusion
# notes for the dimension-driven ops that would measure nothing).
HEAVY = (
    "semantic_dedup_keep_ivf",
    "semantic_dedup_keep_srp_baseline",
    "triangle_count_copurchase",
    "kcore_parts",
    "sssp_weighted_parts",
    "ann_pq_adc_topk",
    "interpolate_hourly_linear",
    "dedup_minhash_lsh",
    "dedup_keep_canonical",
    "curation_manifest_end2end",
)


def _rest_totals(app_id: str) -> dict[str, int]:
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as fh:
        stages = json.load(fh)
    tot = {"memoryBytesSpilled": 0, "diskBytesSpilled": 0,
           "shuffleWriteBytes": 0, "shuffleReadBytes": 0}
    for st in stages:
        for k in tot:
            tot[k] += int(st.get(k, 0) or 0)
    return tot


def worker(queries: list[str]) -> None:
    from pyspark.sql import SparkSession

    cpus = max(1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark = (
        SparkSession.builder.appName("spill-bench")
        .master(f"local[{cpus},2]")
        .config("spark.driver.memory", SQUEEZE_MEM)
        .config("spark.memory.fraction", SQUEEZE_FRACTION)
        # /tmp is reaped mid-run on this box (shuffle FileNotFound
        # cascades) — keep scratch under the repo like session.py does
        .config("spark.local.dir", str(REPO / ".spark-local"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.default.parallelism", str(max(cpus, 8)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .getOrCreate()
    )
    from streamprocessing_spark.registry import all_specs

    specs = all_specs()
    app_id = spark.sparkContext.applicationId
    out: dict[str, dict] = {}
    prev = _rest_totals(app_id)
    for name in queries:
        t0 = time.time()
        try:
            n = specs[name].fn(spark, PROXY_DIR).count()
            ok = True
        except Exception as e:  # noqa: BLE001
            n, ok = -1, False
            out[name] = {"ok": False, "error": str(e)[:300]}
        secs = time.time() - t0
        cur = _rest_totals(app_id)
        delta = {k: cur[k] - prev[k] for k in cur}
        prev = cur
        if ok:
            out[name] = {
                "ok": True,
                "secs": round(secs, 2),
                "rows": n,
                "memory_spilled_mb": round(delta["memoryBytesSpilled"] / 1e6, 1),
                "disk_spilled_mb": round(delta["diskBytesSpilled"] / 1e6, 1),
                "shuffle_write_mb": round(delta["shuffleWriteBytes"] / 1e6, 1),
            }
        print(f"# {name}: {out[name]}", file=sys.stderr)
        # shared-view caches would hold memory ACROSS queries and blur
        # attribution; drop them between measurements
        spark.catalog.clearCache()
        try:
            from streamprocessing_spark import shared_views

            shared_views.release_shared_views(spark)
        except Exception:  # noqa: BLE001
            pass
    spark.stop()
    print(json.dumps(out))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--queries", nargs="*", default=list(HEAVY))
    args = ap.parse_args()
    if args.worker:
        worker(args.queries)
        return

    if not os.path.isdir(f"{PROXY_DIR}/documents.parquet"):
        print("building 10x proxy via scale_bench...", file=sys.stderr)
        subprocess.run(
            [sys.executable, str(REPO / "tools" / "scale_bench.py"),
             "dedup_exact"],  # cheapest query forces the proxy build
            check=True, cwd=REPO,
        )

    env = dict(os.environ)
    proc = subprocess.run(
        [sys.executable, __file__, "--worker", "--queries", *args.queries],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    sys.stderr.write(proc.stderr[-4000:])
    # last PARSEABLE line: a dying executor can interleave stack traces
    # into stdout after the result line
    per_query = None
    for line in reversed(proc.stdout.strip().splitlines() or []):
        try:
            per_query = json.loads(line)
            break
        except json.JSONDecodeError:
            continue
    if per_query is None:
        sys.stderr.write(proc.stdout[-2000:])
        raise SystemExit("worker produced no JSON result line")

    # pull the unsqueezed row counts for the survives-with-same-result
    # comparison where scale_bench measured them
    ref_rows = {}
    sb = REPO / "SCALEBENCH.json"
    if sb.is_file():
        data = json.loads(sb.read_text())
        for q, row in data.get("queries", {}).items():
            if "sf1.0_rows" in row:
                ref_rows[q] = row["sf1.0_rows"]
    for q, row in per_query.items():
        if row.get("ok") and q in ref_rows:
            row["rows_match_unsqueezed"] = row["rows"] == ref_rows[q]

    result = {
        "proxy": "10x of sf0.1 (scale_bench)",
        "heap": SQUEEZE_MEM,
        "memory_fraction": SQUEEZE_FRACTION,
        "queries": per_query,
    }
    (REPO / "SPILLBENCH.json").write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
