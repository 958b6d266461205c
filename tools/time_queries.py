"""Quick per-query timer for optimization work — bench.py's methodology
(noop sink, shared-view release discipline) over an arbitrary subset.

Usage:
    python tools/time_queries.py [--sf DIR] [--reps N] query [query ...]

Prints one line per query: median [min, max] over N reps.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from streamprocessing_spark.engine import release_plugin_caches  # noqa: E402
from streamprocessing_spark.registry import all_specs  # noqa: E402
from streamprocessing_spark.session import get_spark  # noqa: E402
from streamprocessing_spark.shared_views import release_shared_views  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from bench import VIEW_BUILDER_KINDS  # noqa: E402

    specs = all_specs()
    unknown = [n for n in args.queries if n not in specs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark("time-queries")
    # warm the JVM + parquet footers like bench.py does
    specs[args.queries[0]].fn(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    from bench import _reclaim_dead_blocks  # noqa: E402

    total = 0.0
    for name in args.queries:
        _reclaim_dead_blocks(spark)  # same janitor as bench.py, untimed
        reps: list[float] = []
        for _ in range(args.reps):
            release_plugin_caches()
            for kind in VIEW_BUILDER_KINDS.get(name, ()):
                release_shared_views(spark, kind)
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            specs[name].fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            reps.append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
        reps.sort()
        med = reps[(len(reps) - 1) // 2]
        total += med
        print(
            f"{med:8.3f}  [{reps[0]:.3f}, {reps[-1]:.3f}]  {name}",
            flush=True,
        )
    print(f"{total:8.3f}  TOTAL (sum of medians)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
