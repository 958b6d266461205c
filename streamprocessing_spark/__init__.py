"""streamprocessing_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference system (SatyamS17/StreamProcessing, "RainStorm": a Go 3-stage
streaming dataflow — see SURVEY.md), re-expressed Spark-first:

- the reference's operator surface (source scan, filter, project, flatMap,
  keyed running count, hash repartition, dedup-by-id, append sink) as
  declarative DataFrame / SQL plans optimized by Catalyst;
- its streaming semantics (update-mode keyed counts, checkpointed recovery)
  on Structured Streaming;
- plus the large-scale training-data-pipeline operators the north star
  calls for: exact & approximate deduplication (MinHash-LSH, SimHash,
  n-gram Jaccard), embedding similarity search, text analysis, and
  multimodal-column plumbing.

Nothing here ports the reference's execution machinery (SWIM membership,
HyDFS quorum storage, per-record RPC+WAL): Spark's scheduler, shuffle,
checkpointing and state store already provide those guarantees.
"""

from streamprocessing_spark.session import get_spark
from streamprocessing_spark.registry import all_queries, all_oracles

__all__ = ["get_spark", "all_queries", "all_oracles"]
__version__ = "0.1.0"
