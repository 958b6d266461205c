"""Make Python-side operators shippable to executors from anywhere.

cloudpickle serializes module-level functions of importable modules BY
REFERENCE (module name + qualname): executor Python workers then need the
package on their sys.path, which holds in this repo's cwd but not when a
host (the external driver) imports __spark_entry__.py from elsewhere.

Registering the package's modules for pickle-BY-VALUE makes every Pandas
UDF / mapInPandas kernel self-contained — the function body travels with
the task, no executor-side install or PYTHONPATH needed. This is also the
right posture for a real cluster: the engine works without shipping wheels
to every node. Idempotent and cheap; called before any Python-side
operator is constructed.
"""

from __future__ import annotations

import sys


def ensure_shippable() -> None:
    try:
        from pyspark import cloudpickle
    except ImportError:  # pragma: no cover - vendored path moved
        import cloudpickle  # type: ignore[no-redef]
    for name, mod in list(sys.modules.items()):
        if name == "streamprocessing_spark" or name.startswith("streamprocessing_spark."):
            try:
                cloudpickle.register_pickle_by_value(mod)
            except Exception:  # noqa: BLE001 - best-effort; ref-pickling still works in-repo
                pass
