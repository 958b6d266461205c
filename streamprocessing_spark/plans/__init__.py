from streamprocessing_spark.plans.explain import (
    formatted_plan,
    count_exchanges,
    has_pushed_filters,
    has_broadcast_join,
)

__all__ = [
    "formatted_plan",
    "count_exchanges",
    "has_pushed_filters",
    "has_broadcast_join",
]
