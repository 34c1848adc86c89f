from graphscope_spark.streaming.incremental import (
    IncrementalWCC,
    edge_stream,
    merge_components,
    running_degree_stateful,
    windowed_degree,
)

__all__ = [
    "IncrementalWCC",
    "edge_stream",
    "merge_components",
    "running_degree_stateful",
    "windowed_degree",
]
