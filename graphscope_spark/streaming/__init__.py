from graphscope_spark.streaming.incremental import (
    IncrementalPageRank,
    IncrementalTriangles,
    IncrementalWCC,
    edge_stream,
    merge_components,
    merge_pagerank,
    merge_triangles,
    running_degree_stateful,
    windowed_degree,
)

__all__ = [
    "IncrementalPageRank",
    "IncrementalTriangles",
    "IncrementalWCC",
    "edge_stream",
    "merge_components",
    "merge_pagerank",
    "merge_triangles",
    "running_degree_stateful",
    "windowed_degree",
]
