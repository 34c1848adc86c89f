from graphscope_spark.streaming.incremental import (
    IncrementalPageRank,
    IncrementalSSSP,
    IncrementalTriangles,
    IncrementalWCC,
    edge_stream,
    merge_components,
    merge_pagerank,
    merge_sssp,
    merge_triangles,
    running_degree_stateful,
    windowed_degree,
)

__all__ = [
    "IncrementalPageRank",
    "IncrementalSSSP",
    "IncrementalTriangles",
    "IncrementalWCC",
    "edge_stream",
    "merge_components",
    "merge_pagerank",
    "merge_sssp",
    "merge_triangles",
    "running_degree_stateful",
    "windowed_degree",
]
