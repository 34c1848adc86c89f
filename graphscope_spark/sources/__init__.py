"""Data sources/sinks — the reference Loader surface on Spark readers."""

from graphscope_spark.sources.loader import (  # noqa: F401
    Loader, load_table, graph_from_loaders, save_graph, load_graph,
)
