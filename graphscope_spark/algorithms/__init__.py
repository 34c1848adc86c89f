"""Built-in analytical algorithms (the reference's PIE app registry,
coordinator/gscoordinator/builtin/app/.gs_conf.yaml) re-expressed as
DataFrame supersteps."""

from graphscope_spark.algorithms.pagerank import pagerank  # noqa: F401
from graphscope_spark.algorithms.wcc import wcc  # noqa: F401
from graphscope_spark.algorithms.cdlp import cdlp  # noqa: F401
from graphscope_spark.algorithms.triangles import triangles, triangle_count  # noqa: F401
from graphscope_spark.algorithms.sssp import (  # noqa: F401
    bfs, sssp, sssp_average_length, sssp_has_path, sssp_path,
)
from graphscope_spark.algorithms.louvain import louvain  # noqa: F401
from graphscope_spark.algorithms.paths import (  # noqa: F401
    all_pairs_shortest_path_length, betweenness_centrality,
    closeness_centrality, multi_source_bfs,
)
from graphscope_spark.algorithms.centrality import (  # noqa: F401
    degree_centrality, eigenvector_centrality, hits, katz_centrality,
)
from graphscope_spark.algorithms.clustering import (  # noqa: F401
    average_clustering, clustering, lcc, transitivity,
)
from graphscope_spark.algorithms.cores import kcore, kcore_vertices, kshell  # noqa: F401
from graphscope_spark.algorithms.misc import (  # noqa: F401
    attribute_assortativity, average_degree_connectivity,
    degree_assortativity_coefficient, edge_boundary, node_boundary,
    numeric_assortativity,
)
from graphscope_spark.algorithms.ranking import (  # noqa: F401
    articlerank, ppr, voterank,
)
from graphscope_spark.algorithms.scc import scc  # noqa: F401
from graphscope_spark.algorithms.lpa import lpa_u2i  # noqa: F401
from graphscope_spark.algorithms.simple_paths import (  # noqa: F401
    all_simple_paths, bfs_edges, bfs_parents, bfs_successors, is_simple_path,
    sampling_path,
)
