"""Built-in analytical algorithms (the reference's PIE app registry,
coordinator/gscoordinator/builtin/app/.gs_conf.yaml) re-expressed as
DataFrame supersteps."""

from graphscope_spark.algorithms.pagerank import pagerank, pagerank_block  # noqa: F401
from graphscope_spark.algorithms.wcc import wcc, wcc_block  # noqa: F401
from graphscope_spark.algorithms.cdlp import cdlp, cdlp_block  # noqa: F401
from graphscope_spark.algorithms.triangles import triangles, triangle_count  # noqa: F401
from graphscope_spark.algorithms.sssp import (  # noqa: F401
    bfs, sssp, sssp_average_length, sssp_block, sssp_has_path, sssp_path,
)
from graphscope_spark.algorithms.louvain import louvain, louvain_fixed  # noqa: F401
from graphscope_spark.algorithms.paths import (  # noqa: F401
    all_pairs_shortest_path_length, betweenness_centrality,
    closeness_centrality, harmonic_centrality, multi_source_bfs,
    random_multi_bfs,
)
from graphscope_spark.algorithms.centrality import (  # noqa: F401
    degree_centrality, eigenvector_centrality, hits, katz_centrality,
)
from graphscope_spark.algorithms.clustering import (  # noqa: F401
    average_clustering, clustering, lcc, transitivity,
)
from graphscope_spark.algorithms.cores import (  # noqa: F401
    degeneracy_ordering, k_core_search, kcore, kcore_vertices, kshell,
    onion_layers,
)
from graphscope_spark.algorithms.matching import (  # noqa: F401
    maximal_matching, min_dominating_set, min_edge_cover, min_vertex_cover,
    mis,
)
from graphscope_spark.algorithms.measurement import (  # noqa: F401
    diameter_approx, k_center, msf, msf_weight,
)
from graphscope_spark.algorithms.coloring import color  # noqa: F401
from graphscope_spark.algorithms.fluid import fluid_community  # noqa: F401
from graphscope_spark.algorithms.wcc import cc_log  # noqa: F401
from graphscope_spark.algorithms.misc import (  # noqa: F401
    attribute_assortativity, average_degree_connectivity,
    degree_assortativity_coefficient, edge_boundary, node_boundary,
    numeric_assortativity,
)
from graphscope_spark.algorithms.ranking import (  # noqa: F401
    articlerank, ppr, voterank,
)
from graphscope_spark.algorithms.scc import scc  # noqa: F401
from graphscope_spark.algorithms.dfs import dfs  # noqa: F401
from graphscope_spark.algorithms.lpa import lpa_u2i  # noqa: F401
from graphscope_spark.algorithms.simple_paths import (  # noqa: F401
    all_simple_paths, bfs_edges, bfs_parents, bfs_successors, is_simple_path,
    sampling_path, shortest_path_expand,
)
from graphscope_spark.algorithms.cc_variants import (  # noqa: F401
    cc_block, cc_opt, cc_pull,
)
from graphscope_spark.algorithms.measurement import msf_block  # noqa: F401
from graphscope_spark.algorithms.cdlp import lpa_by_color  # noqa: F401
from graphscope_spark.algorithms.fluid import fluid_by_color  # noqa: F401
from graphscope_spark.algorithms.clustering import lcc_directed  # noqa: F401
from graphscope_spark.algorithms.paths import (  # noqa: F401
    all_pairs_weighted_shortest_path_length, betweenness_centrality_weighted,
    multi_source_weighted,
)
from graphscope_spark.algorithms.link_prediction import (  # noqa: F401
    common_neighbors, link_prediction,
)
