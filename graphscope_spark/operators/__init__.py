"""GIE-style relational/dataflow operator surface over DataFrames.

The reference's interactive engine (GIE) compiles Gremlin/Cypher into a
logical algebra (interactive_engine/executor/ir/proto/algebra.proto) run by
the Rust Pegasus dataflow. SURVEY.md §2.4 maps every operator; this package
makes the mapping executable: graph-specific operators (EdgeExpand, GetV,
PathExpand, ExpandIntersect) are implemented, while purely relational ones
(Project/Select/Join/GroupBy/OrderBy/Dedup/Union/Limit/Sample/Apply) are
*documented thin wrappers* over the exact Spark primitive Catalyst already
optimizes — re-implementing them would be the anti-pattern the Spark-first
mandate forbids.
"""

from graphscope_spark.operators.traversal import (  # noqa: F401
    edge_expand, expand_intersect, get_v, path_expand,
)
from graphscope_spark.operators.relational import (  # noqa: F401
    apply_subquery, dedup, group_by, join, limit, order_by, project, sample,
    scan, select, union, unfold, vertex_range,
)
from graphscope_spark.operators.skew import (  # noqa: F401
    salted_join,
    skew_isolated_join,
    top_degree_keys,
)
from graphscope_spark.operators import expressions  # noqa: F401
