"""Built-in analytical algorithms (the reference's PIE app registry,
coordinator/gscoordinator/builtin/app/.gs_conf.yaml) re-expressed as
DataFrame supersteps."""

from graphscope_spark.algorithms.pagerank import pagerank  # noqa: F401
from graphscope_spark.algorithms.wcc import wcc  # noqa: F401
from graphscope_spark.algorithms.cdlp import cdlp  # noqa: F401
from graphscope_spark.algorithms.triangles import triangles  # noqa: F401
