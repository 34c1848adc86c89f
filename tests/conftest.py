import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphscope_spark.session import get_spark  # noqa: E402

# Two-tier suite: nodeids listed in SLOW_TESTS.txt get the `full` marker
# and are excluded by the default `-m "not full"` addopts (pytest.ini) so
# `pytest tests/ -q` stays a fast development loop. Everything still runs
# in the full tier: `pytest tests/ -q -m "full or not full"` (or
# `-m full` for just the slow half). The list is measured, not curated —
# regenerate from `--durations=0` output when the profile drifts; every
# listed test is a deep variant of a family whose fast canary stays in
# the default tier, and the oracle-parity cuts are re-covered wholesale
# by scripts/gate_check.py (the driver's own correctness gate).
_SLOW_LIST = os.path.join(os.path.dirname(__file__), "SLOW_TESTS.txt")

# test_oracle_parity runs every queries() entry against its DuckDB twin —
# exactly what scripts/gate_check.py does standalone (and what the driver's
# own gate re-checks). In the default tier only a cross-family canary set
# stays; the full sweep lives in the full tier AND in gate_check.py.
_ORACLE_CANARIES = {
    "pagerank", "wcc", "cdlp", "triangles", "pagerank_block",
    "repo_edges", "repo_sha256", "minhash", "tpch_q1", "asof_join",
}


def pytest_collection_modifyitems(config, items):
    try:
        with open(_SLOW_LIST) as f:
            slow = {ln.strip() for ln in f if ln.strip()}
    except OSError:
        slow = set()
    for item in items:
        nid = item.nodeid
        if nid in slow:
            item.add_marker(pytest.mark.full)
        elif "test_oracle_parity.py::" in nid:
            param = nid.rsplit("[", 1)[-1].rstrip("]")
            if param not in _ORACLE_CANARIES:
                item.add_marker(pytest.mark.full)


@pytest.fixture(scope="session")
def spark():
    cpus = int(os.environ.get("SPARK_TEST_CPUS", "8"))
    s = get_spark("graphscope_spark_tests", cpus=cpus, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
