"""Quantized k-means — planted-cluster recovery + exactness properties."""

import pytest

from graphscope_spark.functions.kmeans import kmeans
from graphscope_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-kmeans", cpus=4, shuffle_partitions=4)


def _planted(spark, per=20, dim=8):
    # 3 well-separated blobs on coordinate axes; deterministic jitter
    rows = []
    for c in range(3):
        for i in range(per):
            base = [0.0] * dim
            base[c] = 10.0
            base[(c + 3) % dim] = (i % 5) * 0.01  # tiny in-cluster spread
            rows.append((c * per + i, base))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_recovers_planted_clusters(spark):
    emb = _planted(spark)
    out = kmeans(emb, k=3, rounds=4).collect()
    assert len(out) == 60
    by_truth = {}
    for r in out:
        by_truth.setdefault(r["vec_id"] // 20, set()).add(r["cluster"])
    # each planted blob maps to exactly one cluster, all distinct
    assert all(len(s) == 1 for s in by_truth.values())
    assert len(set.union(*by_truth.values())) == 3


def test_kmeans_parallelism_invariant(spark):
    emb = _planted(spark).repartition(7)
    a = sorted(map(tuple, kmeans(emb, k=3, rounds=2).collect()))
    b = sorted(map(tuple, kmeans(emb.coalesce(1), k=3, rounds=2).collect()))
    assert a == b  # bit-exact under different partitionings


def test_kmeans_k1_single_cluster(spark):
    emb = _planted(spark)
    out = kmeans(emb, k=1, rounds=2).collect()
    assert {r["cluster"] for r in out} == {1}


def test_ann_ivf_exact_recall_and_exhaustive(spark):
    from graphscope_spark.functions.similarity import (
        ann_brute_force,
        ann_ivf_exact,
    )
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter("vec_id < 5")
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_brute_force(emb, queries, k=5).collect()
    }
    # nprobe = nlist probes every list => candidate set is the full corpus
    # minus self: results must equal brute force exactly
    full = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_ivf_exact(
            emb, queries, k=5, nlist=4, nprobe=4, rounds=2
        ).collect()
    }
    assert full == truth
    # partial probing keeps reasonable recall on this corpus
    part = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_ivf_exact(
            emb, queries, k=5, nlist=4, nprobe=2, rounds=2
        ).collect()
    }
    assert len(part & truth) / len(truth) >= 0.5
