"""Incremental MinHash-LSH dedup — fold invariance + live file stream."""

import os

import pytest

from graphscope_spark.functions.dedup import minhash_lsh_pairs
from graphscope_spark.session import get_spark
from graphscope_spark.streaming import IncrementalDedup, merge_dedup


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-stream-dedup", cpus=4, shuffle_partitions=4)


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
    (2, "spark runs joins shuffles windows and aggregates"),
    (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (4, "completely unrelated sentence about databases"),
    (5, "spark runs joins shuffles windows and aggregates fast"),  # ~2
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fold_matches_one_shot_any_chunking(spark):
    want = {
        (r["a"], r["b"])
        for r in minhash_lsh_pairs(_df(spark, DOCS)).collect()
    }
    assert want  # the planted dups collide
    for n_chunks in (2, 3):
        index = pairs = None
        for i in range(n_chunks):
            chunk = [d for d in DOCS if d[0] % n_chunks == i]
            index, pairs = merge_dedup(index, pairs, _df(spark, chunk))
        got = {(r["a"], r["b"]) for r in pairs.collect()}
        assert got == want


def test_index_grows_batch_probe_only(spark):
    # second batch must discover cross-batch dups without re-reading
    # batch-1 text: the index alone carries batch 1
    i1, p1 = merge_dedup(None, None, _df(spark, DOCS[:3]))
    assert i1.count() == 3 * 4  # 3 docs × 4 bands
    cross_before = {(r["a"], r["b"]) for r in p1.collect()}
    _, p2 = merge_dedup(i1, p1, _df(spark, DOCS[3:]))
    got = {(r["a"], r["b"]) for r in p2.collect()}
    assert (0, 3) in got  # exact dup found across batches
    assert cross_before <= got  # pairs accumulate monotonically


def test_incremental_dedup_file_stream(spark, tmp_path):
    src_dir = str(tmp_path / "docs")
    os.makedirs(src_dir)
    for i in range(3):
        rows = [d for d in DOCS if d[0] % 3 == i]
        _df(spark, rows).coalesce(1).write.parquet(f"{src_dir}/batch={i}")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/batch=*")
    )
    inc = IncrementalDedup()
    q = (
        stream.writeStream.foreachBatch(inc)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert inc.batches >= 1
    want = {
        (r["a"], r["b"])
        for r in minhash_lsh_pairs(_df(spark, DOCS)).collect()
    }
    got = {(r["a"], r["b"]) for r in inc.pairs.collect()}
    assert got == want


def test_durable_dedup_resume_after_crash(spark, tmp_path):
    from graphscope_spark.streaming import DurableIncrementalDedup

    state = str(tmp_path / "state")
    inc = DurableIncrementalDedup(state)
    inc(_df(spark, DOCS[:3]), 0)
    inc(_df(spark, DOCS[3:5]), 1)
    # "crash": discard the driver, reload from parquet state
    resumed = DurableIncrementalDedup.load(spark, state)
    resumed(_df(spark, DOCS[5:]), 2)
    want = {
        (r["a"], r["b"])
        for r in minhash_lsh_pairs(_df(spark, DOCS)).collect()
    }
    got = {(r["a"], r["b"]) for r in resumed.pairs.collect()}
    assert got == want
