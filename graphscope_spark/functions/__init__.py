"""Corpus-pipeline operators: the operations a large-scale training-data
pipeline needs on top of the graph engine — deduplication (exact / MinHash-
LSH / SimHash / n-gram Jaccard / embedding near-dup), similarity search
(brute-force + LSH-bucketed ANN), text analysis (lang-ID, quality, token
stats, fingerprints), and multimodal binary-column plumbing.

These have no direct analog in the reference (GraphScope is graph-only);
they are designed Spark-first with the same discipline as the graph side:
JVM-side expressions wherever possible, Arrow-vectorized pandas UDFs where
not, every oracle-able op expressed identically in ANSI SQL for the DuckDB
correctness gate.
"""

from graphscope_spark.functions.hashing import hash64  # noqa: F401
from graphscope_spark.functions.text import (  # noqa: F401
    doc_stats, fingerprint, lang_id, quality_score, token_counts,
    tokenize,
)
from graphscope_spark.functions.dedup import (  # noqa: F401
    contamination, decontaminate, dedup_exact, dup_span_stats,
    minhash_lsh_pairs,
    minhash_signatures, ngram_jaccard_pairs, shingles, simhash64,
)
from graphscope_spark.functions.similarity import (  # noqa: F401
    ann_brute_force, ann_lsh, embedding_neardup_pairs, semdedup,
)
from graphscope_spark.functions.multimodal import (  # noqa: F401
    decode_audio, decode_image, decode_media_meta, documents_as_media,
    fake_decode_meta, frame_sample_plan, image_grid_features,
    media_metadata, synthesize_media,
)
from graphscope_spark.functions.dedup import simhash_neardup_pairs  # noqa: F401
from graphscope_spark.functions.mixing import (  # noqa: F401
    hashed_gram_distribution, importance_resample, mixture_rates,
    mixture_sample,
)
