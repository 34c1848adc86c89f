"""Text analysis over a documents table: tokenization, stats, quality
scoring, language-ID heuristic, document fingerprinting.

Everything here is pure JVM-side column expressions (whole-stage codegen,
no Python) and each op has an exact ANSI-SQL twin (built by
``*_sql_exprs`` helpers / __spark_entry__.py) so the DuckDB gate can
value-hash-match it. Scale: all ops are single-pass projections or one
groupBy — no joins, no iteration; at 100 TB they are scan-bound and
Catalyst prunes to the columns used.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graphscope_spark.functions.hashing import hash64

#: tiny per-language stopword lists for the n-gram/stopword lang-ID
#: heuristic. Deterministic and portable; accuracy is data-dependent (the
#: heuristic is the operator — the synthetic corpus carries no real
#: language signal).
STOPWORDS = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "en": ["the", "a", "of", "and", "is", "to", "in", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "zh": ["de", "le", "shi", "bu", "wo", "you", "ta", "men"],
}

FLOAT_DECIMALS = 6


def tokenize(text: Column | str) -> Column:
    """Whitespace tokens. SQL twin: regexp_split_to_array(trim(t), '\\s+')."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def doc_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document stats: (id, n_tokens, n_chars, avg_token_len,
    stopword_ratio, punct_ratio, digit_ratio) — the quality-signal raw
    features (length / punctuation / stopword ratios)."""
    toks = tokenize(text_col)
    text = F.col(text_col)
    n_tokens = F.size(toks)
    en = [F.lit(w) for w in STOPWORDS["en"]]
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.length(text).alias("n_chars"),
        F.round(F.length(F.array_join(toks, "")) / n_tokens, FLOAT_DECIMALS)
        .alias("avg_token_len"),
        F.round(
            F.size(F.filter(toks, lambda t: t.isin(STOPWORDS["en"]))) / n_tokens,
            FLOAT_DECIMALS,
        ).alias("stopword_ratio"),
        F.round(
            F.length(F.regexp_replace(text, r"[^\.,;:!\?]", "")) / F.length(text),
            FLOAT_DECIMALS,
        ).alias("punct_ratio"),
        F.round(
            F.length(F.regexp_replace(text, r"[^0-9]", "")) / F.length(text),
            FLOAT_DECIMALS,
        ).alias("digit_ratio"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, quality) — deterministic logistic combination of the raw
    features; the shape of a fastText-style quality filter with the
    learned weights replaced by fixed ones."""
    s = doc_stats(docs, text_col, id_col)
    z = (
        3.0 * F.col("stopword_ratio")
        + 0.1 * F.log(1.0 + F.col("n_tokens"))
        - 5.0 * F.col("punct_ratio")
        - 2.0 * F.col("digit_ratio")
        - 0.05 * F.abs(F.col("avg_token_len") - 5.0)
    )
    return s.select(
        F.col(id_col),
        F.round(1.0 / (1.0 + F.exp(-z)), FLOAT_DECIMALS).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, lang_guess) — stopword-hit language ID; ties broken by
    alphabetically-first language (deterministic). The CASE chain below is
    mirrored verbatim in the SQL oracle."""
    toks = tokenize(text_col)
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(sw)))
        for lang, sw in STOPWORDS.items()
    }
    langs = sorted(STOPWORDS)
    guess = None
    for lang in reversed(langs):
        if guess is None:
            guess = F.lit(lang)
            continue
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        guess = F.when(cond, F.lit(lang)).otherwise(guess)
    return docs.select(F.col(id_col), guess.alias("lang_guess"))


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, fp) — order-sensitive document fingerprint: a positional
    polynomial over portable 60-bit token hashes,
    fp = Σ_pos (hash64(token) % 2^40) · ((pos % 31) + 1), pos 1-based.
    Bounded: 2^40 · 31 · n_tokens stays far below int64 for any real doc.
    SQL twin uses unnest + generate_subscripts."""
    toks = tokenize(text_col)
    exploded = docs.select(
        F.col(id_col), F.posexplode(toks).alias("pos0", "tok")
    ).select(
        id_col,
        ((hash64(F.col("tok")) % F.lit(1 << 40))
         * ((F.col("pos0") + 1) % 31 + 1)).alias("term"),
    )
    return exploded.groupBy(id_col).agg(F.sum("term").alias("fp"))


def token_histogram(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> DataFrame:
    """(token, cnt, docs) — corpus token-frequency table (the vocabulary
    pass every tokenizer build runs first). One explode + one groupBy:
    map-side partial aggregation makes the shuffle carry (token, partial)
    pairs, so volume is bounded by the per-partition VOCABULARY, not the
    token stream — the property that keeps this viable at 100 TB.
    ``docs`` is the document frequency (distinct docs containing the
    token; drives IDF / stopword detection)."""
    toks = docs.select(
        F.col(id_col).alias("_d"),
        F.explode(tokenize(text_col)).alias("token"),
    ).filter(F.col("token") != "")
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.count_distinct(F.col("_d")).alias("docs"),
        )
        .filter(F.col("cnt") >= min_count)
    )


#: GPT-2-style pretokenizer, simplified to the subset Java regex and RE2
#: (DuckDB) evaluate identically — optional leading space + a letter run,
#: digit run, or punctuation run. (The real GPT-2 pattern adds contraction
#: splits and a trailing-space lookahead; RE2 has no lookahead, so the
#: portable form drops them — counts differ by <1% on English text.)
BPE_PRETOKEN_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def token_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, ws_tokens, bpe_tokens, chars_per_bpe_token) — both token
    counts every data pipeline budgets with: whitespace words and
    BPE-pretokenizer pieces (:data:`BPE_PRETOKEN_RE`). Pure JVM column
    expressions (regexp_extract_all + size), single-pass projection, no
    shuffle, no Python."""
    text = F.col(text_col)
    ws = F.size(tokenize(text_col))
    bpe = F.size(F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_RE), 0))
    return docs.select(
        F.col(id_col),
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.round(F.length(text) / F.greatest(bpe, F.lit(1)), FLOAT_DECIMALS)
        .alias("chars_per_bpe_token"),
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, dup_line_frac, dup_word_frac, top_bigram_char_frac) —
    Gopher-style repetition signals (Rae et al. 2021, appendix A1.1:
    duplicate line / paragraph fractions and top-n-gram character
    fractions are the strongest cheap indicators of boilerplate and
    degenerate text):

      * ``dup_line_frac``  = 1 − distinct lines / lines,
      * ``dup_word_frac``  = 1 − distinct tokens / tokens,
      * ``top_bigram_char_frac`` = max over REPEATED word-2-grams
        (occurrences ≥ 2) of (occurrences × gram length) / n_chars — the
        character share a single repeated bigram can explain; 0 when no
        bigram repeats (deterministic: a max over numbers, no argmax
        tie-break needed).

    Plan shape: the line/word fractions are pure array expressions
    (whole-stage codegen, zero shuffle); the bigram pass is one explode +
    one two-level groupBy whose shuffle carries (doc, gram, partial-count)
    — map-side combining bounds it by per-partition vocabulary, the same
    property token_histogram relies on at 100 TB."""
    text = F.col(text_col)
    toks = tokenize(text_col)
    lines = F.split(text, "\n")
    base = docs.select(
        F.col(id_col),
        F.round(
            1.0 - F.size(F.array_distinct(lines)) / F.size(lines),
            FLOAT_DECIMALS,
        ).alias("dup_line_frac"),
        F.round(
            1.0 - F.size(F.array_distinct(toks)) / F.size(toks),
            FLOAT_DECIMALS,
        ).alias("dup_word_frac"),
    )
    grams = docs.select(
        F.col(id_col),
        F.length(text).alias("_nc"),
        F.explode(
            F.zip_with(
                F.expr(f"slice(split(trim({text_col}), '\\\\s+'), 1, "
                       f"size(split(trim({text_col}), '\\\\s+')) - 1)"),
                F.expr(f"slice(split(trim({text_col}), '\\\\s+'), 2, "
                       f"size(split(trim({text_col}), '\\\\s+')) - 1)"),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("gram"),
    )
    top = (
        grams.groupBy(id_col, "_nc", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col, "_nc")
        .agg(
            F.max(
                F.when(F.col("c") >= 2, F.col("c") * F.length("gram"))
            ).alias("_tb")
        )
        .select(
            id_col,
            F.round(F.col("_tb") / F.col("_nc"), FLOAT_DECIMALS)
            .alias("top_bigram_char_frac"),
        )
    )
    return base.join(top, id_col, "left").select(
        id_col, "dup_line_frac", "dup_word_frac",
        F.coalesce(F.col("top_bigram_char_frac"), F.lit(0.0))
        .alias("top_bigram_char_frac"),
    )


def gopher_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_avg_token_len: float = 2.0,
    max_avg_token_len: float = 12.0,
    max_dup_line_frac: float = 0.30,
    max_dup_word_frac: float = 0.70,
    max_top_bigram_char_frac: float = 0.20,
) -> DataFrame:
    """(id, keep) — a Gopher-style document quality rule set: token-count
    and mean-token-length windows plus the repetition caps from
    :func:`repetition_stats`. Fixed, documented thresholds (the published
    rules' shape; the exact numbers are corpus-tuning knobs exposed as
    arguments). A doc is kept iff every rule passes."""
    s = doc_stats(docs, text_col, id_col)
    r = repetition_stats(docs, text_col, id_col)
    j = s.join(r, id_col)
    keep = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("avg_token_len") >= min_avg_token_len)
        & (F.col("avg_token_len") <= max_avg_token_len)
        & (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_word_frac") <= max_dup_word_frac)
        & (F.col("top_bigram_char_frac") <= max_top_bigram_char_frac)
    )
    return j.select(F.col(id_col), keep.alias("keep"))


#: PII patterns — identical strings compile under Java regex and RE2
#: (no lookaround, no \S shorthand inside classes), so the Spark op and
#: the DuckDB twin share them verbatim.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL_RE = r"https?://[^ ]+"
PII_ID_RE = r"[0-9]{7,}"


def mask_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, masked, n_emails, n_urls, n_ids) — deterministic PII scrubbing
    for training-data curation: emails → ``<EMAIL>``, URLs → ``<URL>``,
    long digit runs (ids/phones) → ``<ID>``, with per-document match
    counts for audit. Masking order matters and is fixed: emails before
    URLs before digit runs (an email is never part of a URL here and
    digit runs inside either are already masked). Pure JVM regex
    projection — single-pass, scan-bound at 100 TB."""
    text = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL_RE), 0))
    masked = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    n_urls = F.size(F.regexp_extract_all(masked, F.lit(PII_URL_RE), 0))
    masked = F.regexp_replace(masked, PII_URL_RE, "<URL>")
    n_ids = F.size(F.regexp_extract_all(masked, F.lit(PII_ID_RE), 0))
    masked = F.regexp_replace(masked, PII_ID_RE, "<ID>")
    return docs.select(
        F.col(id_col),
        masked.alias("masked"),
        n_emails.alias("n_emails"),
        n_urls.alias("n_urls"),
        n_ids.alias("n_ids"),
    )


def pack_documents(
    docs: DataFrame,
    max_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 32,
    seed: int = 0,
) -> DataFrame:
    """(id, shard, n_tokens, bin, offset) — deterministic sequence packing
    for pretraining batch assembly (the concatenate-and-chunk scheme:
    documents are laid end-to-end in a fixed order and cut into
    ``max_tokens``-sized bins; a document may span a bin boundary, exactly
    as pretraining token streams do).

    Determinism and scale come from the same trick as stratified_sample:
    each doc is assigned a portable 60-bit hash h(id, seed); ``shard`` =
    h mod n_shards partitions the corpus into independent streams, and
    within a shard docs are ordered by (h, id) — a total order both
    engines reproduce bit-exactly. The running token offset is one window
    cumsum per shard; ``bin`` = floor(start / max_tokens) and ``offset`` =
    start mod max_tokens locate the doc in its stream. At 100 TB the sort
    is per-shard (pick n_shards ∝ cluster width; each shard sorts
    independently after one hash exchange), never global."""
    h = hash64(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))
    base = docs.select(
        F.col(id_col),
        h.alias("_h"),
        F.size(tokenize(text_col)).cast("long").alias("n_tokens"),
        F.pmod(h, F.lit(n_shards)).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return base.select(
        id_col, "shard", "n_tokens",
        F.floor(start / max_tokens).cast("long").alias("bin"),
        (start % max_tokens).alias("offset"),
    )


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    fraction: float,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-stratum sampling — the training-data mixing
    primitive ("p% of each language/source"). A row survives iff its
    portable 60-bit hash of (id, stratum, seed) falls under ``fraction``
    of the hash space: no shuffle at all (pure filter, pushes past column
    pruning to the scan), exactly reproducible across runs and engines
    (md5-based hash has a DuckDB twin), and per-stratum proportions
    concentrate at ``fraction`` with Chernoff bounds — no per-stratum
    count pass needed. Returns the surviving rows unchanged."""
    h = hash64(
        F.concat(
            F.col(id_col).cast("string"), F.lit(":"),
            F.col(strata_col).cast("string"), F.lit(f":{seed}"),
        )
    )
    bound = int(fraction * float(1 << 60))
    return docs.filter(h < F.lit(bound))


def lm_quality_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """(doc_id, n_tokens, avg_nll) — per-document mean negative
    log-likelihood under the CORPUS's own Laplace-smoothed unigram LM:
    the language-model quality filter (the CCNet/KenLM recipe's shape,
    with the corpus unigram distribution standing in for the external
    5-gram model — no model artifacts exist in this sandbox). Low
    avg_nll = token mix typical of the corpus; high = outlier/noise/
    gibberish. Docs with no tokens are excluded.

    Scale shape: vocabulary pass (token_histogram — shuffle bounded by
    per-partition vocabulary), then per-doc (token, k) counts joined
    against the vocabulary ON token — the join shuffles (doc, token,
    k) pairs, never text. Per-token NLL is carried as INTEGER micro-nats
    (round(nll·1e6) as long): the per-doc weighted sum is then exact and
    order-independent — float summation order varies with partitioning
    and flips round-to-6 boundaries — so the DuckDB twin
    (doc_oracles.lm_score_sql) value-hash-matches at any parallelism."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(text_col)).alias("token"),
    ).filter(F.col("token") != "")
    per_doc = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("k")
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    stats = vocab.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("vsize")
    )
    nll = (
        vocab.crossJoin(stats)
        .select(
            "token",
            F.round(
                -F.log(
                    (F.col("cnt") + F.lit(alpha))
                    / (F.col("total") + F.lit(alpha) * F.col("vsize"))
                )
                * F.lit(1_000_000.0),
                0,
            ).cast("long").alias("nll_u"),
        )
    )
    return (
        per_doc.join(nll, "token")
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_tokens"),
            F.round(
                F.sum(F.col("k") * F.col("nll_u")).cast("double")
                / F.lit(1_000_000.0) / F.sum("k"),
                FLOAT_DECIMALS,
            ).alias("avg_nll"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 16,
    overlap: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk, n_tokens, chunk_text) — sliding-window document
    chunking (the RAG / context-window preprocessing step): chunks of
    ``chunk_tokens`` whitespace tokens with ``overlap`` tokens shared
    between consecutive chunks (stride = chunk_tokens - overlap). The
    last chunk may be shorter; every token appears in ≥1 chunk; documents
    with no tokens yield none. ``chunk`` is the 0-based window index.

    This is the per-document sliding-window complement of pack_documents
    (which concatenates ACROSS documents into fixed training sequences).

    Scale shape: a single narrow projection — per input row, the chunk
    count is integer math on size(tokens) and each chunk is a
    slice+join of the already-split array, all in whole-stage codegen;
    the explode multiplies rows by ~n/stride with no shuffle at all.
    Chunk math is pure integers (1 + max(0, ceil((n-C)/S))), exact in the
    DuckDB twin."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokenize(text_col)
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(toks, lambda x: x != "").alias("toks"),
    ).withColumn("n", F.size("toks")).filter(F.col("n") > 0)
    n_chunks = F.lit(1) + F.greatest(
        F.lit(0),
        F.expr(f"(n - {chunk_tokens} + {stride} - 1) div {stride}"),
    )
    return (
        t.select(
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk"),
        )
        .select(
            "doc_id",
            "chunk",
            F.slice(
                "toks", F.col("chunk") * stride + 1, chunk_tokens
            ).alias("ctoks"),
        )
        .select(
            "doc_id",
            "chunk",
            F.size("ctoks").alias("n_tokens"),
            F.array_join("ctoks", " ").alias("chunk_text"),
        )
    )


def normalize_text(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    collapse_whitespace: bool = True,
    strip_control: bool = True,
    max_chars: int | None = None,
) -> DataFrame:
    """(doc_id, text, n_changed) — the standard pre-tokenization cleaning
    stage: lowercase, control-character strip, whitespace collapse (runs
    of blanks/tabs/newlines → one space, trimmed), optional hard length
    truncation. n_changed = 1 iff the text changed (drives cheap
    audit counts). Pure single-pass JVM string expressions — one codegen
    span, no Python, order of operations fixed (strip control →
    collapse → lower → truncate) and mirrored in the DuckDB twin."""
    t = F.col(text_col)
    if strip_control:
        t = F.regexp_replace(t, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    if collapse_whitespace:
        t = F.trim(F.regexp_replace(t, r"\s+", " "))
    if lowercase:
        t = F.lower(t)
    if max_chars is not None:
        t = F.substring(t, 1, max_chars)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        t.alias("text"),
        F.when(t != F.col(text_col), 1).otherwise(0).alias("n_changed"),
    )


def corpus_report(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row (n_docs, n_tokens, vocab_size, n_exact_dups, mean_quality,
    p50_chars) — the corpus data-card summary a curation pipeline prints
    per snapshot. Composition of the existing passes: token/vocab
    aggregates, md5 exact-dup count, quality_score (averaged in integer
    micro-units — the per-doc scores are already rounded to 6, so the sum
    is exact and order-independent), and the exact nearest-rank median of
    character lengths. Each component is one scan + one aggregate; text
    never shuffles (only tokens/hashes/scores do)."""
    from graphscope_spark.functions.quantiles import exact_quantiles

    toks = docs.select(
        F.col(id_col).alias("_d"),
        F.explode(tokenize(text_col)).alias("token"),
    ).filter(F.col("token") != "")
    tok_stats = toks.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct("token").alias("vocab_size"),
    )
    base = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.count(F.lit(1)) - F.count_distinct(F.md5(F.col(text_col)))
        ).alias("n_exact_dups"),
    )
    q = quality_score(docs, text_col, id_col).agg(
        F.round(
            F.sum(
                F.round(F.col("quality") * 1_000_000.0, 0).cast("long")
            ).cast("double")
            / 1_000_000.0
            / F.count(F.lit(1)),
            FLOAT_DECIMALS,
        ).alias("mean_quality")
    )
    med = (
        exact_quantiles(
            docs.select(F.length(text_col).alias("len")), "len", [0.5]
        )
        .select(F.col("value").alias("p50_chars"))
    )
    return (
        base.crossJoin(tok_stats).crossJoin(q).crossJoin(med)
    )


def vocab_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row (vocab_size, n_tokens, hapax, top_token, top_share) —
    vocabulary shape summary: hapax = tokens occurring exactly once
    (the Zipf-tail mass every tokenizer budget cares about), top_token =
    the most frequent token (ties → lexicographically smallest),
    top_share = its corpus share (micro-unit exact). One vocabulary
    aggregate + one 1-row argmax."""
    hist = token_histogram(docs, text_col, id_col)
    tot = hist.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("cnt").alias("n_tokens"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).alias("hapax"),
    )
    top = (
        hist.orderBy(F.col("cnt").desc(), "token")
        .limit(1)
        .select(
            F.col("token").alias("top_token"),
            F.col("cnt").alias("top_cnt"),
        )
    )
    return tot.crossJoin(top).select(
        "vocab_size",
        "n_tokens",
        "hapax",
        "top_token",
        F.round(
            F.col("top_cnt").cast("double") / F.col("n_tokens"), 6
        ).alias("top_share"),
    )
