"""DuckDB oracle SQL for the document-pipeline operators — each mirrors its
Spark twin in graphscope_spark/functions/* expression-for-expression, so the
driver's value-hash comparison passes. Shared constants (stopword lists,
rounding, hash construction) are imported from the Spark modules — one
source of truth.

Portability notes (why each construction is the way it is):
  * tokens: Spark split(trim(t),'\\s+') == DuckDB regexp_split_to_array.
  * 1-based indexing: Spark element_at == DuckDB l[i].
  * 60-bit hash: Spark conv(substr(md5,1,15),16,10) == DuckDB
    CAST('0x'||substr(md5,1,15) AS BIGINT)  (functions/hashing.py).
  * positional explode: Spark posexplode(+1) == DuckDB unnest +
    generate_subscripts (1-based).
  * regexp_replace needs the 'g' flag in DuckDB to match Spark's
    replace-all default.
"""

from __future__ import annotations

from graphscope_spark.functions.hashing import hash64_sql
from graphscope_spark.functions.text import FLOAT_DECIMALS, STOPWORDS

TOKS = "regexp_split_to_array(trim(text), '\\s+')"


def doc_stats_sql() -> str:
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return f"""
WITH t AS (SELECT doc_id, text, {TOKS} AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       length(text) AS n_chars,
       ROUND(length(array_to_string(toks, '')) / CAST(len(toks) AS DOUBLE),
             {FLOAT_DECIMALS}) AS avg_token_len,
       ROUND(len(list_filter(toks, x -> x IN ({en}))) / CAST(len(toks) AS DOUBLE),
             {FLOAT_DECIMALS}) AS stopword_ratio,
       ROUND(length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g'))
             / CAST(length(text) AS DOUBLE), {FLOAT_DECIMALS}) AS punct_ratio,
       ROUND(length(regexp_replace(text, '[^0-9]', '', 'g'))
             / CAST(length(text) AS DOUBLE), {FLOAT_DECIMALS}) AS digit_ratio
FROM t"""


def quality_score_sql() -> str:
    return f"""
WITH s AS ({doc_stats_sql()})
SELECT doc_id,
       ROUND(1.0 / (1.0 + EXP(-(3.0*stopword_ratio + 0.1*LN(1.0 + n_tokens)
             - 5.0*punct_ratio - 2.0*digit_ratio
             - 0.05*ABS(avg_token_len - 5.0)))), {FLOAT_DECIMALS}) AS quality
FROM s"""


def lang_id_sql() -> str:
    langs = sorted(STOPWORDS)
    score_cols = ",\n       ".join(
        "len(list_filter(toks, x -> x IN ({}))) AS s_{}".format(
            ", ".join(f"'{w}'" for w in STOPWORDS[lang]), lang
        )
        for lang in langs
    )
    cases = []
    for lang in langs:
        conds = " AND ".join(
            f"s_{lang} >= s_{o}" for o in langs if o != lang
        )
        cases.append(f"WHEN {conds} THEN '{lang}'")
    case_sql = "\n         ".join(cases[:-1])
    return f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
s AS (SELECT doc_id,
       {score_cols}
      FROM t)
SELECT doc_id,
       CASE {case_sql}
         ELSE '{langs[-1]}' END AS lang_guess
FROM s"""


def fingerprint_sql() -> str:
    h = hash64_sql("tok")
    return f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
e AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
  FROM t
)
SELECT doc_id,
       CAST(SUM(({h} % {1 << 40}) * ((pos % 31) + 1)) AS BIGINT) AS fp
FROM e GROUP BY doc_id"""


def dedup_exact_sql() -> str:
    return """
SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)"""


def _shingle_cte(k: int = 3) -> str:
    """Distinct word k-gram shingles per doc — the twin of
    functions/dedup.py::shingles (1-based element_at, short docs yield one
    shingle via greatest(n-k+1, 1))."""
    parts = ", ".join(f"toks[i+{j}]" for j in range(k))
    return f"""
t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
idx AS (
  SELECT doc_id, toks, unnest(range(1, greatest(len(toks) - {k - 1}, 1) + 1)) AS i
  FROM t
),
sh AS (
  SELECT DISTINCT doc_id, concat_ws(' ', {parts}) AS shingle FROM idx
)"""


def minhash_sql(num_hashes: int = 16, k: int = 3) -> str:
    h = hash64_sql("CAST(perm AS VARCHAR) || ':' || shingle")
    return f"""
WITH {_shingle_cte(k)},
perms AS (SELECT unnest(range({num_hashes})) AS perm)
SELECT doc_id, perm, MIN({h}) AS minhash
FROM sh CROSS JOIN perms
GROUP BY doc_id, perm"""


def ngram_jaccard_sql(threshold: float, k: int = 3) -> str:
    return f"""
WITH {_shingle_cte(k)},
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
cand AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.a, c.b, count(*) AS i
  FROM cand c
  JOIN sh x ON x.doc_id = c.a
  JOIN sh y ON y.doc_id = c.b AND y.shingle = x.shingle
  GROUP BY c.a, c.b
)
SELECT i.a, i.b,
       ROUND(CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i), {FLOAT_DECIMALS}) AS jaccard
FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
WHERE CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i) >= {threshold}"""


def ann_topk_sql(k: int = 5, n_queries: int = 10) -> str:
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS score
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, score FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id ASC) AS rn
  FROM scored
) WHERE rn <= {k}"""


def simhash_sql() -> str:
    """Twin of functions/dedup.py::simhash64: token hash = first 8 bytes of
    md5 big-endian (== first 16 hex chars as UBIGINT), one ±1 vote per
    TOKEN OCCURRENCE (not per distinct token) per bit, bit set iff votes
    > 0. Bit 63 contributes −2^63 so the sum lands directly in the int64
    two's-complement value the numpy path produces; empty docs → 0."""
    return """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
th AS (
  SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 16) AS UBIGINT) AS h
  FROM toks WHERE tok <> ''
),
votes AS (
  SELECT doc_id, b.bit,
         SUM(CASE WHEN ((h >> b.bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
  FROM th CROSS JOIN (SELECT unnest(range(64)) AS bit) b
  GROUP BY doc_id, b.bit
),
sh AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN v > 0 THEN
                CASE WHEN bit = 63 THEN -9223372036854775808
                     ELSE (CAST(1 AS BIGINT) << bit) END
              ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(s.simhash, 0) AS simhash
FROM documents d LEFT JOIN sh s ON d.doc_id = s.doc_id
ORDER BY d.doc_id"""


def multimodal_meta_sql() -> str:
    return """
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS kind,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS sha256
FROM documents"""


def ann_lsh_sql(k: int = 5, dim: int = 64, n_planes: int = 4,
                n_tables: int = 8, seed: int = 42,
                n_queries: int = 10) -> str:
    """Twin of functions/similarity.py::ann_lsh. The hyperplanes are
    deterministic Rademacher components — ±1 by parity of the portable
    60-bit md5 hash of '{seed+1000*t}|{p}|{j}' (similarity._hyperplanes) —
    so the bucket ids, candidate set, cosine scores and top-k are all pure
    SQL. Bucket = sum of 2^p over planes with dot > 0, per table."""
    return f"""
WITH planes AS (
  SELECT t.t, p.p, j.j,
         CASE WHEN CAST('0x' || substr(md5(
                CAST({seed} + 1000 * t.t AS VARCHAR) || '|' ||
                CAST(p.p AS VARCHAR) || '|' || CAST(j.j AS VARCHAR)
              ), 1, 15) AS BIGINT) % 2 = 0
              THEN 1.0 ELSE -1.0 END AS w
  FROM (SELECT unnest(range({n_tables})) AS t) t
  CROSS JOIN (SELECT unnest(range({n_planes})) AS p) p
  CROSS JOIN (SELECT unnest(range({dim})) AS j) j
),
comps AS (
  SELECT vec_id, j.j, CAST(embedding[j.j + 1] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN (SELECT unnest(range({dim})) AS j) j
),
dots AS (
  SELECT c.vec_id, pl.t, pl.p, SUM(c.x * pl.w) AS dot
  FROM comps c JOIN planes pl ON pl.j = c.j
  GROUP BY c.vec_id, pl.t, pl.p
),
buckets AS (
  SELECT vec_id, t,
         SUM(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS bucket
  FROM dots GROUP BY vec_id, t
),
cand AS (
  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
  FROM buckets qb
  JOIN buckets cb ON qb.t = cb.t AND qb.bucket = cb.bucket
  WHERE qb.vec_id < {n_queries} AND cb.vec_id <> qb.vec_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                      qe.embedding::DOUBLE[]), 6) AS score
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.neighbor_id
  JOIN embeddings qe ON qe.vec_id = c.query_id
)
SELECT query_id, neighbor_id, score FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id ASC) AS rn
  FROM scored
) WHERE rn <= {k}"""


def dedup_clusters_sql(threshold: float, k: int = 3, rounds: int = 12) -> str:
    """Twin of functions/dedup.py::dedup_clusters(method='ngram'): exact
    n-gram-Jaccard pairs at ``threshold``, then connected components of the
    pair graph via unrolled min-label propagation (near-dup clusters are
    near-cliques — ``rounds`` needs only to exceed the pair-graph diameter,
    12 is generous at sf0.01), cluster id = min member doc_id, keep =
    (doc_id = cluster_id)."""
    parts = [f"""WITH {_shingle_cte(k)},
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
cand AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.a, c.b, count(*) AS i
  FROM cand c
  JOIN sh x ON x.doc_id = c.a
  JOIN sh y ON y.doc_id = c.b AND y.shingle = x.shingle
  GROUP BY c.a, c.b
),
pairs2 AS (
  SELECT i.a, i.b
  FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
  WHERE CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i) >= {threshold}
),
pe AS (SELECT a AS src, b AS dst FROM pairs2
       UNION ALL SELECT b AS src, a AS dst FROM pairs2),
l0 AS (SELECT doc_id AS id, doc_id AS comp FROM documents)"""]
    for r in range(1, rounds + 1):
        p = f"l{r-1}"
        parts.append(f""",
l{r} AS (
  SELECT l.id, LEAST(l.comp, COALESCE(m.c, l.comp)) AS comp
  FROM {p} l LEFT JOIN (
    SELECT e.dst AS id, MIN(p.comp) AS c
    FROM pe e JOIN {p} p ON e.src = p.id GROUP BY e.dst
  ) m ON l.id = m.id
)""")
    parts.append(f"""
SELECT id AS doc_id, comp AS cluster_id, (id = comp) AS keep
FROM l{rounds} ORDER BY doc_id""")
    # force CTE materialization: DuckDB inlines CTEs, and each unrolled
    # round references the previous one + pe — inlining expands the scan
    # tree multiplicatively (same rationale as tpch_graphs._materialized)
    from graphscope_spark.tpch_graphs import _materialized
    return _materialized("".join(parts))


def token_histogram_sql(min_count: int = 1) -> str:
    """Twin of functions/text.py::token_histogram."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS}) AS token FROM documents
)
SELECT token, COUNT(*) AS cnt, COUNT(DISTINCT doc_id) AS docs
FROM toks WHERE token <> ''
GROUP BY token HAVING COUNT(*) >= {min_count}"""


def stratified_sample_sql(strata_col: str, fraction: float,
                          seed: int = 0) -> str:
    """Twin of functions/text.py::stratified_sample (same 60-bit md5 hash,
    same survival bound)."""
    h = hash64_sql(
        f"CAST(doc_id AS VARCHAR) || ':' || CAST({strata_col} AS VARCHAR)"
        f" || ':{seed}'"
    )
    bound = int(fraction * float(1 << 60))
    return f"""
SELECT doc_id, {strata_col}
FROM documents WHERE {h} < {bound}"""


_REP_BASE = f"""
t AS (SELECT doc_id, text, {TOKS} AS toks FROM documents),
rep_base AS (
  SELECT doc_id,
         ROUND(1 - len(list_distinct(string_split(text, chr(10))))
               / CAST(len(string_split(text, chr(10))) AS DOUBLE),
               {FLOAT_DECIMALS}) AS dup_line_frac,
         ROUND(1 - len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE),
               {FLOAT_DECIMALS}) AS dup_word_frac
  FROM t),
bg AS (
  SELECT doc_id, length(text) AS nc,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1])) AS gram
  FROM t),
rep_top AS (
  SELECT doc_id,
         ROUND(MAX(CASE WHEN c >= 2 THEN c * length(gram) END)
               / CAST(nc AS DOUBLE),
               {FLOAT_DECIMALS}) AS top_bigram_char_frac
  FROM (SELECT doc_id, nc, gram, COUNT(*) AS c
        FROM bg GROUP BY doc_id, nc, gram) g
  GROUP BY doc_id, nc),
rep AS (
  SELECT b.doc_id, b.dup_line_frac, b.dup_word_frac,
         COALESCE(p.top_bigram_char_frac, 0.0) AS top_bigram_char_frac
  FROM rep_base b LEFT JOIN rep_top p ON b.doc_id = p.doc_id)"""


def repetition_stats_sql() -> str:
    """Twin of functions/text.py::repetition_stats (Gopher-style
    repetition signals; list exprs for the line/word fractions, a
    grouped bigram pass for the top-2-gram character share)."""
    return f"""
WITH {_REP_BASE}
SELECT doc_id, dup_line_frac, dup_word_frac, top_bigram_char_frac
FROM rep ORDER BY doc_id"""


def gopher_filter_sql(
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_avg_token_len: float = 2.0,
    max_avg_token_len: float = 12.0,
    max_dup_line_frac: float = 0.30,
    max_dup_word_frac: float = 0.70,
    max_top_bigram_char_frac: float = 0.20,
) -> str:
    """Twin of functions/text.py::gopher_filter — recomputes the same
    (rounded) doc_stats + repetition_stats features and applies the same
    rule conjunction; ``keep`` is CAST to BIGINT on both sides so the
    value-hash compares integers, not engine-specific booleans."""
    return f"""
WITH {_REP_BASE},
st AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         ROUND(length(array_to_string(toks, ''))
               / CAST(len(toks) AS DOUBLE), {FLOAT_DECIMALS}) AS avg_token_len
  FROM t)
SELECT st.doc_id,
       CAST(st.n_tokens >= {min_tokens} AND st.n_tokens <= {max_tokens}
            AND st.avg_token_len >= {min_avg_token_len}
            AND st.avg_token_len <= {max_avg_token_len}
            AND rep.dup_line_frac <= {max_dup_line_frac}
            AND rep.dup_word_frac <= {max_dup_word_frac}
            AND rep.top_bigram_char_frac <= {max_top_bigram_char_frac}
            AS BIGINT) AS keep
FROM st JOIN rep ON st.doc_id = rep.doc_id ORDER BY st.doc_id"""


def pii_mask_sql() -> str:
    """Twin of __spark_entry__._q_pii_mask: deterministically inject
    synthetic PII (the documents table carries none), then mask with the
    SAME patterns (functions/text.py::PII_*_RE — chosen to compile
    identically under Java regex and RE2) and count matches. DuckDB
    regexp_replace needs the explicit 'g' flag to match Spark's
    replace-all default."""
    from graphscope_spark.functions.text import (
        PII_EMAIL_RE, PII_ID_RE, PII_URL_RE,
    )
    inj = ("CASE WHEN doc_id % 3 = 0 THEN text || ' contact user' || doc_id"
           " || '@example.com see http://ex' || doc_id"
           " || '.test id 1234567' || (doc_id % 10) ELSE text END")
    m1 = f"regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g')"
    m2 = f"regexp_replace(m1, '{PII_URL_RE}', '<URL>', 'g')"
    m3 = f"regexp_replace(m2, '{PII_ID_RE}', '<ID>', 'g')"
    return f"""
WITH inj AS (SELECT doc_id, {inj} AS text FROM documents),
s1 AS (SELECT doc_id, text,
              len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS n_emails,
              {m1} AS m1 FROM inj),
s2 AS (SELECT doc_id, n_emails,
              len(regexp_extract_all(m1, '{PII_URL_RE}')) AS n_urls,
              {m2} AS m2 FROM s1),
s3 AS (SELECT doc_id, n_emails, n_urls,
              len(regexp_extract_all(m2, '{PII_ID_RE}')) AS n_ids,
              {m3} AS m3 FROM s2)
SELECT doc_id, sha256(m3) AS masked_sha, n_emails, n_urls, n_ids
FROM s3 ORDER BY doc_id"""


def pack_documents_sql(max_tokens: int, n_shards: int = 32,
                       seed: int = 0) -> str:
    """Twin of functions/text.py::pack_documents — same portable hash,
    same (h, doc_id) per-shard total order, same window cumsum; division
    forced to DOUBLE on both sides so FLOOR(start/max_tokens) rounds
    identically (IEEE)."""
    h = hash64_sql(f"CAST(doc_id AS VARCHAR) || ':{seed}'")
    return f"""
WITH base AS (
  SELECT doc_id, {h} AS h, len({TOKS}) AS n_tokens,
         {h} % {n_shards} AS shard
  FROM documents),
cum AS (
  SELECT doc_id, shard, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id)
              - n_tokens AS BIGINT) AS start
  FROM base)
SELECT doc_id, shard, n_tokens,
       CAST(FLOOR(start / {max_tokens}.0) AS BIGINT) AS bin,
       start % {max_tokens} AS "offset"
FROM cum ORDER BY doc_id"""


def token_counts_sql() -> str:
    """Twin of functions/text.py::token_counts — whitespace-word and
    BPE-pretokenizer counts. ws_tokens must be len(regexp_split) to match
    Spark's split() (both count empty-string tokens of a blank text as 1);
    the BPE pattern is the RE2-portable subset by construction."""
    from graphscope_spark.functions.text import BPE_PRETOKEN_RE

    bpe = f"len(regexp_extract_all(text, '{BPE_PRETOKEN_RE}'))"
    return f"""
SELECT doc_id,
       len({TOKS}) AS ws_tokens,
       {bpe} AS bpe_tokens,
       ROUND(CAST(length(text) AS DOUBLE) / greatest({bpe}, 1),
             {FLOAT_DECIMALS}) AS chars_per_bpe_token
FROM documents"""


def multimodal_decode_sql(n_items: int = 240) -> str:
    """Twin of multimodal.decode_media_meta over synthesize_media(n):
    the Spark side DECODES real PPM/WAV bytes; this side recomputes the
    expected metadata from the generator's closed-form id formulas — the
    hash matches iff decode exactly inverts the encoder."""
    return f"""
WITH m AS (SELECT unnest(range({n_items})) AS media_id)
SELECT media_id,
  CASE WHEN media_id % 2 = 0 THEN 8 + media_id % 25 END AS width,
  CASE WHEN media_id % 2 = 0 THEN 8 + media_id % 17 END AS height,
  CASE WHEN media_id % 2 = 0 THEN 3 ELSE 1 END AS n_channels,
  CASE WHEN media_id % 2 = 1 THEN 8000 END AS sample_rate,
  CASE WHEN media_id % 2 = 1 THEN 800 + media_id % 1600 END AS n_samples,
  CASE WHEN media_id % 2 = 1
       THEN ROUND((800 + media_id % 1600) / 8000.0, 6) END AS duration_s
FROM m"""


def dup_spans_sql(k: int = 5) -> str:
    """Twin of functions/dedup.py::dup_span_stats — shingle hashes,
    doc-frequency, per-doc duplicated-shingle counts and fraction."""
    h = hash64_sql("shingle")
    return f"""
WITH {_shingle_cte(k)},
hs AS (SELECT DISTINCT doc_id, {h} AS h FROM sh),
docfreq AS (SELECT h, count(*) AS df FROM hs GROUP BY h)
SELECT hs.doc_id,
       count(*) AS total_shingles,
       count(CASE WHEN docfreq.df >= 2 THEN 1 END) AS dup_shingles,
       ROUND(CAST(count(CASE WHEN docfreq.df >= 2 THEN 1 END) AS DOUBLE)
             / count(*), {FLOAT_DECIMALS}) AS dup_frac
FROM hs JOIN docfreq ON hs.h = docfreq.h
GROUP BY hs.doc_id"""


def contamination_sql(k: int = 3, eval_mod: int = 97) -> str:
    """Twin of functions/dedup.py::contamination with the gate's
    deterministic eval set (doc_id % eval_mod == 0)."""
    parts = ", ".join(f"toks[i+{j}]" for j in range(k))
    return f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
idx AS (
  SELECT doc_id, toks, unnest(range(1, greatest(len(toks) - {k - 1}, 1) + 1)) AS i
  FROM t
),
sh AS (
  SELECT DISTINCT doc_id, concat_ws(' ', {parts}) AS shingle FROM idx
),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {eval_mod} = 0),
hits AS (
  SELECT s.doc_id, count(*) AS hits
  FROM sh s JOIN ev ON s.shingle = ev.shingle
  GROUP BY s.doc_id
)
SELECT d.doc_id, COALESCE(h.hits, 0) AS hits
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN hits h ON h.doc_id = d.doc_id"""


def semdedup_sql(threshold: float = 0.3, dim: int = 64, n_planes: int = 4,
                 n_tables: int = 8, seed: int = 42, rounds: int = 8) -> str:
    """Twin of functions/similarity.py::semdedup: the deterministic
    md5-Rademacher sign-LSH buckets (same construction as ann_lsh_sql)
    generate the candidate self-join; pairs at ROUND(cosine,6) >=
    threshold form the dup graph; unrolled min-label propagation finds
    the semantic-duplicate groups; cluster id = min member vec_id,
    keep = (vec_id = cluster_id)."""
    parts = [f"""WITH planes AS (
  SELECT t.t, p.p, j.j,
         CASE WHEN CAST('0x' || substr(md5(
                CAST({seed} + 1000 * t.t AS VARCHAR) || '|' ||
                CAST(p.p AS VARCHAR) || '|' || CAST(j.j AS VARCHAR)
              ), 1, 15) AS BIGINT) % 2 = 0
              THEN 1.0 ELSE -1.0 END AS w
  FROM (SELECT unnest(range({n_tables})) AS t) t
  CROSS JOIN (SELECT unnest(range({n_planes})) AS p) p
  CROSS JOIN (SELECT unnest(range({dim})) AS j) j
),
comps AS (
  SELECT vec_id, j.j, CAST(embedding[j.j + 1] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN (SELECT unnest(range({dim})) AS j) j
),
dots AS (
  SELECT c.vec_id, pl.t, pl.p, SUM(c.x * pl.w) AS dot
  FROM comps c JOIN planes pl ON pl.j = c.j
  GROUP BY c.vec_id, pl.t, pl.p
),
buckets AS (
  SELECT vec_id, t,
         SUM(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS bucket
  FROM dots GROUP BY vec_id, t
),
cand AS (
  SELECT DISTINCT a.vec_id AS a, b.vec_id AS b
  FROM buckets a
  JOIN buckets b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
pairs2 AS (
  SELECT c.a, c.b
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.a
  JOIN embeddings eb ON eb.vec_id = c.b
  WHERE ROUND(list_cosine_similarity(ea.embedding::DOUBLE[],
                                     eb.embedding::DOUBLE[]), 6)
        >= {threshold}
),
pe AS (SELECT a AS src, b AS dst FROM pairs2
       UNION ALL SELECT b AS src, a AS dst FROM pairs2),
l0 AS (SELECT vec_id AS id, vec_id AS comp FROM embeddings)"""]
    for r in range(1, rounds + 1):
        p = f"l{r-1}"
        parts.append(f""",
l{r} AS (
  SELECT l.id, LEAST(l.comp, COALESCE(m.c, l.comp)) AS comp
  FROM {p} l LEFT JOIN (
    SELECT e.dst AS id, MIN(p.comp) AS c
    FROM pe e JOIN {p} p ON e.src = p.id GROUP BY e.dst
  ) m ON l.id = m.id
)""")
    parts.append(f"""
SELECT id AS vec_id, comp AS cluster_id, (id = comp) AS keep
FROM l{rounds} ORDER BY vec_id""")
    from graphscope_spark.tpch_graphs import _materialized
    return _materialized("".join(parts))


def mixture_sample_sql(temperature: float, target_rows: int,
                       seed: int = 0) -> str:
    """Twin of functions/mixing.py::mixture_sample over the documents
    table (strata = source): per-source keep rate min(1, target·n^T/Σn^T/n)
    as a 60-bit hash bound, row survives iff hash64(id:source:seed) falls
    under it. pow/division are double-identical across engines; the bound
    is floor()ed in both so truncation direction matches."""
    h = hash64_sql(f"CAST(d.doc_id AS VARCHAR) || ':' || d.source || ':{seed}'")
    return f"""
WITH counts AS (
  SELECT source AS stratum, count(*) AS n FROM documents GROUP BY source
),
powed AS (
  SELECT stratum, n, pow(CAST(n AS DOUBLE), {temperature}) AS w FROM counts
),
tot AS (SELECT SUM(w) AS tot FROM powed),
bounds AS (
  SELECT stratum,
         CAST(floor(LEAST(1.0, {float(target_rows)} * w / tot
                          / CAST(n AS DOUBLE)) * {float(1 << 60)}) AS BIGINT)
         AS bound
  FROM powed CROSS JOIN tot
)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN bounds b ON d.source = b.stratum
WHERE {h} < b.bound"""


def importance_resample_sql(n_select: int, n_buckets: int = 64,
                            target_mod: int = 7, alpha: float = 1.0) -> str:
    """Twin of functions/mixing.py::importance_resample with the gate's
    deterministic target set (doc_id % target_mod == 0). Grams =
    whitespace unigrams + adjacent bigrams; bucket = hash64(gram) %
    n_buckets; per-bucket log-ratio rounded to {FLOAT_DECIMALS} before the
    per-doc sum (also rounded) — mirrors the Spark rounding points."""
    hb = hash64_sql("gram")
    return f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
uni AS (
  SELECT doc_id, unnest(toks) AS gram FROM t
),
bi AS (
  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS gram
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t)
),
grams AS (
  SELECT doc_id, gram FROM uni WHERE gram <> ''
  UNION ALL
  SELECT doc_id, gram FROM bi WHERE gram <> ''
),
gb AS (SELECT doc_id, {hb} % {n_buckets} AS bucket FROM grams),
raw AS (SELECT bucket, count(*) AS rc FROM gb GROUP BY bucket),
tgt AS (SELECT bucket, count(*) AS tc FROM gb
        WHERE doc_id % {target_mod} = 0 GROUP BY bucket),
raw_tot AS (SELECT SUM(rc) AS rt FROM raw),
tgt_tot AS (SELECT SUM(tc) AS tt FROM tgt),
ratios AS (
  SELECT b.bucket,
         ROUND(ln((COALESCE(t.tc, 0) + {alpha}) / (tt + {alpha * n_buckets}))
               - ln((COALESCE(r.rc, 0) + {alpha}) / (rt + {alpha * n_buckets})),
               {FLOAT_DECIMALS}) AS lr
  FROM (SELECT unnest(range({n_buckets})) AS bucket) b
  LEFT JOIN raw r ON r.bucket = b.bucket
  LEFT JOIN tgt t ON t.bucket = b.bucket
  CROSS JOIN raw_tot CROSS JOIN tgt_tot
),
weights AS (
  SELECT g.doc_id, ROUND(SUM(rr.lr), {FLOAT_DECIMALS}) AS weight
  FROM gb g JOIN ratios rr ON rr.bucket = g.bucket
  GROUP BY g.doc_id
)
SELECT doc_id, weight,
       ROW_NUMBER() OVER (ORDER BY weight DESC, doc_id ASC) AS rank
FROM weights
ORDER BY weight DESC, doc_id ASC
LIMIT {n_select}"""


def lm_score_sql(alpha: float = 1.0) -> str:
    """Twin of functions/text.py::lm_quality_score — same Laplace unigram
    NLL with the same two rounding points."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS}) AS token FROM documents
),
tk AS (SELECT doc_id, token FROM toks WHERE token <> ''),
per_doc AS (SELECT doc_id, token, count(*) AS k FROM tk GROUP BY doc_id, token),
vocab AS (SELECT token, count(*) AS cnt FROM tk GROUP BY token),
stats AS (SELECT SUM(cnt) AS total, COUNT(*) AS vsize FROM vocab),
nll AS (
  SELECT token,
         CAST(ROUND(-ln((cnt + {alpha}) / (total + {alpha} * vsize))
                    * 1000000.0, 0) AS BIGINT) AS nll_u
  FROM vocab CROSS JOIN stats
)
SELECT p.doc_id, CAST(SUM(p.k) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(p.k * n.nll_u) AS DOUBLE) / 1000000.0 / SUM(p.k),
             {FLOAT_DECIMALS}) AS avg_nll
FROM per_doc p JOIN nll n ON n.token = p.token
GROUP BY p.doc_id"""


def bm25_sql(query_terms: list[str], k1: float = 1.2, b: float = 0.75) -> str:
    """Twin of functions/retrieval.py::bm25_score — Lucene idf variant,
    same micro-unit rounding point per term contribution."""
    terms = ", ".join(f"'{t}'" for t in query_terms if t)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS}) AS token FROM documents
),
tk AS (SELECT doc_id, token FROM toks WHERE token <> ''),
dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY doc_id),
corpus AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tk
  WHERE token IN ({terms}) GROUP BY doc_id, token
),
df_t AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
scored AS (
  SELECT tf.doc_id,
         CAST(ROUND(
           ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
           * tf.tf * {k1 + 1.0}
           / (tf.tf + {k1} * ({1.0 - b} + {b} * dl.dl / c.avgdl))
           * 1000000.0, 0) AS BIGINT) AS score_u
  FROM tf JOIN df_t d USING (token) JOIN dl USING (doc_id)
  CROSS JOIN corpus c
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched,
       ROUND(CAST(SUM(score_u) AS DOUBLE) / 1000000.0,
             {FLOAT_DECIMALS}) AS score
FROM scored GROUP BY doc_id"""


def tfidf_terms_sql(top_n: int = 3) -> str:
    """Twin of functions/retrieval.py::tfidf_top_terms — smoothed idf,
    integer micro-unit ordering with term-asc tie-break."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS}) AS token FROM documents
),
tk AS (SELECT doc_id, token FROM toks WHERE token <> ''),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tk GROUP BY doc_id, token),
df_t AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
corpus AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
scored AS (
  SELECT tf.doc_id, tf.token AS term,
         CAST(ROUND(tf.tf * (ln((c.n_docs + 1.0) / (d.df + 1.0)) + 1.0)
                    * 1000000.0, 0) AS BIGINT) AS score_u
  FROM tf JOIN df_t d USING (token) CROSS JOIN corpus c
),
ranked AS (
  SELECT doc_id, term, score_u,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_u DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, CAST(rank AS INT) AS rank,
       ROUND(CAST(score_u AS DOUBLE) / 1000000.0, {FLOAT_DECIMALS}) AS tfidf
FROM ranked WHERE rank <= {top_n}"""


def _kmeans_ctes(k: int = 8, rounds: int = 3) -> str:
    """Shared CTE prefix for the quantized-k-means family — unrolled CTE
    per Lloyd round, ending at ``df`` (every vector's distance to every
    FINAL centroid).

    Every step is exact integer math (micro-unit quantization, integer
    squared distances, lexicographic (dist, cid) argmin, floor-division
    centroid update), so the unrolled relational form is bit-equal to the
    Spark loop; see the kmeans.py module docstring for the argument.
    generate_subscripts is 1-based vs Spark posexplode's 0-based d — both
    sides only use d as an internal join key, so alignment is positional.
    """
    parts = [
        f"""
WITH xu AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
         CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000.0, 0)
              AS BIGINT) AS v
  FROM embeddings
),
seeds AS (
  SELECT vec_id,
         row_number() OVER (
           ORDER BY {hash64_sql('CAST(vec_id AS VARCHAR)')}, vec_id
         ) AS cid
  FROM embeddings QUALIFY cid <= {k}
),
c0 AS (SELECT s.cid, x.d, x.v FROM seeds s JOIN xu x USING (vec_id))"""
    ]
    for r in range(1, rounds + 1):
        parts.append(f""",
d{r} AS (
  SELECT x.vec_id, c.cid,
         SUM((x.v - c.v) * (x.v - c.v)) AS dist_u
  FROM xu x JOIN c{r - 1} c USING (d)
  GROUP BY x.vec_id, c.cid
),
a{r} AS (
  SELECT vec_id, cid AS cluster, dist_u FROM d{r}
  QUALIFY row_number() OVER (PARTITION BY vec_id
                             ORDER BY dist_u, cid) = 1
),
c{r} AS (
  SELECT a.cluster AS cid, x.d,
         CAST(FLOOR(CAST(SUM(x.v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS v
  FROM a{r} a JOIN xu x USING (vec_id)
  GROUP BY a.cluster, x.d
)""")
    parts.append(f""",
df AS (
  SELECT x.vec_id, c.cid,
         SUM((x.v - c.v) * (x.v - c.v)) AS dist_u
  FROM xu x JOIN c{rounds} c USING (d)
  GROUP BY x.vec_id, c.cid
)""")
    return "".join(parts)


def kmeans_sql(k: int = 8, rounds: int = 3) -> str:
    """Twin of functions/kmeans.py::kmeans — unrolled CTE per Lloyd round
    (see _kmeans_ctes); the final select is the argmin over the last
    distance table."""
    return f"""{_kmeans_ctes(k, rounds)}
SELECT vec_id, CAST(cid AS INT) AS cluster,
       CAST(dist_u AS BIGINT) AS dist_u
FROM df
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist_u, cid) = 1"""


def ann_ivf_sql(
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    rounds: int = 3,
    n_queries: int = 10,
) -> str:
    """Twin of functions/similarity.py::ann_ivf_exact — replays the whole
    IVF pipeline: quantized-k-means coarse lists (_kmeans_ctes, bit-exact),
    integer argmin list assignment, integer top-nprobe query probing, then
    the float cosine re-rank at the ROUND-6 parity point ann_lsh_sql
    established."""
    return f"""{_kmeans_ctes(nlist, rounds)},
a_final AS (
  SELECT vec_id AS neighbor_id, cid FROM df
  QUALIFY row_number() OVER (PARTITION BY vec_id
                             ORDER BY dist_u, cid) = 1
),
probes AS (
  SELECT vec_id AS query_id, cid FROM df
  WHERE vec_id < {n_queries}
  QUALIFY row_number() OVER (PARTITION BY vec_id
                             ORDER BY dist_u, cid) <= {nprobe}
),
cand AS (
  SELECT DISTINCT p.query_id, a.neighbor_id
  FROM probes p JOIN a_final a USING (cid)
  WHERE a.neighbor_id <> p.query_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                      qe.embedding::DOUBLE[]), 6) AS score
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.neighbor_id
  JOIN embeddings qe ON qe.vec_id = c.query_id
)
SELECT query_id, neighbor_id, score FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY score DESC, neighbor_id ASC) <= {k}"""


def kmv_distinct_sql(k: int = 64) -> str:
    """Twin of functions/sketches.py::kmv_distinct over
    events(event_type, user_id)."""
    h = hash64_sql("CAST(user_id AS VARCHAR)")
    return f"""
WITH hashes AS (
  SELECT DISTINCT event_type AS grp, {h} AS h FROM events
),
topk AS (
  SELECT grp, h FROM hashes
  QUALIFY row_number() OVER (PARTITION BY grp ORDER BY h) <= {k}
),
kth AS (
  SELECT grp, count(*) AS n_kept, max(h) AS h_k FROM topk GROUP BY grp
)
SELECT grp AS event_type, CAST(n_kept AS BIGINT) AS n_kept,
       ROUND(CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
                  ELSE {float(k - 1)} * {float(1 << 60)}
                       / CAST(h_k AS DOUBLE) END,
             {FLOAT_DECIMALS}) AS est_distinct
FROM kth"""


def count_min_sql(depth: int = 4, width: int = 64) -> str:
    """Twin of functions/sketches.py::count_min_sketch over document
    tokens. Spark pmod(h, w) == DuckDB h % w for the always-positive
    60-bit hash."""
    rows = "\nUNION ALL\n".join(
        f"""SELECT {r} AS row,
       {hash64_sql(f"'cm{r}|' || token")} % {width} AS bucket
FROM tk"""
        for r in range(depth)
    )
    return f"""
WITH toks AS (
  SELECT unnest({TOKS}) AS token FROM documents
),
tk AS (SELECT token FROM toks WHERE token <> ''),
rb AS (
{rows}
)
SELECT CAST(row AS INT) AS row, bucket, count(*) AS cnt
FROM rb GROUP BY row, bucket"""


def quantiles_sql(qs: list[float]) -> str:
    """Twin of functions/quantiles.py::exact_quantiles over
    documents.length(text) — nearest-rank with the same pure-integer
    ceil(q*n) rank arithmetic (DuckDB // == Spark div for positives)."""
    values = ", ".join(
        f"({float(q)}, {int(round(q * 1_000_000))})" for q in qs
    )
    return f"""
WITH hist AS (
  SELECT length(text) AS value, count(*) AS cnt FROM documents
  WHERE length(text) IS NOT NULL GROUP BY 1
),
cum AS (
  SELECT value, SUM(cnt) OVER (ORDER BY value
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hist
),
tot AS (SELECT SUM(cnt) AS n FROM hist),
qs AS (SELECT * FROM (VALUES {values}) AS t(q, q_u)),
j AS (
  SELECT q.q, c.value
  FROM cum c CROSS JOIN tot CROSS JOIN qs q
  WHERE c.cum >= GREATEST(1, (q.q_u * tot.n + 999999) // 1000000)
)
SELECT CAST(q AS DOUBLE) AS q, MIN(value) AS value FROM j GROUP BY q"""


def lsh_pairs_sql(num_hashes: int = 16, bands: int = 4, k: int = 3) -> str:
    """Twin of functions/dedup.py::minhash_lsh_pairs (candidates only) and
    of the streaming fold (streaming/incremental.py::merge_dedup — LSH
    collision is a per-pair predicate, so the fold's final pair set equals
    this one-shot relational form for any chunking). Band key =
    '_'-joined signature rows in permutation order (string_agg ORDER BY
    perm == Spark concat_ws over element_at in index order)."""
    r = num_hashes // bands
    return f"""
WITH sig AS ({minhash_sql(num_hashes, k)}),
banded AS (
  SELECT doc_id, perm // {r} AS band,
         string_agg(CAST(minhash AS VARCHAR), '_' ORDER BY perm) AS key
  FROM sig GROUP BY doc_id, perm // {r}
)
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
FROM banded x JOIN banded y USING (band, key)
WHERE x.doc_id < y.doc_id"""


def sessionize_sql(gap_minutes: int = 360) -> str:
    """Twin of functions/events.py::sessionize — same integer epoch-us
    gap/cumsum construction (Spark unix_micros == DuckDB epoch_us)."""
    gap_us = int(gap_minutes) * 60_000_000
    return f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
),
flagged AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN ts_us - lag(ts_us) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS new_session
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT user_id, ts_us,
         SUM(new_session) OVER (PARTITION BY user_id
           ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1 AS session
  FROM flagged
)
SELECT user_id, CAST(session AS BIGINT) AS session,
       count(*) AS n_events,
       MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
FROM sess GROUP BY user_id, session"""


def funnel_sql(steps: list[str]) -> str:
    """Twin of functions/events.py::funnel — first-touch reach times,
    strictly-after progression."""
    ctes = [
        """e AS (
  SELECT user_id, event_type AS etype, epoch_us(ts) AS ts_us FROM events
)"""
    ]
    prev = None
    for i, step in enumerate(steps, start=1):
        cond = (
            f"JOIN r{i - 1} p USING (user_id) WHERE e.etype = '{step}' "
            f"AND e.ts_us > p.t"
            if prev
            else f"WHERE e.etype = '{step}'"
        )
        ctes.append(
            f"""r{i} AS (
  SELECT user_id, MIN(ts_us) AS t FROM e {cond} GROUP BY user_id
)"""
        )
        prev = step
    selects = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, '{s}' AS step_name,"
        f" (SELECT count(*) FROM r{i}) AS n_users"
        for i, s in enumerate(steps, start=1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects


def asof_join_sql(
    left_type: str = "click", right_type: str = "purchase"
) -> str:
    """Twin of functions/events.py::asof_join applied to the gate query
    (left = ``left_type`` events, right = ``right_type`` events, key =
    user_id): per left event the latest right event at ts <=, ties to the
    lexicographically-last (event_id, value) tuple — ORDER BY ts_us DESC,
    (event_id, value) DESC picks exactly what the carry-forward window
    carries."""
    return f"""
WITH l AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
  WHERE event_type = '{left_type}'
),
r AS (
  SELECT event_id, user_id, value, epoch_us(ts) AS ts_us FROM events
  WHERE event_type = '{right_type}'
),
matched AS (
  SELECT l.event_id, l.user_id, l.ts_us,
         r.event_id AS event_id_right, r.value AS value_right
  FROM l JOIN r ON r.user_id = l.user_id AND r.ts_us <= l.ts_us
  QUALIFY row_number() OVER (
    PARTITION BY l.event_id
    ORDER BY r.ts_us DESC, r.event_id DESC, r.value DESC) = 1
)
SELECT event_id, user_id, ts_us, event_id_right, value_right
FROM matched"""


def range_join_sql(n_windows: int = 10) -> str:
    """Twin of functions/events.py::range_join on the gate's synthetic
    campaign windows (window w covers [2024-01-01 + 3w days,
    +2 days) half-open) — relational theta join, same half-open
    predicate."""
    base = "epoch_us(TIMESTAMP '2024-01-01 00:00:00')"
    day = 86_400_000_000
    return f"""
WITH win AS (
  SELECT w AS window_id,
         {base} + w * 3 * {day} AS lo_us,
         {base} + (w * 3 + 2) * {day} AS hi_us
  FROM (SELECT unnest(range({n_windows})) AS w)
),
p AS (SELECT event_id, epoch_us(ts) AS ts_us FROM events
      WHERE event_type = 'error')
SELECT p.event_id, win.window_id
FROM p JOIN win ON win.lo_us <= p.ts_us AND p.ts_us < win.hi_us"""


def retention_sql() -> str:
    """Twin of functions/events.py::retention_cohorts — integer epoch-day
    arithmetic (epoch_us // day == unix_micros div day)."""
    day = 86_400_000_000
    return f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {day} AS d FROM events
),
first AS (SELECT user_id, MIN(d) AS cohort_day FROM ud GROUP BY user_id)
SELECT f.cohort_day, ud.d - f.cohort_day AS day_offset,
       count(*) AS n_users
FROM ud JOIN first f USING (user_id)
GROUP BY f.cohort_day, ud.d - f.cohort_day"""


def _bpe_ctes(n_merges: int) -> list[str]:
    """Unrolled BPE merge-round CTEs ending at s{n_merges} — the shared
    prefix of bpe_sql (vocab) and bpe_encode_sql (application): pair
    counting via lead() windows, argmax with (total DESC, x, y)
    tie-break, greedy application via the chain-parity windows (see
    bpe.py's module docstring), state rebuild via NOT EXISTS anti-join +
    union. All integers and strings — exact. (substr can't share a
    SELECT with the unnest alias in DuckDB, hence the sidx re-project.)"""
    parts = [
        f"""
WITH toks AS (
  SELECT unnest({TOKS}) AS token FROM documents
),
words AS (
  SELECT token AS word, count(*) AS cnt FROM toks
  WHERE token <> '' GROUP BY token
),
sidx AS (
  SELECT word, cnt, unnest(range(1, length(word) + 1)) AS pos FROM words
),
s0 AS (
  SELECT word, cnt, CAST(pos AS BIGINT) AS pos,
         substr(word, CAST(pos AS INT), 1) AS sym
  FROM sidx
)"""
    ]
    for r in range(1, n_merges + 1):
        parts.append(f""",
p{r} AS (
  SELECT word, cnt, pos, sym AS x,
         lead(pos) OVER w AS nxt_pos, lead(sym) OVER w AS y
  FROM s{r - 1} WINDOW w AS (PARTITION BY word ORDER BY pos)
),
b{r} AS (
  SELECT x, y FROM p{r} WHERE y IS NOT NULL
  GROUP BY x, y ORDER BY SUM(cnt) DESC, x, y LIMIT 1
),
ch{r} AS (
  SELECT word, pos, nxt_pos,
         CASE WHEN lag(nxt_pos) OVER w = pos THEN 0 ELSE 1 END AS new_chain
  FROM p{r} JOIN b{r} USING (x, y)
  WINDOW w AS (PARTITION BY word ORDER BY pos)
),
cc{r} AS (
  SELECT word, pos, nxt_pos,
         SUM(new_chain) OVER (PARTITION BY word ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chain
  FROM ch{r}
),
a{r} AS (
  SELECT word, pos, nxt_pos FROM cc{r}
  QUALIFY row_number() OVER (PARTITION BY word, chain ORDER BY pos) % 2 = 1
),
s{r} AS (
  SELECT s.word, s.cnt, s.pos, s.sym FROM s{r - 1} s
  WHERE NOT EXISTS (
    SELECT 1 FROM a{r} a
    WHERE a.word = s.word AND (a.pos = s.pos OR a.nxt_pos = s.pos)
  )
  UNION ALL
  SELECT a.word, w.cnt, a.pos, b.x || b.y AS sym
  FROM a{r} a JOIN words w USING (word) CROSS JOIN b{r} b
)""")
    return parts


def bpe_sql(n_merges: int = 3) -> str:
    """Twin of functions/bpe.py::bpe_symbol_freq (see _bpe_ctes)."""
    parts = list(_bpe_ctes(n_merges))
    parts.append(f"""
SELECT sym, CAST(SUM(cnt) AS BIGINT) AS freq
FROM s{n_merges} GROUP BY sym""")
    return "".join(parts)


def bpe_encode_sql(n_merges: int = 3) -> str:
    """Twin of functions/bpe.py::bpe_encode — per-document piece counts
    under the learned segmentation (the final merge state IS each corpus
    word's segmentation)."""
    parts = list(_bpe_ctes(n_merges))
    parts.append(f""",
seg AS (
  SELECT word, CAST(count(*) AS BIGINT) AS n_pieces
  FROM s{n_merges} GROUP BY word
),
stream AS (
  SELECT doc_id, unnest({TOKS}) AS word FROM documents
),
st AS (SELECT doc_id, word FROM stream WHERE word <> '')
SELECT st.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(SUM(seg.n_pieces) AS BIGINT) AS bpe_pieces
FROM st JOIN seg USING (word)
GROUP BY st.doc_id""")
    return "".join(parts)


def chunk_documents_sql(chunk_tokens: int = 16, overlap: int = 4) -> str:
    """Twin of functions/text.py::chunk_documents — same integer chunk
    count, 1-based inclusive list slice == Spark slice(start, length)."""
    s = chunk_tokens - overlap
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter({TOKS}, x -> x <> '') AS toks
  FROM documents
),
sized AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
idx AS (
  SELECT doc_id, toks,
         unnest(range(0, 1 + greatest(0,
           (n - {chunk_tokens} + {s} - 1) // {s}))) AS chunk
  FROM sized
),
c AS (
  SELECT doc_id, CAST(chunk AS INT) AS chunk,
         toks[chunk * {s} + 1 : chunk * {s} + {chunk_tokens}] AS ctoks
  FROM idx
)
SELECT doc_id, chunk, CAST(len(ctoks) AS INT) AS n_tokens,
       array_to_string(ctoks, ' ') AS chunk_text
FROM c"""


def quantiles_by_sql(qs: list[float]) -> str:
    """Twin of functions/quantiles.py::exact_quantiles_by over
    events(event_type, value)."""
    values = ", ".join(
        f"({float(q)}, {int(round(q * 1_000_000))})" for q in qs
    )
    return f"""
WITH hist AS (
  SELECT event_type AS grp, value, count(*) AS cnt FROM events
  WHERE value IS NOT NULL GROUP BY 1, 2
),
totals AS (SELECT grp, SUM(cnt) AS n FROM hist GROUP BY grp),
cum AS (
  SELECT grp, value, SUM(cnt) OVER (PARTITION BY grp ORDER BY value
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hist
),
qs AS (SELECT * FROM (VALUES {values}) AS t(q, q_u)),
j AS (
  SELECT c.grp, q.q, c.value
  FROM cum c JOIN totals t USING (grp) CROSS JOIN qs q
  WHERE c.cum >= GREATEST(1, (q.q_u * t.n + 999999) // 1000000)
)
SELECT grp AS event_type, CAST(q AS DOUBLE) AS q, MIN(value) AS value
FROM j GROUP BY grp, q"""


def zorder_sql(cols: list[str], bits: int = 8, table: str = "lineitem",
               keep: list[str] | None = None) -> str:
    """Twin of functions/layout.py::zorder_key — same integer min-max
    normalization and bit interleave (Spark shiftleft/shiftright/div ==
    DuckDB <</>> and //)."""
    n = len(cols)
    keep = keep or cols
    mins = ", ".join(
        f"MIN(CAST({c} AS BIGINT)) AS _min_{c}, "
        f"MAX(CAST({c} AS BIGINT)) AS _max_{c}"
        for c in cols
    )
    norms = ", ".join(
        f"((CAST({c} AS BIGINT) - _min_{c}) * {(1 << bits) - 1}) // "
        f"GREATEST(CAST(1 AS BIGINT), _max_{c} - _min_{c}) AS _n_{c}"
        for c in cols
    )
    terms = " + ".join(
        f"(((_n_{c} >> {b}) % 2) << {b * n + i})"
        for b in range(bits)
        for i, c in enumerate(cols)
    )
    keep_sql = ", ".join(keep)
    return f"""
WITH stats AS (SELECT {mins} FROM {table}),
normed AS (
  SELECT {keep_sql}, {norms} FROM {table} CROSS JOIN stats
)
SELECT {keep_sql}, CAST({terms} AS BIGINT) AS z FROM normed"""


def rolling_sql(days: int = 7) -> str:
    """Twin of functions/events.py::rolling_window_sum — RANGE frame over
    integer epoch-us with integer-cent sums."""
    day_us = 86_400_000_000
    return f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id, ts_us,
       count(*) OVER w AS n_in_window,
       ROUND(CAST(SUM(cents) OVER w AS DOUBLE) / 100.0, 2) AS roll_value
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN {days * day_us} PRECEDING AND CURRENT ROW)"""


def fuzzy_pairs_sql(
    max_distance: int = 2, ngram: int = 3,
    table: str = "part", id_col: str = "p_partkey", str_col: str = "p_name",
) -> str:
    """Twin of functions/fuzzy.py::fuzzy_string_pairs — same n-gram
    candidate rule, length prefilter, and exact levenshtein verify."""
    return f"""
WITH s AS (SELECT {id_col} AS id, {str_col} AS st FROM {table}),
gidx AS (
  SELECT id, st, unnest(range(1, greatest(length(st) - {ngram - 1}, 1) + 1)) AS i
  FROM s
),
grams AS (
  SELECT DISTINCT id, substr(st, CAST(i AS INT), {ngram}) AS gram FROM gidx
),
cand AS (
  SELECT DISTINCT x.id AS a, y.id AS b
  FROM grams x JOIN grams y USING (gram)
  WHERE x.id < y.id
)
SELECT c.a, c.b, CAST(levenshtein(sa.st, sb.st) AS INT) AS dist
FROM cand c JOIN s sa ON sa.id = c.a JOIN s sb ON sb.id = c.b
WHERE abs(length(sa.st) - length(sb.st)) <= {max_distance}
  AND levenshtein(sa.st, sb.st) <= {max_distance}"""


def interval_overlap_sql(gap_minutes: int = 360, n_windows: int = 10) -> str:
    """Twin of the interval_join gate query: user sessions (sessionize
    twin as a CTE) overlap-joined with the synthetic campaign windows —
    relational theta form of the same half-open overlap predicate."""
    base = "epoch_us(TIMESTAMP '2024-01-01 00:00:00')"
    day = 86_400_000_000
    return f"""
WITH sess AS ({sessionize_sql(gap_minutes)}),
win AS (
  SELECT w AS window_id,
         {base} + w * 3 * {day} AS lo_us,
         {base} + (w * 3 + 2) * {day} AS hi_us
  FROM (SELECT unnest(range({n_windows})) AS w)
)
SELECT s.user_id, s.session, win.window_id
FROM sess s JOIN win
  ON GREATEST(s.start_us, win.lo_us) < LEAST(s.end_us + 1, win.hi_us)"""


def pmi_pairs_sql(min_pair_docs: int = 2, top_n: int = 100) -> str:
    """Twin of functions/retrieval.py::pmi_pairs — same doc-level
    co-occurrence, micro-nat integer ranking."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS}) AS token FROM documents
),
per AS (SELECT DISTINCT doc_id, token FROM toks WHERE token <> ''),
nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM per),
dft AS (SELECT token, count(*) AS n FROM per GROUP BY token),
pairs AS (
  SELECT a.token AS x, b.token AS y, count(*) AS n_xy
  FROM per a JOIN per b ON a.doc_id = b.doc_id AND a.token < b.token
  GROUP BY a.token, b.token
  HAVING count(*) >= {min_pair_docs}
),
scored AS (
  SELECT p.x, p.y, p.n_xy,
         CAST(ROUND(ln(CAST(nd.n_docs AS DOUBLE) * p.n_xy
                       / (dx.n * dy.n)) * 1000000.0, 0) AS BIGINT) AS pmi_u
  FROM pairs p
  JOIN dft dx ON dx.token = p.x
  JOIN dft dy ON dy.token = p.y
  CROSS JOIN nd
)
SELECT x, y, CAST(n_xy AS BIGINT) AS n_xy,
       ROUND(CAST(pmi_u AS DOUBLE) / 1000000.0, {FLOAT_DECIMALS}) AS pmi
FROM scored
QUALIFY row_number() OVER (ORDER BY pmi_u DESC, x, y) <= {top_n}"""


def normalize_text_sql(max_chars: int | None = None) -> str:
    """Twin of functions/text.py::normalize_text (default flags) — same
    operation order; DuckDB regexp_replace needs the 'g' flag."""
    t = r"regexp_replace(text, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g')"
    t = f"trim(regexp_replace({t}, '\\s+', ' ', 'g'))"
    t = f"lower({t})"
    if max_chars is not None:
        t = f"substr({t}, 1, {max_chars})"
    return f"""
SELECT doc_id, {t} AS text,
       CASE WHEN {t} <> text THEN 1 ELSE 0 END AS n_changed
FROM documents"""


def corpus_report_sql() -> str:
    """Twin of functions/text.py::corpus_report — same micro-unit mean
    over the quality twin, same nearest-rank median."""
    return f"""
WITH tk AS (
  SELECT doc_id, unnest({TOKS}) AS token FROM documents
),
tok AS (
  SELECT count(*) AS n_tokens, count(DISTINCT token) AS vocab_size
  FROM tk WHERE token <> ''
),
base AS (
  SELECT count(*) AS n_docs,
         count(*) - count(DISTINCT md5(text)) AS n_exact_dups
  FROM documents
),
q AS (
  SELECT ROUND(CAST(SUM(CAST(ROUND(quality * 1000000.0, 0) AS BIGINT))
               AS DOUBLE) / 1000000.0 / count(*),
               {FLOAT_DECIMALS}) AS mean_quality
  FROM ({quality_score_sql()})
),
hist AS (
  SELECT length(text) AS value, count(*) AS cnt FROM documents GROUP BY 1
),
cum AS (
  SELECT value, SUM(cnt) OVER (ORDER BY value
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hist
),
tot AS (SELECT SUM(cnt) AS n FROM hist),
med AS (
  SELECT CAST(MIN(value) AS INT) AS p50_chars FROM cum CROSS JOIN tot
  WHERE cum >= GREATEST(1, (500000 * tot.n + 999999) // 1000000)
)
SELECT base.n_docs, tok.n_tokens, tok.vocab_size,
       CAST(base.n_exact_dups AS BIGINT) AS n_exact_dups,
       q.mean_quality, med.p50_chars
FROM base CROSS JOIN tok CROSS JOIN q CROSS JOIN med"""


def quantize_embeddings_sql() -> str:
    """Twin of functions/similarity.py::quantize_embeddings."""
    return """
WITH x AS (
  SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xs
  FROM embeddings
),
stats AS (
  SELECT vec_id, xs, list_min(xs) AS lo, list_max(xs) - list_min(xs) AS span
  FROM x
)
SELECT vec_id,
       list_transform(xs, v -> CASE WHEN span > 0
         THEN CAST(ROUND((v - lo) * 255.0 / span, 0) AS INT)
         ELSE 0 END) AS codes,
       ROUND(lo, 6) AS lo, ROUND(span, 6) AS span
FROM stats"""


def vocab_stats_sql() -> str:
    """Twin of functions/text.py::vocab_stats."""
    return """
WITH tk AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents
),
hist AS (
  SELECT token, count(*) AS cnt FROM tk WHERE token <> '' GROUP BY token
),
tot AS (
  SELECT count(*) AS vocab_size, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
  FROM hist
),
top AS (
  SELECT token AS top_token, cnt AS top_cnt FROM hist
  ORDER BY cnt DESC, token LIMIT 1
)
SELECT vocab_size, n_tokens, hapax, top_token,
       ROUND(CAST(top_cnt AS DOUBLE) / n_tokens, 6) AS top_share
FROM tot CROSS JOIN top"""


def hll_distinct_sql(b: int = 6) -> str:
    """Twin of functions/sketches.py::hll_distinct over
    events(event_type, user_id). Same trailing-zero observable
    (log2 of the isolated lowest set bit — exact for powers of two in
    both engines), same integer register sum."""
    m = 1 << b
    h = hash64_sql("CAST(user_id AS VARCHAR)")
    return f"""
WITH hx AS (
  SELECT event_type AS grp, {h} AS h FROM events
),
bits AS (
  SELECT grp, h % {m} AS reg, (h - (h % {m})) // {m} AS w FROM hx
),
rhos AS (
  SELECT grp, reg,
         CASE WHEN w = 0 THEN 55
              ELSE CAST(log2(CAST(w & (-w) AS DOUBLE)) + 1 AS INT)
         END AS rho
  FROM bits
),
regs AS (
  SELECT grp, reg, MAX(rho) AS M FROM rhos GROUP BY grp, reg
),
agg AS (
  SELECT grp, COUNT(*) AS n_registers,
         SUM(CAST(power(2.0, 55 - M) AS BIGINT)) AS s_int
  FROM regs GROUP BY grp
)
SELECT grp AS event_type,
       CAST(n_registers AS BIGINT) AS n_registers,
       ROUND(CASE WHEN (0.7213 / (1.0 + 1.079 / {float(m)}))
                       * {float(m * m)} * {float(2 ** 55)}
                       / (s_int + ({m} - n_registers) * {float(2 ** 55)})
                       <= 2.5 * {m}
                  AND ({m} - n_registers) > 0
             THEN {float(m)} * ln({float(m)}
                                  / CAST({m} - n_registers AS DOUBLE))
             ELSE (0.7213 / (1.0 + 1.079 / {float(m)}))
                  * {float(m * m)} * {float(2 ** 55)}
                  / (s_int + ({m} - n_registers) * {float(2 ** 55)})
             END, {FLOAT_DECIMALS}) AS est_distinct
FROM agg"""
