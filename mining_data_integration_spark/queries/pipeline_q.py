"""End-to-end corpus-cleaning pipeline, oracle-checked (SURVEY §7.4).

dp1 runs pipelines.clean_corpus — language filter, quality filter,
exact dedup, MinHash-LSH near-dup removal — and the DuckDB oracle
replays the identical funnel in SQL (all stages are md5/ratio column
math, so the two engines agree bit-for-bit on the surviving set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import EN_STOPWORDS
from ..pipelines import clean_corpus
from ._util import spread, t
from .dedup import _NORM, _WORDS, _duck_shingles, _minhash_band_sql

_DP_STOPLIST = ", ".join(f"'{w}'" for w in EN_STOPWORDS)

MIN_TOKENS = 10
MIN_QUALITY = 0.3
EN_THRESHOLD = 0.08


def dp1_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    out = clean_corpus(docs, min_tokens=MIN_TOKENS,
                       min_quality=MIN_QUALITY, lang="en")
    return out.select("doc_id").orderBy("doc_id")


_STOPLIST = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"

_BANDS_SQL = _minhash_band_sql(3, 16, 4)
# rebuild the band SQL over the post-filter survivors instead of the
# raw documents table, and keep only the drop side (higher id)
_BANDS_OVER_SURVIVORS = _BANDS_SQL.replace(
    _duck_shingles(3), _duck_shingles(3, "survivors")
).replace("ORDER BY id1, id2", "")

def dp2_clean_corpus_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dp1 with the semantically-right near-dup rule: candidate pairs
    collapse into connected components and exactly one representative
    per cluster survives (pipelines.clean_corpus transitive=True).
    The oracle replays the closure with WITH RECURSIVE."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    out = clean_corpus(docs, min_tokens=MIN_TOKENS,
                       min_quality=MIN_QUALITY, lang="en", transitive=True)
    return out.select("doc_id").orderBy("doc_id")


def dp3_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test split by content-free key hash —
    the reproducible-sampling idiom for corpus pipelines: no PRNG
    state, stable under reshuffles/reruns, and any engine computing
    md5 agrees on the assignment (which is what makes it, unlike
    TABLESAMPLE, oracle-checkable). Bucket = first 4 hex digits of
    md5(doc_id) mod 100; 80/10/10 split."""
    docs = t(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
               16, 10).cast("long"),
        F.lit(100),
    )
    return (
        docs.select(
            "doc_id",
            bucket.alias("bucket"),
        )
        .withColumn(
            "split",
            F.when(F.col("bucket") < 80, "train")
            .when(F.col("bucket") < 90, "valid")
            .otherwise("test"),
        )
        .orderBy("doc_id")
    )


SAMPLE_RATES = {"en": 0.5, "zh": 0.25}
PACK_BUDGET = 512


def dp4_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum downsampling by language: keep 50% of
    the dominant `en`, 25% of `zh`, all the rest — the class-rebalance
    step of a corpus pipeline (pipelines.stratified_sample). Map-side
    only, no PRNG, engine-portable."""
    from ..pipelines import stratified_sample

    docs = t(spark, sf_dir, "documents")
    return (
        stratified_sample(docs, "lang", SAMPLE_RATES, key_col="doc_id")
        .select("doc_id", "lang", "sample_bucket")
        .orderBy("doc_id")
    )


def dp5_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed 512-token training shards by global
    running token offset (pipelines.pack_sequences): pack_id = first
    token's offset div budget. The cumulative offset is the two-phase
    range-sharded cumsum — no single-partition window at any corpus
    size."""
    from ..operators.text import tokens
    from ..pipelines import pack_sequences

    docs = t(spark, sf_dir, "documents")
    return pack_sequences(
        docs, PACK_BUDGET,
        token_count=F.size(tokens(F.col("text"))),
        order_by=[F.col("doc_id")],
        id_cols=["doc_id"],
    ).orderBy("doc_id")


DECON_N = 5


def dp6_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination report: per train-split doc (dp3's
    hash split), the count of distinct 5-gram shingles shared with the
    test split, and a contaminated flag (pipelines.decontaminate).
    One equi shuffle join on the shingle — no broadcast assumption on
    the eval side."""
    from ..pipelines import decontaminate

    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
               16, 10).cast("long"),
        F.lit(100),
    )
    with_b = docs.withColumn("_b", bucket)
    train = with_b.filter(F.col("_b") < 80).drop("_b")
    test = with_b.filter(F.col("_b") >= 90).drop("_b")
    return decontaminate(train, test, n=DECON_N).orderBy("doc_id")


TEMP_COEF = 4


def dp7_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened sampling by language: cap each language at
    floor(4 * sqrt(n)) docs, md5-ordered prefix kept
    (pipelines.temperature_sample)."""
    from ..pipelines import temperature_sample

    docs = t(spark, sf_dir, "documents")
    return temperature_sample(docs, "lang", coef=TEMP_COEF) \
        .orderBy("doc_id")


SHUF_SEED = "shuf-0"
SHUF_SHARDS = 16


def dp8_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: md5-permutation rank over the
    corpus dealt into 16 round-robin shards (pipelines.global_shuffle;
    rank via the two-phase sharded row_number)."""
    from ..pipelines import global_shuffle

    docs = t(spark, sf_dir, "documents")
    return global_shuffle(docs, seed=SHUF_SEED, n_shards=SHUF_SHARDS) \
        .orderBy("doc_id")


QUERIES = {
    "dp1_clean_corpus": dp1_clean_corpus,
    "dp2_clean_corpus_clustered": dp2_clean_corpus_clustered,
    "dp3_hash_split": dp3_hash_split,
    "dp4_stratified_sample": dp4_stratified_sample,
    "dp5_sequence_pack": dp5_sequence_pack,
    "dp6_decontaminate": dp6_decontaminate,
    "dp7_temperature_sample": dp7_temperature_sample,
    "dp8_global_shuffle": dp8_global_shuffle,
}

def _hex4_to_int(expr: str) -> str:
    """First 4 hex digits of md5(expr) as an integer, by digit-position
    arithmetic (DuckDB-portable, mirrors the Spark conv/substring)."""
    digit = "(strpos('0123456789abcdef', substring(md5({e}), {p}, 1)) - 1)"
    return " + ".join(
        digit.format(e=expr, p=j + 1) + f" * {16 ** (3 - j)}"
        for j in range(4)
    )


_DP4_THRESH = " ".join(
    f"WHEN lang = '{s}' THEN {int(r * 10000)}"
    for s, r in SAMPLE_RATES.items()
)

_DP6_BUCKET = f"({_hex4_to_int('CAST(doc_id AS VARCHAR)')}) % 100"

ORACLES = {
    "dp6_decontaminate": f"""
        WITH b AS (
            SELECT doc_id, text, {_DP6_BUCKET} AS bucket FROM documents
        ), train AS (
            SELECT doc_id, text FROM b WHERE bucket < 80
        ), test AS (
            SELECT doc_id, text FROM b WHERE bucket >= 90
        ), trs AS ({_duck_shingles(DECON_N, "train")}),
        tes AS (
            SELECT DISTINCT shingle FROM ({_duck_shingles(DECON_N, "test")})
        ), hits AS (
            SELECT id, count(*) AS n_shared
            FROM trs JOIN tes USING (shingle) GROUP BY id
        )
        SELECT t.doc_id,
               CAST(coalesce(h.n_shared, 0) AS BIGINT) AS n_shared,
               coalesce(h.n_shared, 0) > 0 AS contaminated
        FROM train t LEFT JOIN hits h ON t.doc_id = h.id
        ORDER BY t.doc_id
    """,
    "dp7_temperature_sample": f"""
        WITH sizes AS (
            SELECT lang, count(*) AS n FROM documents GROUP BY lang
        ), ranked AS (
            SELECT d.doc_id, d.lang, s.n,
                   floor({TEMP_COEF} * sqrt(CAST(s.n AS DOUBLE))) AS cap,
                   row_number() OVER (PARTITION BY d.lang
                       ORDER BY md5(CAST(d.doc_id AS VARCHAR) || ':' || d.lang),
                                d.doc_id) AS rk
            FROM documents d JOIN sizes s USING (lang)
        )
        SELECT doc_id, lang, CAST(n AS BIGINT) AS stratum_size,
               CAST(cap AS BIGINT) AS stratum_cap,
               CAST(rk AS BIGINT) AS sample_rank
        FROM ranked WHERE rk <= cap ORDER BY doc_id
    """,
    "dp8_global_shuffle": f"""
        WITH r AS (
            SELECT doc_id,
                   md5('{SHUF_SEED}:' || CAST(doc_id AS VARCHAR))
                       AS shuffle_key,
                   row_number() OVER (
                       ORDER BY md5('{SHUF_SEED}:' || CAST(doc_id AS VARCHAR)),
                                doc_id) - 1 AS rank
            FROM documents
        )
        SELECT doc_id, shuffle_key, CAST(rank AS BIGINT) AS rank,
               CAST(rank % {SHUF_SHARDS} AS BIGINT) AS shard,
               CAST(rank // {SHUF_SHARDS} AS BIGINT) AS shard_pos
        FROM r ORDER BY doc_id
    """,
    "dp4_stratified_sample": f"""
        WITH b AS (
            SELECT doc_id, lang,
                   ({_hex4_to_int("CAST(doc_id AS VARCHAR) || ':' || lang")})
                       % 10000 AS sample_bucket
            FROM documents
        )
        SELECT doc_id, lang, sample_bucket
        FROM b
        WHERE sample_bucket < CASE {_DP4_THRESH} ELSE 10000 END
        ORDER BY doc_id
    """,
    "dp5_sequence_pack": f"""
        WITH tok AS (
            SELECT doc_id, CAST(len({_WORDS}) AS BIGINT) AS n_tokens
            FROM documents
        ), cum AS (
            SELECT doc_id, n_tokens,
                   CAST(sum(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tokens AS BIGINT) AS start
            FROM tok
        )
        SELECT doc_id, n_tokens,
               CAST(start // {PACK_BUDGET} AS BIGINT) AS pack_id,
               CAST(start % {PACK_BUDGET} AS BIGINT) AS pack_offset
        FROM cum ORDER BY doc_id
    """,
    "dp3_hash_split": """
        WITH h AS (
            SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx
            FROM documents
        ), b AS (
            SELECT doc_id, (((strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) * 256 + (strpos('0123456789abcdef', substring(hx, 3, 1)) - 1) * 16 + (strpos('0123456789abcdef', substring(hx, 4, 1)) - 1)) % 100) AS bucket FROM h
        )
        SELECT doc_id, bucket,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'valid'
                    ELSE 'test' END AS split
        FROM b ORDER BY doc_id
    """,
    "dp1_clean_corpus": f"""
        WITH scored AS (
            SELECT doc_id, text, {_WORDS} AS toks FROM documents
        ), q AS (
            SELECT doc_id, text,
                   len(toks) AS n_tokens,
                   CAST(len(list_filter(toks,
                       w -> list_contains({_STOPLIST}, w))) AS DOUBLE)
                       / len(toks) AS stop_ratio,
                   CAST(len(list_distinct(toks)) AS DOUBLE)
                       / len(toks) AS uniq_ratio
            FROM scored
        ), kept0 AS (
            SELECT doc_id, text FROM q
            WHERE n_tokens >= {MIN_TOKENS}
              AND stop_ratio * 0.5 + uniq_ratio * 0.5 >= {MIN_QUALITY}
              AND stop_ratio >= {EN_THRESHOLD}
        ), keepers AS (
            SELECT min(doc_id) AS doc_id
            FROM kept0 GROUP BY md5({_NORM})
        ), survivors AS (
            SELECT k.doc_id, k.text
            FROM kept0 k JOIN keepers USING (doc_id)
        ), cand AS ({_BANDS_OVER_SURVIVORS}),
        drops AS (SELECT DISTINCT id2 AS doc_id FROM cand)
        SELECT s.doc_id FROM survivors s
        LEFT JOIN drops d ON s.doc_id = d.doc_id
        WHERE d.doc_id IS NULL
        ORDER BY s.doc_id
    """,
    "dp2_clean_corpus_clustered": f"""
        WITH RECURSIVE scored AS (
            SELECT doc_id, text, {_WORDS} AS toks FROM documents
        ), q AS (
            SELECT doc_id, text,
                   len(toks) AS n_tokens,
                   CAST(len(list_filter(toks,
                       w -> list_contains({_STOPLIST}, w))) AS DOUBLE)
                       / len(toks) AS stop_ratio,
                   CAST(len(list_distinct(toks)) AS DOUBLE)
                       / len(toks) AS uniq_ratio
            FROM scored
        ), kept0 AS (
            SELECT doc_id, text FROM q
            WHERE n_tokens >= {MIN_TOKENS}
              AND stop_ratio * 0.5 + uniq_ratio * 0.5 >= {MIN_QUALITY}
              AND stop_ratio >= {EN_THRESHOLD}
        ), keepers AS (
            SELECT min(doc_id) AS doc_id
            FROM kept0 GROUP BY md5({_NORM})
        ), survivors AS (
            SELECT k.doc_id, k.text
            FROM kept0 k JOIN keepers USING (doc_id)
        ), cand AS ({_BANDS_OVER_SURVIVORS}),
        sym AS (
            SELECT id1 AS a, id2 AS b FROM cand
            UNION
            SELECT id2 AS a, id1 AS b FROM cand
        ), reach AS (
            SELECT a AS node, a AS r FROM sym
            UNION
            SELECT s.b AS node, reach.r
            FROM sym s JOIN reach ON s.a = reach.node
        ), comp AS (
            SELECT node, min(r) AS component FROM reach GROUP BY node
        )
        SELECT s.doc_id FROM survivors s
        LEFT JOIN comp c ON s.doc_id = c.node
        WHERE c.component IS NULL OR c.component = s.doc_id
        ORDER BY s.doc_id
    """,
}


def dp9_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-composition report: per (source, lang) stratum, document
    count, whitespace-token sum, and the stratum's share of all corpus
    tokens — the domain-mixing table that drives sampling-weight
    decisions in a pretraining pipeline (cf. dp4/dp7, which consume
    such weights).

    Scale shape: one combinable groupBy keyed (source, lang) — output
    is strata rows, not corpus rows — plus a 1-row global total
    broadcast back. token_share is a single IEEE division of two exact
    bigints (no rounding call), bit-identical across engines."""
    from ..operators.text import tokens

    docs = t(spark, sf_dir, "documents")
    per = docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens(F.col("text"))).cast("long")).alias("n_tokens"),
    )
    tot = per.agg(F.sum("n_tokens").alias("_tot"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source", "lang", "n_docs", "n_tokens",
            (F.col("n_tokens").cast("double") / F.col("_tot").cast("double"))
            .alias("token_share"),
        )
        .orderBy("source", "lang")
    )


QUERIES["dp9_source_mix"] = dp9_source_mix

ORACLES["dp9_source_mix"] = f"""
    WITH per AS (
        SELECT source, lang, count(*) AS n_docs,
               CAST(sum(len({_WORDS})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source, lang
    ), tot AS (
        SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM per
    )
    SELECT source, lang, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE) AS token_share
    FROM per CROSS JOIN tot
    ORDER BY source, lang
"""


def dp10_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (512 chars, 64 overlap) over the
    corpus (pipelines.chunk_documents) — map-side only."""
    from ..pipelines import chunk_documents

    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return chunk_documents(docs, max_chars=512, overlap=64) \
        .orderBy("doc_id", "chunk_idx")


QUERIES["dp10_chunk_documents"] = dp10_chunk_documents

ORACLES["dp10_chunk_documents"] = f"""
    WITH base AS (
        SELECT doc_id, {_NORM} AS norm FROM documents
        WHERE length({_NORM}) > 0
    ), idx AS (
        SELECT doc_id, norm,
               unnest(range(0, CAST((length(norm) - 1) // 448 AS INT) + 1))
                   AS i
        FROM base
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           CAST(i * 448 AS BIGINT) AS chunk_start,
           CAST(least(512, length(norm) - i * 448) AS BIGINT) AS chunk_len,
           md5(substr(norm, CAST(i * 448 + 1 AS INT), 512)) AS chunk_hash
    FROM idx
    ORDER BY doc_id, chunk_idx
"""


def dp11_curriculum_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data ordering: rank the corpus globally by the tx2
    quality score (desc, doc_id tiebreak) and deal ranks round-robin
    into 4 training epochs, so every epoch sees the full quality range
    in rank order. The global rank uses the two-phase range-sharded
    global_row_number (operators/scalable.py) — no single-partition
    window over the corpus; the quality doubles are computed from the
    same integer counts in the same op order both engines, so the sort
    key is bit-identical (tx2 precedent)."""
    from ..operators.scalable import global_row_number
    from ..operators.text import quality_score

    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    q = quality_score(docs).select("doc_id", "quality")
    ranked = global_row_number(
        q, [F.desc("quality"), F.asc("doc_id")], rn_col="grank")
    return (
        ranked.select(
            "doc_id", "quality", "grank",
            ((F.col("grank") - 1) % 4).cast("int").alias("epoch"))
        .orderBy("grank")
    )


QUERIES["dp11_curriculum_epochs"] = dp11_curriculum_epochs

_QUALITY_CTE = f"""
    SELECT doc_id,
           CAST(len(list_filter(toks, w -> w IN ({_DP_STOPLIST}))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) * 0.5
           + CAST(len(list_distinct(toks)) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) * 0.5 AS quality
    FROM (SELECT doc_id, {_WORDS} AS toks FROM documents)
"""

ORACLES["dp11_curriculum_epochs"] = f"""
    WITH q AS ({_QUALITY_CTE}),
    ranked AS (
        SELECT doc_id, quality,
               row_number() OVER (ORDER BY quality DESC, doc_id) AS grank
        FROM q
    )
    SELECT doc_id, quality, CAST(grank AS BIGINT) AS grank,
           CAST((grank - 1) % 4 AS INTEGER) AS epoch
    FROM ranked ORDER BY grank
"""


def dp12_fuzzy_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (MinHash-band) train-vs-eval decontamination with exact
    Jaccard verification — eval split = even-numbered sources
    (pipelines.fuzzy_decontaminate; dp6 is the exact-overlap rule)."""
    from ..pipelines import fuzzy_decontaminate

    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return fuzzy_decontaminate(
        docs, F.expr("CAST(substring(source, 4) AS INT) % 2 = 0"),
    ).orderBy("train_id", "eval_id")


QUERIES["dp12_fuzzy_decontaminate"] = dp12_fuzzy_decontaminate


def _dp12_oracle() -> str:
    from .dedup import _minhash_band_sql

    inner = _minhash_band_sql(3, 16, 4).replace("ORDER BY id1, id2", "")
    return f"""
    WITH cand0 AS ({inner}),
    src AS (
        SELECT doc_id AS id,
               CAST(substring(source, 4) AS INTEGER) % 2 = 0 AS is_eval
        FROM documents
    ), cand AS (
        SELECT CASE WHEN s1.is_eval THEN c.id2 ELSE c.id1 END AS train_id,
               CASE WHEN s1.is_eval THEN c.id1 ELSE c.id2 END AS eval_id
        FROM cand0 c
        JOIN src s1 ON c.id1 = s1.id
        JOIN src s2 ON c.id2 = s2.id
        WHERE s1.is_eval <> s2.is_eval
    ), sh AS ({_duck_shingles(3)}),
    sz AS (
        SELECT id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY id
    ), com AS (
        SELECT cand.train_id, cand.eval_id, CAST(count(*) AS BIGINT) AS common
        FROM cand
        JOIN sh a ON a.id = cand.train_id
        JOIN sh b ON b.id = cand.eval_id AND a.shingle = b.shingle
        GROUP BY cand.train_id, cand.eval_id
    )
    SELECT c.train_id, c.eval_id,
           coalesce(m.common, 0) AS common,
           sa.sz + sb.sz - coalesce(m.common, 0) AS union_sz,
           CAST(CASE WHEN 2 * coalesce(m.common, 0)
                          >= sa.sz + sb.sz - coalesce(m.common, 0)
                     THEN 1 ELSE 0 END AS INTEGER) AS contaminated
    FROM cand c
    LEFT JOIN com m ON c.train_id = m.train_id AND c.eval_id = m.eval_id
    JOIN sz sa ON c.train_id = sa.id
    JOIN sz sb ON c.eval_id = sb.id
    ORDER BY c.train_id, c.eval_id
    """


ORACLES["dp12_fuzzy_decontaminate"] = _dp12_oracle()


def dp14_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed dynamic batching (pipelines.length_bucket_batches):
    power-of-2 token-length buckets (exact bit-length log2), md5-dealt
    fixed-size batches per bucket — padding waste bounded by 2x. One
    composite two-phase global rank; per-bucket rebase via a broadcast
    O(buckets) min-rank table, so the handful of giant buckets never
    becomes a single-partition window."""
    from ..pipelines import length_bucket_batches

    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return length_bucket_batches(docs, batch_size=8).orderBy("doc_id")


QUERIES["dp14_length_buckets"] = dp14_length_buckets

ORACLES["dp14_length_buckets"] = f"""
    WITH tokc AS (
        SELECT doc_id,
               CAST(len({_WORDS}) AS BIGINT) AS n_tokens
        FROM documents
    ), b AS (
        SELECT doc_id, n_tokens,
               CAST(length(bin(n_tokens)) - 1 AS BIGINT) AS bucket,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM tokc
    ), r AS (
        SELECT doc_id, n_tokens, bucket,
               row_number() OVER (PARTITION BY bucket
                                  ORDER BY h, doc_id) - 1 AS rib
        FROM b
    )
    SELECT doc_id, n_tokens, bucket,
           CAST(rib // 8 AS BIGINT) AS batch_id,
           CAST(rib % 8 AS BIGINT) AS pos_in_batch
    FROM r ORDER BY doc_id
"""


# --- dp5 driver-red localization diagnostics (round 4, VERDICT.md #1) ---
MIX_NUM, MIX_DEN = 2, 5  # global budget = 40% of corpus tokens


def dp13_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture sampling (pipelines.token_budget_mix):
    40% of corpus tokens allocated across sources proportional to
    sqrt(source token mass), each source keeping its md5-priority
    document prefix within the allocation. Doc-level output so the
    hash check pins the exact kept set, not just totals."""
    from ..operators.text import tokens
    from ..pipelines import token_budget_mix

    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return (
        token_budget_mix(
            docs, "source",
            token_count=F.size(tokens(F.col("text"))),
            budget_num=MIX_NUM, budget_den=MIX_DEN,
        )
        .orderBy("source", "doc_id")
    )


QUERIES["dp13_token_budget_mix"] = dp13_token_budget_mix

ORACLES["dp13_token_budget_mix"] = f"""
    WITH base AS (
        SELECT doc_id, source, CAST(len({_WORDS}) AS BIGINT) AS nt
        FROM documents
    ), mass AS (
        SELECT source, CAST(sum(nt) AS BIGINT) AS mass
        FROM base GROUP BY source
    ), wts AS (
        SELECT source, mass,
               CAST(floor(sqrt(CAST(mass AS DOUBLE))) AS BIGINT) AS w
        FROM mass
    ), tot AS (
        SELECT CAST(sum(mass) AS BIGINT) AS tm, CAST(sum(w) AS BIGINT) AS tw
        FROM wts
    ), alloc AS (
        SELECT source, w,
               ((tm * {MIX_NUM}) // {MIX_DEN} // tw) * w
               + (((tm * {MIX_NUM}) // {MIX_DEN} % tw) * w) // tw AS budget
        FROM wts, tot
    ), cum AS (
        SELECT b.doc_id, b.source, b.nt,
               CAST(sum(b.nt) OVER (
                   PARTITION BY b.source
                   ORDER BY md5(CAST(b.doc_id AS VARCHAR) || ':' || b.source),
                            b.doc_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               a.budget
        FROM base b JOIN alloc a ON b.source = a.source
    )
    SELECT doc_id, source, nt AS n_tokens, cum AS cum_tokens,
           budget AS tok_budget
    FROM cum WHERE cum <= budget
    ORDER BY source, doc_id
"""


def dp15_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset card: the corpus-level fact sheet a pipeline
    publishes next to a training mix (docs, token mass, language and
    source breadth, exact-dup mass, token-length envelope). A single
    combinable global aggregate over per-doc map-side columns — one
    shuffle of 32 partial rows, any corpus size; the mean is HALF_UP
    milli-tokens in pure integer arithmetic (w12 pattern)."""
    from ..operators.dedup import normalize_text
    from ..operators.text import tokens

    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    per = docs.select(
        F.size(tokens(F.col("text"))).cast("long").alias("nt"),
        "lang", "source",
        F.md5(normalize_text(F.col("text"))).alias("digest"),
    )
    agg = per.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("n_tokens"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
        F.count_distinct("source").cast("long").alias("n_sources"),
        (F.count("*") - F.count_distinct("digest")).cast("long")
        .alias("n_dup_docs"),
        F.min("nt").cast("long").alias("min_tokens"),
        F.max("nt").cast("long").alias("max_tokens"),
    )
    return agg.select(
        "*",
        F.expr("(2000 * n_tokens + n_docs) DIV (2 * n_docs)").cast("long")
        .alias("mean_tokens_milli"),
    )


QUERIES["dp15_dataset_card"] = dp15_dataset_card

ORACLES["dp15_dataset_card"] = f"""
    WITH per AS (
        SELECT CAST(len({_WORDS}) AS BIGINT) AS nt, lang, source,
               md5({_NORM}) AS digest
        FROM documents
    ), a AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(nt) AS BIGINT) AS n_tokens,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(count(*) - count(DISTINCT digest) AS BIGINT)
                   AS n_dup_docs,
               CAST(min(nt) AS BIGINT) AS min_tokens,
               CAST(max(nt) AS BIGINT) AS max_tokens
        FROM per
    )
    SELECT *, CAST((2000 * n_tokens + n_docs) // (2 * n_docs) AS BIGINT)
               AS mean_tokens_milli
    FROM a
"""


SHARD_TARGET_CHARS = 8192


def dp16_shard_writer_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-layout planning for a partitioned corpus write: within
    each lang partition, documents (in md5-deterministic order) are
    assigned to target-size output files by running char offset —
    file_idx = start div target, the decision a DataFrameWriter makes
    implicitly and a 100 TB pipeline wants pinned and auditable
    (file sizes drive downstream scan parallelism). Scale shape: ONE
    composite (lang, md5, key) two-phase global cumsum
    (operators/scalable.py), rebased per lang with a broadcast
    O(langs) min-offset table — the dp14 rebase trick applied to a
    measure instead of a rank, so a handful of giant lang partitions
    never see a single-partition window."""
    from ..operators.scalable import global_cumsum

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("nc"),
        F.md5(F.col("doc_id").cast("string")).alias("_h"),
    )
    cum = global_cumsum(
        docs, [F.asc("lang"), F.asc("_h"), F.asc("doc_id")],
        F.col("nc"), out_col="_cum")
    start = cum.withColumn("_start", F.col("_cum") - F.col("nc"))
    base = start.groupBy("lang").agg(F.min("_start").alias("_b0"))
    return (
        start.join(F.broadcast(base), "lang")
        .select(
            "doc_id", "lang", "nc",
            F.expr(f"(_start - _b0) div {SHARD_TARGET_CHARS}")
            .cast("long").alias("file_idx"),
            F.pmod(F.col("_start") - F.col("_b0"),
                   F.lit(SHARD_TARGET_CHARS)).cast("long")
            .alias("file_offset"),
        )
        .orderBy("doc_id")
    )


QUERIES["dp16_shard_writer_plan"] = dp16_shard_writer_plan

ORACLES["dp16_shard_writer_plan"] = f"""
    WITH d AS (
        SELECT doc_id, lang, n_chars AS nc,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ), cum AS (
        SELECT doc_id, lang, nc,
               sum(nc) OVER (PARTITION BY lang ORDER BY h, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - nc AS start
        FROM d
    )
    SELECT doc_id, lang, CAST(nc AS BIGINT) AS nc,
           CAST(start // {SHARD_TARGET_CHARS} AS BIGINT) AS file_idx,
           CAST(start % {SHARD_TARGET_CHARS} AS BIGINT) AS file_offset
    FROM cum ORDER BY doc_id
"""


def dp17_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaning-pipeline observability: the per-stage survival funnel
    (raw -> token floor -> quality floor -> language -> exact dedup ->
    near-dup removal) as one report — the numbers a corpus curator
    watches to catch a filter suddenly eating the corpus. Each stage
    count is a single-row aggregate over the staged filters (the same
    expressions dp1/clean_corpus run); no driver-side .count() loops,
    just a union of six one-row aggregates the scheduler runs in
    parallel."""
    from ..operators import dedup as D
    from ..operators.text import lang_id, quality_score
    from ..pipelines import clean_corpus

    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    q = quality_score(docs).select("doc_id", "n_tokens", "quality")
    l = lang_id(docs).select("doc_id", "predicted_lang")
    flagged = docs.join(q, "doc_id").join(l, "doc_id")
    s2 = flagged.filter(F.col("n_tokens") >= MIN_TOKENS)
    s3 = s2.filter(F.col("quality") >= MIN_QUALITY)
    s4 = s3.filter(F.col("predicted_lang") == "en")
    digests = s4.select(
        "doc_id", F.md5(D.normalize_text(F.col("text"))).alias("_d"))
    s5 = digests.groupBy("_d").agg(F.min("doc_id").alias("doc_id"))
    s6 = clean_corpus(docs, min_tokens=MIN_TOKENS,
                      min_quality=MIN_QUALITY, lang="en")

    def stage(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count("*").cast("long").alias("n_docs")) \
            .select(F.lit(label).alias("stage"), "n_docs")

    return (
        stage(docs, "1_raw")
        .unionByName(stage(s2, "2_token_floor"))
        .unionByName(stage(s3, "3_quality_floor"))
        .unionByName(stage(s4, "4_language"))
        .unionByName(stage(s5, "5_exact_dedup"))
        .unionByName(stage(s6, "6_near_dedup"))
        .orderBy("stage")
    )


QUERIES["dp17_pipeline_funnel"] = dp17_pipeline_funnel

ORACLES["dp17_pipeline_funnel"] = f"""
    WITH scored AS (
        SELECT doc_id, text, {_WORDS} AS toks FROM documents
    ), q AS (
        SELECT doc_id, text,
               len(toks) AS n_tokens,
               CAST(len(list_filter(toks,
                   w -> list_contains({_STOPLIST}, w))) AS DOUBLE)
                   / len(toks) AS stop_ratio,
               CAST(len(list_distinct(toks)) AS DOUBLE)
                   / len(toks) AS uniq_ratio
        FROM scored
    ), s2 AS (
        SELECT * FROM q WHERE n_tokens >= {MIN_TOKENS}
    ), s3 AS (
        SELECT * FROM s2
        WHERE stop_ratio * 0.5 + uniq_ratio * 0.5 >= {MIN_QUALITY}
    ), s4 AS (
        SELECT * FROM s3 WHERE stop_ratio >= {EN_THRESHOLD}
    ), keepers AS (
        SELECT min(doc_id) AS doc_id FROM s4 GROUP BY md5({_NORM})
    ), survivors AS (
        SELECT k.doc_id, k.text FROM s4 k JOIN keepers USING (doc_id)
    ), cand AS ({_BANDS_OVER_SURVIVORS}),
    drops AS (SELECT DISTINCT id2 AS doc_id FROM cand),
    s6 AS (
        SELECT s.doc_id FROM survivors s
        LEFT JOIN drops d ON s.doc_id = d.doc_id
        WHERE d.doc_id IS NULL
    )
    SELECT '1_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents
    UNION ALL SELECT '2_token_floor', count(*) FROM s2
    UNION ALL SELECT '3_quality_floor', count(*) FROM s3
    UNION ALL SELECT '4_language', count(*) FROM s4
    UNION ALL SELECT '5_exact_dedup', count(*) FROM keepers
    UNION ALL SELECT '6_near_dedup', count(*) FROM s6
    ORDER BY stage
"""


def dp18_exact_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform exactly-k sample, engine-portable: the md5-order top-k
    is the distributed replacement for reservoir sampling — every
    executor keeps its local top-k (TakeOrdered, O(k) memory per
    partition), the driver merges partition winners, and the result
    is a uniform k-subset that is IDENTICAL across reruns, engines
    and partitionings (a reservoir's output depends on row visit
    order). Seed change = new independent sample."""
    docs = t(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("sample-0:"),
                         F.col("doc_id").cast("string")))
    return (
        docs.select("doc_id", "lang", key.alias("sample_key"))
        .orderBy("sample_key", "doc_id")
        .limit(100)
    )


QUERIES["dp18_exact_k_sample"] = dp18_exact_k_sample

ORACLES["dp18_exact_k_sample"] = """
    SELECT doc_id, lang,
           md5('sample-0:' || CAST(doc_id AS VARCHAR)) AS sample_key
    FROM documents
    ORDER BY sample_key, doc_id LIMIT 100
"""


def dp19_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version diff audit: given the previous corpus snapshot
    (simulated: every 11th doc not yet present, every 13th doc's text
    since revised) and the current one (every 17th doc since deleted),
    report per-source added / removed / changed / unchanged counts by
    key + content digest — the release-note table a dataset versioning
    workflow publishes (Delta/LakeFS diff semantics on plain tables).
    A true FULL OUTER join on the doc key: removed rows exist only on
    the prev side, so source comes from coalesce(cur, prev) and every
    one of the four statuses is exercised and counted (ADVICE r4: the
    old LEFT-shaped version defined 'removed' but could never count
    it). Per-source rollup is combinable (map-side partial agg)."""
    from ..operators.dedup import normalize_text

    docs = t(spark, sf_dir, "documents")
    cur = docs.filter(F.col("doc_id") % 17 != 0).select(
        "doc_id", F.col("source").alias("src_cur"),
        F.md5(normalize_text(F.col("text"))).alias("dig"))
    prev = docs.filter(F.col("doc_id") % 11 != 0).select(
        "doc_id", F.col("source").alias("src_prev"),
        F.md5(normalize_text(
            F.when(F.col("doc_id") % 13 == 0,
                   F.concat(F.col("text"), F.lit(" [rev1]")))
            .otherwise(F.col("text")))).alias("dig_prev"))
    j = cur.join(prev, "doc_id", "full")
    status = (
        F.when(F.col("dig_prev").isNull(), "added")
        .when(F.col("dig").isNull(), "removed")
        .when(F.col("dig") != F.col("dig_prev"), "changed")
        .otherwise("unchanged")
    )
    return (
        j.select(
            F.coalesce("src_cur", "src_prev").alias("source"),
            status.alias("status"))
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("status") == "added", 1).otherwise(0))
            .cast("long").alias("n_added"),
            F.sum(F.when(F.col("status") == "removed", 1).otherwise(0))
            .cast("long").alias("n_removed"),
            F.sum(F.when(F.col("status") == "changed", 1).otherwise(0))
            .cast("long").alias("n_changed"),
            F.sum(F.when(F.col("status") == "unchanged", 1).otherwise(0))
            .cast("long").alias("n_unchanged"),
        )
        .orderBy("source")
    )


QUERIES["dp19_dataset_diff"] = dp19_dataset_diff

ORACLES["dp19_dataset_diff"] = f"""
    WITH cur AS (
        SELECT doc_id, source AS src_cur, md5({_NORM}) AS dig
        FROM documents WHERE doc_id % 17 <> 0
    ), prev AS (
        SELECT doc_id, source AS src_prev,
               md5(trim(regexp_replace(lower(
                   CASE WHEN doc_id % 13 = 0 THEN text || ' [rev1]'
                        ELSE text END), '\\s+', ' ', 'g')))
                   AS dig_prev
        FROM documents WHERE doc_id % 11 <> 0
    ), j AS (
        SELECT coalesce(c.src_cur, p.src_prev) AS source,
               CASE WHEN p.dig_prev IS NULL THEN 'added'
                    WHEN c.dig IS NULL THEN 'removed'
                    WHEN c.dig <> p.dig_prev THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM cur c FULL JOIN prev p ON c.doc_id = p.doc_id
    )
    SELECT source,
           CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_added,
           CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_removed,
           CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_changed,
           CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unchanged
    FROM j GROUP BY source ORDER BY source
"""


def dp20_pack_fill_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing efficiency audit over dp5's assignment: per
    512-token pack, how many documents start in it, how many tokens
    they carry, and how far the last document spills past the pack
    boundary (offset-based packing lets a document straddle packs; the
    spill is exactly what a downstream loader truncates or carries
    over). The report a training-data team reads before burning GPU
    hours on a badly packed corpus. Derived entirely from dp5's
    columns, so it inherits the two-phase scalable cumsum — the rollup
    itself is one combinable groupBy(pack_id)."""
    packed = dp5_sequence_pack(spark, sf_dir)
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.greatest(
                F.lit(0).cast("bigint"),
                F.max(F.col("pack_offset") + F.col("n_tokens"))
                - F.lit(PACK_BUDGET),
            ).cast("long").alias("spill_tokens"),
        )
        .orderBy("pack_id")
    )


QUERIES["dp20_pack_fill_report"] = dp20_pack_fill_report

ORACLES["dp20_pack_fill_report"] = f"""
    WITH tok AS (
        SELECT doc_id, CAST(len({_WORDS}) AS BIGINT) AS n_tokens
        FROM documents
    ), cum AS (
        SELECT doc_id, n_tokens,
               CAST(sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens AS BIGINT) AS start
        FROM tok
    ), packed AS (
        SELECT doc_id, n_tokens,
               CAST(start // {PACK_BUDGET} AS BIGINT) AS pack_id,
               CAST(start % {PACK_BUDGET} AS BIGINT) AS pack_offset
        FROM cum
    )
    SELECT pack_id, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(greatest(CAST(0 AS BIGINT),
                max(pack_offset + n_tokens) - {PACK_BUDGET})
                AS BIGINT) AS spill_tokens
    FROM packed GROUP BY pack_id ORDER BY pack_id
"""


CHUNK_TOK = 128


def dp21_chunked_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-then-pack — the GPT-style concat-and-shard step dp5 and
    dp10 each do half of: documents split into <=CHUNK_TOK-token
    pieces (whitespace tokens, no overlap — a tokenizer-budget split,
    not dp10's char windows), then EVERY piece packed into fixed
    PACK_BUDGET-token sequences by global (doc_id, chunk_idx) order.
    Chunking first is what makes packing sound: no piece can exceed
    the budget, so a pack never splits mid-chunk and long documents
    stop creating pathological packs. The global offset is the
    two-phase range-sharded cumsum (pipelines.pack_sequences) — no
    single-partition window at any corpus size; the chunk fan-out is
    map-side sequence+explode."""
    from ..operators.text import tokens
    from ..pipelines import pack_sequences

    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    sized = (docs.select("doc_id",
                         F.size(tokens(F.col("text"))).alias("_n"))
             .filter(F.col("_n") > 0))
    chunks = (
        sized.withColumn(
            "chunk_idx",
            F.explode(F.sequence(
                F.lit(0), F.expr(f"(_n - 1) div {CHUNK_TOK}"))))
        .select(
            "doc_id", "chunk_idx",
            F.least(F.lit(CHUNK_TOK),
                    F.col("_n") - F.col("chunk_idx") * CHUNK_TOK)
            .alias("_ct"))
    )
    return pack_sequences(
        chunks, PACK_BUDGET,
        token_count=F.col("_ct"),
        order_by=[F.col("doc_id"), F.col("chunk_idx")],
        id_cols=["doc_id", "chunk_idx"],
    ).orderBy("doc_id", "chunk_idx")


QUERIES["dp21_chunked_pack"] = dp21_chunked_pack

ORACLES["dp21_chunked_pack"] = f"""
    WITH tok AS (
        SELECT doc_id, CAST(len({_WORDS}) AS BIGINT) AS n
        FROM documents
    ), chunks AS (
        SELECT doc_id,
               unnest(range(0, CAST((n - 1) // {CHUNK_TOK} AS INT) + 1))
                   AS chunk_idx,
               n
        FROM tok WHERE n > 0
    ), sized AS (
        SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
               CAST(least({CHUNK_TOK}, n - chunk_idx * {CHUNK_TOK})
                    AS BIGINT) AS ct
        FROM chunks
    ), cum AS (
        SELECT doc_id, chunk_idx, ct,
               CAST(sum(ct) OVER (ORDER BY doc_id, chunk_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - ct AS BIGINT) AS start
        FROM sized
    )
    SELECT doc_id, chunk_idx, ct AS n_tokens,
           CAST(start // {PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST(start % {PACK_BUDGET} AS BIGINT) AS pack_offset
    FROM cum ORDER BY doc_id, chunk_idx
"""


def dp22_importance_weights(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """DSIR-style importance selection (pipelines.dsir_importance):
    weight every document's unigram profile by the add-one-smoothed
    target/raw count ratio — target = the English subset, the
    classic "look like the in-domain seed" setup — and report the
    top-20 documents by length-debiased per-token score. Integer milli
    weights end to end, so the oracle replays the whole chain
    (tokenize, count, smooth, weight-sum, rank) exactly. The sanity
    property the rows exhibit: the selected set skews hard toward the
    target language without ever reading the lang column during
    scoring."""
    from ..pipelines import dsir_importance

    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    scored = dsir_importance(docs, F.col("lang") == "en")
    return (scored.join(docs.select("doc_id", "lang", "source"),
                        "doc_id")
            .select("doc_id", "lang", "source", "n_tokens",
                    "score_milli", "per_token_milli")
            .orderBy(F.col("per_token_milli").desc(), "doc_id")
            .limit(20))


QUERIES["dp22_importance_weights"] = dp22_importance_weights

ORACLES["dp22_importance_weights"] = f"""
    WITH toks AS MATERIALIZED (
        SELECT doc_id, tok
        FROM (SELECT doc_id, unnest({_WORDS}) AS tok FROM documents)
        WHERE tok <> ''
    ), per_doc AS MATERIALIZED (
        SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2
    ), raw_cnt AS (
        SELECT tok, sum(c) AS cnt_r FROM per_doc GROUP BY 1
    ), tgt_cnt AS (
        SELECT p.tok, sum(p.c) AS cnt_t
        FROM per_doc p JOIN documents d USING (doc_id)
        WHERE d.lang = 'en' GROUP BY 1
    ), w AS (
        SELECT r.tok,
               CAST((1000 * (COALESCE(tc.cnt_t, 0) + 1))
                    // (r.cnt_r + 1) AS BIGINT) AS wm
        FROM raw_cnt r LEFT JOIN tgt_cnt tc ON r.tok = tc.tok
    ), score AS (
        SELECT p.doc_id,
               CAST(sum(p.c) AS BIGINT) AS n_tokens,
               CAST(sum(p.c * w.wm) AS BIGINT) AS score_milli
        FROM per_doc p JOIN w USING (tok) GROUP BY 1
    )
    SELECT s.doc_id, d.lang, d.source, s.n_tokens, s.score_milli,
           CAST(s.score_milli // s.n_tokens AS BIGINT)
               AS per_token_milli
    FROM score s JOIN documents d USING (doc_id)
    ORDER BY per_token_milli DESC, s.doc_id
    LIMIT 20
"""
