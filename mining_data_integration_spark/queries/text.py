"""Oracle-checked text-analysis queries over the documents table
(SURVEY.md §7.4): token stats, quality scoring, language-ID heuristic,
fingerprint sharding. Implementations in operators/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as TX
from ._util import spread, t

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS = f"string_split({_NORM}, ' ')"
_STOPLIST = ", ".join(f"'{w}'" for w in TX.EN_STOPWORDS)


def tx1_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return TX.token_stats(docs).orderBy("doc_id")


def tx2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return TX.quality_score(docs).orderBy("doc_id")


def tx3_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID + per-language confusion counts against
    the labeled lang column."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    pred = TX.lang_id(docs).join(docs.select("doc_id", "lang"), "doc_id")
    return (
        pred.groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "predicted_lang")
    )


def tx4_fingerprint_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint + shard distribution (the dedup partitioning key)."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return (
        TX.fingerprint(docs)
        .groupBy("shard")
        .agg(F.count("*").alias("n_docs"), F.min("fingerprint").alias("min_fp"))
        .orderBy("shard")
    )


def tx5_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish subword counting (letter runs / digit runs / single
    punctuation) vs the whitespace count."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return TX.regex_token_count(docs).orderBy("doc_id")


def tx6_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rabin-Karp polynomial rolling hash per document + shard
    distribution over hash mod 16."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return (
        TX.rolling_hash(docs)
        .select("doc_id", "roll_hash",
                (F.col("roll_hash") % 16).alias("shard"))
        .orderBy("doc_id")
    )


def tx7_tf_rarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most characteristic terms per document by TF x inverse
    document-frequency ratio (operators/text.tf_rarity_topk). Linear
    IDF keeps score arithmetic bit-identical across engines."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return (
        TX.tf_rarity_topk(docs, k=3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "rk")
    )


def tx8_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter metrics: top-2-gram fraction,
    duplicate-2-gram fraction, keep flag (operators/text.py
    repetition_metrics)."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return (
        TX.repetition_metrics(docs)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


def tx9_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction audit: deterministic synthetic emails/phones are
    injected (the fixture corpus has none), then operators/text.py
    pii_scrub counts and redacts them; the scrubbed text surfaces as a
    hash so the oracle verifies the full redacted string."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    injected = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.lit(" contact user"),
                         F.col("doc_id").cast("string"),
                         F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" call 555-0142 now"))
            .otherwise(F.lit("")),
        ),
    )
    return (
        TX.pii_scrub(injected)
        .select("doc_id", "n_emails", "n_phones",
                F.md5(F.col("scrubbed")).alias("scrub_hash"))
        .orderBy("doc_id")
    )


def tx10_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate n-gram removal: 3-grams in >= 5 docs are
    boilerplate; covered token positions drop, docs reassemble."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return TX.boilerplate_scrub(docs, n=3, min_df=5).orderBy("doc_id")


QUERIES = {
    "tx10_boilerplate": tx10_boilerplate,
    "tx1_token_stats": tx1_token_stats,
    "tx9_pii_scrub": tx9_pii_scrub,
    "tx2_quality_score": tx2_quality_score,
    "tx3_lang_id": tx3_lang_id,
    "tx4_fingerprint_shards": tx4_fingerprint_shards,
    "tx5_regex_tokens": tx5_regex_tokens,
    "tx6_rolling_hash": tx6_rolling_hash,
    "tx7_tf_rarity_topk": tx7_tf_rarity_topk,
    "tx8_repetition": tx8_repetition,
}

_EMAIL_RE = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
_PHONE_RE = "[0-9]{3}-[0-9]{4}"
_INJECTED = """
    SELECT doc_id, text ||
        CASE WHEN doc_id % 5 = 0
             THEN ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com' ELSE '' END ||
        CASE WHEN doc_id % 7 = 0
             THEN ' call 555-0142 now' ELSE '' END AS text2
    FROM documents
"""

ORACLES = {
    "tx10_boilerplate": f"""
        WITH w AS (
            SELECT doc_id, {_TOKS} AS words FROM documents
        ), g AS (
            SELECT doc_id, u['gpos'] AS gpos, u['gram'] AS gram
            FROM (SELECT doc_id, unnest(list_transform(
                      range(1, greatest(len(words) - 2, 0) + 1),
                      i -> {{'gpos': i - 1,
                            'gram': words[i] || ' ' || words[i+1]
                                    || ' ' || words[i+2]}})) AS u
                  FROM w)
        ), boiler AS (
            SELECT gram FROM g GROUP BY gram
            HAVING count(DISTINCT doc_id) >= 5
        ), covered AS (
            SELECT DISTINCT doc_id, gpos + k AS pos
            FROM g JOIN boiler USING (gram),
                 (SELECT unnest([0, 1, 2]) AS k)
        ), toks AS (
            SELECT doc_id, u['pos'] AS pos, u['word'] AS word
            FROM (SELECT doc_id, unnest(list_transform(
                      range(1, len(words) + 1),
                      i -> {{'pos': i - 1, 'word': words[i]}})) AS u
                  FROM w)
        ), kept AS (
            SELECT t.doc_id, t.pos, t.word
            FROM toks t ANTI JOIN covered c
              ON t.doc_id = c.doc_id AND t.pos = c.pos
        ), cleaned AS (
            SELECT doc_id, count(*) AS n_kept,
                   string_agg(word, ' ' ORDER BY pos) AS cleaned
            FROM kept GROUP BY doc_id
        )
        SELECT w.doc_id,
               CAST(len(w.words) AS BIGINT) AS n_tokens,
               CAST(coalesce(c.n_kept, 0) AS BIGINT) AS n_kept,
               md5(coalesce(c.cleaned, '')) AS cleaned_hash
        FROM w LEFT JOIN cleaned c ON w.doc_id = c.doc_id
        ORDER BY w.doc_id
    """,
    "tx9_pii_scrub": f"""
        WITH pii AS ({_INJECTED})
        SELECT doc_id,
               CAST(len(regexp_extract_all(text2, '{_EMAIL_RE}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(text2, '{_PHONE_RE}')) AS BIGINT)
                   AS n_phones,
               md5(regexp_replace(
                   regexp_replace(text2, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_PHONE_RE}', '<PHONE>', 'g')) AS scrub_hash
        FROM pii ORDER BY doc_id
    """,
    "tx8_repetition": f"""
        WITH g AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(words) - 1, 0) + 1),
                       i -> words[i] || ' ' || words[i+1])) AS gram
            FROM (SELECT doc_id, {_TOKS} AS words FROM documents)
        ), c AS (
            SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram
        ), a AS (
            SELECT doc_id,
                   CAST(sum(cnt) AS BIGINT) AS n_grams,
                   CAST(max(cnt) AS BIGINT) AS top_cnt,
                   CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
                       AS dup_cnt
            FROM c GROUP BY doc_id
        )
        SELECT doc_id, n_grams,
               CAST(top_cnt AS DOUBLE) / CAST(n_grams AS DOUBLE)
                   AS top_gram_frac,
               CAST(dup_cnt AS DOUBLE) / CAST(n_grams AS DOUBLE)
                   AS dup_gram_frac,
               (CAST(top_cnt AS DOUBLE) / CAST(n_grams AS DOUBLE) <= 0.20
                AND CAST(dup_cnt AS DOUBLE) / CAST(n_grams AS DOUBLE) <= 0.60)
                   AS keep
        FROM a ORDER BY doc_id
    """,
    "tx7_tf_rarity_topk": f"""
        WITH terms AS (
            SELECT doc_id AS id, unnest({_TOKS}) AS term FROM documents
        ), tf AS (
            SELECT id, term, count(*) AS tf FROM terms GROUP BY id, term
        ), dfreq AS (
            SELECT term, count(*) AS df FROM tf GROUP BY term
        ), n AS (
            SELECT count(DISTINCT doc_id) AS n_docs FROM documents
        ), scored AS (
            SELECT tf.id, tf.term, tf.tf, dfreq.df,
                   CAST(tf.tf * (n.n_docs + 1) AS DOUBLE) / (dfreq.df + 1)
                       AS score
            FROM tf JOIN dfreq USING (term) CROSS JOIN n
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY id
                          ORDER BY score DESC, term) AS rk
            FROM scored
        )
        SELECT id AS doc_id, term, tf, df, score, rk
        FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk
    """,
    "tx1_token_stats": f"""
        WITH base AS (
            SELECT doc_id, {_NORM} AS norm, {_TOKS} AS toks FROM documents
        )
        SELECT doc_id,
               len(toks) AS n_tokens,
               length(norm) AS n_chars_norm,
               length(norm) - (len(toks) - 1) AS n_word_chars,
               CAST(length(norm) - (len(toks) - 1) AS DOUBLE)
                   / CAST(len(toks) AS DOUBLE) AS avg_token_len
        FROM base ORDER BY doc_id
    """,
    "tx2_quality_score": f"""
        WITH base AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ), ratios AS (
            SELECT doc_id,
                   len(toks) AS n_tokens,
                   CAST(len(list_filter(toks, w -> w IN ({_STOPLIST}))) AS DOUBLE)
                       / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
                   CAST(len(list_distinct(toks)) AS DOUBLE)
                       / CAST(len(toks) AS DOUBLE) AS unique_ratio
            FROM base
        )
        SELECT doc_id, n_tokens, stopword_ratio, unique_ratio,
               stopword_ratio * 0.5 + unique_ratio * 0.5 AS quality
        FROM ratios ORDER BY doc_id
    """,
    "tx3_lang_id": f"""
        WITH base AS (
            SELECT doc_id, lang, {_TOKS} AS toks FROM documents
        ), pred AS (
            SELECT doc_id, lang,
                   CASE WHEN CAST(len(list_filter(toks, w -> w IN ({_STOPLIST}))) AS DOUBLE)
                             / CAST(len(toks) AS DOUBLE) >= 0.08
                        THEN 'en' ELSE 'other' END AS predicted_lang
            FROM base
        )
        SELECT lang, predicted_lang, count(*) AS n
        FROM pred GROUP BY lang, predicted_lang
        ORDER BY lang, predicted_lang
    """,
    "tx5_regex_tokens": f"""
        WITH base AS (
            SELECT doc_id, {_NORM} AS norm FROM documents
        ), pieces AS (
            SELECT doc_id,
                   regexp_extract_all(norm, '[a-z]+|[0-9]+|[^a-z0-9 ]') AS ps,
                   string_split(norm, ' ') AS toks
            FROM base
        )
        SELECT doc_id, len(ps) AS n_pieces,
               len(list_distinct(ps)) AS n_unique_pieces,
               len(toks) AS n_whitespace
        FROM pieces ORDER BY doc_id
    """,
    "tx6_rolling_hash": f"""
        WITH chars AS (
            SELECT doc_id, string_split({_NORM}, '') AS cs FROM documents
        ), hashed AS (
            SELECT doc_id,
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(cs, c -> CAST(ord(c) AS BIGINT))),
                       (acc, c) -> (acc * {TX.ROLL_BASE} + c) % {TX.ROLL_MOD}
                   ) AS roll_hash
            FROM chars
        )
        SELECT doc_id, roll_hash, roll_hash % 16 AS shard
        FROM hashed ORDER BY doc_id
    """,
    "tx4_fingerprint_shards": f"""
        WITH fp AS (
            SELECT doc_id, md5({_NORM}) AS fingerprint,
                   strpos('0123456789abcdef', substring(md5({_NORM}), 1, 1)) - 1 AS shard
            FROM documents
        )
        SELECT shard, count(*) AS n_docs, min(fingerprint) AS min_fp
        FROM fp GROUP BY shard ORDER BY shard
    """,
}


def tx11_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combined Gopher-rules quality gate with per-rule reason bitmask
    (operators/text.gopher_filter) — the keep/drop stage a pre-training
    pipeline runs after tx2/tx8 compute their raw signals."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return TX.gopher_filter(docs).orderBy("doc_id")


QUERIES["tx11_gopher_filter"] = tx11_gopher_filter

ORACLES["tx11_gopher_filter"] = f"""
    WITH base AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents
    ), stats AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(list_sum(list_transform(toks, w -> length(w)))
                    AS BIGINT) AS word_chars,
               CAST(len(list_distinct(list_filter(toks,
                    w -> w IN ({_STOPLIST})))) AS BIGINT) AS n_stop
        FROM base
    ), g AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, greatest(len(toks) - 1, 0) + 1),
                   i -> toks[i] || ' ' || toks[i+1])) AS gram
        FROM base
    ), c AS (
        SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram
    ), gs AS (
        SELECT doc_id, sum(cnt) AS n_grams, max(cnt) AS top_cnt,
               sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_cnt
        FROM c GROUP BY doc_id
    ), r AS (
        SELECT s.doc_id, n_tokens,
               (CASE WHEN n_tokens < 50 OR n_tokens > 100000
                     THEN 1 ELSE 0 END
              + CASE WHEN word_chars < 3 * n_tokens
                          OR word_chars > 10 * n_tokens
                     THEN 2 ELSE 0 END
              + CASE WHEN n_stop < 2 THEN 4 ELSE 0 END
              + CASE WHEN coalesce(5 * top_cnt > n_grams, FALSE)
                     THEN 8 ELSE 0 END
              + CASE WHEN coalesce(10 * dup_cnt > 3 * n_grams, FALSE)
                     THEN 16 ELSE 0 END) AS reasons
        FROM stats s LEFT JOIN gs ON s.doc_id = gs.doc_id
    )
    SELECT doc_id, n_tokens, CAST(reasons AS INTEGER) AS reasons,
           CAST(CASE WHEN reasons = 0 THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM r ORDER BY doc_id
"""


def tx12_heavy_hitter_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters over the token-weighted language stream via
    Misra-Gries summaries (operators/sketches.py:28): one row per token
    occurrence carrying its document's lang; keep every lang holding
    > 1/4 of all token mass. s=4 counters against 5 live keys forces
    the decrement path, and the MG superset guarantee (freq > n/(s+1)
    survives some partition summary) makes the exact refinement pass
    complete — the stream's distinct-key space never shuffles."""
    from ..operators import sketches as SK

    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    stream = docs.select(
        "lang", F.explode(TX.tokens(F.col("text"))).alias("_tok"))
    return (
        SK.heavy_hitters_exact(stream.select("lang"), "lang", 4)
        .select("lang", "cnt")
        .orderBy("lang")
    )


QUERIES["tx12_heavy_hitter_langs"] = tx12_heavy_hitter_langs

ORACLES["tx12_heavy_hitter_langs"] = f"""
    WITH toks AS (
        SELECT lang, unnest(string_split({_NORM}, ' ')) AS tok
        FROM documents
    ), tot AS (SELECT count(*) AS n FROM toks)
    SELECT lang, count(*) AS cnt
    FROM toks GROUP BY lang
    HAVING count(*) * 4 > (SELECT n FROM tot)
    ORDER BY lang
"""


def tx13_countmin_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Count-Min token frequencies
    (operators/sketches.py): md5-derived cells make the whole sketch
    and its point estimates engine-reproducible, so an approximate
    frequency operator gets a full value-hash check. Output audits
    every distinct token's estimate against its exact count
    (cm_estimate >= exact_cnt by construction). Scale: the sketch
    shuffle is capped at d*w = 256 cells regardless of corpus size;
    the probe join broadcasts the sketch."""
    from ..operators import sketches as SK

    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select(F.explode(TX.tokens(F.col("text"))).alias("term"))
    return (
        SK.countmin_estimates(toks, "term")
        .withColumnRenamed("value", "term")
        .orderBy("term")
    )


QUERIES["tx13_countmin_tokens"] = tx13_countmin_tokens


def _cm_oracle() -> str:
    from ..operators.sketches import CM_DEPTH, CM_WIDTH

    def hex4(e: str) -> str:
        ds = [
            f"(strpos('0123456789abcdef', substring(md5({e}), {p}, 1)) - 1)"
            for p in (1, 2, 3, 4)
        ]
        return (f"(({ds[0]}) * 4096 + ({ds[1]}) * 256 "
                f"+ ({ds[2]}) * 16 + ({ds[3]}))")

    tok_args = [f"'{i}:' || tok" for i in range(CM_DEPTH)]
    term_args = [f"'{i}:' || term" for i in range(CM_DEPTH)]
    cells = " UNION ALL ".join(
        f"SELECT {i} AS r, {hex4(tok_args[i])} % {CM_WIDTH} AS c FROM toks"
        for i in range(CM_DEPTH)
    )
    probes = " UNION ALL ".join(
        f"SELECT term, exact_cnt, {i} AS r, "
        f"{hex4(term_args[i])} % {CM_WIDTH} AS c FROM keys"
        for i in range(CM_DEPTH)
    )
    return f"""
    WITH toks AS (
        SELECT unnest(string_split({_NORM}, ' ')) AS tok FROM documents
    ), cells AS ({cells}
    ), sketch AS (
        SELECT r, c, count(*) AS cnt FROM cells GROUP BY r, c
    ), keys AS (
        SELECT tok AS term, count(*) AS exact_cnt FROM toks GROUP BY tok
    ), probes AS ({probes}
    )
    SELECT p.term, p.exact_cnt, CAST(min(s.cnt) AS BIGINT) AS cm_estimate
    FROM probes p JOIN sketch s ON p.r = s.r AND p.c = s.c
    GROUP BY p.term, p.exact_cnt
    ORDER BY p.term
"""


ORACLES["tx13_countmin_tokens"] = _cm_oracle()


BPE_K = 6


def tx14_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (operators/text.bpe_merges): the first 6
    learned merge rules over the corpus vocabulary — per iteration the
    most frequent adjacent symbol pair (freq DESC, pair ASC tie-break)
    fuses everywhere, left-to-right greedy. The oracle replays all 6
    iterations as generated CTEs (list_reduce fold == the Spark
    aggregate() fold, pinned by the same tie-break)."""
    from ..operators.text import bpe_merges

    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    rows = bpe_merges(docs, BPE_K)
    return spark.createDataFrame(
        rows,
        "iteration INT, left_sym STRING, right_sym STRING, pair_freq BIGINT",
    ).orderBy("iteration")


QUERIES["tx14_bpe_merges"] = tx14_bpe_merges


def _bpe_oracle(k: int) -> str:
    sep = "\x1f"
    ctes = [
        f"toks AS (SELECT unnest(string_split({_NORM}, ' ')) AS word "
        f"FROM documents)",
        "words AS (SELECT word, count(*) AS freq FROM toks GROUP BY word)",
        f"seg1 AS (SELECT word, freq, list_aggregate(string_split(word, ''),"
        f" 'string_agg', '{sep}') AS seg FROM words)",
    ]
    for i in range(1, k + 1):
        ctes.append(
            f"p{i} AS (SELECT freq, string_split(seg, '{sep}') AS syms, "
            f"unnest(generate_series(1, len(string_split(seg, '{sep}')) - 1))"
            f" AS i FROM seg{i})")
        ctes.append(
            f"pairs{i} AS (SELECT syms[i] AS l, syms[i+1] AS r, "
            f"CAST(sum(freq) AS BIGINT) AS pf FROM p{i} "
            f"GROUP BY syms[i], syms[i+1])")
        ctes.append(
            f"best{i} AS (SELECT l, r, pf FROM pairs{i} "
            f"ORDER BY pf DESC, l, r LIMIT 1)")
        if i < k:
            ctes.append(
                f"seg{i + 1} AS (SELECT word, freq, "
                f"list_reduce(string_split(seg, '{sep}'), (acc, x) -> "
                f"CASE WHEN (acc = b.l OR ends_with(acc, '{sep}' || b.l)) "
                f"AND x = b.r THEN acc || x "
                f"ELSE acc || '{sep}' || x END) AS seg "
                f"FROM seg{i}, best{i} b)")
    union = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS INTEGER) AS iteration, l AS left_sym, "
        f"r AS right_sym, pf AS pair_freq FROM best{i}"
        for i in range(1, k + 1))
    return "WITH " + ",\n    ".join(ctes) + "\n    " + union + \
        "\n    ORDER BY iteration"


ORACLES["tx14_bpe_merges"] = _bpe_oracle(BPE_K)


def tx15_surprisal_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score (operators/text.surprisal_score):
    per-doc unigram-LM surprisal with floor(log2(N/df)) computed as
    exact bit-length integers — no float log anywhere, so the milli-
    unit mean is hash-exact across engines."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return TX.surprisal_score(docs).orderBy("doc_id")


QUERIES["tx15_surprisal_score"] = tx15_surprisal_score

ORACLES["tx15_surprisal_score"] = f"""
    WITH terms AS (
        SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM terms GROUP BY doc_id, term
    ), dfq AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (
        SELECT count(DISTINCT doc_id) AS n_docs FROM documents
    ), s AS (
        SELECT doc_id, tf,
               length(bin(n_docs // df)) - 1 AS surp
        FROM tf JOIN dfq USING (term) CROSS JOIN n
    )
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_tokens,
           CAST(sum(tf * surp) AS BIGINT) AS sum_surprisal,
           CAST((2000 * sum(tf * surp) + sum(tf)) // (2 * sum(tf))
                AS BIGINT) AS mean_surprisal_milli
    FROM s GROUP BY doc_id ORDER BY doc_id
"""


def tx16_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-corruption repair audit (operators/text.mojibake_repair):
    deterministic mojibake is injected (the fixture corpus is clean
    ASCII, tx9 pattern), then the chained-replace repair counts and
    rewrites UTF-8-as-Latin-1 sequences; the repaired text surfaces as
    length + md5 so the oracle verifies the full rewrite."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    injected = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.lit(" cafÃ© rÃ©sumÃ©")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0,
                   F.lit(" donâ€™t â€œquoteâ€œ")).otherwise(F.lit("")),
        ),
    )
    return TX.mojibake_repair(injected).orderBy("doc_id")


QUERIES["tx16_mojibake_repair"] = tx16_mojibake_repair


def _tx16_oracle() -> str:
    inj = """SELECT doc_id, text ||
        CASE WHEN doc_id % 3 = 0 THEN ' cafÃ© rÃ©sumÃ©' ELSE '' END ||
        CASE WHEN doc_id % 5 = 0 THEN ' donâ€™t â€œquoteâ€œ' ELSE '' END
            AS t
        FROM documents"""
    counts = []
    fixed = "t"
    for pat, rep in TX.MOJIBAKE_FIXES:
        patq = pat.replace("'", "''")
        repq = rep.replace("'", "''")
        counts.append(
            f"(length(t) - length(replace(t, '{patq}', ''))) // {len(pat)}")
        fixed = f"replace({fixed}, '{patq}', '{repq}')"
    return (f"WITH inj AS ({inj})\n"
            f"    SELECT doc_id, CAST({' + '.join(counts)} AS BIGINT)"
            f" AS n_fixes,\n"
            f"           CAST(length({fixed}) AS BIGINT) AS fixed_len,\n"
            f"           md5({fixed}) AS fixed_hash\n"
            f"    FROM inj ORDER BY doc_id")


ORACLES["tx16_mojibake_repair"] = _tx16_oracle()


def tx17_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary statistics per source (the Heaps'-law corpus report):
    token occurrences, distinct types, hapax legomena (frequency-1
    words — the vocabulary tail that dominates tokenizer OOV), and a
    HALF_UP milli type/token ratio. One combinable (source, word)
    groupBy collapses the corpus to its vocabulary before the
    per-source rollup — the shuffle is vocab-sized, not corpus-sized."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    words = docs.select(
        "source", F.explode(TX.tokens(F.col("text"))).alias("w"))
    wc = words.groupBy("source", "w").agg(F.count("*").alias("c"))
    per = wc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long")
        .alias("n_hapax"),
    )
    return per.select(
        "source", "n_tokens", "n_types", "n_hapax",
        F.expr("(2000 * n_types + n_tokens) DIV (2 * n_tokens)")
        .cast("long").alias("type_token_milli"),
    ).orderBy("source")


QUERIES["tx17_vocab_stats"] = tx17_vocab_stats

ORACLES["tx17_vocab_stats"] = f"""
    WITH words AS (
        SELECT source, unnest({_TOKS}) AS w FROM documents
    ), wc AS (
        SELECT source, w, count(*) AS c FROM words GROUP BY source, w
    )
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax,
           CAST((2000 * count(*) + sum(c)) // (2 * sum(c)) AS BIGINT)
               AS type_token_milli
    FROM wc GROUP BY source ORDER BY source
"""


def tx18_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: top-20 bigrams by lift
    P(ab) / (P(a)P(b)) — the PMI-without-the-log association measure
    (log is monotone, so the RANKING is PMI's, and skipping it keeps
    every input to the final division an exact DECIMAL(38,0):
    lift = cnt_ab * Nu^2 / (Nb * cnt_a * cnt_b), one IEEE division).
    Scale shape: bigram and unigram counts are two combinable
    groupBys; the two corpus totals broadcast; cnt_ab >= 5 prunes the
    hapax tail before the join against unigram counts."""
    from ..operators.dedup import gram_array
    from ..operators.text import tokens

    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select(tokens(F.col("text")).alias("_t"))
    uni = toks.select(F.explode("_t").alias("w")) \
        .groupBy("w").agg(F.count("*").alias("cnt_w"))
    bi = toks.select(
        F.explode(gram_array(F.col("_t"), 2)).alias("bg")
    ).groupBy("bg").agg(F.count("*").alias("cnt_ab"))
    totals = uni.agg(
        F.sum("cnt_w").cast("decimal(38,0)").alias("nu")).crossJoin(
        bi.agg(F.sum("cnt_ab").cast("decimal(38,0)").alias("nb")))
    parts = bi.filter(F.col("cnt_ab") >= 5).select(
        F.col("bg"),
        F.split(F.col("bg"), " ").getItem(0).alias("w1"),
        F.split(F.col("bg"), " ").getItem(1).alias("w2"),
        "cnt_ab",
    )
    ua = uni.select(F.col("w").alias("w1"), F.col("cnt_w").alias("cnt_a"))
    ub = uni.select(F.col("w").alias("w2"), F.col("cnt_w").alias("cnt_b"))
    scored = (
        parts.join(ua, "w1").join(ub, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1", "w2", F.col("cnt_ab").cast("long").alias("cnt_ab"),
            ((F.col("cnt_ab").cast("decimal(38,0)")
              * F.col("nu") * F.col("nu")).cast("double")
             / (F.col("nb") * F.col("cnt_a").cast("decimal(38,0)")
                * F.col("cnt_b").cast("decimal(38,0)")).cast("double"))
            .alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), "w1", "w2").limit(20)


QUERIES["tx18_collocations"] = tx18_collocations

ORACLES["tx18_collocations"] = f"""
    WITH toks AS (
        SELECT {_TOKS} AS t FROM documents
    ), uni AS (
        SELECT w, count(*) AS cnt_w
        FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ), bi AS (
        SELECT bg, count(*) AS cnt_ab
        FROM (SELECT unnest(list_transform(
                  range(1, greatest(len(t) - 1, 0) + 1),
                  i -> t[i] || ' ' || t[i+1])) AS bg FROM toks)
        GROUP BY bg
    ), tot AS (
        SELECT (SELECT CAST(sum(cnt_w) AS DECIMAL(38,0)) FROM uni) AS nu,
               (SELECT CAST(sum(cnt_ab) AS DECIMAL(38,0)) FROM bi) AS nb
    ), scored AS (
        SELECT string_split(bg, ' ')[1] AS w1,
               string_split(bg, ' ')[2] AS w2,
               CAST(cnt_ab AS BIGINT) AS cnt_ab,
               CAST(CAST(cnt_ab AS DECIMAL(38,0)) * nu * nu AS DOUBLE)
                   / CAST(nb * CAST(a.cnt_w AS DECIMAL(38,0))
                          * CAST(b.cnt_w AS DECIMAL(38,0)) AS DOUBLE)
                   AS lift
        FROM bi
        JOIN uni a ON string_split(bg, ' ')[1] = a.w
        JOIN uni b ON string_split(bg, ' ')[2] = b.w
        CROSS JOIN tot
        WHERE cnt_ab >= 5
    )
    SELECT w1, w2, cnt_ab, lift FROM scored
    ORDER BY lift DESC, w1, w2 LIMIT 20
"""


def tx19_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION — tx14's learned merges put to work:
    the corpus is re-encoded with the trained segmentation and each
    doc reports its word/char/symbol counts (chars-per-symbol is the
    tokenizer's compression ratio, the number a tokenizer-training
    run is judged by). Scale shape: the trained vocab table carries
    the final segmentation, so encoding is one token explode + one
    UNIQUE-KEYED vocab join + a combinable doc rollup — per-doc merge
    loops never happen; the k merge argmaxes during training are the
    only driver rows (1 each). The oracle replays all k training
    iterations AND the encode join as generated CTEs."""
    from ..operators.text import BPE_SEP, bpe_learn

    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    _, words = bpe_learn(docs, BPE_K)
    enc = words.select(
        "word", F.size(F.split("seg", BPE_SEP)).alias("n_syms"))
    terms = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("word"))
    return (
        terms.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
            F.sum("n_syms").cast("long").alias("n_symbols"),
        )
        .orderBy("doc_id")
    )


QUERIES["tx19_bpe_encode"] = tx19_bpe_encode


def _bpe_encode_oracle(k: int) -> str:
    sep = "\x1f"
    ctes = [
        f"toks AS (SELECT doc_id, unnest(string_split({_NORM}, ' ')) "
        f"AS word FROM documents)",
        "words AS (SELECT word, count(*) AS freq FROM toks GROUP BY word)",
        f"seg1 AS (SELECT word, freq, list_aggregate(string_split(word, ''),"
        f" 'string_agg', '{sep}') AS seg FROM words)",
    ]
    for i in range(1, k + 1):
        ctes.append(
            f"p{i} AS (SELECT freq, string_split(seg, '{sep}') AS syms, "
            f"unnest(generate_series(1, len(string_split(seg, '{sep}')) - 1))"
            f" AS i FROM seg{i})")
        ctes.append(
            f"pairs{i} AS (SELECT syms[i] AS l, syms[i+1] AS r, "
            f"CAST(sum(freq) AS BIGINT) AS pf FROM p{i} "
            f"GROUP BY syms[i], syms[i+1])")
        ctes.append(
            f"best{i} AS (SELECT l, r, pf FROM pairs{i} "
            f"ORDER BY pf DESC, l, r LIMIT 1)")
        # unlike tx14 (which only reports the rules), the encode path
        # applies EVERY learned merge, including the k-th
        ctes.append(
            f"seg{i + 1} AS (SELECT word, freq, "
            f"list_reduce(string_split(seg, '{sep}'), (acc, x) -> "
            f"CASE WHEN (acc = b.l OR ends_with(acc, '{sep}' || b.l)) "
            f"AND x = b.r THEN acc || x "
            f"ELSE acc || '{sep}' || x END) AS seg "
            f"FROM seg{i}, best{i} b)")
    ctes.append(
        f"enc AS (SELECT word, len(string_split(seg, '{sep}')) AS n_syms "
        f"FROM seg{k + 1})")
    return ("WITH " + ",\n    ".join(ctes) + f"""
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(length(t.word)) AS BIGINT) AS n_chars,
           CAST(sum(e.n_syms) AS BIGINT) AS n_symbols
    FROM toks t JOIN enc e ON t.word = e.word
    GROUP BY t.doc_id ORDER BY t.doc_id
""")


ORACLES["tx19_bpe_encode"] = _bpe_encode_oracle(BPE_K)


def tx20_zipf_octaves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law audit of the corpus frequency distribution — the
    report a mixture-design review reads before trusting token-level
    dedup/sampling thresholds: words globally ranked by frequency
    (the two-phase range-sharded global_row_number, never a
    vocab-sized single-partition window), then rolled up per rank
    OCTAVE (bucket = bit_length(rank) — exact integer log2, the tx15
    trick). Under Zipf, mean log2(freq) falls by ~alpha per octave;
    the octave table surfaces exactly the integer sums
    (n_words, sum_fbits = Σ bit_length(freq), sum_freq) needed to
    read the slope — no float regression inside the engine, so every
    value hash-checks."""
    from ..operators.scalable import global_row_number
    from ..operators.text import tokens

    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    words = docs.select(F.explode(tokens(F.col("text"))).alias("w")) \
        .filter(F.col("w") != "")
    freq = words.groupBy("w").agg(F.count("*").alias("f"))
    ranked = global_row_number(
        freq, [F.col("f").desc(), F.col("w")], rn_col="r")
    return (
        ranked.groupBy(F.length(F.expr("bin(r)")).alias("octave"))
        .agg(F.count("*").cast("long").alias("n_words"),
             F.sum(F.length(F.expr("bin(f)"))).cast("long")
             .alias("sum_fbits"),
             F.sum("f").cast("long").alias("sum_freq"))
        .withColumn("octave", F.col("octave").cast("long"))
        .orderBy("octave")
    )


QUERIES["tx20_zipf_octaves"] = tx20_zipf_octaves

ORACLES["tx20_zipf_octaves"] = f"""
    WITH words AS (
        SELECT unnest({_TOKS}) AS w FROM documents
    ), freq AS (
        SELECT w, CAST(count(*) AS BIGINT) AS f
        FROM words WHERE w <> '' GROUP BY w
    ), ranked AS (
        SELECT f, row_number() OVER (ORDER BY f DESC, w) AS r
        FROM freq
    )
    SELECT CAST(length(bin(r)) AS BIGINT) AS octave,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(length(bin(f))) AS BIGINT) AS sum_fbits,
           CAST(sum(f) AS BIGINT) AS sum_freq
    FROM ranked GROUP BY 1 ORDER BY octave
"""


TX21_PCTS = (10, 25, 50, 100)


def tx21_heaps_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: distinct-word counts over
    corpus prefixes (10/25/50/100% of the doc_id axis) — the
    projection that answers 'how much NEW vocabulary does the next
    shard buy?'. Scale shape: ONE pass builds the per-word first-
    occurrence doc (min over an equi groupBy), prefix membership is a
    broadcast O(points) threshold join — the corpus is never
    re-scanned per point. All integer (thresholds via integer div),
    fully hash-checked."""
    from ..operators.text import tokens

    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    words = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("w")) \
        .filter(F.col("w") != "")
    firsts = words.groupBy("w").agg(F.min("doc_id").alias("d0"))
    sized = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).alias("nt"))
    md = docs.agg(F.max("doc_id").alias("md"))
    pts = spark.createDataFrame([(p,) for p in TX21_PCTS], "p int") \
        .crossJoin(F.broadcast(md)) \
        .withColumn("thr", F.expr("(md * p) div 100"))
    vocab = (
        pts.join(F.broadcast(firsts), F.col("d0") <= F.col("thr"))
        .groupBy("p", "thr")
        .agg(F.count("*").cast("long").alias("vocab_prefix"))
    )
    toks = (
        pts.join(F.broadcast(sized), F.col("doc_id") <= F.col("thr"))
        .groupBy("p")
        .agg(F.count("*").cast("long").alias("n_docs_prefix"),
             F.sum("nt").cast("long").alias("tokens_prefix"))
    )
    return (
        vocab.join(toks, "p")
        .select("p", F.col("thr").cast("long").alias("thr"),
                "n_docs_prefix", "tokens_prefix", "vocab_prefix")
        .orderBy("p")
    )


QUERIES["tx21_heaps_growth"] = tx21_heaps_growth

ORACLES["tx21_heaps_growth"] = f"""
    WITH words AS (
        SELECT doc_id, unnest({_TOKS}) AS w FROM documents
    ), firsts AS (
        SELECT w, min(doc_id) AS d0
        FROM words WHERE w <> '' GROUP BY w
    ), sized AS (
        SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS nt
        FROM documents
    ), md AS (SELECT max(doc_id) AS md FROM documents),
    pts AS (
        SELECT p, (md * p) // 100 AS thr
        FROM (SELECT unnest([{', '.join(str(p) for p in TX21_PCTS)}]) AS p)
        CROSS JOIN md
    ), vocab AS (
        SELECT p, thr, CAST(count(*) AS BIGINT) AS vocab_prefix
        FROM pts JOIN firsts ON d0 <= thr GROUP BY p, thr
    ), toks AS (
        SELECT p, CAST(count(*) AS BIGINT) AS n_docs_prefix,
               CAST(sum(nt) AS BIGINT) AS tokens_prefix
        FROM pts JOIN sized ON doc_id <= thr GROUP BY p
    )
    SELECT v.p, CAST(v.thr AS BIGINT) AS thr, t.n_docs_prefix,
           t.tokens_prefix, v.vocab_prefix
    FROM vocab v JOIN toks t ON v.p = t.p
    ORDER BY v.p
"""


def tx22_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional-surprisal quality score (operators/text.
    bigram_surprisal_score): floor(log2(c(w1)/c(w1 w2))) per bigram
    via exact bit-length integers — the left-context-aware rung above
    tx15's unigram score, catching shuffled/noisy text whose unigrams
    look common. No float log, no float division; hash-exact."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return TX.bigram_surprisal_score(docs).orderBy("doc_id")


QUERIES["tx22_bigram_surprisal"] = tx22_bigram_surprisal

ORACLES["tx22_bigram_surprisal"] = f"""
    WITH base AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ), uni AS (
        SELECT w, count(*) AS c1
        FROM (SELECT unnest(t) AS w FROM base) GROUP BY w
    ), docbg AS (
        SELECT doc_id, bg, count(*) AS tf
        FROM (SELECT doc_id, unnest(list_transform(
                  range(1, greatest(len(t) - 1, 0) + 1),
                  i -> t[i] || ' ' || t[i+1])) AS bg FROM base)
        GROUP BY doc_id, bg
    ), cbg AS (
        SELECT bg, CAST(sum(tf) AS BIGINT) AS c2 FROM docbg GROUP BY bg
    ), s AS (
        SELECT d.doc_id, d.tf,
               length(bin(u.c1 // c.c2)) - 1 AS surp
        FROM docbg d
        JOIN cbg c USING (bg)
        JOIN uni u ON string_split(d.bg, ' ')[1] = u.w
    )
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_bigrams,
           CAST(sum(tf * surp) AS BIGINT) AS sum_surprisal,
           CAST((2000 * sum(tf * surp) + sum(tf)) // (2 * sum(tf))
                AS BIGINT) AS mean_surprisal_milli
    FROM s GROUP BY doc_id ORDER BY doc_id
"""
