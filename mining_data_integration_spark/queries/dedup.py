"""Oracle-checked deduplication queries over the documents table
(SURVEY.md §7.4 extensions — exact, n-gram Jaccard, MinHash LSH,
SimHash). The implementations live in operators/dedup.py; every hash
primitive is md5-based so the DuckDB oracle computes the identical
signatures bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ._util import spread, t

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
# word list / shingle list / distinct shingle list in DuckDB SQL
_WORDS = f"string_split({_NORM}, ' ')"


def _duck_shingles(n: int, src: str = "documents") -> str:
    """DuckDB fragment: (doc_id, shingle) distinct word n-grams —
    mirrors operators.dedup.shingles. `src` must expose doc_id, text."""
    gram = " || ' ' || ".join(f"words[i+{k}]" for k in range(n))
    return f"""
        SELECT doc_id AS id, unnest(list_distinct(
            list_transform(range(1, greatest(len(words) - {n - 1}, 0) + 1),
                           i -> {gram})
        )) AS shingle
        FROM (SELECT doc_id, {_WORDS} AS words FROM {src})
    """


def dd1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group on content digest, keep lowest id."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return D.exact_dedup(docs).orderBy("content_hash")


def dd2_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram Jaccard >= 0.5 via inverted-index
    self-join (no all-pairs product). max_doc_freq=256 drops stop
    shingles — the skew keys that would explode one bucket of the
    self-join at 100 TB; the oracle applies the identical cap."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return D.ngram_jaccard_pairs(
        docs, n=3, threshold=0.5, max_doc_freq=256
    ).orderBy("id1", "id2")


def dd3_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + 4-band LSH candidate pairs."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return D.minhash_lsh_candidates(docs, n=3, num_hashes=16, bands=4).orderBy(
        "id1", "id2"
    )


def dd4_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprint per document."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return D.simhash(docs, n=2).orderBy("id")


def dd5_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: half-collision candidates, exact Hamming
    verify via bit_count(xor)."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return D.simhash_near_dups(docs, max_hamming=6).orderBy("id1", "id2")


def _simhash_sql(n: int = 2, bits: int = 32) -> str:
    """DuckDB SimHash mirror: hex->int via digit positions (exact
    integer arithmetic, no float)."""
    digit = (
        "(strpos('0123456789abcdef', substring(md5(shingle), {pos}, 1)) - 1)"
    )
    val = " + ".join(
        digit.format(pos=25 + j) + f" * {16 ** (7 - j)}" for j in range(8)
    )
    votes = ", ".join(
        f"sum(CASE WHEN (h // {2 ** b}) % 2 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    fp = " + ".join(f"CASE WHEN v{b} > 0 THEN {2 ** b} ELSE 0 END" for b in range(bits))
    return f"""
        WITH sh AS ({_duck_shingles(n)}),
        hv AS (SELECT id, CAST({val} AS BIGINT) AS h FROM sh),
        agg AS (SELECT id, {votes} FROM hv GROUP BY id)
        SELECT id, CAST({fp} AS BIGINT) AS simhash FROM agg
        ORDER BY id
    """


def _minhash_band_sql(n: int = 3, num_hashes: int = 16, bands: int = 4) -> str:
    """Mirrors operators.dedup.minhash_signatures: base hash for hash i
    = md5 segment i%4 (digit-position hex->int, as _simhash_sql) mod
    2^31-1, then the same universal-hash family (a_i*h + b_i) mod p."""
    from ..operators.dedup import MERSENNE31 as P, uh_params

    rows = num_hashes // bands
    digit = (
        "(strpos('0123456789abcdef', substring(md5(shingle), {pos}, 1)) - 1)"
    )

    def seg_val(seg: int) -> str:
        return " + ".join(
            digit.format(pos=1 + 8 * seg + j) + f" * {16 ** (7 - j)}"
            for j in range(8)
        )

    segs = ", ".join(
        f"CAST({seg_val(s)} AS BIGINT) % {P} AS h{s}" for s in range(4))
    mins = ", ".join(
        f"min((h{i % 4} * {a} + {b}) % {P}) AS mh{i}"
        for i, (a, b) in enumerate(uh_params(num_hashes))
    )
    band_exprs = []
    for b in range(bands):
        parts = " || '|' || ".join(
            f"CAST(mh{b * rows + r} AS VARCHAR)" for r in range(rows))
        band_exprs.append(f"md5({parts}) AS band{b}")
    buckets = ", ".join(f"'{b}:' || band{b}" for b in range(bands))
    return f"""
        WITH sh AS ({_duck_shingles(n)}),
        hv AS (SELECT id, shingle, {segs} FROM sh),
        sigs AS (SELECT id, {mins} FROM hv GROUP BY id),
        banded AS (SELECT id, {', '.join(band_exprs)} FROM sigs),
        stacked AS (SELECT id, unnest([{buckets}]) AS bucket FROM banded)
        SELECT DISTINCT a.id AS id1, b.id AS id2
        FROM stacked a JOIN stacked b
          ON a.bucket = b.bucket AND a.id < b.id
        ORDER BY id1, id2
    """


def dd6_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster collapse over the dd3 candidate pairs: connected
    components (operators/components.py label propagation) give every
    document a cluster id = the min doc id it is transitively near-dup
    with; the component representative carries keep=true. This is the
    step that turns pair lists into a deduplicated corpus. The DuckDB
    oracle computes the same closure with WITH RECURSIVE."""
    from ..operators.components import dedup_keep_min

    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    pairs = D.minhash_lsh_candidates(docs, n=3, num_hashes=16, bands=4)
    return (
        dedup_keep_min(docs.select("doc_id"), pairs, "doc_id")
        .select("doc_id", "cluster_id", "keep")
        .orderBy("doc_id")
    )


def dd7_edit_distance_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy NN: per doc, the closest other doc in its
    (prefix, length-bucket) block by Levenshtein distance — with
    ADAPTIVE blocking (round 11): a block larger than 64 docs is
    re-keyed with a 12-char prefix, and a still-oversized block is
    skipped, so pairwise work is bounded at 64 x docs instead of
    growing quadratically with corpus density (the uncapped key hit
    10M pairs at the sf1 tier — 95x sf0.1 — because the synthetic
    vocabulary's 4-char prefix entropy is low). At every driver tier
    all level-1 blocks are within the cap, so the output equals the
    uncapped operator's; the oracle replays the same two-level
    scheme."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return D.edit_distance_nn(docs, prefix_len=4, len_bucket=64,
                              max_block=64).orderBy("doc_id")


QUERIES = {
    "dd7_edit_distance_nn": dd7_edit_distance_nn,
    "dd1_exact_dedup": dd1_exact_dedup,
    "dd2_ngram_jaccard": dd2_ngram_jaccard,
    "dd3_minhash_lsh": dd3_minhash_lsh,
    "dd4_simhash": dd4_simhash,
    "dd5_simhash_near_dups": dd5_simhash_near_dups,
    "dd6_dup_clusters": dd6_dup_clusters,
}

ORACLES = {
    "dd7_edit_distance_nn": f"""
        WITH k1 AS (
            SELECT doc_id AS id, norm,
                   substring(norm, 1, 4) || '|'
                       || CAST(len(norm) // 64 AS VARCHAR) AS b1,
                   substring(norm, 1, 12) || '|'
                       || CAST(len(norm) // 64 AS VARCHAR) AS b2
            FROM (SELECT doc_id, {_NORM} AS norm FROM documents)
        ),
        s1 AS (SELECT b1, count(*) AS c1 FROM k1 GROUP BY b1),
        k2 AS (
            SELECT k1.id, k1.norm,
                   CASE WHEN s1.c1 <= 64 THEN '1:' || k1.b1
                        ELSE '2:' || k1.b2 END AS block
            FROM k1 JOIN s1 ON k1.b1 = s1.b1
        ),
        s2 AS (SELECT block, count(*) AS c2 FROM k2 GROUP BY block),
        k AS (
            SELECT k2.id, k2.norm, k2.block
            FROM k2 JOIN s2 ON k2.block = s2.block WHERE s2.c2 <= 64
        ),
        pairs AS (
            SELECT a.id AS id1, b.id AS id2,
                   levenshtein(a.norm, b.norm) AS dist
            FROM k a JOIN k b ON a.block = b.block AND a.id <> b.id
        ),
        ranked AS (
            SELECT id1, id2, dist,
                   row_number() OVER (PARTITION BY id1
                                      ORDER BY dist, id2) AS rn
            FROM pairs
        )
        SELECT id1 AS doc_id, id2 AS nn_id, CAST(dist AS BIGINT) AS dist
        FROM ranked WHERE rn = 1 ORDER BY doc_id
    """,
    "dd1_exact_dedup": f"""
        SELECT md5({_NORM}) AS content_hash,
               min(doc_id) AS keep_id,
               count(*) AS n_dups
        FROM documents
        GROUP BY md5({_NORM})
        ORDER BY content_hash
    """,
    "dd2_ngram_jaccard": f"""
        WITH sh0 AS ({_duck_shingles(3)}),
        freq AS (SELECT shingle, count(*) AS df FROM sh0 GROUP BY shingle),
        sh AS (SELECT sh0.id, sh0.shingle FROM sh0
               JOIN freq ON sh0.shingle = freq.shingle WHERE df <= 256),
        sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
        common AS (
            SELECT a.id AS id1, b.id AS id2, count(*) AS common
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
            GROUP BY a.id, b.id
        )
        SELECT id1, id2, common, s1.sz AS sz1, s2.sz AS sz2,
               CAST(common AS DOUBLE) / CAST(s1.sz + s2.sz - common AS DOUBLE) AS jaccard
        FROM common
        JOIN sizes s1 ON common.id1 = s1.id
        JOIN sizes s2 ON common.id2 = s2.id
        WHERE CAST(common AS DOUBLE) / CAST(s1.sz + s2.sz - common AS DOUBLE) >= 0.5
        ORDER BY id1, id2
    """,
    "dd3_minhash_lsh": _minhash_band_sql(3, 16, 4),
    "dd6_dup_clusters": f"""
        WITH RECURSIVE pairs AS (
            {_minhash_band_sql(3, 16, 4).replace("ORDER BY id1, id2", "")}
        ), sym AS (
            SELECT id1 AS a, id2 AS b FROM pairs
            UNION
            SELECT id2 AS a, id1 AS b FROM pairs
        ), reach AS (
            SELECT a AS node, a AS r FROM sym
            UNION
            SELECT s.b AS node, reach.r
            FROM sym s JOIN reach ON s.a = reach.node
        ), comp AS (
            SELECT node, min(r) AS component FROM reach GROUP BY node
        )
        SELECT d.doc_id,
               coalesce(c.component, d.doc_id) AS cluster_id,
               coalesce(c.component, d.doc_id) = d.doc_id AS keep
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
        ORDER BY d.doc_id
    """,
    "dd4_simhash": _simhash_sql(2, 32),
    "dd5_simhash_near_dups": f"""
        WITH simhashes AS ({_simhash_sql(2, 32).replace('ORDER BY id', '')}),
        halves AS (
            SELECT id, simhash,
                   simhash % 65536 AS lo,
                   simhash // 65536 AS hi
            FROM simhashes
        )
        SELECT a.id AS id1, b.id AS id2,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        FROM halves a JOIN halves b
          ON (a.lo = b.lo OR a.hi = b.hi) AND a.id < b.id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
        ORDER BY id1, id2
    """,
}


def dd8_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate k-char spans (suffix-array-style
    substring dedup, distributed via content-defined anchor hashing —
    alignment-invariant; operators/dedup.substring_dup_spans)."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return (
        D.substring_dup_spans(docs, k=64, stride=32)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "pos")
    )


QUERIES["dd8_substring_dup_spans"] = dd8_substring_dup_spans

ORACLES["dd8_substring_dup_spans"] = f"""
    WITH base AS (
        SELECT doc_id AS id, {_NORM} AS norm FROM documents
        WHERE length({_NORM}) >= 64
    ), idx AS (
        SELECT id, norm,
               unnest(range(1, length(norm) - 64 + 2)) AS i
        FROM base
    ), anchors AS (
        SELECT id, norm, i FROM idx
        WHERE (i - 1) % 32 = 0
           OR substr(md5(substr(norm, CAST(i AS INT), 8)), 1, 2) < '08'
    ), spans AS (
        SELECT id, CAST(i - 1 AS INT) AS pos,
               md5(substr(norm, CAST(i AS INT), 64)) AS h
        FROM anchors
    ), dup AS (
        SELECT h, CAST(count(DISTINCT id) AS BIGINT) AS n_docs
        FROM spans GROUP BY h HAVING count(DISTINCT id) >= 2
    )
    SELECT s.id AS doc_id, s.pos, s.h AS span_hash, d.n_docs
    FROM spans s JOIN dup d ON s.h = d.h
    ORDER BY doc_id, pos
"""


def dd9_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup over embeddings: LSH-bucket
    clusters, exact-integer quantized-cosine threshold (0.40 — the top
    of the fixture similarity tail, same as dd/sim3), md5-priority
    exemplar retention. operators/similarity.semantic_dedup."""
    from ..operators import similarity as S

    emb = spread(t(spark, sf_dir, "embeddings"), "vec_id")
    return S.semantic_dedup(emb, threshold_pct=40, num_planes=4).orderBy(
        "vec_id"
    )


QUERIES["dd9_semantic_dedup"] = dd9_semantic_dedup


def _dd9_oracle() -> str:
    from .similarity import _bucket_sql, _planes_cte

    return f"""
    WITH planes AS ({_planes_cte()}),
    base AS (
        SELECT vec_id AS id, embedding,
               {_bucket_sql('embedding')} AS cluster,
               list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE)))) AS mx
        FROM embeddings CROSS JOIN planes
    ), qv AS (
        SELECT id, cluster,
               CASE WHEN mx > 0 THEN list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / mx)
                                        + 0.5) AS BIGINT))
                    ELSE list_transform(embedding,
                        x -> CAST(0 AS BIGINT)) END AS q
        FROM base
    ), n AS (
        SELECT id, cluster, q,
               CAST(list_sum(list_transform(range(1, len(q) + 1),
                   i -> q[i] * q[i])) AS BIGINT) AS n2,
               md5(CAST(id AS VARCHAR)) AS pri
        FROM qv
    ), pairs AS (
        SELECT a.id AS aid,
               CAST(list_sum(list_transform(range(1, len(a.q) + 1),
                   i -> a.q[i] * b.q[i])) AS BIGINT) AS d,
               a.n2 AS an2, b.n2 AS bn2
        FROM n a JOIN n b
          ON a.cluster = b.cluster AND a.id <> b.id
         AND (b.pri < a.pri OR (b.pri = a.pri AND b.id < a.id))
    ), dropped AS (
        SELECT DISTINCT aid AS id FROM pairs
        WHERE d > 0
          AND CAST(d AS HUGEINT) * d * 10000
              >= 1600 * CAST(an2 AS HUGEINT) * bn2
    )
    SELECT n.id AS vec_id, n.cluster,
           CAST(CASE WHEN dr.id IS NULL THEN 1 ELSE 0 END AS INTEGER) AS kept
    FROM n LEFT JOIN dropped dr ON n.id = dr.id
    ORDER BY vec_id
    """


ORACLES["dd9_semantic_dedup"] = _dd9_oracle()


def dd10_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional doc-in-doc containment >= 70% over 3-gram shingles
    (operators/dedup.containment_pairs) — the short-doc-inside-long-doc
    rule Jaccard misses. Same capped inverted-index shape as dd2."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return D.containment_pairs(
        docs, n=3, threshold_pct=70, max_doc_freq=256
    ).orderBy("contained_id", "container_id")


QUERIES["dd10_containment_pairs"] = dd10_containment_pairs

ORACLES["dd10_containment_pairs"] = f"""
    WITH sh0 AS ({_duck_shingles(3)}),
    freq AS (SELECT shingle, count(*) AS df FROM sh0 GROUP BY shingle),
    sh AS (SELECT sh0.id, sh0.shingle FROM sh0
           JOIN freq ON sh0.shingle = freq.shingle WHERE df <= 256),
    sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
    common AS (
        SELECT a.id AS contained_id, b.id AS container_id,
               CAST(count(*) AS BIGINT) AS common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id <> b.id
        GROUP BY a.id, b.id
    )
    SELECT c.contained_id, c.container_id, c.common,
           CAST(s.sz AS BIGINT) AS sz_contained,
           CAST(CASE WHEN c.common = s.sz THEN 1 ELSE 0 END AS INTEGER)
               AS contained_full
    FROM common c JOIN sizes s ON c.contained_id = s.id
    WHERE c.common * 100 >= s.sz * 70
    ORDER BY contained_id, container_id
"""


def dd11_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: 1000 - max milli-Jaccard against any
    other document (capped inverted-index candidates, dd2 machinery)
    — the duplication-aware quality signal a curation pipeline mixes
    into sampling weights; documents with no candidate pair score a
    full 1000. The milli-Jaccard is HALF_UP exact-integer (w12
    pattern), so the scores hash-check."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    pairs = D.ngram_jaccard_pairs(docs, n=3, threshold=0.0,
                                  max_doc_freq=256)
    milli = F.expr(
        "(2000 * common + (sz1 + sz2 - common)) "
        "DIV (2 * (sz1 + sz2 - common))")
    sym = (
        pairs.select(F.col("id1").alias("doc_id"), milli.alias("mj"))
        .unionByName(
            pairs.select(F.col("id2").alias("doc_id"), milli.alias("mj")))
    )
    per = sym.groupBy("doc_id").agg(F.max("mj").alias("max_mj"))
    return (
        docs.select("doc_id").join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("max_mj", F.lit(0)).cast("long")
            .alias("max_milli_jaccard"),
            (1000 - F.coalesce("max_mj", F.lit(0))).cast("long")
            .alias("novelty_milli"),
        )
        .orderBy("doc_id")
    )


QUERIES["dd11_novelty_scores"] = dd11_novelty_scores

ORACLES["dd11_novelty_scores"] = f"""
    WITH sh0 AS ({_duck_shingles(3)}),
    freq AS (SELECT shingle, count(*) AS df FROM sh0 GROUP BY shingle),
    sh AS (SELECT sh0.id, sh0.shingle FROM sh0
           JOIN freq ON sh0.shingle = freq.shingle WHERE df <= 256),
    sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
    common AS (
        SELECT a.id AS id1, b.id AS id2, count(*) AS common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY a.id, b.id
    ), milli AS (
        SELECT id1, id2,
               (2000 * common + (s1.sz + s2.sz - common))
                   // (2 * (s1.sz + s2.sz - common)) AS mj
        FROM common
        JOIN sizes s1 ON common.id1 = s1.id
        JOIN sizes s2 ON common.id2 = s2.id
    ), sym AS (
        SELECT id1 AS doc_id, mj FROM milli
        UNION ALL SELECT id2, mj FROM milli
    ), per AS (
        SELECT doc_id, max(mj) AS max_mj FROM sym GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(p.max_mj, 0) AS BIGINT) AS max_milli_jaccard,
           CAST(1000 - coalesce(p.max_mj, 0) AS BIGINT) AS novelty_milli
    FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
    ORDER BY d.doc_id
"""


def dd12_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup — the growing-corpus pattern: a new
    batch (every 10th doc, simulating an arriving crawl shard) is
    deduplicated (a) against the EXISTING corpus and (b) within
    itself, WITHOUT re-deduplicating the corpus internally. That
    asymmetry is what makes daily ingest O(batch) instead of
    O(corpus): the corpus side reduces to its distinct digest set
    (combinable pre-aggregation before the join), the batch
    left-anti-joins it on the digest, then collapses its own
    duplicates keeping the lowest id. Batch cross-corpus duplicates
    are planted: every 30th doc shares a digest with a corpus doc by
    construction of the %10/%3 overlap below."""
    from ..operators.dedup import normalize_text

    docs = t(spark, sf_dir, "documents")
    # planted overlap: batch docs (%10 == 0) whose id is also %3 == 0
    # reuse the TEXT of corpus doc (id+1), so their digests collide
    # with the corpus — exercising the cross-corpus anti-join for
    # real. The neighbor text comes from an equi self-join on id+1
    # (NOT an unpartitioned lead() window — that would be a global
    # single-partition sort just to build the fixture).
    nxt = docs.select((F.col("doc_id") - 1).alias("doc_id"),
                      F.col("text").alias("_nxt"))
    txt = F.when(
        (F.col("doc_id") % 10 == 0) & (F.col("doc_id") % 3 == 0),
        F.coalesce(F.col("_nxt"), F.col("text"))
    ).otherwise(F.col("text"))
    staged = docs.join(nxt, "doc_id", "left") \
        .select("doc_id", txt.alias("text"))
    dig = F.md5(normalize_text(F.col("text")))
    batch = staged.filter(F.col("doc_id") % 10 == 0) \
        .select("doc_id", dig.alias("dig"))
    corpus_digs = staged.filter(F.col("doc_id") % 10 != 0) \
        .select(dig.alias("dig")).distinct()
    fresh = batch.join(corpus_digs, "dig", "left_anti")
    kept = (fresh.groupBy("dig")
            .agg(F.min("doc_id").cast("long").alias("keep_id"),
                 F.count("*").cast("long").alias("n_batch_dups")))
    return kept.select("keep_id", "n_batch_dups").orderBy("keep_id")


QUERIES["dd12_incremental_dedup"] = dd12_incremental_dedup

ORACLES["dd12_incremental_dedup"] = f"""
    WITH staged AS (
        SELECT d.doc_id,
               CASE WHEN d.doc_id % 10 = 0 AND d.doc_id % 3 = 0
                    THEN coalesce(nx.text, d.text)
                    ELSE d.text END AS text
        FROM documents d
        LEFT JOIN documents nx ON nx.doc_id = d.doc_id + 1
    ), digs AS (
        SELECT doc_id, md5({_NORM}) AS dig FROM staged
    ), batch AS (
        SELECT doc_id, dig FROM digs WHERE doc_id % 10 = 0
    ), corpus AS (
        SELECT DISTINCT dig FROM digs WHERE doc_id % 10 <> 0
    ), fresh AS (
        SELECT b.doc_id, b.dig FROM batch b
        LEFT JOIN corpus c ON b.dig = c.dig WHERE c.dig IS NULL
    )
    SELECT CAST(min(doc_id) AS BIGINT) AS keep_id,
           CAST(count(*) AS BIGINT) AS n_batch_dups
    FROM fresh GROUP BY dig ORDER BY keep_id
"""


def dd13_lsh_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH calibration audit — the tuning harness for the dd3 family
    (sim13's recall-eval idea applied to MinHash): for every LSH
    candidate pair, the signature-agreement Jaccard ESTIMATE
    (1000·agree/16, the unbiased MinHash estimator) next to the EXACT
    shingle Jaccard, plus the absolute error. This is the table that
    justifies a banding config before a 100 TB dedup run: if est
    tracks exact, the S-curve math holds. Scale: signatures are
    materialized once (the dd3 plan); exact Jaccard is computed ONLY
    for candidate docs — shingles are semi-joined to the candidate id
    set first, so the shingle self-join is O(candidates' shingles),
    never corpus-wide. Pure integer milli-units throughout."""
    from ..operators.dedup import (materialize, minhash_lsh_candidates,
                                   minhash_signatures, shingles)

    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    cands = materialize(minhash_lsh_candidates(docs))
    sigs = minhash_signatures(shingles(docs), 16)
    s1 = sigs.select(F.col("id").alias("id1"),
                     *[F.col(f"mh{i}").alias(f"a{i}") for i in range(16)])
    s2 = sigs.select(F.col("id").alias("id2"),
                     *[F.col(f"mh{i}").alias(f"b{i}") for i in range(16)])
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(16))
    est = cands.join(s1, "id1").join(s2, "id2") \
        .select("id1", "id2", agree.alias("agree"))
    ids = (cands.select(F.col("id1").alias("id"))
           .union(cands.select(F.col("id2").alias("id"))).distinct())
    sh = shingles(docs).join(ids, "id")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    common = (
        sh.alias("x").join(sh.alias("y"),
                           (F.col("x.shingle") == F.col("y.shingle"))
                           & (F.col("x.id") < F.col("y.id")))
        .groupBy(F.col("x.id").alias("id1"), F.col("y.id").alias("id2"))
        .agg(F.count("*").alias("common"))
    )
    exact = (
        cands.join(common, ["id1", "id2"], "left")
        .join(sizes.select(F.col("id").alias("id1"),
                           F.col("sz").alias("sz1")), "id1")
        .join(sizes.select(F.col("id").alias("id2"),
                           F.col("sz").alias("sz2")), "id2")
        .select("id1", "id2",
                F.expr("1000 * coalesce(common, 0) div "
                       "(sz1 + sz2 - coalesce(common, 0))")
                .alias("exact_milli"))
    )
    return (
        est.join(exact, ["id1", "id2"])
        .select(
            "id1", "id2",
            F.col("agree").cast("long").alias("agree"),
            F.expr("1000 * agree div 16").cast("long").alias("est_milli"),
            F.col("exact_milli").cast("long").alias("exact_milli"),
            F.abs(F.expr("1000 * agree div 16") - F.col("exact_milli"))
            .cast("long").alias("err_milli"),
        )
        .orderBy("id1", "id2")
    )


QUERIES["dd13_lsh_calibration"] = dd13_lsh_calibration


def _lsh_calibration_oracle() -> str:
    from ..operators.dedup import MERSENNE31 as P, uh_params

    pairs = _minhash_band_sql(3, 16, 4).replace("ORDER BY id1, id2", "")
    agree = " + ".join(
        f"CASE WHEN s1.mh{i} = s2.mh{i} THEN 1 ELSE 0 END"
        for i in range(16))
    digit = (
        "(strpos('0123456789abcdef', substring(md5(shingle), {pos}, 1)) - 1)"
    )

    def seg_val(seg: int) -> str:
        return " + ".join(
            digit.format(pos=1 + 8 * seg + j) + f" * {16 ** (7 - j)}"
            for j in range(8)
        )

    segs = ", ".join(
        f"CAST({seg_val(s)} AS BIGINT) % {P} AS h{s}" for s in range(4))
    mins = ", ".join(
        f"min((h{i % 4} * {a} + {b}) % {P}) AS mh{i}"
        for i, (a, b) in enumerate(uh_params(16))
    )
    return f"""
    WITH cands AS MATERIALIZED ({pairs}),
    sh0 AS MATERIALIZED ({_duck_shingles(3)}),
    csh AS MATERIALIZED (
        SELECT id, shingle FROM sh0
        WHERE id IN (SELECT id1 FROM cands UNION SELECT id2 FROM cands)
    ),
    hv AS (SELECT id, shingle, {segs} FROM sh0),
    sigs AS (SELECT id, {mins} FROM hv GROUP BY id),
    sizes AS (SELECT id, count(*) AS sz FROM csh GROUP BY id),
    common AS (
        SELECT x.id AS id1, y.id AS id2, count(*) AS common
        FROM csh x JOIN csh y ON x.shingle = y.shingle AND x.id < y.id
        GROUP BY x.id, y.id
    )
    SELECT c.id1, c.id2,
           CAST({agree} AS BIGINT) AS agree,
           CAST(1000 * ({agree}) // 16 AS BIGINT) AS est_milli,
           CAST(1000 * coalesce(m.common, 0)
                // (z1.sz + z2.sz - coalesce(m.common, 0))
                AS BIGINT) AS exact_milli,
           CAST(abs(1000 * ({agree}) // 16
                - 1000 * coalesce(m.common, 0)
                  // (z1.sz + z2.sz - coalesce(m.common, 0)))
                AS BIGINT) AS err_milli
    FROM cands c
    JOIN sigs s1 ON c.id1 = s1.id
    JOIN sigs s2 ON c.id2 = s2.id
    LEFT JOIN common m ON c.id1 = m.id1 AND c.id2 = m.id2
    JOIN sizes z1 ON c.id1 = z1.id
    JOIN sizes z2 ON c.id2 = z2.id
    ORDER BY c.id1, c.id2
"""


ORACLES["dd13_lsh_calibration"] = _lsh_calibration_oracle()


def dd14_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship policy on top of dd6's duplicate clusters — the
    step every production dedup pipeline adds after clustering: the
    cluster's CANONICAL document is chosen by an explicit rule (keep
    the longest member — max token count, lowest doc_id tiebreak),
    not whichever id happened to be smallest. Per doc: its cluster,
    the canonical survivor, a keep flag and the cluster size. The
    argmax is ONE max-of-struct aggregate per cluster (combinable —
    no per-cluster sort), and the policy column is integer, so the
    whole selection hash-checks against the recursive-CTE closure."""
    from ..operators.components import dedup_keep_min
    from ..operators.text import tokens

    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    pairs = D.minhash_lsh_candidates(docs, n=3, num_hashes=16, bands=4)
    clusters = dedup_keep_min(docs.select("doc_id"), pairs, "doc_id") \
        .select("doc_id", "cluster_id")
    sized = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).alias("nt"))
    j = clusters.join(sized, "doc_id")
    canon = j.groupBy("cluster_id").agg(
        F.max(F.struct(F.col("nt"), (-F.col("doc_id")).alias("nid"),
                       F.col("doc_id").alias("d")))["d"]
        .alias("canonical_id"),
        F.count("*").cast("long").alias("n_members"),
    )
    return (
        j.join(canon, "cluster_id")
        .select("doc_id", "cluster_id", "canonical_id",
                (F.col("doc_id") == F.col("canonical_id")).alias("keep"),
                "n_members")
        .orderBy("doc_id")
    )


QUERIES["dd14_survivorship"] = dd14_survivorship

ORACLES["dd14_survivorship"] = f"""
    WITH RECURSIVE pairs AS (
        {_minhash_band_sql(3, 16, 4).replace("ORDER BY id1, id2", "")}
    ), sym AS (
        SELECT id1 AS a, id2 AS b FROM pairs
        UNION
        SELECT id2 AS a, id1 AS b FROM pairs
    ), reach AS (
        SELECT a AS node, a AS r FROM sym
        UNION
        SELECT s.b AS node, reach.r
        FROM sym s JOIN reach ON s.a = reach.node
    ), comp AS (
        SELECT node, min(r) AS component FROM reach GROUP BY node
    ), clustered AS (
        SELECT d.doc_id,
               coalesce(c.component, d.doc_id) AS cluster_id,
               CAST(len({_WORDS}) AS BIGINT) AS nt
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    ), canon AS (
        SELECT cluster_id, doc_id AS canonical_id, n_members FROM (
            SELECT cluster_id, doc_id,
                   count(*) OVER (PARTITION BY cluster_id) AS n_members,
                   row_number() OVER (PARTITION BY cluster_id
                                      ORDER BY nt DESC, doc_id) AS rn
            FROM clustered
        ) WHERE rn = 1
    )
    SELECT cl.doc_id, cl.cluster_id, ca.canonical_id,
           cl.doc_id = ca.canonical_id AS keep,
           CAST(ca.n_members AS BIGINT) AS n_members
    FROM clustered cl JOIN canon ca ON cl.cluster_id = ca.cluster_id
    ORDER BY cl.doc_id
"""


def _lsh_index_path(sf_dir: str, tag: str = "train-even") -> str:
    """Deterministic per-corpus LSH-index location, fingerprinted by
    the documents parquet's (path, size, mtime) — the sim19 staleness
    rule applied to the dedup index (one os.stat, no Spark job).
    `tag` separates build lineages (dd15's one-shot even-corpus index
    vs dd16's base+append generations)."""
    import hashlib
    import os

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    fp = hashlib.sha256(
        f"{src}|{st.st_size}|{st.st_mtime_ns}|{tag}|"
        f"v{D.MINHASH_INDEX_VERSION}".encode()).hexdigest()[:16]
    return f"/tmp/sg_lsh_index/{fp}"


def dd15_persisted_lsh_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTED near-dup ingest index — the dedup-family lifecycle
    sibling of sim19/sim20: the corpus half (even doc_ids) is
    shingled/signed ONCE into a persisted band-bucket index
    (save_minhash_index: buckets parquet partitioned by band + meta
    with the signature parameters, atomic rename), and the ingest
    batch (odd doc_ids) probes it — the batch is band-bucketed with
    the index's RECORDED parameters and broadcast-joined against the
    bucket scan, so a daily ingest pays O(batch), never a corpus
    re-signing. Output: candidate (new_id, corpus_id) near-dup pairs.
    The DuckDB oracle replays both sides' band buckets from the
    documents table and joins across the even/odd split."""
    import os

    path = _lsh_index_path(sf_dir)
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    if not os.path.exists(os.path.join(path, "meta")):
        D.save_minhash_index(docs.filter(F.col("doc_id") % 2 == 0),
                             path, n=3, num_hashes=16, bands=4)
    return D.probe_minhash_index(
        docs.filter(F.col("doc_id") % 2 == 1), path
    ).orderBy("new_id", "corpus_id")


QUERIES["dd15_persisted_lsh_probe"] = dd15_persisted_lsh_probe


def _lsh_probe_sql(n: int = 3, num_hashes: int = 16,
                   bands: int = 4, tail: str | None = None) -> str:
    """Replay of dd15: the _minhash_band_sql signature chain over ALL
    documents, then new (odd) x corpus (even) bucket matches. `tail`
    replaces the default final SELECT with caller SQL appended after
    the `stacked` CTE (None leaves the generated SQL byte-identical
    to the pre-parameter version — the dd15 oracle is unchanged);
    the st9 streaming-ingest report composes its per-doc aggregate
    through it."""
    from ..operators.dedup import MERSENNE31 as P, uh_params

    rows = num_hashes // bands
    digit = (
        "(strpos('0123456789abcdef', substring(md5(shingle), {pos}, 1)) - 1)"
    )

    def seg_val(seg: int) -> str:
        return " + ".join(
            digit.format(pos=1 + 8 * seg + j) + f" * {16 ** (7 - j)}"
            for j in range(8)
        )

    segs = ", ".join(
        f"CAST({seg_val(s)} AS BIGINT) % {P} AS h{s}" for s in range(4))
    mins = ", ".join(
        f"min((h{i % 4} * {a} + {b}) % {P}) AS mh{i}"
        for i, (a, b) in enumerate(uh_params(num_hashes))
    )
    band_exprs = []
    for b in range(bands):
        parts = " || '|' || ".join(
            f"CAST(mh{b * rows + r} AS VARCHAR)" for r in range(rows))
        band_exprs.append(f"md5({parts}) AS band{b}")
    buckets = ", ".join(f"'{b}:' || band{b}" for b in range(bands))
    default_tail = """
        SELECT DISTINCT n.id AS new_id, c.id AS corpus_id
        FROM stacked n JOIN stacked c
          ON n.bucket = c.bucket
        WHERE n.id % 2 = 1 AND c.id % 2 = 0
        ORDER BY new_id, corpus_id
    """
    return f"""
        WITH sh AS ({_duck_shingles(n)}),
        hv AS (SELECT id, shingle, {segs} FROM sh),
        sigs AS (SELECT id, {mins} FROM hv GROUP BY id),
        banded AS (SELECT id, {', '.join(band_exprs)} FROM sigs),
        stacked AS (SELECT id, unnest([{buckets}]) AS bucket FROM banded)\
""" + (tail if tail is not None else default_tail)


ORACLES["dd15_persisted_lsh_probe"] = _lsh_probe_sql(3, 16, 4)


DD19_HOT_MILLI = 50


def dd19_lsh_bucket_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-occupancy audit of the dd15 persisted band index — the
    dedup twin of sim24's cell-occupancy audit (operators/dedup.
    audit_minhash_buckets): per band, live rows/buckets, the largest
    bucket with its exact milli-share, and the count of buckets at or
    above 50 milli (the hot-bucket bound a band-bucket join's skew
    guard watches). All-integer arithmetic, so the report is fully
    hash-checked: the DuckDB oracle replays the even-corpus band
    buckets via _lsh_probe_sql's tail hook and re-derives the same
    rollup."""
    import os

    path = _lsh_index_path(sf_dir)
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    if not os.path.exists(os.path.join(path, "meta")):
        D.save_minhash_index(docs.filter(F.col("doc_id") % 2 == 0),
                             path, n=3, num_hashes=16, bands=4)
    return D.audit_minhash_buckets(
        spark, path, hot_milli=DD19_HOT_MILLI).orderBy("band")


QUERIES["dd19_lsh_bucket_audit"] = dd19_lsh_bucket_audit

ORACLES["dd19_lsh_bucket_audit"] = _lsh_probe_sql(3, 16, 4, tail=f"""
        , ev AS (
            SELECT id, bucket FROM stacked WHERE id % 2 = 0
        ), pb AS (
            SELECT CAST(split_part(bucket, ':', 1) AS BIGINT) AS band,
                   bucket, CAST(count(*) AS BIGINT) AS sz
            FROM ev GROUP BY band, bucket
        ), bs AS (
            SELECT band, CAST(sum(sz) AS BIGINT) AS n_rows,
                   CAST(count(*) AS BIGINT) AS n_buckets,
                   CAST(max(sz) AS BIGINT) AS max_bucket
            FROM pb GROUP BY band
        )
        SELECT b.band, b.n_rows, b.n_buckets, b.max_bucket,
               CAST(b.max_bucket * 1000 // b.n_rows AS BIGINT)
                   AS max_milli,
               (SELECT CAST(count(*) AS BIGINT) FROM pb p
                WHERE p.band = b.band
                  AND p.sz * 1000 // b.n_rows >= {DD19_HOT_MILLI})
                   AS n_hot
        FROM bs b ORDER BY band
    """)


def dd16_lsh_index_append_probe(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Day-2 near-dup index lifecycle (round-9 VERDICT #3 — the sim20
    move applied to dedup): generation 1 (doc_id % 4 == 0) is built
    into a persisted band-bucket index; generation 2 (doc_id % 4 == 2)
    arrives later and is APPENDED with the index's RECORDED signature
    parameters (append_to_minhash_index — no re-signing of gen 1);
    the fragments are then COMPACTED into one generation
    (compact_minhash_index) before the ingest batch (odd doc_ids)
    probes the combined index. Output: candidate pairs tagged with
    the corpus generation each candidate came from — probing the
    appended index must equal probing an index built one-shot over
    the union (pinned in tests/test_operators.py), which is exactly
    what the DuckDB oracle replays. The whole base+append+compact
    build runs under a staging path and renames in at the end, so a
    half-built index is never mistaken for a finished one."""
    import os
    import shutil

    path = _lsh_index_path(sf_dir, tag="gen-append")
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    if not os.path.exists(os.path.join(path, "meta")):
        staging = f"{path}.staging-{os.getpid()}"
        shutil.rmtree(staging, ignore_errors=True)
        D.save_minhash_index(docs.filter(F.col("doc_id") % 4 == 0),
                             staging, n=3, num_hashes=16, bands=4)
        D.append_to_minhash_index(
            docs.filter(F.col("doc_id") % 4 == 2), staging)
        D.compact_minhash_index(spark, staging)
        try:
            os.rename(staging, path)
        except OSError:
            # only a concurrent winner may absorb the failure: if the
            # index is still absent the rename failed for a real
            # reason (cross-device tmp, stale target) — re-raise
            # instead of discarding the built index
            if not os.path.exists(os.path.join(path, "meta")):
                raise
            shutil.rmtree(staging, ignore_errors=True)
    pairs = D.probe_minhash_index(
        docs.filter(F.col("doc_id") % 2 == 1), path)
    return (
        pairs.select(
            "new_id", "corpus_id",
            F.when(F.col("corpus_id") % 4 == 0, F.lit(1))
            .otherwise(F.lit(2)).alias("corpus_gen"))
        .orderBy("new_id", "corpus_id")
    )


QUERIES["dd16_lsh_index_append_probe"] = dd16_lsh_index_append_probe

ORACLES["dd16_lsh_index_append_probe"] = _lsh_probe_sql(3, 16, 4, tail="""
        SELECT DISTINCT n.id AS new_id, c.id AS corpus_id,
               CASE WHEN c.id % 4 = 0 THEN 1 ELSE 2 END AS corpus_gen
        FROM stacked n JOIN stacked c
          ON n.bucket = c.bucket
        WHERE n.id % 2 = 1 AND c.id % 2 = 0
        ORDER BY new_id, corpus_id
    """)


DD17_ORACLE_ROUNDS = 6


def dd17_star_dedup_clusters(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """The production dedup combination, end-to-end: MinHash/LSH
    candidate pairs (dd3's machinery) collapsed into transitive
    near-dup CLUSTERS by the O(log n) star-contraction kernel
    (operators/components.connected_components_star — the g4 kernel
    on the graph it was built for: near-dup chains whose diameter is
    unbounded across crawl snapshots; converges in 2 rounds at every
    sf tier here, pinned <= DD17_ORACLE_ROUNDS by the parity test).
    Output: one row per duplicate cluster (cluster id = min doc id,
    size, max member) — what a keep-one-per-cluster pass consumes.
    The DuckDB oracle replays the full chain: signature -> band
    buckets -> candidate pairs -> 6 star-contraction rounds (margin
    over the measured 2; the star forest is a fixed point, so extra
    rounds are no-ops) -> cluster rollup."""
    from ..operators.components import connected_components_star

    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    pairs = D.minhash_lsh_candidates(docs, n=3, num_hashes=16, bands=4)
    labels = connected_components_star(pairs, "id1", "id2")
    return (
        labels.groupBy(F.col("component").alias("cluster_id"))
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.max("node").cast("long").alias("max_doc"))
        .orderBy("cluster_id")
    )


QUERIES["dd17_star_dedup_clusters"] = dd17_star_dedup_clusters


def _dd17_oracle() -> str:
    from .graph import star_rounds_sql

    rounds_sql, final = star_rounds_sql(DD17_ORACLE_ROUNDS)
    return _lsh_probe_sql(3, 16, 4, tail=f"""
        , cand AS MATERIALIZED (
            SELECT DISTINCT a.id AS id1, b.id AS id2
            FROM stacked a JOIN stacked b
              ON a.bucket = b.bucket AND a.id < b.id
        ), e0 AS MATERIALIZED (
            SELECT DISTINCT id2 AS x, id1 AS y FROM cand
        ){rounds_sql}
        , labels AS MATERIALIZED (
            SELECT DISTINCT x AS node, y AS comp FROM {final}
            UNION
            SELECT DISTINCT y, y FROM {final}
        )
        SELECT comp AS cluster_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(max(node) AS BIGINT) AS max_doc
        FROM labels GROUP BY comp ORDER BY cluster_id
    """)


ORACLES["dd17_star_dedup_clusters"] = _dd17_oracle()


def dd18_index_tombstone_probe(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """DELETE lifecycle of the persisted near-dup index (round-10
    VERDICT #1 — takedown / right-to-be-forgotten without a rebuild):
    the even-doc corpus index receives a tombstone delete of every
    doc_id % 8 == 0 document (delete_from_minhash_index — an O(delete
    batch) tombstone append, the band buckets untouched), and the odd
    ingest batch probes TWO artifacts staged from that state:

      phase 1  the tombstoned index itself — the probe's broadcast
               tombstone anti-join excludes the deleted docs;
      phase 2  a compacted sibling — compact_minhash_index physically
               purged the tombstoned rows into a fresh buckets
               generation behind the BUCKETS pointer flip.

    Both phases must emit the IDENTICAL candidate set (deletion is
    semantically a rebuild without the deleted docs, whether served
    logically or physically), which is exactly what the oracle
    replays: the dd15 band-bucket join with corpus ids % 8 != 0,
    cross-joined with the two phase tags. Builds are staged under a
    scratch path and renamed in (dd16's discipline); maintenance runs
    under the kv.maintenance_lease."""
    import os
    import shutil

    path = _lsh_index_path(sf_dir, tag="tombstone")
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    if not os.path.exists(os.path.join(path, "tomb", "meta")):
        staging = f"{path}.staging-{os.getpid()}"
        shutil.rmtree(staging, ignore_errors=True)
        tomb = os.path.join(staging, "tomb")
        D.save_minhash_index(docs.filter(F.col("doc_id") % 2 == 0),
                             tomb, n=3, num_hashes=16, bands=4)
        D.delete_from_minhash_index(
            docs.filter(F.col("doc_id") % 8 == 0).select("doc_id"),
            tomb)
        purged = os.path.join(staging, "purged")
        shutil.copytree(tomb, purged)
        D.compact_minhash_index(spark, purged)
        try:
            os.rename(staging, path)
        except OSError:
            if not os.path.exists(os.path.join(path, "tomb", "meta")):
                raise
            shutil.rmtree(staging, ignore_errors=True)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    out = None
    for phase, sub in ((1, "tomb"), (2, "purged")):
        pairs = D.probe_minhash_index(batch, os.path.join(path, sub)) \
            .select(F.lit(phase).cast("long").alias("phase"),
                    "new_id", "corpus_id")
        out = pairs if out is None else out.unionByName(pairs)
    return out.orderBy("phase", "new_id", "corpus_id")


QUERIES["dd18_index_tombstone_probe"] = dd18_index_tombstone_probe

ORACLES["dd18_index_tombstone_probe"] = _lsh_probe_sql(3, 16, 4, tail="""
        , pairs AS (
            SELECT DISTINCT n.id AS new_id, c.id AS corpus_id
            FROM stacked n JOIN stacked c
              ON n.bucket = c.bucket
            WHERE n.id % 2 = 1 AND c.id % 2 = 0 AND c.id % 8 <> 0
        )
        SELECT CAST(p.phase AS BIGINT) AS phase, new_id, corpus_id
        FROM pairs CROSS JOIN (SELECT unnest([1, 2]) AS phase) p
        ORDER BY phase, new_id, corpus_id
    """)


def st13_stream_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING takedown — the delete lifecycle driven by the real
    micro-batch engine, completing the streaming x maintenance matrix
    (st9 probes, st10 appends, st12 ANN-probes, st13 DELETES): a copy
    of the dd15 even-corpus index receives takedown requests as a FILE
    STREAM in two parquet files processed as separate micro-batches
    (doc_id % 12 == 0, then % 12 == 6 — together every % 6 == 0
    corpus doc), each batch applied via foreachBatch with
    delete_from_minhash_index — an O(batch) tombstone append under the
    maintenance lease, with an applied-batch marker so a retried
    micro-batch is a no-op (the st10 idempotency discipline; the
    tombstone anti-join additionally dedups ids, so even the residual
    at-least-once window cannot change a probe). After the stream
    drains, the odd ingest batch probes the tombstoned index; the
    DuckDB oracle replays the dd15 band-bucket join with the streamed
    takedowns excluded. Run scratch is eager-and-clean (u6)."""
    import os
    import shutil
    import tempfile

    base = _lsh_index_path(sf_dir)
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    if not os.path.exists(os.path.join(base, "meta")):
        D.save_minhash_index(docs.filter(F.col("doc_id") % 2 == 0),
                             base, n=3, num_hashes=16, bands=4)
    run = tempfile.mkdtemp(prefix="sg_st13_")
    try:
        idx = os.path.join(run, "idx")
        shutil.copytree(base, idx)
        src = os.path.join(run, "takedowns")
        # two takedown files -> two genuine micro-batches
        (docs.filter(F.col("doc_id") % 12 == 0).select("doc_id")
         .coalesce(1).write.mode("append").parquet(src))
        (docs.filter(F.col("doc_id") % 12 == 6).select("doc_id")
         .coalesce(1).write.mode("append").parquet(src))
        schema = spark.read.parquet(src).schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))

        def batch_fn(batch_df, batch_id: int) -> None:
            marker = os.path.join(run, f"applied-{batch_id}")
            if os.path.exists(marker):
                return
            D.delete_from_minhash_index(batch_df, idx)
            open(marker, "w").close()

        q = (stream.writeStream.foreachBatch(batch_fn)
             .option("checkpointLocation", os.path.join(run, "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        out = D.probe_minhash_index(
            docs.filter(F.col("doc_id") % 2 == 1), idx
        ).orderBy("new_id", "corpus_id")
        rows = out.collect()
        schema_out = out.schema
    finally:
        shutil.rmtree(run, ignore_errors=True)
    return spark.createDataFrame(rows, schema_out) \
        .orderBy("new_id", "corpus_id")


QUERIES["st13_stream_index_delete"] = st13_stream_index_delete

ORACLES["st13_stream_index_delete"] = _lsh_probe_sql(3, 16, 4, tail="""
        SELECT DISTINCT n.id AS new_id, c.id AS corpus_id
        FROM stacked n JOIN stacked c
          ON n.bucket = c.bucket
        WHERE n.id % 2 = 1 AND c.id % 2 = 0 AND c.id % 6 <> 0
        ORDER BY new_id, corpus_id
    """)
