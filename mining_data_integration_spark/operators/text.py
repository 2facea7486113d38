"""Text analysis for training-data pipelines (SURVEY.md §7.4): token
counting, quality scoring, language-ID heuristic, document
fingerprinting.

Everything is built-in column expressions (split/size/filter/md5) —
JVM-side, codegen-friendly, no Python in the hot path. Ratios divide
exact integers, so results are bit-deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalize_text

# tiny embedded stopword list — enough for a ratio heuristic; a real
# pipeline would broadcast a per-language lexicon table
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def tokens(text_col: Column) -> Column:
    return F.split(normalize_text(text_col), " ")


def token_stats(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + char/word-length stats per document."""
    toks = tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.length(normalize_text(F.col(text_col))).cast("long")
        .alias("n_chars_norm"),
        # total word chars = chars − separators; exact ints
        (F.length(normalize_text(F.col(text_col))) - (F.size(toks) - 1))
        .cast("long").alias(
            "n_word_chars"
        ),
        (
            (F.length(normalize_text(F.col(text_col))) - (F.size(toks) - 1))
            .cast("double") / F.size(toks).cast("double")
        ).alias("avg_token_len"),
    )


def stopword_ratio(text_col: Column,
                   stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    toks = tokens(text_col)
    hits = F.size(F.filter(toks, lambda w: w.isin(*stopwords)))
    return hits.cast("double") / F.size(toks).cast("double")


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality: stopword ratio (fluency proxy) and lexical
    diversity (unique/total tokens), combined 50/50. The components are
    exposed so downstream filters can threshold them independently."""
    toks = tokens(F.col(text_col))
    n = F.size(toks).cast("double")
    stop_ratio = (
        F.size(F.filter(toks, lambda w: w.isin(*EN_STOPWORDS))).cast("double") / n
    )
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / n
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        uniq_ratio.alias("unique_ratio"),
        (stop_ratio * 0.5 + uniq_ratio * 0.5).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            threshold: float = 0.08) -> DataFrame:
    """N-gram-free language-ID heuristic: English-stopword hit ratio.
    Real pipelines swap in per-language lexicons / fastText; the
    engine-side shape (per-doc ratio -> argmax/threshold) is the same."""
    ratio = stopword_ratio(F.col(text_col))
    return df.select(
        F.col(id_col),
        ratio.alias("en_ratio"),
        F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("other")).alias(
            "predicted_lang"
        ),
    )


# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
# the GPT-2-style split shape (without merges); a real tokenizer would
# follow with a broadcast merge table
BPE_SPLIT = r"[a-z]+|[0-9]+|[^a-z0-9 ]"  # normalized text: only plain spaces


def regex_token_count(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Subword-ish token counting via regexp_extract_all — a stable
    proxy for LLM token budgeting (whitespace counts undercount
    punctuation-heavy text). Pure JVM regex, codegen-friendly."""
    pieces = F.expr(
        f"regexp_extract_all({text_col}_norm, '{BPE_SPLIT}', 0)")
    out = df.withColumn(f"{text_col}_norm", normalize_text(F.col(text_col)))
    return out.select(
        F.col(id_col),
        F.size(pieces).cast("long").alias("n_pieces"),
        F.size(F.array_distinct(pieces)).cast("long").alias("n_unique_pieces"),
        F.size(F.split(F.col(f"{text_col}_norm"), " ")).cast("long")
        .alias("n_whitespace"),
    )


ROLL_BASE = 31
ROLL_MOD = 2_147_483_647  # 2^31 - 1 (Mersenne; acc*31+c < 2^63)


def rolling_hash(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Polynomial rolling hash (Rabin-Karp) of the normalized text:
    H = sum(c_i * B^(n-i)) mod M, folded left to right with exact
    integer arithmetic — the incremental-fingerprint primitive used
    for content-defined chunking at scale. aggregate() keeps the fold
    JVM-side and deterministic."""
    chars = F.split(normalize_text(F.col(text_col)), "")
    h = F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * ROLL_BASE + F.ascii(c)) % ROLL_MOD,
    )
    return df.select(F.col(id_col), h.alias("roll_hash"))


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", shards: int = 16) -> DataFrame:
    """Content fingerprint (md5 of normalized text) + shard bucket from
    the first hex digit — the partitioning key a 100 TB dedup job
    would repartition on."""
    fp = F.md5(normalize_text(F.col(text_col)))
    return df.select(
        F.col(id_col),
        fp.alias("fingerprint"),
        (F.instr(F.lit("0123456789abcdef"), F.substring(fp, 1, 1)) - 1)
        .cast("long").alias(
            "shard"
        ),
    )


# (name, pattern, replacement) — patterns restricted to syntax with
# identical semantics in Java regex (Spark) and RE2 (DuckDB): character
# classes, +, bounded repeats; no lookaround, no backrefs
PII_PATTERNS = (
    ("emails", "[a-z0-9]+@[a-z0-9]+\\.[a-z]+", "<EMAIL>"),
    ("phones", "[0-9]{3}-[0-9]{4}", "<PHONE>"),
)


def pii_scrub(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id",
              patterns: tuple = PII_PATTERNS) -> DataFrame:
    """PII redaction for a training corpus: count and replace every
    match of each pattern (emails, phone numbers — extend the table
    for SSNs/IPs/keys). Pure JVM regex in one projection — map-side
    only, no shuffle, no Python at any scale; the counts make the
    redaction auditable (sum(n_*) over the corpus = total redactions)."""
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        .cast("long").alias(f"n_{name}")
        for name, pat, _ in patterns
    ]
    scrubbed = F.col(text_col)
    for _, pat, repl in patterns:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.select(F.col(id_col), *counts, scrubbed.alias("scrubbed"))


def repetition_metrics(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 2,
                       max_top_frac: float = 0.20,
                       max_dup_frac: float = 0.60) -> DataFrame:
    """Gopher-style repetition quality metrics (Rae et al. 2021 §A1.1):
    per document, the fraction of word n-gram occurrences taken by the
    single most frequent n-gram (top_gram_frac) and the fraction that
    are occurrences of any repeated n-gram (dup_gram_frac), plus a
    keep flag under the given thresholds. Boilerplate / spam /
    degenerate-repetition filtering for a pre-training corpus.

    Scale shape: explode occurrences -> count per (doc, gram) ->
    per-doc rollup. Both shuffles are keyed by doc id (the second is a
    sub-key rollup of the first) and map-side combine applies, so the
    shuffled volume is bounded by distinct (doc, gram) pairs, not
    occurrences. Docs with fewer than n words emit no grams and drop
    out (they have no repetition signal; length filters own them).
    All ratios are exact-integer divisions — oracle-checkable."""
    from .dedup import gram_array

    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(gram_array(tokens(F.col(text_col)), n)).alias("gram"),
    )
    counts = grams.groupBy("id", "gram").agg(F.count("*").alias("cnt"))
    agg = counts.groupBy("id").agg(
        F.sum("cnt").alias("n_grams"),
        F.max("cnt").alias("top_cnt"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0)))
        .alias("dup_cnt"),
    )
    top_frac = F.col("top_cnt").cast("double") / F.col("n_grams").cast("double")
    dup_frac = F.col("dup_cnt").cast("double") / F.col("n_grams").cast("double")
    return agg.select(
        F.col("id"),
        F.col("n_grams").cast("long").alias("n_grams"),
        top_frac.alias("top_gram_frac"),
        dup_frac.alias("dup_gram_frac"),
        ((top_frac <= max_top_frac) & (dup_frac <= max_dup_frac))
        .alias("keep"),
    )


def tf_rarity_topk(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Top-k most characteristic terms per document, scored
    tf * (N+1) / (df+1) — TF x inverse document-frequency RATIO.

    Linear IDF rather than log on purpose: every input is an exact
    integer < 2^53 and the single IEEE division is correctly rounded,
    so scores AND rankings are bit-identical across engines; ln() can
    differ in the last ulp between libm implementations and flip a
    near-tie ranking. Two shuffles (doc-term counts, term doc-freq)
    plus a broadcast scalar N — no corpus-wide window."""
    toks = tokens(F.col(text_col))
    terms = df.select(F.col(id_col).alias("id"), F.explode(toks).alias("term"))
    tf = terms.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = df.select(F.count_distinct(F.col(id_col)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term").crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            (F.col("tf") * (F.col("n_docs") + 1)).cast("double")
            / (F.col("df") + 1))
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("id", "term", "tf", "df", "score", "rk")
    )


def boilerplate_scrub(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 3,
                      min_df: int = 5) -> DataFrame:
    """C4-style boilerplate span removal: word n-grams appearing in >=
    min_df distinct documents are boilerplate (navigation chrome,
    license footers, cookie banners); every token position covered by
    a boilerplate gram occurrence is dropped and the document is
    reassembled from the surviving tokens in order.

    Shuffle shape at 100 TB: document frequency is one combinable
    aggregate keyed by gram (count-distinct over doc ids); the
    boilerplate set is tiny relative to the corpus (df >= min_df caps
    its cardinality at total_grams / min_df) so the flagging join
    broadcasts under AQE; covered-position explosion is bounded by n x
    gram occurrences; reassembly is one groupBy(doc) with the order
    carried in the rows (no global sort). The frequent grams are
    exactly the keys a skew-naive design would hot-spot on — here they
    only ever appear on the BUILD side of the flagging join, never as
    a shuffle key of the big side.

    Output: (doc_id, n_tokens, n_kept, cleaned_hash) — the hash stands
    in for the cleaned text so the row stays narrow; swap the final
    projection to emit the text itself in a real pipeline."""
    from .dedup import gram_array, normalize_text

    words = F.split(normalize_text(F.col(text_col)), " ")
    base = df.select(F.col(id_col).alias("id"), words.alias("words"))

    grams = base.select(
        "id", F.posexplode(gram_array(F.col("words"), n))
    ).withColumnRenamed("pos", "gpos").withColumnRenamed("col", "gram")
    boiler = (
        grams.groupBy("gram")
        .agg(F.countDistinct("id").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("gram")
    )
    covered = (
        grams.join(boiler, "gram")
        .select("id", F.explode(
            F.sequence(F.col("gpos"), F.col("gpos") + F.lit(n - 1))
        ).alias("pos"))
        .distinct()
    )
    toks = base.selectExpr("id", "posexplode(words) AS (pos, word)")
    kept = toks.join(covered, ["id", "pos"], "left_anti")
    cleaned = (
        kept.groupBy("id")
        .agg(F.count("*").alias("n_kept"),
             F.array_sort(F.collect_list(F.struct("pos", "word"))).alias("a"))
        .select("id", "n_kept",
                F.concat_ws(" ", F.expr("transform(a, x -> x.word)"))
                .alias("cleaned"))
    )
    return (
        base.select("id", F.size("words").alias("n_tokens"))
        .join(cleaned, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long")
            .alias("n_kept"),
            F.md5(F.coalesce(F.col("cleaned"), F.lit("")))
            .alias("cleaned_hash"),
        )
    )


def gopher_filter(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Gopher-rules document quality gate (Rae et al. 2021 §A1.1),
    combined into one keep/drop verdict with a REASON BITMASK so the
    pipeline can report per-rule drop rates, not just a survivor count:

      bit 1  word count outside [50, 100000]
      bit 2  mean word length outside [3, 10]
      bit 4  fewer than 2 distinct stopwords (fluency proxy)
      bit 8  top bigram takes > 20% of bigram occurrences
      bit 16 repeated bigrams take > 30% of bigram occurrences

    Every rule is evaluated in exact integer arithmetic (means and
    fractions cross-multiplied: 3n <= chars <= 10n, 5*top <= n_grams),
    so verdicts are bit-identical across engines and plans. Docs with
    fewer than 2 words have no bigram signal — bits 8/16 stay 0 and the
    length rule owns them.

    Scale shape: the token-level rules are pure map-side expressions;
    the bigram rules reuse the repetition_metrics shuffle pair (doc-gram
    counts -> per-doc rollup, both keyed on doc id, map-side combined).
    """
    from .dedup import gram_array

    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.aggregate(F.transform(toks, F.length),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("word_chars"),
        F.size(F.array_distinct(
            F.filter(toks, lambda w: w.isin(*EN_STOPWORDS))))
        .cast("long").alias("n_stop"),
    )
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(gram_array(tokens(F.col(text_col)), 2)).alias("gram"),
    )
    counts = grams.groupBy("id", "gram").agg(F.count("*").alias("cnt"))
    gstats = counts.groupBy("id").agg(
        F.sum("cnt").alias("n_grams"),
        F.max("cnt").alias("top_cnt"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0)))
        .alias("dup_cnt"),
    )
    j = base.join(gstats, "id", "left")
    n, wc = F.col("n_tokens"), F.col("word_chars")
    bit = lambda cond, v: F.when(cond, F.lit(v)).otherwise(F.lit(0))
    reasons = (
        bit((n < 50) | (n > 100000), 1)
        + bit((wc < 3 * n) | (wc > 10 * n), 2)
        + bit(F.col("n_stop") < 2, 4)
        + bit(F.coalesce(5 * F.col("top_cnt") > F.col("n_grams"),
                         F.lit(False)), 8)
        + bit(F.coalesce(10 * F.col("dup_cnt") > 3 * F.col("n_grams"),
                         F.lit(False)), 16)
    )
    return j.select(
        F.col("id").alias(id_col),
        "n_tokens",
        reasons.cast("int").alias("reasons"),
        F.when(reasons == 0, F.lit(1)).otherwise(F.lit(0)).cast("int")
        .alias("keep"),
    )


# --- BPE merge learning (Sennrich et al. 2016) ------------------------------

BPE_SEP = "\x1f"  # segmentation separator; never occurs in normalized text


def _bpe_pairs(words: DataFrame) -> DataFrame:
    """Adjacent symbol pairs of each word's current segmentation,
    weighted by word frequency: (l, r, pf)."""
    syms = F.split(F.col("seg"), BPE_SEP)
    shifted = F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0)))
    z = F.zip_with(
        syms, shifted,
        lambda x, y: F.struct(x.alias("l"), y.alias("r")))
    return (
        words.select("freq", F.explode(z).alias("p"))
        .filter(F.col("p.r").isNotNull())
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("pf"))
    )


def _bpe_apply(seg_col: Column, left: str, right: str) -> Column:
    """Left-to-right greedy merge of adjacent (left, right) symbols —
    standard BPE application order ('aaa' + (a,a) -> [aa, a]). A fold
    over the symbol list: when the accumulated segmentation ends with
    the `left` symbol (exactly — the separator guard rejects suffixes
    like 'xa' for left='a') and the next symbol is `right`, append
    `right` WITHOUT a separator, fusing the pair; the fused token
    l||r can never re-match `left`, which is what makes the single
    pass greedy-correct. DuckDB replays the identical fold via
    list_reduce (same acc-starts-at-first-element semantics as the
    slice+element_at form here)."""
    syms = F.split(seg_col, BPE_SEP)
    rest = F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0)))

    def step(acc: Column, x: Column) -> Column:
        hit = (
            (acc == F.lit(left)) | acc.endswith(F.lit(BPE_SEP + left))
        ) & (x == F.lit(right))
        return (F.when(hit, F.concat(acc, x))
                .otherwise(F.concat(acc, F.lit(BPE_SEP), x)))

    return F.aggregate(rest, F.element_at(syms, 1), step)


def bpe_merges(df: DataFrame, n_merges: int, text_col: str = "text"):
    """Learn the first `n_merges` BPE merge rules from a corpus:
    per iteration, the globally most frequent adjacent symbol pair
    (ties broken lexicographically) is fused in every word's
    segmentation. Returns the merge table rows
    [(iteration, left_sym, right_sym, pair_freq), ...] — the
    tokenizer-training artifact.

    Scale shape: learning runs over the DISTINCT-word table with
    frequencies (vocab-bounded — millions of rows at web scale, not
    the corpus), so each iteration is one map-side pair explode +
    one combinable groupBy(pair); the argmax collect is 1 row per
    iteration (k bounded driver rows total, like sim11's k-means
    seeds). Each iteration nests one more fold into the segmentation
    expression — for large n_merges, localCheckpoint() the word table
    every ~16 iterations to cap plan depth."""
    out, _ = bpe_learn(df, n_merges, text_col)
    return out


def bpe_learn(df: DataFrame, n_merges: int, text_col: str = "text"):
    """bpe_merges plus the trained tokenizer itself: returns
    (merge_rows, words) where `words` is the distinct-word table with
    the FINAL segmentation after all merges — the artifact tx19's
    encode step joins against (vocab-keyed, so encoding a corpus is
    one explode + one unique-keyed join, never per-doc merge loops)."""
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("word"))
    words = (
        toks.groupBy("word").agg(F.count("*").alias("freq"))
        .withColumn("seg", F.concat_ws(BPE_SEP, F.split(F.col("word"), "")))
    )
    out = []
    for it in range(1, n_merges + 1):
        best = (
            _bpe_pairs(words)
            .orderBy(F.desc("pf"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, pf = best[0].l, best[0].r, int(best[0].pf)
        out.append((it, l, r, pf))
        words = words.withColumn("seg", _bpe_apply(F.col("seg"), l, r))
    return out, words


def surprisal_score(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Exact-integer unigram-LM surprisal score per document — the
    perplexity-proxy quality signal (a cheap stand-in for a KenLM
    filter: low mean surprisal ~ common/templated text, high ~ rare
    or noisy text).

    Per token w: surprisal(w) = floor(log2(N / df(w))) where N is the
    corpus document count and df the token's document frequency —
    computed WITHOUT floating log as length(bin(N div df)) - 1, exact
    for any bigint and immune to libm last-ulp drift (the tf_rarity
    rationale, one step further: not even a float division). Per doc:
    the occurrence-weighted sum, plus a HALF_UP milli-unit mean in
    pure integer arithmetic ((2000*S + n) div (2n), the w12 pattern).

    Scale shape: two combinable keyed shuffles (doc-term tf, term df)
    + one broadcast scalar N + one doc-keyed regroup — no corpus-wide
    window, no skewed key (the term join is vocab-keyed; stop-words
    are the heavy hitters but their df rows are 1-per-term after the
    df agg, so the join side is unique-keyed)."""
    toks = tokens(F.col(text_col))
    terms = df.select(F.col(id_col).alias("id"),
                      F.explode(toks).alias("term"))
    tf = terms.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = df.select(F.count_distinct(F.col(id_col)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term").crossJoin(F.broadcast(n))
        .withColumn(
            "surp",
            (F.length(F.bin(F.expr("n_docs DIV df"))) - 1).cast("long"))
    )
    per_doc = scored.groupBy("id").agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.sum(F.col("tf") * F.col("surp")).cast("long")
        .alias("sum_surprisal"),
    )
    return per_doc.select(
        F.col("id").alias(id_col),
        "n_tokens",
        "sum_surprisal",
        F.expr("(2000 * sum_surprisal + n_tokens) DIV (2 * n_tokens)")
        .cast("long").alias("mean_surprisal_milli"),
    )


# (mojibake, fix) pairs: UTF-8 bytes mis-decoded as Latin-1/cp1252 —
# the classic double-encoding corruption a web crawl accumulates.
MOJIBAKE_FIXES = (
    ("Ã©", "é"),          # Ã©  -> é
    ("Ã¨", "è"),          # Ã¨  -> è
    ("Ã¼", "ü"),          # Ã¼  -> ü
    ("â€™", "'"),         # â€™ -> '
    ("â€œ", '"'),         # â€œ -> "
)


def mojibake_repair(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Encoding-corruption repair (ftfy's core case, dependency-free):
    rewrite UTF-8-mis-decoded-as-Latin-1 sequences back to the intended
    characters, counting fixes per document. Pure chained replace()
    column expressions — whole-stage codegen, zero shuffle, and both
    engines count fix occurrences as exact character arithmetic
    ((len - len_without) / len(pattern)), so the repaired text's md5
    is hash-checkable."""
    c = F.col(text_col)
    n_fixes = F.lit(0).cast("long")
    fixed = c
    for pat, rep in MOJIBAKE_FIXES:
        n_fixes = n_fixes + (
            (F.length(c) - F.length(F.replace(c, F.lit(pat), F.lit(""))))
            / F.lit(len(pat))
        ).cast("long")
        fixed = F.replace(fixed, F.lit(pat), F.lit(rep))
    return df.select(
        F.col(id_col),
        n_fixes.alias("n_fixes"),
        F.length(fixed).cast("long").alias("fixed_len"),
        F.md5(fixed).alias("fixed_hash"),
    )


def bigram_surprisal_score(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Exact-integer BIGRAM conditional surprisal per document — the
    next LM-quality rung above the unigram surprisal_score: per
    bigram (w1 w2), surprisal(w2|w1) = floor(log2(c(w1) / c(w1 w2)))
    — how unpredictable the continuation is given its left context,
    the cheap stand-in for a KenLM bigram filter (templated text
    scores near zero, noisy or shuffled text scores high even when
    its UNIGRAMS are common, which is exactly the failure mode the
    unigram score cannot see). Computed with no float log and no
    float division: the quotient is integer DIV (c(w1) >= c(w1 w2)
    always, since every bigram occurrence contains a w1 occurrence)
    and the log is length(bin(q)) - 1 — the tx15 discipline. Per doc:
    the occurrence-weighted sum over its bigrams plus the HALF_UP
    milli-unit mean ((2000*S + n) DIV (2n)); docs with fewer than two
    tokens carry no bigram and drop out (the tx15 convention).

    Scale shape: three combinable keyed shuffles (doc-bigram tf,
    corpus bigram counts, corpus unigram counts) + two vocab-keyed
    joins (both count tables are unique-keyed after aggregation, so
    stop-bigram heavy hitters hit a 1-row build side) + one doc-keyed
    regroup — no corpus-wide window."""
    from .dedup import gram_array

    base = df.select(F.col(id_col).alias("id"),
                     tokens(F.col(text_col)).alias("_t"))
    uni = (base.select(F.explode("_t").alias("w1"))
           .groupBy("w1").agg(F.count("*").alias("c1")))
    docbg = (base.select("id",
                         F.explode(gram_array(F.col("_t"), 2))
                         .alias("bg"))
             .groupBy("id", "bg").agg(F.count("*").alias("tf")))
    cbg = docbg.groupBy("bg").agg(F.sum("tf").cast("long").alias("c2"))
    scored = (
        docbg.join(cbg, "bg")
        .withColumn("w1", F.split("bg", " ").getItem(0))
        .join(uni, "w1")
        .withColumn(
            "surp",
            (F.length(F.bin(F.expr("c1 DIV c2"))) - 1).cast("long"))
    )
    per_doc = scored.groupBy("id").agg(
        F.sum("tf").cast("long").alias("n_bigrams"),
        F.sum(F.col("tf") * F.col("surp")).cast("long")
        .alias("sum_surprisal"),
    )
    return per_doc.select(
        F.col("id").alias(id_col),
        "n_bigrams",
        "sum_surprisal",
        F.expr("(2000 * sum_surprisal + n_bigrams) "
               "DIV (2 * n_bigrams)").cast("long")
        .alias("mean_surprisal_milli"),
    )
