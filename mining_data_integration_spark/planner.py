"""DataFrame-level plan rewriting — the SURVEY §4 extension surface.

The one custom-Catalyst candidate SURVEY names (§4: "a custom rule
becomes attractive only for the §7 extension ops (e.g., rewriting
similarity-search top-k into LSH-pruned joins)") is implemented here.
Registering a real Catalyst rule needs JVM classes —
`SparkSessionExtensions.injectOptimizerRule` takes a Scala
`Rule[LogicalPlan]` and `spark.sql.extensions` a JVM class name — so a
pure-PySpark engine implements the rewrite at the layer Python owns:
the caller states the LOGICAL intent (cosine top-k over a corpus) plus
the optimizer inputs a CBO rule would read (row-count stats, an
opt-in), and `plan_cosine_topk` performs the same
pattern-match-and-rewrite a rule would, returning the chosen physical
shape:

  before  (brute force):   crossJoin(broadcast(Q))
                           -> BroadcastNestedLoopJoin, N x Q pairs
  after   (LSH-pruned):    equi-join on the LSH bucket key
                           -> BroadcastHashJoin, collision pairs only

Both shapes are pinned in tests/test_plans.py (the before/after plan
assertions).

Unlike a Catalyst rewrite, this one is APPROXIMATION-INTRODUCING: the
pruned join scores only same-bucket candidates, so recall < 1 is
possible. A semantics-preserving optimizer may fire silently; this one
must not — it fires only when the caller passes `approx_ok=True`, the
same explicit contract the verdict-gated ANN queries (sim2/sim4/sim9)
expose to their oracles. The second gate mirrors CBO: the rewrite only
pays above `min_corpus_rows`, and row stats are a caller-supplied
input (table-catalog stats at fleet scale), never a planning-time
count job — when stats are absent the planner stays conservative and
keeps the exact plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .operators import similarity as S

# below this, N x Q is cheap enough that pruning buys nothing but
# recall risk — the same magnitude at which AQE would happily BNLJ
COSINE_TOPK_REWRITE_MIN_ROWS = 1_000_000


def plan_cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
                     *, approx_ok: bool = False,
                     corpus_rows: int | None = None,
                     min_corpus_rows: int = COSINE_TOPK_REWRITE_MIN_ROWS,
                     num_planes: int = 8, dim: int = 64,
                     multi_probe: bool = False,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     q_id_col: str = "q_id", q_vec_col: str = "q_emb",
                     ) -> tuple[DataFrame, str]:
    """Plan a cosine top-k: returns (result DataFrame, strategy) with
    strategy one of 'bruteforce' | 'lsh_pruned', so callers and plan
    tests can see which rewrite fired. The rewrite fires iff BOTH
    gates pass: the caller opted into approximation (approx_ok) AND
    the supplied corpus stats clear min_corpus_rows — absent stats
    (corpus_rows=None) the planner is conservative and keeps the
    exact BroadcastNestedLoopJoin shape, exactly as a CBO rule
    declines to fire without statistics."""
    if approx_ok and corpus_rows is not None \
            and corpus_rows >= min_corpus_rows:
        out = S.ann_lsh_topk(
            emb, queries, k=k, num_planes=num_planes, dim=dim,
            multi_probe=multi_probe, id_col=id_col, vec_col=vec_col,
            q_id_col=q_id_col, q_vec_col=q_vec_col)
        return out, "lsh_pruned"
    out = S.brute_force_topk(
        emb, queries, k=k, id_col=id_col, vec_col=vec_col,
        q_id_col=q_id_col, q_vec_col=q_vec_col, assume_small_q=True)
    return out, "bruteforce"
