"""Distributed BPE merge learning — the tokenizer-training step every
pretraining pipeline runs once per corpus.

Classic byte-pair encoding trains on the WORD-FREQUENCY table, not the
corpus: extract lowercase-alpha words (functions/text_sql.
bpe_word_extract_sql), aggregate (word -> count) once, and every merge
round after that touches only the vocabulary — at 100 TB the vocabulary
is millions of rows where the corpus is trillions, so the per-round cost
is vocabulary-sized regardless of corpus size.

Each round is one aggregate + one driver argmax + one projection:

  1. explode adjacent symbol pairs of every spaced word, weight by word
     count, aggregate (left, right) -> sum — map-side combinable, no
     sort;
  2. the best pair (count DESC, then left, right — a total, deterministic
     order: symbols are [a-z]+ so byte order == lexicographic on both
     engines) comes to the driver via TakeOrdered(1);
  3. apply the merge with plain replace() over the DOUBLE-spaced symbol
     string (text_sql.bpe_merge_apply_sql): the pair pattern is bounded
     by the inner spaces of the double separators, so replace()'s
     left-to-right non-overlapping scan reproduces classic BPE's merge
     order exactly, including same-symbol runs (seeded-net-pinned
     against a pure-python classic BPE in tests/test_round7.py).

Per-round lineage is truncated with an eager localCheckpoint and the
previous generation unpersisted — the pagerank/connected_components
discipline (operators/graph.py): constant plan depth, no Catalyst
blow-up at high merge counts.

The whole procedure is integer/string-exact, so the DuckDB gate oracle
unrolls the same rounds as MATERIALIZED CTE stages (gate_text.py
`bpe_merges`) and the result is bit-identical.  No reference-repo
counterpart: this is an LLM-pipeline extension (SURVEY §2 'beyond the
reference' family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text_sql as TS

_PAIRS_EXPR = (
    "transform(sequence(0, size(__sy) - 2), "
    "i -> struct(__sy[i] AS l, __sy[i+1] AS r))"
)


def _spaced_words(docs: DataFrame, text: str) -> DataFrame:
    """(__s, __c): the spaced-symbol word-frequency table."""
    wx = TS.bpe_word_extract_sql(text, TS.SPARK)
    return (
        docs.select(F.explode(F.expr(wx)).alias("__w"))
        .groupBy("__w")
        .agg(F.count("*").alias("__c"))
        .select(
            F.expr(TS.bpe_spaced_sql("__w", TS.SPARK)).alias("__s"), "__c"
        )
    )


def learn_bpe_merges(
    docs: DataFrame, n_merges: int, text: str = "text"
) -> DataFrame:
    """Learn up to `n_merges` BPE merges over the corpus' lowercase-alpha
    words.  Returns a small DataFrame (rk, left, right, pair_count):
    merge #rk (1-based) joined symbols `left`+`right`, which co-occurred
    adjacently `pair_count` times (weighted by word frequency) at the
    time it was learned.  Stops early when no adjacent pair remains
    (every word fully merged).  Deterministic: ties break on
    (left, right) lexicographic."""
    if n_merges < 1:
        raise ValueError(f"n_merges={n_merges} must be >= 1")
    spark = docs.sparkSession
    cur = _spaced_words(docs, text).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    syms = "filter(split(__s, ' '), x -> length(x) > 0)"
    for rk in range(1, int(n_merges) + 1):
        pairs = (
            cur.select(F.expr(syms).alias("__sy"), "__c")
            .filter(F.size("__sy") >= 2)
            .select(F.explode(F.expr(_PAIRS_EXPR)).alias("__p"), "__c")
            .groupBy(F.col("__p.l").alias("l"), F.col("__p.r").alias("r"))
            .agg(F.sum("__c").alias("cnt"))
        )
        best = pairs.orderBy(F.col("cnt").desc(), "l", "r").limit(1).collect()
        if not best:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((rk, l, r, cnt))
        nxt = cur.select(
            F.expr(TS.bpe_merge_apply_sql("__s", f"'{l}'", f"'{r}'")).alias(
                "__s"
            ),
            "__c",
        ).localCheckpoint(eager=True)
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    return spark.createDataFrame(
        merges, "rk long, left string, right string, pair_count long"
    )


def apply_bpe_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text: str = "text",
    id_col: str = "doc_id",
    out: str = "n_bpe_tokens",
) -> DataFrame:
    """Per-document token count under a learned merge table: words are
    re-extracted, each spaced word gets ALL merges applied in learned
    order (one projection of chained replace() calls — K merges is K
    string functions, JVM codegen, no Python), and symbols are counted
    by arithmetic.  `merges` is [(left, right), ...] in merge order
    (pass [(r.left, r.right) for r in learn_bpe_merges(...).collect()]).
    Documents with no [a-z]+ words count 0."""
    wx = TS.bpe_word_extract_sql(text, TS.SPARK)
    s = TS.bpe_spaced_sql("__w", TS.SPARK)
    for l, r in merges:
        s = TS.bpe_merge_apply_sql(s, f"'{l}'", f"'{r}'")
    n = TS.spaced_symbol_count_sql(s, TS.SPARK)
    per_word = docs.select(
        F.col(id_col), F.explode(F.expr(wx)).alias("__w")
    ).select(id_col, F.expr(n).cast("long").alias("__n"))
    counts = per_word.groupBy(id_col).agg(F.sum("__n").alias(out))
    return docs.join(counts, id_col, "left").withColumn(
        out, F.coalesce(F.col(out), F.lit(0).cast("long"))
    )
