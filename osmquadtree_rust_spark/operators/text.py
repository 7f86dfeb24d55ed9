"""Text-analysis operators for training-data pipelines.

All hot-path expressions are native Spark SQL (JVM codegen, zero Python);
the expression text is shared with the DuckDB oracles via
functions/text_sql.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text_sql as TS


def with_token_count(df: DataFrame, text: str = "text", out: str = "n_tokens") -> DataFrame:
    return df.withColumn(out, F.expr(TS.token_count_sql(text)).cast("long"))


def with_bpe_token_count(
    df: DataFrame, text: str = "text", out: str = "n_subtokens"
) -> DataFrame:
    """BPE-ish subword-unit count (regex pre-tokenizer split); JVM-side
    regexp, no Python."""
    return df.withColumn(out, F.expr(TS.bpe_token_count_sql(text, TS.SPARK)))


def with_quality_score(df: DataFrame, text: str = "text", out: str = "quality") -> DataFrame:
    """Quality score in millionths (BIGINT, cross-engine exact)."""
    return df.withColumn(out, F.expr(TS.quality_score_sql(text)).cast("long"))


def with_normalized_text(
    df: DataFrame, text: str = "text", out: str = "norm_text"
) -> DataFrame:
    """Regex-free normalization for dedup: casefold, punctuation/control
    fold, whitespace collapse, trim (text_sql.normalize_text_sql — the
    identical SQL text runs on DuckDB).  Near-exact duplicates differing
    only in case/punctuation/spacing become hash-groupBy exact duplicates
    after this projection — the standard step BEFORE exact dedup in a
    cleaning pipeline."""
    return df.withColumn(out, F.expr(TS.normalize_text_sql(text)))


def with_langid(
    df: DataFrame, text: str = "text", out: str = "en_score", threshold: int = 20000
) -> DataFrame:
    """n-gram-free language-ID heuristic: density of English marker words
    (per-million).  `lang_guess` = 'en' above threshold."""
    scored = df.withColumn(out, F.expr(TS.langid_score_sql(text)).cast("long"))
    return scored.withColumn(
        "lang_guess", F.when(F.col(out) >= threshold, F.lit("en")).otherwise(F.lit("other"))
    )


def with_fingerprint(df: DataFrame, text: str = "text", out: str = "fp") -> DataFrame:
    """64-bit-ish (60-bit) deterministic document fingerprint."""
    return df.withColumn(out, F.expr(TS.md5_prefix_int_sql(text, TS.SPARK)))


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val split: bucket = md5(salt || id) % 100.
    The industry-standard RNG-free split — stable across reruns, engines
    and cluster sizes; changing the salt re-rolls the split.  Adds
    `split` = 'train' | 'val'."""
    if "'" in salt or "\\" in salt:
        raise ValueError(f"salt {salt!r} must not contain quotes/backslashes")
    h = TS.md5_prefix_int_sql(
        f"concat('{salt}', ':', CAST({id_col} AS STRING))", TS.SPARK
    )
    return df.withColumn(
        "split",
        F.when(F.expr(f"({h}) % 100") < train_pct, F.lit("train")).otherwise(
            F.lit("val")
        ),
    )


def sample_by_hash(
    df: DataFrame,
    id_col: str = "doc_id",
    rate_ppm: int = 100000,
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic scale-safe sampling: keep rows whose salted 60-bit
    md5 hash falls below rate_ppm/1e6 of the hash space.  Unlike
    df.sample() this is reproducible across reruns, engines, partition
    counts and cluster sizes, composes with itself (a 10% sample of a 50%
    sample under different salts is an exact 5% expectation), and a
    larger rate with the same salt is a SUPERSET of a smaller one
    (nested samples — the property quota-based sampling lacks).  The
    threshold compare is pure integer math."""
    if not 0 <= rate_ppm <= 1000000:
        raise ValueError(f"rate_ppm={rate_ppm} must be in [0, 1e6]")
    if "'" in salt or "\\" in salt:
        # the salt is interpolated into a SQL string literal; quotes or
        # backslashes would corrupt the generated expression
        raise ValueError(f"salt {salt!r} must not contain quotes/backslashes")
    h = TS.md5_prefix_int_sql(
        f"concat('{salt}', ':', CAST({id_col} AS STRING))", TS.SPARK
    )
    # hash space is 2^60; keep h * 1e6 < rate_ppm * 2^60 (h < 2^60 so the
    # product stays < 2^80 — too wide for BIGINT — compare in the
    # rate-scaled space instead: h < floor(rate_ppm * 2^60 / 1e6), exact
    # because 2^60/1e6 scaling is computed once in Python integer math)
    threshold = (int(rate_ppm) * (1 << 60)) // 1000000
    return df.filter(F.expr(f"({h}) < {threshold}"))


def top_vocabulary(
    df: DataFrame, text: str = "text", k: int = 100
) -> DataFrame:
    """Top-k whitespace-token vocabulary with counts and a deterministic
    dense rank (count desc, word asc) — the vocab-building step of a
    tokenizer pipeline.  One explode + one map-side-combined count +
    TakeOrderedAndProject."""
    from pyspark.sql import Window

    words = (
        df.select(F.explode(F.split(F.col(text), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("word"))
    return (
        words.orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
    )


def token_stats_by(df: DataFrame, group: str = "source", text: str = "text") -> DataFrame:
    toks = TS.token_count_sql(text)
    return df.groupBy(group).agg(
        F.count("*").cast("long").alias("docs"),
        F.sum(F.expr(toks)).cast("long").alias("total_tokens"),
        # FLOOR-ppm: cross-engine ROUND differs at exact halves
        F.floor(F.avg(F.expr(toks)) * 1000000.0).cast("long").alias("avg_tokens_ppm"),
    )


def split_words(text):
    """Non-empty whitespace-split words as an array column — THE shared
    tokenization for every word-level operator (repetition ratio, n-gram
    shingles/dedup); their DuckDB oracles mirror this exact construction,
    so a tokenization change must happen here and in all oracles at
    once."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(col, " "), lambda w: F.length(w) > 0)


def ngram_array(words, n: int):
    """Word n-grams (joined by one space) of a words-array column; EMPTY
    array for documents shorter than n words.  sequence(1, k) is guarded
    for k < 1 — Spark's sequence STEPS DOWNWARD when stop < start (see
    bucketed_range_join), so an unguarded short doc would explode a
    descending index list.  Shared by with_repetition_ratio and
    dedup.ngram_shingles (one tokenization, one slice convention)."""
    if n < 1:
        raise ValueError(f"n={n} must be >= 1")
    k = F.greatest(F.size(words) - (n - 1), F.lit(0))
    return F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def with_repetition_ratio(
    df: DataFrame, text: str = "text", n: int = 3, out: str = "rep_ppm"
) -> DataFrame:
    """Per-document n-gram repetition ratio — the standard
    boilerplate/template quality signal: 1 - distinct_ngrams/total_ngrams
    as FLOOR-ppm (0 for documents shorter than n words).

    Pure JVM higher-order functions (split -> filter empties -> slice
    n-grams -> array_distinct); no shuffle, no Python."""
    reserved = {"__ws", "__k", "__ng", "n_ngrams", out} & set(df.columns)
    if reserved:
        raise ValueError(
            f"column(s) {sorted(reserved)} collide with "
            f"with_repetition_ratio's internal/output names"
        )
    d = df.withColumn("__ws", split_words(text)).withColumn(
        "__k", F.greatest(F.size("__ws") - (n - 1), F.lit(0))
    )
    d = d.withColumn("__ng", ngram_array(F.col("__ws"), n))
    rep = F.when(
        F.col("__k") >= 1,
        F.floor(
            (
                F.lit(1.0)
                - F.size(F.array_distinct("__ng")).cast("double")
                / F.size("__ng").cast("double")
            )
            * 1000000.0
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return d.withColumn(out, rep).withColumn(
        "n_ngrams", F.col("__k").cast("long")
    ).drop("__ws", "__k", "__ng")


def top_frac_per_group(
    df: DataFrame,
    group: str = "source",
    order: str = "quality",
    frac_ppm: int = 500000,
    id_col: str = "doc_id",
    out: str = "rk",
    salt_buckets: int = 16,
    ascending: bool = False,
) -> DataFrame:
    """Keep the best floor(n_group * frac_ppm / 1e6) rows per group — the
    percentage form of the curation cut (top_k_per_group keeps a fixed
    count; corpora usually specify "best 40% per source").

    Exact integer semantics: k_g = FLOOR(n_g * frac_ppm / 1e6) per group
    (a group smaller than 1e6/frac_ppm rows keeps nothing — the floor is
    part of the contract, mirrored by the oracle).  Skew-safe the same
    way as top_k_per_group: pass 1 ranks within (group, salt) and keeps
    per-bucket rank <= k_g (any row with global rank <= k_g ranks <= k_g
    in its own bucket), pass 2 recomputes the exact rank over the
    bounded survivors.  Group sizes come from a hash aggregate (partial
    aggregation absorbs hot groups) broadcast back — the input is
    consumed twice (counts + ranking); at scale that is two parquet
    scans, the standard trade vs materialization."""
    from pyspark.sql import Window

    if not 0 < int(frac_ppm) <= 1000000:
        raise ValueError(f"frac_ppm={frac_ppm} outside (0, 1000000]")
    if salt_buckets < 1:
        raise ValueError(f"salt_buckets={salt_buckets} must be >= 1")
    reserved = {out, "__kg", "__lrk"} & set(df.columns)
    if reserved:
        raise ValueError(f"column(s) {sorted(reserved)} already exist")
    counts = df.groupBy(group).agg(
        F.floor(F.count("*") * int(frac_ppm) / 1000000).cast("long").alias("__kg")
    )
    # null-SAFE group join: window partitioning treats NULL as a group
    # (top_k_per_group keeps NULL-group rows), so the counts join must
    # too — a plain equi-join would silently drop the whole NULL
    # partition
    cr = counts.withColumnRenamed(group, "__g")
    d = df.join(
        F.broadcast(cr), F.col(group).eqNullSafe(F.col("__g"))
    ).drop("__g")
    ordering = (
        F.col(order).asc() if ascending else F.col(order).desc(),
        F.col(id_col).asc(),
    )
    if salt_buckets > 1:
        salt = F.pmod(F.hash(F.col(id_col)), F.lit(int(salt_buckets)))
        w1 = Window.partitionBy(F.col(group), salt).orderBy(*ordering)
        d = (
            d.withColumn("__lrk", F.row_number().over(w1))
            .filter(F.col("__lrk") <= F.col("__kg"))
            .drop("__lrk")
        )
    w = Window.partitionBy(group).orderBy(*ordering)
    return (
        d.withColumn(out, F.row_number().over(w))
        .filter(F.col(out) <= F.col("__kg"))
        .drop("__kg")
    )


def chunk_documents(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    context-length splitter every training/RAG pipeline runs before
    tokenization.  Deterministic contract: chunk starts at
    0, step, 2*step, ... (step = chunk_tokens - overlap) for every
    start < n_tokens; each chunk is the space-joined slice of up to
    chunk_tokens words (the final chunks are shorter; a document
    shorter than chunk_tokens yields exactly one chunk).  Empty
    documents yield nothing.

    Pure projection + explode over the shared split_words tokenization
    (no shuffle, no Python); the slice arithmetic is identical SQL in
    the DuckDB oracle.  Returns (id, chunk_id, n_chunk_tokens,
    chunk_text)."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens={chunk_tokens} must be >= 1")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap={overlap} must be in [0, chunk_tokens={chunk_tokens})"
        )
    step = chunk_tokens - overlap
    base = df.select(F.col(id_col), split_words(text).alias("__ws"))
    return (
        base.filter(F.size("__ws") > 0)
        .withColumn(
            "__start",
            F.explode(F.expr(f"sequence(0, size(__ws) - 1, {step})")),
        )
        .select(
            F.col(id_col),
            F.expr(f"CAST(__start DIV {step} AS BIGINT)").alias("chunk_id"),
            F.expr(
                f"size(slice(__ws, __start + 1, {int(chunk_tokens)}))"
            ).cast("long").alias("n_chunk_tokens"),
            F.expr(
                f"array_join(slice(__ws, __start + 1, {int(chunk_tokens)}), ' ')"
            ).alias("chunk_text"),
        )
    )


def token_cooccurrence(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    window: int = 3,
) -> DataFrame:
    """Forward co-occurrence counts (w_a, w_b, cnt): w_b occurs 1..window
    positions after w_a within a document — the skip-gram count matrix
    feeding PMI / embedding-training pipelines.  Counts are exact
    integers; derived float scores (PMI needs log) are left to the
    caller because cross-engine log is outside this repo's determinism
    contract (see CLAUDE.md).

    Shape: positions via ONE posexplode per side, the pair space built
    by an (id, position) EQUI-join against `window` exploded offsets —
    linear in tokens*window, never a per-document quadratic theta join.
    Tokenization is the shared split_words construction."""
    if window < 1:
        raise ValueError(f"window={window} must be >= 1")
    base = df.select(F.col(id_col), split_words(text).alias("__ws"))
    left = (
        base.select(F.col(id_col), F.posexplode("__ws").alias("__pos", "w_a"))
        .withColumn("__off", F.explode(F.expr(f"sequence(1, {int(window)})")))
        .withColumn("__pos_b", F.col("__pos") + F.col("__off"))
    )
    right = base.select(
        F.col(id_col), F.posexplode("__ws").alias("__pos_b", "w_b")
    )
    return (
        left.join(right, [id_col, "__pos_b"])
        .groupBy("w_a", "w_b")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def top_k_per_group(
    df: DataFrame,
    group: str = "source",
    order: str = "quality",
    k: int = 5,
    id_col: str = "doc_id",
    out: str = "rk",
    salt_buckets: int = 16,
    ascending: bool = False,
) -> DataFrame:
    """Keep the best k rows per group (order desc — or asc with
    ascending=True, e.g. distance ranking — id asc tie-break) —
    the per-domain curation cut every corpus pipeline applies ("best N
    documents per source").

    Skew-safe two-pass form (same design language as asof_join_bucketed):
    a naive single window partitioned by `group` puts a hot source (one
    domain = 30% of a crawl) on ONE task.  Instead:

      pass 1: window over (group, salt) with salt = pmod(hash(id), S) —
              S-way parallel even for a single giant group; keep the
              per-bucket top k, so <= k*S survivors per group.
      pass 2: exact window over the survivors per group — bounded at
              k*S rows per group regardless of input skew.

    Provably identical to the single-pass result: a row with global rank
    <= k has < k rows above it overall, hence < k above it in its own
    salt bucket, so pass 1 keeps it; pass 2 then recomputes the exact
    global rank with the full tie-break.  The salt never reaches the
    output, so its hash function needs no cross-engine discipline.

    salt_buckets=1 degrades to the single-pass plan (one window)."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k={k} must be >= 1")
    if salt_buckets < 1:
        raise ValueError(f"salt_buckets={salt_buckets} must be >= 1")
    reserved = {out, "__lrk"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"column(s) {sorted(reserved)} already exist; rename them first"
        )
    ordering = (
        F.col(order).asc() if ascending else F.col(order).desc(),
        F.col(id_col).asc(),
    )
    if salt_buckets > 1:
        salt = F.pmod(F.hash(F.col(id_col)), F.lit(int(salt_buckets)))
        w1 = Window.partitionBy(F.col(group), salt).orderBy(*ordering)
        df = (
            df.withColumn("__lrk", F.row_number().over(w1))
            .filter(F.col("__lrk") <= k)
            .drop("__lrk")
        )
    w = Window.partitionBy(group).orderBy(*ordering)
    return (
        df.withColumn(out, F.row_number().over(w))
        .filter(F.col(out) <= k)
    )
