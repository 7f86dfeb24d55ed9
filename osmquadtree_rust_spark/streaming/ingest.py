"""Streaming ingest of change files (Structured Streaming).

The reference polls a replication endpoint and applies .osc.gz diffs in a
driver loop (src/update/run_update.rs:51-164).  The Spark-native shape is
a file-source stream: change files land in a directory, each micro-batch
applies the merge (latest-wins + Delete/Remove drop) against the current
snapshot via foreachBatch — exactly-once per file via the stream
checkpoint, late/duplicate versions handled by the max-version dedup
(read_xml.rs:554-591 ≙ dedup_max_version).

Also provides the generic watermarked windowed aggregation for event
streams (no analog in the reference, which has no streaming runtime —
SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import dedup_max_version


def stream_change_files(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    checkpoint_dir: str,
    on_batch,
):
    """File-source stream over change parquet files; `on_batch(df, epoch)`
    applies each micro-batch (typically a MERGE against the snapshot
    store).  Runs with availableNow so callers control the drain."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    q = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return q


def apply_change_batch(
    snapshot_path: str,
    keys: tuple[str, ...] = ("id",),
    version_col: str = "version",
):
    """Build a foreachBatch function that folds each change micro-batch
    into the parquet snapshot at `snapshot_path` (latest-wins by version,
    Delete/Remove drop)."""
    from ..operators import merge as M

    def on_batch(batch: DataFrame, epoch_id: int):
        spark = batch.sparkSession
        deduped = dedup_max_version(batch, keys, version_col)
        import os

        if os.path.exists(snapshot_path):
            base = spark.read.parquet(snapshot_path)
            merged = M.apply_changes(base, deduped, keys)
        else:
            merged = deduped.filter(
                ~F.col("changetype").isin(M.DELETE, M.REMOVE)
            ).withColumn("changetype", F.lit(M.NORMAL))
        # write to a new snapshot dir then swap (parquet has no MERGE)
        tmp = snapshot_path + f".epoch{epoch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        import shutil

        if os.path.exists(snapshot_path):
            shutil.rmtree(snapshot_path)
        os.rename(tmp, snapshot_path)

    return on_batch


# ---------------------------------------------------------------------------
# replication-state sequence tracking (reference src/update/run_update.rs:
# 51-164: poll state.txt {sequenceNumber, timestamp}, fetch every diff from
# local_sequence+1 .. remote_sequence, apply strictly in sequence order,
# advance local state after each).  No network exists in this sandbox, so
# the "remote" is a directory of {seq:09d}.parquet diff files with optional
# {seq:09d}.state.txt sidecars — the protocol (ordering, resume, catch-up
# after missed sequences) is the same.
# ---------------------------------------------------------------------------


def read_state(path: str) -> dict | None:
    """Parse a state.txt analog: 'sequenceNumber=N' / 'timestamp=T' lines
    (the reference's osm.org replication state format)."""
    import os

    if not os.path.exists(path):
        return None
    out: dict = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if "=" in line and not line.startswith("#"):
                k, v = line.split("=", 1)
                out[k] = v
    return {
        "sequence": int(out.get("sequenceNumber", -1)),
        "timestamp": int(out.get("timestamp", 0)),
    }


def write_state(path: str, sequence: int, timestamp: int = 0) -> None:
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(f"sequenceNumber={int(sequence)}\ntimestamp={int(timestamp)}\n")
    os.replace(tmp, path)  # atomic: a crash never leaves a torn state file


def pending_sequences(state_path: str, remote_dir: str) -> list[int]:
    """Sequences ready to apply, ascending and GAP-FREE: starting from
    local_sequence+1 (or the smallest available sequence when no state
    exists yet), stop at the first missing sequence — applying past a gap
    would advance the state beyond it and lose the diff forever (the
    reference contract is 'every diff from local+1 .. remote, strictly in
    order', run_update.rs:51-164).  Replication publishes sequences
    strictly in order, so a missing local+1 with NOTHING later available
    means we are current ([]); a missing local+1 with LATER sequences
    present means it was pruned from the remote and can never arrive —
    that raises instead of returning [], which would be indistinguishable
    from 'caught up' and stall the daemon silently forever."""
    import glob
    import os
    import re

    st = read_state(state_path)
    local = st["sequence"] if st else -1
    avail = set()
    for f in glob.glob(os.path.join(remote_dir, "*.parquet")):
        m = re.fullmatch(r"(\d+)\.parquet", os.path.basename(f))
        if m and int(m.group(1)) > local:
            avail.add(int(m.group(1)))
    if not avail:
        return []
    if local >= 0 and min(avail) > local + 1:
        # unrecoverable: the next needed diff has been pruned from the
        # remote (min available is already past it).  This must NOT look
        # like "caught up" — silently returning [] would stall the daemon
        # forever while it believes it is current.  (A missing local+1
        # with nothing later available is the normal in-flight case and
        # still returns [].)
        raise ValueError(
            f"replication gap: need sequence {local + 1} but remote "
            f"starts at {min(avail)} — re-baseline from a snapshot"
        )
    seqs = []
    nxt = local + 1 if local >= 0 else min(avail)
    while nxt in avail:
        seqs.append(nxt)
        nxt += 1
    return seqs


def catch_up(
    spark: SparkSession,
    remote_dir: str,
    state_path: str,
    on_batch,
) -> list[int]:
    """Apply every pending diff strictly in sequence order, advancing the
    local state file after EACH diff — a crash mid-catch-up resumes from
    the first unapplied sequence (the reference's run_update loop
    contract).  Returns the sequences applied."""
    import os

    applied = []
    for seq in pending_sequences(state_path, remote_dir):
        df = spark.read.parquet(os.path.join(remote_dir, f"{seq:09d}.parquet"))
        on_batch(df, seq)
        side = os.path.join(remote_dir, f"{seq:09d}.state.txt")
        ts = (read_state(side) or {}).get("timestamp", 0)
        write_state(state_path, seq, ts)
        applied.append(seq)
    return applied


def commit_change_snapshot(
    store_base: str,
    tile_col: str = "tile",
    sort_cols: tuple[str, ...] = ("id",),
    n_batches: int = 4,
):
    """Build an `on_batch` for `catch_up` that commits each replication
    diff as a change snapshot of the tile store and registers it in the
    filelist — composing sequence tracking with the snapshot log is the
    reference's run_update daemon loop (run_update.rs:201-354: poll state
    -> apply diff -> write change tiles -> register in filelist).

    The replication sequence number doubles as the filelist timestamp
    (replication sequences ARE the store's logical clock), so
    read_snapshot_as_of(seq) shows the world after that diff and
    read_changes_between(s1, s2) is exactly the diffs in (s1, s2].

    Crash safety composes from the pieces: the snapshot write is
    batch-resumable (write_tiles_checkpointed skips committed batches),
    the filelist append is idempotent per snapshot (a crash between
    filelist commit and state-file advance must not double-register on
    replay), and catch_up only advances the sequence state AFTER
    on_batch returns."""
    from ..plans import checkpoint as CK

    def on_batch(df: DataFrame, seq: int):
        snap = f"seq{seq}"
        CK.write_tiles_checkpointed(
            df,
            store_base,
            snap,
            tile_col=tile_col,
            sort_cols=sort_cols,
            n_batches=n_batches,
        )
        if not any(e["snapshot"] == snap for e in CK.read_filelist(store_base)):
            CK.append_filelist(store_base, snap, timestamp=seq, kind="change")

    return on_batch


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_col: str | None = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window counts — the standard late-data-safe
    streaming aggregation; works on both static and streaming frames."""
    groups = [F.window(F.col(ts_col), window)]
    if group_col:
        groups.append(F.col(group_col))
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(*groups)
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            *( [F.col(group_col)] if group_col else [] ),
            "n",
            F.round("total_value", 4).alias("total_value"),
        )
    )


def stream_dedup_exact(
    events: DataFrame,
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup for ingestion pipelines: drop rows whose id
    was already seen within the watermark horizon
    (dropDuplicatesWithinWatermark — state expires with the watermark, so
    state size is bounded by the ingest rate x horizon instead of growing
    forever at 100 TB/day).  Duplicates farther apart than the horizon
    are the batch dedup pass's job (operators/dedup.dedup_exact).

    On a static frame this degrades to a plain dropDuplicates (same
    semantics when everything is inside one 'batch')."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            [id_col]
        )
    return events.dropDuplicates([id_col])


def hopping_window_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_seconds: int = 3600,
    slide_seconds: int = 1800,
    group_col: str | None = "event_type",
) -> DataFrame:
    """Hopping (sliding) window aggregation — the other standard
    streaming window next to windowed_event_counts' tumbling form: each
    event lands in exactly window/slide windows.

    Batch form: explode the covering window starts with pure integer
    arithmetic (start_i = (floor(t/slide) - i) * slide, i < window/slide
    — every start satisfies start <= t < start + window, proved in the
    oracle-shared derivation), so the result is engine-exact.  On a
    stream use F.window(ts, window, slide) + a watermark — identical
    semantics, Spark-native state handling."""
    w, sl = int(window_seconds), int(slide_seconds)
    if sl <= 0 or w <= 0 or w % sl != 0:
        raise ValueError(
            f"window={w} must be a positive multiple of slide={sl}"
        )
    n = w // sl
    # shared strict dtype dispatch (functions/parse.epoch_seconds): a
    # numeric epoch-seconds column passes through directly —
    # unix_timestamp() would cast it to string, fail to parse, and
    # silently land every row in one NULL win_start group
    from ..functions.parse import epoch_seconds

    if "__secs" in events.columns:
        raise ValueError("column '__secs' is reserved")
    ev = events.withColumn("__secs", epoch_seconds(events, ts_col))
    starts = F.expr(
        f"transform(sequence(0, {n - 1}), "
        f"i -> (FLOOR(__secs / {sl}) - i) * {sl})"
    )
    ex = ev.withColumn("win_start", F.explode(starts)).drop("__secs")
    keys = ["win_start"] + ([group_col] if group_col else [])
    return ex.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n"),
        F.expr("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)").alias(
            "total_value"
        ),
    )
