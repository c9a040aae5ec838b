"""Structured Streaming windowed aggregations over the ``events`` surface.

The reference has no streaming tier (SURVEY §2.10) — this is the
extension tier the fixture ``events`` table (event_id, ts, user_id,
event_type, value, props) is designated for:

- ``tumbling_window_agg`` / ``sliding_window_agg`` — the transformation,
  written once against a plain DataFrame so the SAME code path serves
  batch (oracle-checkable against DuckDB) and streaming (correctness by
  Spark's unified Dataset semantics: a streaming query is the batch
  query executed incrementally).
- ``read_event_stream`` — file-source ``readStream`` with the explicit
  fixture schema (no inference on a stream).
- ``run_stream_to_memory`` — test/demo harness: watermark + window agg
  into a named in-memory sink, processing all available input.

Scale notes: windowed aggregation state is partitioned by (window, keys)
in the state store; the watermark bounds state size — without it an
event-time agg's state grows forever. Output mode "update" emits only
changed windows per micro-batch; "append" waits for watermark closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pagerank_spark.session import local_relation
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def tumbling_window_agg(
    events: DataFrame, window: str = "1 hour", ts_col: str = "ts"
) -> DataFrame:
    """Tumbling event-time window: counts + value sum per (window, type).

    Works on batch AND streaming inputs (same plan, incrementalized for
    streams). ``window_id`` is the window start as an epoch-hour ordinal
    — an integer both Spark and DuckDB render identically, so the batch
    run is oracle-checkable.
    """
    win = F.window(F.col(ts_col), window)
    return (
        events.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.floor(F.unix_timestamp(F.col("w.start")) / 3600).alias("window_id"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding event-time window counts per (window, type).

    Each event lands in window/slide overlapping windows; Spark expands
    them JVM-side. Emits explicit start/end epochs.
    """
    win = F.window(F.col(ts_col), window, slide)
    return (
        events.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            F.unix_timestamp(F.col("w.end")).alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization (batch): one row per (user, session).

    Two shuffle-free-after-partition window passes over (user, ts): a lag
    marks gap-exceeding boundaries, a running sum numbers sessions — the
    classic sessionization plan, expressible identically in ANSI SQL (the
    oracle twin). Output: user, session ordinal, start/end epochs,
    event count, value sum.
    """
    from pyspark.sql import Window

    gap_s = _duration_seconds(gap)
    # Work on whole-second epochs throughout (ordering included) so the
    # plan is reproducible in engines without sub-second timestamps.
    pre = events.select(
        F.col(user_col),
        F.unix_timestamp(F.col(ts_col)).alias("ep"),
        F.col("value"),
    )
    w = Window.partitionBy(user_col).orderBy("ep")
    boundary = F.when(
        F.col("ep") - F.lag("ep").over(w) > gap_s, F.lit(1)
    ).otherwise(F.lit(0))
    numbered = pre.select(
        F.col(user_col),
        "ep",
        F.col("value"),
        F.sum(boundary).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_idx"),
    )
    return (
        numbered.groupBy(user_col, "session_idx")
        .agg(
            F.min("ep").alias("session_start"),
            F.max("ep").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def sessionize_stream_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Session-window aggregation via the native ``session_window``
    (merging event-time windows — the streaming-capable form; state per
    open session, closed by the watermark). Works on batch inputs too,
    where it must agree with the lag-based ``sessionize`` plan (pinned
    by a test)."""
    win = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(win.alias("w"), F.col(user_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            user_col,
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def _duration_seconds(duration: str) -> int:
    qty, unit = duration.split()
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
    }[unit]
    return int(qty) * mult


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a directory of event parquet files.

    Explicit schema (streams can't infer); ``maxFilesPerTrigger`` bounds
    per-micro-batch input so one huge backlog file can't blow a trigger.
    """
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def run_stream_to_memory(
    stream: DataFrame,
    query_name: str,
    watermark: str = "2 hours",
    window: str = "1 hour",
    ts_col: str = "ts",
):
    """Watermarked tumbling-window agg → in-memory sink (tests/demos).

    Output mode is **update**, so the watermark genuinely bounds the
    aggregation state: windows older than max(event time) - watermark
    are evicted from the state store, and late rows beyond it are
    dropped (the late-data policy). Complete mode would re-emit every
    window each batch and never evict — state grows with the number of
    windows forever, which is exactly the failure mode this module's
    header warns about.

    Update-mode memory-sink contract: each micro-batch APPENDS the
    changed rows, so a key can appear once per batch that touched it.
    The final value per (window_id, event_type) is the row with the
    highest ``n_events`` (counts are strictly increasing per key —
    every re-emission added at least one event). Read it back with
    ``max_by(sum_value, n_events)`` / ``max(n_events)`` per key.

    Returns the StreamingQuery; caller awaits/stops it.
    """
    agg = tumbling_window_agg(
        stream.withWatermark(ts_col, watermark), window=window, ts_col=ts_col
    )
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .start()
    )


def run_session_stream_to_memory(
    stream: DataFrame,
    query_name: str,
    watermark: str = "2 hours",
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
):
    """Watermarked SESSION-window agg → in-memory sink — the merging-
    window streaming shape (``F.session_window``): state is one open
    window per (user, session), EXTENDED while events keep arriving
    within ``gap`` of the window end and evicted once the watermark
    passes the window end. This is the second-gen streaming surface
    tumbling/sliding can't express — the window boundary is data-
    dependent, not clock-aligned.

    Output mode is **append** — the only mode Spark supports for
    streaming session aggregations (update would have to re-emit a
    window whose KEY can still change, since merging moves the window
    start; Spark rejects it with STREAMING_OUTPUT_MODE). Append's
    contract is actually the cleaner one here: a session row is
    emitted exactly ONCE, when the watermark passes its window end and
    no event can extend or merge it any more — so the sink holds only
    FINAL sessions, and sessions still open when the stream idles
    (newer than max event time − watermark) are deliberately absent.
    State is evicted at emission, so the store holds only open
    sessions.

    Returns the StreamingQuery; caller awaits/stops it.
    """
    agg = sessionize_stream_agg(
        stream.withWatermark(ts_col, watermark),
        gap=gap,
        ts_col=ts_col,
        user_col=user_col,
    )
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .start()
    )


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each key,
    with state bounded by the watermark.

    ``dropDuplicatesWithinWatermark`` is the scale-safe form — the
    dedup state for a key is dropped once the watermark passes it, so
    state size tracks the duplicate-arrival horizon instead of growing
    with every key ever seen (plain ``dropDuplicates`` on a stream
    retains keys forever). The batch twin of this operator is
    ``operators.dedup.exact_dedup``; duplicates that arrive farther
    apart than the watermark are the documented late-data policy (they
    survive, exactly like late rows beyond a window watermark).
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    interval: str = "1 hour",
    watermark: str = "2 hours",
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: right rows within
    ``[left_ts - interval, left_ts]`` on the same key.

    Both inputs carry watermarks, and the join condition bounds the
    right timestamp RELATIVE to the left one — Spark derives from those
    two facts how long each side's rows must be retained in the join
    state store, so state is bounded (without the time bound a
    stream-stream join would buffer both streams forever).

    ``how`` supports ``"inner"`` and ``"left_outer"``: the outer form
    additionally emits an unmatched left row (right columns NULL) once
    the watermark passes the point where a match could still arrive —
    i.e. the null verdict is itself watermark-delayed, which is why
    outer stream-stream joins REQUIRE both the watermark and the time
    bound (Spark rejects them otherwise). The batch twin is the same
    join with ``how="left"``.

    The inner batch twin is ``operators.relational.interval_join``
    (bucketed equi-join, driver-oracled as a declared query); the
    parity tests feed the same events through both.

    Right columns are prefixed ``r_`` to avoid ambiguity.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(
            f"stream_stream_interval_join: how must be inner|left_outer, "
            f"got {how!r}"
        )
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    r = r.select([F.col(c).alias(f"r_{c}") for c in r.columns])
    cond = (
        (F.col(on) == F.col(f"r_{on}"))
        & (F.col(f"r_{right_ts}") >= F.col(left_ts) - F.expr(f"INTERVAL {interval}"))
        & (F.col(f"r_{right_ts}") <= F.col(left_ts))
    )
    return l.join(r, on=cond, how=how).drop(f"r_{on}")


def stream_to_parquet_foreachbatch(
    agg_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    query_name: str = "foreachbatch_sink",
):
    """Production sink pattern: route each micro-batch through the full
    BATCH writer via ``foreachBatch`` — idempotent by ``batch_id``
    (Spark replays a failed batch with the same id, and the partition
    directory is overwritten, so exactly-once lands on top of
    at-least-once delivery). This is how update-mode aggregates reach
    parquet, which has no native streaming update sink.

    State/progress live in ``checkpoint_dir`` (the restart contract);
    output is hive-partitioned by ``batch_id`` so downstream readers
    can consume "latest batch per key" with a max(batch_id) filter.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option(
                "partitionOverwriteMode", "dynamic"
            )  # replayed batch rewrites ONLY its own partition
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return (
        agg_stream.writeStream.foreachBatch(_write)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join — the canonical streaming dimension
    lookup.

    Stateless: each micro-batch hash-joins against the static side (no
    state store, no watermark required), and the static side is
    re-resolved per batch, so a dimension backed by a table picks up
    slowly-changing updates between batches. The static side is
    broadcast explicitly — at scale the dimension is small by
    construction (it enriches, it isn't a fact), and a shuffle of the
    stream side per micro-batch would dominate the trigger latency.
    Inner/left only: right/full joins on a stream-static pair would
    need to emit unmatched STATIC rows, which is undefined until the
    stream ends.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "left_anti", "leftsemi", "leftanti"):
        raise ValueError(
            f"stream-static joins must preserve the stream side "
            f"(inner/left/left_semi/left_anti), got how={how!r}"
        )
    return stream.join(F.broadcast(dim), on=on, how=how)


def stream_upsert_to_table(
    agg_stream: DataFrame,
    table_root: str,
    checkpoint_dir: str,
    keys: list[str],
    query_name: str = "table_upsert_sink",
):
    """CDC-style sink: every update-mode micro-batch is MERGEd into the
    versioned parquet table (``pagerank_spark.table``) by key — the
    "streaming upsert into a lakehouse table" pattern.

    Each batch produces one new table snapshot whose changed keys are
    replaced and new keys inserted; readers always see a complete,
    consistent snapshot via the atomic ``_latest`` pointer, and
    ``read_table(version=...)`` time-travels through the batch history.
    Replayed batches (failure recovery) re-upsert the same rows —
    upsert is idempotent per key-value, so exactly-once lands on
    at-least-once delivery here too.
    """
    from pagerank_spark import table as _table

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _table.upsert_table(
            batch_df.sparkSession, batch_df, table_root, keys=keys
        )

    return (
        agg_stream.writeStream.foreachBatch(_write)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )


def curate_documents(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
) -> DataFrame:
    """The batch curation transform behind ``curate_stream_to_table``:
    PII-scrub the text in place, apply the Gopher structure gate, and
    keep only passing rows (gate feature columns dropped, scrub count
    columns kept as provenance). One codegen'd projection + filter —
    running it per micro-batch or over the full corpus produces the
    same rows, which the stream≡batch test pins."""
    from pagerank_spark.operators.text import gopher_quality, pii_redact

    scrubbed = pii_redact(df, text_col=text_col).withColumn(
        text_col, F.col(f"{text_col}_redacted")
    ).drop(f"{text_col}_redacted")
    gated = gopher_quality(scrubbed, text_col=text_col, min_words=min_words)
    return gated.where(F.col("passes_gopher")).drop(
        "passes_gopher", "mean_word_len", "symbol_word_ratio",
        "dup_line_frac",
    )


def curate_stream_to_table(
    doc_stream: DataFrame,
    table_root: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    query_name: str = "curation_sink",
):
    """Ingest-time corpus curation: every micro-batch of raw documents
    is PII-scrubbed (``text.pii_redact``), structure-gated
    (``text.gopher_quality``), and the passing rows MERGE-upserted by
    id into the versioned parquet table — the streaming front door of
    the training-data pipeline (scrub → gate → lakehouse append),
    composed entirely from the batch operators so stream and batch
    runs of the same corpus land the identical curated table.

    The per-batch transformation is one codegen'd projection + filter
    (both operators are pure Catalyst, no shuffle before the table
    write); idempotency per document id comes from the MERGE, so
    replayed batches land exactly-once on at-least-once delivery.
    """
    from pagerank_spark import table as _table

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        curated = curate_documents(
            batch_df, text_col=text_col, min_words=min_words
        )
        if curated.isEmpty():
            return
        _table.upsert_table(
            batch_df.sparkSession, curated, table_root, keys=[id_col]
        )

    return (
        doc_stream.writeStream.foreachBatch(_write)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )


def cms_stream_to_table(
    key_stream: DataFrame,
    table_root: str,
    checkpoint_dir: str,
    key_col: str = "key",
    width: int = 1024,
    depth: int = 4,
    query_name: str = "cms_sink",
):
    """Streaming heavy-hitter state: maintain a count-min sketch of
    the FULL event history inside the versioned table, merging each
    micro-batch's partial sketch cell-wise (the CMS linearity that
    makes the sketch a streaming-aggregation citizen). The stored
    relation is bounded by ``depth × width`` cells forever, however
    many events flow — the state a dashboard queries with
    ``cms_estimate`` at any moment.

    Unlike the upsert sinks, the merge is ADDITIVE, so replaying a
    micro-batch after failure recovery would double-count. The last
    applied ``batch_id`` is therefore committed in the SAME snapshot
    as the cells (a ``d = -1`` meta row — one atomic pointer flip
    covers both), and any batch at or below it is skipped: exactly-
    once effect on top of foreachBatch's at-least-once replay.
    """
    from pagerank_spark import table as _table
    from pagerank_spark.operators.relational import merge_grouped_partials
    from pagerank_spark.operators.sketch import cms_build

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        delta = cms_build(
            batch_df, key_col, width=width, depth=depth
        ).select(
            F.col("d").cast("int").alias("d"),
            F.col("pos").cast("long").alias("pos"),
            F.col("cnt").cast("long").alias("cnt"),
        )
        try:
            state = _table.read_table(spark, table_root)
        except FileNotFoundError:
            state = None
        if state is not None:
            last = state.where(F.col("d") == -1).collect()
            if last and last[0]["cnt"] >= batch_id:
                return  # replayed batch: already folded in
            merged = merge_grouped_partials(
                state.where(F.col("d") >= 0),
                delta,
                keys=["d", "pos"],
                sum_cols=["cnt"],
            )
        else:
            merged = delta
        meta = local_relation(
            spark, [(-1, -1, batch_id)], "d int, pos long, cnt long"
        )
        _table.write_table(
            merged.select("d", "pos", "cnt").unionAll(meta), table_root
        )

    return (
        key_stream.writeStream.foreachBatch(_write)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )


def hll_stream_to_table(
    key_stream: DataFrame,
    table_root: str,
    checkpoint_dir: str,
    key_col: str,
    group_cols: list[str],
    query_name: str = "hll_sink",
):
    """Streaming continuous aggregate: maintain per-group portable-HLL
    registers of the FULL event history inside the versioned table,
    merging each micro-batch's register delta (``hll_merge``). The
    stored relation is bounded by 256 rows per group forever, however
    many events flow — ``hll_grouped_estimate`` answers
    distinct-count dashboards against it at any moment (q247's rollup
    as a live stream).

    Unlike the ADDITIVE CMS sink (``cms_stream_to_table``), the
    register merge is a MAX — commutative AND idempotent — so a
    replayed micro-batch after failure recovery folds in as a no-op
    by construction: exactly-once EFFECT without a batch-id guard.
    Each refresh costs one register-sized shuffle, never an event-
    history rescan.
    """
    from pagerank_spark import table as _table
    from pagerank_spark.operators.sketch import (
        hll_grouped_registers,
        hll_merge,
    )

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        delta = hll_grouped_registers(batch_df, key_col, group_cols)
        try:
            state = _table.read_table(spark, table_root)
        except FileNotFoundError:
            state = None
        merged = (
            hll_merge(state, delta, group_cols)
            if state is not None
            else delta
        )
        _table.write_table(
            merged.select(*group_cols, "bucket", "max_rho"), table_root
        )

    return (
        key_stream.writeStream.foreachBatch(_write)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
