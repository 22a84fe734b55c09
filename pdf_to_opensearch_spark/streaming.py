"""Structured-Streaming incremental ingestion (beyond-reference extension).

The reference's incremental story is batch delete-then-reinsert
(uploader.py:218-229). At web scale new pages arrive continuously, so this
module adds a streaming path: ``readStream`` over a pages source →
``foreachBatch`` → :func:`append_batch`, which extends the existing index
*without touching committed ranges*:

- new doc_ids continue after the current max (append-only dense ids;
  batch-local sort keeps them deterministic per micro-batch)
- new documents form NEW doc ranges (range_id continues past the current
  max), so committed postings files are immutable — the same property that
  makes the batch build resumable makes the stream exactly-once-append
  (an idempotent retry of a failed batch overwrites only its own ranges)
- dictionary / stats / manifest are maintained INCREMENTALLY: only the
  new ranges' postings are aggregated (parquet row-group ``range_id``
  stats skip committed data), merged into the dictionary with a
  union-aggregate swap-rewrite (the Iceberg-MERGE analogue on a local FS),
  and appended to doc_stats/manifest; N/avgdl update from the batch's own
  (count, Σdl). Nothing reprocesses the existing index — O(batch), not
  O(index), per micro-batch.
- ``avgdl`` drifts as documents arrive; block-max pruning stays SOUND
  regardless because block metadata stores raw (max_tf, min_dl) and upper
  bounds are recomputed with the current avgdl at query time — no
  avgdl-build comparison is needed (the bound is valid at any avgdl).

Event-time watermarking is not needed for index append (arrival order is
irrelevant to BM25); the ``events`` streaming patterns live here as
operators: :func:`windowed_event_counts` (watermarked tumbling-window
aggregation) and :func:`running_user_totals` (custom stateful operator
via ``applyInPandasWithState``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import ANALYZER_VERSION
from .analyzer import token_count_udf
from .indexer import (
    POSTINGS_SCHEMA,
    IndexPaths,
    _spimi_batches,
    assign_doc_ids,
    term_bucket_col,
)


def _refresh_derived_full(spark: SparkSession, paths: IndexPaths,
                          docs_per_range: int, num_ranges: int,
                          n_buckets: int) -> None:
    """Full recompute after a rollback rewrite (rare crash-recovery path):
    docs changed, so N/avgdl/doc_stats/docs_meta are re-derived from the
    surviving docs, everything else from the surviving postings."""
    import pandas as pd

    from .indexer import refresh_derived_tables

    g = (spark.read.parquet(paths.docs)
         .agg(F.count("*").alias("N"), F.sum("dl").alias("s")).collect()[0])
    N = int(g["N"])
    sum_dl = int(g["s"] or 0)
    avgdl = (sum_dl / N) if N else 0.0
    from .indexer import write_small_table

    meta = pd.DataFrame([{"N": N, "sum_dl": sum_dl, "avgdl": avgdl}])
    write_small_table(spark, meta, paths.docs_meta)
    refresh_derived_tables(spark, paths, N=N, avgdl=avgdl,
                           docs_per_range=docs_per_range,
                           num_ranges=num_ranges, n_buckets=n_buckets,
                           refresh_doc_stats=True)


def _batch_log_path(paths: IndexPaths) -> str:
    return f"{paths.root}/stream_batches"


def _read_batch_log(spark: SparkSession, paths: IndexPaths):
    """→ (committed batch_ids, pending [(batch_id, base)])."""
    try:
        rows = spark.read.parquet(_batch_log_path(paths)).collect()
    except Exception:
        return set(), []
    by_batch: dict[int, dict] = {}
    for r in rows:
        br = int(r["base_range"]) if "base_range" in r.__fields__ else -1
        e = by_batch.setdefault(int(r["batch_id"]),
                                {"base": int(r["base"]), "base_range": br,
                                 "committed": False})
        if r["status"] == "committed":
            e["committed"] = True
    committed = {b for b, e in by_batch.items() if e["committed"]}
    pending = [(b, e["base"], e["base_range"]) for b, e in by_batch.items()
               if not e["committed"]]
    return committed, pending


def _log_batch(spark: SparkSession, paths: IndexPaths, batch_id: int,
               base: int, base_range: int, status: str) -> None:
    spark.createDataFrame(
        [(int(batch_id), int(base), int(base_range), status)],
        "batch_id long, base long, base_range long, status string") \
        .write.mode("append").parquet(_batch_log_path(paths))


def _bucket_partitioned(postings_path: str) -> bool:
    """True when the postings dir uses the legacy ``bucket=N/`` directory
    layout (pre-flat-write indexes). Appending root-level flat files to
    such a dir would be SILENTLY IGNORED by Spark partition discovery —
    every write path must check this and keep the layout consistent."""
    import glob
    import os

    return any(os.path.isdir(p)
               for p in glob.glob(os.path.join(postings_path, "bucket=*")))


def _swap_rewrite(spark: SparkSession, path: str, df: DataFrame,
                  partition_by: str | None = None) -> None:
    """Rewrite a local parquet dir from a filtered read (staging + rename).

    On a production object store this is an Iceberg snapshot commit; the
    local-FS rename is the sandbox equivalent with the same semantics.
    """
    import os
    import shutil

    staging = path + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(staging)
    shutil.rmtree(path)
    os.rename(staging, path)


def rollback_incomplete(spark: SparkSession, index_dir: str) -> list[int]:
    """Drop artifacts of begin-without-commit batches (crash recovery).

    A failed batch's docs all have ``doc_id >= base`` and its postings all
    have ``range_id >= base_range`` (both recorded in the begin log entry;
    appended ranges are strictly above every committed one), so rollback
    is a pair of filtered rewrites. Returns rolled-back ids.
    """
    paths = IndexPaths(index_dir)
    _committed, pending = _read_batch_log(spark, paths)
    if not pending:
        return []
    min_base = min(b for _i, b, _r in pending)
    st = spark.read.parquet(paths.stats).collect()[0]
    dpr = int(st["docs_per_range"])
    # the log records each batch's first NEW range id; a legacy entry
    # (base_range = -1) falls back to fixed-width arithmetic FOR THAT
    # ENTRY ONLY — an all-or-nothing fallback on a mixed-era log would
    # apply doc_id//dpr arithmetic to assigned-range ids it has no
    # relation to, orphaning or dropping committed ranges
    min_range = min((r if r >= 0 else b // dpr) for _i, b, r in pending)
    _swap_rewrite(spark, paths.docs,
                  spark.read.parquet(paths.docs)
                  .filter(F.col("doc_id") < min_base))
    _swap_rewrite(spark, paths.postings,
                  spark.read.parquet(paths.postings)
                  .filter(F.col("range_id") < min_range),
                  partition_by="bucket"
                  if _bucket_partitioned(paths.postings) else None)
    # mark as committed-with-rollback so they are not retried against
    for bid, base, brange in pending:
        _log_batch(spark, paths, bid, base, brange, "rolled_back")
        _log_batch(spark, paths, bid, base, brange, "committed")
    _refresh_derived_full(spark, paths, dpr, int(st["num_ranges"]),
                          int(st["n_buckets"]))
    return [bid for bid, _b, _r in pending]


def append_batch(spark: SparkSession, new_docs: DataFrame, index_dir: str,
                 batch_id: int | None = None) -> int:
    """Append a micro-batch of docs(url, text, lang) to an existing index.

    Exactly-once: the commit log records ``begin`` before any write and
    ``committed`` after all writes; a replayed ``batch_id`` that already
    committed is skipped, and a crashed batch is rolled back (its doc_ids
    AND range_ids are strictly above every committed one — appended docs
    get fresh ranges, so committed postings files are never touched).
    """
    paths = IndexPaths(index_dir)
    if batch_id is not None:
        committed, pending = _read_batch_log(spark, paths)
        if batch_id in committed:
            return 0
        if pending:
            rollback_incomplete(spark, index_dir)
    st = spark.read.parquet(paths.stats).collect()[0]
    docs_per_range = int(st["docs_per_range"])
    n_buckets = int(st["n_buckets"])
    docs_now = spark.read.parquet(paths.docs)
    if "range_id" in docs_now.columns:
        cur = docs_now.agg(F.max("doc_id").alias("m"),
                           F.max("range_id").alias("r")).collect()[0]
        base = int(cur["m"]) + 1 if cur["m"] is not None else 0
        base_range = int(cur["r"]) + 1 if cur["r"] is not None else 0
    else:  # legacy fixed-width ranges: align base to a range boundary
        cur = docs_now.agg(F.max("doc_id").alias("m")).collect()[0]
        nxt = int(cur["m"]) + 1 if cur["m"] is not None else 0
        base = -(-nxt // docs_per_range) * docs_per_range
        base_range = base // docs_per_range

    ided = assign_doc_ids(new_docs.select("url", "text", "lang"),
                          partitions=max(new_docs.rdd.getNumPartitions(), 1),
                          with_range_id=True)
    try:
        with_ids = (ided
                    .withColumn("doc_id", F.col("doc_id") + F.lit(base))
                    .withColumn("range_id",
                                (F.col("range_id") + F.lit(base_range))
                                .cast("int"))
                    .withColumn("dl", token_count_udf(F.col("text"))))
        n_new = with_ids.count()
        if n_new == 0:
            return 0
        if batch_id is not None:
            _log_batch(spark, paths, batch_id, base, base_range, "begin")
        with_ids.write.mode("append").parquet(paths.docs)
    finally:
        ided._persisted_input.unpersist()
    # batch-local Σdl for the incremental N/avgdl update (O(batch) agg
    # over the just-written rows, pruned by the doc_id >= base predicate)
    dl_row = (spark.read.parquet(paths.docs)
              .filter(F.col("doc_id") >= base)
              .agg(F.sum("dl").alias("s")).collect()[0])
    batch_dl_sum = int(dl_row["s"] or 0)

    indexable = (spark.read.parquet(paths.docs)
                 .filter(F.col("doc_id") >= base))
    n_ranges = max(1, min(int(indexable.rdd.getNumPartitions()),
                          -(-n_new // max(docs_per_range, 1))))
    spimi_in = (indexable.select("doc_id", "text", "range_id")
                .repartitionByRange(n_ranges, "range_id"))
    postings = spimi_in.mapInPandas(
        _spimi_batches(), schema=POSTINGS_SCHEMA)
    postings = postings.withColumn(
        "bucket", term_bucket_col(F.col("term"), n_buckets))
    w = postings.sortWithinPartitions("bucket", "term").write.mode("append")
    if _bucket_partitioned(paths.postings):
        # legacy bucket=N/ directory layout: a root-level flat append would
        # be invisible to partition discovery — keep the dir's own layout
        w = w.partitionBy("bucket")
    w.parquet(paths.postings)

    _incremental_refresh(spark, paths, st, base, base_range, n_new,
                         batch_dl_sum)
    if batch_id is not None:
        _log_batch(spark, paths, batch_id, base, base_range, "committed")
    return n_new


def _incremental_refresh(spark: SparkSession, paths: IndexPaths, st,
                         base: int, base_range: int, n_new: int,
                         batch_dl_sum: int) -> None:
    """O(batch) derived-table maintenance after an append.

    Only the NEW ranges' postings are aggregated (``range_id >=
    base_range`` — committed files are skipped via parquet row-group
    min/max stats since appended ranges are strictly above committed
    ones); the dictionary is merged with a union-aggregate swap-rewrite
    (the local-FS analogue of an Iceberg MERGE commit), doc_stats and the
    manifest are APPENDED, and N/avgdl roll forward from the batch's own
    (count, Σdl). Nothing rescans the committed index."""
    import pandas as pd

    new_posts = (spark.read.parquet(paths.postings)
                 .filter(F.col("range_id") >= base_range))
    new_dict = (new_posts.groupBy("term")
                .agg(F.sum("n").alias("df"), F.sum("cf").alias("cf")))
    merged = (spark.read.parquet(paths.dictionary)
              .unionByName(new_dict)
              .groupBy("term")
              .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf")))
    _swap_rewrite(spark, paths.dictionary, merged)
    # filter on the batch's OWN first doc_id: with prepare-assigned ranges
    # base_range is a partition ordinal unrelated to doc_id arithmetic, so
    # base_range * docs_per_range would silently drop or duplicate rows
    (spark.read.parquet(paths.docs)
     .filter(F.col("doc_id") >= base)
     .select("doc_id", "dl")
     .write.mode("append").parquet(paths.doc_stats))
    N_old, avgdl_old = int(st["N"]), float(st["avgdl"])
    N_new = N_old + n_new
    avgdl_new = (N_old * avgdl_old + batch_dl_sum) / N_new if N_new else 0.0
    from .indexer import write_small_table

    meta = pd.DataFrame([{"N": N_new,
                          "sum_dl": int(round(N_new * avgdl_new)),
                          "avgdl": avgdl_new}])
    write_small_table(spark, meta, paths.docs_meta)
    stats_pdf = pd.DataFrame([{
        "N": N_new, "avgdl": avgdl_new,
        "avgdl_build": float(st["avgdl_build"]),
        "docs_per_range": int(st["docs_per_range"]),
        "num_ranges": int(st["num_ranges"]),
        "n_buckets": int(st["n_buckets"]),
        "analyzer_version": ANALYZER_VERSION,
        "k1": float(st["k1"]), "b": float(st["b"]),
    }])
    write_small_table(spark, stats_pdf, paths.stats)
    (new_posts.groupBy("range_id")
     .agg(F.sum("n").alias("n_postings"),
          F.countDistinct("term").alias("n_terms"),
          F.sum("n_bytes").alias("bytes"),
          F.max("wall_ms").alias("wall_ms"))
     .withColumn("status", F.lit("committed"))
     .withColumn("analyzer_version", F.lit(ANALYZER_VERSION))
     .withColumn("committed_at", F.current_timestamp())
     .write.mode("append").parquet(paths.manifest))


def start_ingest_stream(spark: SparkSession, source_dir: str, schema,
                        index_dir: str, checkpoint_dir: str,
                        trigger_seconds: int = 5):
    """File-source streaming ingest: new parquet files of pages appended to
    ``source_dir`` flow into the index via foreachBatch."""
    from .extract import extract_docs

    stream = (spark.readStream.schema(schema).parquet(source_dir))

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df
        if "html" in docs.columns and "text" not in docs.columns:
            docs = extract_docs(docs)
        # batch_id MUST flow through: Structured Streaming replays the last
        # uncommitted micro-batch after a restart, and the begin/commit log
        # keyed by batch_id is what makes that replay idempotent
        append_batch(spark, docs.select("url", "text", "lang"), index_dir,
                     batch_id=batch_id)

    return (stream.writeStream
            .option("checkpointLocation", checkpoint_dir)
            .trigger(processingTime=f"{trigger_seconds} seconds")
            .foreachBatch(handle)
            .start())


def windowed_event_counts(events: DataFrame, window: str = "5 minutes",
                          watermark: str = "10 minutes",
                          ts_col: str = "ts",
                          key_col: str = "event_type") -> DataFrame:
    """Watermarked tumbling-window counts over an event stream (the
    SURVEY §2.9 streaming-aggregation pattern): late rows beyond
    ``watermark`` are dropped, state for closed windows is evicted.
    Works identically on a batch DataFrame (watermark is a no-op there),
    which is what the DuckDB-comparable test exploits."""
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("w"),
                     F.col(key_col))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("window_start"),
                    key_col, "n"))


def running_user_totals(events) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``
    (the X-surface the reference has no analogue for — per-key state that
    survives micro-batches): running per-user event totals and the number
    of micro-batches that touched the key.

    ``events`` is a STREAMING DataFrame with (user_id long, ...); output
    mode must be ``update``.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        total, batches = state.get if state.exists else (0, 0)
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        total += int(n)
        batches += 1
        state.update((total, batches))
        yield pd.DataFrame({"user_id": [key[0]], "total": [total],
                            "batches": [batches]})

    return (events.groupBy("user_id")
            .applyInPandasWithState(
                update,
                outputStructType="user_id long, total long, batches long",
                stateStructType="total long, batches long",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
