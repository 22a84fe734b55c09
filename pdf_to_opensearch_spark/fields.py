"""Per-field BM25 posting spaces — the multi-field ``match`` surface.

The reference's indexed unit declares THREE analyzed text fields —
``chunk_text_current`` / ``chunk_text_previous`` / ``chunk_text_next``
(reference: opensearch_loader.py:210-237) — each independently scorable
by a ``match`` query with its own statistics. Lucene's model for this is
a separate terms dictionary, posting lists and length norms PER FIELD;
this module reproduces exactly that shape: every extra analyzed field
gets its own posting space under ``<root>/fields/<name>/`` built from
the SAME docs table (same doc_ids, same prepare-assigned ranges), so

- the build stays ZERO-shuffle (the field projection is written one file
  per range under the no-split read conf, preserving range alignment);
- per-field (df, avgdl, per-doc dl) fall out by construction — each
  posting space carries its own dictionary and stats tables;
- the query path is the UNCHANGED block-max BM25 engine pointed at the
  field's posting space; the root index itself is the "current" field.

Scale note (100 TB): per-field spaces multiply index size by the number
of analyzed fields, exactly as Lucene does; each field's build is an
independent zero-shuffle job over the shared docs table, so fields can
be built serially (bounded peak resources) or concurrently.

Maintenance interplay: ``maintenance.delete_from_index`` writes a NEW
index root (snapshot isolation); field spaces are derived tables and are
NOT copied into the snapshot — rebuild them there with
:func:`build_field_index` (they derive deterministically from the new
docs table, same as the root's own postings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .indexer import (
    IndexPaths,
    build_postings,
    read_small_table,
    write_small_table,
)


def field_root(index_dir: str, field: str) -> str:
    return f"{index_dir}/fields/{field}"


def build_field_index(spark: SparkSession, index_dir: str, field: str,
                      num_ranges: int | None = None,
                      n_buckets: int | None = None) -> str:
    """Build the posting space for one analyzed field of the indexed unit.

    ``field`` is a string column of the root docs table (it rode through
    :func:`indexer.assign_doc_ids`, which preserves all input columns —
    same mechanism the embedding column uses). NULL field values analyze
    as empty documents (dl 0), matching an absent optional field.
    Returns the field root path.
    """
    import pandas as pd

    from .analyzer import token_count_udf

    paths = IndexPaths(index_dir)
    froot = field_root(index_dir, field)
    fpaths = IndexPaths(froot)
    st = read_small_table(spark, paths.stats).iloc[0]
    if num_ranges is None:
        num_ranges = int(st["num_ranges"])
    if n_buckets is None:
        n_buckets = int(st["n_buckets"])

    # zero-shuffle field projection: read the root docs table one file
    # per range (no file splitting/packing) and write the projected field
    # docs in the same partition layout — range alignment is preserved,
    # so build_postings over the field space needs no repartition either
    conf = spark.conf
    old_mpb = conf.get("spark.sql.files.maxPartitionBytes", None)
    old_ocb = conf.get("spark.sql.files.openCostInBytes", None)
    conf.set("spark.sql.files.maxPartitionBytes", str(1 << 40))
    conf.set("spark.sql.files.openCostInBytes", str(1 << 40))
    try:
        docs = spark.read.parquet(paths.docs)
        if field not in docs.columns:
            raise ValueError(
                f"field {field!r} is not a column of the docs table "
                f"(have: {docs.columns})")
        sub = (docs.select(
            "doc_id",
            F.coalesce(F.col(field), F.lit("")).alias("text"),
            "range_id")
            .withColumn("dl", token_count_udf(F.col("text"))))
        sub.write.mode("overwrite").parquet(fpaths.docs)
    finally:
        for key, old in (("spark.sql.files.maxPartitionBytes", old_mpb),
                         ("spark.sql.files.openCostInBytes", old_ocb)):
            if old is None:
                conf.unset(key)
            else:
                conf.set(key, old)

    # per-field corpus statistics: same N, field-specific avgdl (Lucene
    # norms are per field — a short 'previous' context must not be scored
    # with the current field's average length)
    g = (spark.read.parquet(fpaths.docs)
         .agg(F.count("*").alias("N"), F.sum("dl").alias("sum_dl"))
         .collect()[0])
    n_docs, sum_dl = int(g["N"]), int(g["sum_dl"] or 0)
    meta = pd.DataFrame([{"N": n_docs, "sum_dl": sum_dl,
                          "avgdl": (sum_dl / n_docs) if n_docs else 0.0}])
    write_small_table(spark, meta, fpaths.docs_meta)

    build_postings(spark, froot, num_ranges=num_ranges, n_buckets=n_buckets)
    return froot


def search_field(spark: SparkSession, index_dir: str, field: str,
                 queries: list[tuple[int, str]], k: int = 10,
                 prune: bool = True) -> DataFrame:
    """``match`` on one analyzed field: the unchanged BM25 engine pointed
    at the field's posting space. ``field`` in (None, 'current', 'text')
    scores the root index itself."""
    from .query import search

    root = (index_dir if field in (None, "current", "text")
            else field_root(index_dir, field))
    return search(spark, root, queries, k=k, prune=prune)
