"""Composed training-corpus cleaning pass — the pipeline users actually
run over raw web text before pre-training: quality gates → exact-dup
keeper → near-dup cluster keeper, in one call with a per-doc verdict.

Stage order is frozen (and mirrored in the SQL oracle):
1. quality — token count / stopword ratio / alpha ratio thresholds over
   :func:`ops.textstats.quality_scores` features;
2. exact dedup among quality passers — md5(text) groups, keeper = min id;
3. near dedup among exact survivors — MinHash-LSH pairs
   (:func:`ops.dedup.minhash_near_duplicates`) closed into clusters
   (:func:`ops.dedup.duplicate_clusters`), keeper = min id per cluster.

Scale notes (100 TB): stage 1 is pure whole-stage-codegen column math;
stage 2 is one shuffle on a uniform 128-bit digest; stage 3 is the
banded LSH pipeline (never all-pairs). Each stage only processes the
previous stage's survivors, so the expensive stage sees the smallest
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import duplicate_clusters, minhash_near_duplicates
from .textstats import quality_scores


def clean_corpus(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 min_tokens: int = 20,
                 min_stopword_ratio: float = 0.0,
                 min_alpha_ratio: float = 0.4,
                 near_threshold: float = 0.7,
                 hash_family: str = "xxhash64") -> DataFrame:
    """One row per input doc: (doc_id, fate) with fate ∈
    {'kept', 'quality', 'exact_dup', 'near_dup'} — 'kept' docs are the
    cleaned corpus; the other fates say which stage removed the doc and
    why (auditable attrition, the thing corpus reports are made of).
    """
    q = quality_scores(docs, id_col, text_col)
    qok = q.select(
        F.col(id_col),
        ((F.col("n_tokens") >= min_tokens) &
         (F.col("stopword_ratio") >= min_stopword_ratio) &
         (F.col("alpha_ratio") >= min_alpha_ratio)).alias("q_ok"))
    base = docs.select(id_col, text_col).join(qok, id_col)
    passers = base.filter(F.col("q_ok"))

    # exact stage: keeper = min id per content hash (skew-free digest key)
    hashed = passers.withColumn("_h", F.md5(F.col(text_col)))
    keepers = hashed.groupBy("_h").agg(F.min(id_col).alias("_keeper"))
    with_keeper = hashed.join(keepers, "_h")
    exact_dups = (with_keeper.filter(F.col(id_col) != F.col("_keeper"))
                  .select(id_col).withColumn("_exact", F.lit(True)))
    survivors = (with_keeper.filter(F.col(id_col) == F.col("_keeper"))
                 .select(id_col, text_col))

    # near stage: LSH pairs over exact survivors, closed into clusters;
    # non-representative members are dropped
    pairs = minhash_near_duplicates(survivors, id_col=id_col,
                                    text_col=text_col,
                                    threshold=near_threshold,
                                    hash_family=hash_family)
    clusters = duplicate_clusters(pairs)
    # duplicate_clusters consumes pairs EAGERLY (driver union-find collect
    # on the small path, localCheckpointed label rounds on the distributed
    # path), so the persisted pair cache can be released here — without
    # this it outlived the whole pass
    pairs.unpersist()
    near_dups = (clusters.filter(F.col("doc_id") != F.col("cluster_id"))
                 .select(F.col("doc_id").alias(id_col))
                 .withColumn("_near", F.lit(True)))

    fate = (F.when(~F.col("q_ok"), F.lit("quality"))
            .when(F.col("_exact"), F.lit("exact_dup"))
            .when(F.col("_near"), F.lit("near_dup"))
            .otherwise(F.lit("kept")))
    return (base.select(id_col, "q_ok")
            .join(exact_dups, id_col, "left")
            .join(near_dups, id_col, "left")
            .select(F.col(id_col), fate.alias("fate")))
