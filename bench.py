"""Benchmark harness (driver contract + BASELINE.md §3 protocol).

Runs the headline workloads at ``$SPARK_GRAFT_SF_DIR`` (default sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Headline queries:
- ``index_build``      — full SPIMI index build over the documents corpus
- ``bm25_topk``        — engine BM25 top-10, the 3 reference queries
- ``bm25_query_p50/p95`` — per-query latency over repeated runs
- ``dedup_exact`` / ``minhash_pairs`` / ``quality_scores`` / ``ann_cosine_topk``
- ``scaling_eff``      — same build at local[N/4] vs local[N]
  (two-parallelism-level substitute for the N→4N executor criterion;
  efficiency = (thr_hi / thr_lo) / 4)

Set SPARK_GRAFT_BENCH_SCALING=0 to skip the second JVM (faster iteration).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DO_SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"
# scaling corpus: large enough that tokenize+SPIMI dominate fixed overhead
SCALE_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "60000"))
NUM_RANGES = 32     # fixed across parallelism levels → identical work
N_BUCKETS = 16

BM25_QUERIES = [(1, "spark join filter"), (2, "vector stream window batch"),
                (3, "customer the slow")]


def _docs(spark):
    from pyspark.sql import functions as F

    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.concat(F.lit("doc://"),
                 F.lpad(F.col("doc_id").cast("string"), 10, "0")).alias("url"),
        "text", "lang")


def _scaling_corpus() -> str:
    """Seeded synthetic pages corpus, generated once, cached in /tmp."""
    path = os.path.join(tempfile.gettempdir(),
                        f"bench_pages_{SCALE_DOCS}_s42.parquet")
    if not os.path.exists(path):
        from pdf_to_opensearch_spark.synth import make_pages_pdf

        pdf = make_pages_pdf(n_docs=SCALE_DOCS, seed=42)
        pdf.drop(columns=["html"]).to_parquet(path, index=False)
    return path


def build_once(cores: int, out_dir: str, corpus_path: str) -> tuple[float, int]:
    """Fresh JVM session at ``cores``; returns (build_seconds, n_docs).

    A small warm-up UDF job forces Python-worker spawn before the timed
    region so both parallelism levels measure steady-state throughput.
    """
    from pyspark.sql import functions as F

    from pdf_to_opensearch_spark.analyzer import token_count_udf
    from pdf_to_opensearch_spark.indexer import build_index
    from pdf_to_opensearch_spark.session import get_spark

    spark = get_spark(f"bench_build_{cores}", cores=cores,
                      shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        docs = spark.read.parquet(corpus_path).select("url", "text", "lang") \
            .repartition(cores)
        n = docs.count()
        docs.limit(2048).select(token_count_udf("text")).count()  # warm-up
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.monotonic()
        build_index(spark, docs, out_dir, num_ranges=NUM_RANGES,
                    n_buckets=N_BUCKETS, id_partitions=cores)
        dt = time.monotonic() - t0
        return dt, n
    finally:
        spark.stop()


def main() -> None:
    results: dict[str, float] = {}

    # ---- scaling evidence: same job, two parallelism levels, own JVMs -----
    lo_cores = max(CPUS // 4, 1)
    if DO_SCALING:
        corpus = _scaling_corpus()
        idx_lo = os.path.join(tempfile.gettempdir(), "bench_index_lo")
        idx_hi = os.path.join(tempfile.gettempdir(), "bench_index_hi")
        t_lo, n_scale = build_once(lo_cores, idx_lo, corpus)
        t_hi, _ = build_once(CPUS, idx_hi, corpus)
        shutil.rmtree(idx_lo, ignore_errors=True)
        shutil.rmtree(idx_hi, ignore_errors=True)
        results[f"scale_build_local{lo_cores}"] = round(t_lo, 3)
        results[f"scale_build_local{CPUS}"] = round(t_hi, 3)
        results["scale_docs_per_sec_lo"] = round(n_scale / t_lo, 1)
        results["scale_docs_per_sec_hi"] = round(n_scale / t_hi, 1)
        results["scaling_efficiency"] = round(
            (t_lo / t_hi) / (CPUS / lo_cores), 4)

    # ---- main session at full parallelism ---------------------------------
    from pdf_to_opensearch_spark.session import get_spark

    spark = get_spark("bench", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    from pdf_to_opensearch_spark.indexer import build_index
    from pdf_to_opensearch_spark.query import search

    idx = os.path.join(tempfile.gettempdir(), "bench_index_sf")
    docs = _docs(spark)
    n_docs = docs.count()
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.monotonic()
    build_index(spark, docs, idx, num_ranges=NUM_RANGES, n_buckets=N_BUCKETS,
                id_partitions=CPUS)
    t_build = time.monotonic() - t0
    results["index_build"] = round(t_build, 3)
    results["index_build_docs_per_sec"] = round(n_docs / t_build, 1)

    # ---- query latency -----------------------------------------------------
    lat: list[float] = []
    for rep in range(12):
        t0 = time.monotonic()
        search(spark, idx, BM25_QUERIES, k=10, prune=True).collect()
        lat.append(time.monotonic() - t0)
    lat.sort()
    results["bm25_topk"] = round(lat[len(lat) // 2], 3)
    results["bm25_query_p50"] = round(lat[len(lat) // 2], 3)
    results["bm25_query_p95"] = round(lat[min(len(lat) - 1,
                                              int(len(lat) * 0.95))], 3)

    # ---- pipeline ops ------------------------------------------------------
    import __spark_entry__ as entry

    for name in ["dedup_exact", "quality_scores", "ann_cosine_topk",
                 "minhash_pairs", "corpus_stats"]:
        fn = entry.queries()[name]
        t0 = time.monotonic()
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        results[name] = round(time.monotonic() - t0, 3)

    spark.stop()
    total = round(sum(v for k, v in results.items()
                      if not k.startswith("scaling") and
                      not k.endswith("docs_per_sec")), 3)
    print(json.dumps({
        "metric": "pdf_to_opensearch_spark_headline_sec",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": SF_DIR,
        "cpus": CPUS,
        "n_docs": n_docs,
    }))


if __name__ == "__main__":
    main()
