"""Benchmark harness (driver contract + BASELINE.md §3 protocol).

Runs the headline workloads at ``$SPARK_GRAFT_SF_DIR`` (default sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Headline queries:
- ``index_build``      — full index build over the sf documents corpus
- ``bm25_topk`` / ``bm25_query_p50/p95`` — engine top-10 latency
- ``dedup_exact`` / ``minhash_pairs`` / ``quality_scores`` / ``ann_cosine_topk``
- ``scaling_efficiency`` — the indexing job (phase B) on a compute-bound
  60k-long-doc corpus at local[N] vs local[4N] (N=2 by default: the
  two-cluster-size criterion evidenced at two parallelism levels, kept
  ≤25% of the machine because sustained full-machine load triggers ~2×
  hypervisor burst throttling on this VM — measured, see BENCH.md).
  Protocol: alternating runs, min of 3 per level, 45 s cooldowns.
  efficiency = (t_lo / t_hi) / (HI/LO).

Set SPARK_GRAFT_BENCH_SCALING=0 to skip the scaling JVMs (fast iteration).
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
# scaling corpus: long docs so the indexing job is compute-bound
SCALE_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "30000"))
SCALE_DOC_LEN = (400, 1200)
# N vs 4N parallelism for the scaling criterion. 2→8 keeps even the high
# level ≤25% of this 32-core VM: sustained full-machine load hits hypervisor
# burst throttling (~2× decay measured), which would corrupt the comparison.
SCALE_LO = int(os.environ.get("SPARK_GRAFT_SCALE_LO", "2"))
SCALE_HI = int(os.environ.get("SPARK_GRAFT_SCALE_HI", "8"))
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
    lo, hi = SCALE_DOC_LEN
    path = os.path.join(tempfile.gettempdir(),
                        f"bench_pages_{SCALE_DOCS}_{lo}_{hi}_s42.parquet")
    if not os.path.exists(path):
        from pdf_to_opensearch_spark.synth import make_pages_pdf

        pdf = make_pages_pdf(n_docs=SCALE_DOCS, seed=42, min_len=lo,
                             max_len=hi)
        # drop html (unused) and warc_ts (pandas writes NANOS timestamps,
        # which Spark's parquet reader rejects)
        pdf.drop(columns=["html", "warc_ts"]).to_parquet(path, index=False)
    return path


def _prepare_scaling_docs(corpus_path: str, out_dir: str) -> int:
    """Phase A once at full parallelism; the timed phase B reuses it."""
    from pdf_to_opensearch_spark.indexer import prepare_docs
    from pdf_to_opensearch_spark.session import get_spark

    spark = get_spark("bench_prepare", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        docs = spark.read.parquet(corpus_path).select("url", "text", "lang")
        n = docs.count()
        shutil.rmtree(out_dir, ignore_errors=True)
        prepare_docs(spark, docs, out_dir, id_partitions=CPUS)
        return n
    finally:
        spark.stop()


_CALIB_BEST = [float("inf")]


def _calibrate() -> float:
    """Fixed single-proc numpy workload (~0.5 s unthrottled)."""
    import numpy as np

    a = np.random.default_rng(0).standard_normal(1_500_000)
    t0 = time.monotonic()
    for _ in range(6):
        np.sort(a.copy())
    return time.monotonic() - t0


def _wait_steady_state(max_wait: float = 120.0) -> None:
    """Block until the VM is back at its best-known speed (±15%).

    This VM throttles under sustained load (~2× decay, recovers when idle);
    gating each timed run on a calibration workload puts every measurement
    in a comparable machine state — without this, run order dominates the
    scaling signal.
    """
    deadline = time.monotonic() + max_wait
    while True:
        c = _calibrate()
        _CALIB_BEST[0] = min(_CALIB_BEST[0], c)
        if c <= _CALIB_BEST[0] * 1.15 or time.monotonic() > deadline:
            return
        time.sleep(20)


def index_once(cores: int, index_dir: str) -> float:
    """Time the indexing job (phase B) in a fresh JVM at ``cores``.

    A cores-wide warm-up UDF job spawns every Python worker before the
    timed region so both parallelism levels measure steady-state
    throughput (a narrow warm-up would leave most workers to cold-start
    inside the timed region at the high level only).
    """
    from pdf_to_opensearch_spark.analyzer import token_count_udf
    from pdf_to_opensearch_spark.indexer import build_postings
    from pdf_to_opensearch_spark.session import get_spark

    spark = get_spark(f"bench_index_{cores}", cores=cores,
                      shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        docs = spark.read.parquet(f"{index_dir}/docs")
        (docs.limit(cores * 256).repartition(cores)
         .select(token_count_udf("text")).count())  # warm-up, all workers
        _wait_steady_state()
        t0 = time.monotonic()
        build_postings(spark, index_dir, num_ranges=NUM_RANGES,
                       n_buckets=N_BUCKETS)
        return time.monotonic() - t0
    finally:
        spark.stop()


QUERY_BATCH = 2048


def query_batch_once(cores: int, index_dir: str) -> float:
    """Time a 2048-query BM25 batch in a fresh JVM at ``cores``."""
    import numpy as np

    from pdf_to_opensearch_spark.query import Searcher
    from pdf_to_opensearch_spark.session import get_spark
    from pdf_to_opensearch_spark.synth import _vocab

    spark = get_spark(f"bench_query_{cores}", cores=cores,
                      shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        rng = np.random.default_rng(7)
        vocab = _vocab()
        queries = [(i, " ".join(vocab[j] for j in
                                rng.choice(800, size=int(rng.integers(2, 6)))))
                   for i in range(QUERY_BATCH)]
        searcher = Searcher(spark, index_dir)
        searcher.search(queries[:8], k=10).collect()  # warm-up
        _wait_steady_state()
        t0 = time.monotonic()
        searcher.search(queries, k=10).collect()
        return time.monotonic() - t0
    finally:
        spark.stop()


def main() -> None:
    results: dict[str, float] = {}

    # ---- scaling evidence: same indexing job, two parallelism levels ------
    # alternating min-of-2 protocol: this sandbox VM shows multi-×
    # run-to-run drift (hypervisor burst throttling under sustained load),
    # so each level's best of two interleaved runs, with cooldowns, is the
    # fair steady-state estimate
    if DO_SCALING:
        corpus = _scaling_corpus()
        idx = os.path.join(tempfile.gettempdir(), "bench_index_scale")
        n_scale = _prepare_scaling_docs(corpus, idx)
        time.sleep(45)  # cool down after the full-parallelism prepare
        times: dict[int, list[float]] = {SCALE_LO: [], SCALE_HI: []}
        for cores in (SCALE_LO, SCALE_HI, SCALE_HI, SCALE_LO):
            times[cores].append(index_once(cores, idx))
            time.sleep(30)
        t_lo, t_hi = min(times[SCALE_LO]), min(times[SCALE_HI])
        results[f"scale_index_local{SCALE_LO}"] = round(t_lo, 3)
        results[f"scale_index_local{SCALE_HI}"] = round(t_hi, 3)
        results["scale_runs_lo"] = [round(t, 2) for t in times[SCALE_LO]]
        results["scale_runs_hi"] = [round(t, 2) for t in times[SCALE_HI]]
        results["scale_thr_lo"] = round(n_scale / t_lo, 1)
        results["scale_thr_hi"] = round(n_scale / t_hi, 1)
        results["scaling_efficiency"] = round(
            (t_lo / t_hi) / (SCALE_HI / SCALE_LO), 4)

        # query-throughput scaling over the same index (2048-query batch;
        # the serving-path counterpart of the build criterion)
        qtimes: dict[int, list[float]] = {SCALE_LO: [], SCALE_HI: []}
        for cores in (SCALE_LO, SCALE_HI, SCALE_HI, SCALE_LO):
            qtimes[cores].append(query_batch_once(cores, idx))
            time.sleep(30)
        q_lo, q_hi = min(qtimes[SCALE_LO]), min(qtimes[SCALE_HI])
        results[f"scale_query_local{SCALE_LO}"] = round(q_lo, 3)
        results[f"scale_query_local{SCALE_HI}"] = round(q_hi, 3)
        results["scale_query_qps_hi"] = round(QUERY_BATCH / q_hi, 1)
        results["query_scaling_efficiency"] = round(
            (q_lo / q_hi) / (SCALE_HI / SCALE_LO), 4)
        shutil.rmtree(idx, ignore_errors=True)

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
    timing_keys = [k for k in results
                   if k.startswith(("scale_index", "scale_query",
                                    "index_build", "bm25", "dedup",
                                    "quality", "ann", "minhash", "corpus"))
                   and "docs_per_sec" not in k and "qps" not in k]
    total = round(sum(results[k] for k in timing_keys), 3)
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
