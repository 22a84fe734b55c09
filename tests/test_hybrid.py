"""Hybrid retrieval (BM25 ∪ kNN, RRF fusion) vs a numpy reference."""

import numpy as np
import pytest

from pyspark.sql import functions as F

K0 = 60
DEPTH = 15
K = 8


@pytest.fixture(scope="module")
def hybrid_setup(spark, tmp_path_factory):
    from pdf_to_opensearch_spark.extract import extract_docs
    from pdf_to_opensearch_spark.indexer import build_index
    from pdf_to_opensearch_spark.oracle import BruteForceBM25
    from pdf_to_opensearch_spark.synth import (
        expected_text,
        make_pages,
        make_pages_pdf,
    )

    n, dim = 150, 16
    root = str(tmp_path_factory.mktemp("hybrid_idx"))
    pages = make_pages(spark, n_docs=n, seed=5, partitions=4)
    docs = extract_docs(pages)
    # deterministic embeddings keyed by the engine's doc_id (= url rank)
    rng = np.random.default_rng(99)
    emb = rng.standard_normal((n, dim)).astype(np.float64)
    pdf = make_pages_pdf(n_docs=n, seed=5)
    texts = list(expected_text(pdf))
    pdf = pdf.sort_values("url", ignore_index=True)
    emb_rows = [(int(i), [float(x) for x in emb[i]]) for i in range(n)]
    emb_df = spark.createDataFrame(emb_rows,
                                   "doc_id long, embedding array<double>")
    # attach embeddings to the indexed unit: build, then join the docs
    # table on the assigned doc_id and swap it in
    build_index(spark, docs, root, num_ranges=4, n_buckets=8,
                id_partitions=4)
    docs_tbl = spark.read.parquet(f"{root}/docs")
    joined = docs_tbl.join(emb_df, "doc_id")
    joined.write.mode("overwrite").parquet(f"{root}/docs_with_emb")
    import shutil
    shutil.rmtree(f"{root}/docs")
    shutil.move(f"{root}/docs_with_emb", f"{root}/docs")

    oracle = BruteForceBM25(np.arange(n), texts)
    return root, oracle, emb


def _rrf_reference(bm_ids, knn_ids, k):
    scores = {}
    for r, d in enumerate(bm_ids, start=1):
        scores[d] = scores.get(d, 0.0) + 1.0 / (K0 + r)
    for r, d in enumerate(knn_ids, start=1):
        scores[d] = scores.get(d, 0.0) + 1.0 / (K0 + r)
    ranked = sorted(scores.items(), key=lambda t: (-round(t[1], 6), t[0]))
    return [d for d, _s in ranked[:k]]


def test_search_hybrid_matches_reference(spark, hybrid_setup):
    from pdf_to_opensearch_spark.hybrid import search_hybrid

    root, oracle, emb = hybrid_setup
    qvec = emb[7]
    queries = [(1, "spark index posting", list(qvec)),
               (2, "query merge block", list(emb[3]))]
    got = (search_hybrid(spark, root, queries, k=K, depth=DEPTH)
           .toPandas().sort_values(["query_id", "rank"], ignore_index=True))
    emb_n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    for qid, qtext, qv in queries:
        # engine fuses ranks computed on 4-dp-ROUNDED scores (id ties) —
        # mirror that here
        top = oracle.search(qtext, DEPTH + 5)
        top.sort(key=lambda t: (-round(t[1], 4), t[0]))
        bm_ids = [d for d, _s in top[:DEPTH]]
        qn = np.asarray(qv) / np.linalg.norm(qv)
        sims = emb_n @ qn
        order = np.lexsort((np.arange(len(sims)), -sims))[:DEPTH]
        want = _rrf_reference(bm_ids, [int(i) for i in order], K)
        sub = got[got["query_id"] == qid]
        assert list(sub["doc_id"]) == want, qtext
        assert list(sub["rank"]) == list(range(1, len(want) + 1))


def test_knn_docs_topk_exact(spark, hybrid_setup):
    from pdf_to_opensearch_spark.hybrid import knn_docs_topk

    root, _oracle, emb = hybrid_setup
    qv = emb[42]
    got = (knn_docs_topk(spark, root, [(9, list(qv))], k=5)
           .toPandas().sort_values("rank", ignore_index=True))
    emb_n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = emb_n @ (qv / np.linalg.norm(qv))
    order = np.lexsort((np.arange(len(sims)), -sims))[:5]
    assert list(got["doc_id"]) == [int(i) for i in order]
