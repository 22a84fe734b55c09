"""E2E: SPIMI build + BM25 top-k rank-identity vs brute-force oracle
(SURVEY.md §5.2/§5.4); resume + delete semantics."""

import numpy as np
import pytest

from pdf_to_opensearch_spark.extract import extract_docs
from pdf_to_opensearch_spark.indexer import build_index, resume_info
from pdf_to_opensearch_spark.oracle import BruteForceBM25
from pdf_to_opensearch_spark.query import search
from pdf_to_opensearch_spark.synth import expected_text, make_pages, make_pages_pdf

QUERIES = [
    (1, "spark index posting"),
    (2, "query score merge block"),
    (3, "딸기 육묘"),
    (4, "duplicate content row"),
    (5, "w0001 w0002 vector"),
    (6, "nonexistentterm12345"),
    (7, "the w0003"),
    (8, "token document search rank batch stream"),
    # repeated query terms: BM25 accumulates once per OCCURRENCE
    # (oracle.py:53-64), so 'the the' weighs 'the' twice
    (9, "the the spark"),
    (10, "index index index posting"),
    # mixed case: both sides run the frozen lowercasing analyzer
    (11, "SPARK Index POSTING"),
]
K = 10


@pytest.fixture(scope="module")
def corpus():
    pdf = make_pages_pdf(n_docs=300, seed=42)
    texts = list(expected_text(pdf))
    # oracle doc_ids = dense rank over sorted url — same rule as the engine
    pdf = pdf.sort_values("url", ignore_index=True)
    return pdf, BruteForceBM25(np.arange(len(pdf)), texts)


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index"))
    pages = make_pages(spark, n_docs=300, seed=42, partitions=4)
    docs = extract_docs(pages)
    build_index(spark, docs, root, num_ranges=5, n_buckets=8, id_partitions=4)
    return root


def _run(spark, index_dir, prune):
    out = search(spark, index_dir, QUERIES, k=K, prune=prune).toPandas()
    return out.sort_values(["query_id", "rank"], ignore_index=True)


def test_doc_ids_deterministic(spark, index_dir, corpus):
    pdf, _ = corpus
    docs = (spark.read.parquet(f"{index_dir}/docs")
            .select("doc_id", "url").toPandas()
            .sort_values("doc_id", ignore_index=True))
    assert list(docs["url"]) == list(pdf["url"])
    assert list(docs["doc_id"]) == list(range(len(pdf)))


def test_rank_identical_vs_oracle(spark, index_dir, corpus):
    _, oracle = corpus
    got = _run(spark, index_dir, prune=False)
    for qid, qtext in QUERIES:
        want = oracle.search(qtext, K)
        sub = got[got["query_id"] == qid]
        assert list(sub["doc_id"]) == [d for d, _ in want], qtext
        np.testing.assert_allclose(
            sub["score"].to_numpy(), [s for _, s in want], rtol=0, atol=1e-6)
        assert list(sub["rank"]) == list(range(1, len(want) + 1))


def test_prune_differential(spark, index_dir):
    exact = _run(spark, index_dir, prune=False)
    pruned = _run(spark, index_dir, prune=True)
    assert list(exact["doc_id"]) == list(pruned["doc_id"])
    np.testing.assert_allclose(exact["score"], pruned["score"], atol=1e-9)


def test_tie_break_by_doc_id(spark, index_dir, corpus):
    pdf, _ = corpus
    got = _run(spark, index_dir, prune=False)
    sub = got[got["query_id"] == 4]
    dup_ids = [i for i, u in enumerate(pdf["url"]) if "/edge/dup-" in u]
    top2 = list(sub["doc_id"].iloc[:2])
    assert top2 == sorted(dup_ids)  # equal scores → ascending doc_id


def test_resume_from_manifest(spark, index_dir, corpus, tmp_path):
    """Partial build + resume must equal a clean full build byte-for-byte
    at the query surface."""
    import pandas as pd

    from pdf_to_opensearch_spark.indexer import IndexPaths
    from pyspark.sql import functions as F

    root = str(tmp_path / "resume_idx")
    pages = make_pages(spark, n_docs=300, seed=42, partitions=4)
    docs = extract_docs(pages)
    build_index(spark, docs, root, num_ranges=5, n_buckets=8, id_partitions=4)
    # simulate a crash: drop postings + manifest rows for ranges {2, 4}
    paths = IndexPaths(root)
    post = spark.read.parquet(paths.postings).filter(
        ~F.col("range_id").isin(2, 4)).toPandas()
    man = spark.read.parquet(paths.manifest).filter(
        ~F.col("range_id").isin(2, 4)).toPandas()
    spark.createDataFrame(post).write.mode("overwrite").parquet(
        paths.postings)
    spark.createDataFrame(man).write.mode("overwrite").parquet(paths.manifest)

    done = resume_info(spark, root)
    assert done == {0, 1, 3}
    build_index(spark, docs, root, num_ranges=5, n_buckets=8, id_partitions=4,
                completed_ranges=done)
    a = _run(spark, index_dir, prune=False)
    b = search(spark, root, QUERIES, k=K, prune=False).toPandas() \
        .sort_values(["query_id", "rank"], ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_delete_from_index(spark, index_dir, corpus, tmp_path):
    from pdf_to_opensearch_spark.maintenance import delete_from_index

    pdf, _ = corpus
    victims = [u for u in pdf["url"] if "/edge/dup-" in u][:1]
    out = str(tmp_path / "snap")
    delete_from_index(spark, index_dir, out, victims)
    # oracle over the surviving corpus (doc_ids preserved)
    keep = [i for i, u in enumerate(pdf["url"]) if u not in victims]
    texts = list(expected_text(pdf))
    oracle2 = BruteForceBM25(np.array(keep),
                             [texts[i] for i in keep])
    got = search(spark, out, QUERIES, k=K, prune=True).toPandas() \
        .sort_values(["query_id", "rank"], ignore_index=True)
    for qid, qtext in QUERIES:
        want = oracle2.search(qtext, K)
        sub = got[got["query_id"] == qid]
        assert list(sub["doc_id"]) == [d for d, _ in want], qtext
        np.testing.assert_allclose(
            sub["score"].to_numpy(), [s for _, s in want], rtol=0, atol=1e-6)


def test_batch_kernel_matches_per_query(spark, index_dir, corpus):
    """The >32-query batch path must agree with the per-query path."""
    import pandas as pd

    _, oracle = corpus
    big = [(i, q) for i, (qid, q) in enumerate(QUERIES * 5)]
    assert len(big) > 32
    got = (search(spark, index_dir, big, k=K, prune=False).toPandas()
           .sort_values(["query_id", "rank"], ignore_index=True))
    for qid, qtext in big:
        want = oracle.search(qtext, K)
        sub = got[got["query_id"] == qid]
        assert list(sub["doc_id"]) == [d for d, _ in want], (qid, qtext)
        np.testing.assert_allclose(sub["score"].to_numpy(),
                                   [s for _, s in want], atol=1e-6)


def test_dense_batch_path_matches_loop_path(spark, index_dir):
    """The round-6 dense-accumulator batch kernel (fires at ≥16 queries,
    prune=False, no filter/specs) must agree with the per-query loop
    path: identical doc sets and ranks, scores equal to ≤1 ULP (the
    accumulator's sequential adds vs np.add.reduceat's SIMD-internal
    association). minimum_should_match=1 forces the loop path without
    changing semantics (every matched doc matches ≥1 term)."""
    big = [(i, q) for i, (qid, q) in enumerate(QUERIES * 3)]
    assert len(big) >= 16
    dense = (search(spark, index_dir, big, k=K, prune=False).toPandas()
             .sort_values(["query_id", "rank"], ignore_index=True))
    loop = (search(spark, index_dir, big, k=K, prune=False,
                   minimum_should_match=1).toPandas()
            .sort_values(["query_id", "rank"], ignore_index=True))
    assert list(dense["query_id"]) == list(loop["query_id"])
    assert list(dense["rank"]) == list(loop["rank"])
    assert list(dense["doc_id"]) == list(loop["doc_id"])
    np.testing.assert_allclose(dense["score"].to_numpy(),
                               loop["score"].to_numpy(), rtol=1e-14)


def test_k_edge_cases(spark, index_dir, corpus):
    # k=0 → empty frame, not an error; k >> corpus → every matching doc,
    # ranks dense from 1
    pdf, oracle = corpus
    assert search(spark, index_dir, [(1, "spark index")], k=0).count() == 0
    big = (search(spark, index_dir, [(1, "spark index")], k=10_000_000)
           .toPandas().sort_values("rank", ignore_index=True))
    want = oracle.search("spark index", 10_000_000)
    assert list(big["doc_id"]) == [d for d, _ in want]
    assert list(big["rank"]) == list(range(1, len(want) + 1))


def test_empty_and_punct_queries(spark, index_dir):
    res = search(spark, index_dir, [(1, ""), (2, "!!! ..."), (3, "   ")],
                 k=5)
    assert res.count() == 0


def test_search_after_cursor_pagination(spark, index_dir, corpus):
    """search_after: paging with the previous page's (score, doc_id)
    cursor reproduces the single deep query exactly — three 10-row pages
    stitched together == one k=30 query, scores bit-identical."""
    deep = (search(spark, index_dir, QUERIES, k=30, prune=True)
            .toPandas().sort_values(["query_id", "rank"],
                                    ignore_index=True))
    pages = []
    cursors: dict[int, tuple[float, int]] = {}
    live = list(QUERIES)
    for _page in range(3):
        got = (search(spark, index_dir, live, k=10,
                      after=cursors or None)
               .toPandas().sort_values(["query_id", "rank"],
                                       ignore_index=True))
        pages.append(got)
        cursors = {}
        for qid, _text in live:
            sub = got[got.query_id == qid]
            if len(sub):
                last = sub.iloc[-1]
                cursors[int(qid)] = (float(last.score), int(last.doc_id))
        # a query whose page came back empty (or short) is exhausted —
        # drop it, or the next unfiltered round restarts it from the top
        live = [(qid, t) for qid, t in live
                if int(qid) in cursors
                and len(got[got.query_id == qid]) == 10]
        if not live:
            break
    import pandas as pd

    stitched = pd.concat(pages, ignore_index=True)
    for qid in deep.query_id.unique():
        d = deep[deep.query_id == qid].reset_index(drop=True)
        s = stitched[stitched.query_id == qid].reset_index(drop=True)
        assert list(s.doc_id) == list(d.doc_id), qid
        np.testing.assert_array_equal(s.score.to_numpy(),
                                      d.score.to_numpy())


def test_search_after_exhausted_cursor_is_empty(spark, index_dir):
    """A cursor below every scoring doc returns an empty page, not an
    error."""
    got = search(spark, index_dir, [(1, "spark")], k=10,
                 after={1: (-1.0, 0)}).toPandas()
    assert len(got) == 0


def test_explain_contributions_sum_to_score(spark, index_dir):
    """explain=true parity: Σ per-term contributions == the hit's BM25
    score (within float-summation-order tolerance), and every explained
    pair is one of the query's top-k hits."""
    from pdf_to_opensearch_spark.query import explain_scores

    got = search(spark, index_dir, QUERIES, k=5).toPandas()
    exp = explain_scores(spark, index_dir, QUERIES, k=5).toPandas()
    sums = (exp.groupby(["query_id", "doc_id"])["contribution"].sum()
            .reset_index())
    merged = got.merge(sums, on=["query_id", "doc_id"], how="left")
    assert merged.contribution.notna().all()
    np.testing.assert_allclose(merged.contribution.to_numpy(),
                               merged.score.to_numpy(), rtol=1e-9)
    pairs_exp = set(map(tuple, exp[["query_id", "doc_id"]].values))
    pairs_got = set(map(tuple, got[["query_id", "doc_id"]].values))
    assert pairs_exp == pairs_got


def test_minimum_should_match_vs_bruteforce(spark, index_dir, corpus):
    """minimum_should_match rank-identity: the engine's TAAT segment-count
    mask equals a brute-force 'docs with >= m distinct query terms'
    candidate restriction (OpenSearch match-query msm semantics; scores
    are the unchanged corpus-global BM25 sums)."""
    from pdf_to_opensearch_spark.analyzer import tokenize_text
    from pdf_to_opensearch_spark.query import resolve_msm

    _, oracle = corpus
    msm = "67%"  # 3 terms -> 2, 4 terms -> 2, 6 terms -> 4
    got = search(spark, index_dir, QUERIES, k=K,
                 minimum_should_match=msm).toPandas()
    got = got.sort_values(["query_id", "rank"], ignore_index=True)
    for qid, qtext in QUERIES:
        terms = set(tokenize_text(qtext))
        m = resolve_msm(msm, len(terms))
        tally: dict[int, int] = {}
        for t in terms:
            for d in oracle.index.get(t, {}):
                tally[d] = tally.get(d, 0) + 1
        allowed = {int(oracle.doc_ids[d]) for d, c in tally.items()
                   if c >= m}
        want = oracle.search(qtext, K, allowed=allowed) if allowed else []
        sub = got[got["query_id"] == qid]
        assert list(sub["doc_id"]) == [d for d, _ in want], qtext
        np.testing.assert_allclose(
            sub["score"].to_numpy(), [s for _, s in want], rtol=0, atol=1e-6)


def test_msm_int_and_unmatchable_floor(spark, index_dir):
    """An integer msm above the live-term count matches nothing; msm=1 is
    a no-op vs the plain match query."""
    plain = search(spark, index_dir, [(1, "spark index")], k=K).toPandas()
    one = search(spark, index_dir, [(1, "spark index")], k=K,
                 minimum_should_match=1).toPandas()
    assert list(plain.doc_id) == list(one.doc_id)
    # 'nonexistentterm12345' never matches -> no doc can reach m=2
    none = search(spark, index_dir,
                  [(1, "spark nonexistentterm12345")], k=K,
                  minimum_should_match=2).toPandas()
    assert len(none) == 0
