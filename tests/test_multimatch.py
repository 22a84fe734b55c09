"""``multi_match`` over root + field posting spaces (multimatch.py) vs
per-field brute-force BM25 combined doc-at-a-time — the reference's
three-analyzed-field doc unit (opensearch_loader.py:210-237) queried the
way OpenSearch's multi_match most_fields/best_fields scores it."""

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pdf_to_opensearch_spark.extract import extract_docs
from pdf_to_opensearch_spark.fields import build_field_index
from pdf_to_opensearch_spark.indexer import IndexPaths, build_index
from pdf_to_opensearch_spark.multimatch import multi_match
from pdf_to_opensearch_spark.oracle import BruteForceBM25
from pdf_to_opensearch_spark.query import search
from pdf_to_opensearch_spark.synth import make_pages

K = 10
QUERIES = [(1, "spark index posting"), (2, "the merge join"),
           (3, "zzzz-absent-term")]
BOOSTS = {"text": 1.0, "text_prev": 0.5}


@pytest.fixture(scope="module")
def mm_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mmidx"))
    pages = make_pages(spark, n_docs=150, seed=11, partitions=4)
    docs = extract_docs(pages)
    docs = docs.withColumn(
        "text_prev",
        F.coalesce(F.lag("text").over(Window.orderBy("url")), F.lit("")))
    build_index(spark, docs, root, num_ranges=4, n_buckets=8,
                id_partitions=4)
    build_field_index(spark, root, "text_prev")
    return root


@pytest.fixture(scope="module")
def oracles(spark, mm_index):
    rows = (spark.read.parquet(IndexPaths(mm_index).docs)
            .select("doc_id", "text", "text_prev").orderBy("doc_id")
            .collect())
    ids = [r["doc_id"] for r in rows]
    return (BruteForceBM25(ids, [r["text"] for r in rows]),
            BruteForceBM25(ids, [r["text_prev"] for r in rows]))


def _combined(oracles, qtext, agg):
    """Per-doc combination of the boosted per-field brute scores."""
    o_cur, o_prev = oracles
    per_field = []
    for oracle, boost in ((o_cur, BOOSTS["text"]),
                          (o_prev, BOOSTS["text_prev"])):
        per_field.append({d: boost * s
                          for d, s in oracle.search(qtext, k=oracle.N)})
    docs = set(per_field[0]) | set(per_field[1])
    comb = {}
    for d in docs:
        vals = [pf[d] for pf in per_field if d in pf]
        comb[d] = agg(vals)
    return sorted(((d, s) for d, s in comb.items() if s > 0),
                  key=lambda kv: (-kv[1], kv[0]))[:K]


@pytest.mark.parametrize("mode,agg", [("most_fields", sum),
                                      ("best_fields", max)])
def test_multi_match_vs_brute(spark, mm_index, oracles, mode, agg):
    got = multi_match(spark, mm_index, QUERIES, dict(BOOSTS), k=K,
                      mode=mode).toPandas()
    for qid, qtext in QUERIES:
        want = _combined(oracles, qtext, agg)
        sub = got[got.query_id == qid].sort_values("rank")
        assert list(sub.doc_id) == [d for d, _ in want], (mode, qid)
        np.testing.assert_allclose(sub.score.to_numpy(),
                                   [s for _, s in want], rtol=1e-9)


def test_single_field_is_plain_search(spark, mm_index):
    """multi_match over only the root field degenerates to search():
    same docs, same scores, either mode."""
    got = (multi_match(spark, mm_index, QUERIES, {"text": 1.0}, k=K,
                       mode="best_fields")
           .toPandas().sort_values(["query_id", "rank"], ignore_index=True))
    want = (search(spark, mm_index, QUERIES, k=K, prune=True)
            .toPandas().sort_values(["query_id", "rank"], ignore_index=True))
    assert list(got.doc_id) == list(want.doc_id)
    np.testing.assert_allclose(got.score.to_numpy(), want.score.to_numpy(),
                               rtol=1e-12)


def test_bad_mode_and_empty_fields_raise(spark, mm_index):
    with pytest.raises(ValueError):
        multi_match(spark, mm_index, QUERIES, dict(BOOSTS), mode="phrase")
    with pytest.raises(ValueError):
        multi_match(spark, mm_index, QUERIES, {})


def test_dismax_tie_breaker_blend(spark, mm_index):
    """tie_breaker semantics: best_fields(tb) == max + tb·(sum − max),
    reconstructed from the most_fields (sum) and best_fields (max) runs
    on the same queries."""
    import numpy as np

    from pdf_to_opensearch_spark.multimatch import multi_match

    qs = [(1, "spark index posting"), (2, "merge block")]
    fields = {"text": 1.0, "text_prev": 0.5}
    big = 10_000
    sm = (multi_match(spark, mm_index, qs, fields, k=big,
                      mode="most_fields").toPandas()
          .set_index(["query_id", "doc_id"])["score"])
    mx = (multi_match(spark, mm_index, qs, fields, k=big,
                      mode="best_fields").toPandas()
          .set_index(["query_id", "doc_id"])["score"])
    tb = 0.3
    got = (multi_match(spark, mm_index, qs, fields, k=big,
                       mode="best_fields", tie_breaker=tb).toPandas()
           .set_index(["query_id", "doc_id"])["score"])
    want = mx + tb * (sm - mx)
    joined = got.to_frame("got").join(want.to_frame("want"), how="outer")
    assert not joined.isna().any().any()
    np.testing.assert_allclose(joined["got"], joined["want"], rtol=1e-9)


def test_dismax_tb_validation(spark, mm_index):
    import pytest

    from pdf_to_opensearch_spark.multimatch import multi_match

    with pytest.raises(ValueError):
        multi_match(spark, mm_index, [(1, "spark")], {"text": 1.0},
                    tie_breaker=1.5)
