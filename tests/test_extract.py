"""Extraction byte-identity contract (north rule) + chunk dataflow."""

import pandas as pd

from pdf_to_opensearch_spark.extract import extract_series
from pdf_to_opensearch_spark.synth import expected_text, make_pages_pdf


def test_extract_byte_identical_pandas():
    pages = make_pages_pdf(n_docs=60, seed=7)
    got = extract_series(pages["html"])
    want = expected_text(pages)
    for url, g, w in zip(pages["url"], got, want):
        assert g == w, f"extraction mismatch for {url!r}"
        assert g.encode("utf-8") == w.encode("utf-8")


def test_extract_handles_entities_and_tags():
    from pdf_to_opensearch_spark.synth import wrap_html

    text = 'a < b & "c" > d'
    s = extract_series(pd.Series([wrap_html(text, "t")]))
    assert s.iloc[0] == text


def test_extract_spark_roundtrip(spark):
    from pdf_to_opensearch_spark.extract import extract_docs
    from pdf_to_opensearch_spark.synth import make_pages

    pages = make_pages(spark, n_docs=40, seed=11, partitions=4)
    docs = extract_docs(pages).toPandas().sort_values("url", ignore_index=True)
    want = make_pages_pdf(n_docs=40, seed=11)
    assert list(docs["url"]) == list(want["url"])
    assert list(docs["text"]) == list(expected_text(want))
    # html must be pruned from the post-extraction schema
    assert "html" not in docs.columns


def test_chunk_docs_spark(spark):
    from pdf_to_opensearch_spark.chunking import chunk_docs, split_text, with_context
    from pdf_to_opensearch_spark.extract import extract_docs
    from pdf_to_opensearch_spark.synth import make_pages

    pages = make_pages(spark, n_docs=30, seed=3, partitions=4)
    chunks = with_context(chunk_docs(extract_docs(pages)))
    got = chunks.toPandas().sort_values(["url", "chunk_seq"], ignore_index=True)
    want = make_pages_pdf(n_docs=30, seed=3)
    for url, text in zip(want["url"], expected_text(want)):
        expect = split_text(text)
        sub = got[got["url"] == url]
        assert list(sub["content"]) == expect, url
        assert list(sub["chunk_seq"]) == list(range(len(expect)))
        if len(expect) > 1:
            assert sub["prev"].iloc[0] is None or pd.isna(sub["prev"].iloc[0])
            assert sub["prev"].iloc[1] == expect[0]
            assert sub["next"].iloc[0] == expect[1]


def test_extract_dispatch_formats(spark):
    """Multi-format dispatch (document_parser.py:9-34 analogue): one
    golden per branch + unknown-format error."""
    import pytest

    from pdf_to_opensearch_spark.extract import extract_docs_dispatch

    schema = "url string, format string, content binary, lang string"
    rows = [
        ("u1", "html",
         b"<html><body>Hi <b>there</b> &amp; you</body></html>", "en"),
        ("u2", "markdown",
         b"# Title\nSome *bold* [link](http://x) and ![img](y)\n"
         b"```code\nblock\n```\ntail", "en"),
        ("u3", "plain", "plain Å text".encode(), "en"),
    ]
    df = spark.createDataFrame(rows, schema)
    out = {r["url"]: r["text"] for r in extract_docs_dispatch(df).collect()}
    assert out["u1"] == "Hi there & you"
    assert out["u2"] == "Title\nSome bold link and img\n \ntail"
    assert out["u3"] == "plain Å text"
    bad = spark.createDataFrame([("u", "docx", b"x", "en")], schema)
    with pytest.raises(Exception, match="unsupported format"):
        extract_docs_dispatch(bad).collect()
