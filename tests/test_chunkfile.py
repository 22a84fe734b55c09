"""Chunk-file parser + search-doc assembly + metadata term queries
(uploader.py:34-167 semantics) and metadata-filtered BM25 search."""

import numpy as np
import pytest

SAMPLE = """<chunk>
first chunk text line one
line two
[page_index: 15]
[URL: https://cdn.example.com/img1.png]
[URL: https://cdn.example.com/img2.png]
</chunk>
<chunk>
second chunk, no tags
</chunk>
<chunk>
third chunk
[page_index: 0]
</chunk>"""


def test_parse_chunk_files(spark):
    from pdf_to_opensearch_spark.chunkfile import parse_chunk_files

    df = spark.createDataFrame([("f1.txt", SAMPLE)], "path string, content string")
    out = parse_chunk_files(df).toPandas().sort_values("chunk_sequence",
                                                       ignore_index=True)
    assert len(out) == 3
    assert out["chunk_sequence"].tolist() == [1, 2, 3]
    assert out.loc[0, "chunk_text"] == "first chunk text line one\nline two"
    assert out.loc[0, "page_number"] == 16  # page_index + 1
    assert list(out.loc[0, "image_urls"]) == [
        "https://cdn.example.com/img1.png", "https://cdn.example.com/img2.png"]
    assert out.loc[1, "chunk_text"] == "second chunk, no tags"
    # page_number CARRIES OVER across chunks until overwritten
    # (reference never resets it — uploader.py:51,75-76)
    assert out.loc[1, "page_number"] == 16
    assert list(out.loc[1, "image_urls"]) == []
    assert out.loc[2, "page_number"] == 1


CARRY_SAMPLE = """intro line outside chunks
<chunk>
alpha
[page_index: 4]
</chunk>
<chunk>
[URL: http://a/1.png]
</chunk>
<chunk>
beta
</chunk>
stray line
<chunk>
gamma
[page_index: 7]
[URL: http://a/2.png]
</chunk>"""


def test_parse_chunk_files_reference_carryover(spark):
    """Golden values produced by hand-executing the reference loop
    (uploader.py:46-88) on an interleaved multi-chunk fixture: page
    carry-over, empty-chunk sequence skip, url carry across an empty
    close, stray-line accumulation, '\\n' joins."""
    from pdf_to_opensearch_spark.chunkfile import parse_chunk_files

    df = spark.createDataFrame([("f.txt", CARRY_SAMPLE)],
                               "path string, content string")
    out = parse_chunk_files(df).toPandas().sort_values(
        "chunk_sequence", ignore_index=True)
    assert len(out) == 3  # the url-only chunk emits nothing
    assert out["chunk_sequence"].tolist() == [1, 2, 3]
    # stray pre-chunk line accumulates into chunk 1
    assert out.loc[0, "chunk_text"] == "intro line outside chunks\nalpha"
    assert out.loc[0, "page_number"] == 5
    assert list(out.loc[0, "image_urls"]) == []
    # chunk 2: page carried from chunk 1; url carried from the EMPTY chunk
    assert out.loc[1, "chunk_text"] == "beta"
    assert out.loc[1, "page_number"] == 5
    assert list(out.loc[1, "image_urls"]) == ["http://a/1.png"]
    # chunk 3: stray mid-file line accumulates; own tags win
    assert out.loc[2, "chunk_text"] == "stray line\ngamma"
    assert out.loc[2, "page_number"] == 8
    assert list(out.loc[2, "image_urls"]) == ["http://a/2.png"]


def test_build_search_documents(spark):
    from pdf_to_opensearch_spark.chunkfile import (
        build_search_documents,
        parse_chunk_files,
    )

    df = spark.createDataFrame([("f1.txt", SAMPLE)], "path string, content string")
    chunks = parse_chunk_files(df)
    docs = build_search_documents(chunks, "test-src", "s3://bucket/f1.pdf",
                                  source_title="Title")
    out = docs.toPandas().sort_values("chunk_text_current", ignore_index=True)
    assert len(out) == 3
    first = out[out["chunk_text_current"].str.startswith("first")].iloc[0]
    assert first["chunk_text_previous"] is None
    assert first["chunk_text_next"] == "second chunk, no tags"
    assert first["metadata"]["source_type"] == "test-src"
    assert first["metadata"]["source_uri"] == "s3://bucket/f1.pdf"
    with pytest.raises(ValueError, match="required"):
        build_search_documents(chunks, "", "s3://x")


def test_delete_by_metadata(spark):
    from pdf_to_opensearch_spark.chunkfile import (
        build_search_documents,
        delete_documents_by_metadata,
        parse_chunk_files,
    )

    df = spark.createDataFrame([("f1.txt", SAMPLE)], "path string, content string")
    docs = build_search_documents(parse_chunk_files(df), "crop-guide",
                                  "s3://bucket/f1.pdf",
                                  source_title="Strawberry Guide")
    # keyword field: exact match deletes all
    kept = delete_documents_by_metadata(docs, {"source_type": "crop-guide"})
    assert kept.count() == 0
    # keyword mismatch deletes nothing
    kept = delete_documents_by_metadata(docs, {"source_type": "other"})
    assert kept.count() == 3
    # text field: analyzed containment (match_phrase analogue)
    kept = delete_documents_by_metadata(docs, {"source_title": "strawberry"})
    assert kept.count() == 0


def test_filtered_search_matches_oracle(spark, tmp_path):
    from pdf_to_opensearch_spark.extract import extract_docs
    from pdf_to_opensearch_spark.indexer import build_index
    from pdf_to_opensearch_spark.oracle import BruteForceBM25
    from pdf_to_opensearch_spark.query import search
    from pdf_to_opensearch_spark.synth import (
        expected_text,
        make_pages,
        make_pages_pdf,
    )

    root = str(tmp_path / "fidx")
    pages = make_pages(spark, n_docs=200, seed=9, partitions=4)
    build_index(spark, extract_docs(pages), root, num_ranges=4, n_buckets=8,
                id_partitions=4)
    pdf = make_pages_pdf(n_docs=200, seed=9)
    oracle = BruteForceBM25(np.arange(len(pdf)), list(expected_text(pdf)))
    allowed = {i for i, lang in enumerate(pdf["lang"]) if lang == "en"}
    queries = [(1, "spark index posting"), (2, "query merge the")]
    got = (search(spark, root, queries, k=10, doc_filter="lang = 'en'")
           .toPandas().sort_values(["query_id", "rank"], ignore_index=True))
    for qid, qtext in queries:
        want = oracle.search(qtext, 10, allowed=allowed)
        sub = got[got["query_id"] == qid]
        assert list(sub["doc_id"]) == [d for d, _ in want], qtext
        np.testing.assert_allclose(sub["score"].to_numpy(),
                                   [s for _, s in want], atol=1e-6)


def test_insert_chunk_list(spark):
    """opensearch_loader.py:261-324: global chunk_sequence across the
    flattened sub-chunk stream, prev/next links, metadata propagation."""
    from pdf_to_opensearch_spark.chunkfile import insert_chunk_list

    chunks = ["one. two. " + "x" * 30, "three"]
    out = (insert_chunk_list(spark, chunks,
                             {"source_type": "t", "source_uri": "s3://u"},
                             chunk_size=12)
           .toPandas())
    out = out.sort_values(
        by="metadata", key=lambda s: s.map(lambda m: m["chunk_sequence"]),
        ignore_index=True)
    texts = list(out["chunk_text_current"])
    # split_text(chunk_size=12): "one. two." -> ["one. two."], then the
    # 30-char run hard-slices into 12+12+6; "three" is its own chunk
    assert texts == ["one. two.", "x" * 12, "x" * 12, "x" * 6, "three"]
    assert list(out["chunk_text_previous"]) == [None] + texts[:-1]
    assert list(out["chunk_text_next"]) == texts[1:] + [None]
    assert [m["chunk_sequence"] for m in out["metadata"]] == [1, 2, 3, 4, 5]
    assert all(m["source_type"] == "t" for m in out["metadata"])
    import pytest
    with pytest.raises(ValueError, match="required"):
        insert_chunk_list(spark, ["x"], {"source_type": "t"})
