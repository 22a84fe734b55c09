"""Chunk-packing golden tests (frozen semantics of opensearch_loader.py:482-518)."""

from pdf_to_opensearch_spark.chunking import split_text


def test_basic_packing():
    text = "One sentence. Two sentence. Three sentence."
    assert split_text(text, chunk_size=2000) == [
        "One sentence. Two sentence. Three sentence."]


def test_packing_boundary():
    # budget counts sentence chars only, not join spaces (reference behavior)
    s1, s2, s3 = "a" * 10 + ".", "b" * 10 + ".", "c" * 10 + "."
    text = f"{s1} {s2} {s3}"
    out = split_text(text, chunk_size=22)
    assert out == [f"{s1} {s2}", s3]


def test_oversize_sentence_hard_slice():
    giant = "x" * 4500 + "."
    out = split_text(giant, chunk_size=2000)
    assert out == ["x" * 2000, "x" * 2000, "x" * 500 + "."]


def test_oversize_flushes_current():
    text = "short one. " + "y" * 2500 + ". tail sentence."
    out = split_text(text, chunk_size=2000)
    assert out[0] == "short one."
    assert out[1] == "y" * 2000
    assert out[2] == "y" * 500 + "."
    assert out[3] == "tail sentence."


def test_blank_doc_fallback():
    text = "\n\n   \n"
    assert split_text(text) == [text]


def test_newline_split():
    text = "line one\nline two\n\nline three"
    assert split_text(text, chunk_size=2000) == ["line one line two line three"]


def test_blank_sentences_skipped():
    text = "a.   \n  \n b."
    assert split_text(text, chunk_size=2000) == ["a. b."]
