"""Golden tests freezing analyzer spec v1 (SURVEY.md C21/C1; FIXTURES.md §4)."""

import unicodedata

import pandas as pd

from pdf_to_opensearch_spark.analyzer import tokenize_series, tokenize_text

GOLDEN = [
    ("The Quick.  Brown-Fox!", ["the", "quick", "brown", "fox"]),
    ("BM25 k1=1.2, b=0.75", ["bm25", "k1", "1", "2", "b", "0", "75"]),
    ("under_score splits", ["under", "score", "splits"]),
    ("", []),
    ("   \n\t ", []),
    ("딸기 육묘는 3월 말", ["딸기", "육묘는", "3월", "말"]),
    ("Ümläut Café", ["ümläut", "café"]),
]


def test_golden_tokens():
    for text, expected in GOLDEN:
        assert tokenize_text(text) == expected, text


def test_nfc_normalization_identity():
    nfc = "한글 테스트"
    nfd = unicodedata.normalize("NFD", nfc)
    assert nfd != nfc  # decomposed input really differs
    assert tokenize_text(nfd) == tokenize_text(nfc)


def test_series_matches_scalar():
    texts = [t for t, _ in GOLDEN] + [unicodedata.normalize("NFD", "정규화")]
    out = tokenize_series(pd.Series(texts))
    for text, toks in zip(texts, out):
        assert list(toks) == tokenize_text(text)


def test_null_handling():
    out = tokenize_series(pd.Series([None, "a b"]))
    assert list(out.iloc[0]) == []
    assert list(out.iloc[1]) == ["a", "b"]
