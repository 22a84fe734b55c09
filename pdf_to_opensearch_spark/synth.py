"""Deterministic synthetic ``pages`` corpus (FIXTURES.md §1).

Exactly the input_hint shape: pages(url string, warc_ts timestamp,
html binary, text string, lang string). The html column is a minimal
deterministic UTF-8 wrapper of the text so extraction (html → text) is a
real, testable transform with a byte-identical-per-url contract
(replacing the reference's per-PDF parse, pdf_processor.py:29-77).

Edge rows always included (derived from reference behaviors):
- one sentence > 2000 chars  (hard-slice path, opensearch_loader.py:496-510)
- blank-lines-only doc        (empty filter, opensearch_loader.py:491-494)
- Korean NFD text requiring NFC normalization (utils.py:268-275)
- duplicate-content docs with distinct urls (rank tie-break determinism)
- the two Korean fixture docs from the reference integration test
  (opensearch_loader.py:746-783: strawberry/tomato cultivation docs)
"""

from __future__ import annotations

import html as _html
import unicodedata
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

VOCAB_SIZE = 5000
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

# Reference integration-test fixture texts (semantics from
# opensearch_loader.py:746-783 — Korean agronomy snippets).
FIXTURE_DOCS = [
    "딸기 육묘는 3월 말에서 4월 중순에 시작합니다. 본포 재배 기간은 9월부터 이듬해 5월까지입니다.",
    "토마토 재배는 적절한 온도 관리가 중요합니다. 야간 온도는 15도 이상을 유지해야 합니다.",
]


def _vocab() -> list[str]:
    base = [
        "spark", "index", "posting", "term", "query", "score", "merge",
        "block", "shard", "token", "document", "search", "rank", "batch",
        "stream", "vector", "table", "filter", "join", "window",
    ]
    gen = [f"w{i:04d}" for i in range(VOCAB_SIZE - len(base))]
    return base + gen


def wrap_html(text: str, title: str) -> bytes:
    """Deterministic HTML wrapper; escape round-trips exactly."""
    body = _html.escape(text)
    return (
        f"<!DOCTYPE html><html><head><title>{_html.escape(title)}</title>"
        f"</head><body><main>{body}</main></body></html>"
    ).encode("utf-8")


def make_pages_pdf(n_docs: int = 1000, seed: int = 42,
                   min_len: int = 20, max_len: int = 400) -> pd.DataFrame:
    """Seeded pandas frame matching the input_hint schema + edge rows.

    ``min_len``/``max_len`` bound the per-doc token count (bench uses longer
    docs so the indexing job is compute-bound; defaults are frozen — golden
    tests depend on them)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab())
    langs = np.array(["en", "en", "en", "ko", "de", "es"])
    rows = []
    # Zipfian term draw: ranks 1..V with p ∝ 1/rank
    ranks = np.arange(1, VOCAB_SIZE + 1)
    probs = 1.0 / ranks
    probs /= probs.sum()
    n_body = max(n_docs - 7, 1)  # + 5 edge rows + 2 fixtures = n_docs
    doc_lens = rng.integers(min_len, max_len, size=n_body)
    for i in range(n_body):
        words = vocab[rng.choice(VOCAB_SIZE, size=doc_lens[i], p=probs)]
        sent_len = 12
        sents = [
            " ".join(words[j : j + sent_len]) for j in range(0, len(words), sent_len)
        ]
        text = ". ".join(sents) + "."
        rows.append((f"https://example.org/doc/{i:06d}", i, text,
                     str(langs[rng.integers(0, len(langs))])))
    k = n_body
    # edge: giant single sentence (no '.' until the end) > 2000 chars
    giant = " ".join(vocab[rng.choice(VOCAB_SIZE, size=600, p=probs)]) + "."
    rows.append((f"https://example.org/edge/giant-{k}", k, giant, "en"))
    # edge: blank-lines only
    rows.append((f"https://example.org/edge/blank-{k+1}", k + 1, "\n\n   \n\n", "en"))
    # edge: Korean NFD → NFC
    nfd = unicodedata.normalize("NFD", "한글 정규화 테스트 문서입니다. 형태 보존 확인.")
    rows.append((f"https://example.org/edge/nfd-{k+2}", k + 2, nfd, "ko"))
    # edge: duplicate content, distinct urls (tie-break)
    dup = "duplicate content row for tie break determinism."
    rows.append((f"https://example.org/edge/dup-a-{k+3}", k + 3, dup, "en"))
    rows.append((f"https://example.org/edge/dup-b-{k+4}", k + 4, dup, "en"))
    # reference fixtures
    for j, t in enumerate(FIXTURE_DOCS):
        rows.append((f"https://example.org/fixture/{j}", k + 5 + j, t, "ko"))

    urls = [r[0] for r in rows]
    texts = [unicodedata.normalize("NFC", r[2]) if "nfd" not in r[0] else r[2]
             for r in rows]
    # NOTE: the stored `text` column is the PRE-normalization ground truth for
    # the NFD row; extraction must NFC it (byte-identical contract is on the
    # extractor output vs expected_text()).
    df = pd.DataFrame({
        "url": urls,
        "warc_ts": [_EPOCH + timedelta(seconds=int(r[1]) * 60) for r in rows],
        "html": [wrap_html(t, u) for u, t in zip(urls, texts)],
        "text": texts,
        "lang": [r[3] for r in rows],
    })
    return df.sort_values("url", ignore_index=True)


def expected_text(df: pd.DataFrame) -> pd.Series:
    """Ground-truth extractor output: NFC of the stored text column."""
    return df["text"].map(lambda s: unicodedata.normalize("NFC", s))


def make_pages(spark, n_docs: int = 1000, seed: int = 42, partitions: int = 8):
    """Spark DataFrame of the synthetic corpus."""
    pdf = make_pages_pdf(n_docs, seed)
    sdf = spark.createDataFrame(pdf)
    return sdf.repartition(partitions, "url")
