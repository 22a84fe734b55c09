"""Deterministic chunker + prev/next context (SURVEY.md C3-C5, W1/W2, J7).

Freezes the reference's sentence-packing rule (opensearch_loader.py:482-518):
split on ``(?<=\\.)\\s+|\\n+``, strip + drop blanks, greedily pack sentences
into ≤``chunk_size``-char chunks joined by a single space (join spaces are
NOT counted toward the budget — reference behavior preserved); a single
sentence longer than ``chunk_size`` is hard-sliced; an all-blank document
falls back to one chunk carrying the original text.

Replaces the embedding-based semantic splitter (chunker.py:69-108,
semantic_chunker.py:7-27) per the north rule — chunk boundaries must be
reproducible without model inference.

Dataflow: docs → ``mapInPandas`` (each doc is a single row; chunking is
per-row-independent so a map, not a grouped shuffle, suffices — zero
shuffle) → chunk_seq + prev/next via ``lag/lead`` over
(partition by url order by chunk_seq), mirroring uploader.py:126-148.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

SENTENCE_SPLIT_RE = re.compile(r"(?<=\.)\s+|\n+")
CHUNK_SIZE = 2000

CHUNKS_SCHEMA = (
    "url string, lang string, chunk_seq int, content string"
)


def split_text(text: str, chunk_size: int = CHUNK_SIZE) -> list[str]:
    """Frozen packing rule — semantics of opensearch_loader.py:482-518."""
    sentences = SENTENCE_SPLIT_RE.split(text)
    chunks: list[str] = []
    cur: list[str] = []
    cur_len = 0
    for sentence in sentences:
        sentence = sentence.strip()
        if not sentence:
            continue
        if cur_len + len(sentence) <= chunk_size:
            cur.append(sentence)
            cur_len += len(sentence)
        else:
            if cur:
                chunks.append(" ".join(cur))
            if len(sentence) > chunk_size:
                chunks.extend(sentence[i : i + chunk_size]
                              for i in range(0, len(sentence), chunk_size))
                cur, cur_len = [], 0
            else:
                cur, cur_len = [sentence], len(sentence)
    if cur:
        chunks.append(" ".join(cur))
    if not chunks:
        chunks = [text]
    return chunks


def _chunk_batches(chunk_size: int = CHUNK_SIZE):
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_url, out_lang, out_seq, out_content = [], [], [], []
            chunk_lists = pdf["text"].map(
                lambda t: split_text(t, chunk_size))
            for url, lang, chunks in zip(pdf["url"], pdf["lang"],
                                         chunk_lists):
                out_url.extend([url] * len(chunks))
                out_lang.extend([lang] * len(chunks))
                out_seq.extend(range(len(chunks)))
                out_content.extend(chunks)
            yield pd.DataFrame({
                "url": pd.Series(out_url, dtype="string"),
                "lang": pd.Series(out_lang, dtype="string"),
                "chunk_seq": pd.Series(out_seq, dtype="int32"),
                "content": pd.Series(out_content, dtype="string"),
            })

    return batches


def chunk_docs(docs_df, chunk_size: int = CHUNK_SIZE):
    """docs(url, text, lang) → chunks(url, lang, chunk_seq, content)."""
    return docs_df.select("url", "lang", "text").mapInPandas(
        _chunk_batches(chunk_size), schema=CHUNKS_SCHEMA
    )


def with_context(chunks_df):
    """Attach prev/next chunk text (uploader.py:126-148 semantics) — pure
    window lag/lead, no join (SURVEY.md J7)."""
    w = Window.partitionBy("url").orderBy("chunk_seq")
    return (chunks_df
            .withColumn("prev", F.lag("content").over(w))
            .withColumn("next", F.lead("content").over(w)))
