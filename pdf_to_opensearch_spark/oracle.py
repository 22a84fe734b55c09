"""Brute-force single-node BM25 oracle (SURVEY.md §5.2).

Stand-in for "the reference engine": the reference's ranked retrieval is
Lucene BM25 behind OpenSearch (reference: opensearch_loader.py:873-890,
``"type": "text"`` mapping 231-233 ⇒ default similarity k1=1.2, b=0.75).
This oracle implements the same frozen analyzer + Lucene-style formula
exhaustively over the whole corpus in numpy; the distributed engine must
be rank-identical (docIDs) and score-equal within 1e-6 against it.

idf   = ln(1 + (N - df + 0.5) / (df + 0.5))
score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
Ties broken by ascending doc_id (deterministic rank-identity).
"""

from __future__ import annotations

import numpy as np

from . import BM25_B, BM25_K1
from .analyzer import tokenize_text


def idf(N: int, df: np.ndarray) -> np.ndarray:
    df = np.asarray(df, dtype=np.float64)
    return np.log(1.0 + (N - df + 0.5) / (df + 0.5))


class BruteForceBM25:
    """In-memory exhaustive BM25 over (doc_id, text) pairs."""

    def __init__(self, doc_ids, texts, k1: float = BM25_K1, b: float = BM25_B):
        self.k1, self.b = k1, b
        self.doc_ids = np.asarray(doc_ids, dtype=np.int64)
        toks_list = [tokenize_text(t) for t in texts]
        self.doc_tokens = toks_list
        self.dl = np.array([len(t) for t in toks_list], dtype=np.int64)
        self.N = len(toks_list)
        self.avgdl = float(self.dl.mean()) if self.N else 0.0
        # term -> {doc index -> tf}
        self.index: dict[str, dict[int, int]] = {}
        for i, toks in enumerate(toks_list):
            for tok in toks:
                self.index.setdefault(tok, {})
                self.index[tok][i] = self.index[tok].get(i, 0) + 1

    def search(self, query: str, k: int = 10,
               allowed: set[int] | None = None) -> list[tuple[int, float]]:
        """Top-k (doc_id, score), score desc, tie → doc_id asc.

        ``allowed``: optional doc_id filter (bool/filter context — restricts
        candidates, does not change corpus-global statistics)."""
        scores = np.zeros(self.N, dtype=np.float64)
        for term in tokenize_text(query):
            postings = self.index.get(term)
            if not postings:
                continue
            df_t = len(postings)
            w = float(idf(self.N, np.array([df_t]))[0])
            idxs = np.fromiter(postings.keys(), dtype=np.int64)
            tfs = np.fromiter(postings.values(), dtype=np.float64)
            dls = self.dl[idxs].astype(np.float64)
            scores[idxs] += w * tfs * (self.k1 + 1) / (
                tfs + self.k1 * (1 - self.b + self.b * dls / self.avgdl)
            )
        hit = np.flatnonzero(scores > 0)
        if allowed is not None:
            mask = np.isin(self.doc_ids[hit], np.fromiter(allowed, np.int64,
                                                          len(allowed)))
            hit = hit[mask]
        order = np.lexsort((self.doc_ids[hit], -scores[hit]))[:k]
        chosen = hit[order]
        return [(int(self.doc_ids[i]), float(scores[i])) for i in chosen]

    def phrase_search(self, phrase: str, k: int = 10) -> list[tuple[int, float]]:
        """Brute-force exact-phrase top-k (match_phrase oracle):
        tf = phrase frequency, idf = Σ per-term idfs (Lucene PhraseQuery)."""
        toks = tokenize_text(phrase)
        if not toks or any(t not in self.index for t in toks):
            return []
        w = float(sum(idf(self.N, np.array([len(self.index[t])]))[0]
                      for t in toks))
        out = []
        L = len(toks)
        for i, doc in enumerate(self.doc_tokens):
            pf = sum(1 for j in range(len(doc) - L + 1)
                     if doc[j:j + L] == toks)
            if pf:
                dl = float(self.dl[i])
                score = w * pf * (self.k1 + 1) / (
                    pf + self.k1 * (1 - self.b + self.b * dl / self.avgdl))
                out.append((int(self.doc_ids[i]), score))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]
