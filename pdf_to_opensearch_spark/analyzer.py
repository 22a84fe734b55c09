"""Frozen text analyzer (SURVEY.md C21 + C1).

The reference delegates analysis to the OpenSearch ``standard`` analyzer
implied by its ``"type": "text"`` mappings (reference:
opensearch_loader.py:231-233) and applies NFC normalization upstream
(reference: utils.py:268-275, uploader.py:201). Rank-identity of BM25
top-k depends on this spec being deterministic and frozen, so it is
versioned (``ANALYZER_VERSION``) and recorded in the index manifest.

Spec v1 (``nfc-lower-word-v1``):
    1. Unicode NFC normalization
    2. lowercase (Python ``str.lower`` semantics)
    3. tokens = maximal runs matching ``[^\\W_]+`` (Unicode letters/digits,
       i.e. ``\\w`` minus underscore — mirrors UAX#29-ish word segmentation
       for the alphabets we carry and is expressible in RE2 as
       ``[\\pL\\pN]+`` for the DuckDB oracle)

Everything here is vectorized pandas/pyarrow — no per-row Python at the
Spark row level (north rule).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import ANALYZER_VERSION  # noqa: F401  (re-exported for manifests)

# \w minus underscore, Unicode-aware. RE2 equivalent: [\pL\pN]+ (DuckDB oracle).
TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

# SQL fragment for the DuckDB oracle on ASCII corpora (documents.parquet).
DUCKDB_TOKENIZE_SQL = "regexp_extract_all(lower(nfc_normalize({col})), '[0-9a-z]+')"


def tokenize_series(texts: pd.Series) -> pd.Series:
    """NFC → lower → word tokens, as a pandas Series of lists of str."""
    s = texts.fillna("").astype(str)
    # pandas-native normalize/lower are cython-vectorized; findall applies the
    # compiled regex per element inside pandas (no Spark-row Python UDF).
    return s.str.normalize("NFC").str.lower().str.findall(TOKEN_RE)


def tokenize_text(text: str) -> list[str]:
    """Scalar twin of :func:`tokenize_series` — used by the brute-force oracle
    so the engine and the oracle share one frozen spec."""
    import unicodedata

    return TOKEN_RE.findall(unicodedata.normalize("NFC", text or "").lower())


def tokenize_arrow_batch(texts: pd.Series) -> dict:
    """Arrow-C++ tokenizer for hot kernels — byte-identical to
    :func:`tokenize_series` (equivalence-tested; the Python path is the
    frozen spec, this is its bandwidth-friendly twin: no per-token Python
    string objects are ever created, only the ~|vocab| dictionary).

    NFC stays in pandas (pyarrow's utf8_normalize decomposes regardless of
    form in this build — see tests); lower + regex split + dictionary
    encoding run in Arrow. RE2 ``[^\\pL\\pN]+`` == Python ``[^\\W_]+``:
    both classes are exactly L* ∪ N*.

    Returns dict(codes int64[ntok] batch-local term codes,
                 uniq object[nuniq] term strings,
                 doc_idx int64[ntok] row index within the batch,
                 pos int64[ntok] token position within its doc,
                 dl int64[nrows] tokens per doc).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    nfc = texts.fillna("").astype(str).str.normalize("NFC")
    arr = pa.Array.from_pandas(nfc, type=pa.string())
    toks = pc.split_pattern_regex(pc.utf8_lower(arr),
                                  pattern=r"[^\pL\pN]+")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = toks.values
    lens = np.diff(toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64))
    enc = flat.dictionary_encode()
    codes_all = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = np.asarray(enc.dictionary.to_pandas(), dtype=object)
    n = len(texts)
    doc_idx_all = np.repeat(np.arange(n, dtype=np.int64), lens)
    # drop empty-string artifacts of the split (Python findall never emits
    # empties); token positions are indexes AFTER this filter, per the spec
    empty_code = None
    hits = np.flatnonzero(uniq == "")
    if hits.size:
        empty_code = int(hits[0])
    if empty_code is not None:
        mask = codes_all != empty_code
        codes_all, doc_idx_all = codes_all[mask], doc_idx_all[mask]
    dl = np.bincount(doc_idx_all, minlength=n).astype(np.int64)
    starts = np.cumsum(dl) - dl
    pos = np.arange(codes_all.size, dtype=np.int64) - starts[doc_idx_all] \
        if codes_all.size else np.empty(0, dtype=np.int64)
    return {"codes": codes_all, "uniq": uniq, "doc_idx": doc_idx_all,
            "pos": pos, "dl": dl}


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """Vectorized Arrow UDF: text → array<string> of analyzer tokens."""
    return tokenize_series(texts)


@F.pandas_udf(T.IntegerType())
def token_count_udf(texts: pd.Series) -> pd.Series:
    """Vectorized token counter (dl — document length in tokens)."""
    out = tokenize_arrow_batch(texts)["dl"].astype("int32")
    return pd.Series(out)


def with_tokens(df, text_col: str = "text", out_col: str = "tokens"):
    """Attach analyzer tokens as a column (vectorized Arrow UDF)."""
    return df.withColumn(out_col, tokenize_udf(F.col(text_col)))
