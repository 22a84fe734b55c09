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


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """Vectorized Arrow UDF: text → array<string> of analyzer tokens."""
    return tokenize_series(texts)


@F.pandas_udf(T.IntegerType())
def token_count_udf(texts: pd.Series) -> pd.Series:
    """Vectorized token counter (dl — document length in tokens)."""
    return tokenize_series(texts).str.len().astype("int32")


def with_tokens(df, text_col: str = "text", out_col: str = "tokens"):
    """Attach analyzer tokens as a column (vectorized Arrow UDF)."""
    return df.withColumn(out_col, tokenize_udf(F.col(text_col)))
