"""Scalar string utilities (SURVEY.md C6, C17, C20) — pure codegen
column expressions, each a transcription of a reference helper.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_CDN_URL = "https://cdn.example.invalid/"  # reference keeps a real
# CloudFront host here (utils.py:13); ours is a neutral placeholder.


def safe_filename(col: Column, max_length: int = 50) -> Column:
    """C6 — get_safe_filename (utils.py:106-119): keep alphanumerics,
    spaces and '-', strip, spaces→'_', truncate, 'untitled' fallback.

    Unicode note: Python ``str.isalnum`` is Unicode-aware, so the keep
    class is ``\\p{L}\\p{N}`` (letters incl. Korean + digits), not ASCII.
    """
    kept = F.regexp_replace(col, r"[^\p{L}\p{N} -]", "")
    stripped = F.trim(kept)
    underscored = F.regexp_replace(stripped, " ", "_")
    truncated = F.substring(underscored, 1, max_length)
    return F.when(F.length(underscored) > 0, truncated).otherwise(
        F.lit("untitled"))


def url_path_basename(col: Column) -> Column:
    """C17 — ``os.path.basename(urlparse(uri).path)``
    (opensearch_loader.py:642, 690): drop scheme+authority, drop
    query/fragment, take the last path segment. Equivalent to the
    reference for standard http(s) URLs."""
    path = F.regexp_replace(col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "")
    path = F.regexp_replace(path, r"[?#].*$", "")
    return F.regexp_extract(path, r"([^/]*)$", 1)


def cdn_url_join(key: Column, base_url: str = DEFAULT_CDN_URL) -> Column:
    """C20 — generate_cdn_url (utils.py:148-159) = ``os.path.join(base,
    key)`` posix semantics: an absolute key REPLACES the base; otherwise
    exactly one '/' separates them."""
    base = base_url if base_url.endswith("/") else base_url + "/"
    return F.when(key.startswith("/"), key).otherwise(
        F.concat(F.lit(base), key))
