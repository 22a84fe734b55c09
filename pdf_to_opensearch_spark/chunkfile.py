"""Chunk-file format parser + search-document assembly (SURVEY.md S7, C8,
C18, F10, W1/W2).

The reference round-trips chunks through ``<chunk>``-tagged text files
(uploader.py:34-88; README.md:109-116):

    <chunk>
    chunk text…
    [page_index: 15]
    [URL: https://…/image.png]
    </chunk>

Semantics frozen here — a line-exact transcription of the reference loop
(uploader.py:46-88):

- ``page_number = page_index + 1`` (uploader.py:76-77) and it CARRIES OVER
  to later chunks until another tag overwrites it (the reference never
  resets it);
- multiple ``[URL: …]`` lines accumulate into ``image_urls``
  (uploader.py:68-69, 78-79), reset only when a non-empty chunk closes;
- content lines are joined with ``'\\n'`` and NOT stripped;
- a ``</chunk>`` with no accumulated lines emits nothing and does NOT
  consume a ``chunk_sequence`` number (empty-chunk skip);
- stray lines outside ``<chunk>`` blocks accumulate into the next closing
  chunk (reference quirk, preserved).

Our engine produces chunks natively as a DataFrame, but the parser is part
of the reference's public surface (its input format), so it is a supported
source. A file is the parse unit: the loop is per-FILE inside an
Arrow-batched ``mapInPandas`` (like the chunker's per-document packing rule
— imperative per unit, no per-output-row Python).

``build_search_documents`` assembles the indexed unit (uploader.py:112-150):
prev/next context via lag/lead + the typed metadata struct
(opensearch_loader.py:78-88) with required-field validation
(opensearch_loader.py:453-480).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PAGE_TAG_RE = r"\[page_index:\s*(\d+)\]"
URL_TAG_RE = r"\[URL:\s*(.*?)\]"


CHUNK_ROWS_SCHEMA = ("path string, chunk_sequence int, chunk_text string, "
                     "page_number int, image_urls array<string>")


def _parse_one_file(path: str, content: str, out: list) -> None:
    """Reference algorithm, transcribed line-for-line (uploader.py:46-88)."""
    import re

    page_re = re.compile(PAGE_TAG_RE)
    url_re = re.compile(URL_TAG_RE)
    lines: list[str] = []
    page_number = None
    image_urls: list[str] = []
    chunk_sequence = 1
    for line in content.split("\n"):
        if line == "<chunk>":
            pass
        elif line == "</chunk>":
            if lines:
                out.append((path, chunk_sequence, "\n".join(lines),
                            page_number if page_number else None,
                            image_urls.copy()))
                chunk_sequence += 1
                lines = []
                image_urls = []
        else:
            m = page_re.match(line)
            if m:
                page_number = int(m.group(1)) + 1
                continue
            m = url_re.match(line)
            if m:
                image_urls.append(m.group(1))
                continue
            lines.append(line)


def parse_chunk_files(files_df: DataFrame, path_col: str = "path",
                      content_col: str = "content") -> DataFrame:
    """(path, content) of chunk files → one row per chunk.

    Output: (path, chunk_sequence int, chunk_text string,
    page_number int nullable, image_urls array<string>). ``image_urls`` is
    the empty array where the reference omits the key; ``page_number`` is
    null where omitted.
    """
    import pandas as pd

    def batches(it):
        for pdf in it:
            out: list = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                _parse_one_file(path, content, out)
            yield pd.DataFrame(
                out, columns=["path", "chunk_sequence", "chunk_text",
                              "page_number", "image_urls"])

    return files_df.select(path_col, content_col).mapInPandas(
        batches, schema=CHUNK_ROWS_SCHEMA)


METADATA_FIELDS = [
    ("source_type", "string", True),     # required (opensearch_loader.py:465)
    ("source_uri", "string", True),      # required
    ("source_title", "string", False),
    ("crop_name", "string", False),
    ("page_number", "int", False),
    ("chunk_sequence", "int", False),
]


def build_search_documents(chunks_df: DataFrame, source_type: str,
                           source_uri: str, source_title: str | None = None,
                           crop_name: str | None = None,
                           embedding_col: str | None = None) -> DataFrame:
    """Chunk rows → search documents with prev/next context + metadata
    struct (uploader.py:112-150 + opensearch_loader.py:78-88).

    Raises on missing required metadata (opensearch_loader.py:453-470
    semantics); ``created_at`` defaults to now (478-480).

    ``embedding_col``: name of an ``array<float>`` column on ``chunks_df``
    to carry into the indexed unit as ``vector_embedding`` — the knn_vector
    field of the reference mapping (opensearch_loader.py:226-230, embed
    call 586-592). Serves :mod:`hybrid`'s BM25∪kNN retrieval.
    """
    if not source_type or not source_uri:
        raise ValueError("metadata.source_type and metadata.source_uri are "
                         "required (reference: opensearch_loader.py:461-470)")
    w = Window.partitionBy(F.lit(source_uri)).orderBy("chunk_sequence")
    extra = ([F.col(embedding_col).alias("vector_embedding")]
             if embedding_col else [])
    return chunks_df.select(
        F.lag("chunk_text").over(w).alias("chunk_text_previous"),
        F.col("chunk_text").alias("chunk_text_current"),
        F.lead("chunk_text").over(w).alias("chunk_text_next"),
        *extra,
        F.struct(
            F.lit(source_type).alias("source_type"),
            F.lit(source_uri).alias("source_uri"),
            F.lit(source_title).cast("string").alias("source_title"),
            F.lit(crop_name).cast("string").alias("crop_name"),
            F.col("page_number"),
            F.col("chunk_sequence"),
            F.col("image_urls"),
            F.current_timestamp().alias("created_at"),
        ).alias("metadata"),
    ).filter(F.length(F.trim("chunk_text_current")) > 0)


def insert_chunk_list(spark, chunk_list: list[str],
                      base_metadata: dict, chunk_size: int | None = None
                      ) -> DataFrame:
    """The reference's alternate public entry (opensearch_loader.py:
    261-324): a list of texts → re-packed sub-chunks (``_split_text``) →
    one GLOBAL ``chunk_sequence`` counter across the flattened stream →
    prev/next context links → search documents carrying
    ``base_metadata + chunk_sequence``.

    The input is a driver-side Python list (that IS the reference API), so
    the packing loop runs on the driver and the result is a DataFrame
    ready for :func:`indexer.build_index` / the bulk sink. Raises on
    missing required metadata (opensearch_loader.py:453-470).
    """
    from .chunking import CHUNK_SIZE, split_text

    if not base_metadata.get("source_type") or \
            not base_metadata.get("source_uri"):
        raise ValueError("metadata.source_type and metadata.source_uri are "
                         "required (reference: opensearch_loader.py:461-470)")
    cs = chunk_size or CHUNK_SIZE
    rows = []
    seq = 0
    for chunk in chunk_list:
        for sub in split_text(chunk, cs):
            seq += 1
            rows.append((seq, sub))
    df = spark.createDataFrame(rows, "chunk_sequence int, chunk_text string")
    w = Window.orderBy("chunk_sequence")  # driver-list input: small by API
    meta = F.struct(
        *[F.lit(v).alias(k) for k, v in sorted(base_metadata.items())],
        F.col("chunk_sequence"))
    return df.select(
        F.lag("chunk_text").over(w).alias("chunk_text_previous"),
        F.col("chunk_text").alias("chunk_text_current"),
        F.lead("chunk_text").over(w).alias("chunk_text_next"),
        meta.alias("metadata"))


def metadata_term_predicate(filters: dict[str, str]):
    """Schema-typed term-query builder (opensearch_loader.py:386-408
    semantics): keyword fields → exact equality; text fields → analyzed
    containment (the match_phrase analogue for our normalized columns).

    Returns a Column predicate over a DataFrame carrying a ``metadata``
    struct, AND-ing all filters (the bool/filter context, 432-441).
    """
    keyword_fields = {"source_type", "crop_name"}
    pred = F.lit(True)
    for field, value in sorted(filters.items()):
        col = F.col(f"metadata.{field}")
        if field in keyword_fields:
            pred = pred & (col == F.lit(value))
        else:
            pred = pred & F.lower(col).contains(str(value).lower())
    return pred


def delete_documents_by_metadata(docs_df: DataFrame,
                                 filters: dict[str, str]) -> DataFrame:
    """Delete-by-metadata (uploader.py:152-167 → opensearch_loader.py:432-443):
    returns the surviving rows (relational DELETE WHERE rewrite)."""
    return docs_df.filter(~metadata_term_predicate(filters))
