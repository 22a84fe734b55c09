"""Output rendering (SURVEY.md C19 + the S9 markdown surface).

The reference serializes its element stream twice per document
(text_based_converter_refactored.py:1580-1650):

- table payloads → ``to_dict(orient="split")`` for the JSON sink and
  ``to_markdown(index=False)`` for the markdown sink;
- the full element stream → one markdown document via
  ``_generate_final_markdown`` (title/text/etc/table/image dispatch,
  ``[page_index: N]`` markers on page change, chunks joined by blank
  lines).

Both are reproduced here as PURE column expressions (whole-stage
codegen; the per-document render is a groupBy over pre-sorted structs,
no Python), so each has an exact DuckDB oracle. Pipe tables are emitted
in unpadded GitHub style — the reference's tabulate padding is
column-width cosmetics (and tabulate is not installable here to
byte-match); cell content and structure are identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .scalars import DEFAULT_CDN_URL, cdn_url_join


def table_split_json(columns: Column, data: Column) -> Column:
    """C19 — ``DataFrame.to_dict(orient="split")`` (text_based:1604-1606)
    as a JSON string: ``{"index":[0..n-1],"columns":[...],"data":[[...]]}``
    (pandas key order). ``columns``: array<string>; ``data``:
    array<array<string>>."""
    n = F.size(data)
    idx = F.when(n > 0, F.sequence(F.lit(0), n - 1)) \
        .otherwise(F.array().cast("array<int>"))
    return F.to_json(F.struct(idx.alias("index"),
                              columns.alias("columns"),
                              data.alias("data")))


def table_markdown(columns: Column, data: Column) -> Column:
    """C19 — pipe-table render of a (columns, rows) payload
    (text_based:1637 ``to_markdown(index=False)``; unpadded GFM, see
    module docstring): header, ``---`` separator, one line per row."""
    header = F.concat(F.lit("| "), F.array_join(columns, " | "), F.lit(" |"))
    sep = F.concat(F.lit("| "),
                   F.array_join(F.transform(columns, lambda _: F.lit("---")),
                                " | "),
                   F.lit(" |"))
    rows = F.transform(
        data, lambda r: F.concat(F.lit("| "), F.array_join(r, " | "),
                                 F.lit(" |")))
    return F.array_join(F.concat(F.array(header, sep), rows), "\n")


def render_markdown(elements: DataFrame, doc_col: str = "doc_id",
                    seq_col: str = "seq", page_col: str = "page_index",
                    kind_col: str = "kind", content_col: str = "content",
                    caption_col: str = "caption", s3_key_col: str = "s3_key",
                    cdn_base: str = DEFAULT_CDN_URL) -> DataFrame:
    """S9 markdown surface — ``_generate_final_markdown``
    (text_based:1610-1650) over an element stream:

    - elements iterate in ``seq`` order; the FIRST element of each doc is
      skipped (the reference's ``range(1, len(...))`` — frozen behavior);
    - a ``[page_index: N]`` marker line precedes an element whose page
      differs from the previous element's (lag, initial -1 → the first
      emitted element always carries one);
    - title → ``## content``; text/etc/other → content as-is;
    - table → ``** 표: {caption|'no caption'} **`` + the pre-rendered
      table markdown in ``content`` (emitted only when content is
      non-empty — the reference's ``not content.empty`` guard);
    - image → with an s3_key: ``**그림: {caption|'no caption'}**`` +
      ``[URL: {cdn}]`` (C20 join) + ``[내용: content]`` when content is
      non-empty; without one, nothing;
    - parts join with ``\\n`` inside an element, elements with ``\\n\\n``.

    Returns (doc, markdown).
    """
    d, k, c = F.col(doc_col), F.col(kind_col), F.col(content_col)
    cap = F.coalesce(F.col(caption_col), F.lit(""))
    cap_or_no = F.when(cap != "", cap).otherwise(F.lit("no caption"))
    s3 = F.col(s3_key_col)
    w = Window.partitionBy(doc_col).orderBy(seq_col)
    # the reference's write_page_index carry compares each element to the
    # previous EMITTED element's page (initial -1), i.e. the lag must run
    # AFTER the skip-first filter — element 0's page never participates
    emitted = (elements
               .withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") > 1))  # reference skips element 0
    we = Window.partitionBy(doc_col).orderBy(seq_col)
    prev_page = F.lag(F.col(page_col), 1, -1).over(we)
    marker = F.when(F.col(page_col) != prev_page,
                    F.concat(F.lit("[page_index: "),
                             F.col(page_col).cast("string"), F.lit("]")))
    body = (
        F.when(k == "title", F.concat(F.lit("## "), c))
        .when(k == "table",
              F.when((c.isNotNull()) & (c != ""),
                     F.concat(F.lit("** 표: "), cap_or_no, F.lit(" **\n"), c)))
        .when(k == "image",
              F.when(s3.isNotNull(),
                     F.concat(
                         F.lit("**그림: "), cap_or_no, F.lit("**\n[URL: "),
                         cdn_url_join(s3, cdn_base), F.lit("]"),
                         F.when((c.isNotNull()) & (c != ""),
                                F.concat(F.lit("\n[내용: "), c, F.lit("]")))
                         .otherwise(F.lit("")))))
        .otherwise(c))  # text / etc / unknown kinds pass through
    chunk = F.concat_ws("\n", marker, body)  # concat_ws skips NULL marker
    ranked = emitted.withColumn("_chunk", chunk)
    return (ranked.groupBy(d)
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("_rn").alias("rn"),
                                 F.col("_chunk").alias("ch")))),
                    lambda s: s.getField("ch")),
                "\n\n").alias("markdown")))
