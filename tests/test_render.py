"""C19 table-payload serialization + S9 markdown render vs a literal
Python transcription of the reference's _generate_final_markdown loop
(text_based_converter_refactored.py:1610-1650)."""

import json

import pandas as pd

from pyspark.sql import functions as F

from pdf_to_opensearch_spark.ops.render import (
    render_markdown,
    table_markdown,
    table_split_json,
)
from pdf_to_opensearch_spark.ops.scalars import DEFAULT_CDN_URL


def _reference_markdown(items, cdn_base=DEFAULT_CDN_URL):
    # line-by-line transcription of the reference loop (incl. the
    # skip-element-0 range(1, len) and the write_page_index carry)
    write_page_index = -1
    formatted_chunks = []
    for i in range(1, len(items)):
        item = items[i]
        item_type = item.get("type")
        page_index = item.get("page_index", "N/A")
        content = item.get("content", "")
        caption = item.get("caption", "")
        s3_key = item.get("s3_key")
        chunk_parts = []
        if write_page_index != page_index:
            chunk_parts.append(f"[page_index: {page_index}]")
            write_page_index = page_index
        if item_type == "title":
            chunk_parts.append(f"## {content}")
        elif item_type in ("text", "etc"):
            chunk_parts.append(content)
        elif item_type == "table":
            if content:
                chunk_parts.append(
                    f"** 표: {caption if caption else 'no caption'} **")
                chunk_parts.append(content)
        elif item_type == "image":
            if s3_key:
                chunk_parts.append(
                    f"**그림: {caption if caption else 'no caption'}**")
                cdn = s3_key if s3_key.startswith("/") else cdn_base + s3_key
                chunk_parts.append(f"[URL: {cdn}]")
                if content:
                    chunk_parts.append(f"[내용: {content}]")
        else:
            chunk_parts.append(content)
        formatted_chunks.append("\n".join(chunk_parts))
    return "\n\n".join(formatted_chunks)


ITEMS = [
    {"type": "meta", "page_index": 0, "content": "skipped header"},
    {"type": "title", "page_index": 0, "content": "Intro"},
    {"type": "text", "page_index": 0, "content": "first paragraph"},
    {"type": "text", "page_index": 1, "content": "second page text"},
    {"type": "table", "page_index": 1, "caption": "T1",
     "content": "| a |\n| --- |\n| 1 |"},
    {"type": "table", "page_index": 1, "caption": "", "content": ""},
    {"type": "image", "page_index": 2, "caption": "", "content": "alt",
     "s3_key": "imgs/x.png"},
    {"type": "image", "page_index": 2, "content": "no key"},
    {"type": "etc", "page_index": 2, "content": "footer"},
]


def test_render_markdown_matches_reference_loop(spark):
    rows = [(1, i, it.get("page_index"), it["type"], it.get("content", ""),
             it.get("caption"), it.get("s3_key"))
            for i, it in enumerate(ITEMS)]
    df = spark.createDataFrame(
        rows, "doc_id int, seq int, page_index int, kind string, "
              "content string, caption string, s3_key string")
    got = render_markdown(df).collect()[0]["markdown"]
    assert got == _reference_markdown(ITEMS)


def test_table_split_json_matches_pandas(spark):
    pdf = pd.DataFrame({"a": ["x", "longer"], "n": ["1", "22"]})
    want = json.dumps(pdf.to_dict(orient="split"), separators=(",", ":"))
    df = spark.createDataFrame(
        [(["a", "n"], [["x", "1"], ["longer", "22"]])],
        "cols array<string>, data array<array<string>>")
    got = df.select(table_split_json(F.col("cols"), F.col("data"))
                    .alias("j")).collect()[0]["j"]
    assert got == want


def test_table_markdown_shape(spark):
    df = spark.createDataFrame(
        [(["a", "n"], [["x", "1"], ["longer", "22"]])],
        "cols array<string>, data array<array<string>>")
    got = df.select(table_markdown(F.col("cols"), F.col("data"))
                    .alias("m")).collect()[0]["m"]
    assert got == ("| a | n |\n| --- | --- |\n"
                   "| x | 1 |\n| longer | 22 |")


def test_render_markdown_random_streams(spark):
    # differential test on randomized element streams: every branch
    # combination (kinds x blank content x caption presence x s3 key x
    # page runs) against the reference-loop transcription
    import numpy as np

    rng = np.random.default_rng(77)
    kinds = ["title", "text", "etc", "table", "image", "weird"]
    all_rows, docs = [], {}
    for doc in range(6):
        n = int(rng.integers(2, 12))
        items = []
        page = 0
        for i in range(n):
            if rng.random() < 0.4:
                page += int(rng.integers(0, 2))
            kind = kinds[int(rng.integers(0, len(kinds)))]
            content = "" if rng.random() < 0.25 else f"c{doc}_{i}"
            caption = None if rng.random() < 0.5 else (
                "" if rng.random() < 0.3 else f"cap{i}")
            s3 = None if rng.random() < 0.5 else f"k/{doc}/{i}.png"
            items.append({"type": kind, "page_index": page,
                          "content": content, "caption": caption or "",
                          "s3_key": s3})
            all_rows.append((doc, i, page, kind, content, caption, s3))
        docs[doc] = items
    df = spark.createDataFrame(
        all_rows, "doc_id int, seq int, page_index int, kind string, "
                  "content string, caption string, s3_key string")
    got = {r["doc_id"]: r["markdown"]
           for r in render_markdown(df).collect()}
    for doc, items in docs.items():
        assert got[doc] == _reference_markdown(items), (doc, items)
