"""J3/J4/J5 chart operators vs a pure-Python transcription of the
reference algorithms (text_based_converter_refactored.py:1128-1485) on a
seeded random-rect fixture."""

import numpy as np
import pandas as pd
import pytest

W, H = 600.0, 800.0


def _rand_rects(rng, n, pages):
    rows = []
    for i in range(n):
        page = int(rng.integers(0, pages))
        x0 = float(rng.integers(0, 500))
        y0 = float(rng.integers(0, 700))
        w = float(rng.integers(5, 260))
        h = float(rng.integers(5, 220))
        rows.append((i, page, x0, y0, x0 + w, y0 + h))
    return pd.DataFrame(rows, columns=["drawing_id", "page_key",
                                       "x0", "y0", "x1", "y1"])


# ---- reference transcriptions (ground truth for the differential) ------

def ref_classify(r, page_drawings, relative=True):
    w, h = r[4] - r[2], r[5] - r[3]
    ar = (w * h) / (W * H)
    asp = (w / h) if h > 0 else 0.0
    if ar < 0.003 or asp > 20 or asp < 0.05 or w < 20 or h < 20:
        return "axis_or_legend"
    if relative:
        others = [(d[4] - d[2]) * (d[5] - d[3]) for d in page_drawings
                  if d is not r]
        if others:
            larger = sum(1 for a in others if a > w * h)
            if larger / len(others) < 0.5 and 0.2 < asp < 8.0:
                return "main_chart"
    if ar > 0.01 and 0.2 < asp < 8.0 and w > 40 and h > 40:
        return "main_chart"
    return "unknown"


def ref_outline_dist(c, d):
    dx = max(d[0] - c[2], c[0] - d[2], 0.0)
    dy = max(d[1] - c[3], c[1] - d[3], 0.0)
    return (dx * dx + dy * dy) ** 0.5


def ref_j5(main, drawings):
    """_merge_related_charts transcription (1434-1485)."""
    merged = list(main)
    used = {tuple(main)}
    cands = []
    for r in drawings:
        rect = (r[2], r[3], r[4], r[5])
        if rect in used:
            continue
        if ref_classify(r, None, relative=False) != "main_chart":
            continue
        mcy = (main[1] + main[3]) / 2
        rcy = (rect[1] + rect[3]) / 2
        y_align = max(0.0, 100.0 - abs(mcy - rcy))
        mh, rh = main[3] - main[1], rect[3] - rect[1]
        mw, rw = main[2] - main[0], rect[2] - rect[0]
        size = (min(mh, rh) / max(mh, rh) + min(mw, rw) / max(mw, rw)) * 50.0
        hd = min(abs(rect[0] - main[2]), abs(rect[2] - main[0]))
        dist = max(0.0, 100.0 - abs(hd - mw * 0.2))
        score = y_align * 0.4 + size * 0.3 + dist * 0.3
        if score > 70:
            cands.append((score, r[0], rect))
    cands.sort(key=lambda t: (-t[0], t[1]))
    for _s, _i, rect in cands:
        if rect[0] > merged[2] or rect[2] < merged[0]:
            merged = [min(merged[0], rect[0]), min(merged[1], rect[1]),
                      max(merged[2], rect[2]), max(merged[3], rect[3])]
            used.add(rect)
    for r in drawings:
        rect = (r[2], r[3], r[4], r[5])
        if tuple(merged) in used:
            continue
        if (merged[0] < rect[2] and rect[0] < merged[2] and
                merged[1] < rect[3] and rect[1] < merged[3]):
            merged = [min(merged[0], rect[0]), min(merged[1], rect[1]),
                      max(merged[2], rect[2]), max(merged[3], rect[3])]
            used.add(rect)
    return merged


def test_j5_differential_random_rects(spark):
    from pdf_to_opensearch_spark.ops.charts import merge_sibling_charts

    rng = np.random.default_rng(11)
    dpdf = _rand_rects(rng, 400, pages=25)
    mains = pd.DataFrame(
        [(p, p, 200.0, 300.0, 330.0, 430.0) for p in range(25)],
        columns=["main_id", "page_key", "x0", "y0", "x1", "y1"])
    got = (merge_sibling_charts(spark.createDataFrame(mains),
                                spark.createDataFrame(dpdf), W, H)
           .toPandas().sort_values("main_id", ignore_index=True))
    for p in range(25):
        drawings = [tuple(r) for r in
                    dpdf[dpdf.page_key == p]
                    .sort_values("drawing_id").to_numpy()]
        want = ref_j5((200.0, 300.0, 330.0, 430.0), drawings)
        row = got[got.main_id == p].iloc[0]
        assert [row.x0, row.y0, row.x1, row.y1] == want, p


def test_j3_score_and_fallback(spark):
    """Hand-checkable page: a perfect main chart below-captioned, plus a
    fallback caption far from everything (best score < 50)."""
    from pdf_to_opensearch_spark.ops.charts import best_chart_match

    drawings = spark.createDataFrame(
        [(1, 0, 100.0, 100.0, 300.0, 250.0),   # main chart
         (2, 0, 100.0, 260.0, 310.0, 268.0),   # wide flat axis
         (3, 1, 10.0, 10.0, 22.0, 22.0)],      # tiny axis on page 1
        "drawing_id long, page_key long, x0 double, y0 double, "
        "x1 double, y1 double")
    captions = spark.createDataFrame(
        [(10, 0, 110.0, 255.0, 290.0, 270.0),  # right below the chart
         (11, 1, 500.0, 700.0, 560.0, 714.0)],  # far from the tiny axis
        "caption_id long, page_key long, x0 double, y0 double, "
        "x1 double, y1 double")
    got = (best_chart_match(captions, drawings, W, H)
           .toPandas().sort_values("caption_id", ignore_index=True))
    assert got.loc[0, "drawing_id"] == 1
    assert not got.loc[0, "used_fallback"]
    # caption 11: only candidate scores < 50 → fallback nearest
    assert got.loc[1, "drawing_id"] == 3
    assert got.loc[1, "used_fallback"]


def test_j4_axis_merge_bands(spark):
    """x-band keeps only wide axes below; y-band only tall axes left."""
    from pdf_to_opensearch_spark.ops.charts import merge_axis_labels

    drawings = spark.createDataFrame(
        [(1, 0, 200.0, 200.0, 400.0, 400.0),   # the main chart
         (2, 0, 210.0, 405.0, 390.0, 415.0),   # wide flat → x-axis merge
         (3, 0, 150.0, 210.0, 165.0, 390.0),   # tall thin → y-axis merge
         (4, 0, 210.0, 405.0, 240.0, 415.0),   # in x-band, aspect 3 → wide
         (5, 0, 500.0, 500.0, 515.0, 700.0)],  # outside both bands
        "drawing_id long, page_key long, x0 double, y0 double, "
        "x1 double, y1 double")
    mains = spark.createDataFrame(
        [(1, 0, 200.0, 200.0, 400.0, 400.0)],
        "main_id long, page_key long, x0 double, y0 double, "
        "x1 double, y1 double")
    got = merge_axis_labels(mains, drawings, W, H).toPandas()
    assert len(got) == 1
    row = got.iloc[0]
    # union of main + drawing 2 + 3 + 4 (5 excluded)
    assert (row.x0, row.y0, row.x1, row.y1) == (150.0, 200.0, 400.0, 415.0)


def test_margin_band_detection(spark):
    """A4 full semantics on a hand-built page set with a minority-modal
    coordinate and a sub-threshold pattern."""
    from pdf_to_opensearch_spark.ops.headers import detect_margin_bands

    rows = []
    for page in range(30):
        y1 = 52.0 if page % 6 == 0 else 48.0  # modal y1 = 48
        rows.append((page, 100.0, 20.0, 280.0, y1, f"Annual Report {page}"))
        rows.append((page, 200.0, 770.0, 380.0, 792.0, f"Page {page}"))
        rows.append((page, 120.0, 200.0, 480.0, 700.0, f"Body {page}"))
    # sub-threshold header pattern (2 < max(30//10, 3) = 3 occurrences)
    rows += [(0, 100.0, 15.0, 250.0, 40.0, "Draft 0"),
             (1, 100.0, 15.0, 250.0, 40.0, "Draft 1")]
    blocks = spark.createDataFrame(
        rows, "page_index long, x0 double, y0 double, x1 double, "
              "y1 double, text string")
    got = detect_margin_bands(blocks, page_height=800.0, page_width=600.0,
                              n_pages=30).toPandas()
    row = got.iloc[0]
    assert row.header_y_max == 48.0        # modal, not the 52.0 minority
    assert row.footer_y_min == 770.0
    assert row.left_margin_x_max == 0.0    # default: no left patterns
    assert row.right_margin_x_min == 600.0


def test_scalars_reference_parity(spark):
    from pdf_to_opensearch_spark.ops.scalars import (
        cdn_url_join,
        safe_filename,
        url_path_basename,
    )

    def ref_safe(text, max_length=50):  # utils.py:106-119 verbatim
        safe = "".join(c for c in text if c.isalnum() or c in " -").strip()
        safe = safe.replace(" ", "_")
        return safe[:max_length] if safe else "untitled"

    cases = ["Hello World!", "  @#$%  ", "딸기 육묘-기술 (2024)",
             "a" * 80, "x - y", ""]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = df.select(safe_filename(F_col("t")).alias("s")).toPandas()["s"]
    for g, c in zip(got, cases):
        assert g == ref_safe(c), c

    import os
    from urllib.parse import urlparse

    urls = ["https://h.example.com/a/b/c.pdf?x=1#f",
            "http://h/x.json", "https://h/"]
    df = spark.createDataFrame([(u,) for u in urls], "t string")
    got = df.select(url_path_basename(F_col("t")).alias("b")).toPandas()["b"]
    for g, u in zip(got, urls):
        assert g == os.path.basename(urlparse(u).path), u

    keys = ["img/1.png", "/abs/2.png"]
    df = spark.createDataFrame([(k,) for k in keys], "t string")
    got = df.select(cdn_url_join(F_col("t"), "https://cdn.x/").alias("u")
                    ).toPandas()["u"]
    for g, k in zip(got, keys):
        assert g == os.path.join("https://cdn.x/", k), k


def F_col(name):
    from pyspark.sql import functions as F
    return F.col(name)
