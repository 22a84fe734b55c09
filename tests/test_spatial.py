"""Geometric nearest/IoU match operators vs a brute-force python reference."""

import math

import numpy as np
import pytest


def _rects(n, seed, id_name):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        x0 = float(rng.integers(0, 500))
        y0 = float(rng.integers(0, 700))
        rows.append((i, int(rng.integers(0, 4)), x0, y0,
                     x0 + float(rng.integers(5, 60)),
                     y0 + float(rng.integers(5, 40))))
    return rows


def _dist(a, b):
    dx = max(b[2] - a[4], a[2] - b[4], 0.0)
    dy = max(b[3] - a[5], a[3] - b[5], 0.0)
    return math.sqrt(dx * dx + dy * dy)


def _iou(a, b):
    ix = max(min(a[4], b[4]) - max(a[2], b[2]), 0.0)
    iy = max(min(a[5], b[5]) - max(a[3], b[3]), 0.0)
    inter = ix * iy
    union = (a[4] - a[2]) * (a[5] - a[3]) + (b[4] - b[2]) * (b[5] - b[3]) - inter
    return inter / union if union > 0 else 0.0


@pytest.fixture(scope="module")
def rect_dfs(spark):
    left = _rects(40, 1, "left_id")
    right = _rects(25, 2, "right_id")
    schema_l = "left_id long, page_key int, x0 double, y0 double, x1 double, y1 double"
    schema_r = "right_id long, page_key int, x0 double, y0 double, x1 double, y1 double"
    return (spark.createDataFrame(left, schema_l),
            spark.createDataFrame(right, schema_r), left, right)


def test_nearest_match(spark, rect_dfs):
    from pdf_to_opensearch_spark.ops.spatial import nearest_match

    ldf, rdf, left, right = rect_dfs
    got = nearest_match(ldf, rdf).toPandas().set_index("left_id")
    for a in left:
        cands = [(round(_dist(a, b), 6), b[0]) for b in right if b[1] == a[1]]
        if not cands:
            assert a[0] not in got.index
            continue
        best = min(cands)
        assert got.loc[a[0], "right_id"] == best[1]
        assert abs(got.loc[a[0], "distance"] - best[0]) < 1e-9


def test_nearest_match_threshold(spark, rect_dfs):
    from pdf_to_opensearch_spark.ops.spatial import nearest_match

    ldf, rdf, _left, _right = rect_dfs
    out = nearest_match(ldf, rdf, max_distance=15.0).toPandas()
    assert (out["distance"] <= 15.0).all()


def test_best_iou_match(spark, rect_dfs):
    from pdf_to_opensearch_spark.ops.spatial import best_iou_match

    ldf, rdf, left, right = rect_dfs
    got = best_iou_match(ldf, rdf).toPandas().set_index("left_id")
    for a in left:
        cands = [(round(_iou(a, b), 6), -b[0]) for b in right
                 if b[1] == a[1] and _iou(a, b) > 0]
        if not cands:
            assert a[0] not in got.index
            continue
        best = max(cands)
        assert got.loc[a[0], "right_id"] == -best[1]
        assert abs(got.loc[a[0], "iou"] - best[0]) < 1e-9


def test_overlap_anti_filter(spark, rect_dfs):
    from pdf_to_opensearch_spark.ops.spatial import overlap_anti_filter

    ldf, rdf, left, right = rect_dfs
    kept = set(overlap_anti_filter(
        ldf.withColumnRenamed("left_id", "tid"), rdf)
        .toPandas()["tid"])
    for a in left:
        overlaps = any(b[1] == a[1] and a[2] < b[4] and b[2] < a[4]
                       and a[3] < b[5] and b[3] < a[5] for b in right)
        assert (a[0] not in kept) == overlaps


def test_nearest_caption_or_fallback(spark):
    from pdf_to_opensearch_spark.ops.spatial import nearest_caption_or_fallback

    # page 1 has a caption; page 2 has none → fallback + aspect gate
    images = spark.createDataFrame(
        [(1, 1, 0.0, 0.0, 10.0, 10.0),    # matched (gate skipped)
         (2, 2, 0.0, 0.0, 10.0, 10.0),    # fallback, ratio 1 → kept
         (3, 2, 0.0, 0.0, 100.0, 10.0),   # fallback, ratio 10 → dropped
         (4, 2, 0.0, 0.0, 1.0, 10.0),     # fallback, ratio 0.1 → dropped
         (5, 2, 0.0, 0.0, 10.0, 0.0)],    # fallback, zero height → dropped
        "left_id long, page_key long, x0 double, y0 double, "
        "x1 double, y1 double")
    captions = spark.createDataFrame(
        [(100, 1, "Fig 1", 20.0, 0.0, 30.0, 10.0)],
        "right_id long, page_key long, caption string, x0 double, "
        "y0 double, x1 double, y1 double")
    got = (nearest_caption_or_fallback(images, captions)
           .toPandas().set_index("left_id").sort_index())
    assert list(got.index) == [1, 2]
    assert got.loc[1, "caption"] == "Fig 1"
    assert got.loc[1, "right_id"] == 100
    assert got.loc[1, "distance"] == 10.0
    assert got.loc[2, "caption"] == "NO CAPTION"
    assert got.loc[2, ["right_id", "distance"]].isna().all()
