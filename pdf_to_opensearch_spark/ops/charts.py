"""Chart assembly operators (SURVEY.md J3/J4/J5).

Transcribes the reference's caption→chart selection pipeline
(text_based_converter_refactored.py):

- :func:`classify_drawings` — the drawing-type classifier (1128-1186):
  axis/legend by size/aspect cutoffs, main-chart by relative page rank or
  absolute thresholds.
- :func:`best_chart_match` (J3, 1187-1278) — composite caption↔drawing
  score (distance + bounded-area bonus + caption-below bonus + width
  similarity + type bonus) with the <50 fallback to plain nearest.
- :func:`merge_axis_labels` (J4, 1280-1368) — expand the chosen chart by
  axis/legend drawings inside the x/y search bands (aspect-gated),
  rect-union aggregation.
- :func:`merge_sibling_charts` (J5, 1406-1485) — horizontally-related
  sibling charts (score > 70) merged sequentially, then one pass folding
  in any drawing intersecting the merged rect. The candidate loop is
  inherently sequential state → per-page ``applyInPandas`` kernel
  (cogrouped mains × drawings); everything before it is relational.

Deterministic tie-breaks replace the reference's list-order ties:
candidates sort by (score desc, drawing_id asc); documented divergence.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .spatial import rect_distance

RECT = ("x0", "y0", "x1", "y1")


def classify_drawings(drawings: DataFrame, page_width: float,
                      page_height: float, key: str = "page_key",
                      relative: bool = True) -> DataFrame:
    """+ ``dtype`` column: axis_or_legend / main_chart / unknown
    (text_based_converter_refactored.py:1128-1186).

    ``relative=False`` reproduces the classifier's no-all_drawings mode
    (used by the sibling merge, 1453): only the axis and absolute rules.
    """
    page_area = float(page_width) * float(page_height)
    w = F.col("x1") - F.col("x0")
    h = F.col("y1") - F.col("y0")
    area = w * h
    area_ratio = area / F.lit(page_area)
    aspect = F.when(h > 0, w / h).otherwise(F.lit(0.0))
    is_axis = ((area_ratio < 0.003) | (aspect > 20) | (aspect < 0.05) |
               (w < 20) | (h < 20))
    abs_main = ((area_ratio > 0.01) & (aspect > 0.2) & (aspect < 8.0) &
                (w > 40) & (h > 40))
    d = drawings.withColumn("_aspect", aspect).withColumn("_ar", area_ratio)
    if relative:
        # larger_count = #{other drawings on the page with strictly larger
        # area} = rank(area desc) - 1; len(others) = n_page - 1
        rk = Window.partitionBy(key).orderBy((
            (F.col("x1") - F.col("x0")) * (F.col("y1") - F.col("y0"))).desc())
        n = Window.partitionBy(key)
        d = (d.withColumn("_larger", F.rank().over(rk) - 1)
             .withColumn("_n", F.count("*").over(n)))
        rel_main = ((F.col("_n") > 1) &
                    (F.col("_larger") / (F.col("_n") - 1) < 0.5) &
                    (F.col("_aspect") > 0.2) & (F.col("_aspect") < 8.0))
        dtype = (F.when(is_axis, "axis_or_legend")
                 .when(rel_main, "main_chart")
                 .when(abs_main, "main_chart")
                 .otherwise("unknown"))
        return d.withColumn("dtype", dtype).drop("_larger", "_n")
    dtype = (F.when(is_axis, "axis_or_legend")
             .when(abs_main, "main_chart")
             .otherwise("unknown"))
    return d.withColumn("dtype", dtype)


def chart_candidate_scores(captions: DataFrame, drawings: DataFrame,
                           page_width: float, page_height: float,
                           key: str = "page_key",
                           caption_id: str = "caption_id",
                           drawing_id: str = "drawing_id") -> DataFrame:
    """All (caption, same-page drawing) pairs with the composite score
    (text_based_converter_refactored.py:1187-1226) and outline distance.
    """
    page_area = float(page_width) * float(page_height)
    c = captions.select(F.col(caption_id), F.col(key),
                        *[F.col(x).alias(f"c_{x}") for x in RECT])
    d = classify_drawings(drawings, page_width, page_height, key) \
        .select(F.col(drawing_id), F.col(key), "dtype",
                *[F.col(x).alias(f"d_{x}") for x in RECT])
    j = c.join(d, key)
    dist = rect_distance(F.col("c_x0"), F.col("c_y0"), F.col("c_x1"),
                         F.col("c_y1"), F.col("d_x0"), F.col("d_y0"),
                         F.col("d_x1"), F.col("d_y1"))
    dw = F.col("d_x1") - F.col("d_x0")
    dh = F.col("d_y1") - F.col("d_y0")
    cw = F.col("c_x1") - F.col("c_x0")
    area_ratio = (dw * dh) / F.lit(page_area)
    cap_cy = (F.col("c_y0") + F.col("c_y1")) / 2
    width_sim = F.least(cw, dw) / F.greatest(cw, dw)
    score = (F.greatest(F.lit(0.0), 100.0 - dist)
             + F.when((area_ratio > 0.01) & (area_ratio < 0.3),
                      50.0 * F.least(area_ratio / 0.1, F.lit(1.0)))
             .otherwise(0.0)
             + F.when(cap_cy > F.col("d_y1"), 50.0).otherwise(0.0)
             + width_sim * 20.0
             + F.when(F.col("dtype") == "main_chart", 50.0)
             .when(F.col("dtype") == "axis_or_legend", -30.0)
             .otherwise(0.0))
    return j.withColumn("score", score).withColumn("distance", dist)


def best_chart_match(captions: DataFrame, drawings: DataFrame,
                     page_width: float, page_height: float,
                     key: str = "page_key", caption_id: str = "caption_id",
                     drawing_id: str = "drawing_id") -> DataFrame:
    """J3: per caption, the argmax-score drawing; when the best score is
    < 50, fall back to plain nearest-by-outline-distance (1264-1276).

    Returns (caption_id, drawing_id, score, used_fallback).
    """
    scored = chart_candidate_scores(captions, drawings, page_width,
                                    page_height, key, caption_id, drawing_id)
    # argmax on 6-dp-rounded values with id tie-breaks: deterministic
    # across engines (float-noise-proof), unchanged semantics otherwise
    scored = (scored.withColumn("score", F.round("score", 6))
              .withColumn("distance", F.round("distance", 6)))
    by_score = Window.partitionBy(caption_id).orderBy(
        F.col("score").desc(), F.col(drawing_id).asc())
    by_dist = Window.partitionBy(caption_id).orderBy(
        F.col("distance").asc(), F.col(drawing_id).asc())
    ranked = (scored
              .withColumn("_rs", F.row_number().over(by_score))
              .withColumn("_rd", F.row_number().over(by_dist))
              .withColumn("_best", F.max(F.when(F.col("_rs") == 1,
                                                F.col("score"))).over(
                  Window.partitionBy(caption_id))))
    fallback = F.col("_best") < 50.0
    pick = F.when(fallback, F.col("_rd") == 1).otherwise(F.col("_rs") == 1)
    return (ranked.filter(pick)
            .select(caption_id, drawing_id,
                    F.round("score", 4).alias("score"),
                    fallback.alias("used_fallback")))


def merge_axis_labels(mains: DataFrame, drawings: DataFrame,
                      page_width: float, page_height: float,
                      key: str = "page_key", main_id: str = "main_id",
                      drawing_id: str = "drawing_id",
                      expansion_ratio: float = 0.3) -> DataFrame:
    """J4 (1280-1368): expand each main chart by axis/legend drawings in
    the x-band (below, aspect > 2) / y-band (left, aspect < 0.5), clipped
    to the page; the result is the rect-union (min/max aggregate).

    Returns (main_id, x0, y0, x1, y1) of the merged rect.
    """
    W, H = float(page_width), float(page_height)
    m = mains.select(F.col(main_id), F.col(key),
                     *[F.col(x).alias(f"m_{x}") for x in RECT])
    d = classify_drawings(drawings, W, H, key).select(
        F.col(drawing_id), F.col(key), "dtype", "_aspect",
        *[F.col(x).alias(f"d_{x}") for x in RECT])
    j = m.join(d, key)
    mw = F.col("m_x1") - F.col("m_x0")
    mh = F.col("m_y1") - F.col("m_y0")
    er = F.lit(expansion_ratio)

    def clip(x0, y0, x1, y1):
        return (F.greatest(x0, F.lit(0.0)), F.greatest(y0, F.lit(0.0)),
                F.least(x1, F.lit(W)), F.least(y1, F.lit(H)))

    xs = clip(F.col("m_x0") - mw * er, F.col("m_y1"),
              F.col("m_x1") + mw * er, F.col("m_y1") + mh * 0.5)
    ys = clip(F.col("m_x0") - mw * 0.5, F.col("m_y0") - mh * er,
              F.col("m_x0"), F.col("m_y1") + mh * er)

    def intersects(sx0, sy0, sx1, sy1):
        return ((sx0 < F.col("d_x1")) & (F.col("d_x0") < sx1) &
                (sy0 < F.col("d_y1")) & (F.col("d_y0") < sy1))

    overlaps_main = ((F.col("m_x0") < F.col("d_x1")) &
                     (F.col("d_x0") < F.col("m_x1")) &
                     (F.col("m_y0") < F.col("d_y1")) &
                     (F.col("d_y0") < F.col("m_y1")))
    is_axis = F.col("dtype") == "axis_or_legend"
    x_branch = intersects(*xs) & is_axis
    add_x = x_branch & (F.col("_aspect") > 2.0)
    # the reference's elif: a drawing entering the x-branch never reaches
    # the y-branch, even when rejected by the aspect gate
    add_y = (~x_branch) & intersects(*ys) & is_axis & (F.col("_aspect") < 0.5)
    cand = j.filter(~overlaps_main & (add_x | add_y))
    merged = (m.join(cand.select(main_id,
                                 *[F.col(f"d_{x}").alias(f"a_{x}")
                                   for x in RECT]),
                     main_id, "left")
              .groupBy(main_id)
              .agg(F.least(F.first("m_x0"),
                           F.coalesce(F.min("a_x0"),
                                      F.first("m_x0"))).alias("x0"),
                   F.least(F.first("m_y0"),
                           F.coalesce(F.min("a_y0"),
                                      F.first("m_y0"))).alias("y0"),
                   F.greatest(F.first("m_x1"),
                              F.coalesce(F.max("a_x1"),
                                         F.first("m_x1"))).alias("x1"),
                   F.greatest(F.first("m_y1"),
                              F.coalesce(F.max("a_y1"),
                                         F.first("m_y1"))).alias("y1")))
    return merged


def merge_sibling_charts(mains: DataFrame, drawings: DataFrame,
                         page_width: float, page_height: float,
                         key: str = "page_key", main_id: str = "main_id",
                         drawing_id: str = "drawing_id") -> DataFrame:
    """J5 (1406-1485): merge horizontally-related sibling charts.

    Per (page, main): score each absolute-classified main_chart drawing
    with 0.4·y-alignment + 0.3·size-similarity + 0.3·distance-vs-ideal;
    keep > 70; iterate by (score desc, drawing_id asc) merging candidates
    adjacent (strictly left/right) to the RUNNING merged rect; finally,
    one list-ordered pass folds in drawings intersecting the merged rect
    (the reference's step 4, including its merged-not-in-used guard).
    Sequential state → per-page cogrouped ``applyInPandas`` kernel.

    Returns (main_id, x0, y0, x1, y1).
    """
    W, H = float(page_width), float(page_height)
    m = mains.select(key, main_id, *RECT)
    d = drawings.select(key, drawing_id, *RECT)

    def kernel(mp: pd.DataFrame, dp: pd.DataFrame) -> pd.DataFrame:
        out = []
        dr = dp.sort_values(drawing_id).to_dict("records")
        page_area = W * H

        def dtype_abs(r):
            w = r["x1"] - r["x0"]
            h = r["y1"] - r["y0"]
            ar = (w * h) / page_area
            asp = (w / h) if h > 0 else 0.0
            if ar < 0.003 or asp > 20 or asp < 0.05 or w < 20 or h < 20:
                return "axis_or_legend"
            if ar > 0.01 and 0.2 < asp < 8.0 and w > 40 and h > 40:
                return "main_chart"
            return "unknown"

        for mr in mp.sort_values(main_id).to_dict("records"):
            main = (mr["x0"], mr["y0"], mr["x1"], mr["y1"])
            used = {main}
            cands = []
            for r in dr:
                rect = (r["x0"], r["y0"], r["x1"], r["y1"])
                if rect in used:
                    continue
                if dtype_abs(r) != "main_chart":
                    continue
                mcy = (main[1] + main[3]) / 2
                rcy = (r["y0"] + r["y1"]) / 2
                y_align = max(0.0, 100.0 - abs(mcy - rcy))
                mh_, rh = main[3] - main[1], r["y1"] - r["y0"]
                mw_, rw = main[2] - main[0], r["x1"] - r["x0"]
                size = (min(mh_, rh) / max(mh_, rh)
                        + min(mw_, rw) / max(mw_, rw)) * 50.0
                hd = min(abs(r["x0"] - main[2]), abs(r["x1"] - main[0]))
                ideal = mw_ * 0.2
                dist = max(0.0, 100.0 - abs(hd - ideal))
                score = y_align * 0.4 + size * 0.3 + dist * 0.3
                if score > 70:
                    cands.append((score, r[drawing_id], rect))
            cands.sort(key=lambda t: (-t[0], t[1]))
            merged = list(main)
            for _s, _i, rect in cands:
                if rect[0] > merged[2] or rect[2] < merged[0]:
                    merged = [min(merged[0], rect[0]), min(merged[1], rect[1]),
                              max(merged[2], rect[2]), max(merged[3], rect[3])]
                    used.add(rect)
            for r in dr:
                rect = (r["x0"], r["y0"], r["x1"], r["y1"])
                if tuple(merged) in used:
                    continue  # the reference's merged-in-used guard
                if (merged[0] < rect[2] and rect[0] < merged[2] and
                        merged[1] < rect[3] and rect[1] < merged[3]):
                    merged = [min(merged[0], rect[0]), min(merged[1], rect[1]),
                              max(merged[2], rect[2]), max(merged[3], rect[3])]
                    used.add(rect)
            out.append((mr[main_id], *merged))
        return pd.DataFrame(out, columns=[main_id, "x0", "y0", "x1", "y1"])

    return (m.groupBy(key).cogroup(d.groupBy(key))
            .applyInPandas(kernel,
                           schema=f"{main_id} long, x0 double, y0 double, "
                                  "x1 double, y1 double"))
