"""Geometric match operators (SURVEY.md J1-J6, C12-C16, F11, W4).

The reference pairs captions with drawings/images/charts by nearest
bbox-distance or best composite score per page (text_based:734-761,
802-813, 1187-1278; IoU matching image_based:307-355 + utils.py:66-98).
Those are nested Python loops over tiny per-page sets; relationally they
are **theta joins on the page key with a distance/score expression and a
window argmax**, which is how they scale to billions of pages:

- join key ``page_key`` partitions the theta join (broadcast or shuffle —
  per-page candidate sets are small, so the join never explodes);
- the distance / IoU / score is a pure column expression (codegen'd);
- ``row_number() over (partition by left_id order by metric)`` = 1 picks
  the match (F11-style threshold filters compose before the window).

Bboxes ride as 4 double columns (x0, y0, x1, y1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rect_distance(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1):
    """Outline distance between two rects (0 when overlapping) — the
    piecewise point-to-rect metric of text_based:1063-1092 as one
    codegen-able expression: Euclidean distance of the axis gaps."""
    dx = F.greatest(bx0 - ax1, ax0 - bx1, F.lit(0.0))
    dy = F.greatest(by0 - ay1, ay0 - by1, F.lit(0.0))
    return F.sqrt(dx * dx + dy * dy)


def rect_iou(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1):
    """Intersection-over-union (utils.py:66-98) as column arithmetic."""
    ix = F.greatest(F.least(ax1, bx1) - F.greatest(ax0, bx0), F.lit(0.0))
    iy = F.greatest(F.least(ay1, by1) - F.greatest(ay0, by0), F.lit(0.0))
    inter = ix * iy
    area_a = (ax1 - ax0) * (ay1 - ay0)
    area_b = (bx1 - bx0) * (by1 - by0)
    union = area_a + area_b - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def nearest_match(left: DataFrame, right: DataFrame, key: str = "page_key",
                  left_id: str = "left_id", right_id: str = "right_id",
                  max_distance: float | None = None) -> DataFrame:
    """Per left row, the nearest right row on the same key (J1/J2 shape).

    Inputs carry (id, key, x0, y0, x1, y1). Returns
    (left_id, right_id, distance) — one row per left with ≥1 candidate
    (≤ max_distance when given, the F11 threshold).
    """
    l = left.select(F.col(left_id), F.col(key),
                    *[F.col(c).alias(f"l_{c}") for c in
                      ("x0", "y0", "x1", "y1")])
    r = right.select(F.col(right_id), F.col(key),
                     *[F.col(c).alias(f"r_{c}") for c in
                       ("x0", "y0", "x1", "y1")])
    dist = rect_distance(F.col("l_x0"), F.col("l_y0"), F.col("l_x1"),
                         F.col("l_y1"), F.col("r_x0"), F.col("r_y0"),
                         F.col("r_x1"), F.col("r_y1"))
    joined = l.join(r, key).withColumn("distance", F.round(dist, 6))
    if max_distance is not None:
        joined = joined.filter(F.col("distance") <= max_distance)
    w = Window.partitionBy(left_id).orderBy(
        F.col("distance").asc(), F.col(right_id).asc())
    return (joined.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(left_id, right_id, "distance"))


def nearest_caption_or_fallback(images: DataFrame, captions: DataFrame,
                                key: str = "page_key",
                                image_id: str = "left_id",
                                caption_id: str = "right_id",
                                caption_text: str = "caption",
                                min_aspect: float = 0.15,
                                max_aspect: float = 9.5) -> DataFrame:
    """J2 with the reference's "NO CAPTION" fallback
    (text_based_converter_refactored.py:802-813): per image, the nearest
    same-page caption; an image on a page with NO captions emits a
    fallback row with caption = 'NO CAPTION' — kept only when its aspect
    ratio passes the reference's outlier gate (height > 0 and
    min_aspect < w/h < max_aspect; matched images skip the gate).

    ``captions`` carries (caption_id, key, x0..y1, caption_text).
    Returns (image_id, caption_id nullable, caption, distance nullable).
    """
    l = images.select(F.col(image_id), F.col(key),
                      *[F.col(c).alias(f"l_{c}") for c in
                        ("x0", "y0", "x1", "y1")])
    r = captions.select(F.col(caption_id), F.col(key), F.col(caption_text),
                        *[F.col(c).alias(f"r_{c}") for c in
                          ("x0", "y0", "x1", "y1")])
    dist = rect_distance(F.col("l_x0"), F.col("l_y0"), F.col("l_x1"),
                         F.col("l_y1"), F.col("r_x0"), F.col("r_y0"),
                         F.col("r_x1"), F.col("r_y1"))
    joined = (l.join(r, key, "left")
              .withColumn("distance",
                          # greatest() ignores NULLs, so an unmatched row
                          # would read distance 0.0 — force NULL instead
                          F.when(F.col(caption_id).isNotNull(),
                                 F.round(dist, 6))))
    w = Window.partitionBy(image_id).orderBy(
        F.col("distance").asc_nulls_last(), F.col(caption_id).asc_nulls_last())
    best = (joined.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1))
    h = F.col("l_y1") - F.col("l_y0")
    ratio = (F.col("l_x1") - F.col("l_x0")) / h
    aspect_ok = (h > 0) & (ratio > min_aspect) & (ratio < max_aspect)
    return (best.filter(F.col(caption_id).isNotNull() | aspect_ok)
            .select(image_id, caption_id,
                    F.coalesce(F.col(caption_text),
                               F.lit("NO CAPTION")).alias(caption_text),
                    "distance"))


def best_iou_match(left: DataFrame, right: DataFrame, key: str = "page_key",
                   left_id: str = "left_id", right_id: str = "right_id",
                   min_iou: float = 0.0) -> DataFrame:
    """Per left row, the argmax-IoU right row (J6: LLM bbox ↔ raster bbox,
    image_based:307-355)."""
    l = left.select(F.col(left_id), F.col(key),
                    *[F.col(c).alias(f"l_{c}") for c in
                      ("x0", "y0", "x1", "y1")])
    r = right.select(F.col(right_id), F.col(key),
                     *[F.col(c).alias(f"r_{c}") for c in
                       ("x0", "y0", "x1", "y1")])
    iou = rect_iou(F.col("l_x0"), F.col("l_y0"), F.col("l_x1"),
                   F.col("l_y1"), F.col("r_x0"), F.col("r_y0"),
                   F.col("r_x1"), F.col("r_y1"))
    joined = (l.join(r, key).withColumn("iou", F.round(iou, 6))
              .filter(F.col("iou") > min_iou))
    w = Window.partitionBy(left_id).orderBy(
        F.col("iou").desc(), F.col(right_id).asc())
    return (joined.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(left_id, right_id, "iou"))


def overlap_anti_filter(text: DataFrame, media: DataFrame,
                        key: str = "page_key") -> DataFrame:
    """Keep text rows NOT intersecting any media rect on the same key —
    the overlap anti-filter (F4/J10, text_based:74-79) as a left anti
    join with an intersects predicate."""
    t = text.alias("t")
    m = media.alias("m")
    intersects = ((F.col("t.x0") < F.col("m.x1")) &
                  (F.col("m.x0") < F.col("t.x1")) &
                  (F.col("t.y0") < F.col("m.y1")) &
                  (F.col("m.y0") < F.col("t.y1")))
    return t.join(m, (F.col(f"t.{key}") == F.col(f"m.{key}")) & intersects,
                  "left_anti")
