"""Repeated header/footer/margin pattern detection (SURVEY.md A4).

Transcribes the reference's `_detect_header_footer_from_etc_texts`
(text_based_converter_refactored.py:372-482):

1. band assignment, in the reference's elif order —
   header: ``y1 < H·0.15``; footer: ``y0 > H·0.85``;
   left: ``x1 < W·0.15``; right: ``x0 > W·0.85``;
2. group by digit-stripped pattern ``trim(re.sub(r'\\d+', '', text))``;
3. keep patterns with occurrences ≥ threshold —
   ``max(n_pages // 10, 3)`` for header/footer, ``3`` for margins;
4. pick the most frequent pattern, then the MODAL boundary coordinate of
   its occurrences (header → y1, footer → y0, left → x1, right → x0);
5. defaults when no pattern qualifies: header 0, footer H, left 0, right W.

Deterministic tie-breaks (the reference inherits dict/Counter insertion
order — documented divergence): most-frequent pattern ties break by
pattern ascending; modal-coordinate ties break by coordinate ascending.

Everything is relational (groupBy + windows) — no UDF, scales as two tiny
aggregations over the block table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KINDS = [
    # (kind, boundary expr name, default expr)
    ("header", "y1", "0.0"),
    ("footer", "y0", "H"),
    ("left", "x1", "0.0"),
    ("right", "x0", "W"),
]


def detect_margin_bands(blocks: DataFrame, page_height: float,
                        page_width: float, n_pages: int,
                        text_col: str = "text") -> DataFrame:
    """blocks(page_index, x0, y0, x1, y1, text) → one row:
    (header_y_max, footer_y_min, left_margin_x_max, right_margin_x_min).
    """
    H, W = float(page_height), float(page_width)
    y_occ = max(n_pages // 10, 3)
    x_occ = 3

    pattern = F.trim(F.regexp_replace(F.col(text_col), "[0-9]+", ""))
    kind = (F.when(F.col("y1") < H * 0.15, F.lit("header"))
            .when(F.col("y0") > H * 0.85, F.lit("footer"))
            .when(F.col("x1") < W * 0.15, F.lit("left"))
            .when(F.col("x0") > W * 0.85, F.lit("right")))
    coord = (F.when(F.col("_kind") == "header", F.col("y1"))
             .when(F.col("_kind") == "footer", F.col("y0"))
             .when(F.col("_kind") == "left", F.col("x1"))
             .otherwise(F.col("x0")))
    thresh = F.when(F.col("_kind").isin("header", "footer"),
                    F.lit(y_occ)).otherwise(F.lit(x_occ))

    banded = (blocks
              .withColumn("_kind", kind)
              .filter(F.col("_kind").isNotNull())
              .withColumn("_pattern", pattern)
              .withColumn("_coord", coord)
              .withColumn("_thresh", thresh))
    # per-(kind, pattern) occurrence counts; valid = count >= threshold
    pat_w = Window.partitionBy("_kind", "_pattern")
    counted = (banded
               .withColumn("_occ", F.count("*").over(pat_w))
               .filter(F.col("_occ") >= F.col("_thresh")))
    # most frequent pattern per kind (tie → pattern asc)
    best_w = Window.partitionBy("_kind").orderBy(
        F.col("_occ").desc(), F.col("_pattern").asc())
    best = (counted
            .withColumn("_prn", F.dense_rank().over(best_w))
            .filter(F.col("_prn") == 1))
    # modal coordinate within the winning pattern (tie → coord asc)
    coord_counts = (best.groupBy("_kind", "_coord")
                    .agg(F.count("*").alias("_cn")))
    modal_w = Window.partitionBy("_kind").orderBy(
        F.col("_cn").desc(), F.col("_coord").asc())
    modal = (coord_counts
             .withColumn("_crn", F.row_number().over(modal_w))
             .filter(F.col("_crn") == 1)
             .select("_kind", "_coord"))
    # fold the ≤4 rows into the reference's result dict shape w/ defaults
    # (a global agg yields exactly ONE row even when no kind qualifies)
    agg = modal.agg(*[
        F.max(F.when(F.col("_kind") == k, F.col("_coord"))).alias(k)
        for k, _c, _d in KINDS
    ])
    return agg.select(
        F.coalesce(F.col("header"), F.lit(0.0)).alias("header_y_max"),
        F.coalesce(F.col("footer"), F.lit(H)).alias("footer_y_min"),
        F.coalesce(F.col("left"), F.lit(0.0)).alias("left_margin_x_max"),
        F.coalesce(F.col("right"), F.lit(W)).alias("right_margin_x_min"),
    )
