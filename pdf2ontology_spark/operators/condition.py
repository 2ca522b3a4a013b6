"""Per-media-span condition assessment + repair action plan — the
Spark-native form of the reference's document-condition stage:

- CV metric extraction (RotationDetector/SkewDetector/QualityAssessor,
  /root/reference/src/utils/document_analysis_utils.py:103-528) — the
  metrics here are sha256-derived DETERMINISTIC STUBS (no image libs in
  this container, same stance as operators/media.py); on a real cluster
  the metric columns come from the media_features pandas UDF instead,
  and everything downstream is unchanged.
- quality composite 0.3*contrast + 0.2*brightness + 0.3*sharpness +
  0.2*(1-noise) (document_analysis_utils.py:467-473, SURVEY A14);
- condition -> action mapping + fixed priority ordering 1:rotate ..
  8:threshold (image_utils.py:261-289, SURVEY O6);
- skip predicate: good-quality spans pass through untouched
  (document_preprocessing_chain.py:164-171 — the when/otherwise
  short-circuit, SURVEY §3.2).

All JVM-side; hash math is digit-wise so the DuckDB oracle reproduces it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdf2ontology_spark import functions as fn

SKIP_QUALITY = 0.8  # document_preprocessing_chain.py:164-171


def _hexval(h: Column, start: int, n: int) -> Column:
    return F.conv(F.substring(h, start, n), 16, 10).cast("long")


# cache of the UNRESOLVED assess columns (pure expression ASTs, no
# data/plan — see triples._FUSED_EXPR_CACHE): the withColumn-chain form
# re-built ~300 py4j expression nodes per call, pure construction time
_ASSESS_COLS: list[Column] | None = None


def _assess_cols() -> list[Column]:
    global _ASSESS_COLS
    if _ASSESS_COLS is not None:
        return _ASSESS_COLS
    h = F.sha2(F.col("media_ref"), 256)
    bi, ci = _hexval(h, 1, 4), _hexval(h, 5, 4)
    si, ni = _hexval(h, 9, 4), _hexval(h, 13, 4)
    skew_deg = (_hexval(h, 17, 4) % 21 - 10).cast("int")
    rotation_deg = ((_hexval(h, 21, 2) % 4) * 90).cast("int")
    # weighted composite (0.3/0.2/0.3/0.2, A14) computed as ONE integer
    # expression divided once — float-tie-free across engines (a chained
    # double weighted sum differs by 1 ulp between Spark and DuckDB)
    quality = F.round(
        (3 * ci + 2 * bi + 3 * si + 2 * (65535 - ni)) / 655350.0, 6
    )
    # thresholds are the REFERENCE's exact ones
    # (document_analysis_utils.py:450-464 + :768): contrast<0.4 ->
    # enhance_contrast, brightness<0.3 -> gamma_correction (its own
    # action, not a contrast clause), sharpness<0.3 -> sharpen,
    # noise>0.6 -> denoise, abs(skew)>=2.0 -> deskew
    brightness = F.round(bi / 65535.0, 6)
    contrast = F.round(ci / 65535.0, 6)
    sharpness = F.round(si / 65535.0, 6)
    noise = F.round(ni / 65535.0, 6)
    raw_actions = F.concat(
        F.when(rotation_deg != 0, F.array(F.lit("rotate"))).otherwise(F.array()),
        F.when(F.abs(skew_deg) >= 2, F.array(F.lit("deskew"))).otherwise(F.array()),
        F.when(contrast < 0.4, F.array(F.lit("enhance_contrast"))).otherwise(F.array()),
        F.when(brightness < 0.3, F.array(F.lit("gamma_correction"))).otherwise(F.array()),
        F.when(noise > 0.6, F.array(F.lit("denoise"))).otherwise(F.array()),
        F.when(sharpness < 0.3, F.array(F.lit("sharpen"))).otherwise(F.array()),
    )
    needs = (quality <= SKIP_QUALITY) & (F.size(raw_actions) > 0)
    # skip predicate: good spans keep an EMPTY plan (pass-through rows,
    # same shape — the chain's copy-through at :169-171).
    # The concat above already emits actions in the O6 priority order
    # (rotate 1, deskew 2, enhance_contrast/gamma 5 — alphabetical tie
    # — denoise 6, sharpen 7) with no duplicates, so
    # fn.priority_sorted_actions(raw_actions) is the identity here and
    # the per-row interpreted sort is elided (verified exhaustively on
    # the corpus and by the shared assess oracle; the O6 operator
    # itself stays in functions/__init__.py with its own tests).
    _ASSESS_COLS = [
        F.col("doc_id"),
        F.col("offset"),
        F.col("media_ref"),
        brightness.alias("brightness"),
        contrast.alias("contrast"),
        sharpness.alias("sharpness"),
        noise.alias("noise"),
        skew_deg.alias("skew_deg"),
        rotation_deg.alias("rotation_deg"),
        quality.alias("quality"),
        needs.alias("needs_processing"),
        F.when(needs, raw_actions)
        .otherwise(F.array().cast("array<string>"))
        .alias("actions"),
    ]
    return _ASSESS_COLS


def assess_media(spans: DataFrame) -> DataFrame:
    """media spans -> condition metrics + quality + ordered action plan.

    Output: (doc_id, offset, media_ref, brightness, contrast, sharpness,
    noise, skew_deg, rotation_deg, quality, needs_processing, actions).
    """
    return spans.filter(F.col("kind") == "media").select(*_assess_cols())


def assess_media_real(spans: DataFrame, blobs: DataFrame | None = None) -> DataFrame:
    """``assess_media`` with EVERY metric family real: quality scores
    from the QualityAssessor kernels (Laplacian variance, 5x5 median
    filter) AND — since round 5 — pixel-derived skew/rotation from the
    SkewDetector/RotationDetector port (operators/orientation.py: ink
    mask -> morphological-gradient edges -> Hough accumulation -> angle
    statistics; document_analysis_utils.py:103-412). All metrics come
    from ONE Arrow stage over one raster decode
    (``media.assess_media_full``); only the byte->pixel decode itself
    remains the labeled synthetic-raster stub. Thresholds, the
    0.3/0.2/0.3/0.2 composite (inside ``overall_score``), the skip
    predicate, and the priority-ordered plan are identical to
    ``assess_media``; skew_deg is now a double (the reference's
    SkewAnalysisResult.skew_angle is a float).

    Output: (doc_id, offset, media_ref, contrast_score,
    brightness_score, sharpness_score, noise_level, quality, skew_deg,
    skew_conf, rotation_deg, rotation_conf, line_count,
    needs_processing, actions)."""
    from pdf2ontology_spark.operators import media

    df = (
        media.assess_media_full(spans, blobs)
        .withColumnRenamed("overall_score", "quality")
        .drop("text_orientation", "edge_orientation")
    )
    raw_actions = F.concat(
        F.when(F.col("rotation_deg") != 0, F.array(F.lit("rotate"))).otherwise(F.array()),
        F.when(F.abs(F.col("skew_deg")) >= 2, F.array(F.lit("deskew"))).otherwise(
            F.array()
        ),
        F.when(F.col("contrast_score") < 0.4, F.array(F.lit("enhance_contrast"))).otherwise(
            F.array()
        ),
        F.when(
            F.col("brightness_score") < 0.3, F.array(F.lit("gamma_correction"))
        ).otherwise(F.array()),
        F.when(F.col("noise_level") > 0.6, F.array(F.lit("denoise"))).otherwise(F.array()),
        F.when(F.col("sharpness_score") < 0.3, F.array(F.lit("sharpen"))).otherwise(
            F.array()
        ),
    )
    df = df.withColumn(
        "needs_processing",
        (F.col("quality") <= SKIP_QUALITY) & (F.size(raw_actions) > 0),
    )
    return df.withColumn(
        "actions",
        F.when(
            F.col("needs_processing"), fn.priority_sorted_actions(raw_actions)
        ).otherwise(F.array().cast("array<string>")),
    ).drop("issues_joined")


def condition_rollup(assessed: DataFrame) -> DataFrame:
    """Corpus-level issue/action frequency (A13 —
    document_preprocessing_chain.py:329-347): counts per action."""
    return (
        assessed.select(F.explode("actions").alias("action"))
        .groupBy("action")
        .agg(F.count("*").cast("long").alias("n"))
    )
