"""Multimodal column plumbing: media spans as opaque binary payloads
with typed metadata, decoded/feature-extracted via Arrow-batched
mapInPandas (the reference's CV stages — image_utils.py:295-481,
document_analysis_utils.py — live HERE as per-batch vectorized work).

The container has no image/audio libraries, so the decode step is a
clearly-marked DETERMINISTIC STUB (sha256-derived fake dimensions and a
fake perceptual hash); everything around it — schema, salted
partitioning, Arrow batch shape, UDF signature — is the real Spark
plumbing and is tested. Swap ``_decode_stub`` for cv2/PIL on a real
cluster; the surrounding plan does not change.

Scale notes: media bytes stay OUT of the row (media_ref pointer,
resolved inside the batch UDF) so span-stage shuffles move strings, not
blobs. Partitioning salts on the media_ref hash — media-heavy docs are
exactly the north-rule skew case.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURES_SCHEMA = (
    "doc_id string, media_ref string, offset int, width int, height int, "
    "format string, phash string, decode_ok boolean"
)


def _decode_stub(media_ref: str) -> tuple[int, int, str, str, bool]:
    """STUB decode: real deployments fetch bytes at media_ref and run
    cv2/PIL here (batch-vectorized). This stub derives deterministic
    fake dimensions/format/phash from sha256(media_ref) so the plumbing
    is testable and oracle-checkable without image libs."""
    h = hashlib.sha256(media_ref.encode()).hexdigest()
    width = 64 + int(h[:4], 16) % 4032
    height = 64 + int(h[4:8], 16) % 3024
    fmt = ["png", "jpeg", "tiff"][int(h[8:10], 16) % 3]
    return width, height, fmt, h[:16], True


def media_features(spans: DataFrame) -> DataFrame:
    """media spans -> decoded feature rows via mapInPandas.

    The UDF is an iterator-of-batches function: per-executor init (model
    loads, codec setup) happens once per partition, mirroring the
    reference's module-level model loads (SURVEY.md §4.2).
    """
    media = spans.filter(F.col("kind") == "media").select("doc_id", "media_ref", "offset")
    # salt hot documents: a 50-media-span doc must not pin one partition
    n_part = media.sparkSession.conf.get("spark.sql.shuffle.partitions")
    media = media.repartition(int(n_part), F.xxhash64("doc_id", "media_ref"))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # (real impl: open codec/model handles here, once per partition)
        for pdf in batches:
            feats = [_decode_stub(ref) for ref in pdf["media_ref"]]
            out = pdf[["doc_id", "media_ref", "offset"]].copy()
            out["width"] = [f[0] for f in feats]
            out["height"] = [f[1] for f in feats]
            out["format"] = [f[2] for f in feats]
            out["phash"] = [f[3] for f in feats]
            out["decode_ok"] = [f[4] for f in feats]
            yield out

    return media.mapInPandas(decode_batches, schema=MEDIA_FEATURES_SCHEMA)


PREPROCESSED_SCHEMA = (
    "doc_id string, offset int, media_ref string, processed_ref string, "
    "applied_joined string, n_applied int, rotation_deg_after int, "
    "skew_deg_after int, changed boolean"
)


def _apply_stub(media_ref: str, actions: list[str]) -> str:
    """STUB action apply: real deployments run the cv2/PIL op per action
    here (image_utils.py:328-481 dispatch). The stub folds each action
    into a deterministic state token sha256(state ':' action), starting
    from sha256(media_ref) (the 'bytes identity') — so a row with no
    actions keeps the ORIGINAL token, i.e. passes through byte-identical,
    and any applied action provably changes it."""
    state = hashlib.sha256(media_ref.encode()).hexdigest()
    for a in actions:
        state = hashlib.sha256(f"{state}:{a}".encode()).hexdigest()
    return state


def apply_actions(assessed: DataFrame) -> DataFrame:
    """Consume the condition stage's prioritized action plan — the
    preprocessing chain's apply pass (document_preprocessing_chain.py:
    227-261): actions run in plan order inside the Arrow-batched
    mapInPandas stage; skip-predicate rows (needs_processing=false /
    empty plan) pass through with the original byte token untouched.
    rotation/skew are zeroed when their corrective action ran."""
    cols = assessed.select(
        "doc_id", "offset", "media_ref", "actions", "skew_deg", "rotation_deg"
    )
    n_part = cols.sparkSession.conf.get("spark.sql.shuffle.partitions")
    cols = cols.repartition(int(n_part), F.xxhash64("doc_id", "media_ref"))

    def run_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # (real impl: image codec / op kernels initialize here, once per
        # partition, then each batch applies ops vectorized)
        for pdf in batches:
            acts = [list(a) for a in pdf["actions"]]
            out = pdf[["doc_id", "offset", "media_ref"]].copy()
            out["processed_ref"] = [
                _apply_stub(r, a) for r, a in zip(pdf["media_ref"], acts)
            ]
            out["applied_joined"] = ["|".join(a) for a in acts]
            out["n_applied"] = [len(a) for a in acts]
            out["rotation_deg_after"] = [
                0 if "rotate" in a else r for r, a in zip(pdf["rotation_deg"], acts)
            ]
            out["skew_deg_after"] = [
                0 if "deskew" in a else s for s, a in zip(pdf["skew_deg"], acts)
            ]
            out["changed"] = [len(a) > 0 for a in acts]
            yield out

    return cols.mapInPandas(run_batches, schema=PREPROCESSED_SCHEMA)


def frame_samples(spans: DataFrame, interval_s: int = 2, max_frames: int = 32) -> DataFrame:
    """Video/animation frame-sampling plumbing: one row per sampled
    frame with a deterministic timestamp and an addressable frame_ref.

    The sampling SCHEDULE is pure JVM expressions (explode over a
    sequence — no Python in the fan-out); only the media duration is a
    clearly-marked sha256-derived STUB (no codecs in this container; a
    real deployment probes the container header in the same
    mapInPandas stage as the decode). ``max_frames`` caps the fan-out so
    a pathological 10h asset cannot explode a partition."""
    h = F.sha2(F.col("media_ref"), 256)
    duration_s = (
        F.conv(F.substring(h, 25, 3), 16, 10).cast("int") % 600 + 1
    )  # STUB: 1..600s derived from the ref hash
    media = (
        spans.filter(F.col("kind") == "media")
        .select("doc_id", "offset", "media_ref")
        .withColumn("duration_s", duration_s)
        .withColumn(
            "n_frames",
            F.least(
                (F.col("duration_s") / interval_s).cast("int") + 1, F.lit(max_frames)
            ),
        )
    )
    return media.select(
        "doc_id",
        "offset",
        "media_ref",
        "duration_s",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    ).select(
        "doc_id",
        "offset",
        "media_ref",
        "duration_s",
        "frame_idx",
        (F.col("frame_idx") * interval_s).alias("t_s"),
        F.concat_ws("#", "media_ref", F.col("frame_idx").cast("string")).alias(
            "frame_ref"
        ),
    )


def media_stats(features: DataFrame) -> DataFrame:
    """Per-document media rollup (A2-style aggregate over media)."""
    return features.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_media"),
        F.sum(F.when(F.col("decode_ok"), 1).otherwise(0)).cast("long").alias("n_ok"),
        F.round(F.avg(F.col("width") * F.col("height")), 2).alias("avg_pixels"),
        F.countDistinct("format").cast("long").alias("n_formats"),
    )
