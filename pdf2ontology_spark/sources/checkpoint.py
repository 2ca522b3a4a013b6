"""Checkpointed stage runner with per-partition lineage/metrics.

The Spark-native analog of the reference's per-stage JSON archival
(/root/reference/src/table_processors/table_content_extractor.py:401-434
and triplet_extractor.py:386-415 — its "resume" substrate: triplets are
re-derived from saved JSONs at triplet_extractor.py:542-676) and of
StageResult (/root/reference/src/pydantic_models/pipeline_models.py:25-48).

Semantics:
- ``stage(...)`` computes a DataFrame, writes it to
  ``<root>/<name>`` (parquet today, Iceberg on a real cluster), and
  appends one _metrics row per output partition. If the checkpoint is
  already complete (``_SUCCESS``), it is READ instead of recomputed —
  that is the idempotent resume path: all ids are deterministic content
  hashes, so resumed and fresh runs are byte-identical (tested in
  tests/test_resume.py).
- run_id is caller-supplied and deterministic (hash of config), never a
  wall-clock value.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointStore:
    def __init__(self, spark: SparkSession, root: str, run_id: str = "run0"):
        self.spark = spark
        self.root = root
        self.run_id = run_id

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))

    def stage(
        self, name: str, compute, resume: bool = True, lineage_key: str = "doc_id"
    ) -> DataFrame:
        """Run (or resume) one stage. ``compute`` is a zero-arg callable
        returning the stage DataFrame. Stages keyed by ``lineage_key``
        also record per-file lineage rows (see ``_record_lineage``)."""
        path = self._path(name)
        if resume and self.exists(name):
            self._record(name, path, wall_ms=0, reused=True)
            return self.spark.read.parquet(path)
        t0 = time.monotonic()
        # 16MB row groups: a row group is the atomic scan-split unit, so
        # big default blocks (128MB) written at low parallelism would cap
        # every RESUMED stage's scan parallelism at the writer's file
        # count — small groups keep checkpoints splittable at any width
        compute().write.mode("overwrite").option(
            "parquet.block.size", 16 * 1024 * 1024
        ).parquet(path)
        wall_ms = int((time.monotonic() - t0) * 1000)
        self._record(name, path, wall_ms=wall_ms, reused=False)
        self._record_lineage(name, path, lineage_key)
        return self.spark.read.parquet(path)

    def _record(self, name: str, path: str, wall_ms: int, reused: bool) -> None:
        """One _metrics row per output partition (FIXTURES.md F5).

        Reads the just-written checkpoint and counts rows per partition —
        a cheap scan of row-group metadata-sized data; on Iceberg this
        becomes a snapshot-summary read.
        """
        out = self.spark.read.parquet(path)
        per_part = out.groupBy(F.spark_partition_id().alias("partition_id")).agg(
            F.count("*").cast("long").alias("rows_out")
        )
        metrics = per_part.select(
            F.lit(name).alias("stage"),
            F.lit(self.run_id).alias("run_id"),
            F.col("partition_id").cast("int"),
            "rows_out",
            F.lit(wall_ms).cast("long").alias("wall_ms"),
            F.lit(path).alias("output_checkpoint"),
            F.lit(reused).alias("reused"),
        )
        metrics.write.mode("append").parquet(os.path.join(self.root, "_metrics"))

    def _record_lineage(self, name: str, path: str, key: str) -> None:
        """Per-(key-range, stage) lineage: one row per written FILE with
        the stage, the covered key range, and the row count — the audit
        substrate for idempotent resume (which docs does this checkpoint
        file cover?). Stages whose output has no ``key`` column (e.g.
        node/edge tables) skip doc lineage; the per-partition _metrics
        row still covers them. One cheap scan of the fresh checkpoint;
        on Iceberg this is file-level metadata already kept by the
        snapshot manifest."""
        out = self.spark.read.parquet(path)
        if key not in out.columns:
            return
        lineage = (
            out.groupBy(F.input_file_name().alias("file"))
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.min(key).alias("key_min"),
                F.max(key).alias("key_max"),
            )
            .select(
                F.lit(name).alias("stage"),
                F.lit(self.run_id).alias("run_id"),
                F.lit(key).alias("key"),
                "file",
                "n_rows",
                "key_min",
                "key_max",
            )
        )
        lineage.write.mode("append").parquet(os.path.join(self.root, "_lineage"))

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "_metrics"))

    def lineage(self) -> DataFrame:
        """Empty (typed) frame when no doc-keyed stage has written yet —
        unlike _metrics, _lineage only exists after a fresh keyed write."""
        path = os.path.join(self.root, "_lineage")
        if not os.path.exists(path):
            return self.spark.createDataFrame(
                [],
                "stage string, run_id string, key string, file string, "
                "n_rows long, key_min string, key_max string",
            )
        return self.spark.read.parquet(path)
