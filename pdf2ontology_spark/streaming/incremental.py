"""Incremental triple extraction via Structured Streaming.

The reference is strictly batch (SURVEY.md §2.9); the target's
incremental story is checkpointed batch resume. This module adds the
natural streaming extension anyway: new document parquet files landing
in a directory are picked up per micro-batch and extracted with the
SAME operator functions via ``foreachBatch`` (each micro-batch is a
plain batch DataFrame there). The extraction is the FUSED single-scan
plan (``triples.all_triples_fused``): per-document array expressions,
no window functions and no shuffle — so each micro-batch is one narrow
map-side pass, exactly the shape you want for continuous ingest, and
the incremental surface exercises the same flagship plan as batch
(equivalence pinned by tests/test_media_streaming.py, including a
3-chunk incremental run).

Delivery semantics: the streaming checkpoint gives exactly-once source
tracking; the parquet append sink inside foreachBatch is at-least-once
on retry (idempotent downstream thanks to deterministic content ids —
consumers dedupe on the triple's content hash). On Iceberg the sink
becomes a MERGE and is exactly-once.

``stream_dedup_first_seen`` is the stateful extension: streaming
exact-dedup with applyInPandasWithState — the custom stateful operator
shape a training-data ingest pipeline needs (drop re-crawled duplicates
the moment they arrive, across micro-batches and restarts).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from pdf2ontology_spark.operators import triples
from pdf2ontology_spark.schemas import DOCUMENTS

# documents + an event-time column, for the watermarked windowed stats
TIMED_DOCUMENTS = T.StructType(
    list(DOCUMENTS.fields) + [T.StructField("ingest_ts", T.TimestampType())]
)


def stream_triples(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """readStream(documents parquet dir) -> triples parquet sink.

    With ``available_now`` the query drains everything currently in the
    directory and stops — the testable micro-batch mode; without it, it
    runs continuously.
    """
    docs = spark.readStream.schema(DOCUMENTS).parquet(input_dir)

    def process_batch(batch_df, _batch_id: int) -> None:
        # the flagship fused plan: FileScan -> Project -> Generate, zero
        # exchanges — per micro-batch the whole extraction is one
        # narrow map-side pass over the new files only
        trips = triples.all_triples_fused(batch_df)
        trips.write.mode("append").parquet(output_dir)

    writer = docs.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_windowed_doc_stats(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window_duration: str = "10 seconds",
    watermark_delay: str = "30 seconds",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Event-time windowed ingest statistics with a WATERMARK for late
    data — the windowed-aggregation shape a continuous ingest pipeline
    monitors: tumbling event-time windows over the document stream
    (schema ``TIMED_DOCUMENTS``: documents + ``ingest_ts``), counting
    docs and spans per window.

    Semantics (append mode): a window row is emitted exactly ONCE, when
    the watermark (max seen event time - ``watermark_delay``) passes
    the window end; rows arriving behind the watermark are DROPPED by
    the aggregation. That bounds state to the open windows only — no
    keep-everything aggregation at any scale — and the watermark itself
    is recovered from the checkpoint across restarts. The watermark a
    micro-batch uses is the one established by the PREVIOUS batch, so
    emission lags arrival by one batch (standard Structured Streaming
    behavior; tests/test_media_streaming.py demonstrates both the
    one-shot emission and the late-row drop).

    ``max_files_per_trigger`` splits an availableNow drain into one
    batch per N files — the knob the driver-oracle harness uses to
    stage watermark advancement deterministically."""
    reader = spark.readStream.schema(TIMED_DOCUMENTS)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_dir)
    agg = (
        docs.withWatermark("ingest_ts", watermark_delay)
        .groupBy(F.window("ingest_ts", window_duration).alias("w"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.size("spans")).cast("long").alias("n_spans"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_docs",
            "n_spans",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_graph_upsert(
    spark: SparkSession,
    input_dir: str,
    out_base: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Incremental KG materialization — the streaming form of the graph
    stage: per micro-batch, run the fused triple extraction, aggregate
    the batch's MERGEABLE graph stages (graph.per_surface /
    graph.edge_aggs — counts sum, confidences max, evidence/mentions
    are distributive top-3s), and upsert ONLY the touched keys into the
    surfaces / edge_aggs stage tables via ``tables.merge_upsert`` (the
    crash-recoverable Iceberg-MERGE analog). The final node/edge tables
    are cheap derivations over the stages (``read_stream_nodes`` /
    ``read_stream_edges``) and equal the batch graph exactly
    (tests/test_stream_graph.py pins 3-chunk equivalence).

    Scale shape: the per-batch update is sized by the BATCH's distinct
    keys, not the accumulated graph; the stage tables are
    entity/edge-cardinality (orders of magnitude under the triple
    stream); on Iceberg the upsert is a transactional MERGE INTO.

    Replay-idempotent: see ``graph_batch_handler``.
    """
    docs = spark.readStream.schema(DOCUMENTS).parquet(input_dir)
    process_batch = graph_batch_handler(spark, out_base, checkpoint_dir)
    writer = docs.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def graph_batch_handler(spark: SparkSession, out_base: str, checkpoint_dir: str):
    """The foreachBatch handler behind ``stream_graph_upsert``, exposed
    so replay semantics are directly testable.

    foreachBatch is AT-LEAST-ONCE: after a crash between the surfaces
    merge and the streaming commit log, the same (batch_id, data) is
    delivered again — and the counts-summing combine would double-add.
    Each stage therefore records ``(checkpoint, batch_id)`` via
    ``merge_upsert``'s ``commit_meta`` (written into the merge's staging
    dir, so it commits atomically with the data) and a replayed batch
    whose id is <= the stage's recorded id is a no-op FOR THAT STAGE —
    a crash between the two stage merges replays into "skip surfaces,
    apply edge_aggs", exactly completing the interrupted batch. The
    checkpoint identity guards the other direction: a FRESH stream
    (batch ids restart at 0) pointed at an existing out_base must not
    skip its early batches on the old stream's high-water mark."""
    import os

    from pdf2ontology_spark.operators import graph
    from pdf2ontology_spark.sources import tables

    surf_path = os.path.join(out_base, "surfaces")
    edge_path = os.path.join(out_base, "edge_aggs")

    def _applied(path, batch_id: int) -> bool:
        meta = tables.merge_meta(path)
        return (
            meta is not None
            and meta.get("checkpoint") == checkpoint_dir
            and meta.get("batch_id") is not None
            and batch_id <= meta["batch_id"]
        )

    def _merge_stage(path, new_rows, keys, combine, meta):
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            tables.merge_upsert(spark, path, new_rows, keys, commit_meta=meta)
            return
        existing = tables.read_merged(spark, path)
        touched = existing.join(new_rows.select(*keys).distinct(), keys, "leftsemi")
        tables.merge_upsert(spark, path, combine(touched, new_rows), keys, commit_meta=meta)

    def process_batch(batch_df, batch_id: int) -> None:
        need_surf = not _applied(surf_path, batch_id)
        need_edge = not _applied(edge_path, batch_id)
        if not (need_surf or need_edge):
            return
        meta = {"checkpoint": checkpoint_dir, "batch_id": batch_id}
        # the extraction output feeds both stage updates: checkpoint it
        # so the fused plan runs once per micro-batch, not per stage
        trips = triples.all_triples_fused(batch_df).localCheckpoint(eager=True)
        if need_surf:
            _merge_stage(
                surf_path,
                graph.per_surface(trips),
                ["name", "entity_type"],
                graph.combine_surfaces,
                meta,
            )
        if need_edge:
            _merge_stage(
                edge_path,
                graph.edge_aggs(trips),
                ["subject_id", "predicate", "object_id"],
                graph.combine_edge_aggs,
                meta,
            )

    return process_batch


def read_stream_nodes(spark: SparkSession, out_base: str):
    """Derive the node table from the incrementally-upserted surfaces
    stage (repairing a crashed merge commit first)."""
    import os

    from pdf2ontology_spark.operators import graph
    from pdf2ontology_spark.sources import tables

    return graph.nodes_from_surfaces(
        tables.read_merged(spark, os.path.join(out_base, "surfaces"))
    )


def read_stream_edges(spark: SparkSession, out_base: str):
    """Derive the edge table from the incrementally-upserted edge-aggs
    stage."""
    import os

    from pdf2ontology_spark.operators import graph
    from pdf2ontology_spark.sources import tables

    return graph.edges_from_aggs(
        tables.read_merged(spark, os.path.join(out_base, "edge_aggs"))
    )


def content_hash_col() -> "F.Column":
    """Canonical document content hash: md5 over a field-delimited
    serialization of the span list (US/RS separators, null-safe). Used
    by the streaming dedup state key; the serialization is closed-form
    so the DuckDB twin recomputes the identical hash
    (md5 agrees across both engines, operators/dedup.py:4-6)."""
    return F.md5(
        F.array_join(
            F.transform(
                "spans",
                lambda s: F.concat_ws(
                    "\x1f",
                    F.coalesce(s["kind"], F.lit("")),
                    F.coalesce(s["text"], F.lit("")),
                    F.coalesce(s["media_ref"], F.lit("")),
                    F.coalesce(s["offset"].cast("string"), F.lit("")),
                ),
            ),
            "\x1e",
        )
    )


def stream_dedup_first_seen(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Stateful streaming exact-dedup: emit each distinct document
    content hash the FIRST time it is ever seen; duplicates — within a
    micro-batch, across micro-batches, and across RESTARTS (state lives
    in the streaming checkpoint) — are dropped.

    Built on ``applyInPandasWithState``: state is the seen-hash set,
    partitioned by a 2-hex-char hash-prefix bucket (256 groups) so no
    single group's state grows with the whole corpus and groups spread
    across executors. At real scale the state store backs onto RocksDB
    and the bucket width widens with the corpus; re-crawl dedup also
    usually adds a TTL (state timeout) — both are config, not plan,
    changes.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    docs = spark.readStream.schema(DOCUMENTS).parquet(input_dir)
    hashed = docs.select("doc_id", content_hash_col().alias("content_hash")).withColumn(
        "bucket", F.substring("content_hash", 1, 2)
    )

    def first_seen(key, pdfs, state):
        seen = set(state.get[0]) if state.exists else set()
        out_ids, out_hashes = [], []
        for pdf in pdfs:
            for d, h in zip(pdf["doc_id"], pdf["content_hash"]):
                if h not in seen:
                    seen.add(h)
                    out_ids.append(d)
                    out_hashes.append(h)
        state.update((sorted(seen),))
        yield pd.DataFrame({"doc_id": out_ids, "content_hash": out_hashes})

    deduped = hashed.groupBy("bucket").applyInPandasWithState(
        first_seen,
        outputStructType="doc_id string, content_hash string",
        stateStructType="seen array<string>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
