"""Incremental triple extraction via Structured Streaming.

The reference is strictly batch (SURVEY.md §2.9); the target's
incremental story is checkpointed batch resume. This module adds the
natural streaming extension anyway: new document parquet files landing
in a directory are picked up per micro-batch and extracted with the
SAME operator functions via ``foreachBatch`` — the tabulate stage uses
window functions, which Structured Streaming only allows inside a
foreachBatch (each micro-batch is a plain batch DataFrame there).

Delivery semantics: the streaming checkpoint gives exactly-once source
tracking; the parquet append sink inside foreachBatch is at-least-once
on retry (idempotent downstream thanks to deterministic content ids —
consumers dedupe on the triple's content hash). On Iceberg the sink
becomes a MERGE and is exactly-once.

(Stateful follow-ups — windowed dedup, streaming entity linking — would
use applyInPandasWithState; not needed for reference parity.)
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from pdf2ontology_spark.operators import segment, tabulate, triples
from pdf2ontology_spark.schemas import DOCUMENTS


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
        spans = segment.explode_spans(batch_df)
        trips = triples.all_triples(
            spans, tabulate.semantic_entries(tabulate.table_cells(spans))
        )
        trips.write.mode("append").parquet(output_dir)

    writer = docs.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
