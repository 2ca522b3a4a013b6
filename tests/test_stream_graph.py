"""Streaming graph materialization: the same corpus arriving as 3
micro-batch drops, incrementally upserted into the surfaces/edge-aggs
stage tables via merge_upsert, must derive EXACTLY the batch
graph.nodes/graph.edges over the full corpus."""

from pyspark.sql import functions as F

from pdf2ontology_spark.operators import graph, triples
from pdf2ontology_spark.sources import tables
from pdf2ontology_spark.streaming.incremental import (
    graph_batch_handler,
    read_stream_edges,
    read_stream_nodes,
    stream_graph_upsert,
)

SF = "/root/testdata/sf0.001"


def test_stream_graph_three_chunks_matches_batch(spark, tmp_path):
    docs = tables.load_documents_spans(spark, SF).cache()
    in_dir = str(tmp_path / "in")
    out_base = str(tmp_path / "graph")
    ckpt = str(tmp_path / "ck")

    chunk = F.pmod(F.xxhash64("doc_id"), F.lit(3))
    for i in range(3):
        docs.filter(chunk == i).write.mode("append").parquet(in_dir)
        q = stream_graph_upsert(spark, in_dir, out_base, ckpt, available_now=True)
        q.awaitTermination(180)

    def comparable(df):
        # set operations reject MAP columns: serialize them
        return df.select(
            *[
                F.to_json(c).alias(c) if t.startswith("map") else F.col(c)
                for c, t in df.dtypes
            ]
        )

    batch_triples = triples.all_triples_fused(docs)
    for streamed, batch, key in [
        (read_stream_nodes(spark, out_base), graph.nodes(batch_triples), "entity_id"),
        (read_stream_edges(spark, out_base), graph.edges(batch_triples), "edge_id"),
    ]:
        s = comparable(streamed.select(*batch.columns))
        b = comparable(batch)
        assert s.exceptAll(b).count() == 0, f"extra {key} rows in stream result"
        assert b.exceptAll(s).count() == 0, f"missing {key} rows in stream result"

    # idempotent resume: re-running with nothing new must not change the
    # stages (exactly-once source tracking via the streaming checkpoint)
    n_nodes = read_stream_nodes(spark, out_base).count()
    q = stream_graph_upsert(spark, in_dir, out_base, ckpt, available_now=True)
    q.awaitTermination(120)
    assert read_stream_nodes(spark, out_base).count() == n_nodes
    # unpersist: a cached docs plan left registered would silently turn
    # later plan-shape tests' parquet scans into InMemoryTableScans
    docs.unpersist()


def test_graph_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: delivering the SAME (batch_id,
    data) twice — the post-crash replay — must not double-add counts;
    a NEW batch id with the same data must (it is genuinely new data)."""
    docs = tables.load_documents_spans(spark, SF).cache()
    part = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == 0).cache()
    out_base = str(tmp_path / "graph")
    ckpt = str(tmp_path / "ck")
    handler = graph_batch_handler(spark, out_base, ckpt)

    handler(part, 0)
    first = {
        r.entity_id: r.mention_count
        for r in read_stream_nodes(spark, out_base).collect()
    }

    handler(part, 0)  # exact replay -> no-op
    assert {
        r.entity_id: r.mention_count
        for r in read_stream_nodes(spark, out_base).collect()
    } == first

    handler(part, 1)  # same rows, NEW batch -> counts must grow
    doubled = {
        r.entity_id: r.mention_count
        for r in read_stream_nodes(spark, out_base).collect()
    }
    assert doubled == {k: 2 * v for k, v in first.items()}

    # a fresh stream (different checkpoint, ids restart) must APPLY its
    # batch 0 even though the stage high-water mark is already 1
    other = graph_batch_handler(spark, out_base, str(tmp_path / "ck2"))
    other(part, 0)
    tripled = {
        r.entity_id: r.mention_count
        for r in read_stream_nodes(spark, out_base).collect()
    }
    assert tripled == {k: 3 * v for k, v in first.items()}
    part.unpersist()
    docs.unpersist()
