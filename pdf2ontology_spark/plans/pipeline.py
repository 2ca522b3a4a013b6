"""The flagship KG-construction pipeline (SURVEY.md §7.1):

documents(spans) -> segment -> tabulate -> semantic entries -> triples
                -> canonicalized nodes + edges

Each arrow is a pure DataFrame transform; with a CheckpointStore the
stage outputs are persisted and the run resumes idempotently.

Shuffle budget end-to-end (scale analysis, 1000-executor framing):
1. segment/explode: narrow — 0 shuffles.
2. tabulate windows: 1 shuffle on (doc_id, table_id) — all windows share
   the prefix; grids are tiny so no skew.
3. triples: narrow on top of (2).
4. nodes/edges: endpoint ids are pure expressions, so only the final
   groupBys shuffle — 1 shuffle each on entity/edge key. Entity keys are
   the classic skew risk (popular entities); AQE skew handling is on,
   and the two-level aggregation in graph.nodes() gives map-side partial
   combines, so hot keys reduce before the exchange.
Media-heavy docs skew SPAN-level partitions: the input is repartitioned
by a salted doc hash before the explode when ``salt`` > 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf2ontology_spark.operators import graph, quarantine, segment, tabulate, triples
from pdf2ontology_spark.sources import tables
from pdf2ontology_spark.sources.checkpoint import CheckpointStore


def salted_repartition(docs: DataFrame, n_partitions: int, salt: int) -> DataFrame:
    """Spread media-heavy documents across partitions: hash(doc_id) plus
    a per-row salt derived from span count, so one 50-media-span doc does
    not pin a straggler partition (north-rule skew requirement). The
    span-sequence invariant is untouched — spans stay nested per row and
    downstream grouping keys include doc_id."""
    if salt <= 1:
        return docs.repartition(n_partitions, F.col("doc_id"))
    return docs.repartition(
        n_partitions,
        F.concat_ws(
            "#",
            F.col("doc_id"),
            F.pmod(F.xxhash64("doc_id", F.size("spans")), F.lit(salt)).cast("string"),
        ),
    )


def run_kg_pipeline(
    spark: SparkSession,
    sf_dir: str,
    ckpt: CheckpointStore | None = None,
    reference_strict: bool = False,
    salt: int = 4,
) -> dict[str, DataFrame]:
    """Run the full pipeline; returns every stage as a DataFrame."""
    # repartition=False: the salted repartition below is this plan's own
    # (single) post-scan shuffle — don't pay a second one in the loader
    docs = tables.load_documents_spans(spark, sf_dir, repartition=False)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = salted_repartition(docs, n_part, salt)

    def st(name: str, fn):
        if ckpt is None:
            return fn()
        return ckpt.stage(name, fn)

    all_spans = st("spans", lambda: segment.explode_spans(docs))
    # input guard (F2): invalid spans go to a quarantine side table (with
    # its own _metrics row under a CheckpointStore) and never throw;
    # downstream stages see only the good side
    spans, rejected = quarantine.split_spans(all_spans)
    bad_spans = st("quarantine_spans", lambda: rejected)
    cells = st("cells", lambda: tabulate.table_cells(spans))
    entries = st("entries", lambda: tabulate.semantic_entries(cells))
    if ckpt is None:
        # no checkpoint store -> nothing materializes between stages, so
        # the staged union would scan + parse the source corpus twice
        # and shuffle for the tabulate/sentence windows; the fused plan
        # is one scan, zero exchanges (tests/test_triples_fused.py pins
        # equivalence; its span-validity guard matches split_spans)
        trips = triples.all_triples_fused(docs, reference_strict)
    else:
        # resumable path: spans/entries are materialized parquet stages,
        # so each branch reads the (cheap, local) checkpoint — keep the
        # staged lineage that idempotent resume depends on
        trips = st(
            "triples",
            lambda: triples.table_triples(entries, reference_strict).unionByName(
                triples.text_triples(spans)
            ),
        )
    nodes_df = st("nodes", lambda: graph.nodes(trips))
    edges_df = st("edges", lambda: graph.edges(trips))
    return {
        "documents": docs,
        "spans": spans,
        "quarantine": bad_spans,
        "cells": cells,
        "entries": entries,
        "triples": trips,
        "nodes": nodes_df,
        "edges": edges_df,
    }
