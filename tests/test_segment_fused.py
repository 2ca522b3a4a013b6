"""Round-7 in-row doc-level twins (segment.doc_stats_docs /
reassemble_text_docs) must equal the staged explode+groupBy operators
row-for-row, including dropping span-less / text-less documents."""

from pyspark.sql import Row

import __spark_entry__ as entry
from pdf2ontology_spark.operators import segment
from pdf2ontology_spark.sources import tables

SF = "/root/testdata/sf0.001"


def _same(a, b):
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_doc_stats_docs_equals_staged(spark):
    _same(
        segment.doc_stats(entry._spans(spark, SF)),
        segment.doc_stats_docs(tables.load_documents_spans(spark, SF)),
    )


def test_reassemble_text_docs_equals_staged(spark):
    _same(
        segment.reassemble_text(entry._spans(spark, SF)),
        segment.reassemble_text_docs(tables.load_documents_spans(spark, SF)),
    )


def test_fused_twins_drop_empty_docs(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id="d0", spans=[]),
            Row(
                doc_id="d1",
                spans=[
                    Row(kind="media", text=None, media_ref="m", offset=0),
                    Row(kind="text", text="b.", offset=2, media_ref=None),
                    Row(kind="text", text="a", offset=1, media_ref=None),
                ],
            ),
        ],
        "doc_id string, spans array<struct<kind string, text string, media_ref string, offset int>>",
    )
    ds = {r.doc_id: r for r in segment.doc_stats_docs(docs).collect()}
    assert list(ds) == ["d1"]
    assert ds["d1"].n_spans == 3 and ds["d1"].n_text == 2 and ds["d1"].total_chars == 3
    rt = segment.reassemble_text_docs(docs).collect()
    assert len(rt) == 1
    assert rt[0].document_text == "a\nb." and rt[0].n_text_spans == 2
