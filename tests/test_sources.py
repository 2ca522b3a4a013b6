"""binaryFile media source + CSV diagnostics sink (S4/K2 analogs)."""

from pdf2ontology_spark.operators import segment
from pdf2ontology_spark.sources import binary, tables


def test_binary_dir_source(spark, tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    (d / "page_2.png").write_bytes(b"\x89PNG-fake-2")
    (d / "page_1.png").write_bytes(b"\x89PNG-fake-1")
    (d / "notes.txt").write_text("ignored")

    files = binary.load_media_dir(spark, str(d))
    rows = files.collect()
    assert [r.path.rsplit("/", 1)[1] for r in rows] == ["page_1.png", "page_2.png"]
    assert rows[0].length == 11

    man = {r.path.rsplit("/", 1)[1]: r.content_md5 for r in binary.media_manifest(files).collect()}
    import hashlib

    assert man["page_1.png"] == hashlib.md5(b"\x89PNG-fake-1").hexdigest()


def test_spans_csv_sink(spark, tmp_path):
    docs = tables.load_documents_spans(spark, "/root/testdata/sf0.001")
    spans = segment.explode_spans(docs)
    out = str(tmp_path / "csv")
    binary.write_spans_csv(spans, out)
    back = spark.read.option("header", True).csv(out)
    assert back.count() == spans.count()
    assert set(back.columns) == {"doc_id", "kind", "offset", "n_chars", "media_ref"}
