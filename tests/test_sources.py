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


def test_merge_upsert_semantics(spark, tmp_path):
    """Iceberg MERGE analog: matched keys update, unmatched keys keep,
    new keys insert; the rewrite is atomic (temp dir + rename)."""
    from pdf2ontology_spark.sources import tables

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [("a", 1, "old"), ("b", 2, "old")], "k string, v int, tag string"
    )
    tables.merge_upsert(spark, path, base, ["k"])
    upd = spark.createDataFrame(
        [("b", 20, "new"), ("c", 30, "new")], "k string, v int, tag string"
    )
    tables.merge_upsert(spark, path, upd, ["k"])
    got = {r.k: (r.v, r.tag) for r in spark.read.parquet(path).collect()}
    assert got == {"a": (1, "old"), "b": (20, "new"), "c": (30, "new")}

    # crash recovery: simulate dying between the two commit renames
    import os
    import shutil

    old_dir = path + "._merge_old"
    shutil.move(path, old_dir)  # table vanished mid-commit, backup present
    upd2 = spark.createDataFrame([("d", 40, "new2")], "k string, v int, tag string")
    tables.merge_upsert(spark, path, upd2, ["k"])
    got2 = {r.k: r.v for r in spark.read.parquet(path).collect()}
    # previous data restored from the backup, new key merged in
    assert got2 == {"a": 1, "b": 20, "c": 30, "d": 40}
    assert not os.path.exists(old_dir)
