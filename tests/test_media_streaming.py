"""Media plumbing (mapInPandas real PNG decode) + streaming micro-batch
equivalence with the batch pipeline."""

import time

from pyspark.sql import functions as F

from pdf2ontology_spark import png_codec, raster
from pdf2ontology_spark.operators import media, segment, tabulate, triples
from pdf2ontology_spark.sources import tables
from pdf2ontology_spark.streaming.incremental import stream_triples


def test_media_features_real_decode(spark):
    docs = tables.load_documents_spans(spark, "/root/testdata/sf0.001")
    spans = segment.explode_spans(docs)
    blobs = tables.load_media_blobs(spark, "/root/testdata/sf0.001")
    feats = media.media_features(spans, blobs).cache()
    n_media = spans.filter("kind = 'media'").count()
    assert feats.count() == n_media
    assert feats.filter("NOT decode_ok").count() == 0
    r = feats.orderBy("doc_id", "offset").first()
    # dims/format come from the actual PNG header, phash from the
    # decoded pixels — identical across runs (deterministic store)
    r2 = media.media_features(spans, blobs).orderBy("doc_id", "offset").first()
    assert r == r2
    assert (r.width, r.height, r.format) == (raster.GRID_W, raster.GRID_H, "png")
    assert r.phash == media.ahash_batch(raster.synth_raster(r.media_ref)[None])[0]
    stats = media.media_stats(feats)
    assert stats.count() == spans.filter("kind='media'").select("doc_id").distinct().count()


def test_media_features_corrupt_blob_quarantined(spark):
    """Per-item tolerance (F11): a corrupt blob yields decode_ok=false
    with zeroed metadata instead of failing the Arrow stage."""
    good = png_codec.encode_png_gray(raster.synth_raster("media://d1/0.png"))
    rows = [
        ("d1", "media", "", "media://d1/0.png", 0),
        ("d1", "media", "", "media://d1/1.png", 1),
    ]
    spans = spark.createDataFrame(rows, "doc_id string, kind string, text string, media_ref string, offset int")
    blobs = spark.createDataFrame(
        [("media://d1/0.png", bytearray(good)), ("media://d1/1.png", bytearray(b"NOTAPNG" + good))],
        "media_ref string, png binary",
    )
    out = {r.media_ref: r for r in media.media_features(spans, blobs).collect()}
    assert out["media://d1/0.png"].decode_ok
    bad = out["media://d1/1.png"]
    assert not bad.decode_ok and bad.width == 0 and bad.phash == ""
    stats = media.media_stats(media.media_features(spans, blobs)).first()
    assert (stats.n_media, stats.n_ok) == (2, 1)


def test_media_quality_blobs_match_fixture_path(spark):
    """The decoded-bytes path and the closed-form fallback produce
    identical metric rows — the identity the DuckDB twins rest on."""
    docs = tables.load_documents_spans(spark, "/root/testdata/sf0.001")
    spans = segment.explode_spans(docs).filter(F.col("kind") == "media").limit(200)
    blobs = tables.load_media_blobs(spark, "/root/testdata/sf0.001")
    with_bytes = media.media_quality(spans, blobs)
    fixture = media.media_quality(spans)
    assert with_bytes.exceptAll(fixture).count() == 0
    assert fixture.exceptAll(with_bytes).count() == 0


def test_stream_matches_batch(spark, tmp_path):
    docs = tables.load_documents_spans(spark, "/root/testdata/sf0.001")
    in_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    docs.write.parquet(in_dir)

    q = stream_triples(spark, in_dir, out_dir, ckpt, available_now=True)
    q.awaitTermination(120)

    streamed = spark.read.parquet(out_dir)
    spans = segment.explode_spans(docs)
    batch = triples.all_triples(spans, tabulate.semantic_entries(tabulate.table_cells(spans)))
    cols = batch.columns
    assert streamed.select(*cols).exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed.select(*cols)).count() == 0

    # resume: nothing new in the directory -> no duplicate output rows
    n1 = streamed.count()
    q2 = stream_triples(spark, in_dir, out_dir, ckpt, available_now=True)
    q2.awaitTermination(120)
    time.sleep(0.5)
    assert spark.read.parquet(out_dir).count() == n1


def test_stream_three_chunks_matches_batch(spark, tmp_path):
    """Incremental parity for the FUSED single-scan plan: the same
    corpus arriving as 3 separate micro-batch drops must produce
    exactly the batch all_triples_fused output over the full corpus."""
    docs = tables.load_documents_spans(spark, "/root/testdata/sf0.001").cache()
    in_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    from pyspark.sql import functions as F

    chunk = F.pmod(F.xxhash64("doc_id"), F.lit(3))
    for i in range(3):
        docs.filter(chunk == i).write.mode("append").parquet(in_dir)
        q = stream_triples(spark, in_dir, out_dir, ckpt, available_now=True)
        q.awaitTermination(120)

    streamed = spark.read.parquet(out_dir)
    batch = triples.all_triples_fused(docs)
    cols = batch.columns
    assert streamed.count() == batch.count()
    assert streamed.select(*cols).exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed.select(*cols)).count() == 0
    docs.unpersist()


def test_apply_actions_passthrough_and_chain(spark):
    """Skip-predicate rows keep the ORIGINAL byte token (byte-identical
    pass-through); processed rows fold each planned action into the
    state chain in plan order."""
    import hashlib

    from pyspark.sql import Row

    from pdf2ontology_spark.operators import condition, media

    spans = spark.createDataFrame(
        [
            Row(doc_id="d", kind="media", text="", media_ref=f"media://d/{i}.png", offset=i)
            for i in range(40)
        ]
    )
    assessed = condition.assess_media(spans)
    out = {r.media_ref: r for r in media.apply_actions(assessed).collect()}
    planned = {r.media_ref: r for r in assessed.collect()}
    assert len(out) == 40
    skipped = [r for r in out.values() if r.n_applied == 0]
    processed = [r for r in out.values() if r.n_applied > 0]
    assert skipped and processed, "fixture must exercise both paths"
    for r in skipped:
        assert r.processed_ref == hashlib.sha256(r.media_ref.encode()).hexdigest()
        assert r.changed is False
    for r in processed:
        state = hashlib.sha256(r.media_ref.encode()).hexdigest()
        for a in planned[r.media_ref].actions:
            state = hashlib.sha256(f"{state}:{a}".encode()).hexdigest()
        assert r.processed_ref == state and r.changed is True
        if "rotate" in planned[r.media_ref].actions:
            assert r.rotation_deg_after == 0


def test_stream_dedup_first_seen_stateful(spark, tmp_path):
    """applyInPandasWithState dedup: duplicates are dropped within a
    batch, and state survives a RESTART so re-crawled docs are dropped
    across runs too."""
    from pyspark.sql import Row

    from pdf2ontology_spark.schemas import DOCUMENTS
    from pdf2ontology_spark.streaming.incremental import stream_dedup_first_seen

    def doc(i, text):
        return Row(doc_id=f"d{i}", spans=[Row(kind="text", text=text, media_ref="", offset=0)])

    in_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    a = spark.createDataFrame([doc(0, "alpha."), doc(1, "beta."), doc(2, "alpha.")], DOCUMENTS)
    a.write.mode("append").parquet(in_dir)
    q = stream_dedup_first_seen(spark, in_dir, out_dir, ckpt, available_now=True)
    q.awaitTermination(120)
    out1 = spark.read.parquet(out_dir)
    # d0/d2 share content -> exactly one of them emitted, plus d1
    assert out1.count() == 2
    assert out1.select("content_hash").distinct().count() == 2

    # restart with new files: one true duplicate of batch A, one new doc
    b = spark.createDataFrame([doc(3, "alpha."), doc(4, "gamma.")], DOCUMENTS)
    b.write.mode("append").parquet(in_dir)
    q2 = stream_dedup_first_seen(spark, in_dir, out_dir, ckpt, available_now=True)
    q2.awaitTermination(120)
    out2 = spark.read.parquet(out_dir)
    assert out2.count() == 3  # only gamma was new
    assert out2.select("content_hash").distinct().count() == 3


def test_stream_windowed_watermark_drops_late(spark, tmp_path):
    """Watermarked event-time windows: a window emits exactly once when
    the watermark passes its end, and a row arriving BEHIND the
    watermark is dropped instead of mutating the emitted window."""
    from datetime import datetime

    from pyspark.sql import Row

    from pdf2ontology_spark.streaming.incremental import (
        TIMED_DOCUMENTS,
        stream_windowed_doc_stats,
    )

    def doc(i, ts):
        return Row(
            doc_id=f"w{i}",
            spans=[Row(kind="text", text="x.", media_ref="", offset=0)],
            ingest_ts=datetime(2026, 1, 1, 10, 0, 0).replace(
                minute=ts // 60, second=ts % 60
            ),
        )

    in_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")

    # run 1: two events in window [10:00:00, 10:00:10) plus an advancer
    # at 10:05:00 that pushes the watermark (delay 30s) past that window
    a = spark.createDataFrame([doc(0, 1), doc(1, 5), doc(2, 300)], TIMED_DOCUMENTS)
    a.write.mode("append").parquet(in_dir)
    q = stream_windowed_doc_stats(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)

    # run 2 (restart, watermark recovered from checkpoint): one LATE
    # event for the already-finalized window — must be dropped — plus a
    # second advancer whose batch flushes the finalized window if run 1
    # did not already
    b = spark.createDataFrame([doc(3, 7), doc(4, 301)], TIMED_DOCUMENTS)
    b.write.mode("append").parquet(in_dir)
    q2 = stream_windowed_doc_stats(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)

    out = spark.read.parquet(out_dir).collect()
    assert len(out) == 1, out  # only the finalized window; advancers still open
    r = out[0]
    assert r.window_start == datetime(2026, 1, 1, 10, 0, 0)
    assert r.n_docs == 2 and r.n_spans == 2  # late w3 NOT counted
