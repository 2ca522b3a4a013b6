"""Scalar function library tests (SURVEY.md §2.8)."""

from pyspark.sql import functions as F

from pdf2ontology_spark import functions as fn


def test_scalar_functions(spark):
    df = spark.range(1).select(
        fn.clamp01(F.lit(1.7)).alias("c1"),
        fn.clamp01(F.lit(-0.2)).alias("c2"),
        fn.combined_confidence(F.lit(0.8), F.lit(0.6)).alias("cc"),
        fn.word_count(F.lit("  a b   c ")).alias("wc"),
        fn.page_table_id(F.lit(2), F.lit(0)).alias("pid"),
        fn.truncate(F.lit("abcdef"), 4).alias("tr"),
        fn.standardize_symbols(F.lit("x ✓ y ● z")).alias("sym"),
    )
    r = df.collect()[0]
    assert r.c1 == 1.0 and r.c2 == 0.0
    assert abs(r.cc - 0.7) < 1e-12
    assert r.wc == 3
    assert r.pid == "page_2_table_0"
    assert r.tr == "abcd"
    assert r.sym == "x [CE_MARK] y [SELECTED] z"


def test_bbox_functions(spark):
    df = spark.createDataFrame(
        [(0.1, 0.2, 0.3, 0.4)], "x double, y double, w double, h double"
    ).select(
        fn.bbox_right(F.col("x"), F.col("w")).alias("r"),
        fn.bbox_area(F.col("w"), F.col("h")).alias("a"),
        fn.bbox_valid(F.col("x"), F.col("y"), F.col("w"), F.col("h")).alias("v"),
        fn.bbox_valid(F.lit(0.9), F.col("y"), F.lit(0.5), F.col("h")).alias("inv"),
        fn.bbox_overlap(
            F.col("x"), F.col("y"), F.col("w"), F.col("h"),
            F.lit(0.2), F.lit(0.3), F.lit(0.3), F.lit(0.4),
        ).alias("ov"),
        fn.bbox_overlap(
            F.col("x"), F.col("y"), F.col("w"), F.col("h"),
            F.lit(0.9), F.lit(0.9), F.lit(0.1), F.lit(0.1),
        ).alias("nov"),
    )
    r = df.collect()[0]
    assert abs(r.r - 0.4) < 1e-12 and abs(r.a - 0.12) < 1e-12
    assert r.v is True and r.inv is False
    assert r.ov is True and r.nov is False


def test_priority_sorted_actions(spark):
    df = spark.createDataFrame(
        [(["sharpen", "rotate", "denoise", "rotate", "unknown_op", "crop"],)],
        "actions array<string>",
    ).select(fn.priority_sorted_actions(F.col("actions")).alias("plan"))
    assert df.collect()[0].plan == ["rotate", "crop", "denoise", "sharpen", "unknown_op"]


def test_quarantine_split_accounts_for_every_row(spark):
    """F2: invalid rows never throw and never vanish — they land in the
    quarantine side with a reason; good + bad == input."""
    from pyspark.sql import Row

    from pdf2ontology_spark.operators import quarantine

    rows = [
        Row(doc_id="d", kind="text", text="ok.", media_ref="", offset=0),
        Row(doc_id="d", kind="blob", text="?", media_ref="", offset=1),  # unknown kind
        Row(doc_id="d", kind="media", text="", media_ref="", offset=2),  # no media_ref
        Row(doc_id="d", kind="table", text="[]", media_ref="", offset=-3),  # neg offset
        Row(doc_id="d", kind="media", text="", media_ref="m://x", offset=4),
    ]
    spans = spark.createDataFrame(rows)
    good, bad = quarantine.split_spans(spans)
    assert good.count() + bad.count() == len(rows)
    reasons = {r.offset: r.q_reason for r in bad.collect()}
    assert reasons == {1: "unknown_kind", 2: "missing_media_ref", -3: "negative_offset"}
    # NULL inputs must be flagged, not sail through as "not flagged"
    null_rows = spark.createDataFrame(
        [Row(doc_id="d", kind=None, text="x", media_ref="", offset=9),
         Row(doc_id="d", kind="text", text="x", media_ref="", offset=None)],
        "doc_id string, kind string, text string, media_ref string, offset int",
    )
    _, nbad = quarantine.split_spans(null_rows)
    assert {r.q_reason for r in nbad.collect()} == {"null_kind", "null_offset"}
    acct = {(r.stage, r.status): r.n for r in quarantine.accounting(good, bad, "g").collect()}
    assert acct == {("g", "passed"): 2, ("g", "quarantined"): 3}
    # the pipeline keeps running on the good side — no exception path
    from pdf2ontology_spark.operators import segment

    assert segment.doc_stats(good).count() == 1
