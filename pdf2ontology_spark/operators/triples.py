"""Triple extraction — the parity artifact (FIXTURES.md F3).

Two deterministic extractors:

- ``table_triples``: productionized version of the reference's
  rule-based fallback (/root/reference/src/knowledge_extractor/
  triplet_extractor.py:339-384): for every (key, value) of a table row
  with a non-empty value and key != "row_header", emit
  (subject=row_header [concept], predicate=related_to, object=value),
  confidence 0.6, source_sentence "{row_header} has {key} of {value}",
  extraction_method "fallback_rule_based". Object typing follows the
  prompt rules (triplet_extractor.py:183-191): numeric pattern ->
  numeric, gazetteer location -> location, else other.

  NOTE: the reference fallback only processes the FIRST 3 rows per table
  (``data_rows[:3]``, triplet_extractor.py:358) — a degraded-mode
  artifact. The engine processes ALL rows by default (no silent data
  loss at scale); pass ``reference_strict=True`` to reproduce the cap
  exactly.

- ``text_triples``: sentence-pattern relation extraction over text spans
  (SURVEY.md §7.2 step 1), one JVM-side pass: each pattern is evaluated
  with regexp_extract into an array of candidate structs, exploded, and
  empty matches dropped. Predicates are drawn from the reference's
  RelationType enum (enums.py:42-64).

Everything stays inside whole-stage codegen — no Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pdf2ontology_spark import rules


def classify_value_col(c: Column) -> Column:
    """Entity typing for object values (prompt rules 183-191)."""
    return (
        F.when(c.rlike(rules.NUMERIC_RE), F.lit("numeric"))
        .when(c.isin(rules.LOCATIONS), F.lit("location"))
        .otherwise(F.lit("other"))
    )


def table_triples(entries: DataFrame, reference_strict: bool = False) -> DataFrame:
    """semantic entries -> triples (schemas.TRIPLES)."""
    df = entries
    if reference_strict:
        # reproduce the reference's data_rows[:3] cap (triplet_extractor.py:358)
        w = Window.partitionBy("doc_id", "table_id").orderBy("row_idx")
        df = (
            df.withColumn("_rk", F.dense_rank().over(w))
            .filter(F.col("_rk") <= 3)
            .drop("_rk")
        )
    v = F.col("value")
    return (
        df.filter(v.isNotNull() & (v != "") & (F.col("key") != "row_header"))
        .select(
            "doc_id",
            "table_id",
            F.col("row_header").alias("subj_name"),
            F.lit("concept").alias("subj_type"),
            F.lit("related_to").alias("predicate"),
            v.alias("obj_name"),
            classify_value_col(v).alias("obj_type"),
            F.lit(rules.FALLBACK_CONFIDENCE).alias("confidence"),
            F.concat(
                F.col("row_header"), F.lit(" has "), F.col("key"), F.lit(" of "), v
            ).alias("source_sentence"),
            F.lit(rules.FALLBACK_METHOD).alias("extraction_method"),
        )
    )


def text_triples(spans: DataFrame) -> DataFrame:
    """text spans -> cross-span merge (W5) -> pattern-matched triples,
    single JVM pass over the merged sentence stream."""
    from pdf2ontology_spark.operators.segment import merged_text_sentences

    cands = F.array(
        *[
            F.struct(
                F.regexp_extract("sentence", pat, 1).alias("subj_name"),
                F.lit(st).alias("subj_type"),
                F.lit(pred).alias("predicate"),
                F.regexp_extract("sentence", pat, 2).alias("obj_name"),
                F.lit(ot).alias("obj_type"),
            )
            for pat, pred, st, ot in rules.TEXT_PATTERNS
        ]
    )
    return (
        merged_text_sentences(spans)
        .select("doc_id", "sentence", F.explode(cands).alias("m"))
        .filter((F.col("m.subj_name") != "") & (F.col("m.obj_name") != ""))
        .select(
            "doc_id",
            F.lit(None).cast("string").alias("table_id"),
            F.col("m.subj_name").alias("subj_name"),
            F.col("m.subj_type").alias("subj_type"),
            F.col("m.predicate").alias("predicate"),
            F.col("m.obj_name").alias("obj_name"),
            F.col("m.obj_type").alias("obj_type"),
            F.lit(rules.PATTERN_CONFIDENCE).alias("confidence"),
            F.col("sentence").alias("source_sentence"),
            F.lit(rules.PATTERN_METHOD).alias("extraction_method"),
        )
    )


def all_triples(spans: DataFrame, entries: DataFrame, reference_strict: bool = False) -> DataFrame:
    """Union of table + text triples (U1 semantics: one DataFrame from
    the start — the reference's ``all_triplets.extend`` loop collapses to
    ``unionByName``)."""
    return table_triples(entries, reference_strict).unionByName(text_triples(spans))
