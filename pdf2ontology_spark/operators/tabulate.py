"""Table reconstruction: table spans -> cell grid -> semantic entries.

Implements, as pure DataFrame expressions (no UDFs), the deterministic
semantic-table rules the reference specifies in its structured prompt
(/root/reference/src/table_processors/table_content_extractor.py:98-175):

- 2-column table            -> parameter -> single_value
- multi-column table        -> values map {column header -> cell value}
- option-selection table    -> the "X"-marked column's header becomes the
                               value; all options recorded in row_notes
- empty cells               -> "" (never null), and emit nothing downstream

plus the relationship->data_rows conversion of
/root/reference/src/knowledge_extractor/triplet_extractor.py:700-723
(single_value -> key "value"; values map merged; notes appended) — the
output here is the *long form*: one row per (table row, key).

Scale notes: every rule is a window over (doc_id, table_id[, row/col]).
All windows share the (doc_id, table_id) prefix, so Catalyst plans ONE
shuffle for the whole stage; grids are tiny (the reference's are 5-50
cells) so per-key state is bounded. No grouped-map pandas UDF needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdf2ontology_spark import rules
from pdf2ontology_spark.schemas import CELL


def table_cells(spans: DataFrame) -> DataFrame:
    """table spans -> (doc_id, table_id, row, col, text).

    The span ``text`` is the coordinate-JSON cell list of
    /root/reference/src/table_processors/table_content_extractor_general.py:54-64.
    table_id is the deterministic sha2(doc_id ':' offset) (FIXTURES.md F2).
    """
    return (
        spans.filter(F.col("kind") == "table")
        .select(
            "doc_id",
            F.sha2(F.concat_ws(":", "doc_id", F.col("offset").cast("string")), 256).alias(
                "table_id"
            ),
            F.from_json("text", T.ArrayType(CELL)).alias("cells"),
        )
        # explode_outer + isNotNull instead of explode: plain explode pushes
        # a size(from_json(...))>0 predicate below the projection, making the
        # JSON parse run 2-3x per row (seen in .explain) — this keeps it at 1x
        .select("doc_id", "table_id", F.explode_outer("cells").alias("c"))
        .filter(F.col("c").isNotNull())
        .select(
            "doc_id",
            "table_id",
            F.col("c.row").alias("row"),
            F.col("c.col").alias("col"),
            F.coalesce(F.col("c.text"), F.lit("")).alias("text"),
        )
    )


def semantic_entries(cells: DataFrame) -> DataFrame:
    """cells -> long-form relationship entries
    (doc_id, table_id, row_idx, row_header, key, value).

    One output row per (data row, key); option rows contribute a "value"
    entry (the selected header) and a "notes" entry. Empty values are
    KEPT here ("" per the prompt's rule 5) — the triple stage drops them
    (load-bearing: triplet_extractor.py:361-363 emits no triple for
    falsy values).
    """
    w_tbl = Window.partitionBy("doc_id", "table_id")
    w_row = Window.partitionBy("doc_id", "table_id", "row")
    w_col = Window.partitionBy("doc_id", "table_id", "col")

    is_value_col = F.col("col") >= 1
    marker = is_value_col & F.col("text").isin(rules.MARKERS)
    data = F.col("row") >= 1

    df = (
        cells.withColumn("header", F.max(F.when(F.col("row") == 0, F.col("text"))).over(w_col))
        .withColumn("ncols", F.max("col").over(w_tbl) + 1)
        .withColumn(
            "options",
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                (F.col("row") == 0) & (F.col("col") >= 1),
                                F.struct("col", "text"),
                            )
                        ).over(w_tbl)
                    ),
                    lambda s: s["text"],
                ),
                ", ",
            ),
        )
        .withColumn(
            "has_opts",
            F.sum(
                F.when((F.col("row") == 0) & (F.col("col") >= 1), 1).otherwise(0)
            ).over(w_tbl)
            > 0,
        )
        .withColumn(
            "row_header",
            F.coalesce(F.max(F.when(F.col("col") == 0, F.col("text"))).over(w_row), F.lit("")),
        )
        .withColumn("n_marker", F.sum(F.when(data & marker, 1).otherwise(0)).over(w_row))
        .withColumn(
            "n_other_nonempty",
            F.sum(
                F.when(data & (F.col("col") >= 1) & ~marker & (F.col("text") != ""), 1).otherwise(
                    0
                )
            ).over(w_row),
        )
    )

    kv = T.StructType(
        [T.StructField("key", T.StringType()), T.StructField("value", T.StringType())]
    )

    def entry(k, v):
        return F.struct(k.alias("key"), v.alias("value"))

    entries_col = (
        F.when(
            F.col("ncols") == 2,
            F.when(
                F.col("col") == 1, F.array(entry(F.lit("value"), F.col("text")))
            ).otherwise(F.array().cast(T.ArrayType(kv))),
        )
        .when(
            (F.col("n_marker") == 1) & (F.col("n_other_nonempty") == 0),
            F.when(
                marker,
                # the notes entry exists only when the table HAS a header
                # row to select from (has_opts); a marked row in a
                # headerless table still yields its value entry
                F.when(
                    F.col("has_opts"),
                    F.array(
                        entry(F.lit("value"), F.coalesce("header", F.lit(""))),
                        entry(
                            F.lit("notes"),
                            F.concat(F.lit(rules.OPTION_NOTES_PREFIX), F.col("options")),
                        ),
                    ),
                ).otherwise(F.array(entry(F.lit("value"), F.coalesce("header", F.lit(""))))),
            ).otherwise(F.array().cast(T.ArrayType(kv))),
        )
        .otherwise(
            F.array(
                entry(
                    # '' headers are missing headers: the reference emits
                    # every empty grid cell as text '', so a NULL-only
                    # fallback would never fire on reference-shaped data
                    F.when(
                        F.col("header").isNull() | (F.col("header") == ""),
                        F.concat(F.lit("Column_"), F.col("col")),
                    ).otherwise(F.col("header")),
                    F.col("text"),
                )
            )
        )
    )

    return (
        df.filter(data & is_value_col)
        .withColumn("entries", entries_col)
        .select(
            "doc_id",
            "table_id",
            F.col("row").alias("row_idx"),
            "row_header",
            F.explode("entries").alias("e"),
        )
        .select(
            "doc_id",
            "table_id",
            "row_idx",
            "row_header",
            F.col("e.key").alias("key"),
            F.col("e.value").alias("value"),
        )
    )
