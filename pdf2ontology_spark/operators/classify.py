"""Document-type classification — deterministic keyword scorer replacing
the reference's GPT-4o-mini call (/root/reference/src/classifier.py:41-62;
class list at classifier.py:50: Technical Manual, Purchase Order,
Financial Report, Contract, Conference Paper, Other).

Reference semantics preserved: input is the document text truncated to
4000 chars (classifier.py:52, SURVEY F7); output is exactly one class.
The scorer counts class-keyword hits in the lowered truncated text
(the indicator-phrase-counting idiom the reference itself uses
deterministically at document_condition_analyzer.py:280-294); argmax
with a fixed class order for ties; zero hits -> "Other".
Pure JVM expressions, SQL-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# fixed class order = deterministic tie-break (first wins)
DOC_CLASSES: list[tuple[str, list[str]]] = [
    ("Technical Manual", ["manual", "installation", "betriebsanleitung", "datenblatt",
                          "specification", "parameter", "wartung"]),
    ("Purchase Order", ["purchase order", "bestellung", "order number", "quantity",
                        "lieferant", "unit price"]),
    ("Financial Report", ["revenue", "quarter", "fiscal", "umsatz", "bilanz",
                          "earnings", "profit"]),
    ("Contract", ["agreement", "contract", "vertrag", "party", "hereinafter",
                  "terms and conditions"]),
    ("Conference Paper", ["abstract", "introduction", "related work", "references",
                          "we propose", "evaluation"]),
]

TRUNCATE_CHARS = 4000  # classifier.py:52


def _hits(lowered: Column, keywords: list[str]) -> Column:
    """Count of keywords present (instr > 0) — the indicator-counting
    idiom of document_condition_analyzer.py:280-294."""
    arr = F.array(*[F.lit(k) for k in keywords])
    return F.size(F.filter(arr, lambda k: F.instr(lowered, k) > 0))


def classify_documents(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, <class>_hits..., doc_type)."""
    lowered = F.lower(F.substring(F.col(text_col), 1, TRUNCATE_CHARS))
    out = df.select(F.col(id_col).alias("id"), lowered.alias("_t"))
    score_cols = []
    for name, kws in DOC_CLASSES:
        cname = name.lower().replace(" ", "_") + "_hits"
        out = out.withColumn(cname, _hits(F.col("_t"), kws).cast("long"))
        score_cols.append(cname)

    # argmax with fixed-order tie-break: walk classes in order, keep the
    # first whose score equals the max and max > 0
    best = F.greatest(*[F.col(c) for c in score_cols])
    doc_type = F.lit("Other")
    for name, _ in reversed(DOC_CLASSES):
        cname = name.lower().replace(" ", "_") + "_hits"
        doc_type = F.when((best > 0) & (F.col(cname) == best), F.lit(name)).otherwise(
            doc_type
        )
    return out.withColumn("doc_type", doc_type).drop("_t")
