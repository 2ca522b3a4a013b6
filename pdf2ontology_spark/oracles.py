"""DuckDB oracle SQL for the KG pipeline queries.

Each SQL string *independently recomputes* the operator's semantics from
the synthetic spans parquet (FIXTURES.md F6) — it is not a dump of the
engine's output. The SQL mirrors pdf2ontology_spark/rules.py constants;
regexes are dialect-portable (no lookaround, no escapes that differ).

DuckDB notes: regexp_replace needs the 'g' flag for replace-all (Spark
replaces all by default); numeric literals must be CAST to DOUBLE to
match Spark's DoubleType.
"""

from __future__ import annotations

import os

from pdf2ontology_spark import rules, synth

US = "chr(31)"  # unit separator used in deterministic ids


def spans_path(tag: str = "sf0.01") -> str:
    return os.path.join(synth.SYNTH_BASE, tag, "documents_spans.parquet")


def _markers_sql() -> str:
    return "(" + ", ".join(f"'{m}'" for m in rules.MARKERS) + ")"


def _locations_sql() -> str:
    return "(" + ", ".join(f"'{loc}'" for loc in rules.LOCATIONS) + ")"


def spans_cte(tag: str = "sf0.01") -> str:
    return f"""
spans AS (
  SELECT doc_id, s.kind AS kind, coalesce(s.text, '') AS text,
         coalesce(s.media_ref, '') AS media_ref, s."offset" AS off
  FROM (SELECT doc_id, unnest(spans) AS s
        FROM read_parquet('{spans_path(tag)}'))
)"""


def cells_cte() -> str:
    return """
cells AS (
  SELECT doc_id, table_id, c."row" AS r, c."col" AS cc, coalesce(c.text, '') AS txt
  FROM (
    SELECT doc_id,
           sha256(doc_id || ':' || CAST(off AS VARCHAR)) AS table_id,
           unnest(json_transform(text,
             '[{"row":"INTEGER","col":"INTEGER","text":"VARCHAR"}]')) AS c
    FROM spans WHERE kind = 'table')
)"""


def entries_ctes() -> str:
    """grid/opts/rowstats/entries — the semantic-table rules in SQL."""
    m = _markers_sql()
    return f"""
grid AS (
  SELECT doc_id, table_id, r, cc, txt,
    max(CASE WHEN r = 0 THEN txt END)
      OVER (PARTITION BY doc_id, table_id, cc) AS header,
    max(cc) OVER (PARTITION BY doc_id, table_id) + 1 AS ncols
  FROM cells
),
opts AS (
  SELECT doc_id, table_id, string_agg(txt, ', ' ORDER BY cc) AS options
  FROM cells WHERE r = 0 AND cc >= 1 GROUP BY doc_id, table_id
),
rowstats AS (
  SELECT doc_id, table_id, r,
    coalesce(max(CASE WHEN cc = 0 THEN txt END), '') AS row_header,
    sum(CASE WHEN cc >= 1 AND txt IN {m} THEN 1 ELSE 0 END) AS n_marker,
    sum(CASE WHEN cc >= 1 AND txt NOT IN {m} AND txt <> '' THEN 1 ELSE 0 END) AS n_other
  FROM cells GROUP BY doc_id, table_id, r
),
entries AS (
  SELECT g.doc_id, g.table_id, g.r AS row_idx, rs.row_header, 'value' AS key, g.txt AS value
  FROM grid g JOIN rowstats rs ON rs.doc_id = g.doc_id AND rs.table_id = g.table_id AND rs.r = g.r
  WHERE g.r >= 1 AND g.ncols = 2 AND g.cc = 1
  UNION ALL
  SELECT g.doc_id, g.table_id, g.r, rs.row_header, 'value', coalesce(g.header, '')
  FROM grid g JOIN rowstats rs ON rs.doc_id = g.doc_id AND rs.table_id = g.table_id AND rs.r = g.r
  WHERE g.r >= 1 AND g.ncols <> 2 AND rs.n_marker = 1 AND rs.n_other = 0
    AND g.cc >= 1 AND g.txt IN {m}
  UNION ALL
  SELECT g.doc_id, g.table_id, g.r, rs.row_header, 'notes',
         'Selected from options: ' || o.options
  FROM grid g
  JOIN rowstats rs ON rs.doc_id = g.doc_id AND rs.table_id = g.table_id AND rs.r = g.r
  JOIN opts o ON o.doc_id = g.doc_id AND o.table_id = g.table_id
  WHERE g.r >= 1 AND g.ncols <> 2 AND rs.n_marker = 1 AND rs.n_other = 0
    AND g.cc >= 1 AND g.txt IN {m}
  UNION ALL
  SELECT g.doc_id, g.table_id, g.r, rs.row_header,
         coalesce(g.header, 'Column_' || CAST(g.cc AS VARCHAR)), g.txt
  FROM grid g JOIN rowstats rs ON rs.doc_id = g.doc_id AND rs.table_id = g.table_id AND rs.r = g.r
  WHERE g.r >= 1 AND g.cc >= 1 AND g.ncols <> 2
    AND NOT (rs.n_marker = 1 AND rs.n_other = 0)
)"""


def obj_type_sql(col: str) -> str:
    return f"""CASE WHEN regexp_matches({col}, '{rules.NUMERIC_RE}') THEN 'numeric'
       WHEN {col} IN {_locations_sql()} THEN 'location'
       ELSE 'other' END"""


def table_triples_cte() -> str:
    return f"""
table_triples AS (
  SELECT doc_id, table_id, row_header AS subj_name, 'concept' AS subj_type,
         'related_to' AS predicate, value AS obj_name,
         {obj_type_sql("value")} AS obj_type,
         CAST(0.6 AS DOUBLE) AS confidence,
         row_header || ' has ' || key || ' of ' || value AS source_sentence,
         'fallback_rule_based' AS extraction_method
  FROM entries WHERE value <> ''
)"""


def merged_cte() -> str:
    """Cross-span merge (W5): a text span not ending in '.' continues in
    the next text span; the continuation is consumed."""
    return """
merged AS (
  SELECT doc_id,
    CASE WHEN NOT (text LIKE '%.') AND next_text IS NOT NULL
         THEN text || ' ' || next_text ELSE text END AS sentence
  FROM (
    SELECT doc_id, off, text,
      lead(text) OVER (PARTITION BY doc_id ORDER BY off) AS next_text,
      lag(text) OVER (PARTITION BY doc_id ORDER BY off) AS prev_text
    FROM spans WHERE kind = 'text')
  WHERE prev_text IS NULL OR prev_text LIKE '%.'
)"""


def text_triples_cte() -> str:
    parts = []
    for pat, pred, st, ot in rules.TEXT_PATTERNS:
        parts.append(
            f"""
  SELECT doc_id, CAST(NULL AS VARCHAR) AS table_id,
         regexp_extract(sentence, '{pat}', 1) AS subj_name, '{st}' AS subj_type,
         '{pred}' AS predicate,
         regexp_extract(sentence, '{pat}', 2) AS obj_name, '{ot}' AS obj_type,
         CAST(0.8 AS DOUBLE) AS confidence, sentence AS source_sentence,
         'pattern_rule_based' AS extraction_method
  FROM merged WHERE regexp_matches(sentence, '{pat}')"""
        )
    return merged_cte() + ",\ntext_triples AS (" + "\n  UNION ALL".join(parts) + "\n)"


def all_triples_sql(tag: str = "sf0.01") -> str:
    return (
        "WITH "
        + ",".join(
            [spans_cte(tag), cells_cte(), entries_ctes(), table_triples_cte(), text_triples_cte()]
        )
        + "\nSELECT * FROM table_triples UNION ALL SELECT * FROM text_triples"
    )


def triples_prefix(tag: str = "sf0.01") -> str:
    """WITH-prefix ending in a unified ``triples`` CTE, for downstream queries."""
    return (
        "WITH "
        + ",".join(
            [spans_cte(tag), cells_cte(), entries_ctes(), table_triples_cte(), text_triples_cte()]
        )
        + ",\ntriples AS (SELECT * FROM table_triples UNION ALL SELECT * FROM text_triples)"
    )


def normalize_sql(col: str) -> str:
    """SQL twin of graph.normalize_name_col (note 'g' flags)."""
    s = f"trim(lower({col}))"
    s = f"regexp_replace({s}, '{rules.LEGAL_SUFFIX_RE}', '')"
    return f"trim(regexp_replace({s}, '{rules.PUNCT_RE}', ' ', 'g'))"


def entity_id_sql(name: str, etype: str) -> str:
    key = (
        f"CASE WHEN {etype} IN ('numeric','date') THEN trim({name}) "
        f"ELSE {normalize_sql(name)} END"
    )
    return f"sha256({key} || {US} || {etype})"


def mentions_cte() -> str:
    return """
mentions AS (
  SELECT subj_name AS name, subj_type AS entity_type, confidence FROM triples
  UNION ALL
  SELECT obj_name, obj_type, confidence FROM triples
)"""
