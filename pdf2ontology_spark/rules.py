"""The deterministic extraction rule constants shared by the engine, the
synthetic-corpus golden generator, and the DuckDB oracle SQL.

These encode the reference's reproducible semantics:
- semantic-table rules from the structured prompt at
  /root/reference/src/table_processors/table_content_extractor.py:98-175
  (2-col -> single_value; multi-col -> values map; option-selection "X"
  marker -> selected header; empty cells -> "" never null);
- the fallback triple rule at
  /root/reference/src/knowledge_extractor/triplet_extractor.py:339-384
  (subject = row_header [concept], predicate = related_to, object = each
  non-empty value [typed], confidence 0.6, source sentence
  "{row_header} has {key} of {value}");
- entity/relation typing rules from the extraction prompt at
  /root/reference/src/knowledge_extractor/triplet_extractor.py:183-213
  (values with units / pure numbers -> numeric, locations -> location,
  parameters -> concept, default -> other).

The regexes are written in the common subset of Java (Spark), RE2/PCRE
(DuckDB) and Python `re` dialects: no lookaround, no \\d shorthand
differences — so one string drives all three engines identically.
"""

from __future__ import annotations

# Option-selection markers (table_content_extractor.py:143-158, 186-190).
MARKERS = ["X", "x", "✓", "●"]

# "numeric" typing: pure number, decimal (., or ,), range "a-b", optional
# trailing unit token — "20", "5.2 bar", "20-50 l/min", "-10 °C".
NUMERIC_RE = r"^-?[0-9]+([.,][0-9]+)?(\s*-\s*-?[0-9]+([.,][0-9]+)?)?(\s[^\s]+)?$"

# Known location gazetteer (mirrors the reference corpus vocabulary, e.g.
# "Kesselhaus" in triplet_extractor.py:227-237).
LOCATIONS = [
    "Kesselhaus",
    "Pumpenhaus",
    "Leitwarte",
    "Turbinenhalle",
    "Werk Nord",
    "Halle 3",
    "Lager Süd",
    "Messwarte",
]

# Sentence-pattern rules for text-span mention/relation extraction
# (SURVEY.md §7.2 step 1; predicate set from enums.py:42-64). Each text
# span holds one sentence; group 1 = subject, group 2 = object.
# (pattern, predicate, subj_type, obj_type)
TEXT_PATTERNS = [
    (r"^Die Anlage (.+) befindet sich im (.+)\.$", "located_in", "product", "location"),
    (r"^Das Modul (.+) enthält (.+)\.$", "contains", "product", "product"),
    (r"^(.+) ist Teil von (.+)\.$", "part_of", "product", "product"),
    (r"^(.+) liefert (.+)\.$", "produces", "organization", "product"),
]

# Sentence-terminator rule for the cross-span merge (W5 — the
# reference's CrossPageContent "semantic_similarity" merging,
# content_models.py:55-82, made deterministic): a text span ENDS a
# sentence iff it ends with . ! or ? AND its final token is not an
# abbreviation or initial ("Dr.", "z.B.", "Anlage A.") — those dots
# continue in the next span. Shared by the engine (Spark rlike), the
# DuckDB oracle (regexp_matches) and the synthetic-corpus generator;
# written in the common Java/RE2/Python regex subset.
#
# Anchoring: a bare `$` is NOT dialect-identical — Java regex and
# Python `re` let it match before a trailing '\n' while DuckDB's RE2
# matches end-of-text only, so a span ending ".\n" would terminate in
# the engine but not in the oracle. Consuming the trailing whitespace
# run first puts `$` at the true end of text in every engine. The run
# is an EXPLICIT ASCII class, not `\s`: Python's `\s` is Unicode-wide
# (U+00A0 etc.) while Java and RE2 default to ASCII — the explicit
# class is the actual common subset.
_WS = r"[ \t\r\n\f]*"
TERMINATOR_RE = r"[.!?]" + _WS + "$"
ABBREV_RE = (
    r"(^|[ (])([A-Za-zÄÖÜäöü]|z\.B|Nr|Dr|Abb|bzw|ca|evtl|ggf|inkl|Inc|Ltd|Co)\."
    + _WS
    + "$"
)


def span_terminates(text: str) -> bool:
    """Python twin of the engine's JVM-side terminator test."""
    import re

    return bool(re.search(TERMINATOR_RE, text)) and not re.search(ABBREV_RE, text)


# Fallback-rule constants (triplet_extractor.py:365-381).
FALLBACK_CONFIDENCE = 0.6
FALLBACK_METHOD = "fallback_rule_based"
PATTERN_CONFIDENCE = 0.8
PATTERN_METHOD = "pattern_rule_based"
OPTION_NOTES_PREFIX = "Selected from options: "

# Name normalization for entity linking: lowercase, trim, strip
# punctuation, drop corporate suffixes. Shared Spark/DuckDB/Python.
LEGAL_SUFFIX_RE = (
    r"\s+(ag|a\.g\.|gmbh|g\.m\.b\.h\.|ltd|ltd\.|limited|inc|inc\.|co|co\.|kg)\s*$"
)
PUNCT_RE = r"[^a-z0-9äöüß]+"  # any run of non-alnum (incl. whitespace) -> one space


def classify_value(value: str) -> str:
    """Python twin of the engine's object typing (engine does it JVM-side)."""
    import re

    if re.match(NUMERIC_RE, value):
        return "numeric"
    if value in LOCATIONS:
        return "location"
    return "other"


def normalize_name(name: str) -> str:
    """Python twin of the engine's JVM-side name normalization."""
    import re

    s = name.lower().strip()
    s = re.sub(LEGAL_SUFFIX_RE, "", s)
    s = re.sub(PUNCT_RE, " ", s).strip()
    return s
