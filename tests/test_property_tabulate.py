"""Property-style conformance test (SURVEY §5 plan item 5): 80 seeded
random sparse cell grids -> engine semantic entries must equal an
INDEPENDENT pure-Python implementation of the reference's table rules.
All grids evaluate in ONE Spark job (batched), so the test stays fast.
"""

import json
import random

from pyspark.sql import Row

from pdf2ontology_spark import rules
from pdf2ontology_spark.operators import segment, tabulate

TEXT_POOL = ["", "X", "✓", "durchfluss", "20-50 l/min", "5.2", "Wert", "flüssig",
             "Kesselhaus", "a b", "Parameter", "x"]


def ref_entries(cells: list[dict]) -> set:
    """Independent reimplementation of the semantic-table rules
    (table_content_extractor.py:98-175 + conversion :700-723)."""
    if not cells:
        return set()
    ncols = max(c["col"] for c in cells) + 1
    headers = {c["col"]: c["text"] for c in cells if c["row"] == 0}
    opts = ", ".join(headers[c] for c in sorted(headers) if c >= 1)
    by_row: dict[int, list[dict]] = {}
    for c in cells:
        if c["row"] >= 1:
            by_row.setdefault(c["row"], []).append(c)
    out = set()
    for r, rcs in by_row.items():
        row_header = next((c["text"] for c in rcs if c["col"] == 0), "")
        vals = [c for c in rcs if c["col"] >= 1]
        n_marker = sum(1 for c in vals if c["text"] in rules.MARKERS)
        n_other = sum(1 for c in vals if c["text"] not in rules.MARKERS and c["text"] != "")
        if ncols == 2:
            for c in vals:
                if c["col"] == 1:
                    out.add((r, row_header, "value", c["text"]))
        elif n_marker == 1 and n_other == 0:
            m = next(c for c in vals if c["text"] in rules.MARKERS)
            out.add((r, row_header, "value", headers.get(m["col"], "")))
            out.add((r, row_header, "notes", rules.OPTION_NOTES_PREFIX + opts))
        else:
            for c in vals:
                key = headers.get(c["col"])
                if key is None:
                    key = f"Column_{c['col']}"
                out.add((r, row_header, key, c["text"]))
    return out


def gen_grid(rng: random.Random) -> list[dict]:
    ncols = rng.randint(1, 5)
    nrows = rng.randint(0, 5)
    cells, seen = [], set()
    for r in range(nrows + 1):
        for c in range(ncols):
            if rng.random() < 0.75 and (r, c) not in seen:
                seen.add((r, c))
                cells.append({"row": r, "col": c, "text": rng.choice(TEXT_POOL)})
    return cells


def test_random_grids_match_reference_impl(spark):
    rng = random.Random(20260816)
    grids = {f"g{i:03d}": gen_grid(rng) for i in range(80)}
    docs = spark.createDataFrame(
        [
            Row(
                doc_id=gid,
                spans=[Row(kind="table", text=json.dumps(cells), media_ref="", offset=0)],
            )
            for gid, cells in grids.items()
        ]
    )
    got: dict[str, set] = {gid: set() for gid in grids}
    entries = tabulate.semantic_entries(tabulate.table_cells(segment.explode_spans(docs)))
    for row in entries.collect():
        got[row.doc_id].add((row.row_idx, row.row_header, row.key, row.value))
    mismatches = {
        gid: (got[gid], ref_entries(cells), cells)
        for gid, cells in grids.items()
        if got[gid] != ref_entries(cells)
    }
    assert not mismatches, f"{len(mismatches)} grids diverge; first: " + str(
        next(iter(mismatches.items()))
    )
