"""Grid-reconstruction operators (SURVEY J2/J3/J5, W1/W3/W4, A8-A11) on
hand-built detection fixtures with exact expectations."""

from pdf2ontology_spark.operators import grid


def _bands(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, table_id string, bucket string, x double, y double, w double, h double"
    )


def test_index_bands_w1(spark):
    det = _bands(
        spark,
        [
            ("d", "t", "row", 0.0, 0.5, 1.0, 0.2),
            ("d", "t", "row", 0.0, 0.1, 1.0, 0.2),
            ("d", "t", "column", 0.6, 0.0, 0.3, 1.0),
            ("d", "t", "column", 0.1, 0.0, 0.4, 1.0),
        ],
    )
    rows = {(r.y): r.idx for r in grid.index_bands(det, "row").collect()}
    cols = {(r.x): r.idx for r in grid.index_bands(det, "column").collect()}
    assert rows == {0.1: 0, 0.5: 1}
    assert cols == {0.1: 0, 0.6: 1}


def test_assign_cells_j3(spark):
    det = _bands(
        spark,
        [
            ("d", "t", "row", 0.0, 0.0, 1.0, 0.5),
            ("d", "t", "row", 0.0, 0.5, 1.0, 0.5),
            ("d", "t", "column", 0.0, 0.0, 0.5, 1.0),
            ("d", "t", "column", 0.5, 0.0, 0.5, 1.0),
        ],
    )
    rows, cols = grid.index_bands(det, "row"), grid.index_bands(det, "column")
    cells = spark.createDataFrame(
        [
            ("d", "t", "c1", 0.05, 0.05, 0.4, 0.4, "a"),  # -> (0,0)
            ("d", "t", "c2", 0.55, 0.6, 0.4, 0.3, "b"),  # -> (1,1)
        ],
        "doc_id string, table_id string, cell_id string, x double, y double, w double, h double, text string",
    )
    got = {r.cell_id: (r.row, r.col) for r in grid.assign_cells(cells, rows, cols).collect()}
    assert got == {"c1": (0, 0), "c2": (1, 1)}


def _grid_cells(spark):
    rows = []
    for r in range(3):
        for c in range(3):
            rows.append(("d", "t", r, c, 0.33 * c, 0.33 * r, 0.33, 0.33, f"v{r}{c}"))
    return spark.createDataFrame(
        rows,
        "doc_id string, table_id string, row int, col int, x double, y double, w double, h double, text string",
    )


def test_apply_spanning_cells_j2(spark):
    spans = spark.createDataFrame(
        [("d", "t", "s1", 0.0, 0.0, 0.66, 0.33)],  # covers (0,0) and (0,1)
        "doc_id string, table_id string, span_id string, x double, y double, w double, h double",
    )
    out = {(r.row, r.col): r for r in grid.apply_spanning_cells(_grid_cells(spark), spans).collect()}
    assert out[(0, 0)].cell_type == "merged"
    assert out[(0, 0)].rowspan == 1 and out[(0, 0)].colspan == 2
    assert out[(0, 1)].cell_type == "empty"
    assert out[(1, 1)].cell_type == "normal" and out[(1, 1)].colspan == 1


def test_expand_and_pivot_j5_w4(spark):
    cells = spark.createDataFrame(
        [
            ("d", "t", 0, 0, "H1", 1, 2),  # header spanning 2 cols
            ("d", "t", 0, 2, "H2", 1, 1),
            ("d", "t", 1, 0, "a", 1, 1),
            ("d", "t", 1, 1, "b", 1, 1),
            ("d", "t", 1, 2, "c", 1, 1),
        ],
        "doc_id string, table_id string, row int, col int, text string, rowspan int, colspan int",
    )
    expanded = grid.expand_spans(cells)
    got = {(r.row, r.col): r.text for r in expanded.collect()}
    assert got[(0, 0)] == "H1" and got[(0, 1)] == "" and got[(0, 2)] == "H2"

    maps = grid.grid_to_row_maps(expanded).collect()
    assert len(maps) == 1
    rm = maps[0].row_map
    # col 1 has empty header after expansion -> Column_1 fallback
    assert rm == {"H1": "a", "Column_1": "b", "H2": "c"}


def test_header_levels_w3(spark):
    headers = spark.createDataFrame(
        [("d", "t", 0.02, 0.0), ("d", "t", 0.021, 0.5), ("d", "t", 0.3, 0.0)],
        "doc_id string, table_id string, y double, x double",
    )
    levels = {r.y: r.level for r in grid.header_levels(headers).collect()}
    assert levels == {0.02: 0, 0.021: 0, 0.3: 1}  # same round(y*10) bucket -> same level


def test_dominant_angle_a8_a10(spark):
    contours = spark.createDataFrame(
        [("i1", 2.0, 10.0), ("i1", 4.0, 30.0), ("i1", -80.0, 1.0)],
        "image_id string, angle double, area double",
    )
    r = grid.dominant_angle(contours).collect()[0]
    assert abs(r.weighted_angle - ((2 * 10 + 4 * 30 - 80) / 41.0)) < 1e-6
    assert r.median_angle == 2.0
    # bins of width 5 over [-90,90): angles 2.0 and 4.0 share bin 18 -> center 2.5
    assert r.dense_bin_center == 2.5
