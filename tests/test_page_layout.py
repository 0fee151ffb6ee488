"""Page-layout table recognizer (geometric, reference
text_to_turtle_pdf_to_text.py semantics — see functions/page_layout.py)."""

from cmc_knowledge_graph_text2ttl_ray.functions.page_layout import (
    LayoutParams,
    Word,
    classify_segments,
    consolidate_segments,
    find_tables,
    recognize_doc,
    recognize_page,
)

P = LayoutParams()


def grid_drawings(x0=100, y0=100, cols=(0, 60, 120, 180), rows=(0, 20, 40, 60)):
    """Thin-rect drawings forming a table grid (full-span lines)."""
    d = []
    for r in rows:
        d.append((x0 + cols[0], y0 + r, x0 + cols[-1], y0 + r + 0.5))  # h-line
    for c in cols:
        d.append((x0 + c, y0 + rows[0], x0 + c + 0.5, y0 + rows[-1]))  # v-line
    return d


def word(x, y, text, w=None, h=8.0):
    w = w if w is not None else 5.0 * len(text)
    return (x, y, x + w, y + h, text)


def test_segment_classification_and_join():
    # a horizontal line split into two touching segments must merge
    segs = [(0, 10, 40, 10.5), (41, 10, 100, 10.5), (0, 50, 3, 50.4)]
    h, v = classify_segments(segs, P)
    assert len(h) == 2 and len(v) == 0  # short piece dropped at classify
    hl, vl = consolidate_segments(h, v, P)
    assert len(hl) == 1
    assert hl[0][0] == 0 and hl[0][2] == 100


def test_table_detection():
    h, v = classify_segments(grid_drawings(), P)
    hl, vl = consolidate_segments(h, v, P)
    tables = find_tables(hl, vl, P)
    assert len(tables) == 1
    t = tables[0]
    assert len(t.h_lines) == 4 and len(t.v_lines) == 4


def test_full_page_with_table_and_flow():
    drawings = grid_drawings()
    words = [
        word(10, 20, "Intro"),
        word(42, 20, "paragraph"),  # same line, close → joins
        # table cells (grid starts at (100,100); cols 60 wide, rows 20 high)
        word(105, 105, "Name"), word(165, 105, "Qty"), word(225, 105, "Unit"),
        word(105, 125, "Steel"), word(165, 125, "12"), word(225, 125, "kg"),
        word(105, 145, "Wire"), word(165, 145, "30"), word(225, 145, "m"),
        word(10, 200, "Outro"),
    ]
    xhtml = recognize_page(words, drawings, P)
    assert '<div class="page" pageno="1">' in xhtml
    assert xhtml.count("<table>") == 1
    assert xhtml.count("<tr>") == 3
    assert "<td><p>Name</p>\n</td>" in xhtml
    assert "<td><p>Steel</p>\n</td>" in xhtml
    # flow text joined and ordered around the table
    body = xhtml
    assert body.index("Intro paragraph") < body.index("<table>") < body.index("Outro")


def test_rowspan_merge():
    # remove the middle h-line between rows 2 and 3 in the FIRST column only:
    # the grid line spans from col2 onward, so (row2,col1) merges with (row3,col1)
    x0, y0 = 100, 100
    cols, rows = (0, 60, 120, 180), (0, 20, 40, 60, 80)
    d = []
    for i, r in enumerate(rows):
        if i == 2:
            d.append((x0 + cols[1], y0 + r, x0 + cols[-1], y0 + r + 0.5))
        else:
            d.append((x0 + cols[0], y0 + r, x0 + cols[-1], y0 + r + 0.5))
    for c in cols:
        d.append((x0 + c, y0 + rows[0], x0 + c + 0.5, y0 + rows[-1]))
    words = [word(105, 125, "Span")]
    xhtml = recognize_page(words, d, P)
    # Reference parity: the merged region object sits at every covered grid
    # position and Table.render walks all positions without dedupe
    # (text_to_turtle_pdf_to_text.py:299-309, :969-979), so the rowspan
    # content renders once per covered row.
    assert xhtml.count("<p>Span</p>") == 2
    assert xhtml.count("<tr>") == 4


def test_word_spill_to_neighbor_cell():
    drawings = grid_drawings()
    # word starts just above its real cell row boundary but mostly overlaps row 2
    words = [Word(105, 118.5, 130, 128, "Spilled")]
    xhtml = recognize_page(words, drawings, P)
    assert "<p>Spilled</p>" in xhtml
    assert xhtml.count("<table>") == 1


def test_column_join_and_doc_wrapper():
    words = [
        word(10, 10, "First line of column text"),
        word(10, 20, "second line same width abc"),
    ]
    out = recognize_doc([(words, []), ([word(10, 10, "PageTwo")], [])])
    assert out.count('<div class="page"') == 2
    assert 'pageno="2"' in out
    assert "First line of column text<br/>second line same width abc" in out


def test_word_in_bounds_slack_below_grid_does_not_crash():
    """Regression (code review): a word inside the table-bounds slack but
    past the last grid line must clamp to the edge cell, not IndexError."""
    drawings = grid_drawings()
    # grid y range 100..160; word starts at y=160.5 (inside +1.2 slack)
    words = [Word(105, 160.5, 130, 161.0, "Slack")]
    xhtml = recognize_page(words, drawings, P)
    assert "<table>" in xhtml  # page still renders
