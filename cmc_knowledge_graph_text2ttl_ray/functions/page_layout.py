"""Page-layout table recognizer: geometric table detection over abstract
page primitives (word boxes + thin drawing rectangles) → XHTML.

Engine equivalent of the reference's PDF table-recognition pipeline
(kg_text_to_ttl/text_to_turtle_pdf_to_text.py:313-998, seven phases
documented at :319-337). The reference binds the geometry to PyMuPDF
drawings; here the same semantics run over plain coordinate tuples, so any
producer (a PDF parser, an OCR layout model, a synthetic fixture) can feed
it and the recognizer is unit-testable without codec libraries.

Inputs per page:
- ``words``:    (x0, y0, x1, y1, text) tuples — the extracted word boxes.
- ``drawings``: (x0, y0, x1, y1) tuples — drawn rectangles; thin ones are
  table grid-line candidates.

Phases (reference file:line in each function):
1. segment classification    (:689-717)
2. segment consolidation     (:720-785)
3. border identification     (:788-820)
4. table identification      (:824-860)
5. cell-region construction + block capture (incl. rowspan merge, spill to
   best-overlap neighbor)    (:873-981)
6. cell-content consolidation (:984-989)
7. flow-text consolidation   (:482-686)
Render: ``<p>`` paragraphs and ``<table><tr><td>`` grids inside
``<div class="page" pageno="…">`` (:214-309, :396-397, :473-474).
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass, field
from functools import cmp_to_key

__all__ = ["LayoutParams", "Word", "recognize_page", "recognize_doc"]

_ALIGN_EPS = 1e-4


@dataclass
class LayoutParams:
    """Tuning constants (reference :357-380)."""

    min_line_length: float = 5.0
    max_line_width: float = 1.2
    min_guideline_length: float = 16.0
    max_line_offset: float = 0.5
    max_join_distance: float = 1.5
    max_border_dist: float = 2.0
    border_threshold: int = 4
    table_min_h_lines: int = 3
    table_min_v_lines: int = 4
    sufficient_cell_overlap: float = 0.9
    min_cell_overlap: float = 0.5
    min_line_join_height_dist: float = 0.2
    max_line_join_height_offset: float = 0.4
    text_col_epsilon: float = 1.0
    same_row_overlap_fraction: float = 0.87
    narrower_col_extension_fraction: float = 0.25
    wider_col_extension_fraction: float = 0.5
    page_div: bool = True


@dataclass
class Word:
    x0: float
    y0: float
    x1: float
    y1: float
    text: str

    @property
    def width(self) -> float:
        return self.x1 - self.x0

    @property
    def height(self) -> float:
        return self.y1 - self.y0

    @property
    def cy(self) -> float:
        return (self.y0 + self.y1) / 2


# A line segment / box is a 4-list [x0, y0, x1, y1] (mutable for merging).
Seg = list


def _cx(s: Seg) -> float:
    return (s[0] + s[2]) / 2


def _cy(s: Seg) -> float:
    return (s[1] + s[3]) / 2


def _grow(a: Seg, b: Seg) -> None:
    a[0] = min(a[0], b[0])
    a[1] = min(a[1], b[1])
    a[2] = max(a[2], b[2])
    a[3] = max(a[3], b[3])


def _box_area(x0, y0, x1, y1) -> float:
    if x0 >= x1 or y0 >= y1:
        return 0.0
    return (x1 - x0) * (y1 - y0)


def _eps_overlaps(a, b, eps: float) -> bool:
    return (b[0] <= a[2] + eps and b[2] >= a[0] - eps
            and b[1] <= a[3] + eps and b[3] >= a[1] - eps)


# --------------------------------------------------------------- phases 1-2


def classify_segments(drawings, p: LayoutParams):
    """Phase 1: thin drawn rects → horizontal / vertical line segments."""
    h_segs: list[Seg] = []
    v_segs: list[Seg] = []
    for x0, y0, x1, y1 in drawings:
        if y1 - y0 <= p.max_line_width:
            if x1 - x0 >= p.min_line_length:
                h_segs.append([x0, y0, x1, y1])
        elif x1 - x0 < p.max_line_width:
            if y1 - y0 >= p.min_line_length:
                v_segs.append([x0, y0, x1, y1])
    return h_segs, v_segs


def _join_collinear(segs, same_level, gap_between, sort_cmp, p: LayoutParams):
    ordered = sorted(segs, key=cmp_to_key(sort_cmp))
    joined: list[Seg] = []
    pred: Seg | None = None
    for s in ordered:
        if pred is None:
            pred = s
        elif same_level(s, pred) and gap_between(s, pred) <= p.max_join_distance:
            _grow(pred, s)
        else:
            joined.append(pred)
            pred = s
    if pred is not None:
        joined.append(pred)
    return joined


def consolidate_segments(h_segs, v_segs, p: LayoutParams):
    """Phase 2: join near-collinear touching segments; drop short lines."""

    def h_cmp(a, b):
        if abs(_cy(a) - _cy(b)) <= p.max_line_offset:
            return a[0] - b[0]
        return a[1] - b[1]

    def v_cmp(a, b):
        if abs(_cx(a) - _cx(b)) <= p.max_line_offset:
            return a[1] - b[1]
        return a[0] - b[0]

    h_lines = _join_collinear(
        h_segs,
        same_level=lambda s, t: abs(_cy(s) - _cy(t)) <= p.max_line_offset,
        gap_between=lambda s, t: abs(s[0] - t[2]),
        sort_cmp=h_cmp,
        p=p,
    )
    v_lines = _join_collinear(
        v_segs,
        same_level=lambda s, t: abs(_cx(s) - _cx(t)) <= p.max_line_offset,
        gap_between=lambda s, t: abs(s[1] - t[3]),
        sort_cmp=v_cmp,
        p=p,
    )
    h_lines = [s for s in h_lines if s[2] - s[0] > p.min_guideline_length]
    v_lines = [s for s in v_lines if s[3] - s[1] > p.min_guideline_length]
    return h_lines, v_lines


# --------------------------------------------------------------- phases 3-4


def find_borders(h_lines, v_lines, p: LayoutParams):
    """Phase 3: a line is a border when ≥ threshold perpendicular lines
    terminate within max_border_dist of it."""
    top, bot = [], []
    for hl in h_lines:
        starts = sum(1 for vl in v_lines if abs(_cy(hl) - vl[1]) <= p.max_border_dist)
        ends = sum(1 for vl in v_lines if abs(_cy(hl) - vl[3]) <= p.max_border_dist)
        if starts >= p.border_threshold:
            top.append(hl)
        if ends >= p.border_threshold:
            bot.append(hl)
    left, right = [], []
    for vl in v_lines:
        starts = sum(1 for hl in h_lines if abs(_cx(vl) - hl[0]) <= p.max_border_dist)
        ends = sum(1 for hl in h_lines if abs(_cx(vl) - hl[2]) <= p.max_border_dist)
        if starts >= p.border_threshold:
            left.append(vl)
        if ends >= p.border_threshold:
            right.append(vl)
    return top, bot, left, right


@dataclass
class TableGrid:
    h_lines: list
    v_lines: list
    bounds: tuple  # (x0, y0, x1, y1) — y from h_lines, x from v_lines (:290-295)
    cells: list = field(default_factory=list)  # rows × cols of _CellRegion


def _grid_bounds(h_lines, v_lines):
    y0 = min(l[1] for l in h_lines)
    y1 = max(l[3] for l in h_lines)
    x0 = min(l[0] for l in v_lines)
    x1 = max(l[2] for l in v_lines)
    return (x0, y0, x1, y1)


def find_tables(h_lines, v_lines, p: LayoutParams) -> list[TableGrid]:
    """Phase 4: 4-border combinations enclosing enough grid lines; bigger
    overlapping table replaces smaller."""
    top, bot, left, right = find_borders(h_lines, v_lines, p)
    tables: list[TableGrid] = []
    eps = p.max_border_dist
    for t_bd in top:
        for l_bd in left:
            if not _eps_overlaps(t_bd, l_bd, eps):
                continue
            for r_bd in right:
                if not _eps_overlaps(t_bd, r_bd, eps):
                    continue
                for b_bd in bot:
                    if not (_eps_overlaps(l_bd, b_bd, eps) and _eps_overlaps(r_bd, b_bd, eps)):
                        continue
                    area = [_cx(l_bd), _cy(t_bd), _cx(r_bd), _cy(b_bd)]
                    grid_h = [h for h in h_lines if _eps_overlaps(area, h, eps)]
                    grid_v = [v for v in v_lines if _eps_overlaps(area, v, eps)]
                    if len(grid_v) < p.table_min_v_lines or len(grid_h) < p.table_min_h_lines:
                        continue
                    overlap, replace_at = False, None
                    for i, other in enumerate(tables):
                        ob = other.bounds
                        if (area[0] <= ob[2] and area[2] >= ob[0]
                                and area[1] <= ob[3] and area[3] >= ob[1]):
                            overlap = True
                            if _box_area(*area) > _box_area(*ob):
                                replace_at = i
                            break
                    if not overlap or replace_at is not None:
                        tab = TableGrid(grid_h, grid_v, _grid_bounds(grid_h, grid_v))
                        if replace_at is None:
                            tables.append(tab)
                        else:
                            tables[replace_at] = tab
    return tables


# ------------------------------------------------------------------ phase 5


class _CellRegion:
    __slots__ = ("x0", "y0", "x1", "y1", "words")

    def __init__(self, x0, y0, x1, y1):
        self.x0, self.y0, self.x1, self.y1 = x0, y0, x1, y1
        self.words: list[Word] = []

    def intersect_area(self, w: Word) -> float:
        return _box_area(max(self.x0, w.x0), max(self.y0, w.y0),
                         min(self.x1, w.x1), min(self.y1, w.y1))


def build_cell_regions(table: TableGrid, p: LayoutParams):
    """Cell grid with rowspan merge (:945-981): if the line above a cell
    does not actually span it, the cell joins the region from the row above."""
    h = sorted(table.h_lines, key=lambda l: l[1])
    v = sorted(table.v_lines, key=lambda l: l[0])
    rows: list[list[_CellRegion]] = []
    for h0, h1 in zip(h[:-1], h[1:]):
        row: list[_CellRegion] = []
        for v0, v1 in zip(v[:-1], v[1:]):
            cx0, cy0, cx1, cy1 = _cx(v0), _cy(h0), _cx(v1), _cy(h1)
            core_x0, core_x1 = cx0 + p.max_join_distance, cx1 - p.max_join_distance
            if not rows or (h0[0] <= core_x0 and h0[2] >= core_x1):
                cell = _CellRegion(cx0, cy0, cx1, cy1)
            else:
                # vertical merge: reuse the region above, extend its bounds
                cell = rows[-1][len(row)]
                cell.x0, cell.y0 = min(cell.x0, cx0), min(cell.y0, cy0)
                cell.x1, cell.y1 = max(cell.x1, cx1), max(cell.y1, cy1)
            row.append(cell)
        rows.append(row)
    return rows, h, v


def capture_cell_words(table: TableGrid, words: list[Word], p: LayoutParams):
    """Assign words to cells (:873-942): bisect by (row, col) line position,
    spill to the best-overlapping neighbor if < sufficient overlap, reject
    below min overlap. Returns the words NOT captured by the table."""
    rows, h, v = build_cell_regions(table, p)
    no_rows, no_cols = len(h) - 1, len(v) - 1
    bx0, by0, bx1, by1 = table.bounds
    bx0, by0, bx1, by1 = bx0 - 1.2, by0 - 1.2, bx1 + 1.2, by1 + 1.2  # (:893)
    remaining: list[Word] = []
    for w in words:
        if not (w.x0 >= bx0 and w.x1 <= bx1 and w.y0 >= by0 and w.y1 <= by1):
            remaining.append(w)
            continue
        wa = _box_area(w.x0, w.y0, w.x1, w.y1)
        ri = bisect.bisect_left(h, w.y0, key=lambda l: l[1])
        if ri >= len(rows) or (ri > 0 and w.y0 < rows[ri][0].y0):
            ri -= 1
        ri = min(ri, len(rows) - 1)  # words in the bounds slack below the
        ci = bisect.bisect_left(v, w.x0, key=lambda l: l[0])
        if ci >= len(rows[ri]) or (ci > 0 and w.x0 < rows[ri][ci].x0):
            ci -= 1
        ci = min(ci, len(rows[ri]) - 1)  # last grid line must clamp, not crash
        cell = rows[ri][ci]
        best = cell.intersect_area(w)
        if best < wa * p.sufficient_cell_overlap:
            for rd in range(max(0, ri - 1), min(no_rows, ri + 2)):
                for cd in range(max(0, ci - 1), min(no_cols, ci + 2)):
                    a = rows[rd][cd].intersect_area(w)
                    if a > best:
                        cell, best = rows[rd][cd], a
        if best >= wa * p.min_cell_overlap:
            cell.words.append(w)
        else:
            remaining.append(w)
    table.cells = rows
    return remaining


# ------------------------------------------------------------------ phase 7


def _aligned(a: float, b: float) -> bool:
    return abs(a - b) <= _ALIGN_EPS


def _next_word_on_line(a: Word, b: Word) -> bool:
    """Top-aligned and within 1.5 average-char widths (:554-558)."""
    if not _aligned(a.y0, b.y0):
        return False
    avg_char = a.width / max(1, len(a.text))
    return b.x0 > a.x1 and b.x0 < a.x1 + avg_char * 1.5


def _merge_words(a: Word, b: Word, sep: str) -> Word:
    return Word(min(a.x0, b.x0), min(a.y0, b.y0), max(a.x1, b.x1), max(a.y1, b.y1),
                f"{a.text}{sep}{b.text}")


def join_top_aligned(words: list[Word]) -> list[Word]:
    """(:526-551) left-to-right join of top-aligned close neighbors."""

    def cmp(a: Word, b: Word):
        if _aligned(a.y0, b.y0):
            return a.x0 - b.x0
        return a.y0 - b.y0

    out: list[Word] = []
    pred: Word | None = None
    for w in sorted(words, key=cmp_to_key(cmp)):
        if pred is not None and _next_word_on_line(pred, w):
            pred = _merge_words(pred, w, " ")
        else:
            if pred is not None:
                out.append(pred)
            pred = w
    if pred is not None:
        out.append(pred)
    return out


def join_x_adjacent(words: list[Word]) -> list[Word]:
    """(:561-590) join across the x axis when the follower overlaps the
    predecessor's vertical center."""
    words = sorted(words, key=lambda w: w.x0)
    i = 0
    while i < len(words) - 1:
        b = words[i]
        avg_char = b.width / max(1, len(b.text))
        n = i + 1
        while n < len(words) and words[n].x0 < b.x1:
            n += 1
        while n < len(words) and words[n].x0 < b.x1 + 1.5 * avg_char:
            cand = words[n]
            if cand.y0 <= b.cy <= cand.y1:
                b = _merge_words(b, cand, " ")
                words[i] = b
                del words[n]
            else:
                n += 1
        i += 1
    return words


def _column_extension(top: Word, bot: Word, p: LayoutParams) -> bool:
    """(:626-665) width-ratio heuristic for column continuation."""
    if top.width >= bot.width:
        if (abs(bot.x0 - top.x0) < p.text_col_epsilon
                or abs(bot.x1 - top.x1) < p.text_col_epsilon):
            return True
        return bot.width / top.width >= p.narrower_col_extension_fraction
    return top.width / bot.width >= p.wider_col_extension_fraction


def join_y_adjacent(words: list[Word], p: LayoutParams) -> list[Word]:
    """(:593-623) join vertically-adjacent blocks of the same text column."""
    words = sorted(words, key=lambda w: w.y0)
    i = 0
    while i < len(words) - 1:
        b = words[i]
        line_h = b.height
        n = i + 1
        while n < len(words) and words[n].y0 < b.y1 - line_h * p.min_line_join_height_dist:
            n += 1
        while n < len(words) and words[n].y0 < b.y1 + line_h * p.max_line_join_height_offset:
            cand = words[n]
            covers = ((cand.x0 >= b.x0 and cand.x1 <= b.x1)
                      or (b.x0 >= cand.x0 and b.x1 <= cand.x1))
            if covers and _column_extension(b, cand, p):
                b = _merge_words(b, cand, "<br/>")
                words[i] = b
                del words[n]
            else:
                n += 1
        i += 1
    return words


def consolidate_flow(words: list[Word], p: LayoutParams) -> list[Word]:
    """Phase 7 composite (:482-486)."""
    words = join_top_aligned(words)
    words = join_x_adjacent(words)
    return join_y_adjacent(words, p)


# ------------------------------------------------------------------- render


def _on_same_row(a, b, frac: float) -> bool:
    ov0 = max(a[1], b[1])
    ov1 = min(a[3], b[3])
    if ov0 >= ov1:
        return False
    ov = ov1 - ov0
    return max(ov / (a[3] - a[1]), ov / (b[3] - b[1])) >= frac


def _render_table(t: TableGrid, out: list[str]) -> None:
    out.append("\n<table>\n")
    for row in t.cells:
        out.append("<tr>\n")
        for cell in row:
            out.append("<td>")
            for w in cell.words:
                out.append(f"<p>{w.text}</p>\n")
            out.append("</td>")
        out.append("</tr>\n")
    out.append("</table>\n\n")


def recognize_page(words, drawings, params: LayoutParams | None = None,
                   pageno: int = 1) -> str:
    """Full per-page pipeline → XHTML fragment."""
    p = params or LayoutParams()
    word_objs = [w if isinstance(w, Word) else Word(*w) for w in words]
    h_segs, v_segs = classify_segments(drawings, p)
    h_lines, v_lines = consolidate_segments(h_segs, v_segs, p)
    tables = find_tables(h_lines, v_lines, p)
    for t in tables:
        word_objs = capture_cell_words(t, word_objs, p)
        seen: set[int] = set()  # rowspan-merged regions consolidate ONCE
        for row in t.cells:
            for cell in row:
                if id(cell) not in seen:
                    cell.words = consolidate_flow(cell.words, p)
                    seen.add(id(cell))
    flow = consolidate_flow(word_objs, p)

    # interleave paragraphs and tables in reading order (:459-467)
    elements: list[tuple[tuple, object]] = [
        ((w.x0, w.y0, w.x1, w.y1), w) for w in flow
    ] + [(t.bounds, t) for t in tables]

    def cmp(a, b):
        if _on_same_row(a[0], b[0], p.same_row_overlap_fraction):
            return a[0][0] - b[0][0]
        return a[0][1] - b[0][1]

    out: list[str] = []
    if p.page_div:
        out.append(f'<div class="page" pageno="{pageno}">\n')
    for _, el in sorted(elements, key=cmp_to_key(cmp)):
        if isinstance(el, TableGrid):
            _render_table(el, out)
        else:
            out.append(f"<p>{el.text}</p>\n")
    if p.page_div:
        out.append("</div>\n")
    return "".join(out)


def recognize_doc(pages, params: LayoutParams | None = None) -> str:
    """pages: iterable of (words, drawings) → whole-document XHTML image."""
    parts = []
    for i, (words, drawings) in enumerate(pages):
        parts.append(recognize_page(words, drawings, params, pageno=i + 1))
    return "".join(parts)
