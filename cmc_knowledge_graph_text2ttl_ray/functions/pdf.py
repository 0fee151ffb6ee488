"""Pure-Python PDF word/drawing extractor feeding the table recognizer.

Closes the round-1 gap "real document-format ingestion": the reference
converts PDFs with PyMuPDF (kg_text_to_ttl/text_to_turtle_runner.py:131-141
``get_pdf_content`` → ``PdfTableRecognizer``); this module produces the same
page primitives — word boxes and drawn rectangles, top-left coordinates —
from raw PDF bytes with no native dependencies, and hands them to
:mod:`cmc_knowledge_graph_text2ttl_ray.functions.page_layout` (the geometry phases).

Supported PDF subset (deliberately the common text-PDF core):

- classic ``N 0 obj``/``endobj`` object syntax, scanned without the xref
  table (robust against mildly damaged files),
- content streams raw or ``/FlateDecode`` (zlib),
- text operators ``BT ET Tf Td TD Tm T* TL Tj ' " TJ Tc Tw``,
- graphics operators ``q Q cm re m l h f F S B b f* B* b* n W``; rectangles
  and straight line segments painted by any stroke/fill op become drawing
  rects (thin ones are the recognizer's grid-line candidates),
- width metrics: built-in Helvetica AFM table (the PDF standard-14 default);
  unknown fonts fall back to 500/1000 em. Word *alignment* (what the table
  phases consume) survives approximate widths.

Type0/CID composite fonts are decoded via their ``/ToUnicode`` CMap when
present (2-byte codes, ``bfchar``/``bfrange`` entries); widths fall back to
the base-font metrics of the mapped characters.

Object streams (``/Type /ObjStm``, PDF 1.5) are expanded after the scan:
their contained objects are parsed out of the decompressed payload via the
``N``/``First`` header, so catalogs/pages/fonts stored compressed resolve
normally.

Encrypted PDFs (standard security handler, empty user password — RC4
40..128-bit and AES-128 /AESV2) are decrypted transparently via
:mod:`cmc_knowledge_graph_text2ttl_ray.functions.pdf_crypt`; streams are decrypted at read
time with per-object keys, mirroring how the reference's PyMuPDF opens
password-less encrypted files.

Text placement maps each word through the FULL ``Tm × CTM`` matrix
(advance tracked in unscaled text-line units), so scaled, skewed and
rotated text land at their true device coordinates; a rotated word's box
is its axis-aligned bounding box (the layout phases consume boxes, not
oriented rectangles).

NOT supported (raise or are skipped gracefully): password-protected PDFs
(non-empty user password) and AES-256 (R 5/6), Type0 fonts WITHOUT a
ToUnicode CMap (their text is decoded byte-wise).
"""

from __future__ import annotations

import re
import zlib

__all__ = ["extract_pdf_pages", "pdf_to_xhtml", "PdfParseError"]


class PdfParseError(Exception):
    pass


# Helvetica character widths, 1000 units/em, ASCII 32..126 (Adobe AFM —
# public standard-14 metrics). Index 0 ↔ space (32).
_HELV = [
    278, 278, 355, 556, 556, 889, 667, 191, 333, 333, 389, 584, 278, 333,
    278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 278, 278,
    584, 584, 584, 556, 1015, 667, 667, 722, 722, 667, 611, 778, 722, 278,
    500, 667, 556, 833, 722, 778, 667, 778, 722, 667, 611, 722, 667, 944,
    667, 667, 611, 278, 278, 278, 469, 556, 333, 556, 556, 500, 556, 556,
    278, 556, 556, 222, 222, 500, 222, 833, 556, 556, 556, 556, 333, 500,
    278, 556, 500, 722, 500, 500, 500, 334, 260, 334, 584,
]


def _char_width(ch: str, base_font: str) -> float:
    """Width in 1000-em units."""
    o = ord(ch)
    if "Helvetica" in base_font or "Arial" in base_font:
        if 32 <= o <= 126:
            return _HELV[o - 32]
        return 556.0
    if "Courier" in base_font or "Mono" in base_font:
        return 600.0
    return 500.0


# ---------------------------------------------------------------- objects

_RE_OBJ = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


class _Objs(dict):
    """objnum → body bytes, plus the per-document decryption context:
    ``gens`` (objnum → generation, for per-object keys) and ``crypt``
    (a StandardSecurityHandler, or None for unencrypted files)."""

    def __init__(self):
        super().__init__()
        self.gens: dict[int, int] = {}
        self.crypt = None


def _scan_objects(data: bytes) -> "_Objs":
    """objnum → object body bytes (xref-free scan)."""
    objs = _Objs()
    for m in _RE_OBJ.finditer(data):
        start = m.end()
        # the body runs to the matching 'endobj'; streams may contain the
        # literal, so find 'endstream' first when a stream opens earlier
        sm = re.compile(rb"stream\r?\n").search(data, start)
        eo = data.find(b"endobj", start)
        if eo < 0:
            continue
        if sm is not None and sm.start() < eo:
            es = data.find(b"endstream", sm.end())
            if es >= 0:
                eo = data.find(b"endobj", es)
                if eo < 0:
                    continue
        num = int(m.group(1))
        objs[num] = data[start:eo]
        objs.gens[num] = int(m.group(2))
    if not objs:
        raise PdfParseError("No PDF objects found")
    return objs


# A minimal PDF value tokenizer/parser: names, numbers, strings, arrays,
# dicts, refs, booleans, null.

_RE_WS = re.compile(rb"[\s]*")
_RE_NUM = re.compile(rb"[+-]?(?:\d+\.\d*|\.\d+|\d+)")
_RE_NAME = re.compile(rb"/([^\s/<>\[\]()]*)")
_RE_REF = re.compile(rb"(\d+)\s+(\d+)\s+R\b")


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int) -> None:
        self.num = num

    def __repr__(self) -> str:  # pragma: no cover
        return f"Ref({self.num})"


def _parse_value(buf: bytes, pos: int):
    pos = _RE_WS.match(buf, pos).end()
    if pos >= len(buf):
        raise PdfParseError("Unexpected end of object")
    c = buf[pos : pos + 1]
    if buf.startswith(b"<<", pos):
        d = {}
        pos += 2
        while True:
            pos = _RE_WS.match(buf, pos).end()
            if buf.startswith(b">>", pos):
                return d, pos + 2
            m = _RE_NAME.match(buf, pos)
            if m is None:
                raise PdfParseError(f"Expected name in dict at {pos}")
            key = m.group(1).decode("latin-1")
            val, pos = _parse_value(buf, m.end())
            d[key] = val
    if c == b"[":
        arr = []
        pos += 1
        while True:
            pos = _RE_WS.match(buf, pos).end()
            if buf.startswith(b"]", pos):
                return arr, pos + 1
            val, pos = _parse_value(buf, pos)
            arr.append(val)
    if c == b"/":
        m = _RE_NAME.match(buf, pos)
        return "/" + m.group(1).decode("latin-1"), m.end()
    if c == b"(":
        s, pos = _parse_string(buf, pos)
        return s, pos
    if c == b"<":  # hex string
        end = buf.find(b">", pos)
        hexed = re.sub(rb"\s", b"", buf[pos + 1 : end])
        if len(hexed) % 2:
            hexed += b"0"
        return bytes.fromhex(hexed.decode("ascii")).decode("latin-1"), end + 1
    m = _RE_REF.match(buf, pos)
    if m is not None:
        return _Ref(int(m.group(1))), m.end()
    m = _RE_NUM.match(buf, pos)
    if m is not None:
        txt = m.group(0)
        return (float(txt) if b"." in txt else int(txt)), m.end()
    for lit, val in ((b"true", True), (b"false", False), (b"null", None)):
        if buf.startswith(lit, pos):
            return val, pos + len(lit)
    raise PdfParseError(f"Cannot parse PDF value at {pos}: {buf[pos:pos+20]!r}")


def _parse_string(buf: bytes, pos: int) -> tuple[str, int]:
    """Literal ( ) string with escapes and nested parens."""
    assert buf[pos : pos + 1] == b"("
    out = []
    depth = 1
    i = pos + 1
    while i < len(buf):
        c = buf[i : i + 1]
        if c == b"\\":
            nxt = buf[i + 1 : i + 2]
            esc = {b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
                   b"(": "(", b")": ")", b"\\": "\\"}
            if nxt in esc:
                out.append(esc[nxt])
                i += 2
                continue
            m = re.match(rb"\\([0-7]{1,3})", buf[i:])
            if m:
                out.append(chr(int(m.group(1), 8)))
                i += m.end()
                continue
            i += 1
            continue
        if c == b"(":
            depth += 1
            out.append("(")
        elif c == b")":
            depth -= 1
            if depth == 0:
                return "".join(out), i + 1
            out.append(")")
        else:
            out.append(c.decode("latin-1"))
        i += 1
    raise PdfParseError("Unterminated string")


def _expand_object_streams(objs: dict[int, bytes]) -> dict[int, bytes]:
    """PDF 1.5 object streams (``/Type /ObjStm``): non-stream objects may be
    stored INSIDE a compressed stream — invisible to the xref-free scan.
    The stream starts with ``N`` (objnum, offset) integer pairs; object
    bodies begin at ``/First`` + offset. Parsed objects are added under
    their object numbers; a same-numbered top-level object (e.g. an
    incremental-update replacement) wins, matching the scan's
    last-definition-wins behavior for classic objects."""
    for num in list(objs):
        body = objs[num]
        d = _obj_dict(body)
        if d.get("Type") != "/ObjStm":
            continue
        try:
            data = _stream_data(objs, body, num)
        except PdfParseError:
            continue
        n = _resolve(objs, d.get("N"))
        first = _resolve(objs, d.get("First"))
        if not isinstance(n, int) or not isinstance(first, int) \
                or not (0 < first <= len(data)):
            continue
        header = data[:first].split()
        if len(header) < 2 * n:
            continue
        try:
            pairs = [(int(header[2 * i]), int(header[2 * i + 1]))
                     for i in range(n)]
        except ValueError:
            continue
        for i, (onum, off) in enumerate(pairs):
            end = pairs[i + 1][1] if i + 1 < n else len(data) - first
            if not (0 <= off <= end <= len(data) - first):
                continue
            objs.setdefault(onum, data[first + off:first + end])
    return objs


def _obj_dict(body: bytes) -> dict:
    try:
        val, _ = _parse_value(body, 0)
    except PdfParseError:
        return {}
    return val if isinstance(val, dict) else {}


def _resolve(objs: dict[int, bytes], val, depth: int = 0):
    while isinstance(val, _Ref) and depth < 16:
        body = objs.get(val.num)
        if body is None:
            return None
        val, _ = _parse_value(body, 0)
        depth += 1
    return val


def _stream_data(objs: dict[int, bytes], body: bytes,
                 num: int | None = None) -> bytes:
    sm = re.compile(rb"stream\r?\n").search(body)
    if sm is None:
        return b""
    raw = body[sm.end() :]
    d = _obj_dict(body)
    # Prefer the dict's /Length (PDF 32000-1 §7.3.8.2: the exact stream byte
    # count) — compressed data may legitimately END in 0x0A/0x0D bytes, so
    # stripping all trailing EOLs corrupts ~1-2% of valid FlateDecode
    # streams. Without /Length, strip at most ONE EOL marker before
    # 'endstream' per the spec.
    length = _resolve(objs, d.get("Length"))
    if isinstance(length, int) and 0 <= length <= len(raw):
        raw = raw[:length]
    else:
        es = raw.rfind(b"endstream")
        if es >= 0:
            raw = raw[:es]
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith((b"\n", b"\r")):
            raw = raw[:-1]
    crypt = getattr(objs, "crypt", None)
    if crypt is not None and num is not None:
        from cmc_knowledge_graph_text2ttl_ray.functions.pdf_crypt import PdfCryptError

        try:
            raw = crypt.decrypt(num, getattr(objs, "gens", {}).get(num, 0), raw)
        except PdfCryptError as ex:
            raise PdfParseError(f"Stream decryption failed: {ex}") from ex
    filt = d.get("Filter")
    filters = filt if isinstance(filt, list) else ([filt] if filt else [])
    for f in filters:
        if f == "/FlateDecode":
            try:
                raw = zlib.decompress(raw)
            except zlib.error as ex:
                raise PdfParseError(f"Bad FlateDecode stream: {ex}") from ex
        elif f is None:
            pass
        else:
            raise PdfParseError(f"Unsupported stream filter {f}")
    return raw


# ------------------------------------------------------- content interpreter

_RE_TOKEN = re.compile(
    rb"""\s*(?:
      (?P<num>[+-]?(?:\d+\.\d*|\.\d+|\d+))
    | (?P<name>/[^\s/<>\[\]()]*)
    | (?P<str>\()
    | (?P<hex><(?![<]))
    | (?P<arr>\[)|(?P<earr>\])
    | (?P<dict><<)|(?P<edict>>>)
    | (?P<op>[A-Za-z'"][A-Za-z0-9*'"]*)
    )""",
    re.VERBOSE,
)


def _mat_mult(a, b):
    """3x2 affine (a,b,c,d,e,f) multiply: a then b."""
    a0, a1, a2, a3, a4, a5 = a
    b0, b1, b2, b3, b4, b5 = b
    return (
        a0 * b0 + a1 * b2,
        a0 * b1 + a1 * b3,
        a2 * b0 + a3 * b2,
        a2 * b1 + a3 * b3,
        a4 * b0 + a5 * b2 + b4,
        a4 * b1 + a5 * b3 + b5,
    )


class _Font:
    """Resolved page font: base name for width metrics + optional
    ToUnicode CMap (Type0/CID 2-byte decoding)."""

    __slots__ = ("base", "cmap")

    def __init__(self, base: str, cmap: dict[int, str] | None = None) -> None:
        self.base = base
        self.cmap = cmap


_DEFAULT_FONT = _Font("Helvetica")

_RE_CMAP_HEX = re.compile(rb"<([0-9A-Fa-f]+)>")
_RE_BFCHAR = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_RE_BFRANGE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)


def _utf16_hex(h: bytes) -> str:
    try:
        b = bytes.fromhex(h.decode("ascii"))
    except ValueError as ex:  # odd-length / malformed hex in a broken CMap
        raise PdfParseError(f"Malformed CMap hex token: {h!r}") from ex
    try:
        return b.decode("utf-16-be")
    except UnicodeDecodeError:
        return b.decode("latin-1")


def _parse_tounicode(data: bytes) -> dict[int, str]:
    """/ToUnicode CMap → {2-byte code: unicode string} (PDF 32000-1 §9.10.3:
    ``bfchar`` pairs and ``bfrange`` runs, destination = UTF-16BE hex or an
    array of per-code destinations)."""
    cmap: dict[int, str] = {}
    for block in _RE_BFCHAR.findall(data):
        toks = _RE_CMAP_HEX.findall(block)
        for src, dst in zip(toks[0::2], toks[1::2]):
            cmap[int(src, 16)] = _utf16_hex(dst)
    for block in _RE_BFRANGE.findall(data):
        pos = 0
        while True:
            m_lo = _RE_CMAP_HEX.search(block, pos)
            if m_lo is None:
                break
            m_hi = _RE_CMAP_HEX.search(block, m_lo.end())
            if m_hi is None:
                break
            lo, hi = int(m_lo.group(1), 16), int(m_hi.group(1), 16)
            rest = block[m_hi.end():].lstrip()
            if rest.startswith(b"["):
                close = rest.find(b"]")
                dsts = _RE_CMAP_HEX.findall(rest[:close])
                for i, d in enumerate(dsts):
                    if lo + i <= hi:
                        cmap[lo + i] = _utf16_hex(d)
                pos = m_hi.end() + (len(block[m_hi.end():]) - len(rest)) + close + 1
            else:
                m_dst = _RE_CMAP_HEX.search(block, m_hi.end())
                if m_dst is None:
                    break
                start = _utf16_hex(m_dst.group(1))
                base_cp = ord(start[-1]) if start else 0
                prefix = start[:-1]
                for i in range(hi - lo + 1):
                    cmap[lo + i] = prefix + chr(base_cp + i)
                pos = m_dst.end()
    return cmap


def _decode_cid(s: str, cmap: dict[int, str]) -> str:
    """latin-1-mapped raw string → unicode via 2-byte CMap codes."""
    out = []
    i, n = 0, len(s)
    while i + 1 < n:
        code = (ord(s[i]) << 8) | ord(s[i + 1])
        out.append(cmap.get(code, "�"))
        i += 2
    if i < n:  # odd trailing byte: try a 1-byte code
        out.append(cmap.get(ord(s[i]), s[i]))
    return "".join(out)


def _apply(m, x, y):
    return (m[0] * x + m[2] * y + m[4], m[1] * x + m[3] * y + m[5])


class _PageState:
    def __init__(self, fonts: dict[str, str], page_h: float) -> None:
        self.fonts = fonts
        self.page_h = page_h
        self.words: list[tuple] = []
        self.drawings: list[tuple] = []
        self.ctm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
        self.stack: list[tuple] = []
        self.tm = None
        self.tlm = None
        self.u = 0.0  # advance along the text line, unscaled text units
        self.font = _DEFAULT_FONT
        self.size = 12.0
        self.leading = 0.0
        self.char_sp = 0.0
        self.word_sp = 0.0
        self.path: list[tuple] = []
        self.cur_pt = None
        # pending word buffer: [x0, y_base, chars] — survives across show()
        # calls so TJ kerning splits don't fracture words
        self.pend: list | None = None

    # -- text ---------------------------------------------------------------

    def show(self, s: str) -> None:
        # Positions are tracked as an advance ``u`` in UNSCALED text-line
        # units and mapped through the FULL Tm × CTM at emit time, so
        # scaled, skewed and ROTATED text matrices place words at their
        # true device coordinates (the round-2 "rotation in the CTM"
        # limitation). Tm-changing operators flush the pending word and
        # reset ``u``, so Tm is constant over a pending word's life.
        if self.tm is None:
            return
        if self.font.cmap is not None:
            s = _decode_cid(s, self.font.cmap)
        u = self.u
        for ch in s:
            w = (_char_width(ch, self.font.base) / 1000.0) * self.size
            if ch.isspace():
                self.flush_word(u)
                u += w + self.char_sp + self.word_sp
            else:
                if self.pend is None:
                    self.pend = [u, []]
                self.pend[1].append(ch)
                u += w + self.char_sp
        self.u = u

    def adjust(self, amount: float) -> None:
        """TJ kerning number: thousandths of em, subtracted from the
        advance. A large jump (> 0.3 em either way) acts as a word
        boundary."""
        if self.tm is None:
            return
        du = -(amount / 1000.0) * self.size
        if abs(du) > 0.3 * self.size:
            self.flush_word(self.u)
        self.u += du

    def flush_word(self, u1: float | None = None) -> None:
        if self.pend is None:
            return
        u0, chars = self.pend
        self.pend = None
        if not chars:
            return
        self._emit_word("".join(chars), u0, self.u if u1 is None else u1)

    def _emit_word(self, text: str, u0: float, u1: float) -> None:
        if self.tm is None:
            return
        m = _mat_mult(self.tm, self.ctm)
        bx0, by0 = _apply(m, u0, 0.0)
        bx1, by1 = _apply(m, u1, 0.0)
        # ascent/descent run perpendicular to the baseline: map the text-
        # space vertical unit through the LINEAR part of the matrix
        ux, uy = m[2] * self.size, m[3] * self.size
        corners_x, corners_y = [], []
        for bx, by in ((bx0, by0), (bx1, by1)):
            corners_x += [bx + 0.8 * ux, bx - 0.2 * ux]
            corners_y += [by + 0.8 * uy, by - 0.2 * uy]
        top = self.page_h - max(corners_y)
        bot = self.page_h - min(corners_y)
        self.words.append(
            (min(corners_x), top, max(corners_x), bot, text))

    def newline(self) -> None:
        self.flush_word()
        if self.tlm is None:
            return
        self.tlm = _mat_mult((1, 0, 0, 1, 0, -self.leading), self.tlm)
        self.tm = self.tlm
        self.u = 0.0

    # -- graphics -----------------------------------------------------------

    def flush_path(self, paint: bool) -> None:
        if paint:
            for x0, y0, x1, y1 in self.path:
                ax0, ay0 = _apply(self.ctm, x0, y0)
                ax1, ay1 = _apply(self.ctm, x1, y1)
                fx0, fx1 = min(ax0, ax1), max(ax0, ax1)
                fy0, fy1 = min(ay0, ay1), max(ay0, ay1)
                self.drawings.append(
                    (fx0, self.page_h - fy1, fx1, self.page_h - fy0)
                )
        self.path = []
        self.cur_pt = None


def _run_content(content: bytes, state: _PageState) -> None:
    stack: list = []
    pos = 0
    n = len(content)
    while pos < n:
        m = _RE_TOKEN.match(content, pos)
        if m is None or m.end() == m.start():
            pos += 1
            continue
        pos = m.end()
        kind = m.lastgroup
        if kind == "num":
            stack.append(float(m.group("num")))
            continue
        if kind == "name":
            stack.append(m.group("name").decode("latin-1"))
            continue
        if kind == "str":
            s, pos = _parse_string(content, m.end() - 1)
            stack.append(s)
            continue
        if kind == "hex":
            end = content.find(b">", pos)
            hexed = re.sub(rb"\s", b"", content[m.end() - 1 + 1 : end])
            if len(hexed) % 2:
                hexed += b"0"
            stack.append(bytes.fromhex(hexed.decode("ascii")).decode("latin-1"))
            pos = end + 1
            continue
        if kind == "arr":
            # collect nested values until ']' (flat arrays in content streams)
            arr_vals: list = []
            stack.append(("__ARR__", arr_vals))
            continue
        if kind == "earr":
            # pop down to array marker
            vals = []
            while stack and not (isinstance(stack[-1], tuple) and stack[-1][0] == "__ARR__"):
                vals.append(stack.pop())
            if stack:
                marker = stack.pop()
                marker[1].extend(reversed(vals))
                stack.append(marker[1])
            continue
        if kind in ("dict", "edict"):
            continue  # inline dicts (e.g. BDC properties) are skipped
        op = m.group("op").decode("latin-1")
        try:
            _apply_op(op, stack, state)
        except (IndexError, TypeError, ValueError):
            pass  # tolerate operators outside the supported subset
        stack.clear()


def _apply_op(op: str, stack: list, st: _PageState) -> None:
    if op == "q":
        st.stack.append(st.ctm)
    elif op == "Q":
        if st.stack:
            st.ctm = st.stack.pop()
    elif op == "cm":
        a, b, c, d, e, f = stack[-6:]
        st.ctm = _mat_mult((a, b, c, d, e, f), st.ctm)
    elif op == "BT":
        st.flush_word()
        st.tm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
        st.tlm = st.tm
        st.u = 0.0
    elif op == "ET":
        st.flush_word()
        st.tm = st.tlm = None
        st.u = 0.0
    elif op == "Tf":
        name, size = stack[-2], float(stack[-1])
        st.font = st.fonts.get(str(name).lstrip("/"), _DEFAULT_FONT)
        st.size = size
    elif op == "TL":
        st.leading = float(stack[-1])
    elif op == "Tc":
        st.char_sp = float(stack[-1])
    elif op == "Tw":
        st.word_sp = float(stack[-1])
    elif op == "Td":
        st.flush_word()
        tx, ty = float(stack[-2]), float(stack[-1])
        st.tlm = _mat_mult((1, 0, 0, 1, tx, ty), st.tlm or (1, 0, 0, 1, 0, 0))
        st.tm = st.tlm
        st.u = 0.0
    elif op == "TD":
        st.flush_word()
        tx, ty = float(stack[-2]), float(stack[-1])
        st.leading = -ty
        st.tlm = _mat_mult((1, 0, 0, 1, tx, ty), st.tlm or (1, 0, 0, 1, 0, 0))
        st.tm = st.tlm
        st.u = 0.0
    elif op == "Tm":
        st.flush_word()
        a, b, c, d, e, f = (float(v) for v in stack[-6:])
        st.tm = st.tlm = (a, b, c, d, e, f)
        st.u = 0.0
    elif op == "T*":
        st.newline()
    elif op == "Tj":
        st.show(str(stack[-1]))
    elif op == "'":
        st.newline()
        st.show(str(stack[-1]))
    elif op == '"':
        st.word_sp, st.char_sp = float(stack[-3]), float(stack[-2])
        st.newline()
        st.show(str(stack[-1]))
    elif op == "TJ":
        arr = stack[-1]
        if isinstance(arr, list):
            for item in arr:
                if isinstance(item, str):
                    st.show(item)
                else:
                    st.adjust(float(item))
    elif op == "re":
        x, y, w, h = (float(v) for v in stack[-4:])
        st.path.append((x, y, x + w, y + h))
    elif op == "m":
        st.cur_pt = (float(stack[-2]), float(stack[-1]))
    elif op == "l":
        x, y = float(stack[-2]), float(stack[-1])
        if st.cur_pt is not None:
            st.path.append((st.cur_pt[0], st.cur_pt[1], x, y))
        st.cur_pt = (x, y)
    elif op in ("f", "F", "S", "s", "B", "b", "f*", "B*", "b*"):
        st.flush_path(paint=True)
    elif op == "n":
        st.flush_path(paint=False)
    # all other operators are ignored


# -------------------------------------------------------------- public API


def _page_fonts(objs: dict[int, bytes], page: dict) -> dict[str, "_Font"]:
    res = _resolve(objs, page.get("Resources")) or {}
    fonts = _resolve(objs, res.get("Font")) or {}
    out = {}
    for name, ref in fonts.items():
        fd = _resolve(objs, ref) or {}
        base = str(fd.get("BaseFont", "/Helvetica")).lstrip("/")
        cmap = None
        tu = fd.get("ToUnicode")
        if fd.get("Subtype") == "/Type0" and isinstance(tu, _Ref):
            body = objs.get(tu.num)
            if body is not None:
                try:
                    cmap = _parse_tounicode(
                        _stream_data(objs, body, tu.num)) or None
                except PdfParseError:
                    cmap = None
        out[name] = _Font(base, cmap)
    return out


def _page_order(objs: dict[int, bytes]) -> list[dict]:
    """Pages in document order via the /Pages tree; objnum order fallback."""
    pages_by_num = {}
    for num, body in objs.items():
        d = _obj_dict(body)
        if d.get("Type") == "/Page":
            pages_by_num[num] = d
    root_nodes = [
        (num, d) for num, body in objs.items()
        if (d := _obj_dict(body)).get("Type") == "/Pages" and "Parent" not in d
    ]

    ordered: list[dict] = []

    def walk(node: dict) -> None:
        for kid in node.get("Kids", []) or []:
            kd = _resolve(objs, kid)
            if not isinstance(kd, dict):
                continue
            if kd.get("Type") == "/Pages":
                walk(kd)
            elif kd.get("Type") == "/Page":
                ordered.append(kd)

    for _, root in sorted(root_nodes):
        walk(root)
    if not ordered:
        ordered = [pages_by_num[k] for k in sorted(pages_by_num)]
    return ordered


def _setup_decryption(data: bytes, objs: "_Objs") -> None:
    """Attach a StandardSecurityHandler to ``objs`` when the file carries
    an /Encrypt dictionary (classic trailer or XRef-stream dict; latest
    definition wins, matching incremental-update semantics). Unencrypted
    files are the fast path: one substring check, no parsing."""
    if b"/Encrypt" not in data:
        return
    cands: list[dict] = []
    for m in re.finditer(rb"trailer", data):
        try:
            val, _ = _parse_value(data, m.end())
        except Exception:  # noqa: BLE001 - 'trailer' may match inside streams
            continue
        if isinstance(val, dict):
            cands.append(val)
    for _num, body in sorted(objs.items()):
        d = _obj_dict(body)
        if d.get("Type") == "/XRef":
            cands.append(d)
    seen_encrypt = False
    for d in reversed(cands):
        if "Encrypt" not in d:
            continue
        seen_encrypt = True
        enc = _resolve(objs, d["Encrypt"])
        if not isinstance(enc, dict):
            continue
        ids = _resolve(objs, d.get("ID"))
        id0 = b""
        if isinstance(ids, list) and ids:
            first = ids[0]
            if isinstance(first, str):
                id0 = first.encode("latin-1", "replace")
            elif isinstance(first, bytes):
                id0 = first
        from cmc_knowledge_graph_text2ttl_ray.functions.pdf_crypt import (
            PdfCryptError,
            StandardSecurityHandler,
        )

        try:
            objs.crypt = StandardSecurityHandler(enc, id0)
        except PdfCryptError as ex:
            raise PdfParseError(str(ex)) from ex
        return
    if seen_encrypt:
        # an /Encrypt entry we cannot resolve means streams WOULD be
        # ciphertext — parsing on would emit garbage, so fail loudly
        raise PdfParseError("Encrypted PDF with unresolvable /Encrypt dict")


def extract_pdf_pages(data: bytes) -> list[tuple[list[tuple], list[tuple]]]:
    """PDF bytes → per-page ``(words, drawings)`` in top-left coordinates,
    ready for :func:`page_layout.recognize_doc`."""
    if not data.startswith(b"%PDF"):
        raise PdfParseError("Not a PDF (missing %PDF header)")
    objs = _scan_objects(data)
    _setup_decryption(data, objs)
    # object streams are themselves encrypted, so expansion must run with
    # the crypt context already in place
    objs = _expand_object_streams(objs)
    pages = []
    for page in _page_order(objs):
        box = _resolve(objs, page.get("MediaBox")) or [0, 0, 612, 792]
        page_h = float(box[3]) - float(box[1])
        fonts = _page_fonts(objs, page)
        contents = page.get("Contents")
        refs = contents if isinstance(contents, list) else [contents]
        blob = b"\n".join(
            _stream_data(objs, objs[r.num], r.num)
            for r in refs
            if isinstance(r, _Ref) and r.num in objs
        )
        state = _PageState(fonts, page_h)
        _run_content(blob, state)
        state.flush_word()
        pages.append((state.words, state.drawings))
    return pages


def pdf_to_xhtml(data: bytes, params=None) -> str:
    """PDF bytes → recognized XHTML (paragraphs + tables), the direct
    equivalent of the reference's ``get_pdf_content``
    (text_to_turtle_runner.py:131-141)."""
    from cmc_knowledge_graph_text2ttl_ray.functions.page_layout import recognize_doc

    return recognize_doc(extract_pdf_pages(data), params)
