"""Document-format text extraction beyond HTML/PDF (stdlib only).

The reference delegates Word/ODT/RTF/e-mail extraction to a Tika server
(kg_text_to_ttl/text_to_turtle_runner.py:36-115 get_tika_content — any
format Tika parses arrives as XHTML). This engine is network-free, so the
common office formats are parsed directly:

- ``.docx``  — OOXML: zip → word/document.xml, paragraph/run/tab/break
  elements (ECMA-376 part 1, public spec),
- ``.odt``   — OpenDocument: zip → content.xml, text:p / text:h /
  text:tab / text:line-break (OASIS ODF, public spec),
- ``.rtf``   — control-word state machine per the public RTF 1.9 spec:
  ``\\par``/``\\line``/``\\tab`` → whitespace, ``\\'hh`` + ``\\uN`` escapes,
  skippable destination groups (fonttbl, stylesheet, pict, …),
- ``.eml``   — RFC-822/MIME via the stdlib ``email`` package: subject line
  + all ``text/plain`` parts (``text/html`` parts are tag-stripped as a
  fallback),
- ``.xlsx``  — SpreadsheetML: zip → xl/workbook.xml + sheet rels +
  xl/sharedStrings.xml; every sheet renders as an XHTML ``<table>`` in the
  SAME ``<table><tr><td><p>…`` shape the PDF table recognizer emits
  (page_layout.py ``_render_table``) so ``match-dimensions`` row→cell
  walks written for PDF tables work unchanged on spreadsheets,
- ``.pptx``  — PresentationML: zip → ppt/presentation.xml + slide rels;
  slides render as ``<div class="slide" pageno="…">`` with ``<p>``
  paragraphs and ``a:tbl`` grids as the same ``<table>`` shape.

Every extractor is ``bytes -> str`` and raises :class:`DocFormatError` on
malformed input; :func:`extract_document` dispatches on filename extension
or content sniffing and is the single entry the Ray stage calls.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree

__all__ = ["DocFormatError", "docx_to_text", "odt_to_text", "rtf_to_text",
           "eml_to_text", "xlsx_to_text", "pptx_to_text", "extract_document"]


class DocFormatError(Exception):
    pass


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _zip_member(data: bytes, member: str) -> bytes:
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            return zf.read(member)
    except (zipfile.BadZipFile, KeyError) as ex:
        raise DocFormatError(f"Not a valid archive or missing {member}: {ex}") from ex


def _xml_root(xml: bytes) -> "ElementTree.Element":
    try:
        return ElementTree.fromstring(xml)
    except ElementTree.ParseError as ex:
        raise DocFormatError(f"Malformed XML: {ex}") from ex


def docx_to_text(data: bytes) -> str:
    """OOXML word/document.xml → paragraphs. ``w:t`` runs concatenate,
    ``w:tab`` → TAB, ``w:br``/``w:cr`` → newline; table cells join with
    TAB so downstream regex workflows see row-like lines."""
    root = _xml_root(_zip_member(data, "word/document.xml"))
    out: list[str] = []

    def walk_para(p) -> str:
        parts: list[str] = []
        for el in p.iter():
            t = _local(el.tag)
            if t == "t":
                parts.append("".join(el.itertext()))
            elif t == "tab":
                parts.append("\t")
            elif t in ("br", "cr"):
                parts.append("\n")
        return "".join(parts)

    def walk(node) -> None:
        for el in node:
            t = _local(el.tag)
            if t == "p":
                out.append(walk_para(el))
            elif t == "tbl":
                for row in (r for r in el.iter() if _local(r.tag) == "tr"):
                    cells = []
                    for tc in (c for c in row.iter() if _local(c.tag) == "tc"):
                        cells.append(" ".join(
                            walk_para(p2) for p2 in tc.iter()
                            if _local(p2.tag) == "p"))
                    out.append("\t".join(cells))
            else:
                walk(el)

    walk(root)
    return "\n".join(out).strip() + "\n"


def odt_to_text(data: bytes) -> str:
    """OpenDocument content.xml → paragraphs (text:p / text:h), with
    text:tab and text:line-break expanded."""
    root = _xml_root(_zip_member(data, "content.xml"))
    out: list[str] = []

    def para_text(p) -> str:
        parts: list[str] = []

        def rec(el) -> None:
            t = _local(el.tag)
            if t == "tab":
                parts.append("\t")
            elif t == "line-break":
                parts.append("\n")
            if el.text:
                parts.append(el.text)
            for ch in el:
                rec(ch)
                if ch.tail:
                    parts.append(ch.tail)

        if p.text:
            parts.append(p.text)
        for ch in p:
            rec(ch)
            if ch.tail:
                parts.append(ch.tail)
        return "".join(parts)

    for el in root.iter():
        if _local(el.tag) in ("p", "h"):
            out.append(para_text(el))
    return "\n".join(out).strip() + "\n"


_RTF_DESTINATIONS = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "footerl", "footerr",
    "themedata", "colorschememapping", "latentstyles", "datastore",
    "listtable", "listoverridetable", "rsidtbl", "generator", "xmlnstbl",
}
_RTF_CW = re.compile(rb"\\([a-zA-Z]{1,32})(-?\d{1,10})? ?|\\'([0-9a-fA-F]{2})|\\([^a-zA-Z])")


def rtf_to_text(data: bytes) -> str:
    """RTF → plain text: destination groups are skipped, ``\\uN`` unicode
    and ``\\'hh`` hex escapes decoded, paragraph/line/tab control words
    become whitespace, everything else is literal text."""
    if not data.lstrip().startswith(b"{\\rtf"):
        raise DocFormatError("Not an RTF document")
    out: list[str] = []
    skip_depth = 0        # >0 → inside a skippable destination group
    depth = 0
    uc_skip = [1]         # \ucN per group: bytes to skip after \uN
    i, n = 0, len(data)
    pending_skip = 0
    while i < n:
        c = data[i:i + 1]
        if pending_skip and c not in (b"{", b"}", b"\\"):
            pending_skip -= 1
            i += 1
            continue
        if c == b"{":
            depth += 1
            uc_skip.append(uc_skip[-1])
            if skip_depth:
                skip_depth += 1
            elif data.startswith(b"{\\*", i):
                skip_depth = 1
            i += 1
            continue
        if c == b"}":
            depth -= 1
            if len(uc_skip) > 1:
                uc_skip.pop()
            if skip_depth:
                skip_depth -= 1
            i += 1
            continue
        if c == b"\\":
            m = _RTF_CW.match(data, i)
            if m is None:
                i += 1
                continue
            i = m.end()
            if m.group(3) is not None:          # \'hh
                if pending_skip:
                    # the ANSI fallback after \uN counts as ONE skippable
                    # unit (RTF 1.9 §unicode): consume it, emit nothing
                    pending_skip -= 1
                    continue
                if not skip_depth:
                    out.append(bytes([int(m.group(3), 16)]).decode("cp1252",
                                                                   "replace"))
                continue
            # any other control word ends the post-\uN skippable region
            pending_skip = 0
            if m.group(4) is not None:          # escaped \{ \} \\ etc.
                ch = m.group(4)
                if not skip_depth:
                    out.append({b"~": "\u00a0", b"-": "", b"_": "-"}.get(
                        ch, ch.decode("latin-1")))
                continue
            word = m.group(1).decode("ascii")
            arg = m.group(2)
            if word in _RTF_DESTINATIONS:
                if skip_depth == 0:
                    skip_depth = 1
                continue
            if skip_depth:
                continue
            if word in ("par", "line", "sect", "page"):
                out.append("\n")
            elif word in ("tab", "cell"):
                out.append("\t")
            elif word == "row":
                out.append("\n")
            elif word == "uc" and arg is not None:
                uc_skip[-1] = int(arg)
            elif word == "u" and arg is not None:
                cp = int(arg)
                out.append(chr(cp + 0x10000 if cp < 0 else cp))
                pending_skip = uc_skip[-1]
            continue
        if not skip_depth and c not in (b"\r", b"\n"):
            out.append(c.decode("latin-1"))
        i += 1
    text = "".join(out)
    return re.sub(r"\n{3,}", "\n\n", text).strip() + "\n"


def _xml_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _ooxml_rels(data: bytes, rels_member: str, base: str) -> dict[str, str]:
    """OPC relationship file → {rId: zip member path} (ECMA-376 part 2).
    Targets are relative to ``base`` unless they start with '/'."""
    rels: dict[str, str] = {}
    for el in _xml_root(_zip_member(data, rels_member)).iter():
        if _local(el.tag) != "Relationship":
            continue
        rid, target = el.get("Id"), el.get("Target")
        if not rid or not target:
            continue
        rels[rid] = target.lstrip("/") if target.startswith("/") else base + target
    return rels


def _cell_col(ref: str) -> int:
    """'BC23' → 1-based column index 55; '' → 0 (caller falls back to
    sequential position — some writers omit the r= attribute)."""
    col = 0
    for ch in ref:
        if not ch.isalpha():
            break
        col = col * 26 + (ord(ch.upper()) - 64)
    return col


def _xlsx_shared_strings(data: bytes) -> list[str]:
    try:
        root = _xml_root(_zip_member(data, "xl/sharedStrings.xml"))
    except DocFormatError:
        return []  # workbook without shared strings (all inline/numeric)
    out: list[str] = []
    for si in root:
        if _local(si.tag) != "si":
            continue
        parts: list[str] = []
        for el in si.iter():
            # plain <t> and rich-run <r><t> both contribute; phonetic
            # guides (<rPh><t>) must not — tracked by ancestry
            if _local(el.tag) == "t" and el.text:
                parts.append(el.text)
        # subtract phonetic-run text (re-walk the rPh subtrees)
        for rph in (e for e in si.iter() if _local(e.tag) == "rPh"):
            for el in rph.iter():
                if _local(el.tag) == "t" and el.text and el.text in parts:
                    parts.remove(el.text)
        out.append("".join(parts))
    return out


def _xlsx_cell_value(c, shared: list[str]) -> str:
    t = c.get("t", "n")
    if t == "inlineStr":
        return "".join(el.text or "" for el in c.iter()
                       if _local(el.tag) == "t")
    v = next((el.text or "" for el in c if _local(el.tag) == "v"), "")
    if t == "s":
        try:
            return shared[int(v)]
        except (ValueError, IndexError):
            return ""
    if t == "b":
        return "TRUE" if v.strip() == "1" else "FALSE"
    return v  # n / str / e: the stored lexical form (dates stay serial
    #           numbers — style-table date rendering is out of scope)


def xlsx_to_text(data: bytes) -> str:
    """SpreadsheetML workbook → one XHTML ``<table>`` per sheet, wrapped in
    ``<div class="sheet" name="…">``. Cells keep their column alignment
    (missing cells pad as empty ``<td>``) and render as ``<td><p>value</p>``
    — the exact grid shape ``page_layout._render_table`` emits for PDF
    tables, so the same ``match-dimensions`` workflows walk both."""
    shared = _xlsx_shared_strings(data)
    wb = _xml_root(_zip_member(data, "xl/workbook.xml"))
    rels = _ooxml_rels(data, "xl/_rels/workbook.xml.rels", "xl/")
    out: list[str] = []
    for sheet in (el for el in wb.iter() if _local(el.tag) == "sheet"):
        rid = next((v for k, v in sheet.attrib.items()
                    if _local(k) == "id" and k != "id"), None)
        member = rels.get(rid or "", "")
        if not member:
            continue
        name = sheet.get("name", member)
        ws = _xml_root(_zip_member(data, member))
        out.append(f'<div class="sheet" name="{_xml_escape(name)}">\n')
        out.append("\n<table>\n")
        for row in (el for el in ws.iter() if _local(el.tag) == "row"):
            cells: list[str] = []
            pos = 0
            for c in (el for el in row if _local(el.tag) == "c"):
                col = _cell_col(c.get("r", "")) or pos + 1
                while pos < col - 1:       # pad skipped columns
                    cells.append("")
                    pos += 1
                cells.append(_xlsx_cell_value(c, shared))
                pos = col
            out.append("<tr>\n")
            for v in cells:
                out.append("<td>")
                if v:
                    out.append(f"<p>{_xml_escape(v)}</p>\n")
                out.append("</td>")
            out.append("</tr>\n")
        out.append("</table>\n\n")
        out.append("</div>\n")
    if not out:
        raise DocFormatError("Workbook has no readable sheets")
    return "".join(out)


def _pptx_paragraph(p) -> str:
    """DrawingML ``a:p`` → text: ``a:t`` runs concatenate, ``a:br`` → \\n."""
    parts: list[str] = []
    for el in p.iter():
        t = _local(el.tag)
        if t == "t" and el.text:
            parts.append(el.text)
        elif t == "br":
            parts.append("\n")
    return "".join(parts)


def _pptx_walk(node, out: list[str]) -> None:
    for el in node:
        t = _local(el.tag)
        if t == "p":
            txt = _pptx_paragraph(el)
            if txt.strip():
                out.append(f"<p>{_xml_escape(txt)}</p>\n")
        elif t == "tbl":
            out.append("\n<table>\n")
            for row in (r for r in el.iter() if _local(r.tag) == "tr"):
                out.append("<tr>\n")
                for tc in (c for c in row if _local(c.tag) == "tc"):
                    out.append("<td>")
                    for p2 in (x for x in tc.iter() if _local(x.tag) == "p"):
                        txt = _pptx_paragraph(p2)
                        if txt.strip():
                            out.append(f"<p>{_xml_escape(txt)}</p>\n")
                    out.append("</td>")
                out.append("</tr>\n")
            out.append("</table>\n\n")
        else:
            _pptx_walk(el, out)


def pptx_to_text(data: bytes) -> str:
    """PresentationML deck → XHTML: one ``<div class="slide" pageno="N">``
    per slide (deck order via sldIdLst + rels), ``<p>`` per ``a:p``
    paragraph, ``a:tbl`` grids in the shared ``<table>`` shape. Speaker
    notes are intentionally excluded (they are presenter metadata, not
    document content)."""
    pres = _xml_root(_zip_member(data, "ppt/presentation.xml"))
    rels = _ooxml_rels(data, "ppt/_rels/presentation.xml.rels", "ppt/")
    out: list[str] = []
    pageno = 0
    for sld in (el for el in pres.iter() if _local(el.tag) == "sldId"):
        rid = next((v for k, v in sld.attrib.items()
                    if _local(k) == "id" and k != "id"), None)
        member = rels.get(rid or "", "")
        if not member:
            continue
        pageno += 1
        out.append(f'<div class="slide" pageno="{pageno}">\n')
        _pptx_walk(_xml_root(_zip_member(data, member)), out)
        out.append("</div>\n")
    if pageno == 0:
        raise DocFormatError("Presentation has no readable slides")
    return "".join(out)


_RE_TAGS = re.compile(r"<[^>]+>")


def eml_to_text(data: bytes) -> str:
    """RFC-822 message → 'Subject: …' line + text/plain bodies (html parts
    tag-stripped only when no plain part exists)."""
    import email
    import email.policy

    try:
        msg = email.message_from_bytes(data, policy=email.policy.default)
    except Exception as ex:  # email is lenient; guard anyway
        raise DocFormatError(f"Cannot parse message: {ex}") from ex
    plain: list[str] = []
    html: list[str] = []
    for part in msg.walk():
        ctype = part.get_content_type()
        if ctype not in ("text/plain", "text/html"):
            continue
        try:
            body = part.get_content()
        except Exception:
            continue
        (plain if ctype == "text/plain" else html).append(body)
    pieces = plain or [_RE_TAGS.sub(" ", h) for h in html]
    subject = msg.get("Subject", "")
    head = f"Subject: {subject}\n\n" if subject else ""
    return (head + "\n".join(p.strip() for p in pieces)).strip() + "\n"


_EXTRACTORS = {
    "docx": docx_to_text,
    "odt": odt_to_text,
    "rtf": rtf_to_text,
    "eml": eml_to_text,
    "xlsx": xlsx_to_text,
    "pptx": pptx_to_text,
}


def extract_document(data: bytes, name: str = "") -> str:
    """Dispatch on the filename extension, falling back to content
    sniffing (zip magic + member names, ``{\\rtf``, message headers)."""
    ext = name.rsplit(".", 1)[-1].lower() if "." in name else ""
    fn = _EXTRACTORS.get(ext)
    if fn is None:
        if data[:2] == b"PK":
            try:
                with zipfile.ZipFile(io.BytesIO(data)) as zf:
                    names = set(zf.namelist())
            except zipfile.BadZipFile as ex:
                raise DocFormatError(f"Unreadable zip container: {ex}") from ex
            if "word/document.xml" in names:
                fn = docx_to_text
            elif "xl/workbook.xml" in names:
                fn = xlsx_to_text
            elif "ppt/presentation.xml" in names:
                fn = pptx_to_text
            else:
                fn = odt_to_text
        elif data.lstrip().startswith(b"{\\rtf"):
            fn = rtf_to_text
        elif re.match(rb"[!-9;-~]+:", data.lstrip()[:100] or b""):
            fn = eml_to_text
        else:
            raise DocFormatError(
                f"Unknown document format for {name!r} "
                f"(supported: {sorted(_EXTRACTORS)})")
    return fn(data)
