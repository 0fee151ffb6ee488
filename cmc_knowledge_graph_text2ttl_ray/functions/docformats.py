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
  fallback).

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
           "eml_to_text", "extract_document"]


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
            fn = docx_to_text if "word/document.xml" in names else odt_to_text
        elif data.lstrip().startswith(b"{\\rtf"):
            fn = rtf_to_text
        elif re.match(rb"[!-9;-~]+:", data.lstrip()[:100] or b""):
            fn = eml_to_text
        else:
            raise DocFormatError(
                f"Unknown document format for {name!r} "
                f"(supported: {sorted(_EXTRACTORS)})")
    return fn(data)
