"""Office/e-mail format extraction (docx/odt/rtf/eml) + pipeline wiring."""

import io
import zipfile

import pytest


def make_docx(paragraphs, table=None) -> bytes:
    ns = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
    body = []
    for p in paragraphs:
        body.append(f"<w:p><w:r><w:t>{p}</w:t></w:r></w:p>")
    if table:
        rows = []
        for row in table:
            cells = "".join(
                f"<w:tc><w:p><w:r><w:t>{c}</w:t></w:r></w:p></w:tc>"
                for c in row)
            rows.append(f"<w:tr>{cells}</w:tr>")
        body.append(f"<w:tbl>{''.join(rows)}</w:tbl>")
    xml = (f'<?xml version="1.0"?><w:document {ns}><w:body>'
           f"{''.join(body)}</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("word/document.xml", xml)
    return buf.getvalue()


def make_odt(paragraphs) -> bytes:
    ns = ('xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
          'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"')
    ps = "".join(f"<text:p>{p}</text:p>" for p in paragraphs)
    xml = (f'<?xml version="1.0"?><office:document-content {ns}>'
           f"<office:body><office:text>{ps}</office:text></office:body>"
           f"</office:document-content>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.text")
        zf.writestr("content.xml", xml)
    return buf.getvalue()


RTF = (rb"{\rtf1\ansi{\fonttbl{\f0 Helvetica;}}"
       rb"{\*\generator Acme Writer;}"
       rb"\f0\fs24 Acme Corp was founded in \b 2008\b0 .\par "
       rb"Unicode: \u8364? and hex: \'e9.\par}")

EML = (b"From: alice@example.com\r\n"
       b"To: bob@example.com\r\n"
       b"Subject: Quarterly numbers\r\n"
       b"Content-Type: text/plain; charset=utf-8\r\n\r\n"
       b"Revenue was 42 in Q3.\r\n")


def test_docx_paragraphs_and_table():
    from cmc_knowledge_graph_text2ttl_ray.functions.docformats import docx_to_text

    text = docx_to_text(make_docx(
        ["Acme Corp was founded in 2008.", "It is based in Berlin."],
        table=[["Name", "Value"], ["Revenue", "42"]]))
    assert "founded in 2008" in text
    assert "based in Berlin" in text
    assert "Name\tValue" in text and "Revenue\t42" in text


def test_odt_paragraphs():
    from cmc_knowledge_graph_text2ttl_ray.functions.docformats import odt_to_text

    text = odt_to_text(make_odt(["Hooli LLC was founded in 1999.", "Next line."]))
    assert "founded in 1999" in text and "Next line." in text


def test_rtf_control_words_and_escapes():
    from cmc_knowledge_graph_text2ttl_ray.functions.docformats import rtf_to_text

    text = rtf_to_text(RTF)
    assert "Acme Corp was founded in 2008." in text
    assert "€" in text and "é" in text
    assert "Helvetica" not in text and "generator" not in text


def test_eml_subject_and_body():
    from cmc_knowledge_graph_text2ttl_ray.functions.docformats import eml_to_text

    text = eml_to_text(EML)
    assert text.startswith("Subject: Quarterly numbers")
    assert "Revenue was 42 in Q3." in text


def test_extract_document_dispatch_and_errors():
    from cmc_knowledge_graph_text2ttl_ray.functions.docformats import (
        DocFormatError,
        extract_document,
    )

    assert "founded" in extract_document(make_docx(["founded in 2008"]), "a.docx")
    # content sniffing without extension
    assert "founded" in extract_document(make_docx(["founded in 2008"]), "blob")
    assert "Subject:" in extract_document(EML, "mail.eml")
    with pytest.raises(DocFormatError):
        extract_document(b"\x00\x01 garbage", "mystery.bin")
    with pytest.raises(DocFormatError):
        extract_document(b"PK\x03\x04 not a zip really", "x.docx")


def test_docs_corpus_pipeline(ray_session, tmp_path):
    """End-to-end: a mixed docs dir through the extract stage feeds the KG
    pipeline (docx text must produce triples via the standard workflows)."""
    import pyarrow as pa
    import ray.data

    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg import run_kg_pipeline
    from cmc_knowledge_graph_text2ttl_ray.stages.extract import add_extracted_text

    d = tmp_path / "docs"
    d.mkdir()
    (d / "a.docx").write_bytes(make_docx(
        ["Acme Corp was founded in 2008."]))
    (d / "b.rtf").write_bytes(RTF)
    (d / "c.eml").write_bytes(EML)
    ds = ray.data.read_binary_files(str(d), include_paths=True).map_batches(
        lambda t: pa.table({"url": t["path"], "doc": t["bytes"]}),
        batch_format="pyarrow",
    )
    extracted = add_extracted_text(ds, source="doc").to_pandas()
    assert len(extracted) == 3
    assert extracted["extract_error"].isna().all()
    res = run_kg_pipeline(add_extracted_text(ds, source="doc"), concurrency=2)
    assert res["triples"].count() >= 0  # pipeline runs end-to-end


def test_docs_corpus_cli_run(tmp_path):
    """End-to-end: a directory of office docs through `run --pages docs:DIR`."""
    import json
    import subprocess
    import sys

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    for i in range(3):
        (docs_dir / f"report{i}.docx").write_bytes(make_docx(
            [f"Acme Corp was founded in 198{i}."]))
    out_dir = tmp_path / "out"
    proc = subprocess.run(
        [sys.executable, "-m", "cmc_knowledge_graph_text2ttl_ray", "run",
         "--pages", f"docs:{docs_dir}", "--out", str(out_dir),
         "--num-cpus", "4", "--num-buckets", "4"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["n_triples"] > 0
    ttls = list((out_dir / "ttl").glob("part-*.ttl"))
    assert ttls and any("Acme_Corp" in p.read_text() for p in ttls)


def test_rtf_unicode_ansi_fallback_consumed():
    """Round-3 review: the \\'hh ANSI fallback after \\uN is consumed as the
    skippable unit — no duplicate char, no swallowed following char."""
    from cmc_knowledge_graph_text2ttl_ray.functions.docformats import rtf_to_text

    assert "Euro: €ABC" in rtf_to_text(b"{\\rtf1 Euro: \\u8364\\'80ABC\\par}")
    assert "X: €Y" in rtf_to_text(b"{\\rtf1 X: \\u8364?Y\\par}")
    # \uc2: two fallback units skipped
    assert "Z: €W" in rtf_to_text(b"{\\rtf1\\uc2 Z: \\u8364??W\\par}")


def test_docformats_never_crash_on_fuzz():
    """Contract: arbitrary bytes either extract or raise DocFormatError —
    never an unhandled exception (mirrors the PDF fuzz contract)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cmc_knowledge_graph_text2ttl_ray.functions.docformats import (
        DocFormatError,
        extract_document,
        rtf_to_text,
    )

    @given(st.binary(max_size=400))
    @settings(max_examples=300, deadline=None)
    def run(payload):
        for name in ("x.docx", "x.odt", "x.eml", "sniff"):
            try:
                out = extract_document(payload, name)
                assert isinstance(out, str)
            except DocFormatError:
                pass
        try:
            out = rtf_to_text(b"{\\rtf1" + payload + b"}")
            assert isinstance(out, str)
        except DocFormatError:
            pass

    run()


def test_rtf_fuzz_control_words():
    """RTF-shaped fuzz: random control words / groups / escapes parse to a
    string without crashing."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cmc_knowledge_graph_text2ttl_ray.functions.docformats import rtf_to_text

    token = st.one_of(
        st.sampled_from([b"\\par ", b"\\tab ", b"\\u8364?", b"\\u-100?",
                         b"\\'e9", b"{", b"}", b"\\uc2 ", b"\\b ", b"\\b0 ",
                         b"{\\*\\weird junk}", b"\\\\", b"\\{", b"\\}"]),
        st.text(alphabet="abc XYZ09.,", max_size=12).map(lambda t: t.encode()),
    )

    @given(st.lists(token, max_size=40))
    @settings(max_examples=200, deadline=None)
    def run(parts):
        out = rtf_to_text(b"{\\rtf1" + b"".join(parts) + b"}")
        assert isinstance(out, str)

    run()
