"""S4 document-format ingestion: round-trip + dispatch robustness."""

import os

import pytest

from owl_n4j_spark.sources.doc_formats import (
    read_documents_dir,
    write_doc_files,
)

SF = "/root/testdata/sf0.001"


def test_roundtrip_reconstructs_documents_table(spark, tmp_path):
    out = str(tmp_path / "docs")
    write_doc_files(spark, SF, out)
    got = (read_documents_dir(spark, out)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    want = (spark.read.parquet(f"{SF}/documents.parquet")
            .toPandas().sort_values("doc_id").reset_index(drop=True))
    import pandas as pd
    got["n_chars"] = got["n_chars"].astype("int64")
    pd.testing.assert_frame_equal(
        got[["doc_id", "text", "lang", "source"]],
        want[["doc_id", "text", "lang", "source"]])
    # n_chars recomputed from extracted text must match the table's
    assert (got["n_chars"] == want["n_chars"]).all()


def test_unsupported_formats_quarantined_not_crashed(spark, tmp_path):
    d = tmp_path / "mix"
    d.mkdir()
    (d / "doc_00000001.md").write_text(
        "---\nlang: en\nsource: s\n---\n# Document 1\n\nbody text\n")
    (d / "sidecar.xyz").write_text("not a supported format")
    # image-only scan: valid pdf magic, zero text operators
    (d / "doc_00000002.pdf").write_bytes(b"%PDF-1.4\n% image-only scan\n")
    (d / "notes.txt").write_text("plain text body\n")
    # plain path: unsupported files are skipped, never a crash
    rows = read_documents_dir(spark, str(d)).collect()
    assert {r["text"] for r in rows} == {"body text", "plain text body"}
    # status path: every file is accounted for — the dispatch gap is DATA
    st = {(r.fmt, r.status)
          for r in read_documents_dir(spark, str(d),
                                      with_status=True).collect()}
    assert st == {("md", "ok"), ("txt", "ok"), ("xyz", "unknown_format"),
                  ("pdf", "no_text_layer")}
    # a textless pdf declares itself rather than yielding an empty doc
    from owl_n4j_spark.sources.doc_formats import NoTextLayer, _DISPATCH
    with pytest.raises(NoTextLayer):
        _DISPATCH[".pdf"]("x.pdf", b"%PDF-1.4\n")


def test_md_body_with_hash_lines_survives(spark, tmp_path):
    d = tmp_path / "md"
    d.mkdir()
    body = "first line\n# not a heading removal target\nlast line"
    (d / "doc_00000007.md").write_text(
        f"---\nlang: fr\nsource: x\n---\n# Document 7\n\n{body}\n")
    rows = read_documents_dir(spark, str(d)).collect()
    assert rows[0]["text"] == body


def test_corrupt_files_quarantined_as_extract_error(spark, tmp_path):
    """One corrupt evidence file must never abort the ingest: a truncated
    OOXML container and a non-UTF8 text file each quarantine with an
    extract_error manifest row while the rest of the batch extracts."""
    d = tmp_path / "bad"
    d.mkdir()
    (d / "doc_00000001.docx").write_bytes(b"PK\x03\x04 truncated zip")
    (d / "doc_00000002.txt").write_bytes(b"\xff\xfe\x00 not utf-8")
    (d / "doc_00000003.md").write_text(
        "---\nlang: en\nsource: s\n---\n# D\n\nok body\n")
    rows = read_documents_dir(spark, str(d)).collect()
    assert {r["text"] for r in rows} == {"ok body"}
    st = {(r.fmt, r.status)
          for r in read_documents_dir(spark, str(d),
                                      with_status=True).collect()}
    assert st == {("docx", "extract_error"), ("txt", "extract_error"),
                  ("md", "ok")}


def test_case_file_kind_real_world_ooxml_order(spark, tmp_path):
    """Word and Excel write [Content_Types].xml as the FIRST container
    entry; the case-scan content magic must classify those zips too, not
    only fixture-ordered ones — and stay extension-agnostic."""
    import zipfile

    from owl_n4j_spark.plans.kg_analytics import case_file_kind

    d = tmp_path / "evidence"
    d.mkdir()
    with zipfile.ZipFile(d / "report.bin", "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("_rels/.rels", "<Relationships/>")
        z.writestr("word/document.xml", "<w:document/>")
    with zipfile.ZipFile(d / "sheet.bin", "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("xl/workbook.xml", "<workbook/>")
    got = {os.path.basename(r.path): r.kind
           for r in (spark.read.format("binaryFile").load(str(d))
                     .select("path", case_file_kind().alias("kind"))
                     .collect())}
    assert got == {"report.bin": "docx_doc", "sheet.bin": "xlsx_doc"}


def test_pdf_cr_tailed_stream_not_truncated():
    """Regression: a FlateDecode payload whose LAST byte is \\r (~1/256 of
    streams — three real fixture PDFs at sf0.1) was truncated by the
    endstream-scanning regex (\\r? ate the payload byte), failing inflate
    and quarantining a perfectly good document. The reader must honor the
    dict's /Length instead. The tab padding steers the zlib adler32
    checksum so the compressed stream provably ends in \\r."""
    import zlib
    from collections import namedtuple

    from owl_n4j_spark.sources.doc_formats import _extract_pdf, _render_pdf

    base = "cr-tail probe body"

    def content(text):
        return (f"BT /F1 14 Tf 72 740 Td (Document 7) Tj ET\n"
                f"BT /F1 10 Tf 72 700 Td ({text}) Tj ET\n").encode()

    # adler32 low byte == (1 + byte_sum) & 0xff for small streams; tabs
    # (9, coprime to 256) can steer it to any value — target 0x0D
    pad = ((0x0D - 1 - sum(content(base))) * 57) % 256
    text = base + "\t" * pad
    assert zlib.compress(content(text)).endswith(b"\r")

    Row = namedtuple("Row", "doc_id text source lang")
    raw = _render_pdf(Row(7, text, "src", "en"))
    got_text, got_lang, got_source = _extract_pdf("doc_00000007.pdf", raw)
    assert got_text == text and got_lang == "en" and got_source == "src"


def test_pdf_octal_escapes_and_line_continuation():
    """Real digital-born PDFs emit non-ASCII bytes of non-Unicode strings
    as \\ddd octal escapes (PDF 32000-1 §7.3.4.2) and may split long
    literals with a backslash-EOL continuation. The decoder must render
    \\101 as 'A' (1-3 digit forms, stopping at the 4th char), fold
    \\<eol> away, and still pass plain escapes through."""
    from owl_n4j_spark.sources.doc_formats import _pdf_unescape

    assert _pdf_unescape(rb"\101\102\103") == "ABC"
    assert _pdf_unescape(rb"\0501\051") == "(1)"        # 3-digit then literal
    assert _pdf_unescape(rb"\53") == "+"                # 2-digit form
    assert _pdf_unescape(rb"\0004") == "\x004"          # stops after 3 digits
    assert _pdf_unescape(b"split\\\nline") == "splitline"
    assert _pdf_unescape(b"split\\\r\nline") == "splitline"
    assert _pdf_unescape(rb"\(paren\) \\ \n") == "(paren) \\ \n"
    # octal escapes composing a UTF-8 sequence decode to the character
    assert _pdf_unescape(rb"caf\303\251") == "café"


def test_pdf_backslash_lf_continuation_through_tokenizer():
    """Regression (r4 ADVICE): _PDF_TOK's escaped-pair atom \\\\. could not
    match a backslash-LF continuation without DOTALL, so a literal like
    (split\\<LF>line) Tj produced ZERO tokenizer matches and the whole
    string silently vanished from the extracted text. The prior test hit
    _pdf_unescape directly and never exercised the tokenizer. This one
    goes end-to-end through _extract_pdf for both \\<LF> and \\<CR><LF>."""
    from owl_n4j_spark.sources.doc_formats import _extract_pdf

    def pdf_with(content: bytes) -> bytes:
        return (b"%PDF-1.4\n<< /Length " + str(len(content)).encode()
                + b" >>\nstream\n" + content + b"\nendstream\n")

    lf = b"BT /F1 10 Tf 72 700 Td (split\\\nline \\303\\251) Tj ET\n"
    text, lang, source = _extract_pdf("doc_1.pdf", pdf_with(lf))
    assert text == "splitline é" and lang is None and source is None

    crlf = b"BT /F1 10 Tf 72 700 Td (split\\\r\nline) Tj ET\n"
    assert _extract_pdf("doc_2.pdf", pdf_with(crlf))[0] == "splitline"

    # a heading-sized literal with a continuation is still dropped whole
    both = (b"BT /F1 14 Tf 72 740 Td (head\\\ning) Tj ET\n"
            b"BT /F1 10 Tf 72 700 Td (body) Tj ET\n")
    assert _extract_pdf("doc_3.pdf", pdf_with(both))[0] == "body"
