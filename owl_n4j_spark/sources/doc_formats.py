"""Document-format ingestion (SURVEY S4 proper).

The reference routes pdf/docx/html/md/... through per-format handlers that
converge on one document shape (/root/reference/ingestion/scripts/
ingest_data.py:23-30 dispatch). Spark-first analog:

- ``binaryFile`` source: one task per file batch, no shuffle — ingestion is
  a pure map from (path, content) to the documents contract
  (doc_id, text, lang, source, n_chars).
- Per-format extractors run inside ONE Arrow ``mapInPandas`` stage that
  dispatches on extension per row — adding a format is adding a function to
  the dispatch table, not a new pipeline.
- html/md extract with deterministic stdlib parsing (main-content rule:
  <p> blocks only — nav/header/footer boilerplate is dropped, the
  simplified trafilatura contract); pdf/docx are STUBS with the same
  signature (the decode libraries are not in this container) that raise
  NotImplementedError per file, wired through the identical dispatch so
  the Spark-side plumbing is real and tested.

The generator renders the driver ``documents`` table to .html/.md files,
so extraction has an exact oracle: parse(generate(docs)) must equal the
documents table itself.
"""

from __future__ import annotations

import os
import re
from html import escape
from html.parser import HTMLParser

from pyspark.sql import DataFrame, SparkSession

DOC_SCHEMA = ("doc_id bigint, text string, lang string, source string, "
              "n_chars bigint")


def write_doc_files(spark: SparkSession, sf_dir: str, out_dir: str) -> str:
    """documents table -> one .html (even doc_id) or .md (odd doc_id) file
    per document, with boilerplate the extractor must strip."""
    pdf = (spark.read.parquet(f"{sf_dir}/documents.parquet")
           .toPandas().sort_values("doc_id"))
    os.makedirs(out_dir, exist_ok=True)
    for row in pdf.itertuples(index=False):
        if row.doc_id % 2 == 0:
            body = (
                '<!DOCTYPE html>\n'
                f'<html lang="{row.lang}">\n<head>\n'
                f'<title>doc {row.doc_id}</title>\n'
                f'<meta name="source" content="{escape(row.source)}"/>\n'
                '</head>\n<body>\n'
                '<nav><a href="/">home</a> | <a href="/about">about</a></nav>\n'
                f'<h1>Document {row.doc_id}</h1>\n'
                f'<p>{escape(row.text)}</p>\n'
                '<footer>generated page footer</footer>\n'
                '</body>\n</html>\n')
            name = f"doc_{row.doc_id:08d}.html"
        else:
            body = (
                '---\n'
                f'lang: {row.lang}\n'
                f'source: {row.source}\n'
                '---\n'
                f'# Document {row.doc_id}\n'
                '\n'
                f'{row.text}\n')
            name = f"doc_{row.doc_id:08d}.md"
        with open(os.path.join(out_dir, name), "w", encoding="utf-8") as f:
            f.write(body)
    return out_dir


class _MainText(HTMLParser):
    """Collect text inside <p> blocks; record html@lang and
    meta[name=source]@content. Everything else (nav/h1/footer/script) is
    boilerplate and dropped."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.paras: list[str] = []
        self.lang = None
        self.source = None
        self._in_p = 0
        self._buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "html":
            self.lang = a.get("lang")
        elif tag == "meta" and a.get("name") == "source":
            self.source = a.get("content")
        elif tag == "p":
            self._in_p += 1

    def handle_endtag(self, tag):
        if tag == "p" and self._in_p:
            self._in_p -= 1
            if not self._in_p:
                self.paras.append("".join(self._buf))
                self._buf = []

    def handle_data(self, data):
        if self._in_p:
            self._buf.append(data)


def _extract_html(name: str, raw: str) -> tuple:
    p = _MainText()
    p.feed(raw)
    return ("\n".join(p.paras), p.lang, p.source)


_MD_FRONT = re.compile(r"\A---\n(.*?)\n---\n", re.S)


def _extract_md(name: str, raw: str) -> tuple:
    lang = source = None
    m = _MD_FRONT.match(raw)
    body = raw
    if m:
        for line in m.group(1).splitlines():
            k, _, v = line.partition(":")
            if k.strip() == "lang":
                lang = v.strip()
            elif k.strip() == "source":
                source = v.strip()
        body = raw[m.end():]
    # body = everything after the first '# ' heading's following blank
    # line, verbatim (content may itself contain '#' lines)
    lines = body.split("\n")
    start = 0
    for i, ln in enumerate(lines):
        if ln.startswith("# "):
            start = i + 1
            while start < len(lines) and lines[start] == "":
                start += 1
            break
    text = "\n".join(lines[start:])
    return (text.rstrip("\n"), lang, source)


def _extract_stub(kind: str):
    def fn(name: str, raw) -> tuple:
        raise NotImplementedError(
            f"{kind} extraction requires a decode library not present in "
            f"this environment (file {name!r}); the dispatch plumbing is "
            "the tested surface")
    return fn


_DISPATCH = {
    ".html": _extract_html,
    ".htm": _extract_html,
    ".md": _extract_md,
    ".pdf": _extract_stub("pdf"),
    ".docx": _extract_stub("docx"),
}

_DOC_ID = re.compile(r"doc_(\d+)\.")


def read_documents_dir(spark: SparkSession, doc_dir: str,
                       coalesce_to: int | None = 64) -> DataFrame:
    """Directory of per-document files -> documents contract.

    binaryFile scan (path+content only), then one Arrow mapInPandas whose
    rows route through the per-extension extractor table. doc_id comes from
    the filename (the ingest key the reference also derives from the file);
    n_chars is recomputed from the extracted text.

    ``coalesce_to``: binaryFile's 4 MB open-cost makes one task per small
    file (a 5000-doc corpus = 5000 tasks of microseconds each); coalesce —
    shuffle-free — packs them. Pass None for large-dump corpora where one
    file per task is the right parallel unit."""
    import pandas as pd

    # load the DIRECTORY, not a glob: a glob expands to one load path per
    # matched file and anything past parallelPartitionDiscovery.threshold
    # (32) triggers a distributed listing job with one task per file —
    # measured 5000 tasks / ~9 s of pure listing overhead for a 5000-doc
    # corpus. A single directory path lists driver-side in milliseconds;
    # pathGlobFilter applies the same name filter during that listing.
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.*")
             .load(doc_dir)
             .select("path", "content"))
    if coalesce_to is not None:
        files = files.coalesce(coalesce_to)

    def parse(batches):
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                base = os.path.basename(path)
                ext = os.path.splitext(base)[1].lower()
                fn = _DISPATCH.get(ext)
                if fn is None:
                    continue          # unknown format: skip, never crash
                m = _DOC_ID.search(base)
                doc_id = int(m.group(1)) if m else None
                text, lang, source = fn(
                    base, bytes(content).decode("utf-8"))
                out.append((doc_id, text, lang, source,
                            len(text) if text is not None else None))
            yield pd.DataFrame(
                out, columns=["doc_id", "text", "lang", "source", "n_chars"])

    return files.mapInPandas(parse, DOC_SCHEMA)
