"""Raw UFED-shaped XML -> transcripts adapter (SURVEY S1 proper).

The reference's highest-volume ingestion path starts from 100+ MB Cellebrite
UFED XML: a streaming chunked parse with explicit depth tracking over nested
model batches (/root/reference/ingestion/scripts/cellebrite/parser.py:658-757),
feeding Chat/InstantMessage models to the writer. This module re-expresses
that path Spark-first:

- PARALLEL UNIT = the XML file. A device dump is one file; a case is many.
  ``binaryFile`` gives one task per file, so a 1000-executor cluster parses
  1000 dumps concurrently with zero shuffle — the parse is a pure map.
- WITHIN a file, memory is bounded: ``xml.etree.ElementTree.iterparse``
  streams events, every InstantMessage element is ``clear()``-ed as soon as
  it is consumed and rows are yielded to Arrow in fixed-size batches, so a
  multi-GB dump never materializes as a tree (the reference's
  ``iterparse`` + ``elem.clear()`` discipline, parser.py:700-757).
- OUTPUT is the transcripts contract (conv_id, turn_idx, role, text, tool,
  ts) — the exact input of pipeline.run_pipeline, so XML drops feed the
  same normalize -> extract -> link -> materialize path as every other
  source (parity with the events-derived transcripts is asserted
  turn-for-turn in tests/test_ufed_xml.py).

The GENERATOR (``write_ufed_xml``) is test scaffolding: it renders the
driver ``events`` table through transcripts_from_events into UFED-shaped
XML, so the parser's expected output is relationally derivable and
``q_xml_ingest`` gets an exact DuckDB oracle.
"""

from __future__ import annotations

import os
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, SparkSession

XML_NS = "urn:ufed-models"
_BATCH_ROWS = 5000
TRANSCRIPT_SCHEMA = ("conv_id string, turn_idx int, role string, "
                     "text string, tool string, ts timestamp")


def write_ufed_xml(spark: SparkSession, sf_dir: str, out_dir: str,
                   n_files: int = 8) -> str:
    """Render the events-derived transcripts as UFED-shaped XML dumps.

    Conversations are split across ``n_files`` by a deterministic hash so
    the reader has multiple parallel units. Messages carry decoy fields and
    attributes the parser must skip (deleted-state, user-mapping, labels) —
    mirroring the real format's width."""
    from zlib import crc32

    from owl_n4j_spark.sources.events_transcripts import transcripts_from_events

    pdf = (transcripts_from_events(spark, sf_dir)
           .toPandas()
           .sort_values(["conv_id", "turn_idx"]))
    os.makedirs(out_dir, exist_ok=True)
    handles = {}
    try:
        for i in range(n_files):
            h = open(os.path.join(out_dir, f"dump_{i:03d}.xml"), "w",
                     encoding="utf-8")
            h.write('<?xml version="1.0" encoding="utf-8"?>\n')
            h.write(f'<project xmlns="{XML_NS}" name="case-001">\n'
                    ' <decodedData>\n  <modelType type="Chat">\n')
            handles[i] = h

        cur_conv, cur_h = None, None
        for row in pdf.itertuples(index=False):
            if row.conv_id != cur_conv:
                if cur_h is not None:
                    cur_h.write('    </multiModelField>\n   </model>\n')
                cur_conv = row.conv_id
                cur_h = handles[crc32(cur_conv.encode()) % n_files]
                cur_h.write(
                    f'   <model type="Chat" id="{escape(cur_conv)}" '
                    'deleted_state="Intact">\n'
                    '    <field name="Source" type="String">'
                    f'<value>{escape(row.tool or "")}</value></field>\n'
                    '    <field name="ServiceIdentifier" type="String">'
                    '<empty/></field>\n'
                    '    <multiModelField name="Messages" '
                    'type="InstantMessage">\n')
            ts = ("" if row.ts is None else
                  f'      <field name="TimeStamp" type="TimeStamp">'
                  f'<value>{row.ts.isoformat()}</value></field>\n')
            cur_h.write(
                f'     <model type="InstantMessage" '
                f'id="{escape(cur_conv)}#{row.turn_idx}">\n'
                f'{ts}'
                '      <modelField name="From" type="Party">\n'
                '       <field name="Identifier" type="String">'
                f'<value>{escape(row.role or "")}</value></field>\n'
                '       <field name="Role" type="String">'
                '<value>From</value></field>\n'
                '      </modelField>\n'
                '      <field name="Body" type="String">'
                f'<value>{escape(row.text or "")}</value></field>\n'
                '      <field name="Label" type="String"><empty/></field>\n'
                '     </model>\n')
        if cur_h is not None:
            cur_h.write('    </multiModelField>\n   </model>\n')
    finally:
        for h in handles.values():
            h.write('  </modelType>\n </decodedData>\n</project>\n')
            h.close()
    return out_dir


def _parse_ufed_stream(stream, batch_rows: int = _BATCH_ROWS):
    """Streaming UFED parse: yields lists of transcript tuples.

    Depth-tracked iterparse (parser.py:658-757): nested <model> elements
    (Party inside InstantMessage inside Chat) are told apart by the model
    depth counter, unknown fields/attributes are skipped, and consumed
    message elements are cleared so memory stays O(batch)."""
    import xml.etree.ElementTree as ET

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    rows: list[tuple] = []
    chat_id = None
    tool = None
    turn_idx = 0
    depth = 0            # <model> nesting depth: 1=Chat, 2=InstantMessage
    chat_elem = None
    for event, elem in ET.iterparse(stream, events=("start", "end")):
        tag = local(elem.tag)
        if event == "start":
            if tag == "model":
                depth += 1
                mtype = elem.get("type")
                if depth == 1 and mtype == "Chat":
                    chat_id = elem.get("id")
                    tool = None
                    turn_idx = 0
                    chat_elem = elem
            continue
        # end events
        if tag == "field" and depth == 1 and chat_id is not None \
                and elem.get("name") == "Source":
            v = elem.find(f"{{{XML_NS}}}value")
            tool = v.text if v is not None else None
        elif tag == "model":
            mtype = elem.get("type")
            if depth == 2 and mtype == "InstantMessage" and chat_id:
                ts_s = body = role = None
                for f in elem.iter(f"{{{XML_NS}}}field"):
                    v = f.find(f"{{{XML_NS}}}value")
                    val = None if v is None else v.text
                    name = f.get("name")
                    if name == "TimeStamp":
                        ts_s = val
                    elif name == "Body":
                        body = val
                    elif name == "Identifier":
                        role = val
                rows.append((chat_id, turn_idx, role, body, tool, ts_s))
                turn_idx += 1
                elem.clear()    # bound memory: message subtree is consumed
                if len(rows) >= batch_rows:
                    yield rows
                    rows = []
            elif depth == 1:
                if chat_elem is not None:
                    chat_elem.clear()
                chat_id, chat_elem = None, None
            depth -= 1
    if rows:
        yield rows


def read_ufed_xml(spark: SparkSession, xml_dir: str) -> DataFrame:
    """UFED XML directory -> transcripts DataFrame (the S1 operator).

    One task per file via binaryFile; the per-file parse streams batches
    through Arrow. Column pruning note: only (path, content) are read, and
    binaryFile pushes the path filter down."""
    import pandas as pd

    # directory + pathGlobFilter, never a multi-file glob: globs past 32
    # matches trigger a one-task-per-file distributed listing job (see
    # doc_formats.read_documents_dir)
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.xml")
             .load(xml_dir)
             .select("path", "content"))

    def parse(batches):
        from io import BytesIO
        for pdf in batches:
            for content in pdf["content"]:
                for rows in _parse_ufed_stream(BytesIO(bytes(content))):
                    out = pd.DataFrame(
                        rows, columns=["conv_id", "turn_idx", "role",
                                       "text", "tool", "ts"])
                    out["ts"] = pd.to_datetime(out["ts"], format="ISO8601")
                    out["turn_idx"] = out["turn_idx"].astype("int32")
                    yield out

    # natural binaryFile partitioning: dumps are not splittable, so at real
    # scale each multi-GB file is its own task; small test files pack
    # together via the open-cost heuristic. (An earlier repartition("path")
    # here shuffled every content byte for zero benefit at dump scale.)
    return files.mapInPandas(parse, TRANSCRIPT_SCHEMA)
