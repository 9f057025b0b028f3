"""Per-model-type XML reconciliation (SURVEY K5 proper).

The reference's loudest operational lessons (ingestion/scripts/cellebrite/
ingestion.py:668-706, CELLEBRITE_INGEST_AUDIT.md:10-40): an unknown model
type must surface as not_supported — never silently drop — and a 1:1
writer that persists fewer rows than the XML carried must be flagged
"under" loudly.
"""

import textwrap

from owl_n4j_spark.plans.kg_analytics import (
    q_xml_reconcile,
    xml_reconcile_report,
)
from owl_n4j_spark.sources.ufed_xml import XML_NS, read_ufed_models

SF = "/root/testdata/sf0.001"


def test_reconcile_statuses(spark):
    rows = {r.model_type: r for r in q_xml_reconcile(spark, SF).collect()}
    # one row per type present in the dumps — nothing silently dropped
    assert set(rows) == {"Chat", "InstantMessage", "Attachment", "Call",
                         "Location", "Contact", "Cookie", "CalendarEntry"}
    assert rows["Chat"].status == "ok"
    assert rows["Chat"].persisted_count == rows["Chat"].xml_count
    assert rows["InstantMessage"].status == "nested"
    assert rows["Call"].status == "ok"
    assert rows["Location"].status == "ok"
    # Cookie has NO writer: 100% dropped and said so
    assert rows["Cookie"].status == "not_supported"
    assert rows["Cookie"].persisted_count == 0
    assert rows["Cookie"].xml_count > 0
    assert rows["CalendarEntry"].status == "skipped"
    # Contact writer requires Phone; the fixture omits it for
    # user_id % 7 == 3 — the under-count regression class
    c = rows["Contact"]
    assert c.status == "under"
    assert 0 < c.persisted_count < c.xml_count


def test_report_warns_loudly(spark, capsys):
    rows, warnings = xml_reconcile_report(spark, SF)
    text = "\n".join(warnings)
    assert "UNKNOWN MODEL TYPES" in text and "Cookie(" in text
    assert "UNDER-COUNTED MODEL TYPES" in text and "Contact(" in text
    # warnings go to stderr, not a buried report file
    assert "UNKNOWN MODEL TYPES" in capsys.readouterr().err


def test_unknown_type_never_dropped(spark, tmp_path):
    # a type the engine has never heard of still produces a counted row
    xml = textwrap.dedent(f"""\
        <?xml version="1.0" encoding="utf-8"?>
        <project xmlns="{XML_NS}" name="case-x">
         <decodedData>
          <modelType type="FrobnicatorLog">
           <model type="FrobnicatorLog" id="f-1">
            <field name="Payload" type="String"><value>x</value></field>
           </model>
           <model type="FrobnicatorLog" id="f-2"><empty/></model>
          </modelType>
         </decodedData>
        </project>
    """)
    d = tmp_path / "dumps"
    d.mkdir()
    (d / "dump_000.xml").write_text(xml)
    got = (read_ufed_models(spark, str(d))
           .groupBy("model_type").count().collect())
    assert {(r.model_type, r["count"]) for r in got} == {
        ("FrobnicatorLog", 2)}


def test_nested_models_surface_at_any_depth(spark, tmp_path):
    """EVERY <model> at ANY depth gets a reconciliation row — a Party
    nested inside InstantMessage (the real UFED shape) and an unknown
    nested type must both be counted, never silently dropped (the 45k-
    events silent-drop class the reference's audit documents)."""
    xml = textwrap.dedent(f"""\
        <?xml version="1.0" encoding="utf-8"?>
        <project xmlns="{XML_NS}" name="case-n">
         <decodedData>
          <modelType type="Chat">
           <model type="Chat" id="c-1">
            <field name="Source" type="String"><value>WhatsApp</value></field>
            <multiModelField name="Messages" type="InstantMessage">
             <model type="InstantMessage" id="m-1">
              <modelField name="From" type="Party">
               <model type="Party" id="p-1">
                <field name="Identifier" type="String"><value>555</value></field>
               </model>
              </modelField>
              <model type="MysteryBlob" id="b-1"><empty/></model>
              <field name="Body" type="String"><value>hi</value></field>
             </model>
            </multiModelField>
           </model>
          </modelType>
         </decodedData>
        </project>
    """)
    d = tmp_path / "dumps"
    d.mkdir()
    (d / "dump_000.xml").write_text(xml)
    got = {(r.model_type, r["count"])
           for r in (read_ufed_models(spark, str(d))
                     .groupBy("model_type").count().collect())}
    assert got == {("Chat", 1), ("InstantMessage", 1),
                   ("Party", 1), ("MysteryBlob", 1)}
    # the turns parse still consumes the message normally
    from owl_n4j_spark.sources.ufed_xml import read_ufed_xml
    turns = read_ufed_xml(spark, str(d)).collect()
    assert len(turns) == 1
    assert turns[0].text == "hi" and turns[0].role == "555"
