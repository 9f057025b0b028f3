"""Wiretap folder ingestion (SURVEY S6): .sri/.rtf parse + pipeline feed."""

from pyspark.sql import functions as F

from owl_n4j_spark.sources.wiretap import (
    parse_rtf,
    rtf_to_text,
    wiretap_transcripts,
)

SF = "/root/testdata/sf0.001"


def test_rtf_stripper():
    rtf = ("{\\rtf1\\ansi\\deff0\n"
           "{\\fonttbl{\\f0\\fnil Courier New;}}\n"
           "{\\colortbl;\\red0\\green0\\blue0;}\n"
           "\\f0\\fs24 PARTICIPANTS: CHARLIE AND UF\\#96\\par\n"
           "line with \\{braces\\} and a back\\\\slash\\par\n}")
    text = rtf_to_text(rtf)
    # destination groups (fonts/colors) never leak into the text
    assert "Courier" not in text and "red0" not in text
    assert text.splitlines()[0] == "PARTICIPANTS: CHARLIE AND UF#96"
    assert "line with {braces} and a back\\slash" in text
    parts, _ = parse_rtf(rtf)
    assert parts == "CHARLIE,UF#96"


def test_syn_rtf_preferred_over_decoy(spark):
    from owl_n4j_spark.plans.kg_analytics import (
        ensure_wiretap,
        q_wiretap_ingest,
    )

    ensure_wiretap(spark, SF)
    rows = q_wiretap_ingest(spark, SF).collect()
    assert rows, "fixture produced no sessions"
    decoyed = [r for r in rows if int(r.folder_name) % 10 == 0]
    assert decoyed, "no decoy-bearing sessions at this sf"
    for r in decoyed:
        assert "DRAFT" not in r.interpretation
        assert r.interpretation.startswith("PARTICIPANTS: ")


def test_wiretap_feeds_pipeline(spark):
    from owl_n4j_spark.pipeline import run_pipeline
    from owl_n4j_spark.plans.kg_analytics import ensure_wiretap
    from owl_n4j_spark.sources import events_transcripts as et

    case_dir = ensure_wiretap(spark, SF)
    tr = wiretap_transcripts(spark, case_dir)
    n_sessions = tr.count()
    res = run_pipeline(spark, tr, alias_dict=et.alias_dict_df(spark),
                       with_manifest=False)
    called = res["triples"].filter(F.col("pred") == "CALLED")
    # one CALLED claim per session, subjects resolved to canonical keys
    assert called.count() == n_sessions
    assert (called.filter(F.col("subj_key").startswith("phone-")).count()
            == n_sessions)
