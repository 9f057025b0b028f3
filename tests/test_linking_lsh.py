"""MinHash-LSH fuzzy-linking strategy: must find the same typo matches as
token blocking on keys whose first token differs (where token blocking is
blind), and both strategies must agree on common cases."""

from owl_n4j_spark.operators.linking import build_key_mapping


def _keys(spark, keys):
    return spark.createDataFrame([(k, "Person") for k in keys],
                                 "raw_key string, mention_type string")


def _dict(spark, rows):
    return spark.createDataFrame(
        [(a, c, "Person") for a, c in rows],
        "alias string, canonical_key string, entity_type string")


def test_lsh_matches_typos(spark):
    mentions = _keys(spark, ["maria-garcha", "bob-jones"])
    aliases = _dict(spark, [("maria-garcia", "phone-111"),
                            ("robert-jones", "phone-222")])
    got = {r["raw_key"]: (r["canonical_key"], r["method"])
           for r in build_key_mapping(mentions, aliases,
                                      fuzzy_strategy="lsh").collect()}
    assert got["maria-garcha"] == ("phone-111", "fuzzy")
    # 'bob' vs 'robert' is below the similarity threshold -> self
    assert got["bob-jones"][1] == "self"


def test_lsh_beats_token_blocking_on_first_token_typo(spark):
    """Typo in the FIRST token: token blocking can't see the candidate
    (different block); LSH bands still collide on shared trigrams."""
    mentions = _keys(spark, ["mario-garcia"])  # typo in token 1
    aliases = _dict(spark, [("maria-garcia", "phone-111")])
    blocked = {r["raw_key"]: r["method"]
               for r in build_key_mapping(mentions, aliases,
                                          fuzzy_strategy="block").collect()}
    lsh = {r["raw_key"]: (r["canonical_key"], r["method"])
           for r in build_key_mapping(mentions, aliases,
                                      fuzzy_strategy="lsh").collect()}
    assert blocked["mario-garcia"] == "self"          # blind
    assert lsh["mario-garcia"] == ("phone-111", "fuzzy")  # found


def test_strategies_agree_on_exact(spark):
    mentions = _keys(spark, ["maria-garcia"])
    aliases = _dict(spark, [("maria-garcia", "phone-111")])
    for strat in ("block", "lsh"):
        got = build_key_mapping(mentions, aliases,
                                fuzzy_strategy=strat).collect()[0]
        assert (got["canonical_key"], got["method"]) == ("phone-111", "exact")
