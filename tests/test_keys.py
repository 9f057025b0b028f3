"""Key-cascade unit tests — behavior pinned against the reference's
documented regressions (/root/reference/tests/test_cellebrite_owner_inference.py
and neo4j_writer.py:144-208 docstrings)."""

from owl_n4j_spark.functions.keys import (
    key_priority,
    normalise_key,
    normalise_phone,
    person_key,
    phone_person_key,
)


def test_normalise_key_basic():
    assert normalise_key("John Smith") == "john-smith"
    assert normalise_key("Emerald Imports Ltd.") == "emerald-imports-ltd"
    assert normalise_key("ACC-001") == "acc-001"
    assert normalise_key("  Foo_Bar  Baz ") == "foo-bar-baz"
    assert normalise_key("--x--") == "x"
    assert normalise_key(None) == ""
    assert normalise_key("") == ""


def test_phone_nanp():
    assert normalise_phone("+1 301-728-9052") == "+13017289052"
    assert normalise_phone("(301) 728-9052") == "+13017289052"
    assert normalise_phone("301.728.9052") == "+13017289052"
    assert normalise_phone("13017289052") == "+13017289052"
    # invalid NANP (area code can't start with 1/0)
    assert normalise_phone("(101) 728-9052") is None
    # short codes / numeric ids rejected
    assert normalise_phone("12345") is None
    assert normalise_phone("999999999999999999") is None
    # letters rejected (usernames, emails)
    assert normalise_phone("telegram:abc") is None


def test_phone_international():
    # El Salvador — the reference's documented JID regression class
    assert normalise_phone("+50377209313") == "+50377209313"
    assert normalise_phone("+44 7911 123456") == "+447911123456"
    assert normalise_phone("0044 7911 123456") == "+447911123456"


def test_person_key_jid():
    # WhatsApp JID carries the FULL international number
    assert person_key("12404291127@s.whatsapp.net") == "phone-12404291127"
    assert person_key("50377209313@s.whatsapp.net") == "phone-50377209313"
    assert person_key("12404291127@c.us") == "phone-12404291127"
    # group JIDs are threads, not people -> fall through (here: email branch)
    k = person_key("123456789@g.us")
    assert k is None or not k.startswith("phone-")


def test_person_key_cascade_priority():
    assert person_key("+13017289052") == "phone-13017289052"
    assert person_key("john.smith@mail.com") == "email-john.smith@mail.com"
    assert person_key("user123", source_app="Telegram") == "telegram-user123"
    assert person_key(None, name="John Smith") == "john-smith"
    assert person_key(None, name=None) is None


def test_key_priority_ordering():
    assert key_priority("phone-123") < key_priority("email-a@b.c")
    assert key_priority("email-a@b.c") < key_priority("john-smith")


def test_phone_person_key():
    assert phone_person_key("+1 (240) 429-1127") == "phone-12404291127"
    assert phone_person_key("not a phone") is None


def test_display_phone_pinned(spark):
    """F18 display formatting pinned to the reference's examples
    (phone_normalise.py display_format): NANP 3-3-4, 3-digit-CC 4-4,
    unparseable unchanged."""
    from pyspark.sql import functions as F

    from owl_n4j_spark.functions.keys import display_phone

    df = spark.createDataFrame(
        [("phone-12102371858",), ("phone-50370000039",),
         ("phone-999",)], "key string")
    got = dict(df.select("key", display_phone(F.col("key"))
                         .alias("d")).collect())
    assert got == {"phone-12102371858": "+1 210-237-1858",
                   "phone-50370000039": "+503 7000 0039",
                   "phone-999": "+999"}
