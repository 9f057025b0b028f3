"""Property-based tests (hypothesis) for the identity-key cascade —
the merge identity of the whole engine (SURVEY.md §1.4). The reference has
no property tests (SURVEY.md §5 'Not present'); these pin the invariants the
pipeline depends on: idempotence, output alphabet, cascade priority, and
amount/date normalization round-trips."""

import re
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from owl_n4j_spark.functions.keys import (
    key_priority,
    normalise_key,
    normalise_phone,
    person_key,
    phone_person_key,
)
from owl_n4j_spark.operators.extraction import normalize_amount, normalize_date

KEY_RE = re.compile(r"^[a-z0-9]+(-[a-z0-9]+)*$")


@given(st.text(max_size=80))
@settings(max_examples=300, deadline=None)
def test_normalise_key_alphabet_and_idempotence(s):
    k = normalise_key(s)
    assert k == "" or KEY_RE.fullmatch(k), k
    assert normalise_key(k) == k  # idempotent


@given(st.text(alphabet="0123456789+()-. ", max_size=24))
@settings(max_examples=300, deadline=None)
def test_normalise_phone_shape(s):
    p = normalise_phone(s)
    if p is not None:
        assert re.fullmatch(r"\+\d{8,15}", p), p
        # canonical form is a fixpoint
        assert normalise_phone(p) == p


@given(st.integers(min_value=2000000000, max_value=9999999999))
@settings(max_examples=200, deadline=None)
def test_jid_and_bare_number_agree(n):
    """A WhatsApp JID and the equivalent E.164 string must mint the SAME
    person key (the reference regression class: merge_whatsapp_identities)."""
    digits = f"1{n}"
    jid_key = person_key(f"{digits}@s.whatsapp.net")
    e164_key = person_key(f"+{digits}")
    assert jid_key == e164_key
    if jid_key is not None:
        assert jid_key == f"phone-{digits}"


@given(st.emails())
@settings(max_examples=100, deadline=None)
def test_email_cascade(e):
    k = person_key(e)
    assert k is not None and k.startswith("email-")
    assert key_priority(k) == 1


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               min_size=1, max_size=40))
@settings(max_examples=300, deadline=None)
def test_cascade_total(s):
    """The cascade never crashes and never returns an empty-string key."""
    k = person_key(s, name=s)
    assert k is None or len(k) > 0


@given(st.integers(min_value=0, max_value=99_999_999),
       st.integers(min_value=0, max_value=99))
@settings(max_examples=200, deadline=None)
def test_normalize_amount_eu_us_roundtrip(whole, frac):
    us = f"{whole:,}.{frac:02d}"
    eu = f"{whole:,}".replace(",", ".") + f",{frac:02d}"
    a_us = normalize_amount(f"${us}")
    a_eu = normalize_amount(f"{eu} EUR")
    assert a_us is not None and a_eu is not None
    assert Decimal(a_us) == Decimal(a_eu) == Decimal(us.replace(",", ""))


import datetime as _dt


@given(st.dates(min_value=_dt.date(1000, 1, 1)))
@settings(max_examples=200, deadline=None)
def test_normalize_date_formats_agree(d):
    iso = d.isoformat()
    assert normalize_date(iso) == iso
    assert normalize_date(d.strftime("%d/%m/%Y")) == iso
    long = f"{d.strftime('%B')} {d.day}, {d.year}"
    assert normalize_date(long) == iso


def test_phone_validity_table_regressions():
    """Pinned behaviors from the reference's owner-inference regressions
    (tests/test_cellebrite_owner_inference.py re-derived, not copied)."""
    # El Salvador full-international JID
    assert person_key("50370200313@s.whatsapp.net") == "phone-50370200313"
    # group JIDs are threads, not people — must NOT phone-key
    assert person_key("12025550123-1577@g.us", name="Group") == "group"
    # bare 10-digit NANP in default region
    assert phone_person_key("(202) 555-0123") == "phone-12025550123"
    # invalid NANP (area code starts with 1) rejected
    assert normalise_phone("+11025550123") is None
    # letters disqualify
    assert normalise_phone("CALL-ME-NOW") is None
