"""Deterministic synthetic transcript corpus (FIXTURES.md §1-3).

Generates the primary input table
``transcripts(conv_id, turn_idx, role, text, tool, ts)`` plus ground truth:
``expected_triples``, ``expected_components``, ``alias_dict``.

Shape mirrors the reference's Chat -> InstantMessage thread model
(/root/reference/ingestion/scripts/cellebrite/neo4j_writer.py:1507-1662) and
its documented skew (one hub contact with 70k+ relationships —
/root/reference/scripts/backfill_person_comm_counts.py:5-7): participants are
Zipf-distributed so a few hub persons dominate.

Everything is seeded and position-deterministic: conversation ``i`` is
generated from ``seed * 1_000_003 + i`` regardless of partitioning, so the
driver-side pandas path (tests, with ground truth) and the distributed
mapInPandas path (bench scale) produce byte-identical turns.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from owl_n4j_spark.functions.keys import normalise_key

# ---------------------------------------------------------------------------
# Universe
# ---------------------------------------------------------------------------

FIRST_NAMES = [
    "John", "Maria", "Carlos", "Elena", "David", "Sofia", "Marco", "Anna",
    "Pedro", "Lucia", "James", "Nadia", "Victor", "Irene", "Oscar", "Paula",
    "Hugo", "Clara", "Felix", "Diana", "Ivan", "Rosa", "Simon", "Vera",
    "Tomas", "Alice", "Ruben", "Nora", "Pablo", "Emma",
]
LAST_NAMES = [
    "Smith", "Garcia", "Mendez", "Johnson", "Lopez", "Brown", "Castillo",
    "Walker", "Romero", "Hughes", "Vargas", "Keller", "Ortiz", "Murphy",
    "Navarro", "Foster", "Rivas", "Duncan", "Salas", "Barnes", "Molina",
    "Reyes", "Carter", "Ibarra", "Dawson", "Fuentes", "Grant", "Serrano",
    "Pierce", "Aguilar",
]
ORG_ADJ = ["Emerald", "Nexus", "Atlas", "Vertex", "Orion", "Crimson", "Silver",
           "Pacific", "Summit", "Falcon", "Cobalt", "Harbor"]
ORG_NOUN = ["Imports", "Trading", "Logistics", "Holdings", "Freight",
            "Capital", "Ventures", "Exports", "Shipping", "Partners"]
ORG_SUFFIX = ["Ltd", "Inc", "LLC", "Corp", "GmbH"]
CITIES = [
    "Madrid", "Rotterdam", "Miami", "Panama", "Bogota", "Lisbon", "Antwerp",
    "Hamburg", "Valencia", "Guayaquil", "Cartagena", "Marseille", "Genoa",
    "Veracruz", "Santos", "Algeciras", "Barcelona", "Houston", "Callao",
    "Durban",
]
NOISE_LINES = [
    "ok", "thanks", "see you soon", "sounds good", "got it", "will do",
    "let me check", "talk later", "no problem", "understood", "on my way",
    "call you back", "busy now", "same as before", "fine by me",
]
PREDS = ("PAID", "TRANSFERRED_TO", "WORKS_FOR", "MET", "WAS_AT",
         "TRAVELED_TO", "CALLED", "OWNS_ACCOUNT", "SENT_MESSAGE",
         "PARTICIPATED_IN")

EPOCH = datetime(2024, 1, 1)


@dataclass
class Person:
    idx: int
    first: str
    last: str
    e164: str            # +13017280952 / +50377200313
    jid: str             # digits@s.whatsapp.net
    email: str

    @property
    def full(self) -> str:
        return f"{self.first} {self.last}"

    @property
    def initial(self) -> str:
        return f"{self.first[0]}. {self.last}"

    @property
    def key(self) -> str:        # canonical: phone-{digits}
        return f"phone-{self.e164[1:]}"

    @property
    def name_key(self) -> str:
        return normalise_key(self.full)

    # -- second device (J11 cross-phone projection) ----------------------
    # Every 7th person carries a second phone (+91 -> 'phone-91...', which
    # sorts AFTER every primary 'phone-1...'/'phone-503...' key, so the
    # component's canonical election still elects the primary). The alt
    # number only enters the corpus through intro turns ("Call me at ..."),
    # whose SAME_AS evidence is what unifies the two devices — exactly the
    # reference's cross-extraction person merge.

    @property
    def alt_e164(self) -> str | None:
        if self.idx % 7 != 2:
            return None
        return f"+91{7000000000 + (self.idx * 17) % 2999999999:010d}"

    @property
    def alt_key(self) -> str | None:
        return None if self.alt_e164 is None else f"phone-{self.alt_e164[1:]}"


@dataclass
class Universe:
    persons: list[Person]
    orgs: list[tuple[str, str, str]]      # (full_name, short_name, key)
    accounts: list[str]                    # ACC-0001
    cities: list[str] = field(default_factory=lambda: list(CITIES))
    # Zipf cumulative weights over persons (hub skew)
    cum_w: np.ndarray = field(default=None, repr=False)


def build_universe(seed: int, n_persons: int, n_orgs: int) -> Universe:
    persons: list[Person] = []
    n_first, n_last = len(FIRST_NAMES), len(LAST_NAMES)
    for i in range(n_persons):
        first = FIRST_NAMES[i % n_first]
        # (first, last) pairs repeat every lcm(30,30)=30 — suffix the last
        # name per 30-block so full names AND "F. Last" initials stay unique.
        last = LAST_NAMES[(i * 7) % n_last] + ("" if i < n_last else str(i // n_last))
        if i % 10 == 3:
            # El Salvador number (tests JID full-international parsing —
            # reference regression at neo4j_writer.py:186-193)
            national = 70000000 + (i * 13) % 9999999
            e164 = f"+503{national}"
        else:
            area = 200 + (i % 780)
            exchange = 200 + ((i * 7) % 780)
            line = (i * 13) % 10000
            e164 = f"+1{area}{exchange:03d}{line:04d}"
        jid = f"{e164[1:]}@s.whatsapp.net"
        email = f"{first.lower()}.{last.lower()}{i}@mail{i % 7}.example.com"
        persons.append(Person(i, first, last, e164, jid, email))

    orgs = []
    for i in range(n_orgs):
        adj = ORG_ADJ[i % len(ORG_ADJ)]
        noun = ORG_NOUN[(i * 3) % len(ORG_NOUN)]
        sfx = ORG_SUFFIX[i % len(ORG_SUFFIX)]
        tag = "" if i < len(ORG_ADJ) * len(ORG_NOUN) // 2 else str(i)
        full = f"{adj} {noun}{tag} {sfx}"
        short = f"{adj} {noun}{tag}"
        orgs.append((full, short, normalise_key(full)))

    accounts = [f"ACC-{i:04d}" for i in range(max(8, n_persons // 2))]

    w = 1.0 / np.power(np.arange(1, n_persons + 1), 1.15)
    cum_w = np.cumsum(w / w.sum())
    return Universe(persons=persons, orgs=orgs, accounts=accounts, cum_w=cum_w)


def universe_for(n_convs: int, seed: int = 42) -> Universe:
    n_persons = max(20, min(5000, n_convs // 4))
    n_orgs = max(8, min(400, n_persons // 5))
    return build_universe(seed, n_persons, n_orgs)


# ---------------------------------------------------------------------------
# Surface-form renderers (the extraction contract's input side)
# ---------------------------------------------------------------------------


def fmt_phone(p: Person, style: int) -> str:
    e = p.e164
    if style == 0:
        return e                                  # +13017280952
    if style == 1 and e.startswith("+1"):
        return f"({e[2:5]}) {e[5:8]}-{e[8:]}"     # (301) 728-0952
    if style == 2 and e.startswith("+1"):
        return f"{e[2:5]}.{e[5:8]}.{e[8:]}"       # 301.728.0952
    if style == 3:
        return p.jid                               # JID
    return e


def fmt_amount(rng: np.random.RandomState) -> tuple[str, str]:
    """(surface, normalized US string) — EU format per reference
    normalize_amount (/root/reference/ingestion/scripts/neo4j_client.py:19-35)."""
    cents = int(rng.randint(100, 99_999_900))
    whole, frac = divmod(cents, 100)
    us = f"{whole:,}.{frac:02d}"
    style = int(rng.randint(0, 3))
    if style == 0:
        return f"${us}", us.replace(",", "")
    if style == 1:
        return f"${whole:,}", f"{whole}"
    eu = f"{whole:,}".replace(",", ".") + f",{frac:02d}"
    return f"{eu} EUR", us.replace(",", "")


MONTHS = ["January", "February", "March", "April", "May", "June", "July",
          "August", "September", "October", "November", "December"]


def fmt_date(rng: np.random.RandomState) -> tuple[str, str]:
    """(surface, ISO yyyy-mm-dd)."""
    d = EPOCH + timedelta(days=int(rng.randint(0, 720)))
    iso = d.strftime("%Y-%m-%d")
    style = int(rng.randint(0, 3))
    if style == 0:
        return iso, iso
    if style == 1:
        return d.strftime("%d/%m/%Y"), iso
    return f"{MONTHS[d.month - 1]} {d.day}, {d.year}", iso


def name_surface(p: Person, rng: np.random.RandomState) -> tuple[str, bool]:
    """(surface, in_dict). ~4% are single-char typos (fuzzy-link exercise)."""
    r = rng.random()
    if r < 0.55:
        return p.full, True
    if r < 0.82:
        return p.initial, True
    if r < 0.96:
        return p.full, True
    # typo: swap a vowel in the last name -> not in alias dict
    last = p.last
    for i, ch in enumerate(last[1:], 1):
        if ch in "aeiou":
            last = last[:i] + ("a" if ch != "a" else "e") + last[i + 1:]
            break
    return f"{p.first} {last}", False


# ---------------------------------------------------------------------------
# Per-conversation generation (the single source of truth)
# ---------------------------------------------------------------------------


def _pick_person(u: Universe, rng: np.random.RandomState) -> Person:
    return u.persons[int(np.searchsorted(u.cum_w, rng.random()))]


def gen_conv(u: Universe, conv_idx: int, seed: int = 42):
    """Generate one conversation. Returns (turn_rows, triple_rows).

    turn_rows:   dicts of (conv_id, turn_idx, role, text, tool, ts)
    triple_rows: dicts of (subj_key, pred, obj_key, conv_id, turn_idx)
                 with CANONICAL keys (ground truth after linking).
    """
    rng = np.random.RandomState((seed * 1_000_003 + conv_idx) % (2**31 - 1))
    conv_id = f"conv-{conv_idx:08d}"
    chat_key = f"chat-{conv_id}"
    n_parts = int(rng.randint(2, 5))
    parts = []
    seen = set()
    while len(parts) < n_parts:
        p = _pick_person(u, rng)
        if p.idx not in seen:
            seen.add(p.idx)
            parts.append(p)
    n_turns = int(rng.randint(2, 51))
    tool = ["WhatsApp", "Telegram", "SMS", None][int(rng.randint(0, 4))]
    t0 = EPOCH + timedelta(minutes=int(rng.randint(0, 525_600)))

    turns, triples = [], []
    participated = set()

    for t in range(n_turns):
        speaker = parts[int(rng.randint(0, len(parts)))]
        rstyle = rng.random()
        if rstyle < 0.4:
            role = speaker.jid
        elif rstyle < 0.65:
            role = speaker.e164
        elif rstyle < 0.8:
            role = speaker.email
        else:
            role = speaker.full

        ts = t0 + timedelta(seconds=int(rng.randint(20, 600)) * (t + 1))
        text, tr = _gen_text(u, parts, speaker, conv_id, t, rng)
        triples.extend(tr)
        # structural triples (deterministic Cellebrite-path semantics:
        # Person -SENT_MESSAGE-> chat, Person -PARTICIPATED_IN-> chat;
        # ref neo4j_writer.py:1579-1662)
        triples.append(dict(subj_key=speaker.key, pred="SENT_MESSAGE",
                            obj_key=chat_key, conv_id=conv_id, turn_idx=t))
        if speaker.key not in participated:
            participated.add(speaker.key)
            triples.append(dict(subj_key=speaker.key, pred="PARTICIPATED_IN",
                                obj_key=chat_key, conv_id=conv_id, turn_idx=t))
        turns.append(dict(conv_id=conv_id, turn_idx=t, role=role, text=text,
                          tool=tool, ts=ts))

    # noise: ~2% duplicated rows (exact dup — exercises W7 dedup)
    n_dups = max(0, int(round(n_turns * 0.02)))
    for d in range(n_dups):
        turns.append(dict(turns[int(rng.randint(0, n_turns))]))

    return turns, triples


def _gen_text(u, parts, speaker, conv_id, t, rng):
    """One turn body + its ground-truth triples (canonical keys)."""
    other = parts[(parts.index(speaker) + 1) % len(parts)]
    choice = rng.random()
    tr = []

    if choice < 0.30:
        return NOISE_LINES[int(rng.randint(0, len(NOISE_LINES)))], tr

    if choice < 0.40:  # intro — same-as signal (name alias <-> phone)
        surface, _ = name_surface(speaker, rng)
        style = int(rng.randint(0, 5))
        if style == 4 and speaker.alt_e164:
            phone = speaker.alt_e164   # second device (J11 cross-phone)
        else:
            phone = fmt_phone(speaker, style)  # style 4 -> e164 fallback
        return f"Hi, this is {surface}. Call me at {phone}.", tr

    if choice < 0.50:  # payment
        a_s, _ = name_surface(speaker, rng)
        b_s, _ = name_surface(other, rng)
        amt, _ = fmt_amount(rng)
        date_s, _ = fmt_date(rng)
        tr.append(dict(subj_key=speaker.key, pred="PAID", obj_key=other.key,
                       conv_id=conv_id, turn_idx=t))
        return f"{a_s} paid {amt} to {b_s} on {date_s}.", tr

    if choice < 0.58:  # transfer to account
        a_s, _ = name_surface(speaker, rng)
        acc = u.accounts[int(rng.randint(0, len(u.accounts)))]
        amt, _ = fmt_amount(rng)
        tr.append(dict(subj_key=speaker.key, pred="TRANSFERRED_TO",
                       obj_key=normalise_key(acc), conv_id=conv_id, turn_idx=t))
        return f"{a_s} transferred {amt} to account {acc}.", tr

    if choice < 0.66:  # employment
        a_s, _ = name_surface(speaker, rng)
        full, short, okey = u.orgs[int(rng.randint(0, len(u.orgs)))]
        org_s = full if rng.random() < 0.7 else short
        tr.append(dict(subj_key=speaker.key, pred="WORKS_FOR", obj_key=okey,
                       conv_id=conv_id, turn_idx=t))
        return f"{a_s} works for {org_s}.", tr

    if choice < 0.74:  # meeting
        a_s, _ = name_surface(speaker, rng)
        b_s, _ = name_surface(other, rng)
        city = u.cities[int(rng.randint(0, len(u.cities)))]
        ck = normalise_key(city)
        tr.append(dict(subj_key=speaker.key, pred="MET", obj_key=other.key,
                       conv_id=conv_id, turn_idx=t))
        tr.append(dict(subj_key=speaker.key, pred="WAS_AT", obj_key=ck,
                       conv_id=conv_id, turn_idx=t))
        tr.append(dict(subj_key=other.key, pred="WAS_AT", obj_key=ck,
                       conv_id=conv_id, turn_idx=t))
        return f"{a_s} met {b_s} in {city}.", tr

    if choice < 0.82:  # travel
        a_s, _ = name_surface(speaker, rng)
        city = u.cities[int(rng.randint(0, len(u.cities)))]
        date_s, _ = fmt_date(rng)
        tr.append(dict(subj_key=speaker.key, pred="TRAVELED_TO",
                       obj_key=normalise_key(city), conv_id=conv_id, turn_idx=t))
        return f"{a_s} traveled to {city} on {date_s}.", tr

    if choice < 0.88:  # call
        a_s, _ = name_surface(speaker, rng)
        b_s, _ = name_surface(other, rng)
        tr.append(dict(subj_key=speaker.key, pred="CALLED", obj_key=other.key,
                       conv_id=conv_id, turn_idx=t))
        return f"{a_s} called {b_s} yesterday.", tr

    if choice < 0.94:  # email reference — same-as signal
        b_s, _ = name_surface(other, rng)
        return f"You can reach {b_s} at {other.email}.", tr

    # account ownership
    a_s, _ = name_surface(speaker, rng)
    acc = u.accounts[int(rng.randint(0, len(u.accounts)))]
    tr.append(dict(subj_key=speaker.key, pred="OWNS_ACCOUNT",
                   obj_key=normalise_key(acc), conv_id=conv_id, turn_idx=t))
    return f"{a_s} owns account {acc}.", tr


# ---------------------------------------------------------------------------
# Fixture tables
# ---------------------------------------------------------------------------


def alias_dict_pandas(u: Universe) -> pd.DataFrame:
    """Broadcast linking dictionary (FIXTURES.md §2): normalised surface
    alias -> canonical key. Mirrors the reference's "existing entity keys"
    context (/root/reference/ingestion/scripts/ingestion.py:739-743)."""
    rows = []
    for p in u.persons:
        rows.append((p.name_key, p.key, "Person"))
        rows.append((normalise_key(p.initial), p.key, "Person"))
        rows.append((f"email-{p.email.lower()}", p.key, "Person"))
    for full, short, okey in u.orgs:
        rows.append((okey, okey, "Company"))
        rows.append((normalise_key(short), okey, "Company"))
    for c in CITIES:
        rows.append((normalise_key(c), normalise_key(c), "Location"))
    df = pd.DataFrame(rows, columns=["alias", "canonical_key", "entity_type"])
    return df.drop_duplicates(subset=["alias"], keep="first")


def expected_components_pandas(u: Universe) -> pd.DataFrame:
    rows = []
    for p in u.persons:
        members = {p.key, p.name_key, normalise_key(p.initial),
                   f"email-{p.email.lower()}"}
        if p.alt_key:
            members.add(p.alt_key)
        for member in members:
            rows.append((member, p.key))
    return pd.DataFrame(rows, columns=["member_key", "canonical_key"])


def generate_corpus_pandas(n_convs: int, seed: int = 42):
    """Driver-side corpus with ground truth (test tiers t1/t2).

    Returns dict of pandas DataFrames: transcripts, expected_triples,
    alias_dict, expected_components.
    """
    u = universe_for(n_convs, seed)
    all_turns, all_triples = [], []
    for i in range(n_convs):
        turns, triples = gen_conv(u, i, seed)
        all_turns.extend(turns)
        all_triples.extend(triples)
    transcripts = pd.DataFrame(all_turns)
    transcripts["turn_idx"] = transcripts["turn_idx"].astype("int32")
    # out-of-order on disk: stable global shuffle by hash of (conv, idx)
    transcripts = transcripts.sort_values(
        by=["conv_id", "turn_idx"],
        key=lambda s: s.map(lambda v: hashlib.md5(str(v).encode()).hexdigest()),
        kind="mergesort",
    ).reset_index(drop=True)
    triples = pd.DataFrame(all_triples).drop_duplicates()
    triples["turn_idx"] = triples["turn_idx"].astype("int32")
    return dict(
        transcripts=transcripts,
        expected_triples=triples,
        alias_dict=alias_dict_pandas(u),
        expected_components=expected_components_pandas(u),
    )


TRANSCRIPT_SCHEMA = ("conv_id string, turn_idx int, role string, "
                     "text string, tool string, ts timestamp")


def generate_transcripts_spark(spark, n_convs: int, seed: int = 42,
                               n_partitions: int | None = None):
    """Distributed transcript generation (bench tier). Ground truth is not
    materialized at this scale; correctness comes from the pandas tiers."""
    n_partitions = n_partitions or max(32, n_convs // 2000)
    n_persons = max(20, min(5000, n_convs // 4))
    n_orgs = max(8, min(400, n_persons // 5))

    def gen(batches):
        u = build_universe(seed, n_persons, n_orgs)  # deterministic per task
        for pdf in batches:
            rows = []
            for conv_idx in pdf["id"].tolist():
                turns, _ = gen_conv(u, int(conv_idx), seed)
                rows.extend(turns)
            out = pd.DataFrame(rows)
            out["turn_idx"] = out["turn_idx"].astype("int32")
            yield out

    return (
        spark.range(0, n_convs, numPartitions=n_partitions)
        .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    )
