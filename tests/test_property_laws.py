"""Property-based laws (hypothesis) for the core data-model invariants.

These complement the example matrices: the ordering laws here are what the
scope masks, range collections, and sorted-index code assume everywhere.
"""

import unicodedata

from hypothesis import given, settings, strategies as st

from typeagent_tpu.knowpro import kplib
from typeagent_tpu.knowpro.interfaces import (
    SemanticRef,
    TextLocation,
    TextRange,
)
from typeagent_tpu.knowpro.knowledge import merge_concrete_entities
from typeagent_tpu.storage.sqlite.indexes import prepare_term

MAX = 50  # ordinal bound keeps collisions (equal ranges) frequent

locations = st.builds(
    TextLocation,
    message_ordinal=st.integers(0, MAX),
    chunk_ordinal=st.integers(0, 8),
)

ranges = st.builds(
    TextRange,
    start=locations,
    end=st.one_of(st.none(), locations),
)


@settings(max_examples=150, deadline=None)
@given(a=ranges, b=ranges)
def test_text_range_order_is_total_and_antisymmetric(a, b):
    # Exactly one of <, ==, > holds.
    assert (a < b) + (a == b) + (a > b) == 1
    # <= and >= are consistent with that trichotomy.
    assert (a <= b) == ((a < b) or (a == b))
    assert (a >= b) == ((a > b) or (a == b))


@settings(max_examples=150, deadline=None)
@given(a=ranges, b=ranges, c=ranges)
def test_text_range_order_transitive(a, b, c):
    if a <= b and b <= c:
        assert a <= c
    if a in b and b in c:
        assert a in c  # containment is transitive too


@settings(max_examples=150, deadline=None)
@given(r=ranges)
def test_point_range_equals_single_chunk_expansion(r):
    if r.end is None:
        expansion = TextRange(
            start=r.start,
            end=TextLocation(r.start.message_ordinal, r.start.chunk_ordinal + 1),
        )
        assert r == expansion
        assert not (r < expansion) and not (r > expansion)
        assert r in expansion and expansion in r


@settings(max_examples=150, deadline=None)
@given(a=ranges, b=ranges)
def test_mutual_containment_is_equality(a, b):
    assert ((a in b) and (b in a)) == (a == b)


@settings(max_examples=150, deadline=None)
@given(r=ranges)
def test_text_range_serialization_round_trip(r):
    assert TextRange.deserialize(r.serialize()) == r


# ---------------------------------------------------------------------------
# Term normalization laws
# ---------------------------------------------------------------------------

terms_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=30
)


@settings(max_examples=200, deadline=None)
@given(t=terms_text)
def test_prepare_term_idempotent(t):
    once = prepare_term(t)
    assert prepare_term(once) == once


@settings(max_examples=200, deadline=None)
@given(t=terms_text)
def test_prepare_term_unicode_form_invariant(t):
    nfc = unicodedata.normalize("NFC", t)
    nfd = unicodedata.normalize("NFD", t)
    assert prepare_term(nfc) == prepare_term(nfd)


@settings(max_examples=200, deadline=None)
@given(t=terms_text)
def test_prepare_term_case_and_padding_invariant(t):
    # Note: upper() is NOT invariant ('ß'.upper() -> 'SS'), matching the
    # reference's plain .lower() behavior; only pre-lowered input is stable.
    base = prepare_term(t)
    assert prepare_term(t.lower()) == base
    assert prepare_term(f"  {t}\t") == base


# ---------------------------------------------------------------------------
# Entity merge laws
# ---------------------------------------------------------------------------

entity_names = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu")), min_size=1, max_size=8
)

entities = st.builds(
    kplib.ConcreteEntity,
    name=entity_names,
    type=st.lists(entity_names, min_size=1, max_size=3),
)


def _canon(merged):
    return sorted((e.name, tuple(e.type)) for e in merged)


@settings(max_examples=100, deadline=None)
@given(es=st.lists(entities, max_size=8))
def test_merge_entities_idempotent(es):
    once = merge_concrete_entities(es)
    twice = merge_concrete_entities(once)
    assert _canon(once) == _canon(twice)


@settings(max_examples=100, deadline=None)
@given(es=st.lists(entities, max_size=8), seed=st.randoms())
def test_merge_entities_order_invariant(es, seed):
    shuffled = list(es)
    seed.shuffle(shuffled)
    assert _canon(merge_concrete_entities(es)) == _canon(
        merge_concrete_entities(shuffled)
    )


@settings(max_examples=100, deadline=None)
@given(es=st.lists(entities, max_size=8))
def test_merge_entities_covers_all_names(es):
    merged_names = {e.name for e in merge_concrete_entities(es)}
    assert merged_names == {e.name.lower() for e in es}


# ---------------------------------------------------------------------------
# SemanticRef round-trip over generated knowledge
# ---------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(entity=entities, r=ranges, ordinal=st.integers(0, 10_000))
def test_semantic_ref_round_trip(entity, r, ordinal):
    ref = SemanticRef(ordinal, r, entity)
    restored = SemanticRef.deserialize(ref.serialize())
    assert restored.semantic_ref_ordinal == ordinal
    assert restored.range == r
    assert restored.knowledge == entity
