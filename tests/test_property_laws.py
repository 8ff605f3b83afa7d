"""Property-based laws (hypothesis) for the core data-model invariants.

These complement the example matrices: the ordering laws here are what the
scope masks, range collections, and sorted-index code assume everywhere.
"""

import unicodedata

import pytest
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


# ---------------------------------------------------------------------------
# MatchAccumulator laws vs a plain-dict oracle
# ---------------------------------------------------------------------------

from typeagent_tpu.knowpro.collections import MatchAccumulator  # noqa: E402

# NOTE: XLA sets flush-to-zero processor state, which breaks hypothesis's
# subnormal-float machinery — generate scores as scaled integers instead.
adds = st.lists(
    st.tuples(
        st.integers(0, 12),  # value
        st.integers(1, 500).map(lambda i: i / 100.0),  # score in (0, 5]
        st.booleans(),  # is_exact
    ),
    max_size=40,
)


def oracle_of(seq):
    acc: dict[int, list[float]] = {}
    for value, score, exact in seq:
        entry = acc.setdefault(value, [0.0, 0, 0.0, 0])
        if exact:
            entry[0] += score
            entry[1] += 1
        else:
            entry[2] += score
            entry[3] += 1
    return acc


def accumulate(seq) -> MatchAccumulator:
    acc = MatchAccumulator()
    for value, score, exact in seq:
        acc.add(value, score, exact)
    return acc


@settings(max_examples=150, deadline=None)
@given(seq=adds)
def test_accumulator_matches_oracle(seq):
    acc = accumulate(seq)
    oracle = oracle_of(seq)
    assert len(acc) == len(oracle)
    for value, (score, hits, rscore, rhits) in oracle.items():
        m = acc.get_match(value)
        assert m.hit_count == hits and m.related_hit_count == rhits
        assert m.score == pytest.approx(score, rel=1e-6)
        assert m.related_score == pytest.approx(rscore, rel=1e-6)


@settings(max_examples=100, deadline=None)
@given(a=adds, b=adds)
def test_union_equals_concatenated_adds(a, b):
    left = accumulate(a)
    left.add_union(accumulate(b))
    combined = accumulate(a + b)
    assert {m.value for m in left} == {m.value for m in combined}
    for m in combined:
        got = left.get_match(m.value)
        assert got.hit_count == m.hit_count
        assert got.score == pytest.approx(m.score, rel=1e-6)


@settings(max_examples=100, deadline=None)
@given(a=adds, b=adds)
def test_intersect_keeps_exactly_common_values(a, b):
    left, right = accumulate(a), accumulate(b)
    out = left.intersect(right, MatchAccumulator())
    common = {m[0] for m in a} & {m[0] for m in b}
    assert {m.value for m in out} == common
    oracle = oracle_of(a + b)
    for m in out:  # intersection carries the SUMMED bookkeeping
        score, hits, *_ = oracle[m.value]
        assert m.hit_count == hits
        assert m.score == pytest.approx(score, rel=1e-6)


@settings(max_examples=100, deadline=None)
@given(seq=adds, n=st.integers(1, 8))
def test_top_n_is_prefix_of_sorted(seq, n):
    acc = accumulate(seq)
    full = acc.get_sorted_by_score()
    top = acc.get_top_n_scoring(n)
    assert len(top) == min(n, len(full))
    # Scores agree positionally (value ties may order differently).
    for got, want in zip(top, full):
        assert got.score == pytest.approx(want.score, rel=1e-6)


@settings(max_examples=100, deadline=None)
@given(seq=adds, min_hits=st.integers(0, 4))
def test_hit_count_filter_matches_oracle(seq, min_hits):
    acc = accumulate(seq)
    oracle = oracle_of(seq)
    kept = {m.value for m in acc.matches_with_min_hit_count(min_hits)}
    expected = {
        v for v, (_, hits, _, _) in oracle.items() if not min_hits or hits >= min_hits
    }
    assert kept == expected
    assert acc.get_max_hit_count() == max(
        (e[1] for e in oracle.values()), default=0
    )
