"""Related-term resolution + dedupe rules.

(Parity: reference storage/memory/reltermsindex.py:147-243 — aliases first,
one batched fuzzy lookup for the rest, cross-term single-occurrence dedupe at
max weight, never duplicating a term already used as a search term; "and"
groups skip the single-occurrence rule. The reference's own NOTES flag this
area as drift-prone, hence direct tests.)
"""

import pytest

from typeagent_tpu.knowpro.convsettings import RelatedTermIndexSettings
from typeagent_tpu.knowpro.interfaces import SearchTerm, Term
from typeagent_tpu.knowpro.query import (
    CompiledTermGroup,
    to_non_required_search_term,
    to_required_search_term,
)
from typeagent_tpu.models.adapters import create_test_embedding_model
from typeagent_tpu.storage.memory.reltermsindex import (
    RelatedTermsIndex,
    dedupe_related_terms,
    resolve_related_terms,
)
from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings


def make_index():
    return RelatedTermsIndex(
        RelatedTermIndexSettings(
            TextEmbeddingIndexSettings(
                create_test_embedding_model(16), min_score=0.0, max_matches=3
            )
        )
    )


def st(text, weight=None, related=None, required=False):
    term = SearchTerm(Term(text, weight=weight), related_terms=related)
    return (
        to_required_search_term(term) if required else to_non_required_search_term(term)
    )


async def test_aliases_win_over_fuzzy():
    index = make_index()
    await index.fuzzy_index.add_terms(["automobile", "bicycle"])
    await index.aliases.add_related_term("car", Term("automobile", weight=0.95))

    group = CompiledTermGroup(boolean_op="or", terms=[st("car")])
    await resolve_related_terms(index, [group])
    related = group.terms[0].related_terms
    assert [t.text for t in related] == ["automobile"]
    assert related[0].weight == pytest.approx(0.95)


async def test_fuzzy_fallback_batched():
    index = make_index()
    await index.fuzzy_index.add_terms(["alpha", "beta", "gamma"])
    group = CompiledTermGroup(
        boolean_op="or", terms=[st("alpha"), st("beta")]
    )
    await resolve_related_terms(index, [group])
    # Fuzzy self-match is excluded; both terms got SOME related list (not None).
    for term in group.terms:
        assert term.related_terms is not None
        assert all(t.text != term.term.text for t in term.related_terms)


async def test_explicit_empty_related_terms_left_alone():
    index = make_index()
    await index.fuzzy_index.add_terms(["alpha"])
    group = CompiledTermGroup(boolean_op="or", terms=[st("alpha", related=[])])
    await resolve_related_terms(index, [group])
    assert group.terms[0].related_terms == []


def test_dedupe_drops_related_that_is_search_term():
    a = st("bach", related=[Term("composer", weight=0.8)])
    b = st("composer")
    dedupe_related_terms([a, b], ensure_single_occurrence=True)
    assert a.related_terms == []


def test_dedupe_keeps_single_max_weight_occurrence():
    a = st("piano", related=[Term("keyboard", weight=0.7)])
    b = st("organ", related=[Term("keyboard", weight=0.9)])
    dedupe_related_terms([a, b], ensure_single_occurrence=True)
    kept = [(t.text, t.weight) for t in (a.related_terms + b.related_terms)]
    assert kept == [("keyboard", 0.9)]
    # Reference quirk pinned deliberately: TermSet.add_or_union bumps the
    # FIRST-seen occurrence's weight in place, so the single surviving
    # occurrence lives on the first search term that mentioned it — at the
    # max weight seen anywhere (reference collections.py add_or_union).
    assert a.related_terms and b.related_terms == []


def test_dedupe_without_single_occurrence_keeps_both():
    """\"and\" groups keep per-term occurrences (only search-term dupes drop)."""
    a = st("piano", related=[Term("keyboard", weight=0.7)])
    b = st("organ", related=[Term("keyboard", weight=0.9)])
    dedupe_related_terms([a, b], ensure_single_occurrence=False)
    assert [t.weight for t in a.related_terms] == [0.7]
    assert [t.weight for t in b.related_terms] == [0.9]


def test_required_related_terms_untouched():
    a = st("bach", related=[Term("composer", weight=0.8)], required=True)
    b = st("composer")
    dedupe_related_terms([a, b], ensure_single_occurrence=True)
    assert [t.text for t in a.related_terms] == ["composer"]
