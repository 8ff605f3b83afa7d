"""Helpers to build search/property term groups programmatically.

(Parity: reference knowpro/searchlib.py — exact_match semantics:
related_terms=[] blocks fuzzy expansion; ';'-embedded related terms;
','-separated multi-values.)
"""

from __future__ import annotations

from typing import cast

from .interfaces import (
    ISemanticRefCollection,
    KnowledgePropertyName,
    PropertySearchTerm,
    ScoredSemanticRefOrdinal,
    SearchTerm,
    SearchTermGroup,
    SearchTermGroupTypes,
    SemanticRef,
    Term,
)
from .propindex import PropertyNames

_WELL_KNOWN_PROPERTY_NAMES = (
    "name", "type", "verb", "subject", "object", "indirectObject", "tag", "topic",
)


def create_search_term(
    text: str,
    weight: float | None = None,
    exact_match_value: bool = False,
) -> SearchTerm:
    """related_terms=[] (exact) means 'do not expand'; None means 'resolver may'."""
    return SearchTerm(
        term=Term(text=text, weight=weight),
        related_terms=[] if exact_match_value else None,
    )


def create_property_search_term(
    name: str,
    value: str,
    exact_match_value: bool = False,
) -> PropertySearchTerm:
    if name in _WELL_KNOWN_PROPERTY_NAMES:
        property_name: KnowledgePropertyName | SearchTerm = cast(
            KnowledgePropertyName, name
        )
    else:
        property_name = create_search_term(name)
    property_value = create_search_term(value)
    if exact_match_value:
        property_value.related_terms = []
    return PropertySearchTerm(property_name=property_name, property_value=property_value)


def create_and_term_group(*terms: SearchTermGroupTypes) -> SearchTermGroup:
    return SearchTermGroup(boolean_op="and", terms=list(terms))


def create_or_term_group(*terms: SearchTermGroupTypes) -> SearchTermGroup:
    return SearchTermGroup(boolean_op="or", terms=list(terms))


def create_or_max_term_group(*terms: SearchTermGroupTypes) -> SearchTermGroup:
    return SearchTermGroup(boolean_op="or_max", terms=list(terms))


def create_search_terms(terms: list[str]) -> list[SearchTerm]:
    """'novel;book;bestseller' makes 'book' and 'bestseller' related terms."""
    search_terms: list[SearchTerm] = []
    for term in terms:
        search_term = _parse_search_term(term)
        if search_term:
            search_terms.append(search_term)
    return search_terms


def _parse_search_term(text: str) -> SearchTerm | None:
    term_strings = [t.lower() for t in _split_term_values(text, ";")]
    if not term_strings:
        return None
    search_term = SearchTerm(term=Term(text=term_strings[0]))
    if len(term_strings) > 1:
        search_term.related_terms = [Term(text=t) for t in term_strings[1:]]
    return search_term


def create_property_search_terms(
    property_name_values: dict[str, str],
) -> list[PropertySearchTerm]:
    """Multi-values per name are ','-separated."""
    result: list[PropertySearchTerm] = []
    for property_name, property_value in property_name_values.items():
        for value in _split_term_values(property_value, ","):
            result.append(create_property_search_term(property_name, value))
    return result


def create_topic_search_term_group(
    topic_terms: str | list[str],
    exact_match: bool = False,
) -> SearchTermGroup:
    term_group = create_or_max_term_group()
    if isinstance(topic_terms, str):
        topic_terms = [topic_terms]
    for term in topic_terms:
        term_group.terms.append(
            create_property_search_term(PropertyNames.Topic.value, term, exact_match)
        )
    return term_group


def create_entity_search_term_group(
    name: str | None = None,
    type_: str | None = None,
    facet_name: str | None = None,
    facet_value: str | None = None,
    exact_match: bool = False,
) -> SearchTermGroup:
    term_group = create_or_max_term_group()
    for prop, value in (
        (PropertyNames.EntityName, name),
        (PropertyNames.EntityType, type_),
        (PropertyNames.FacetName, facet_name),
        (PropertyNames.FacetValue, facet_value),
    ):
        if value:
            term_group.terms.append(
                create_property_search_term(prop.value, value, exact_match)
            )
    return term_group


def create_tag_search_term_group(
    tags: list[str],
    exact_match: bool = True,
) -> SearchTermGroup:
    term_group = create_or_max_term_group()
    for tag in tags:
        term_group.terms.append(
            create_property_search_term(PropertyNames.Tag.value, tag, exact_match)
        )
    return term_group


def _split_term_values(term: str, split_char: str) -> list[str]:
    return [part.strip() for part in term.split(split_char) if part.strip()]


def create_multiple_choice_question(
    question: str,
    choices: list[str],
    add_none: bool = True,
) -> str:
    text = question
    if choices:
        text = f"Multiple choice question:\n{question}\n"
        text += "Answer using *one or more* of the following choices *only*:\n"
        for choice in choices:
            text += f"- {choice.strip()}\n"
        if add_none:
            text += "- None of the above\n"
    return text


async def get_semantic_refs_from_scored_ordinals(
    semantic_refs: ISemanticRefCollection,
    scored_ordinals: list[ScoredSemanticRefOrdinal],
) -> list[SemanticRef]:
    return await semantic_refs.get_multiple(
        [sr.semantic_ref_ordinal for sr in scored_ordinals]
    )
