"""Semref-index term collectors: what text becomes searchable for each
knowledge shape.

Reference parity: /root/reference/tests/test_semrefindex.py and
test_memory_semrefindex.py — entity name/types/facets registration, action
verbs joined as one term, 'none' placeholder entities skipped, topic text
registration, and ordinal assignment order.
"""

from typeagent_tpu.knowpro import kplib
from typeagent_tpu.knowpro.interfaces import TextLocation, TextRange
from typeagent_tpu.knowpro.semrefindex import (
    collect_action_terms,
    collect_entity_terms,
    collect_facet_terms,
    collect_knowledge_refs_and_terms,
    validate_entity,
)


def action(**kw):
    defaults = dict(
        verbs=["went"],
        verb_tense="past",
        subject_entity_name="none",
        object_entity_name="none",
        indirect_object_entity_name="none",
    )
    defaults.update(kw)
    return kplib.Action(**defaults)


class TestFacetTerms:
    def test_none_facet_collects_nothing(self):
        assert collect_facet_terms(None) == []

    def test_string_value(self):
        assert collect_facet_terms(kplib.Facet("color", "red")) == ["color", "red"]

    def test_numeric_value_stringified(self):
        # Value union coerces ints to float; the term is its str() form.
        assert collect_facet_terms(kplib.Facet("pages", 350)) == ["pages", "350.0"]

    def test_quantity_value_renders_amount_and_units(self):
        facet = kplib.Facet("length", kplib.Quantity(amount=350, units="pages"))
        assert collect_facet_terms(facet) == ["length", "350 pages"]

    def test_bool_value_stringified(self):
        assert collect_facet_terms(kplib.Facet("fiction", True)) == [
            "fiction",
            "True",
        ]


class TestEntityTerms:
    def test_name_and_every_type(self):
        entity = kplib.ConcreteEntity("Gatsby", ["book", "novel"])
        assert collect_entity_terms(entity) == ["Gatsby", "book", "novel"]

    def test_facets_appended(self):
        entity = kplib.ConcreteEntity(
            "Gatsby", ["book"], facets=[kplib.Facet("author", "Fitzgerald")]
        )
        assert collect_entity_terms(entity) == [
            "Gatsby",
            "book",
            "author",
            "Fitzgerald",
        ]

    def test_validate_entity_requires_name(self):
        assert validate_entity(kplib.ConcreteEntity("x", []))
        assert not validate_entity(kplib.ConcreteEntity("", ["thing"]))


class TestActionTerms:
    def test_verbs_join_into_one_term(self):
        a = action(verbs=["run", "jump"])
        assert collect_action_terms(a)[0] == "run jump"

    def test_none_placeholder_entities_skipped(self):
        assert collect_action_terms(action()) == ["went"]

    def test_named_entities_included(self):
        a = action(
            verbs=["gave"],
            subject_entity_name="Alice",
            object_entity_name="book",
            indirect_object_entity_name="Bob",
        )
        assert collect_action_terms(a) == ["gave", "Alice", "book", "Bob"]

    def test_string_and_named_params(self):
        a = action(
            params=["quickly", kplib.ActionParam(name="speed", value="fast")]
        )
        terms = collect_action_terms(a)
        assert "quickly" in terms and "speed" in terms and "fast" in terms

    def test_numeric_param_value_not_registered_as_text(self):
        a = action(params=[kplib.ActionParam(name="count", value=3)])
        terms = collect_action_terms(a)
        assert "count" in terms and 3 not in terms and "3" not in terms

    def test_subject_facet_terms_appended(self):
        a = action(subject_entity_facet=kplib.Facet("mood", "happy"))
        assert collect_action_terms(a) == ["went", "mood", "happy"]


class TestCollectKnowledgeRefsAndTerms:
    def knowledge(self):
        return kplib.KnowledgeResponse(
            entities=[
                kplib.ConcreteEntity("", ["broken"]),  # invalid: skipped
                kplib.ConcreteEntity("Bach", ["person"]),
            ],
            actions=[action(verbs=["composed"], subject_entity_name="Bach")],
            inverse_actions=[action(verbs=["was composed by"])],
            topics=["baroque music"],
        )

    def test_ordinal_order_entities_actions_inverse_topics(self):
        refs, terms = collect_knowledge_refs_and_terms(10, 3, 1, self.knowledge())
        kinds = [r.knowledge.knowledge_type for r in refs]
        assert kinds == ["entity", "action", "action", "topic"]
        # Invalid entity consumed no ordinal.
        assert [r.semantic_ref_ordinal for r in refs] == [10, 11, 12, 13]

    def test_all_refs_share_the_chunk_point_range(self):
        refs, _ = collect_knowledge_refs_and_terms(0, 3, 1, self.knowledge())
        expected = TextRange(TextLocation(3, 1))
        assert all(r.range == expected for r in refs)

    def test_terms_map_to_owning_ordinals(self):
        refs, terms = collect_knowledge_refs_and_terms(0, 0, 0, self.knowledge())
        by_term = dict(terms)
        assert by_term["Bach"] in (0, 1)  # entity name; action subject also Bach
        assert by_term["composed"] == 1
        assert by_term["was composed by"] == 2
        assert by_term["baroque music"] == 3
        # Every emitted ordinal corresponds to an emitted ref.
        assert {o for _, o in terms} <= {r.semantic_ref_ordinal for r in refs}

    def test_invalid_entity_registers_no_terms(self):
        _, terms = collect_knowledge_refs_and_terms(0, 0, 0, self.knowledge())
        assert all(t != "broken" for t, _ in terms)
