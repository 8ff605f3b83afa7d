"""Device query executor: flat term groups as one compiled XLA program.

The host query VM (`knowpro/query.py`) evaluates expression trees with
per-term dict lookups — exact, general, but serial. This executor handles the
dominant fast path — a flat "or"/"or_max" group of SearchTerms and
PropertySearchTerms (what `filter.search_terms` queries and scope selectors
compile to) — as ONE fused device program over CSR postings:

    term-id gather -> scope mask -> exact/related accumulation -> smoothing
    -> knowledge-type grouping -> top-k

Semantics tie out with the host VM (tested in tests/test_device_executor.py);
anything it can't express (nested groups, "and", facet-name search terms,
wildcards) returns None so callers fall back to the VM.
"""

from __future__ import annotations

import numpy as np

from ..ops.postings import DevicePostingsIndex
from .collections import TextRangesInScope
from .common import is_search_term_wildcard
from .interfaces import (
    IConversation,
    KnowledgeType,
    PropertySearchTerm,
    ScoredSemanticRefOrdinal,
    SearchTerm,
    SearchTermGroup,
    SemanticRefSearchResult,
)
from .propindex import make_property_term_text

_KTYPE_CODES: dict[KnowledgeType, int] = {
    "entity": 0,
    "action": 1,
    "topic": 2,
    "tag": 3,
}
_PROP_PREFIX = "prop!"  # namespace separating property keys from plain terms


class DeviceQueryExecutor:
    """Device CSR postings over a conversation's semref + property indexes."""

    def __init__(self, conversation: IConversation):
        self.conversation = conversation
        self._postings = DevicePostingsIndex()
        self._n_semrefs = 0
        self._semref_msg: np.ndarray | None = None  # start message per semref
        self._semref_ktype: np.ndarray | None = None

    async def sync(self) -> None:
        """(Re)build device postings from the storage indexes.

        After the first full build, subsequent syncs are incremental: new
        semrefs' terms/properties are derived from their knowledge with the
        same collectors the storage indexers use (`semrefindex.collect_*`,
        `propindex.collect_semref_properties`), so the device postings never
        rescan the full term index.
        """
        conv = self.conversation
        if self._n_semrefs:
            n = await conv.semantic_refs.size()
            if n == self._n_semrefs:
                return
            if n > self._n_semrefs:
                await self._sync_incremental(self._n_semrefs, n)
                return
            # Shrunk (cleared/reloaded conversation): fall through to rebuild.
        self._postings = DevicePostingsIndex()

        index_data = await conv.semantic_ref_index.serialize()
        for item in index_data["items"]:
            term = item["term"]
            for posting in item["semanticRefOrdinals"]:
                self._postings.add_term(
                    term, posting["semanticRefOrdinal"], posting["score"]
                )

        secondary = conv.secondary_indexes
        prop_index = secondary.property_to_semantic_ref_index if secondary else None
        if prop_index is not None and hasattr(prop_index, "all_postings"):
            for key, semref, score in await prop_index.all_postings():
                self._postings.add_term(_PROP_PREFIX + key, semref, score)

        n = await conv.semantic_refs.size()
        self._n_semrefs = n
        if n:
            metadata = await conv.semantic_refs.get_metadata_multiple(list(range(n)))
            self._semref_msg = np.array(
                [m.range.start.message_ordinal for m in metadata], dtype=np.int32
            )
            self._semref_ktype = np.array(
                [_KTYPE_CODES[m.knowledge_type] for m in metadata], dtype=np.int8
            )
            self._semref_meta = metadata
        self._postings.build()

    async def _sync_incremental(self, start: int, n: int) -> None:
        """Fold semrefs [start, n) into the existing postings (no rescan).

        Term/property derivation mirrors the storage indexers exactly:
        `semrefindex.collect_entity_terms`/`collect_action_terms` (topics and
        tags index their text), lowercased as both index backends do, and
        `propindex.collect_semref_properties` with the shared
        'prop.{name}@@{value}' lowercase key form.
        """
        from .kplib import Action, ConcreteEntity
        from .propindex import collect_semref_properties
        from .semrefindex import collect_action_terms, collect_entity_terms

        conv = self.conversation
        new_refs = await conv.semantic_refs.get_slice(start, n)
        for ref in new_refs:
            knowledge = ref.knowledge
            ordinal = ref.semantic_ref_ordinal
            if isinstance(knowledge, ConcreteEntity):
                terms = collect_entity_terms(knowledge)
            elif isinstance(knowledge, Action):
                terms = collect_action_terms(knowledge)
            else:  # Topic / Tag index their text
                terms = [knowledge.text]
            for term in terms:
                self._postings.add_term(term.lower(), ordinal)
            for name, value, _ in collect_semref_properties(knowledge, ordinal):
                key = make_property_term_text(name, value).lower()
                self._postings.add_term(_PROP_PREFIX + key, ordinal)

        metadata = await conv.semantic_refs.get_metadata_multiple(
            list(range(start, n))
        )
        new_msg = np.array(
            [m.range.start.message_ordinal for m in metadata], dtype=np.int32
        )
        new_ktype = np.array(
            [_KTYPE_CODES[m.knowledge_type] for m in metadata], dtype=np.int8
        )
        if self._semref_msg is None:
            self._semref_msg, self._semref_ktype = new_msg, new_ktype
            self._semref_meta = list(metadata)
        else:
            self._semref_msg = np.concatenate([self._semref_msg, new_msg])
            self._semref_ktype = np.concatenate([self._semref_ktype, new_ktype])
            self._semref_meta = list(self._semref_meta) + list(metadata)
        self._n_semrefs = n
        self._postings.build()

    # -- query compilation -----------------------------------------------------

    def _compile_flat_terms(
        self, group: SearchTermGroup
    ) -> list[tuple[str, float, bool, str]] | None:
        """Flatten a group into (key, weight, exact, match_text) or None.

        Related-term parity guard: the host VM applies the
        add_term_matches_if_new rule per SUB-EXPRESSION accumulator, but this
        fused program uses one accumulator for the whole group — the two
        diverge when related terms collide with other subterms' matches on
        the same semref. Exact only when related terms are confined to a
        single subterm carrying at most one of them, so anything broader
        falls back to the host VM.
        """
        subterms_with_related = 0
        max_related_per_subterm = 0
        for term in group.terms:
            related = getattr(term, "related_terms", None)
            if isinstance(term, PropertySearchTerm):
                related = term.property_value.related_terms
            if related:
                subterms_with_related += 1
                max_related_per_subterm = max(max_related_per_subterm, len(related))
        if subterms_with_related and (
            len(group.terms) > 1 or max_related_per_subterm > 1
        ):
            return None

        compiled: list[tuple[str, float, bool, str]] = []
        for term in group.terms:
            if isinstance(term, SearchTermGroup):
                return None  # nested groups -> host VM
            if isinstance(term, PropertySearchTerm):
                if not isinstance(term.property_name, str):
                    return None  # facet-style free property names -> host VM
                value = term.property_value
                if is_search_term_wildcard(value):
                    return None
                weight = value.term.weight if value.term.weight is not None else 1.0
                compiled.append(
                    (
                        _PROP_PREFIX
                        + make_property_term_text(
                            term.property_name, value.term.text
                        ),
                        weight,
                        True,
                        value.term.text,
                    )
                )
                for related in value.related_terms or []:
                    compiled.append(
                        (
                            _PROP_PREFIX
                            + make_property_term_text(
                                term.property_name, related.text
                            ),
                            related.weight if related.weight is not None else 1.0,
                            False,
                            value.term.text,
                        )
                    )
            elif isinstance(term, SearchTerm):
                if is_search_term_wildcard(term):
                    return None
                weight = term.term.weight if term.term.weight is not None else 1.0
                compiled.append((term.term.text, weight, True, term.term.text))
                for related in term.related_terms or []:
                    compiled.append(
                        (
                            related.text,
                            related.weight if related.weight is not None else 1.0,
                            False,
                            term.term.text,
                        )
                    )
            else:
                return None
        # Duplicate keys: the host VM matches each distinct term text once
        # (context.matched_terms); a fused double-add would double-count.
        keys = [key for key, _, _, _ in compiled]
        if len(set(keys)) != len(keys):
            return None
        return compiled

    def _scope_mask(
        self, ranges_in_scope: TextRangesInScope | None
    ) -> np.ndarray | None:
        """Message-granularity scope mask over semref ordinals."""
        if ranges_in_scope is None or not ranges_in_scope.text_ranges:
            return None
        mask = np.ones(self._n_semrefs, dtype=bool)
        for i, meta in enumerate(self._semref_meta):
            mask[i] = ranges_in_scope.is_range_in_scope(meta.range)
        return mask

    async def search(
        self,
        group: SearchTermGroup,
        ranges_in_scope: TextRangesInScope | None = None,
        max_knowledge_matches: int | None = None,
    ) -> dict[KnowledgeType, SemanticRefSearchResult] | None:
        """Run a flat or/or_max group; None = not expressible here."""
        if group.boolean_op not in ("or", "or_max"):
            return None
        compiled = self._compile_flat_terms(group)
        if compiled is None or self._n_semrefs == 0:
            return None

        terms = [(key, weight, exact) for key, weight, exact, _ in compiled]
        scope = self._scope_mask(ranges_in_scope)
        total, exact_hits, related_hits = self._postings.lookup_terms(terms, scope)

        hits = exact_hits + related_hits
        matched = np.flatnonzero((hits > 0) & (np.abs(total) > 0))
        if matched.size == 0:
            return {}
        if group.boolean_op == "or_max":
            max_hits = exact_hits[matched].max(initial=0.0)
            if max_hits > 1:
                matched = matched[exact_hits[matched] == max_hits]

        term_texts = {
            match_text
            for (key, _, exact, match_text) in compiled
            if exact and self._postings._interner.lookup(key) >= 0
        }

        results: dict[KnowledgeType, SemanticRefSearchResult] = {}
        for ktype, code in _KTYPE_CODES.items():
            members = matched[self._semref_ktype[matched] == code]
            if members.size == 0:
                continue
            order = members[np.argsort(-total[members], kind="stable")]
            if max_knowledge_matches:
                order = order[:max_knowledge_matches]
            results[ktype] = SemanticRefSearchResult(
                term_matches=set(term_texts),
                semantic_ref_matches=[
                    ScoredSemanticRefOrdinal(int(o), float(total[o])) for o in order
                ],
            )
        return results
