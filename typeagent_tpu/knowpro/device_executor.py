"""Device query executor: compiled query trees as one fused XLA program.

The host query VM (`knowpro/query.py`) evaluates expression trees with
per-term dict lookups — exact, general, but serial. This executor evaluates
the SAME stage-3 compiled tree (`search.py:QueryCompiler`) against device CSR
postings: every leaf sub-expression's term/related/property lookups run as
ONE fused scatter program (`ops/postings.py:accumulate_postings_segmented`),
and the boolean tree combines the per-leaf raw accumulators with vectorized
numpy that replicates ``MatchAccumulator`` semantics bit-for-bit:

  * per-leaf exact/related bookkeeping incl. ``add_term_matches_if_new``
    first-adder masking (reference query.py:446-489, collections.py:73-106);
  * ``or`` union-sum + log-smoothing fold, ``or_max`` peak-hit filter,
    ``and`` member intersection + hit-count >= N (reference query.py:332-398);
  * the x10 entity boost via device membership masks over the name/type
    property postings (reference search.py boost_entities);
  * chunk-granular scope masks from ``TextRangesInScope`` built with a
    sorted-interval prefix-max sweep (reference collections.py:528-562);
  * tag/topic knowledge-type-gated lookups and ``*`` wildcard scans
    (reference query.py:612-649).

Anything the tree can contain that isn't expressible here (custom boosters,
unknown expression types, data-dependent AND-early-break dedupe hazards)
returns None so callers fall back to the host VM; a differential test suite
(tests/test_device_executor.py, tests/test_device_vm_differential.py) pins
device == VM over randomized compiled queries.
"""

from __future__ import annotations

import asyncio
import os
from dataclasses import dataclass, field

import numpy as np

from ..ops.postings import (
    OP_BOOST,
    OP_EXACT,
    OP_RELATED,
    DevicePostingsIndex,
    _SEG_BUCKETS,
    _bucket,
)
from ..storage.sqlite.indexes import prepare_term
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
    Term,
    TextRange,
)
from .propindex import PropertyNames, make_property_term_text
from .query import (
    GetScopeExpr,
    GroupByKnowledgeTypeExpr,
    GroupSearchResultsExpr,
    KnowledgeTypePredicate,
    MatchMessagesAndExpr,
    MatchMessagesBooleanExpr,
    MatchMessagesOrExpr,
    MatchMessagesOrMaxExpr,
    MatchPropertySearchTermExpr,
    MatchSearchTermExpr,
    MatchTagExpr,
    MatchTermsAndExpr,
    MatchTermsBooleanExpr,
    MatchTermsOrExpr,
    MatchTermsOrMaxExpr,
    MatchTopicExpr,
    QueryEvalContext,
    SelectTopNKnowledgeGroupExpr,
    TextRangesFromMessagesSelector,
    WhereSemanticRefExpr,
    text_ranges_from_message_ordinals,
)

_KTYPE_CODES: dict[KnowledgeType, int] = {
    "entity": 0,
    "action": 1,
    "topic": 2,
    "tag": 3,
}
_PROP_PREFIX = "prop!"  # namespace separating property keys from plain terms

# (msg, chunk) -> sortable int64 key; chunk ordinals stay far below this.
_CHUNK_SHIFT = 21
_CHUNK_BASE = 1 << _CHUNK_SHIFT

# Transfer gate: per-segment dense output is 4 x [n_seg_pad, semref_cap] f32;
# past this many entries the host VM is the better engine.
_MAX_DENSE_ENTRIES = 4 * 1024 * 1024
# The sparse (union-combine) route never transfers nor host-materializes the
# dense arrays, so many more queries pack into one device call — each call
# is a network round trip on tunneled devices. Bounds device HBM use only.
_MAX_SPARSE_ENTRIES = 32 * 1024 * 1024
# Gather gate: the scatter program materializes ~6 intermediates of
# [t_pad, window] (window = longest queried posting list, bucketed); past
# this many elements per intermediate, fall back rather than risk OOM.
_MAX_GATHER_ELEMENTS = 16 * 1024 * 1024


def _loc_key(message_ordinal: int, chunk_ordinal: int) -> int:
    return message_ordinal * _CHUNK_BASE + chunk_ordinal


def _range_keys(r: TextRange) -> tuple[int, int]:
    """(start key, effective-exclusive-end key) per TextRange._key()."""
    start = _loc_key(r.start.message_ordinal, r.start.chunk_ordinal)
    if r.end is not None:
        end = _loc_key(r.end.message_ordinal, r.end.chunk_ordinal)
    else:
        end = start + 1
    return start, end


def _smooth_vec(score: np.ndarray, hits: np.ndarray) -> np.ndarray:
    """Vectorized get_smooth_score: 0 hits -> 0, 1 hit -> score,
    else log(hits+1) * score / hits (collections.py:52-61)."""
    out = np.zeros_like(score)
    one = hits == 1
    out[one] = score[one]
    many = hits > 1
    if many.any():
        h = hits[many]
        out[many] = np.log(h + 1.0) * score[many] / h
    return out


# ---------------------------------------------------------------------------
# Compiled plan
# ---------------------------------------------------------------------------


@dataclass
class _Op:
    key: str
    weight: float
    kind: int  # OP_EXACT / OP_RELATED
    position: int  # VM execution order within the leaf (first-adder rule)
    ktype_gate: int  # -1 or knowledge-type code (tag/topic lookups)
    match_text: str  # text recorded in term_matches when this op "hits"
    # True: text contributes iff the op had in-scope postings (property
    # semantics, propindex.py:156-166). False: iff the key has any postings
    # at all (plain-term semantics — lookup_term returns None pre-filter,
    # query.py:160-192 + storage lookup conventions).
    text_needs_scope_hit: bool


@dataclass
class _Leaf:
    seg: int
    ops: list[_Op] = field(default_factory=list)
    # (ktype code, weight, text) '*' scans — evaluated host-side, no scope
    # (reference lookup_knowledge_type ignores ranges, query.py:195-202).
    wildcards: list[tuple[int, float, str]] = field(default_factory=list)
    boost_keys: list[str] = field(default_factory=list)
    boost_factor: float = 1.0


@dataclass
class _GroupNode:
    op: str  # "and" | "or" | "or_max"
    children: list["_GroupNode | _Leaf"] = field(default_factory=list)


@dataclass
class _NodeResult:
    member: np.ndarray  # bool [n]
    score: np.ndarray  # f32 [n] exact score (+ folded smoothing at groups)
    hits: np.ndarray  # f32 [n] exact hit counts
    rel_score: np.ndarray
    rel_hits: np.ndarray
    texts: set[str]
    # Member ordinals in the VM accumulator's dict-insertion order: the
    # reference's downstream stages are order-sensitive (MessageAccumulator
    # max-merge hit bumps, tie ordering, ktype dict order), so the device
    # result must reproduce it, not just the score map.
    order: np.ndarray


def _first_occurrence(cat: np.ndarray) -> np.ndarray:
    """Order-preserving dedupe (first occurrence wins)."""
    if cat.size == 0:
        return cat
    _, first_idx = np.unique(cat, return_index=True)
    return cat[np.sort(first_idx)]


class _Unsupported(Exception):
    """Internal: tree contains something the device engine can't express."""


@dataclass
class _Plan:
    """One compiled query's share of a batched device call."""

    index: int  # position in the caller's query list
    root: _GroupNode
    leaves: list[_Leaf]
    top_n: int | None
    min_hit: int | None
    ktype_predicates: list[KnowledgeType]
    scope: np.ndarray | None  # host bool mask over semrefs (None = all)
    seg_base: int = 0  # assigned when packed into a device call
    op_start: int = 0
    op_stop: int = 0

    def boost_factor(self) -> float | None:
        for leaf in self.leaves:
            if leaf.boost_keys:
                return leaf.boost_factor
        return None


class DeviceQueryExecutor:
    """Device CSR postings over a conversation's semref + property indexes."""

    def __init__(self, conversation: IConversation):
        self.conversation = conversation
        self._postings = DevicePostingsIndex()
        # Data-parallel mesh for batched plan groups: postings replicate,
        # each dp rank evaluates a contiguous segment range of the batch
        # (ops/postings.py lookup_ops_sparse_dp). Opt-in per conversation.
        self.mesh = getattr(conversation, "_device_mesh", None)
        self._n_semrefs = 0
        self._semref_ktype: np.ndarray | None = None  # i8 codes
        self._sem_start_key: np.ndarray | None = None  # i64 (msg, chunk) keys
        self._sem_end_key: np.ndarray | None = None

    # -- index sync -------------------------------------------------------------

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
            self._set_metadata_arrays(metadata, append=False)
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
        self._set_metadata_arrays(metadata, append=self._sem_start_key is not None)
        self._n_semrefs = n
        self._postings.build()

    def _set_metadata_arrays(self, metadata, append: bool) -> None:
        ktype = np.array(
            [_KTYPE_CODES[m.knowledge_type] for m in metadata], dtype=np.int8
        )
        start_keys = np.empty(len(metadata), dtype=np.int64)
        end_keys = np.empty(len(metadata), dtype=np.int64)
        for i, m in enumerate(metadata):
            start_keys[i], end_keys[i] = _range_keys(m.range)
        if append:
            self._semref_ktype = np.concatenate([self._semref_ktype, ktype])
            self._sem_start_key = np.concatenate([self._sem_start_key, start_keys])
            self._sem_end_key = np.concatenate([self._sem_end_key, end_keys])
        else:
            self._semref_ktype = ktype
            self._sem_start_key = start_keys
            self._sem_end_key = end_keys

    # -- scope mask ----------------------------------------------------------

    def _scope_mask(
        self, ranges_in_scope: TextRangesInScope | None
    ) -> np.ndarray | None:
        """Chunk-granular scope mask over semref ordinals.

        Replicates TextRangesInScope.is_range_in_scope (every selector
        collection must contain the semref's range) with one vectorized
        sorted-interval sweep per selector: a range [s, e) is contained in
        some collection range iff max{outer_end : outer_start <= s} >= e.
        """
        if ranges_in_scope is None or not ranges_in_scope.text_ranges:
            return None
        mask = np.ones(self._n_semrefs, dtype=bool)
        s_keys, e_keys = self._sem_start_key, self._sem_end_key
        for collection in ranges_in_scope.text_ranges:
            ranges = collection.get_ranges()
            if not ranges:
                mask[:] = False
                continue
            pairs = np.array([_range_keys(r) for r in ranges], dtype=np.int64)
            order = np.argsort(pairs[:, 0], kind="stable")
            starts = pairs[order, 0]
            ends_prefix_max = np.maximum.accumulate(pairs[order, 1])
            idx = np.searchsorted(starts, s_keys, side="right")
            ok = idx > 0
            ok[ok] = ends_prefix_max[idx[ok] - 1] >= e_keys[ok]
            mask &= ok
        return mask

    # -- plan compilation -----------------------------------------------------

    def _norm_key(self, text: str) -> str:
        """Index-normalized interner key for a query text.

        Memory indexes lowercase; SQLite additionally strips/NFC-normalizes/
        collapses whitespace. Try the cheap form first, then the full
        normalization if the interner only knows the prepared form.
        """
        key = text.lower()
        if self._postings.lookup(key) >= 0:
            return key
        prepared = prepare_term(text)
        if prepared != key and self._postings.lookup(prepared) >= 0:
            return prepared
        return key

    def _prop_key(self, name: str, value_text: str) -> str:
        key = (_PROP_PREFIX + make_property_term_text(name, value_text)).lower()
        if self._postings.lookup(key) >= 0:
            return key
        prepared = _PROP_PREFIX + make_property_term_text(
            name, prepare_term(value_text)
        ).lower()
        if prepared != key and self._postings.lookup(prepared) >= 0:
            return prepared
        return key

    def _compile_tree(self, expr: MatchTermsBooleanExpr) -> tuple[
        _GroupNode, list[_Leaf]
    ]:
        """Compile the boolean tree to leaves + group nodes, simulating the
        VM's matched_terms / matched_property_terms dedupe in execution
        order (cleared at every group begin, query.py begin_match)."""
        leaves: list[_Leaf] = []
        # The VM dedupe state (context.matched_terms / matched_property_terms)
        # simulated in execution order. Entries: ("t", text) for plain terms,
        # ("p", name, text) for property pairs.
        seen: set[tuple] = set()
        # Entries whose presence in `seen` is data-dependent: an AND group
        # stops evaluating children at the first empty one, so everything an
        # AND subtree adds is uncertain for LATER siblings (until the next
        # group-begin clears the live set). If a later leaf's dedupe would
        # consult an uncertain entry, results could diverge -> host VM.
        uncertain: set[tuple] = set()
        added_stack: list[set[tuple]] = []
        boost_factors: list[float] = []

        def mark_seen(entry: tuple) -> None:
            seen.add(entry)
            for recorder in added_stack:
                recorder.add(entry)

        def clear_seen() -> None:
            seen.clear()
            uncertain.clear()

        def group_op(e: MatchTermsBooleanExpr) -> str:
            # Subclass order matters: OrMax < Or.
            if isinstance(e, MatchTermsAndExpr):
                return "and"
            if isinstance(e, MatchTermsOrMaxExpr):
                return "or_max"
            if isinstance(e, MatchTermsOrExpr):
                return "or"
            raise _Unsupported

        def leaf_footprint(child) -> set[tuple]:
            """Every seen-set entry this leaf would consult or add."""
            entries: set[tuple] = set()
            if isinstance(child, (MatchTagExpr, MatchTopicExpr)) or isinstance(
                child, MatchSearchTermExpr
            ):
                st = child.search_term
                entries.add(("t", st.term.text))
                for related in st.related_terms or ():
                    entries.add(("t", related.text))
            elif isinstance(child, MatchPropertySearchTermExpr):
                pst = child.property_search_term
                halves = []
                if isinstance(pst.property_name, str):
                    halves.append((pst.property_name, pst.property_value))
                else:
                    halves.append(
                        (PropertyNames.FacetName.value, pst.property_name)
                    )
                    if not is_search_term_wildcard(pst.property_value):
                        halves.append(
                            (PropertyNames.FacetValue.value, pst.property_value)
                        )
                for name, value in halves:
                    entries.add(("p", name, value.term.text))
                    for related in value.related_terms or ():
                        entries.add(("p", name, related.text))
            return entries

        def compile_group(e: MatchTermsBooleanExpr, top: bool) -> _GroupNode:
            if not top and e.get_scope_expr is not None:
                raise _Unsupported  # nested scopes -> host VM
            clear_seen()
            node = _GroupNode(group_op(e))
            recorder: set[tuple] = set()
            if node.op == "and":
                added_stack.append(recorder)
            for child in e.term_expressions:
                if isinstance(child, MatchTermsBooleanExpr):
                    node.children.append(compile_group(child, top=False))
                    continue
                if leaf_footprint(child) & uncertain:
                    raise _Unsupported  # data-dependent dedupe -> host VM
                leaf = compile_leaf(child)
                if leaf is not None:
                    node.children.append(leaf)
                else:
                    # Fully deduped leaf: the VM evaluates it to an empty
                    # accumulator (falsy) -> parent skips it; drop entirely
                    # UNLESS inside an AND, where an empty child fails the
                    # whole AND.
                    if node.op == "and":
                        node.children.append(_Leaf(seg=-1))  # always-empty
            if node.op == "and":
                added_stack.pop()
                uncertain.update(recorder)
            return node

        def new_leaf() -> _Leaf:
            leaf = _Leaf(seg=len(leaves))
            leaves.append(leaf)
            return leaf

        def add_plain_ops(
            leaf: _Leaf,
            search_term: SearchTerm,
            ktype_gate: int,
        ) -> None:
            pos = len(leaf.ops) + len(leaf.wildcards)
            main = search_term.term
            main_weight = main.weight if main.weight is not None else 1.0
            if ("t", main.text) not in seen:
                leaf.ops.append(
                    _Op(
                        key=self._norm_key(main.text),
                        weight=main_weight,
                        kind=OP_EXACT,
                        position=pos,
                        ktype_gate=ktype_gate,
                        match_text=main.text,
                        text_needs_scope_hit=False,
                    )
                )
                pos += 1
                mark_seen(("t", main.text))
            for related in search_term.related_terms or ():
                if ("t", related.text) in seen:
                    continue
                weight = (
                    related.weight if related.weight is not None else main_weight
                )
                leaf.ops.append(
                    _Op(
                        key=self._norm_key(related.text),
                        weight=weight,
                        kind=OP_RELATED,
                        position=pos,
                        ktype_gate=ktype_gate,
                        match_text=main.text,
                        text_needs_scope_hit=False,
                    )
                )
                pos += 1
                mark_seen(("t", related.text))

        def add_property_ops(
            leaf: _Leaf, name: str, value: SearchTerm
        ) -> None:
            pos = len(leaf.ops) + len(leaf.wildcards)
            main = value.term
            main_weight = main.weight if main.weight is not None else 1.0
            if ("p", name, main.text) not in seen:
                leaf.ops.append(
                    _Op(
                        key=self._prop_key(name, main.text),
                        weight=main_weight,
                        kind=OP_EXACT,
                        position=pos,
                        ktype_gate=-1,
                        match_text=main.text,
                        text_needs_scope_hit=True,
                    )
                )
                pos += 1
                mark_seen(("p", name, main.text))
            for related in value.related_terms or ():
                if ("p", name, related.text) in seen:
                    continue
                weight = (
                    related.weight if related.weight is not None else main_weight
                )
                leaf.ops.append(
                    _Op(
                        key=self._prop_key(name, related.text),
                        weight=weight,
                        kind=OP_RELATED,
                        position=pos,
                        ktype_gate=-1,
                        match_text=main.text,
                        text_needs_scope_hit=True,
                    )
                )
                pos += 1
                mark_seen(("p", name, related.text))

        def compile_leaf(child) -> _Leaf | None:
            # Tag/Topic subclass MatchSearchTermExpr: dispatch them first.
            if isinstance(child, (MatchTagExpr, MatchTopicExpr)):
                code = _KTYPE_CODES[
                    "tag" if isinstance(child, MatchTagExpr) else "topic"
                ]
                st = child.search_term
                if st.term.text == "*":
                    if st.related_terms:
                        raise _Unsupported  # '*' main reroutes related lookups
                    if ("t", st.term.text) in seen:
                        return None
                    mark_seen(("t", st.term.text))
                    leaf = new_leaf()
                    w = st.term.weight if st.term.weight is not None else 1.0
                    leaf.wildcards.append((code, w, st.term.text))
                    return leaf
                leaf = new_leaf()
                add_plain_ops(leaf, st, ktype_gate=code)
                return leaf if (leaf.ops or leaf.wildcards) else _drop(leaf)
            if isinstance(child, MatchSearchTermExpr):
                factor = getattr(child, "entity_boost_factor", None)
                if child.score_booster is not None and factor is None:
                    raise _Unsupported  # custom booster -> host VM
                st = child.search_term
                if is_search_term_wildcard(st):
                    # The VM looks up the literal '*' text for plain terms;
                    # compile it the same way (typically no postings).
                    pass
                leaf = new_leaf()
                add_plain_ops(leaf, st, ktype_gate=-1)
                if not leaf.ops:
                    return _drop(leaf)
                if factor is not None:
                    # One fused call applies a single boost multiplier;
                    # mixed per-leaf factors can't be expressed.
                    if boost_factors and float(factor) != boost_factors[0]:
                        raise _Unsupported
                    boost_factors.append(float(factor))
                    leaf.boost_factor = float(factor)
                    texts = [st.term.text] + [
                        r.text for r in st.related_terms or ()
                    ]
                    for text in texts:
                        leaf.boost_keys.append(
                            self._prop_key(PropertyNames.EntityName.value, text)
                        )
                        leaf.boost_keys.append(
                            self._prop_key(PropertyNames.EntityType.value, text)
                        )
                return leaf
            if isinstance(child, MatchPropertySearchTermExpr):
                pst = child.property_search_term
                leaf = new_leaf()
                if isinstance(pst.property_name, str):
                    add_property_ops(leaf, pst.property_name, pst.property_value)
                else:
                    # Facet-style: name matches facet.name; a non-wildcard
                    # value must also match facet.value (query.py:517-532).
                    add_property_ops(
                        leaf, PropertyNames.FacetName.value, pst.property_name
                    )
                    if not is_search_term_wildcard(pst.property_value):
                        add_property_ops(
                            leaf,
                            PropertyNames.FacetValue.value,
                            pst.property_value,
                        )
                return leaf if leaf.ops else _drop(leaf)
            raise _Unsupported

        def _drop(leaf: _Leaf) -> None:
            assert leaves[-1] is leaf
            leaves.pop()
            return None

        root = compile_group(expr, top=True)
        return root, leaves

    # -- execution -------------------------------------------------------------

    async def execute(
        self,
        query: GroupSearchResultsExpr,
        context: QueryEvalContext,
    ) -> dict[KnowledgeType, SemanticRefSearchResult] | None:
        """Evaluate a stage-3 compiled knowledge query; None = fall back.

        Accepts the GroupSearchResultsExpr produced by
        QueryCompiler.compile_knowledge_query (or any of its inner wrappers).
        """
        return (await self.execute_batch([query], context))[0]

    async def execute_batch(
        self,
        queries: list[GroupSearchResultsExpr],
        context: QueryEvalContext,
    ) -> list[dict[KnowledgeType, SemanticRefSearchResult] | None]:
        """Evaluate MANY compiled knowledge queries in fused device calls.

        All expressible queries' lookup ops batch into one segmented device
        program (per-op scope rows keep each query's when-filter separate);
        the host combine then runs per query. Queries the engine can't
        express return None at their position (callers fall back per query).
        This is the TPU-first batch path the reference has no analogue for —
        its VM evaluates queries strictly one at a time.
        """
        results: list[dict | None] = [None] * len(queries)
        unwrapped_by_index: dict[int, tuple] = {}
        scope_items: list[tuple[int, GetScopeExpr]] = []
        for i, query in enumerate(queries):
            unwrapped = self._unwrap(query)
            if unwrapped is None:
                continue
            if self._n_semrefs == 0:
                results[i] = {}
                continue
            unwrapped_by_index[i] = unwrapped
            expr = unwrapped[0]
            if expr.get_scope_expr is not None:
                scope_items.append((i, expr.get_scope_expr))

        # Scope selectors evaluate exactly as begin_match would; the
        # message-derived selectors (action scopes) run their term
        # sub-queries on the device when expressible — BATCHED across
        # queries (each sub-query as its own device call costs a full
        # round trip on tunneled devices).
        scopes = await self._batch_eval_scopes(scope_items, context)

        plans: list[_Plan] = []
        for i, (expr, top_n, min_hit, preds) in unwrapped_by_index.items():
            try:
                root, leaves = self._compile_tree(expr)
            except _Unsupported:
                continue
            plans.append(
                _Plan(
                    index=i,
                    root=root,
                    leaves=leaves,
                    top_n=top_n,
                    min_hit=min_hit,
                    ktype_predicates=preds,
                    scope=self._scope_mask(scopes.get(i)),
                )
            )
        groups = self._group_plans(plans)
        if len(groups) > 1 and os.environ.get("TAT_GROUP_THREADS", "0") == "1":
            # Optional (TAT_GROUP_THREADS=1): run the groups on threads so
            # their device round trips overlap. Measured OFF-by-default: an
            # interleaved ABBA on a tunnel-attached v5e (100k semrefs,
            # batch 16, 6 pairs) put threads at 50.8 vs 44.1 ms/query mean
            # — concurrent dispatches through the tunnel contend rather
            # than overlap. The knob stays for locally-attached topologies.
            # (Dispatches/fetches are thread-safe; the postings index is
            # built once here; per-group combines are pure numpy over their
            # own plans. Results land in distinct ``results`` slots.)
            if not self._postings._built:
                self._postings.build()
            loop = asyncio.get_running_loop()
            outs = await asyncio.gather(
                *[
                    loop.run_in_executor(None, self._run_plan_group, g)
                    for g in groups
                ]
            )
        else:
            # Groups run SEQUENTIALLY (one device dispatch in flight — see
            # the knob comment above) but OFF the event loop: a plan
            # group's device fetch blocks for a full round trip, and on a
            # loaded server the loop must keep running other pipelines'
            # host work (stage-2 compiles, VM fallbacks, answer contexts)
            # meanwhile. Postings build on the loop thread first
            # (idempotent, not lock-guarded) — same pattern as
            # _execute_tree.
            if groups and not self._postings._built:
                self._postings.build()
            outs = [
                await asyncio.to_thread(self._run_plan_group, g) for g in groups
            ]
        for out in outs:
            for index, result in out.items():
                results[index] = result
        return results

    # -- scope sub-query evaluation ---------------------------------------------

    async def _eval_scope(
        self, scope_expr: GetScopeExpr, context: QueryEvalContext
    ) -> TextRangesInScope:
        """GetScopeExpr.eval with message-derived selectors device-routed.

        Scope needs only MEMBER SETS (TextRangesFromMessagesSelector reads
        ``get_matched_values``, never scores), so the action-scope term
        sub-queries reduce to set algebra over per-leaf semref members.
        Selectors the device can't express (or_max message groups, date
        ranges, threads, precomputed ranges) evaluate on the host as the VM
        would; results are identical either way.
        """
        scopes = await self._batch_eval_scopes([(0, scope_expr)], context)
        return scopes[0]

    async def _batch_eval_scopes(
        self, items: list[tuple[int, GetScopeExpr]], context: QueryEvalContext
    ) -> dict[int, TextRangesInScope]:
        """Evaluate many queries' GetScopeExprs with ONE fused device call.

        Every device-expressible message-derived selector across all
        queries contributes leaf segments to a single membership lookup
        (per-selector sub-queries each cost a network round trip on
        tunneled devices — measured as the dominant share of batched query
        time). Host-evaluated selectors (or_max message groups, date
        ranges, threads, precomputed ranges) run as the VM would.
        """
        from .collections import TextRangeCollection

        scopes: dict[int, TextRangesInScope] = {
            qi: TextRangesInScope() for qi, _ in items
        }
        device_jobs: list[tuple[int, "_GroupNode", list[_Leaf], list]] = []
        host_jobs: list[tuple[int, object]] = []
        for qi, scope_expr in items:
            for selector in scope_expr.range_selectors:
                compiled = None
                if isinstance(selector, TextRangesFromMessagesSelector):
                    compiled = self._compile_message_members(
                        selector.source_expr
                    )
                if compiled is not None:
                    device_jobs.append((qi, *compiled))
                else:
                    host_jobs.append((qi, selector))

        if device_jobs:
            for qi, ordinals in self._run_member_jobs(device_jobs):
                if ordinals.size == 0:
                    # VM: no matches -> empty collection (rejects all).
                    scopes[qi].add_text_ranges(TextRangeCollection(None))
                else:
                    scopes[qi].add_text_ranges(
                        TextRangeCollection(
                            text_ranges_from_message_ordinals(
                                [int(o) for o in ordinals]
                            )
                        )
                    )
        for qi, selector in host_jobs:
            collection = await selector.eval(context)
            if collection is not None:
                scopes[qi].add_text_ranges(collection)
        return scopes

    def _compile_message_members(self, expr):
        """Compile a MatchMessages* tree for device membership evaluation.

        Returns (root, leaves, ops) or None (inexpressible / over budget).
        The tree's leaves are the same term expressions the knowledge path
        compiles; message-level booleans reduce to set algebra because every
        member has hit_count >= 1 (AND's select_with_hit_count(n) always
        passes intersection members). or_max filters BY hit count, which is
        order-sensitive -> host fallback.
        """
        if not isinstance(expr, MatchMessagesBooleanExpr):
            return None

        def to_terms_tree(e):
            # Rebuild as a MatchTerms tree so _compile_tree walks it with
            # identical dedupe simulation; group boundaries are remembered
            # so the combine runs at MESSAGE level per boundary.
            if isinstance(e, MatchMessagesOrMaxExpr):
                raise _Unsupported  # hit-count peak filter is order-sensitive
            if isinstance(e, MatchMessagesAndExpr):
                ctor = MatchTermsAndExpr
            elif isinstance(e, MatchMessagesOrExpr):
                ctor = MatchTermsOrExpr
            else:
                raise _Unsupported
            children = [
                to_terms_tree(c) if isinstance(c, MatchMessagesBooleanExpr) else c
                for c in e.term_expressions
            ]
            return ctor(children, None)

        try:
            faux = to_terms_tree(expr)
            root, leaves = self._compile_tree(faux)
        except _Unsupported:
            return None
        n_seg = len(leaves)
        n_ops, window, _total = self._plan_cost(
            _Plan(0, root, leaves, None, None, [], None)
        )
        if (
            _bucket(max(n_seg, 1), _SEG_BUCKETS) * self._postings._semref_cap
            > _MAX_DENSE_ENTRIES
            or self._gather_elements(n_ops, window) > _MAX_GATHER_ELEMENTS
        ):
            return None
        ops = []
        for leaf in leaves:
            for op in leaf.ops:
                ops.append(
                    (
                        self._postings.lookup(op.key),
                        op.weight,
                        leaf.seg,  # rebased when jobs pack into one call
                        op.kind,
                        op.position,
                        op.ktype_gate,
                        0,
                    )
                )
            # boost ops don't affect membership: skipped entirely.
        return root, leaves, ops

    def _run_member_jobs(self, jobs):
        """Run compiled membership jobs in fused device calls.

        Yields (query_index, sorted message ordinals) per job. Jobs chunk
        under the sparse-entry budget; within a chunk every job's leaf
        segments rebase into one segment axis.
        """
        from ..ops import postings as _P

        cap = self._postings._semref_cap
        # When the sparse route is structurally unavailable (small
        # semref_cap) every chunk WILL run dense: pack under the dense
        # transfer budget, not the 8x larger sparse one.
        sparse_route = cap > _P._SPARSE_MIN_CAP
        entry_budget = _MAX_SPARSE_ENTRIES if sparse_route else _MAX_DENSE_ENTRIES
        chunk: list = []
        chunk_segs = 0
        for job in jobs:
            n_seg = max(len(job[2]), 1)
            fits = (
                _bucket(max(chunk_segs + n_seg, 1), _SEG_BUCKETS) * cap
                <= entry_budget
            )
            if chunk and not fits:
                yield from self._run_member_chunk(chunk)
                chunk, chunk_segs = [], 0
            chunk.append(job)
            chunk_segs += n_seg
        if chunk:
            yield from self._run_member_chunk(chunk)

    def _member_chunk_dense_ok(self, jobs) -> bool:
        """Does this chunk fit the DENSE budgets (entries + gather)?"""
        cap = self._postings._semref_cap
        segs = sum(max(len(job[2]), 1) for job in jobs)
        if _bucket(max(segs, 1), _SEG_BUCKETS) * cap > _MAX_DENSE_ENTRIES:
            return False
        n_ops = 0
        window = 1
        for job in jobs:
            for op in job[3]:
                n_ops += 1
                window = max(window, self._postings.posting_size(op[0]))
        return self._gather_elements(n_ops, window) <= _MAX_GATHER_ELEMENTS

    def _run_member_chunk(self, jobs):
        n = self._n_semrefs
        all_ops: list = []
        bases: list[int] = []
        base = 0
        for _qi, _root, leaves, ops in jobs:
            bases.append(base)
            all_ops.extend(
                (tid, w, base + seg, kind, pos, gate, scope_id)
                for tid, w, seg, kind, pos, gate, scope_id in ops
            )
            base += len(leaves)

        members_by_seg: list[np.ndarray]
        if all_ops and base:
            sparse = (
                self._postings.lookup_ops_sparse_dp(
                    all_ops, base, self._semref_ktype, None, 1.0,
                    mesh=self.mesh,
                )
                if self.mesh is not None
                else self._postings.lookup_ops_sparse(
                    all_ops, base, self._semref_ktype, None, 1.0
                )
            )
            if (
                sparse is None
                and len(jobs) > 1
                and not self._member_chunk_dense_ok(jobs)
            ):
                # Forced dense but packed under the sparse budget: split
                # until each piece fits the dense budgets (a single job
                # always does — _compile_members gates it at compile).
                mid = len(jobs) // 2
                yield from self._run_member_chunk(jobs[:mid])
                yield from self._run_member_chunk(jobs[mid:])
                return
            if sparse is not None:
                cols, _packed, counts, _oh = sparse
                members_by_seg = []
                for s in range(base):
                    m = np.zeros(n, dtype=bool)
                    m[cols[s, : counts[s]]] = True
                    members_by_seg.append(m)
            else:
                _, exact_hits, _, rel_hits, _ = self._postings.lookup_ops(
                    all_ops, base, self._semref_ktype, None, 1.0
                )
                members_by_seg = [
                    (exact_hits[s] > 0) | (rel_hits[s] > 0) for s in range(base)
                ]
        else:
            members_by_seg = [np.zeros(n, dtype=bool) for _ in range(max(base, 1))]

        for (qi, root, leaves, _ops), seg_base in zip(jobs, bases):
            yield qi, self._combine_message_members(
                root, members_by_seg, seg_base
            )

    def _combine_message_members(
        self, root, members_by_seg: list[np.ndarray], seg_base: int
    ) -> np.ndarray:
        """Boolean set algebra over per-leaf member masks -> message ordinals."""
        ktype = self._semref_ktype
        start_msgs = self._sem_start_key >> _CHUNK_SHIFT
        last_msgs = self._sem_end_key >> _CHUNK_SHIFT
        n_messages = int(last_msgs.max()) + 1 if last_msgs.size else 0

        def semrefs_to_messages(member: np.ndarray) -> np.ndarray:
            msg_mask = np.zeros(n_messages, dtype=bool)
            ords = np.flatnonzero(member)
            starts = start_msgs[ords]
            lasts = last_msgs[ords]
            single = starts == lasts
            msg_mask[starts[single]] = True
            for s, e in zip(starts[~single], lasts[~single]):
                msg_mask[s : e + 1] = True
            return msg_mask

        def eval_node(node) -> np.ndarray | None:
            """Message membership mask; None = empty accumulator (falsy)."""
            if isinstance(node, _Leaf):
                if node.seg < 0:
                    return None
                member = members_by_seg[seg_base + node.seg]
                for code, _w, _t in node.wildcards:
                    member = member | (ktype == code)
                if not member.any():
                    return None
                return semrefs_to_messages(member)
            children = [eval_node(c) for c in node.children]
            if node.op == "or":
                present = [c for c in children if c is not None]
                if not present:
                    return None
                out = present[0].copy()
                for c in present[1:]:
                    out |= c
                return out
            # AND: any empty child empties the whole conjunction (a
            # childless AND is empty too); every intersection member has
            # summed hit_count >= n, so the VM's final
            # select_with_hit_count(n) never removes anyone.
            if not children or any(c is None for c in children):
                return None
            out = children[0].copy()
            for c in children[1:]:
                out &= c
            return out if out.any() else None

        mask = eval_node(root)
        if mask is None:
            return np.empty(0, dtype=np.int64)
        return np.flatnonzero(mask).astype(np.int64)

    async def _execute_tree(
        self,
        expr: MatchTermsBooleanExpr,
        ranges_in_scope: TextRangesInScope | None,
        top_n: int | None,
        min_hit: int | None,
        ktype_predicates: list[KnowledgeType],
    ) -> dict[KnowledgeType, SemanticRefSearchResult] | None:
        """Single-query path over the batched machinery (precomputed scope)."""
        try:
            root, leaves = self._compile_tree(expr)
        except _Unsupported:
            return None
        plan = _Plan(
            index=0,
            root=root,
            leaves=leaves,
            top_n=top_n,
            min_hit=min_hit,
            ktype_predicates=ktype_predicates,
            scope=self._scope_mask(ranges_in_scope),
        )
        groups = self._group_plans([plan])
        if not groups:
            return None
        # Build postings on the loop thread (idempotent, not lock-guarded),
        # then run the fused device call off-loop: a single query behaves
        # identically, and N concurrent query() pipelines overlap their
        # device round trips instead of serializing on the event loop.
        if not self._postings._built:
            self._postings.build()
        out = await asyncio.to_thread(self._run_plan_group, groups[0])
        # .get: the runtime dense re-pack can drop a plan too large even
        # alone (COO run overflow + over-budget dense fallback) — that is
        # a host-VM-fallback signal, not a KeyError.
        return out.get(0)

    def _unwrap(self, query):
        top_n: int | None = None
        min_hit: int | None = None
        ktype_predicates: list[KnowledgeType] = []
        expr = query
        if isinstance(expr, GroupSearchResultsExpr):
            expr = expr.src_expr
        if isinstance(expr, SelectTopNKnowledgeGroupExpr):
            top_n = expr.max_matches
            min_hit = expr.min_hit_count
            expr = expr.source_expr
        if isinstance(expr, GroupByKnowledgeTypeExpr):
            expr = expr.matches
        if isinstance(expr, WhereSemanticRefExpr):
            for predicate in expr.predicates:
                if not isinstance(predicate, KnowledgeTypePredicate):
                    return None
                ktype_predicates.append(predicate.knowledge_type)
            expr = expr.source_expr
        if not isinstance(expr, MatchTermsBooleanExpr):
            return None
        return expr, top_n, min_hit, ktype_predicates

    def _plan_cost(self, plan: "_Plan") -> tuple[int, int, int]:
        """(op count, longest posting list, TOTAL postings).

        The dense gather gate pays ops x longest-list (uniform windows);
        the ragged COO route pays total postings."""
        n_ops = 0
        max_size = 1
        total = 0
        for leaf in plan.leaves:
            for op in leaf.ops:
                n_ops += 1
                size = self._postings.posting_size(self._postings.lookup(op.key))
                max_size = max(max_size, size)
                total += size
            for key in leaf.boost_keys:
                n_ops += 1
                size = self._postings.posting_size(self._postings.lookup(key))
                max_size = max(max_size, size)
                total += size
        return n_ops, max_size, total

    @staticmethod
    def _gather_elements(n_ops: int, window: int) -> int:
        from ..ops.postings import _TERM_BUCKETS, _WINDOW_BUCKETS

        return _bucket(max(n_ops, 1), _TERM_BUCKETS) * _bucket(
            window, _WINDOW_BUCKETS
        )

    def _sparse_capable(self, plan: "_Plan") -> bool:
        from ..ops import postings as _P

        return self._postings._semref_cap > _P._SPARSE_MIN_CAP and not any(
            leaf.wildcards for leaf in plan.leaves
        )

    def _group_plans(self, plans: list["_Plan"]) -> list[list["_Plan"]]:
        """Pack plans into device calls. Sparse-capable plans (union combine,
        no dense transfer) pack under the larger HBM-only budget — fewer
        device calls means fewer round trips; the rest use the dense-output
        budget. Order within each pool is preserved."""
        sparse_pool = [p for p in plans if self._sparse_capable(p)]
        dense_pool = [p for p in plans if not self._sparse_capable(p)]
        return self._pack_plans(sparse_pool, _MAX_SPARSE_ENTRIES, sparse=True) + (
            self._pack_plans(dense_pool, _MAX_DENSE_ENTRIES)
        )

    def _pack_plans(
        self, plans: list["_Plan"], entry_budget: int, sparse: bool = False
    ) -> list[list["_Plan"]]:
        """Pack plans into device calls under the given per-call entry and
        gather budgets; plans with conflicting boost factors split into
        separate calls; plans too large even alone are skipped (host VM).
        Sparse pools gate on TOTAL postings (the ragged COO sort size);
        dense pools gate on ops x longest-window."""
        from ..ops.postings import _COO_E_BUCKETS

        cap = self._postings._semref_cap
        groups: list[list[_Plan]] = []
        current: list[_Plan] = []
        current_segs = 0
        current_ops = 0
        current_window = 1
        current_total = 0
        current_factor: float | None = None

        def gather_ok(n_ops, window, total):
            if sparse:
                return total <= _COO_E_BUCKETS[-1]
            return self._gather_elements(n_ops, window) <= _MAX_GATHER_ELEMENTS

        for plan in plans:
            n_seg = len(plan.leaves)
            n_ops, window, total = self._plan_cost(plan)
            if (
                _bucket(max(n_seg, 1), _SEG_BUCKETS) * cap > entry_budget
                or not gather_ok(n_ops, window, total)
            ):
                continue  # too large even alone: host VM wins here
            factor = plan.boost_factor()
            compatible = (
                current_factor is None
                or factor is None
                or factor == current_factor
            )
            fits = (
                _bucket(max(current_segs + n_seg, 1), _SEG_BUCKETS) * cap
                <= entry_budget
            ) and gather_ok(
                current_ops + n_ops,
                max(current_window, window),
                current_total + total,
            )
            if current and not (compatible and fits):
                groups.append(current)
                current, current_segs = [], 0
                current_ops, current_window, current_factor = 0, 1, None
                current_total = 0
            current.append(plan)
            current_segs += n_seg
            current_ops += n_ops
            current_total += total
            current_window = max(current_window, window)
            if factor is not None:
                current_factor = factor
        if current:
            groups.append(current)
        return groups

    def _run_plan_group(
        self, plans: list["_Plan"], force_dense: bool = False
    ) -> dict[int, dict]:
        """One fused device call for a group of plans, host combine each."""
        n = self._n_semrefs
        ops: list[tuple[int, float, int, int, int, int, int]] = []
        scopes: list[np.ndarray | None] = [None]
        boost_factor = 1.0
        base = 0
        for plan in plans:
            plan.seg_base = base
            plan.op_start = len(ops)
            if plan.scope is None:
                scope_id = 0
            else:
                scope_id = len(scopes)
                scopes.append(plan.scope)
            for leaf in plan.leaves:
                for op in leaf.ops:
                    ops.append(
                        (
                            self._postings.lookup(op.key),
                            op.weight,
                            base + leaf.seg,
                            op.kind,
                            op.position,
                            op.ktype_gate,
                            scope_id,
                        )
                    )
                for key in leaf.boost_keys:
                    ops.append(
                        (
                            self._postings.lookup(key),
                            1.0,
                            base + leaf.seg,
                            OP_BOOST,
                            0,
                            -1,
                            0,  # boost membership ignores scope
                        )
                    )
                if leaf.boost_keys:
                    boost_factor = leaf.boost_factor
            plan.op_stop = len(ops)
            base += len(plan.leaves)

        # Sparse route: large conversations combine over each plan's
        # active-column union instead of dense [n_seg, n] arrays (the dense
        # f64 combine at 100k semrefs costs more than the device call).
        # Wildcard leaves address every semref of a knowledge type, which the
        # active-column set doesn't cover -> dense for those groups.
        has_wildcards = any(
            leaf.wildcards for plan in plans for leaf in plan.leaves
        )
        if ops and not has_wildcards and not force_dense:
            sparse = (
                self._postings.lookup_ops_sparse_dp(
                    ops, base, self._semref_ktype, scopes, boost_factor,
                    mesh=self.mesh,
                )
                if self.mesh is not None
                else self._postings.lookup_ops_sparse(
                    ops, base, self._semref_ktype, scopes, boost_factor
                )
            )
            if sparse is not None:
                cols, packed, counts, op_hit = sparse
                out: dict[int, dict] = {}
                for plan in plans:
                    lo, hi = plan.seg_base, plan.seg_base + len(plan.leaves)
                    union, blocks = self._plan_union(
                        cols[lo:hi], packed[:, lo:hi], counts[lo:hi]
                    )
                    out[plan.index] = self._combine_plan(
                        plan, *blocks, op_hit, ops, space=union
                    )
                return out
            # Sparse unavailable (run overflow / pathological posting
            # sizes): the group was packed under the larger sparse budget
            # (TOTAL postings), so BOTH dense budgets must be re-checked
            # before running dense — the entry budget (dense transfer) and
            # the gather budget (ops x longest-window intermediates).
            # Re-pack violators; plans too large even for a lone dense
            # call are left unanswered -> host VM fallback.
            cap = self._postings._semref_cap
            window_g = 1
            for plan in plans:
                _n, w, _t = self._plan_cost(plan)
                window_g = max(window_g, w)
            if (
                _bucket(max(base, 1), _SEG_BUCKETS) * cap > _MAX_DENSE_ENTRIES
                or self._gather_elements(len(ops), window_g)
                > _MAX_GATHER_ELEMENTS
            ):
                out = {}
                for sub in self._pack_plans(plans, _MAX_DENSE_ENTRIES):
                    out.update(self._run_plan_group(sub, force_dense=True))
                return out

        if ops:
            exact_score, exact_hits, rel_score, rel_hits, op_hit = (
                self._postings.lookup_ops(
                    ops, base, self._semref_ktype, scopes, boost_factor
                )
            )
        else:
            exact_score = exact_hits = rel_score = rel_hits = np.zeros(
                (max(base, 1), n), np.float32
            )
            op_hit = np.zeros(0, dtype=bool)

        out = {}
        for plan in plans:
            lo, hi = plan.seg_base, plan.seg_base + len(plan.leaves)
            out[plan.index] = self._combine_plan(
                plan,
                exact_score[lo:hi],
                exact_hits[lo:hi],
                rel_score[lo:hi],
                rel_hits[lo:hi],
                op_hit,
                ops,
            )
        return out

    @staticmethod
    def _plan_union(cols, packed, counts):
        """Union-compressed [n_leaves, m_u] blocks for one plan's segments.

        ``cols[s, :counts[s]]`` are the segment's active semref ordinals in
        ascending order; the union keeps ascending order so column index
        comparisons preserve ordinal comparisons.
        """
        n_leaves = cols.shape[0]
        parts = [cols[s, : counts[s]] for s in range(n_leaves)]
        union = (
            np.unique(np.concatenate(parts))
            if parts and sum(p.size for p in parts)
            else np.empty(0, dtype=np.int64)
        )
        union = union.astype(np.int64)
        m_u = union.size
        blocks = [np.zeros((n_leaves, m_u), np.float32) for _ in range(4)]
        for s in range(n_leaves):
            c = counts[s]
            if not c:
                continue
            pos = np.searchsorted(union, cols[s, :c])
            for a, block in enumerate(blocks):
                block[s, pos] = packed[a, s, :c]
        return union, blocks

    def _combine_plan(
        self,
        plan: "_Plan",
        exact_score: np.ndarray,
        exact_hits: np.ndarray,
        rel_score: np.ndarray,
        rel_hits: np.ndarray,
        op_hit: np.ndarray,
        ops: list,
        space: np.ndarray | None = None,
    ) -> dict[KnowledgeType, SemanticRefSearchResult]:
        """Host combine in f64 (bit-parity with the VM's Python floats).

        ``space=None``: columns are semref ordinals (dense). Otherwise
        ``space`` is the plan's ascending active-ordinal union and columns
        index into it — all membership/score algebra is identical, only the
        ordinal<->column translation at the edges differs. Wildcard leaves
        require dense mode (they address whole knowledge types).
        """
        n = exact_score.shape[1]  # combine width (n_semrefs or union size)
        root, leaves = plan.root, plan.leaves
        top_n, min_hit = plan.top_n, plan.min_hit
        ktype_predicates = plan.ktype_predicates
        if space is not None:
            assert not any(leaf.wildcards for leaf in leaves)

        def to_cols(ordinals: np.ndarray) -> np.ndarray:
            """Ordinal array -> column positions (drops non-union entries)."""
            if space is None:
                return ordinals
            if space.size == 0 or ordinals.size == 0:
                return np.empty(0, dtype=np.int64)
            pos = np.searchsorted(space, ordinals)
            pos = np.clip(pos, 0, space.size - 1)
            return pos[space[pos] == ordinals]

        # Per-op term_matches bookkeeping (see _Op.text_needs_scope_hit).
        op_text: dict[int, set[str]] = {}
        op_i = plan.op_start
        for leaf in leaves:
            texts: set[str] = set()
            for op in leaf.ops:
                if op.text_needs_scope_hit:
                    hit = bool(op_hit[op_i]) if op_i < len(op_hit) else False
                else:
                    tid = ops[op_i][0]
                    hit = tid >= 0 and self._postings.posting_size(tid) > 0
                if hit:
                    texts.add(op.match_text)
                op_i += 1
            op_i += len(leaf.boost_keys)
            for _, _, text in leaf.wildcards:
                texts.add(text)
            op_text[leaf.seg] = texts

        ktype_full = self._semref_ktype
        ktype = ktype_full[space] if space is not None else ktype_full
        n_ordinals = self._n_semrefs
        scope_arr = (
            plan.scope
            if plan.scope is not None
            else np.ones(n_ordinals, dtype=bool)
        )

        def leaf_insertion_order(leaf: _Leaf, member: np.ndarray) -> np.ndarray:
            """First-add order (in COLUMN space) over the leaf's lookups in
            VM order: each op's postings in index order, scope/ktype-gated."""
            parts: list[np.ndarray] = []
            for code, _w, _t in leaf.wildcards:
                # Wildcard: all semrefs of the ktype, ordinal order (no scope,
                # matching lookup_knowledge_type). Dense mode only.
                parts.append(np.flatnonzero(ktype_full == code).astype(np.int32))
            for op in sorted(leaf.ops, key=lambda o: o.position):
                tid = self._postings.lookup(op.key)
                ids = self._postings.posting_semrefs(tid)
                ids = ids[ids < n_ordinals]
                keep = scope_arr[ids]
                if op.ktype_gate >= 0:
                    keep = keep & (ktype_full[ids] == op.ktype_gate)
                parts.append(ids[keep])
            if not parts:
                return np.empty(0, dtype=np.int64)
            order = _first_occurrence(np.concatenate(parts)).astype(np.int64)
            order = to_cols(order)
            return order[member[order]]

        def eval_leaf(leaf: _Leaf) -> _NodeResult | None:
            if leaf.seg < 0:
                return None  # always-empty placeholder inside an AND
            es = exact_score[leaf.seg].astype(np.float64)
            eh = exact_hits[leaf.seg].astype(np.float64)
            rs = rel_score[leaf.seg].astype(np.float64)
            rh = rel_hits[leaf.seg].astype(np.float64)
            for code, weight, _text in leaf.wildcards:
                members = (ktype == code).astype(np.float64)
                es += weight * members
                eh += members
            member = (eh > 0) | (rh > 0)
            if not member.any():
                return None
            order = leaf_insertion_order(leaf, member)
            return _NodeResult(member, es, eh, rs, rh, op_text[leaf.seg], order)

        def eval_node(node: _GroupNode | _Leaf) -> _NodeResult | None:
            if isinstance(node, _Leaf):
                return eval_leaf(node)
            results = [eval_node(child) for child in node.children]
            if node.op in ("or", "or_max"):
                present = [r for r in results if r is not None]
                if not present:
                    return None
                member = np.zeros(n, dtype=bool)
                score = np.zeros(n)
                hits = np.zeros(n)
                rscore = np.zeros(n)
                rhits = np.zeros(n)
                texts: set[str] = set()
                for r in present:
                    member |= r.member
                    score += r.score
                    hits += r.hits
                    rscore += r.rel_score
                    rhits += r.rel_hits
                    texts |= r.texts
                order = _first_occurrence(
                    np.concatenate([r.order for r in present])
                )
                score = score + _smooth_vec(rscore, rhits)  # calculate_total_score
                if node.op == "or_max":
                    peak = hits[member].max(initial=0.0)
                    if peak > 1:
                        member = member & (hits >= peak)
                        if not member.any():
                            return None
                        # Dropped values leave the accumulator entirely: a
                        # parent union must not see their fields.
                        score, hits, rscore, rhits = (
                            a * member for a in (score, hits, rscore, rhits)
                        )
                        order = order[member[order]]
                return _NodeResult(member, score, hits, rscore, rhits, texts, order)
            # AND: any empty child fails the whole conjunction.
            if any(r is None for r in results):
                return None
            member = np.ones(n, dtype=bool)
            score = np.zeros(n)
            hits = np.zeros(n)
            rscore = np.zeros(n)
            rhits = np.zeros(n)
            texts = set()
            for r in results:
                member &= r.member
                score += r.score
                hits += r.hits
                rscore += r.rel_score
                rhits += r.rel_hits
                texts |= r.texts
            if not member.any():
                return None
            score = score + _smooth_vec(rscore, rhits)
            member = member & (hits >= len(results))  # select_with_hit_count
            if not member.any():
                return None
            score, hits, rscore, rhits = (
                a * member for a in (score, hits, rscore, rhits)
            )
            # intersect() iterates the left accumulator: the first child's
            # insertion order survives the chain.
            order = results[0].order
            order = order[member[order]]
            return _NodeResult(member, score, hits, rscore, rhits, texts, order)

        result = eval_node(root)
        if result is None:
            return {}

        member = result.member
        for knowledge_type in ktype_predicates:
            member = member & (ktype == _KTYPE_CODES[knowledge_type])
        insertion = result.order[member[result.order]]

        # Group by knowledge type: group dict order and per-group order both
        # follow the accumulator's insertion order (group_matches_by_type
        # iterates matches with setdefault); then per-group selection mirrors
        # select_top_n_scoring (bounded heap, by_rank) + to_scored
        # (stable sort by -score over insertion order).
        code_to_ktype = {code: kt for kt, code in _KTYPE_CODES.items()}
        grouped: dict[KnowledgeType, list[int]] = {}
        for o in insertion:
            grouped.setdefault(code_to_ktype[int(ktype[o])], []).append(int(o))

        from .collections import TopNCollection

        out: dict[KnowledgeType, SemanticRefSearchResult] = {}
        for knowledge_type, ordinals in grouped.items():
            if min_hit:
                ordinals = [
                    o for o in ordinals if result.hits[o] >= min_hit
                ]
            if not ordinals:
                continue
            if top_n and top_n > 0:
                # TopNCollection exactly replicates the VM's heap tie order.
                top = TopNCollection(top_n)
                for o in ordinals:
                    top.push(o, float(result.score[o]))
                ranked = top.values_by_rank()
                ranked_scores = [float(result.score[o]) for o in ranked]
            else:
                # Vectorized descending-stable rank (a python sort key costs
                # more than the device call at thousands of matches); stable
                # ties keep insertion order, matching the VM's sorted().
                arr = np.asarray(ordinals, dtype=np.int64)
                arr_scores = result.score[arr]
                order = np.argsort(-arr_scores, kind="stable")
                ranked = arr[order].tolist()
                ranked_scores = arr_scores[order].tolist()
            if space is not None:
                ranked = [int(space[o]) for o in ranked]
            out[knowledge_type] = SemanticRefSearchResult(
                term_matches=set(result.texts),
                semantic_ref_matches=[
                    ScoredSemanticRefOrdinal.fast(o, s)
                    for o, s in zip(ranked, ranked_scores)
                ],
            )
        return out

    # -- direct (uncompiled) entry point ---------------------------------------

    async def search(
        self,
        group: SearchTermGroup,
        ranges_in_scope: TextRangesInScope | None = None,
        max_knowledge_matches: int | None = None,
    ) -> dict[KnowledgeType, SemanticRefSearchResult] | None:
        """Run a raw term group through the standard stage-3 compile and the
        device engine (exact-match compile: no related-term resolution, given
        related terms are kept). None = not expressible on device."""
        from .search import QueryCompiler, SearchOptions

        compiler = QueryCompiler(
            self.conversation, self.conversation.secondary_indexes
        )
        options = SearchOptions(
            exact_match=True, max_knowledge_matches=max_knowledge_matches
        )
        query = await compiler.compile_knowledge_query(group, None, options)

        expr = query.src_expr
        if isinstance(expr, SelectTopNKnowledgeGroupExpr):
            top_n = expr.max_matches
            inner = expr.source_expr
        else:
            top_n = max_knowledge_matches
            inner = expr
        if isinstance(inner, GroupByKnowledgeTypeExpr):
            inner = inner.matches
        if not isinstance(inner, MatchTermsBooleanExpr):
            return None
        if self._n_semrefs == 0:
            return {}

        indexes = self.conversation.secondary_indexes
        context = QueryEvalContext(
            self.conversation,
            indexes.property_to_semantic_ref_index if indexes else None,
            indexes.timestamp_index if indexes else None,
        )
        combined_scope = ranges_in_scope
        if inner.get_scope_expr is not None:
            compiled_scope = await self._eval_scope(inner.get_scope_expr, context)
            if combined_scope is None:
                combined_scope = compiled_scope
            else:
                combined_scope = TextRangesInScope(
                    list(combined_scope.text_ranges or [])
                    + list(compiled_scope.text_ranges or [])
                )
        return await self._execute_tree(inner, combined_scope, top_n, None, [])
