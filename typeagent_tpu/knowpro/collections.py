"""Score accumulation + range scoping + term sets for query evaluation.

Behavioral parity with the reference's `knowpro/collections.py` (score/hit
bookkeeping is subtle and fixture-tested there):

  * ``Match`` keeps separate exact (score, hit_count) and related
    (related_score, related_hit_count) tallies; exact adds bump score+hits,
    related adds bump only the related pair (`collections.py:73-106`).
  * Total score folds related in via log-smoothing:
    ``smooth = log(hits+1) * (total/hits)`` (`collections.py:222-245`).
  * ``MessageAccumulator.add`` takes the max score and only bumps hits on
    improvement (`collections.py:404-414`).
  * Scope semantics: a range is in scope iff no selector's collection rejects
    it (`collections.py:542-562`).

On the TPU build these accumulators also serve as the host-side oracle for
the device segment-sum query path (ops/postings).
"""

from __future__ import annotations

import bisect
import heapq
import math
import sys
from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass, field

from .interfaces import (
    IMessage,
    IMessageCollection,
    ISemanticRefCollection,
    Knowledge,
    KnowledgeType,
    MessageOrdinal,
    ScoredMessageOrdinal,
    ScoredSemanticRefOrdinal,
    SemanticRef,
    SemanticRefOrdinal,
    Term,
    TextRange,
)


@dataclass
class Match[T]:
    value: T
    score: float
    hit_count: int
    related_score: float
    related_hit_count: int


class MatchAccumulator[T]:
    """Accumulates per-value match scores with exact/related bookkeeping."""

    def __init__(self):
        self._matches: dict[T, Match[T]] = {}

    def __len__(self) -> int:
        return len(self._matches)

    def __iter__(self) -> Iterator[Match[T]]:
        return iter(self._matches.values())

    def __contains__(self, value: T) -> bool:
        return value in self._matches

    def get_match(self, value: T) -> Match[T] | None:
        return self._matches.get(value)

    def set_match(self, match: Match[T]) -> None:
        self._matches[match.value] = match

    def set_matches(self, matches: Iterable[Match[T]], *, clear: bool = False) -> None:
        if clear:
            self.clear_matches()
        for match in matches:
            self.set_match(match)

    def get_max_hit_count(self) -> int:
        return max((m.hit_count for m in self._matches.values()), default=0)

    def add(self, value: T, score: float, is_exact_match: bool = True) -> None:
        """Add one occurrence. Related-only values keep hit_count 0 so
        hit-count filters can weed out noise."""
        match = self._matches.get(value)
        if match is not None:
            if is_exact_match:
                match.hit_count += 1
                match.score += score
            else:
                match.related_hit_count += 1
                match.related_score += score
        elif is_exact_match:
            self.set_match(Match(value, score, 1, 0.0, 0))
        else:
            self.set_match(Match(value, 0.0, 0, score, 1))

    def add_union(self, other: "MatchAccumulator[T]") -> None:
        for other_match in other:
            existing = self._matches.get(other_match.value)
            if existing is None:
                self.set_match(other_match)
            else:
                self.combine_matches(existing, other_match)

    def intersect(
        self, other: "MatchAccumulator[T]", intersection: "MatchAccumulator[T]"
    ) -> "MatchAccumulator[T]":
        for self_match in self:
            other_match = other.get_match(self_match.value)
            if other_match is not None:
                self.combine_matches(self_match, other_match)
                intersection.set_match(self_match)
        return intersection

    def combine_matches(self, match: Match[T], other: Match[T]) -> None:
        match.hit_count += other.hit_count
        match.score += other.score
        match.related_hit_count += other.related_hit_count
        match.related_score += other.related_score

    def calculate_total_score(
        self, scorer: Callable[[Match[T]], None] | None = None
    ) -> None:
        if scorer is None:
            scorer = add_smooth_related_score_to_match_score
        for match in self:
            scorer(match)

    def get_sorted_by_score(self, min_hit_count: int | None = None) -> list[Match[T]]:
        if not self._matches:
            return []
        matches = list(self._min_hit_matches(min_hit_count))
        matches.sort(key=lambda m: m.score, reverse=True)
        return matches

    def get_top_n_scoring(
        self,
        max_matches: int | None = None,
        min_hit_count: int | None = None,
    ) -> list[Match[T]]:
        if not self._matches:
            return []
        if max_matches and max_matches > 0:
            top = TopNCollection[T](max_matches)
            for match in self._min_hit_matches(min_hit_count):
                top.push(match.value, match.score)
            return [self._matches[s.item] for s in top.by_rank()]
        return self.get_sorted_by_score(min_hit_count)

    def get_with_hit_count(self, min_hit_count: int) -> list[Match[T]]:
        return list(self.matches_with_min_hit_count(min_hit_count))

    def get_matches(
        self, predicate: Callable[[Match[T]], bool] | None = None
    ) -> Iterator[Match[T]]:
        if predicate is None:
            return iter(self._matches.values())
        return filter(predicate, self._matches.values())

    def get_matched_values(self) -> Iterator[T]:
        return iter(self._matches)

    def clear_matches(self) -> None:
        self._matches.clear()

    def select_top_n_scoring(
        self,
        max_matches: int | None = None,
        min_hit_count: int | None = None,
    ) -> int:
        top = self.get_top_n_scoring(max_matches, min_hit_count)
        self.set_matches(top, clear=True)
        return len(top)

    def select_with_hit_count(self, min_hit_count: int) -> int:
        matches = self.get_with_hit_count(min_hit_count)
        self.set_matches(matches, clear=True)
        return len(matches)

    def _min_hit_matches(self, min_hit_count: int | None) -> Iterable[Match[T]]:
        return self.matches_with_min_hit_count(min_hit_count)

    def matches_with_min_hit_count(
        self, min_hit_count: int | None
    ) -> Iterable[Match[T]]:
        if min_hit_count is not None and min_hit_count > 0:
            return (m for m in self._matches.values() if m.hit_count >= min_hit_count)
        return self._matches.values()


def get_smooth_score(total_score: float, hit_count: int) -> float:
    """Dampened multi-hit score: log(hits+1) * average (see reference
    collections.ts rationale; related matches are noisy/duplicative)."""
    if hit_count > 0:
        if hit_count == 1:
            return total_score
        return math.log(hit_count + 1) * (total_score / hit_count)
    return 0.0


def add_smooth_related_score_to_match_score[T](match: Match[T]) -> None:
    if match.related_hit_count > 0:
        match.score += get_smooth_score(match.related_score, match.related_hit_count)


def smooth_match_score[T](match: Match[T]) -> None:
    if match.hit_count > 0:
        match.score = get_smooth_score(match.score, match.hit_count)


type KnowledgePredicate[T: Knowledge] = Callable[[T], bool]


class SemanticRefAccumulator(MatchAccumulator[SemanticRefOrdinal]):
    def __init__(self, search_term_matches: set[str] | None = None):
        super().__init__()
        self.search_term_matches: set[str] = (
            search_term_matches if search_term_matches is not None else set()
        )

    def add_term_matches(
        self,
        search_term: Term,
        scored_refs: Iterable[ScoredSemanticRefOrdinal] | None,
        is_exact_match: bool,
        *,
        weight: float | None = None,
    ) -> None:
        if scored_refs is None:
            return
        if weight is None:
            weight = search_term.weight if search_term.weight is not None else 1.0
        for scored_ref in scored_refs:
            self.add(
                scored_ref.semantic_ref_ordinal,
                scored_ref.score * weight,
                is_exact_match,
            )
        self.search_term_matches.add(search_term.text)

    def add_term_matches_if_new(
        self,
        search_term: Term,
        scored_refs: Iterable[ScoredSemanticRefOrdinal] | None,
        is_exact_match: bool,
        weight: float | None = None,
    ) -> None:
        if scored_refs is None:
            return
        if weight is None:
            weight = search_term.weight if search_term.weight is not None else 1.0
        for scored_ref in scored_refs:
            if scored_ref.semantic_ref_ordinal not in self:
                self.add(
                    scored_ref.semantic_ref_ordinal,
                    scored_ref.score * weight,
                    is_exact_match,
                )
        self.search_term_matches.add(search_term.text)

    async def get_semantic_refs(
        self,
        semantic_refs: ISemanticRefCollection,
        predicate: Callable[[SemanticRef], bool],
    ) -> list[SemanticRef]:
        result = []
        for match in self:
            semantic_ref = await semantic_refs.get_item(match.value)
            if predicate is None or predicate(semantic_ref):
                result.append(semantic_ref)
        return result

    def get_matches_of_type[TK: Knowledge](
        self,
        semantic_refs: list[SemanticRef],
        knowledge_type: KnowledgeType,
        predicate: KnowledgePredicate[TK] | None = None,
    ) -> Iterable[Match[SemanticRefOrdinal]]:
        for match in self:
            semantic_ref = semantic_refs[match.value]
            if predicate is None or predicate(semantic_ref.knowledge):  # type: ignore[arg-type]
                yield match

    async def group_matches_by_type(
        self, semantic_refs: ISemanticRefCollection
    ) -> dict[KnowledgeType, "SemanticRefAccumulator"]:
        matches = list(self)
        if not matches:
            return {}
        metadata = await semantic_refs.get_metadata_multiple(
            [m.value for m in matches]
        )
        groups: dict[KnowledgeType, SemanticRefAccumulator] = {}
        for match, meta in zip(matches, metadata):
            group = groups.get(meta.knowledge_type)
            if group is None:
                group = SemanticRefAccumulator(self.search_term_matches)
                groups[meta.knowledge_type] = group
            group.set_match(match)
        return groups

    async def get_matches_in_scope(
        self,
        semantic_refs: ISemanticRefCollection,
        ranges_in_scope: "TextRangesInScope",
    ) -> "SemanticRefAccumulator":
        matches = list(self)
        accumulator = SemanticRefAccumulator(self.search_term_matches)
        if not matches:
            return accumulator
        metadata = await semantic_refs.get_metadata_multiple(
            [m.value for m in matches]
        )
        for match, meta in zip(matches, metadata):
            if ranges_in_scope.is_range_in_scope(meta.range):
                accumulator.set_match(match)
        return accumulator

    def add_union(self, other: MatchAccumulator[SemanticRefOrdinal]) -> None:
        assert isinstance(other, SemanticRefAccumulator)
        super().add_union(other)
        self.search_term_matches.update(other.search_term_matches)

    def intersect(
        self,
        other: MatchAccumulator[SemanticRefOrdinal],
        intersection: MatchAccumulator[SemanticRefOrdinal] | None = None,
    ) -> "SemanticRefAccumulator":
        assert isinstance(other, SemanticRefAccumulator)
        if intersection is None:
            intersection = SemanticRefAccumulator()
        assert isinstance(intersection, SemanticRefAccumulator)
        super().intersect(other, intersection)
        if len(intersection) > 0:
            intersection.search_term_matches.update(self.search_term_matches)
            intersection.search_term_matches.update(other.search_term_matches)
        return intersection

    def to_scored_semantic_refs(self) -> list[ScoredSemanticRefOrdinal]:
        return [
            ScoredSemanticRefOrdinal(
                semantic_ref_ordinal=m.value,
                score=m.score,
            )
            for m in self.get_sorted_by_score()
        ]


class MessageAccumulator(MatchAccumulator[MessageOrdinal]):
    def __init__(self, matches: list[Match[MessageOrdinal]] | None = None):
        super().__init__()
        if matches:
            self.set_matches(matches)

    def add(
        self, value: MessageOrdinal, score: float, is_exact_match: bool = True
    ) -> None:
        # Max-merge: a message's score is its best chunk/semref score.
        match = self.get_match(value)
        if match is None:
            self.set_match(Match(value, score, 1, 0.0, 0))
        elif score > match.score:
            match.score = score
            match.hit_count += 1

    def add_messages_for_semantic_ref(
        self, semantic_ref: SemanticRef, score: float
    ) -> None:
        start = semantic_ref.range.start.message_ordinal
        if semantic_ref.range.end is not None:
            end = semantic_ref.range.end.message_ordinal
            for ordinal in range(start, end + 1):
                self.add(ordinal, score)
        else:
            self.add(start, score)

    def add_scored_matches(self, scored_ordinals: list[ScoredMessageOrdinal]) -> None:
        for scored in scored_ordinals:
            self.add(scored.message_ordinal, scored.score)

    def intersect(
        self,
        other: MatchAccumulator[MessageOrdinal],
        intersection: MatchAccumulator[MessageOrdinal] | None = None,
    ) -> "MessageAccumulator":
        if intersection is None:
            intersection = MessageAccumulator()
        assert isinstance(intersection, MessageAccumulator)
        super().intersect(other, intersection)
        return intersection

    def smooth_scores(self) -> None:
        for match in self:
            smooth_match_score(match)

    def to_scored_message_ordinals(self) -> list[ScoredMessageOrdinal]:
        return [
            ScoredMessageOrdinal(m.value, m.score) for m in self.get_sorted_by_score()
        ]

    async def select_messages_in_budget(
        self, messages: IMessageCollection, max_chars_in_budget: int
    ) -> None:
        scored = self.get_sorted_by_score()
        count = await get_count_of_messages_in_char_budget(
            messages, [m.value for m in scored], max_chars_in_budget
        )
        self.clear_matches()
        if count > 0:
            self.set_matches(scored[:count])

    @staticmethod
    def from_scored_ordinals(
        ordinals: list[ScoredMessageOrdinal] | None,
    ) -> "MessageAccumulator":
        accumulator = MessageAccumulator()
        if ordinals:
            accumulator.add_scored_matches(ordinals)
        return accumulator


# ---------------------------------------------------------------------------
# Range scoping
# ---------------------------------------------------------------------------


@dataclass
class TextRangeCollection(Iterable[TextRange]):
    """Sorted, deduped ranges with bisect insert + containment probe."""

    _ranges: list[TextRange]

    def __init__(
        self,
        ranges: list[TextRange] | None = None,
        ensure_sorted: bool = False,
    ) -> None:
        if ensure_sorted:
            self._ranges = []
            if ranges:
                self.add_ranges(ranges)
        else:
            self._ranges = ranges if ranges is not None else []

    def __len__(self) -> int:
        return len(self._ranges)

    def __iter__(self) -> Iterator[TextRange]:
        return iter(self._ranges)

    def get_ranges(self) -> list[TextRange]:
        return self._ranges

    def add_range(self, text_range: TextRange) -> bool:
        pos = bisect.bisect_left(self._ranges, text_range)
        if pos < len(self._ranges) and self._ranges[pos] == text_range:
            return False
        self._ranges.insert(pos, text_range)
        return True

    def add_ranges(self, text_ranges: "list[TextRange] | TextRangeCollection") -> None:
        ranges = (
            text_ranges
            if isinstance(text_ranges, list)
            else text_ranges._ranges
        )
        for text_range in ranges:
            self.add_range(text_range)

    def contains_range(self, inner_range: TextRange) -> bool:
        if not self._ranges:
            return False
        # All candidate containers have start <= inner.start; scan backwards
        # from the largest such start.
        hi = bisect.bisect_right(
            self._ranges, inner_range.start, key=lambda r: r.start
        )
        for i in range(hi - 1, -1, -1):
            if inner_range in self._ranges[i]:
                return True
        return False


@dataclass
class TextRangesInScope:
    """Intersection-of-selectors scope: in scope iff no selector rejects."""

    text_ranges: list[TextRangeCollection] | None = None

    def add_text_ranges(self, ranges: TextRangeCollection) -> None:
        if self.text_ranges is None:
            self.text_ranges = []
        self.text_ranges.append(ranges)

    def is_range_in_scope(self, inner_range: TextRange) -> bool:
        if self.text_ranges is not None:
            for outer_ranges in self.text_ranges:
                if not outer_ranges.contains_range(inner_range):
                    return False
        return True


# ---------------------------------------------------------------------------
# Term sets
# ---------------------------------------------------------------------------


@dataclass
class TermSet:
    """Terms keyed by text; union keeps the max weight per term."""

    terms: dict[str, Term]

    def __init__(self, terms: list[Term] | None = None):
        self.terms = {}
        self.add_or_union(terms)

    def __len__(self) -> int:
        return len(self.terms)

    def add(self, term: Term) -> bool:
        if term.text in self.terms:
            return False
        self.terms[term.text] = term
        return True

    def add_or_union(self, terms: Term | list[Term] | None) -> None:
        if terms is None:
            return
        if isinstance(terms, list):
            for term in terms:
                self.add_or_union(term)
            return
        existing = self.terms.get(terms.text)
        if existing:
            if (terms.weight or 0) > (existing.weight or 0):
                existing.weight = terms.weight or 0
        else:
            self.terms[terms.text] = terms

    def get(self, term: str | Term) -> Term | None:
        return self.terms.get(term if isinstance(term, str) else term.text)

    def get_weight(self, term: Term) -> float | None:
        t = self.terms.get(term.text)
        return t.weight if t is not None else None

    def __contains__(self, term: Term) -> bool:
        return term.text in self.terms

    def remove(self, term: Term) -> None:
        self.terms.pop(term.text, None)

    def clear(self) -> None:
        self.terms.clear()

    def values(self) -> list[Term]:
        return list(self.terms.values())


@dataclass
class PropertyTermSet:
    """Dedupe set of (property name, value term) pairs."""

    terms: dict[str, Term] = field(default_factory=dict)

    def add(self, property_name: str, property_value: Term) -> None:
        key = self._make_key(property_name, property_value)
        if key not in self.terms:
            self.terms[key] = property_value

    def has(self, property_name: str, property_value: Term | str) -> bool:
        return self._make_key(property_name, property_value) in self.terms

    def clear(self) -> None:
        self.terms.clear()

    def _make_key(self, property_name: str, property_value: Term | str) -> str:
        value = (
            property_value if isinstance(property_value, str) else property_value.text
        )
        return f"{property_name}:{value}"


# ---------------------------------------------------------------------------
# Top-N
# ---------------------------------------------------------------------------


@dataclass
class Scored[T]:
    item: T
    score: float

    def __lt__(self, other: "Scored[T]") -> bool:
        return self.score < other.score

    def __gt__(self, other: "Scored[T]") -> bool:
        return self.score > other.score

    def __le__(self, other: "Scored[T]") -> bool:
        return self.score <= other.score

    def __ge__(self, other: "Scored[T]") -> bool:
        return self.score >= other.score


class TopNCollection[T]:
    """Keeps the N best-scoring items (min-heap of size N)."""

    def __init__(self, max_count: int):
        self._max_count = max_count
        self._heap: list[Scored[T]] = []

    def __len__(self) -> int:
        return len(self._heap)

    def reset(self) -> None:
        self._heap = []

    def pop(self) -> Scored[T]:
        return heapq.heappop(self._heap)

    def top(self) -> Scored[T]:
        return self._heap[0]

    def push(self, item: T, score: float) -> None:
        if len(self._heap) < self._max_count:
            heapq.heappush(self._heap, Scored(item, score))
        else:
            heapq.heappushpop(self._heap, Scored(item, score))

    def by_rank(self) -> list[Scored[T]]:
        return sorted(self._heap, reverse=True)

    def values_by_rank(self) -> list[T]:
        return [s.item for s in self.by_rank()]


class TopNList[T](TopNCollection[T]):
    """Alias for TopNCollection."""


class TopNListAll[T](TopNList[T]):
    """Top-N with no limit (N = sys.maxsize)."""

    def __init__(self):
        super().__init__(sys.maxsize)


def get_top_k[T](scored_items: Iterable[Scored[T]], top_k: int) -> list[Scored[T]]:
    top = TopNCollection[T](top_k)
    for scored in scored_items:
        top.push(scored.item, scored.score)
    return top.by_rank()


def add_to_set[T](target: set[T], values: Iterable[T]) -> None:
    target.update(values)


def get_message_char_count(message: IMessage) -> int:
    return sum(len(chunk) for chunk in message.text_chunks)


async def get_count_of_messages_in_char_budget(
    messages: IMessageCollection,
    message_ordinals: Iterable[MessageOrdinal],
    max_chars_in_budget: int,
) -> int:
    """How many best-first messages fit in the character budget."""
    count = 0
    total = 0
    for ordinal in message_ordinals:
        message = await messages.get_item(ordinal)
        chars = get_message_char_count(message)
        if chars + total > max_chars_in_budget:
            break
        total += chars
        count += 1
    return count
