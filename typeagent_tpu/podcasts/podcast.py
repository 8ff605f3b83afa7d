"""Podcast conversation type.

(Parity: reference podcasts/podcast.py — Podcast = ConversationBase over
universal ConversationMessage, with JSON file snapshots, participant-name
aliases (first name <-> full name), and speech-verb synonyms loaded into the
alias table.)
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from ..knowpro import secindex
from ..knowpro.conversation_base import ConversationBase
from ..knowpro.convfiles import FileSerializedConversation
from ..knowpro.interfaces import Term
from ..knowpro.universal_message import ConversationMessage, ConversationMessageMeta

PodcastMessage = ConversationMessage
PodcastMessageMeta = ConversationMessageMeta


class Podcast(FileSerializedConversation, ConversationBase[PodcastMessage]):
    """Podcast conversation with incremental indexing support."""

    message_type = PodcastMessage

    async def _after_deserialize(self, rebuild_related_terms: bool) -> None:
        if rebuild_related_terms:
            await self._build_participant_aliases()
            await self._add_synonyms()

    async def build_participant_aliases(self) -> None:
        await self._build_participant_aliases()
        await self._add_synonyms()

    async def _build_participant_aliases(self) -> None:
        secondary_indexes = self._get_secondary_indexes()
        index = secondary_indexes.term_to_related_terms_index
        assert index is not None
        aliases = index.aliases
        await aliases.clear()
        name_to_alias_map = await self._collect_participant_aliases()
        for name, alias_set in name_to_alias_map.items():
            await aliases.add_related_term(
                name, [Term(text=alias) for alias in alias_set]
            )

    async def _add_synonyms(self) -> None:
        secondary_indexes = self._get_secondary_indexes()
        assert secondary_indexes.term_to_related_terms_index is not None
        aliases = secondary_indexes.term_to_related_terms_index.aliases
        synonym_file = os.path.join(os.path.dirname(__file__), "podcastVerbs.json")
        with open(synonym_file) as f:
            data: list[dict] = json.load(f)
        for obj in data or []:
            text = obj.get("term")
            synonyms = obj.get("relatedTerms")
            if text and synonyms:
                related_term = Term(text=text.lower())
                for synonym in synonyms:
                    await aliases.add_related_term(synonym.lower(), related_term)

    async def _collect_participant_aliases(self) -> dict[str, set[str]]:
        aliases: dict[str, set[str]] = {}

        def collect_name(participant_name: str | None) -> None:
            if not participant_name:
                return
            participant_name = participant_name.lower()
            parsed = split_participant_name(participant_name)
            if parsed and parsed.first_name and parsed.last_name:
                # First name <-> full name, both directions.
                aliases.setdefault(parsed.first_name, set()).add(participant_name)
                aliases.setdefault(participant_name, set()).add(parsed.first_name)

        async for message in self.messages:
            collect_name(message.metadata.speaker)
            for recipient in message.metadata.recipients:
                collect_name(recipient)
        return aliases

    async def _build_transient_secondary_indexes(self, build_all: bool) -> None:
        if build_all:
            await secindex.build_transient_secondary_indexes(self, self.settings)
        await self._build_participant_aliases()
        await self._add_synonyms()


@dataclass
class ParticipantName:
    first_name: str
    last_name: str | None = None
    middle_name: str | None = None


def split_participant_name(full_name: str) -> ParticipantName | None:
    parts = full_name.split(None, 2)
    match len(parts):
        case 0:
            return None
        case 1:
            return ParticipantName(first_name=parts[0])
        case 2:
            return ParticipantName(first_name=parts[0], last_name=parts[1])
        case _:
            if parts[1].lower() == "van":
                return ParticipantName(
                    first_name=parts[0], last_name=f"{parts[1]} {parts[2]}"
                )
            return ParticipantName(
                first_name=parts[0],
                middle_name=parts[1],
                last_name=" ".join(parts[2].split()),
            )
