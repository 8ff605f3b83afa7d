"""Universal conversation message (transcripts, podcasts, chats, emails).

(Parity: reference knowpro/universal_message.py — including the "listeners"
serialization alias for recipients, UTC-Z timestamps, and metadata knowledge:
person entities + say/speak actions.)
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import TypedDict

from pydantic import AliasChoices, Field

from . import kplib
from .fields import dataclass, deserialize_object
from .interfaces import IKnowledgeSource, IMessage, IMessageMetadata

# Unix epoch sentinel for unknown dates.
UNIX_EPOCH = datetime(1970, 1, 1, 0, 0, 0, tzinfo=timezone.utc)


def format_timestamp_utc(dt: datetime) -> str:
    """ISO 8601 with explicit Z suffix; requires a timezone-aware datetime."""
    if dt.tzinfo is None:
        raise ValueError(
            f"Datetime must be timezone-aware, got naive datetime: {dt}. "
            f"Use dt.replace(tzinfo=timezone.utc) or parse with 'Z' suffix."
        )
    if dt.tzinfo != timezone.utc:
        dt = dt.astimezone(timezone.utc)
    iso_str = dt.isoformat()
    if iso_str.endswith("+00:00"):
        return iso_str[:-6] + "Z"
    return iso_str


@dataclass
class ConversationMessageMeta(IKnowledgeSource, IMessageMetadata):
    """Universal metadata: speaker + recipients (serialized as 'listeners')."""

    speaker: str | None = None
    recipients: list[str] = Field(
        default_factory=list,
        serialization_alias="listeners",
        validation_alias=AliasChoices("recipients", "listeners"),
    )

    @property
    def source(self) -> str | None:  # type: ignore[override]
        return self.speaker

    @property
    def dest(self) -> list[str] | None:  # type: ignore[override]
        return self.recipients if self.recipients else None

    def get_knowledge(self) -> kplib.KnowledgeResponse:
        """Person entities for speaker/recipients + say/speak actions."""
        if not self.speaker:
            return kplib.KnowledgeResponse(
                entities=[], actions=[], inverse_actions=[], topics=[]
            )
        entities = [kplib.ConcreteEntity(name=self.speaker, type=["person"])]
        entities.extend(
            kplib.ConcreteEntity(name=r, type=["person"]) for r in self.recipients
        )
        if self.recipients:
            actions = [
                kplib.Action(
                    verbs=["say"],
                    verb_tense="past",
                    subject_entity_name=self.speaker,
                    object_entity_name=recipient,
                    indirect_object_entity_name="none",
                )
                for recipient in self.recipients
            ]
        else:
            actions = [
                kplib.Action(
                    verbs=["say", "speak"],
                    verb_tense="past",
                    subject_entity_name=self.speaker,
                    object_entity_name="none",
                    indirect_object_entity_name="none",
                )
            ]
        return kplib.KnowledgeResponse(
            entities=entities, actions=actions, inverse_actions=[], topics=[]
        )


class ConversationMessageMetaData(TypedDict):
    speaker: str | None
    listeners: list[str]


class ConversationMessageData(TypedDict):
    metadata: ConversationMessageMetaData
    textChunks: list[str]
    tags: list[str]
    timestamp: str | None


@dataclass
class ConversationMessage(IMessage):
    """Universal message for any conversation type."""

    text_chunks: list[str]
    metadata: ConversationMessageMeta
    tags: list[str] = Field(default_factory=list)
    # ISO 8601 UTC-Z; Unix epoch sentinel when the source has no dates.
    timestamp: str | None = None
    source_id: str | None = None

    def get_knowledge(self) -> kplib.KnowledgeResponse:
        return self.metadata.get_knowledge()

    def add_timestamp(self, timestamp: str) -> None:
        self.timestamp = timestamp

    def add_content(self, content: str) -> None:
        self.text_chunks[0] += content

    def serialize(self) -> ConversationMessageData:
        return self.__pydantic_serializer__.to_python(self, by_alias=True)  # type: ignore[attr-defined]

    @staticmethod
    def deserialize(message_data: ConversationMessageData) -> "ConversationMessage":
        return deserialize_object(ConversationMessage, message_data)
