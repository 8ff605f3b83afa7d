"""Email message type with metadata knowledge.

(Parity: reference emails/email_message.py — sender/recipient entities with
email_address facets, sent/received actions in both display-name and address
forms, subject as topic.)
"""

from __future__ import annotations

from email.utils import parseaddr

from pydantic import Field

from ..knowpro import kplib
from ..knowpro.fields import dataclass, deserialize_object
from ..knowpro.interfaces import IKnowledgeSource, IMessage, IMessageMetadata


@dataclass
class EmailMessageMeta(IKnowledgeSource, IMessageMetadata):
    """Metadata for email messages."""

    sender: str
    recipients: list[str] = Field(default_factory=list)
    cc: list[str] = Field(default_factory=list)
    bcc: list[str] = Field(default_factory=list)
    subject: str | None = None
    id: str | None = None

    @property
    def source(self) -> str | None:  # type: ignore[override]
        return self.sender

    @property
    def dest(self) -> str | list[str] | None:  # type: ignore[override]
        return self.recipients

    def get_knowledge(self) -> kplib.KnowledgeResponse:
        return kplib.KnowledgeResponse(
            entities=self.to_entities(),
            actions=self.to_actions(),
            inverse_actions=[],
            topics=self.to_topics(),
        )

    def to_entities(self) -> list[kplib.ConcreteEntity]:
        participants = [self.sender] if self.sender else []
        for group in (self.recipients, self.cc, self.bcc):
            participants.extend(group or ())
        entities = [
            entity
            for address in participants
            for entity in self._email_address_to_entities(address)
        ]
        entities.append(kplib.ConcreteEntity(name="email", type=["message"]))
        return entities

    def to_topics(self) -> list[str]:
        return [self.subject] if self.subject else []

    def to_actions(self) -> list[kplib.Action]:
        if not (self.sender and self.recipients):
            return []
        actions: list[kplib.Action] = []
        for recipient in self.recipients:
            actions += self._create_actions("sent", self.sender, recipient)
            actions += self._create_actions("received", recipient, self.sender)
        return actions

    def _email_address_to_entities(
        self, email_address: str
    ) -> list[kplib.ConcreteEntity]:
        entities: list[kplib.ConcreteEntity] = []
        display_name, address = parseaddr(email_address)
        if display_name:
            entity = kplib.ConcreteEntity(name=display_name, type=["person"])
            if address:
                entity.facets = [kplib.Facet(name="email_address", value=address)]
            entities.append(entity)
        if address:
            entities.append(
                kplib.ConcreteEntity(name=address, type=["email_address", "alias"])
            )
        return entities

    @staticmethod
    def _name_forms(address: str) -> list[str]:
        """Both the display name and the bare address, where present."""
        display, bare = parseaddr(address)
        return [form for form in (display, bare) if form]

    def _create_actions(
        self, verb: str, sender: str, recipient: str
    ) -> list[kplib.Action]:
        # Cross product: every sender name form x every recipient name form.
        return [
            self._create_action(verb, s, r)
            for s in self._name_forms(sender)
            for r in self._name_forms(recipient)
        ]

    def _create_action(
        self, verb: str, sender: str, recipient: str, use_indirect: bool = True
    ) -> kplib.Action:
        if use_indirect:
            return kplib.Action(
                verbs=[verb],
                verb_tense="past",
                subject_entity_name=sender,
                object_entity_name="email",
                indirect_object_entity_name=recipient,
            )
        return kplib.Action(
            verbs=[verb],
            verb_tense="past",
            subject_entity_name=sender,
            object_entity_name=recipient,
            indirect_object_entity_name="email",
        )


@dataclass
class EmailMessage(IMessage):
    text_chunks: list[str]
    metadata: EmailMessageMeta
    tags: list[str] = Field(default_factory=list)
    timestamp: str | None = None
    src_url: str | None = None  # source file or uri
    source_id: str | None = None

    def get_knowledge(self) -> kplib.KnowledgeResponse:
        return self.metadata.get_knowledge()

    def add_timestamp(self, timestamp: str) -> None:
        self.timestamp = timestamp

    def add_content(self, content: str) -> None:
        if self.text_chunks:
            self.text_chunks[0] += content
        else:
            self.text_chunks = [content]

    def serialize(self) -> dict:
        return self.__pydantic_serializer__.to_python(self, by_alias=True)  # type: ignore[attr-defined]

    @staticmethod
    def deserialize(message_data: dict) -> "EmailMessage":
        return deserialize_object(EmailMessage, message_data)
