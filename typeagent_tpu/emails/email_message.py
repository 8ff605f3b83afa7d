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
        entities: list[kplib.ConcreteEntity] = []
        if self.sender:
            entities.extend(self._email_address_to_entities(self.sender))
        for group in (self.recipients, self.cc, self.bcc):
            for address in group or []:
                entities.extend(self._email_address_to_entities(address))
        entities.append(kplib.ConcreteEntity(name="email", type=["message"]))
        return entities

    def to_topics(self) -> list[str]:
        return [self.subject] if self.subject else []

    def to_actions(self) -> list[kplib.Action]:
        actions: list[kplib.Action] = []
        if self.sender and self.recipients:
            for recipient in self.recipients:
                actions.extend(self._create_actions("sent", self.sender, recipient))
                actions.extend(self._create_actions("received", recipient, self.sender))
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

    def _create_actions(
        self, verb: str, sender: str, recipient: str
    ) -> list[kplib.Action]:
        sender_display_name, sender_address = parseaddr(sender)
        actions: list[kplib.Action] = []
        for sender_name in (sender_display_name, sender_address):
            if sender_name:
                self._add_actions_for_sender(actions, verb, sender_name, recipient)
        return actions

    def _add_actions_for_sender(
        self, actions: list[kplib.Action], verb: str, sender: str, recipient: str
    ) -> None:
        recipient_display_name, recipient_address = parseaddr(recipient)
        for recipient_name in (recipient_display_name, recipient_address):
            if recipient_name:
                actions.append(self._create_action(verb, sender, recipient_name))

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
