"""Transcript conversation type (parity: reference transcripts/transcript.py)."""

from __future__ import annotations

from ..knowpro.conversation_base import ConversationBase
from ..knowpro.convfiles import FileSerializedConversation
from ..knowpro.universal_message import ConversationMessage, ConversationMessageMeta

TranscriptMessage = ConversationMessage
TranscriptMessageMeta = ConversationMessageMeta


class Transcript(FileSerializedConversation, ConversationBase[TranscriptMessage]):
    """Transcript conversation with incremental indexing support."""

    message_type = TranscriptMessage
