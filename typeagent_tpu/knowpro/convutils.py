"""Conversation prompt helpers (parity: reference knowpro/convutils.py)."""

from __future__ import annotations

from ..models.structured import PromptSection
from .interfaces import (
    DateRange,
    Datetime,
    IConversation,
    IMessage,
    ITermToSemanticRefIndex,
)


async def get_time_range_prompt_section_for_conversation[
    TMessage: IMessage, TIndex: ITermToSemanticRefIndex
](conversation: IConversation[TMessage, TIndex]) -> PromptSection | None:
    time_range = await get_time_range_for_conversation(conversation)
    if time_range is not None:
        start = time_range.start.replace(tzinfo=None).isoformat()
        end = time_range.end.replace(tzinfo=None).isoformat() if time_range.end else "now"
        return PromptSection(
            role="system",
            content=(
                f"ONLY IF user request explicitly asks for time ranges, THEN "
                f'use the CONVERSATION TIME RANGE: "{start} to {end}"'
            ),
        )
    return None


async def get_time_range_for_conversation[
    TMessage: IMessage, TIndex: ITermToSemanticRefIndex
](conversation: IConversation[TMessage, TIndex]) -> DateRange | None:
    """The conversation's display span. NOT for index lookups: the end is the
    last message's own (inclusive-looking) timestamp, while DateRange is
    half-open."""
    messages = conversation.messages
    size = await messages.size()
    if size > 0:
        start = (await messages.get_item(0)).timestamp
        if start is not None:
            end = (await messages.get_item(size - 1)).timestamp
            return DateRange(
                start=Datetime.fromisoformat(start),
                end=Datetime.fromisoformat(end) if end else None,
            )
    return None
