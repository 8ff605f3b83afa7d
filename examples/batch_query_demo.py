"""Batched device-engine queries + multi-conversation corpus search.

Runs fully offline (fake deterministic embeddings, no LLM): builds two
conversations, answers several structured queries in ONE fused device call
(`search_conversation_knowledge_batch`), and cross-searches both
conversations through a mesh-sharded `ConversationCorpus`.

Run: ``TAT_JAX_PLATFORM=cpu python examples/batch_query_demo.py``
(or on TPU by default).
"""

import asyncio
import os
import sys

if "XLA_FLAGS" not in os.environ:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from typeagent_tpu import create_conversation
from typeagent_tpu.knowpro.convsettings import ConversationSettings
from typeagent_tpu.knowpro.interfaces import SearchTerm, SearchTermGroup, Term
from typeagent_tpu.knowpro.search import (
    SearchOptions,
    search_conversation_knowledge_batch,
)
from typeagent_tpu.knowpro.universal_message import (
    ConversationMessage,
    ConversationMessageMeta,
)
from typeagent_tpu.models.adapters import create_test_embedding_model


def msg(text, speaker, ts):
    return ConversationMessage(
        [text], ConversationMessageMeta(speaker, ["Listener"]), timestamp=ts
    )


async def build(name: str, lines: list[tuple[str, str]]):
    settings = ConversationSettings(model=create_test_embedding_model(24))
    settings.semantic_ref_index_settings.auto_extract_knowledge = False
    conversation = await create_conversation(
        None, ConversationMessage, name, settings=settings
    )
    await conversation.add_messages_with_indexing(
        [
            msg(text, speaker, f"2024-05-{i + 1:02d}T10:00:00Z")
            for i, (speaker, text) in enumerate(lines)
        ]
    )
    return conversation


async def main() -> None:
    podcast = await build(
        "podcast",
        [
            ("Alice", "Bach composed the Goldberg Variations."),
            ("Bob", "Glenn Gould recorded them twice."),
            ("Alice", "The harpsichord original is my favorite."),
        ],
    )
    mailbox = await build(
        "mailbox",
        [
            ("Carol", "Budget review meeting moved to Thursday."),
            ("Dan", "Attaching the quarterly budget spreadsheet."),
        ],
    )

    # --- N structured queries, ONE fused device call -----------------------
    def term(text):
        return SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term(text))])

    selects = [
        (term("Alice"), None),
        (term("Bob"), None),
        (term("Carol"), None),
    ]
    results = await search_conversation_knowledge_batch(
        podcast, selects, SearchOptions(exact_match=True)
    )
    for (group, _), matches in zip(selects, results):
        text = group.terms[0].term.text
        counts = {k: len(v.semantic_ref_matches) for k, v in (matches or {}).items()}
        print(f"batched knowledge query {text!r}: {counts}")

    # --- cross-conversation corpus search on a device mesh -----------------
    from typeagent_tpu.parallel import ConversationCorpus, create_mesh

    mesh = create_mesh()  # all visible devices on the shard axis
    corpus = ConversationCorpus(dim=24, mesh=mesh)
    await corpus.add_conversation("podcast", podcast)
    await corpus.add_conversation("mailbox", mailbox)

    # (The fake embedder is hash-deterministic, so semantic similarity only
    # appears for exact text matches — use a real embedding model for fuzzy
    # cross-conversation search.)
    query = "Attaching the quarterly budget spreadsheet."
    hits = await corpus.search_text(query, k=2)
    print("corpus global:", [(h.conversation, h.message_ordinal, round(h.score, 3)) for h in hits])
    assert hits[0].conversation == "mailbox" and hits[0].message_ordinal == 1
    scoped = await corpus.search_text(query, k=2, conversations=["podcast"])
    print(
        "corpus scoped to podcast:",
        [(h.conversation, h.message_ordinal) for h in scoped],
    )
    assert all(h.conversation == "podcast" for h in scoped)


if __name__ == "__main__":
    asyncio.run(main())
