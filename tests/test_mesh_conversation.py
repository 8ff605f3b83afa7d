"""Mesh-backed conversations: the embedding indexes ride the sharded store.

ConversationSettings(mesh=...) routes MessageTextIndex and RelatedTermsFuzzy
through ShardedVectorStore on a (dp, shard) mesh; results must match the
single-chip store exactly on the virtual 8-device CPU mesh.
"""

import jax
import numpy as np
import pytest

from tests.test_query_pipeline import FakeConversation
from typeagent_tpu.knowpro import kplib
from typeagent_tpu.knowpro.convsettings import (
    ConversationSettings,
    MessageTextIndexSettings,
    RelatedTermIndexSettings,
)
from typeagent_tpu.knowpro.interfaces import SearchTerm, SearchTermGroup, Term
from typeagent_tpu.knowpro.propindex import build_property_index
from typeagent_tpu.knowpro.search import SearchOptions, search_conversation
from typeagent_tpu.knowpro.secindex import ConversationSecondaryIndexes
from typeagent_tpu.knowpro.semrefindex import (
    add_knowledge_batch_to_semantic_ref_index,
    add_metadata_to_index_from_list,
)
from typeagent_tpu.knowpro.universal_message import (
    ConversationMessage,
    ConversationMessageMeta,
)
from typeagent_tpu.models.adapters import create_test_embedding_model
from typeagent_tpu.parallel import create_mesh
from typeagent_tpu.storage.memory import MemoryStorageProvider
from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return create_mesh(n_shard=4, n_dp=2)


async def build_conv(mesh=None):
    model = create_test_embedding_model(24)
    provider = MemoryStorageProvider(
        message_text_settings=MessageTextIndexSettings(
            TextEmbeddingIndexSettings(model, min_score=0.0, mesh=mesh)
        ),
        related_terms_settings=RelatedTermIndexSettings(
            TextEmbeddingIndexSettings(
                model, min_score=0.5, max_matches=3, mesh=mesh
            )
        ),
    )
    conv = FakeConversation(
        messages=provider.messages,
        semantic_refs=provider.semantic_refs,
        semantic_ref_index=provider.semantic_ref_index,
        secondary_indexes=ConversationSecondaryIndexes(provider),
    )
    messages = [
        ConversationMessage(
            [f"message {i}: notes on fugues and recordings {i}"],
            ConversationMessageMeta("Alice", ["Bob"]),
            timestamp=f"2024-04-{i + 1:02d}T10:00:00Z",
        )
        for i in range(8)
    ]
    await provider.messages.extend(messages)
    await add_metadata_to_index_from_list(
        messages, provider.semantic_refs, provider.semantic_ref_index, 0
    )
    knowledge = kplib.KnowledgeResponse(
        entities=[kplib.ConcreteEntity("Bach", ["person", "composer"])],
        actions=[],
        inverse_actions=[],
        topics=["fugues", "recordings"],
    )
    await add_knowledge_batch_to_semantic_ref_index(conv, [(3, 0, knowledge)])
    await build_property_index(conv)
    from typeagent_tpu.storage.memory.indexes import add_to_timestamp_index

    await add_to_timestamp_index(provider.timestamp_index, provider.messages, 0)
    from typeagent_tpu.storage.memory.reltermsindex import (
        build_related_terms_index,
    )

    await build_related_terms_index(
        conv,
        RelatedTermIndexSettings(
            TextEmbeddingIndexSettings(model, min_score=0.5, max_matches=3, mesh=mesh)
        ),
    )
    return conv


async def test_mesh_conversation_matches_single_chip(mesh):
    conv_mesh = await build_conv(mesh)
    conv_single = await build_conv(None)

    group = SearchTermGroup(
        boolean_op="or",
        terms=[
            SearchTerm(Term("Bach"), related_terms=None),
            SearchTerm(Term("fugues")),
        ],
    )
    for exact in (True, False):
        options = SearchOptions(exact_match=exact, max_message_matches=5)
        res_mesh = await search_conversation(
            conv_mesh, group, None, options, raw_search_query="tell me about Bach"
        )
        res_single = await search_conversation(
            conv_single, group, None, options, raw_search_query="tell me about Bach"
        )
        assert (res_mesh is None) == (res_single is None)
        m = {
            (kt, x.semantic_ref_ordinal): round(float(x.score), 4)
            for kt, r in res_mesh.knowledge_matches.items()
            for x in r.semantic_ref_matches
        }
        s = {
            (kt, x.semantic_ref_ordinal): round(float(x.score), 4)
            for kt, r in res_single.knowledge_matches.items()
            for x in r.semantic_ref_matches
        }
        assert m == pytest.approx(s)
        assert [
            (x.message_ordinal, round(float(x.score), 4))
            for x in res_mesh.message_matches
        ] == [
            (x.message_ordinal, round(float(x.score), 4))
            for x in res_single.message_matches
        ]


async def test_conversation_settings_mesh_propagates(mesh):
    settings = ConversationSettings(
        model=create_test_embedding_model(16), mesh=mesh
    )
    assert settings.message_text_index_settings.embedding_index_settings.mesh is mesh
    assert settings.related_term_index_settings.embedding_index_settings.mesh is mesh
    assert settings.thread_settings.mesh is mesh


async def test_mesh_store_message_reindex_and_subset(mesh):
    """The message-index subset re-rank path rides the sharded store."""
    conv = await build_conv(mesh)
    secondary = conv.secondary_indexes
    index = secondary.message_index
    emb = await index.generate_embedding("recordings 3")
    hits = index.lookup_in_subset_by_embedding(emb, [0, 3, 5], 2, None)
    assert len(hits) == 2
    assert all(h.message_ordinal in (0, 3, 5) for h in hits)


async def test_conversation_corpus_end_to_end(mesh):
    """2+ conversations share one mesh-sharded matrix; global + scoped
    queries answer through it, scoped exactly (device segment masks)."""
    from typeagent_tpu.parallel import ConversationCorpus

    conv_a = await build_conv(None)
    # Second conversation with different content.
    model = create_test_embedding_model(24)
    provider = MemoryStorageProvider(
        message_text_settings=MessageTextIndexSettings(
            TextEmbeddingIndexSettings(model, min_score=0.0)
        ),
        related_terms_settings=RelatedTermIndexSettings(
            TextEmbeddingIndexSettings(model, min_score=0.5, max_matches=3)
        ),
    )
    conv_b = FakeConversation(
        messages=provider.messages,
        semantic_refs=provider.semantic_refs,
        semantic_ref_index=provider.semantic_ref_index,
        secondary_indexes=ConversationSecondaryIndexes(provider),
    )
    b_messages = [
        ConversationMessage(
            [f"email {i}: budget meeting minutes {i}"],
            ConversationMessageMeta("Carol", ["Dan"]),
            timestamp=f"2024-05-{i + 1:02d}T09:00:00Z",
        )
        for i in range(5)
    ]
    await provider.messages.extend(b_messages)

    corpus = ConversationCorpus(dim=24, mesh=mesh)
    await corpus.add_conversation("podcast", conv_a)
    await corpus.add_conversation("mailbox", conv_b)
    assert set(corpus.conversations) == {"podcast", "mailbox"}

    # Global search finds the exact chunk with conversation attribution.
    hits = await corpus.search_text("email 2: budget meeting minutes 2", k=3)
    assert hits[0].conversation == "mailbox"
    assert hits[0].message_ordinal == 2
    assert hits[0].score == pytest.approx(1.0, abs=1e-4)

    # Scoped search: the same query restricted to the podcast NEVER returns
    # mailbox rows, and still fills k from podcast rows (exact masks).
    scoped = await corpus.search_text(
        "email 2: budget meeting minutes 2", k=3, conversations=["podcast"]
    )
    assert len(scoped) == 3
    assert all(h.conversation == "podcast" for h in scoped)

    # Incremental refresh picks up newly indexed messages append-only.
    more = [
        ConversationMessage(
            ["email 5: follow-up on the budget meeting"],
            ConversationMessageMeta("Carol", ["Dan"]),
            timestamp="2024-05-20T09:00:00Z",
        )
    ]
    await provider.messages.extend(more)
    appended = await corpus.refresh()
    assert appended == 1
    hits = await corpus.search_text("email 5: follow-up on the budget meeting", k=1)
    assert hits[0].conversation == "mailbox"
    assert hits[0].message_ordinal == 5

    # Max-merge per message mirrors MessageTextIndex semantics: one entry
    # per (conversation, message), best chunk wins, sorted by score.
    merged = corpus.merge_by_message(
        await corpus.search_text("budget meeting", k=6)
    )
    assert merged
    keys = [(conv, m.message_ordinal) for conv, m in merged]
    assert len(keys) == len(set(keys))
    scores = [m.score for _, m in merged]
    assert scores == sorted(scores, reverse=True)


async def test_conversation_corpus_checkpoint_resume(mesh, tmp_path):
    """save() + load() restores the mirror; re-attached conversations do NOT
    re-upload already-mirrored rows, and refresh resumes from the watermark."""
    from typeagent_tpu.parallel import ConversationCorpus

    conv = await build_conv(None)
    corpus = ConversationCorpus(dim=24, mesh=mesh)
    await corpus.add_conversation("podcast", conv)
    n_before = len(corpus._store)
    assert n_before > 0

    corpus.save(tmp_path / "mirror")
    resumed = ConversationCorpus.load(tmp_path / "mirror", mesh=mesh)
    assert len(resumed._store) == n_before
    assert resumed.conversations == []  # live objects re-attach explicitly

    appended = 0

    async def attach_and_count():
        nonlocal appended
        await resumed.add_conversation("podcast", conv)
        appended = resumed._synced_counts["podcast"]

    await attach_and_count()
    # Watermark restored: nothing re-uploaded.
    assert len(resumed._store) == n_before
    hits = await resumed.search_text("message 3: notes on fugues and recordings 3", k=1)
    assert hits[0].conversation == "podcast" and hits[0].message_ordinal == 3

    # New content after resume uploads only the delta.
    index = resumed._message_index(conv)
    await index.add_messages_starting_at(
        8,
        [
            ConversationMessage(
                ["message 8: entirely new sonata notes"],
                ConversationMessageMeta("Alice", ["Bob"]),
            )
        ],
    )
    added = await resumed.refresh("podcast")
    assert added == 1
    assert len(resumed._store) == n_before + 1
    hits = await resumed.search_text("message 8: entirely new sonata notes", k=1)
    assert hits[0].message_ordinal == 8


async def test_corpus_query_all_four_stages(mesh):
    """Full NL query across the corpus: one stage-1 translation shared by
    every conversation, per-conversation stages 2-4, combined answer with
    conversation attribution."""
    import json

    from typeagent_tpu.knowpro import answers, searchlang
    from typeagent_tpu.models.adapters import FakeChatModel
    from typeagent_tpu.parallel import ConversationCorpus

    conv_a = await build_conv(None)
    model = create_test_embedding_model(24)
    provider = MemoryStorageProvider(
        message_text_settings=MessageTextIndexSettings(
            TextEmbeddingIndexSettings(model, min_score=0.0)
        ),
        related_terms_settings=RelatedTermIndexSettings(
            TextEmbeddingIndexSettings(model, min_score=0.5, max_matches=3)
        ),
    )
    conv_b = FakeConversation(
        messages=provider.messages,
        semantic_refs=provider.semantic_refs,
        semantic_ref_index=provider.semantic_ref_index,
        secondary_indexes=ConversationSecondaryIndexes(provider),
    )
    b_messages = [
        ConversationMessage(
            ["the fugue budget was discussed"],
            ConversationMessageMeta("Carol", ["Dan"]),
            timestamp="2024-05-01T09:00:00Z",
        )
    ]
    await provider.messages.extend(b_messages)
    await add_metadata_to_index_from_list(
        b_messages, provider.semantic_refs, provider.semantic_ref_index, 0
    )
    await build_property_index(conv_b)

    corpus = ConversationCorpus(dim=24, mesh=mesh)
    await corpus.add_conversation("podcast", conv_a)
    await corpus.add_conversation("mailbox", conv_b)

    stage1 = json.dumps(
        {
            "searchExpressions": [
                {
                    "rewrittenQuery": "What about fugues?",
                    "filters": [{"searchTerms": ["fugues"]}],
                }
            ]
        }
    )
    # ONE stage-1 response: the translation must be shared across both
    # conversations (a second request would exhaust the fake and fail).
    query_translator = searchlang.create_search_query_translator(
        FakeChatModel([stage1])
    )
    answered = json.dumps({"type": "Answered", "answer": "Fugues were discussed."})
    no_answer = json.dumps({"type": "NoAnswer", "whyNoAnswer": "nothing"})
    combined_json = json.dumps(
        {"type": "Answered", "answer": "Both conversations discuss fugues."}
    )
    answer_translator = answers.create_answer_translator(
        FakeChatModel([answered, no_answer, combined_json])
    )

    per_conv, combined = await corpus.query_all(
        "What about fugues?", query_translator, answer_translator
    )
    assert set(per_conv) == {"podcast", "mailbox"}
    types = {name: a.type for name, a in per_conv.items()}
    # One conversation answered; the other did not — the single good answer
    # is returned directly (no combine round trip).
    assert "Answered" in types.values()
    assert combined.type == "Answered"
    assert "Fugues" in combined.answer or "fugues" in combined.answer
