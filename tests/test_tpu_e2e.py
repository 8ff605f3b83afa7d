"""Full-stack conversation E2E on real TPU hardware (bf16 device store).

Skipped on the hermetic CPU mesh; runs under TAT_TEST_TPU=1 with a real
chip. Exercises ingest -> six indexes -> exact search -> message retrieval
with bfloat16 embedding storage end-to-end on device.
"""

import pytest


def _on_tpu() -> bool:
    import jax

    return jax.default_backend() == "tpu"


@pytest.mark.skipif("not __import__('jax').default_backend() == 'tpu'")
async def test_bf16_conversation_end_to_end():
    from typeagent_tpu import create_conversation
    from typeagent_tpu.knowpro import kplib
    from typeagent_tpu.knowpro.convsettings import ConversationSettings
    from typeagent_tpu.knowpro.interfaces import SearchTerm, SearchTermGroup, Term
    from typeagent_tpu.knowpro.search import SearchOptions, search_conversation
    from typeagent_tpu.knowpro.universal_message import (
        ConversationMessage,
        ConversationMessageMeta,
    )
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.models.result import Success

    class WordExtractor:
        async def extract(self, text):
            words = [w.strip(".,:") for w in text.split() if len(w) > 3]
            return Success(
                kplib.KnowledgeResponse(
                    entities=[], actions=[], inverse_actions=[], topics=words
                )
            )

    settings = ConversationSettings(model=create_test_embedding_model(384))
    settings.semantic_ref_index_settings.knowledge_extractor = WordExtractor()
    settings.message_text_index_settings.embedding_index_settings.dtype = "bfloat16"
    settings.related_term_index_settings.embedding_index_settings.dtype = "bfloat16"
    conv = await create_conversation(None, ConversationMessage, settings=settings)
    msgs = [
        ConversationMessage(
            [f"note {i}: fact about subject{i % 13}"],
            ConversationMessageMeta("A", ["B"]),
        )
        for i in range(50)
    ]
    await conv.add_messages_with_indexing(msgs)
    found = await search_conversation(
        conv,
        SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("subject7"))]),
        options=SearchOptions(exact_match=True),
        raw_search_query="subject7",
    )
    assert found.message_matches
    m = await conv.messages.get_item(found.message_matches[0].message_ordinal)
    assert "subject7" in m.text_chunks[0]


@pytest.mark.skipif("not __import__('jax').default_backend() == 'tpu'")
async def test_int8_conversation_end_to_end():
    """Same flow with int8 (per-row scales) embedding storage on device."""
    from typeagent_tpu import create_conversation
    from typeagent_tpu.knowpro import kplib
    from typeagent_tpu.knowpro.convsettings import ConversationSettings
    from typeagent_tpu.knowpro.interfaces import SearchTerm, SearchTermGroup, Term
    from typeagent_tpu.knowpro.search import SearchOptions, search_conversation
    from typeagent_tpu.knowpro.universal_message import (
        ConversationMessage,
        ConversationMessageMeta,
    )
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.models.result import Success

    class WordExtractor:
        async def extract(self, text):
            words = [w.strip(".,:") for w in text.split() if len(w) > 3]
            return Success(
                kplib.KnowledgeResponse(
                    entities=[], actions=[], inverse_actions=[], topics=words
                )
            )

    settings = ConversationSettings(model=create_test_embedding_model(384))
    settings.semantic_ref_index_settings.knowledge_extractor = WordExtractor()
    settings.message_text_index_settings.embedding_index_settings.dtype = "int8"
    settings.related_term_index_settings.embedding_index_settings.dtype = "int8"
    conv = await create_conversation(None, ConversationMessage, settings=settings)
    await conv.add_messages_with_indexing(
        [
            ConversationMessage(
                [f"entry {i}: notes about theme{i % 7}"],
                ConversationMessageMeta("A", ["B"]),
            )
            for i in range(30)
        ]
    )
    found = await search_conversation(
        conv,
        SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("theme3"))]),
        options=SearchOptions(exact_match=True),
        raw_search_query="theme3",
    )
    assert found.message_matches
    m = await conv.messages.get_item(found.message_matches[0].message_ordinal)
    assert "theme3" in m.text_chunks[0]


@pytest.mark.skipif("not __import__('jax').default_backend() == 'tpu'")
def test_bf16_wire_batch_exact2_rescore_compiles():
    """The serve path's bf16 query wire through the exact2 Pallas rescore.

    Regression: the bf16-wire change handed the rescore kernel a bf16 query
    ref, and Mosaic cannot dynamically index packed 16-bit sublanes
    ("index in dimension 0 is a multiple of 8" at lowering) — a TPU-only
    compile failure the CPU interpreter never sees. The kernel now upcasts
    the wire dtype to f32 before the pallas_call.
    """
    import jax
    import numpy as np

    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    rng = np.random.default_rng(3)
    rows = rng.normal(size=(4096, 128)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    settings = TextEmbeddingIndexSettings(
        embedding_model=create_test_embedding_model(128),
        min_score=0.0,
        dtype="bfloat16",
    )
    store = VectorStore(settings)
    store.load_device_rows(jax.numpy.asarray(rows))
    results = store.fuzzy_lookup_embeddings_batch(rows[:256], max_hits=10)
    assert all(results[i][0].item == i for i in range(256))
