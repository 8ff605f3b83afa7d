"""Models layer: structured translation, retry, caching, adapters, metrics."""

import asyncio
import json

import numpy as np
import pytest

from typeagent_tpu.knowpro import kplib
from typeagent_tpu.models.adapters import (
    FakeChatModel,
    FakeEmbedder,
    create_chat_model,
    create_embedding_model,
    create_test_embedding_model,
    parse_azure_endpoint,
)
from typeagent_tpu.models.embeddings import CachingEmbeddingModel
from typeagent_tpu.models.result import Failure, Success
from typeagent_tpu.models.retry import AsyncRetrier, TransientError
from typeagent_tpu.models.structured import TypedTranslator, extract_json
from typeagent_tpu.utils.metrics import MetricsRegistry, mrr, recall_at_k


# ---------------------------------------------------------------------------
# Structured translation
# ---------------------------------------------------------------------------


def test_extract_json():
    assert extract_json('noise {"a": 1} trailing') == '{"a": 1}'
    assert extract_json("[1, 2]") == "[1, 2]"
    assert extract_json("no json here") is None
    assert extract_json('```json\n{"a": {"b": 2}}\n```') == '{"a": {"b": 2}}'


async def test_translator_success():
    response = json.dumps(
        {"entities": [], "actions": [], "inverseActions": [], "topics": ["x"]}
    )
    translator = TypedTranslator(FakeChatModel([response]), kplib.KnowledgeResponse)
    result = await translator.translate("extract this")
    assert isinstance(result, Success)
    assert result.value.topics == ["x"]


async def test_translator_repair_loop():
    bad = '{"entities": "not-a-list"}'
    good = json.dumps(
        {"entities": [], "actions": [], "inverseActions": [], "topics": []}
    )
    model = FakeChatModel([bad, good])
    translator = TypedTranslator(model, kplib.KnowledgeResponse)
    result = await translator.translate("extract this")
    assert isinstance(result, Success)
    # Repair prompt contained the validation error and the bad response.
    assert len(model.prompts) == 2
    repair = model.prompts[1]
    assert any("invalid" in s["content"].lower() for s in repair)


async def test_translator_double_failure():
    model = FakeChatModel(["junk", "more junk"])
    translator = TypedTranslator(model, kplib.KnowledgeResponse)
    result = await translator.translate("extract this")
    assert isinstance(result, Failure)


async def test_translator_camelcase_aliases():
    response = json.dumps(
        {
            "entities": [{"name": "Bach", "type": ["person"]}],
            "actions": [
                {
                    "verbs": ["compose"],
                    "verbTense": "past",
                    "subjectEntityName": "Bach",
                }
            ],
            "inverseActions": [],
            "topics": [],
        }
    )
    translator = TypedTranslator(FakeChatModel([response]), kplib.KnowledgeResponse)
    result = await translator.translate("x")
    assert isinstance(result, Success)
    assert result.value.actions[0].subject_entity_name == "Bach"


# ---------------------------------------------------------------------------
# Retry
# ---------------------------------------------------------------------------


async def test_retry_transient_then_success():
    attempts = 0

    async def flaky():
        nonlocal attempts
        attempts += 1
        if attempts < 3:
            raise TransientError("try again")
        return "ok"

    retrier = AsyncRetrier(attempts=5)
    assert await retrier(flaky) == "ok"
    assert attempts == 3


async def test_retry_nontransient_raises_immediately():
    attempts = 0

    async def broken():
        nonlocal attempts
        attempts += 1
        raise ValueError("permanent")

    retrier = AsyncRetrier(attempts=5)
    with pytest.raises(ValueError):
        await retrier(broken)
    assert attempts == 1


async def test_retry_exhausts_attempts():
    attempts = 0

    async def always_transient():
        nonlocal attempts
        attempts += 1
        raise TransientError("nope")

    retrier = AsyncRetrier(attempts=3)
    with pytest.raises(TransientError):
        await retrier(always_transient)
    assert attempts == 3


# ---------------------------------------------------------------------------
# Embedding models
# ---------------------------------------------------------------------------


async def test_fake_embedder_deterministic_and_normalized():
    embedder = FakeEmbedder(16)
    a1 = await embedder.get_embedding_nocache("hello")
    a2 = await embedder.get_embedding_nocache("hello")
    b = await embedder.get_embedding_nocache("world")
    np.testing.assert_array_equal(a1, a2)
    assert not np.allclose(a1, b)
    assert np.linalg.norm(a1) == pytest.approx(1.0, abs=1e-5)
    with pytest.raises(ValueError):
        await embedder.get_embedding_nocache("")


async def test_caching_model_fills_only_misses():
    calls = []

    class CountingEmbedder(FakeEmbedder):
        async def get_embeddings_nocache(self, input):
            calls.append(list(input))
            return await super().get_embeddings_nocache(input)

    model = CachingEmbeddingModel(CountingEmbedder(8))
    await model.get_embeddings(["a", "b"])
    await model.get_embeddings(["b", "c"])
    assert calls == [["a", "b"], ["c"]]
    with pytest.raises(ValueError):
        await model.get_embeddings([])


def test_create_model_specs():
    assert create_chat_model("test").model_name == "test"
    model = create_embedding_model("test")
    assert model.model_name == "test"
    model = create_embedding_model("test:32")
    # dim honored
    emb = asyncio.run(model.get_embedding("x"))
    assert emb.shape == (32,)


def test_parse_azure_endpoint(monkeypatch):
    monkeypatch.setenv(
        "AZ_TEST",
        "https://res.openai.azure.com/openai/deployments/gpt4o-dep/chat/"
        "completions?api-version=2024-06-01",
    )
    base, version, deployment = parse_azure_endpoint("AZ_TEST")
    assert base == "https://res.openai.azure.com"
    assert version == "2024-06-01"
    assert deployment == "gpt4o-dep"
    with pytest.raises(ValueError):
        parse_azure_endpoint("AZ_MISSING")


AZURE_ENDPOINT_CASES = [
    # (url, base, api_version, deployment)
    (  # api-version as the only query parameter
        "https://myhost.openai.azure.com/openai/deployments/gpt-4?api-version=2025-01-01-preview",
        "https://myhost.openai.azure.com", "2025-01-01-preview", "gpt-4",
    ),
    (  # api-version not the first query parameter
        "https://myhost.openai.azure.com/openai/deployments/gpt-4?foo=bar&api-version=2025-01-01-preview",
        "https://myhost.openai.azure.com", "2025-01-01-preview", "gpt-4",
    ),
    (  # bare resource endpoint; query stripped from base
        "https://myhost.openai.azure.com?api-version=2024-06-01",
        "https://myhost.openai.azure.com", "2024-06-01", "",
    ),
    (  # multiple query parameters all stripped
        "https://myhost.openai.azure.com?foo=bar&api-version=2024-06-01",
        "https://myhost.openai.azure.com", "2024-06-01", "",
    ),
    (  # trailing /openai without /deployments/ stripped, no deployment
        "https://myhost.openai.azure.com/openai?api-version=2024-06-01",
        "https://myhost.openai.azure.com", "2024-06-01", "",
    ),
    (  # embeddings-style deployment URL
        "https://myhost.openai.azure.com/openai/deployments/ada-002/embeddings?api-version=2025-01-01-preview",
        "https://myhost.openai.azure.com", "2025-01-01-preview", "ada-002",
    ),
    (  # APIM gateway prefix before /openai/deployments/ preserved in base
        "https://apim.net/openai/openai/deployments/gpt-4o/chat/completions?api-version=2025-01-01-preview",
        "https://apim.net/openai", "2025-01-01-preview", "gpt-4o",
    ),
    (  # missing api-version falls back to the documented default
        "https://myhost.openai.azure.com/openai/deployments/gpt-4",
        "https://myhost.openai.azure.com", "2024-06-01", "gpt-4",
    ),
]


@pytest.mark.parametrize("url,base,version,deployment", AZURE_ENDPOINT_CASES)
def test_parse_azure_endpoint_matrix(monkeypatch, url, base, version, deployment):
    monkeypatch.setenv("AZ_CASE", url)
    assert parse_azure_endpoint("AZ_CASE") == (base, version, deployment)


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------


def test_metrics_registry():
    registry = MetricsRegistry()
    registry.incr("queries")
    registry.incr("queries", 2)
    for ms in [1, 2, 3, 4, 100]:
        registry.observe("lookup", ms / 1000)
    stats = registry.stats("lookup")
    assert stats.count == 5
    assert stats.p50_ms == pytest.approx(3.0)
    assert stats.max_ms == pytest.approx(100.0)
    report = registry.report()
    assert report["counters"]["queries"] == 3
    assert report["latency"]["lookup"]["count"] == 5
    with registry.timer("timed"):
        pass
    assert registry.stats("timed").count == 1


def test_recall_and_mrr():
    assert recall_at_k([1, 2, 3], {2, 9}, 3) == pytest.approx(0.5)
    assert recall_at_k([1, 2], {1, 2}, 2) == 1.0
    assert recall_at_k([], {1}, 5) == 0.0
    assert mrr([5, 1, 2], {1}) == pytest.approx(0.5)
    assert mrr([9, 8], {1}) == 0.0


def test_batched_and_timelog_utilities(capsys):
    from typeagent_tpu.utils.misc import batched, timelog

    assert [list(b) for b in batched(range(7), 3)] == [[0, 1, 2], [3, 4, 5], [6]]
    assert [list(b) for b in batched([], 3)] == []
    with timelog("unit-test block"):
        pass
    assert "unit-test block" in capsys.readouterr().out


# ---------------------------------------------------------------------------
# Azure managed identity + provider registry
# ---------------------------------------------------------------------------


class _FakeToken:
    def __init__(self, token, expires_on):
        self.token = token
        self.expires_on = expires_on


class _FakeCredential:
    """Credential double: counts get_token calls, controls expiry."""

    def __init__(self, lifetime=3600.0):
        self.calls = 0
        self.lifetime = lifetime

    def get_token(self, scope):
        import time

        from typeagent_tpu.models.auth import COGNITIVE_SERVICES_SCOPE

        assert scope == COGNITIVE_SERVICES_SCOPE
        self.calls += 1
        return _FakeToken(f"tok-{self.calls}", int(time.time() + self.lifetime))


def test_azure_token_provider_caches_and_refreshes():
    from typeagent_tpu.models.auth import AzureTokenProvider

    cred = _FakeCredential(lifetime=3600.0)
    provider = AzureTokenProvider(credential=cred)
    assert provider.get_token() == "tok-1"
    assert provider.get_token() == "tok-1"  # cached
    assert cred.calls == 1
    # Within the 5-minute refresh margin -> refetch.
    cred_short = _FakeCredential(lifetime=200.0)
    provider2 = AzureTokenProvider(credential=cred_short)
    assert provider2.get_token() == "tok-1"
    assert provider2.get_token() == "tok-2"
    assert cred_short.calls == 2


async def test_azure_identity_headers_flow(monkeypatch):
    """AZURE_OPENAI_API_KEY=identity builds per-request bearer headers from
    the shared token provider (reference auth.py:20-63)."""
    from typeagent_tpu.models import adapters
    from typeagent_tpu.models.auth import (
        AzureTokenProvider,
        set_shared_token_provider,
    )

    monkeypatch.setenv("AZURE_OPENAI_API_KEY", "identity")
    monkeypatch.setenv(
        "AZURE_OPENAI_ENDPOINT",
        "https://res.openai.azure.com/openai/deployments/gpt-4o/"
        "chat/completions?api-version=2024-06-01",
    )
    monkeypatch.setenv(
        "AZURE_OPENAI_ENDPOINT_EMBEDDING",
        "https://res.openai.azure.com/openai/deployments/text-embedding-3-small/"
        "embeddings?api-version=2024-06-01",
    )
    monkeypatch.setenv("AZURE_APIM_SUBSCRIPTION_KEY", "apim-key")
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    cred = _FakeCredential(lifetime=200.0)  # force refresh between requests
    set_shared_token_provider(AzureTokenProvider(credential=cred))
    try:
        model = adapters.create_chat_model("azure:gpt-4o")
        assert callable(model._headers)
        h1 = model._headers()
        h2 = model._headers()
        assert h1["Authorization"] == "Bearer tok-1"
        assert h2["Authorization"] == "Bearer tok-2"  # rotated
        assert h1["Ocp-Apim-Subscription-Key"] == "apim-key"
        # Embedding factory shares the provider.
        emb = adapters.create_embedding_model("azure:text-embedding-3-small")
        assert callable(emb._embedder._headers)
        assert emb._embedder._headers()["Authorization"].startswith("Bearer tok-")
    finally:
        set_shared_token_provider(None)


def test_provider_registry_specs(monkeypatch):
    from typeagent_tpu.models import adapters

    monkeypatch.setenv("GROQ_API_KEY", "gk")
    monkeypatch.delenv("AZURE_OPENAI_API_KEY", raising=False)
    model = adapters.create_chat_model("groq:llama-3.3-70b")
    assert model.model_name == "llama-3.3-70b"
    assert model._url == "https://api.groq.com/openai/v1/chat/completions"
    assert model._headers["Authorization"] == "Bearer gk"

    # Per-provider base URL override.
    monkeypatch.setenv("GROQ_BASE_URL", "http://proxy.local/v1")
    model = adapters.create_chat_model("groq:llama-3.3-70b")
    assert model._url == "http://proxy.local/v1/chat/completions"

    # Custom provider registration.
    adapters.register_provider(
        "mycorp", adapters.ProviderSpec("https://llm.mycorp.dev/v1", "MYCORP_KEY")
    )
    monkeypatch.setenv("MYCORP_KEY", "mk")
    emb = adapters.create_embedding_model("mycorp:embed-v2")
    assert emb._embedder._url == "https://llm.mycorp.dev/v1/embeddings"

    # Unknown providers fail with guidance instead of silently hitting OpenAI.
    with pytest.raises(ValueError, match="register_provider"):
        adapters.create_chat_model("nonsense:model-x")
    with pytest.raises(ValueError, match="register_provider"):
        adapters.create_embedding_model("nonsense:model-x")


def test_provider_registry_breadth(monkeypatch):
    """Registry reaches the reference's provider breadth (25+ vendors via
    pydantic-ai there, `model_adapters.py:17-25`); every spec wires its
    vendor-conventional key env var into the Authorization header."""
    from typeagent_tpu.models import adapters

    assert len(adapters.PROVIDERS) >= 25
    monkeypatch.delenv("AZURE_OPENAI_API_KEY", raising=False)
    for name, spec in adapters.PROVIDERS.items():
        assert spec.base_url.startswith(("http://", "https://"))
        assert not spec.base_url.endswith("/")
        monkeypatch.delenv(f"{name.upper()}_BASE_URL", raising=False)
        if name == "openai":
            monkeypatch.delenv("OPENAI_BASE_URL", raising=False)
        monkeypatch.setenv(spec.api_key_envvar, f"key-{name}")
        model = adapters.create_chat_model(f"{name}:some-model")
        assert model._url == spec.base_url + spec.chat_path
        assert model._headers["Authorization"] == f"Bearer key-{name}"
        monkeypatch.delenv(spec.api_key_envvar, raising=False)
