"""Online smoke tests — run only when real API keys are configured.

(Parity role: reference tests/test_online.py — a real chat completion and a
real embedding, gated on OPENAI_API_KEY / AZURE_OPENAI_API_KEY so the suite
stays hermetic by default.)
"""

import os

import pytest

from typeagent_tpu.utils.misc import load_dotenv

load_dotenv()

really_needs_auth = pytest.mark.skipif(
    not (os.environ.get("OPENAI_API_KEY") or os.environ.get("AZURE_OPENAI_API_KEY")),
    reason="no OPENAI_API_KEY/AZURE_OPENAI_API_KEY configured",
)


@really_needs_auth
async def test_real_chat_completion():
    from typeagent_tpu.models.adapters import create_chat_model

    model = create_chat_model()
    result = await model.complete("Reply with exactly the word: pong")
    from typeagent_tpu.models.result import Success

    assert isinstance(result, Success)
    assert "pong" in result.value.lower()


@really_needs_auth
async def test_real_embedding_roundtrip():
    from typeagent_tpu.models.adapters import create_embedding_model

    model = create_embedding_model()
    emb = await model.get_embedding("hello world")
    assert emb.ndim == 1 and emb.shape[0] >= 64
    # Adapter L2-normalizes on receipt.
    import numpy as np

    assert np.linalg.norm(emb) == pytest.approx(1.0, abs=1e-3)
