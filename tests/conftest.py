"""Test harness config.

Tests run hermetically on a virtual 8-device CPU mesh (the multi-chip sharding
path compiles and executes without TPU hardware). Set TAT_TEST_TPU=1 to run
the suite against the real backend instead.

(Reference test strategy: fake deterministic embeddings + golden fixtures,
`tests/conftest.py:93-96` there; the CPU-mesh pattern is new here.)
"""

import os

if not os.environ.get("TAT_TEST_TPU"):
    # jax is pre-imported by the environment's sitecustomize with the TPU
    # backend pinned via JAX_PLATFORMS, so plain env vars are too late —
    # use config.update before any backend initialization instead.
    # Also drop the axon pool IPs so subprocesses tests spawn (bench smoke,
    # multichip hermeticity) never dial the TPU relay: a wedged relay blocks
    # backend init even in CPU-pinned processes (observed live).
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import asyncio

import numpy as np
import pytest

from typeagent_tpu.models.adapters import create_test_embedding_model
from typeagent_tpu.models import retry

retry.set_testing(True)


@pytest.fixture(scope="session")
def embedding_model():
    """Session-scoped deterministic fake embedding model (dim 3, no network)."""
    return create_test_embedding_model()


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def pytest_pyfunc_call(pyfuncitem):
    """Run ``async def`` tests with asyncio.run (no pytest-asyncio dependency)."""
    import inspect

    fn = pyfuncitem.obj
    if inspect.iscoroutinefunction(fn):
        kwargs = {
            name: pyfuncitem.funcargs[name]
            for name in pyfuncitem._fixtureinfo.argnames
        }
        asyncio.run(fn(**kwargs))
        return True
    return None
