"""typeagent-tpu: TPU-native Structured-RAG framework.

The capabilities of microsoft/typeagent-py, rebuilt TPU-first on
JAX/XLA/Pallas: device-resident embedding indexes with fused top-k kernels,
mesh-sharded search, and a compiled query data plane. See ARCHITECTURE.md.
"""

__version__ = "0.1.0"


def create_conversation(*args, **kwargs):
    """Create a conversation (lazy import; see knowpro.factory)."""
    from .knowpro.factory import create_conversation as _create

    return _create(*args, **kwargs)


__all__ = ["create_conversation", "__version__"]
