"""typeagent-tpu: TPU-native Structured-RAG framework.

The capabilities of microsoft/typeagent-py, rebuilt TPU-first on
JAX/XLA/Pallas: device-resident embedding indexes with fused top-k kernels,
mesh-sharded search, and a compiled query data plane. See ARCHITECTURE.md.
"""

__version__ = "0.2.0"

import os as _os

if _os.environ.get("TAT_JAX_PLATFORM"):
    # Escape hatch for environments whose sitecustomize pins JAX_PLATFORMS
    # before user code runs (env vars are read too early to override there).
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["TAT_JAX_PLATFORM"])
    except Exception:
        pass

# Persistent cache is scoped to accelerator platforms: XLA:CPU cache
# entries are AOT code specialized to the compiling host's CPU features
# (AVX512/AMX sets) and the cache key does NOT capture those, so loading
# them on a different host can SIGILL. CPU compiles are cheap; TPU
# compiles (remote compile service) are the ones worth caching. Setting
# JAX_COMPILATION_CACHE_DIR explicitly re-enables caching anywhere.


def _accelerator_expected() -> bool:
    """Without an explicit platform pin, enable the cache only when an
    accelerator plugin is installed (the default backend will be CPU
    otherwise, and caching XLA:CPU AOT code is the hazard above)."""
    import importlib.util

    for mod in ("libtpu", "axon", "jax_plugins"):
        try:
            if importlib.util.find_spec(mod) is not None:
                return True
        except (ImportError, ValueError):
            continue
    try:
        import importlib.metadata

        return bool(list(importlib.metadata.entry_points(group="jax_plugins")))
    except Exception:
        return False


_plat = (
    (_os.environ.get("TAT_JAX_PLATFORM") or _os.environ.get("JAX_PLATFORMS") or "")
    .split(",")[0]
    .strip()
    .lower()
)
if _os.environ.get("TAT_COMPILE_CACHE", "1") not in ("0", "off") and (
    "JAX_COMPILATION_CACHE_DIR" in _os.environ
    or (_plat != "cpu" if _plat else _accelerator_expected())
):
    # Persistent XLA compilation cache: TPU compiles of the fused kernels
    # take seconds-to-minutes (remote compile services more so); caching
    # them on disk makes every CLI/benchmark after the first start warm.
    # Opt out with TAT_COMPILE_CACHE=0; JAX_COMPILATION_CACHE_DIR overrides
    # the location.
    import jax as _jax

    try:
        if not _jax.config.jax_compilation_cache_dir:
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.environ.get(
                    "JAX_COMPILATION_CACHE_DIR",
                    _os.path.expanduser("~/.cache/typeagent_tpu/xla"),
                ),
            )
            _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


from typing import TYPE_CHECKING as _TYPE_CHECKING, Any as _Any

if _TYPE_CHECKING:
    from .knowpro.conversation_base import ConversationBase


def create_conversation(*args: _Any, **kwargs: _Any) -> "ConversationBase":
    """Create a conversation (lazy import; see knowpro.factory)."""
    from .knowpro.factory import create_conversation as _create

    return _create(*args, **kwargs)


def __getattr__(name: str) -> _Any:
    # Lazy exports so `import typeagent_tpu` stays light.
    if name == "ConversationSettings":
        from .knowpro.convsettings import ConversationSettings

        return ConversationSettings
    if name == "ConversationBase":
        from .knowpro.conversation_base import ConversationBase

        return ConversationBase
    if name == "ConversationMessage":
        from .knowpro.universal_message import ConversationMessage

        return ConversationMessage
    if name == "ConversationMessageMeta":
        from .knowpro.universal_message import ConversationMessageMeta

        return ConversationMessageMeta
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "create_conversation",
    "ConversationSettings",
    "ConversationBase",
    "ConversationMessage",
    "ConversationMessageMeta",
    "__version__",
]
