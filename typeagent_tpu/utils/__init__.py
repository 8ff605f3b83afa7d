"""Small host-side utilities: timing, env loading, batching."""

from .misc import timelog, load_dotenv, batched

__all__ = ["timelog", "load_dotenv", "batched"]
