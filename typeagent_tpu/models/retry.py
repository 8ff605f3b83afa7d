"""Async retry with exponential backoff + jitter.

Standalone replacement for the reference's stamina retriers
(`aitools/model_adapters.py:61-99`): 6 attempts, 120s total budget, retry on
transient HTTP/network errors, warning log per retry. Tests disable sleeps
via :func:`set_testing`.
"""

from __future__ import annotations

import asyncio
import logging
import random
import time
from typing import Any, Awaitable, Callable

import httpx

logger = logging.getLogger("typeagent_tpu.retry")

_TESTING = False


def set_testing(flag: bool) -> None:
    """Disable retry sleeps (used by the test suite)."""
    global _TESTING
    _TESTING = flag


class TransientError(Exception):
    """An error worth retrying (rate limit, timeout, 5xx)."""


def is_transient(exc: BaseException) -> bool:
    if isinstance(exc, (TransientError, httpx.TimeoutException, httpx.ConnectError)):
        return True
    if isinstance(exc, httpx.HTTPStatusError):
        code = exc.response.status_code
        return code == 429 or code >= 500
    return False


class AsyncRetrier:
    def __init__(
        self,
        attempts: int = 6,
        timeout: float = 120.0,
        base_delay: float = 1.0,
        max_delay: float = 30.0,
    ):
        self.attempts = attempts
        self.timeout = timeout
        self.base_delay = base_delay
        self.max_delay = max_delay

    async def __call__(self, fn: Callable[..., Awaitable[Any]], *args: Any, **kwargs: Any) -> Any:
        start = time.monotonic()
        attempt = 0
        while True:
            attempt += 1
            try:
                return await fn(*args, **kwargs)
            except BaseException as exc:
                elapsed = time.monotonic() - start
                if (
                    not is_transient(exc)
                    or attempt >= self.attempts
                    or elapsed >= self.timeout
                ):
                    raise
                delay = min(self.max_delay, self.base_delay * (2 ** (attempt - 1)))
                delay *= 0.5 + random.random()  # full jitter
                logger.warning(
                    "retrying %s (attempt %d, waited %.1fs so far, waiting %.1fs): %r",
                    getattr(fn, "__name__", fn),
                    attempt,
                    elapsed,
                    delay,
                    exc,
                )
                if not _TESTING:
                    await asyncio.sleep(delay)


DEFAULT_CHAT_RETRIER = AsyncRetrier(attempts=6, timeout=120)
DEFAULT_EMBED_RETRIER = AsyncRetrier(attempts=6, timeout=120)
