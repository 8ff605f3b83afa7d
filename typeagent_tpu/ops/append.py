"""Appendable padded device buffers.

The reference appends with ``np.concatenate`` — an O(n) copy per add
(``aitools/vectorbase.py:128,145``), quadratic over an ingest. Here the
embedding matrix is a padded ``[capacity, dim_pad]`` HBM buffer with a host-side
count watermark: appends are jitted ``dynamic_update_slice`` calls with buffer
donation (in-place on TPU), and growth is capacity doubling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_buffer", "append_rows", "grow_buffer", "round_up"]

MIN_CAPACITY = 1024
LANES = 128


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def make_buffer(
    capacity: int, dim_pad: int, dtype: jax.typing.DTypeLike = jnp.float32
) -> jax.Array:
    """Allocate a zeroed [capacity, dim_pad] device buffer."""
    return jnp.zeros((capacity, dim_pad), dtype=dtype)


@functools.partial(jax.jit, donate_argnums=(0,))
def _append_jit(buf: jax.Array, rows: jax.Array, count: jax.Array) -> jax.Array:
    return jax.lax.dynamic_update_slice(buf, rows.astype(buf.dtype), (count, 0))


@jax.jit
def _append_jit_nodonate(
    buf: jax.Array, rows: jax.Array, count: jax.Array
) -> jax.Array:
    return jax.lax.dynamic_update_slice(buf, rows.astype(buf.dtype), (count, 0))


def append_rows(
    buf: jax.Array,
    rows: np.ndarray | jax.Array,
    count: int,
    donate: bool = True,
) -> jax.Array:
    """Write ``rows`` at offset ``count``; donates (updates in place on TPU).

    ``rows`` must already be padded to ``dim_pad`` columns and fit in capacity.
    ``donate=False`` copies instead — used while a background IVF rebuild
    is reading the old buffer (a donated update would delete it mid-build).
    """
    rows = jnp.asarray(rows)
    if donate:
        return _append_jit(buf, rows, jnp.int32(count))
    return _append_jit_nodonate(buf, rows, jnp.int32(count))


# No donation here: the output is strictly LARGER than the input, so XLA
# can never alias them — a donate_argnums on this jit was a no-op that
# warned "Some donated buffers were not usable" on every growth (any
# platform). The old buffer frees when the caller reassigns its reference;
# the in-place O(1)-memory append claim lives in _append_jit (same-shape
# donation, which XLA honors).
@functools.partial(jax.jit, static_argnames=("new_capacity",))
def _grow_jit(buf: jax.Array, *, new_capacity: int) -> jax.Array:
    pad = new_capacity - buf.shape[0]
    return jnp.pad(buf, ((0, pad), (0, 0)))


def grow_buffer(
    buf: jax.Array,
    needed: int,
    exact_capacity: int | None = None,
    donate: bool = True,  # kept for call-site symmetry; growth never aliases
) -> jax.Array:
    """Grow capacity (doubling) until >= needed rows fit.

    ``exact_capacity`` (a reserve hint) skips the doubling: near HBM
    capacity a pow2 jump wastes up to 2x (a 10M-row bf16 store would
    allocate 16.7M rows = 12.9 GB where 7.7 suffices)."""
    if exact_capacity is not None and exact_capacity >= needed:
        cap = round_up(max(exact_capacity, MIN_CAPACITY), 1024)
    else:
        cap = max(buf.shape[0], MIN_CAPACITY)
        while cap < needed:
            cap *= 2
    if cap <= buf.shape[0]:
        return buf
    return _grow_jit(buf, new_capacity=cap)
