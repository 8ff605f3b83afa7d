"""Sharding-aware checkpoints for mesh stores (orbax).

`ShardedVectorStore.serialize()` gathers everything to one host f32 array —
format-compatible with the reference's `_embeddings.bin` sidecar
(/root/reference/src/typeagent/knowpro/serialization.py), but O(corpus) on a
single host and lossy for quantized stores. These checkpoints instead write
each device shard in parallel straight from HBM (native dtype preserved:
bf16/int8 checkpoints are half/quarter the bytes) and restore into ANY mesh
topology — orbax reshards on load, so a corpus saved from a (dp=2, shard=4)
mesh resumes on (dp=1, shard=8) or a single chip without a host gather.

Layout on disk:
  <path>/store_meta.json   dim / dtype / count / capacity (+ corpus segments)
  <path>/state/            orbax checkpoint: buf [cap, dim_pad] (+ scales)
"""

from __future__ import annotations

import json
import os
import shutil

import jax
import numpy as np

from typing import TYPE_CHECKING, Any, Callable

if TYPE_CHECKING:
    from jax.sharding import Mesh

    from ..vectorstore import TextEmbeddingIndexSettings, VectorStore

from .corpus import CorpusVectorStore, _Segment
from .sharded import (
    ShardedVectorStore,
    _DTYPE_NAMES,
    _replicated,
    _row_sharding,
    _vec_sharding,
)

_META_FILE = "store_meta.json"
_STATE_DIR = "state"


def _dtype_name(dtype) -> str:
    for name, dt in _DTYPE_NAMES.items():
        if dt == dtype:
            return name
    raise ValueError(f"Unknown store dtype {dtype!r}")


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


class PendingSave:
    """Handle for a non-blocking save; ``wait()`` finalizes it."""

    def __init__(self, ckpt: Any, finalize: Callable[[], None]):
        self._ckpt = ckpt
        self._finalize = finalize
        self._done = False

    def wait(self) -> None:
        if self._done:
            return
        self._ckpt.wait_until_finished()
        self._finalize()  # metadata written only once the state is durable
        self._done = True


def save_sharded_store(
    store: ShardedVectorStore,
    path: str | os.PathLike,
    *,
    extra_meta: dict | None = None,
    block: bool = True,
) -> PendingSave:
    """Write the store's device state under ``path`` (overwrites).

    With ``block=False`` the device arrays are staged and the disk write
    proceeds in the background (orbax async) — keep serving and call
    ``.wait()`` on the returned handle before relying on the checkpoint.
    """
    store._flush()
    path = os.fspath(path)
    state_dir = os.path.join(path, _STATE_DIR)
    if os.path.exists(state_dir):
        shutil.rmtree(state_dir)
    os.makedirs(path, exist_ok=True)

    state = {"buf": store.buf}
    if store._scales is not None:
        state["scales"] = store._scales
    ckpt = _checkpointer()
    ckpt.save(os.path.abspath(state_dir), state)

    meta = {
        "dim": store.dim,
        "dim_pad": store.dim_pad,
        "dtype": _dtype_name(store._dtype),
        "count": store.count,
        "capacity": int(store.buf.shape[0]),
    }
    if extra_meta:
        meta.update(extra_meta)

    def finalize() -> None:
        with open(os.path.join(path, _META_FILE), "w", encoding="utf-8") as f:
            json.dump(meta, f)

    pending = PendingSave(ckpt, finalize)
    if block:
        pending.wait()
    return pending


def _read_meta(path: str | os.PathLike) -> dict:
    with open(os.path.join(os.fspath(path), _META_FILE), encoding="utf-8") as f:
        return json.load(f)


def restore_sharded_store(
    mesh: Mesh, path: str | os.PathLike, *, _meta: dict | None = None
) -> ShardedVectorStore:
    """Rebuild a store on ``mesh`` (any topology) from a checkpoint."""
    import jax.numpy as jnp

    path = os.fspath(path)
    meta = _meta or _read_meta(path)
    dtype = _DTYPE_NAMES[meta["dtype"]]
    store = ShardedVectorStore(mesh, meta["dim"], dtype=dtype)
    cap, dim_pad = meta["capacity"], meta["dim_pad"]
    assert dim_pad == store.dim_pad, (dim_pad, store.dim_pad)
    quantized = "int8" == meta["dtype"]
    state_dir = os.path.abspath(os.path.join(path, _STATE_DIR))
    ckpt = _checkpointer()

    if cap % store._cap_quantum == 0:
        # Direct device restore: orbax reshards onto this mesh's shard axis.
        target = {
            "buf": jax.ShapeDtypeStruct(
                (cap, dim_pad), dtype, sharding=_row_sharding(mesh)
            )
        }
        if quantized:
            target["scales"] = jax.ShapeDtypeStruct(
                (cap,), jnp.float32, sharding=_vec_sharding(mesh)
            )
        restored = ckpt.restore(state_dir, target)
        store.buf = restored["buf"]
        if quantized:
            store._scales = restored["scales"]
        store.count = meta["count"]
        return store

    # Capacity doesn't tile this mesh's shard quantum (e.g. saved from a
    # smaller mesh): restore replicated on host and re-append the live rows.
    target = {
        "buf": jax.ShapeDtypeStruct((cap, dim_pad), dtype, sharding=_replicated(mesh))
    }
    if quantized:
        target["scales"] = jax.ShapeDtypeStruct(
            (cap,), jnp.float32, sharding=_replicated(mesh)
        )
    restored = ckpt.restore(state_dir, target)
    count = meta["count"]
    rows = np.asarray(restored["buf"][:count, : meta["dim"]], dtype=np.float32)
    if quantized:
        rows = rows * np.asarray(restored["scales"][:count])[:, None]
    store.append(rows)
    return store


# ---------------------------------------------------------------------------
# Single-chip VectorStore checkpoints (same format; symmetric API)
# ---------------------------------------------------------------------------


def save_vector_store(
    store: VectorStore, path: str | os.PathLike, *, block: bool = True
) -> PendingSave:
    """Checkpoint a (non-mesh or mesh-backed) `vectorstore.VectorStore`.

    Native-dtype device snapshot — bf16/int8 checkpoints are half/quarter
    the bytes of `serialize()`'s f32 host matrix, with no dequantize round
    trip. Mesh-backed stores delegate to the sharded path.
    """
    store._flush()
    if store._mesh is not None:
        return save_sharded_store(store._sharded_store(), path, block=block)
    path = os.fspath(path)
    state_dir = os.path.join(path, _STATE_DIR)
    if os.path.exists(state_dir):
        shutil.rmtree(state_dir)
    os.makedirs(path, exist_ok=True)

    meta = {
        "dim": store._embedding_size,
        "dim_pad": store._dim_pad,
        "dtype": _dtype_name(store._dtype),
        "count": store._count,
        "capacity": int(store._buf.shape[0]) if store._buf is not None else 0,
        "single_chip": True,
    }

    def finalize() -> None:
        with open(os.path.join(path, _META_FILE), "w", encoding="utf-8") as f:
            json.dump(meta, f)

    if store._buf is None:  # empty store: metadata only
        finalize()
        pending = PendingSave(None, lambda: None)
        pending._done = True
        return pending

    state = {"buf": store._buf}
    if store._scales is not None:
        state["scales"] = store._scales
    ckpt = _checkpointer()
    ckpt.save(os.path.abspath(state_dir), state)
    pending = PendingSave(ckpt, finalize)
    if block:
        pending.wait()
    return pending


def restore_vector_store(
    settings: TextEmbeddingIndexSettings, path: str | os.PathLike
) -> VectorStore:
    """Rebuild a `vectorstore.VectorStore` with ``settings`` from a
    checkpoint written by :func:`save_vector_store` (or the sharded saver —
    mesh-backed settings restore through the sharded path)."""
    import jax.numpy as jnp

    from ..vectorstore import VectorStore

    path = os.fspath(path)
    meta = _read_meta(path)
    store = VectorStore(settings)
    if store._mesh is not None:
        inner = restore_sharded_store(store._mesh, path)
        if inner.dim:
            store._set_embedding_size(inner.dim)
        store._sharded = inner
        store._count = len(inner)
        return store
    if not meta.get("count") and not meta.get("capacity"):
        return store  # empty checkpoint
    dtype = _DTYPE_NAMES[meta["dtype"]]
    assert dtype == store._dtype, (meta["dtype"], store.settings.dtype)
    cap, dim_pad = meta["capacity"], meta["dim_pad"]
    device = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    target = {"buf": jax.ShapeDtypeStruct((cap, dim_pad), dtype, sharding=device)}
    if meta["dtype"] == "int8":
        target["scales"] = jax.ShapeDtypeStruct((cap,), jnp.float32, sharding=device)
    restored = _checkpointer().restore(
        os.path.abspath(os.path.join(path, _STATE_DIR)), target
    )
    store._set_embedding_size(meta["dim"])
    store._buf = restored["buf"]
    store._scales = restored.get("scales")
    store._count = meta["count"]
    return store


# ---------------------------------------------------------------------------
# Corpus (multi-conversation) checkpoints
# ---------------------------------------------------------------------------


def save_corpus(
    corpus: CorpusVectorStore,
    path: str | os.PathLike,
    *,
    extra_meta: dict | None = None,
) -> None:
    """Checkpoint a corpus: the sharded matrix + its segment table."""
    segments = [
        {
            "conversation": s.conversation,
            "start": s.start,
            "count": s.count,
            "local_base": s.local_base,
        }
        for s in corpus._segments
    ]
    meta = {
        "segments": segments,
        "search_mode": corpus._store.search_mode,
    }
    if extra_meta:
        meta.update(extra_meta)
    save_sharded_store(corpus._store, path, extra_meta=meta)


def restore_corpus(mesh: Mesh, path: str | os.PathLike) -> CorpusVectorStore:
    meta = _read_meta(path)
    store = restore_sharded_store(mesh, path, _meta=meta)
    store.search_mode = meta.get("search_mode", "exact")
    corpus = CorpusVectorStore(
        meta["dim"], mesh=mesh, dtype=store._dtype,
        search_mode=store.search_mode,
    )
    corpus._store = store
    corpus._segments = [
        _Segment(s["conversation"], s["start"], s["count"], s["local_base"])
        for s in meta.get("segments", [])
    ]
    corpus._local_counts = {}
    for s in corpus._segments:
        corpus._local_counts[s.conversation] = (
            corpus._local_counts.get(s.conversation, 0) + s.count
        )
    return corpus
