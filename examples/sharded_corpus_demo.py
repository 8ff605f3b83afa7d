"""Multi-conversation corpus search over a device mesh.

Runs anywhere: on a TPU slice the rows shard across chips with an all_gather
top-k merge over ICI; here it uses whatever devices exist (set
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu for a
virtual 8-device mesh on CPU).

    python examples/sharded_corpus_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from typeagent_tpu.parallel import create_mesh
from typeagent_tpu.parallel.corpus import CorpusVectorStore

import jax

devices = jax.devices()
n_shard = max(1, len(devices) // 2)
n_dp = max(1, len(devices) // n_shard)
mesh = create_mesh(n_shard=n_shard, n_dp=n_dp)
print(f"mesh: {mesh} over {len(devices)} device(s)")

corpus = CorpusVectorStore(dim=256, mesh=mesh)
rng = np.random.default_rng(0)
stored: dict[str, np.ndarray] = {}
for name, n_fragments in [("support-tickets", 4000), ("design-docs", 2500), ("meeting-notes", 1500)]:
    rows = rng.standard_normal((n_fragments, 256)).astype(np.float32)
    stored[name] = rows
    corpus.append(name, rows)
print(f"corpus: {len(corpus)} fragments across {corpus.conversations}")

# Cross-corpus search: one fused lookup over everything.
query = stored["design-docs"][42:43]  # raw (unnormalized) — the store handles it
[hits] = corpus.search(query, k=3)
for h in hits:
    print(f"  {h.conversation}#{h.local_ordinal}  score={h.score:.3f}")
assert hits[0].conversation == "design-docs" and hits[0].local_ordinal == 42

# Scoped search: EXACT — the target segments become a device-side row mask
# sharded with the matrix (same fused SPMD scan as a global search).
[scoped] = corpus.search(query, k=3, conversations=["meeting-notes"])
assert all(h.conversation == "meeting-notes" for h in scoped)
print(f"scoped to meeting-notes: top score {scoped[0].score:.3f}")

# Sharding-aware checkpoint: every shard writes in parallel; restores into
# any mesh topology (save on 8 devices, resume on 1).
import tempfile

from typeagent_tpu.parallel import create_mesh, restore_corpus, save_corpus

with tempfile.TemporaryDirectory() as ckpt_dir:
    save_corpus(corpus, ckpt_dir)
    resumed = restore_corpus(create_mesh(n_shard=1, n_dp=1), ckpt_dir)
    [hits2] = resumed.search(query, k=1)
    assert hits2[0].conversation == "design-docs" and hits2[0].local_ordinal == 42
    print(f"checkpoint restored onto 1 device: {len(resumed)} fragments, self-match OK")
print("OK")
