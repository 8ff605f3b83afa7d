"""Probe: segmented postings accumulation cost on the real TPU.

Hypothesis: the engine's device call is scatter-bound (XLA TPU lowers
scatter-add with data-dependent indices to a serial loop), which would
explain the engine's ~1.4 s per 16-query call at 100k semrefs.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from typeagent_tpu.ops.postings import DevicePostingsIndex

    log("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    n_semrefs = 100_000
    n_terms = 5_000
    idx = DevicePostingsIndex()
    # ~2M postings, zipf-ish sizes
    sizes = np.minimum((rng.pareto(1.2, n_terms) * 50).astype(int) + 5, 4000)
    for t in range(n_terms):
        refs = rng.integers(0, n_semrefs, sizes[t])
        for r in refs[:200]:  # cap per-term host loop cost
            idx.add_term(f"term{t}", int(r))
    idx.build()
    log(f"postings built: {idx.posting_count}")

    ktype = rng.integers(0, 4, n_semrefs).astype(np.int8)
    ops = []
    n_seg = 128
    for i in range(256):
        ops.append((i * 17 % n_terms, 1.0, i % n_seg, i % 2, i, -1, 0))

    t0 = time.perf_counter()
    out = idx.lookup_ops_sparse(ops, n_seg, ktype)
    log(f"sparse first call (compile+run): {time.perf_counter() - t0:.1f}s")
    for _ in range(3):
        t0 = time.perf_counter()
        out = idx.lookup_ops_sparse(ops, n_seg, ktype)
        log(f"sparse warm: {(time.perf_counter() - t0) * 1000:.0f} ms")
    assert out is not None


if __name__ == "__main__":
    main()
