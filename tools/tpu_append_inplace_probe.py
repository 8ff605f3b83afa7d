"""Real-chip proof that donated appends update HBM in place.

The O(1)-memory append claim (docs/spec/vectorstore: append is a donated
``dynamic_update_slice``, unlike the reference's ``np.concatenate`` copy at
``aitools/vectorbase.py:128,145``) cannot be verified with
``device.memory_stats()`` on this axon attach (it returns ``None``), so this
probe verifies it by construction:

1. allocate a bf16 store buffer at ~45% of usable HBM,
2. allocate a ballast buffer at ~42% of usable HBM,
3. run a ladder of donated appends through ``ops.append.append_rows``.

If a "donated" append actually copied, it would need a second store-sized
allocation — 45+42+45 = 132% of HBM — and RESOURCE_EXHAUST. Appends
completing with the ballast resident, plus spot-checked row contents, is
the in-place proof. The probe prints one JSON line with the append
throughput and the HBM high-water bound (store + ballast + one append
chunk), recorded in NOTES.md.

Run (real chip): ``python tools/tpu_append_inplace_probe.py``
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from typeagent_tpu.ops import append

USABLE_HBM = 15.45 * 2**30  # bench.py's measured v5e-1 allocatable bound
DIM_PAD = 384
CHUNK_ROWS = 65536
N_APPENDS = 16


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    store_bytes = int(USABLE_HBM * 0.45)
    rows = append.round_up(store_bytes // (DIM_PAD * 2), 1024)
    store_bytes = rows * DIM_PAD * 2
    ballast_bytes = int(USABLE_HBM * 0.42)
    ballast_elems = ballast_bytes // 4

    t0 = time.perf_counter()
    buf = append.make_buffer(rows, DIM_PAD, jnp.bfloat16)
    buf.block_until_ready()
    ballast = jnp.ones((ballast_elems,), jnp.float32)
    ballast.block_until_ready()
    alloc_s = time.perf_counter() - t0
    print(
        f"store {store_bytes / 2**30:.2f} GiB ({rows} rows), "
        f"ballast {ballast_bytes / 2**30:.2f} GiB, alloc {alloc_s:.1f}s",
        file=sys.stderr,
    )

    rng = np.random.default_rng(7)
    chunk = rng.standard_normal((CHUNK_ROWS, DIM_PAD)).astype(np.float32)
    count = 0
    t0 = time.perf_counter()
    for i in range(N_APPENDS):
        # Distinct per-step content so the spot check catches offset bugs.
        buf = append.append_rows(buf, jnp.asarray(chunk + i, jnp.bfloat16), count)
        count += CHUNK_ROWS
    buf.block_until_ready()
    append_s = time.perf_counter() - t0

    # Spot-check: last row of every appended chunk round-trips.
    ok = True
    for i in range(N_APPENDS):
        row = np.asarray(buf[(i + 1) * CHUNK_ROWS - 1], np.float32)
        want = (chunk[-1] + i).astype(jnp.bfloat16).astype(np.float32)
        if not np.array_equal(row, want):
            ok = False
    del ballast

    high_water_gib = (store_bytes + ballast_bytes + chunk.nbytes / 2) / 2**30
    print(
        json.dumps(
            {
                "ok": ok,
                "inplace_proven": ok,
                "store_gib": round(store_bytes / 2**30, 2),
                "ballast_gib": round(ballast_bytes / 2**30, 2),
                "hbm_high_water_bound_gib": round(high_water_gib, 2),
                "appended_rows": count,
                "append_s": round(append_s, 3),
                "rows_per_s": round(count / append_s),
            }
        )
    )
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
