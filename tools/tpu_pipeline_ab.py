"""Interleaved A/B of engine dispatch coalescing on the concurrent ladder.

Measures the full 4-stage ``query()`` pipeline (deterministic stage 1) at N
concurrent workers with TAT_ENGINE_COALESCE flipped between timed segments
in ONE process — per-process A/Bs are useless on this attach (tunnel drift
swamps them, NOTES.md "Threaded plan groups"). Prints one JSON line with
per-pair QPS and the batcher's coalescing counters.

Run (real chip): ``python tools/tpu_pipeline_ab.py [--messages 2000]
[--queries 128] [--concurrency 64] [--pairs 3]``
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import random
import sys
import time

sys.path.insert(0, ".")

from typeagent_tpu.tools.benchmark_pipeline import (  # noqa: E402
    make_search_queries,
    run_pipeline_concurrent,
)
from typeagent_tpu.tools.benchmark_engine import build_conversation  # noqa: E402
from typeagent_tpu.utils.metrics import MetricsRegistry  # noqa: E402


async def amain() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--messages", type=int, default=2000)
    parser.add_argument("--queries", type=int, default=128)
    parser.add_argument("--concurrency", type=int, default=64)
    parser.add_argument("--pairs", type=int, default=3)
    parser.add_argument("--seed", type=int, default=11)
    args = parser.parse_args()

    rng = random.Random(args.seed)
    t0 = time.perf_counter()
    conv = await build_conversation(args.messages, rng)
    print(
        f"conversation: {args.messages} messages "
        f"({time.perf_counter() - t0:.1f}s build)",
        file=sys.stderr,
    )
    queries = make_search_queries(args.queries, rng)

    async def segment(mode: str) -> float:
        os.environ["TAT_ENGINE_COALESCE"] = mode
        t0 = time.perf_counter()
        await run_pipeline_concurrent(
            conv, queries, True, MetricsRegistry(), args.concurrency
        )
        return args.queries / (time.perf_counter() - t0)

    # Warm both modes with one full untimed segment each: coalescing fuses
    # plans into NEW (bigger) batch-shape buckets whose first compile must
    # not land in a timed segment.
    for mode in ("1", "0"):
        t0 = time.perf_counter()
        await segment(mode)
        print(
            f"warm mode={mode}: {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )

    pairs = []
    for i in range(args.pairs):
        on = await segment("1")
        off = await segment("0")
        pairs.append({"on_qps": round(on, 1), "off_qps": round(off, 1)})
        print(f"pair {i}: on {on:.1f} QPS, off {off:.1f} QPS", file=sys.stderr)

    batcher = getattr(conv, "_engine_batcher", None)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    on_med = med([p["on_qps"] for p in pairs])
    off_med = med([p["off_qps"] for p in pairs])
    print(
        json.dumps(
            {
                "concurrency": args.concurrency,
                "pairs": pairs,
                "on_qps_median": on_med,
                "off_qps_median": off_med,
                "speedup": round(on_med / off_med, 2),
                "batcher": batcher.stats() if batcher else None,
            }
        )
    )


if __name__ == "__main__":
    asyncio.run(amain())
