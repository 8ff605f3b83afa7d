"""bench.py abort-proof harness: the parent must emit one valid JSON line
no matter what happens to the device sections (round-4 verdict: BENCH_r04
lost every number to a single TPU backend abort — parsed=null).

These tests run the REAL parent/child subprocess machinery at tiny scale on
the CPU backend; the dead-backend path is forced via TAT_BENCH_FORCE_FAIL.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _env(tmp_path, **extra):
    env = dict(os.environ)
    # CPU-only children must not dial the axon relay: with the pool IPs
    # present, backend init blocks on the tunnel even under
    # JAX_PLATFORMS=cpu when the relay is wedged (observed live).
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(
        JAX_PLATFORMS="cpu",
        TAT_BENCH_SCALE="0.002",
        TAT_BENCH_ROUNDS="1",
        TAT_BENCH_SERVE_ROUNDS="1",
        TAT_BENCH_LAST_GOOD=str(tmp_path / "last_good.json"),
    )
    env.update(extra)
    return env


def _run(env, timeout=900):
    proc = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, (
        f"parent must print exactly one stdout line, got {lines!r}\n"
        f"stderr tail: {proc.stderr[-2000:]}"
    )
    return json.loads(lines[0]), proc


@pytest.mark.slow
def test_bench_smoke_all_sections(tmp_path):
    parsed, proc = _run(_env(tmp_path))
    assert parsed["unit"] == "QPS"
    assert parsed["value"] > 0
    assert parsed["vs_baseline"] > 0
    assert "sections failed" not in parsed["metric"], parsed["metric"]
    # The last-good cache was written (explicit override path).
    with open(tmp_path / "last_good.json") as f:
        cached = json.load(f)
    assert cached["headline"]["value"] == parsed["value"]
    assert set(cached["sections"]) == {"A", "B1M", "B10M", "SERVE"}
    # Serving ladder measured (stderr log carries the detail).
    assert "serving" in cached["sections"]["SERVE"]


@pytest.mark.slow
def test_bench_partial_failure_still_emits_headline(tmp_path):
    # The 10M section dies (every attempt): the headline must still come
    # from the surviving sections and NAME the failed one.
    parsed, _ = _run(_env(tmp_path, TAT_BENCH_FORCE_FAIL="B10M"))
    assert parsed["value"] > 0
    assert "sections failed: B10M" in parsed["metric"]


def test_bench_dead_backend_emits_diagnostic_json(tmp_path):
    # All sections fail, no last-good cache: the parent must still print a
    # parsable JSON line that says the backend is dead.
    parsed, _ = _run(
        _env(tmp_path, TAT_BENCH_FORCE_FAIL="A,B1M,B10M,SERVE"),
        timeout=600,
    )
    assert parsed["value"] == 0.0
    assert "BACKEND DEAD" in parsed["metric"]
    assert "no last-good cache" in parsed["metric"]


def test_bench_dead_backend_carries_last_good(tmp_path):
    # With a cached headline present, a dead run reports the cached value
    # and labels it as such.
    cache = tmp_path / "last_good.json"
    cache.write_text(
        json.dumps(
            {
                "ts": 0,
                "headline": {
                    "metric": "cosine top-10 QPS (cached)",
                    "value": 12345.0,
                    "unit": "QPS",
                    "vs_baseline": 99.0,
                },
                "sections": {},
            }
        )
    )
    parsed, _ = _run(
        _env(tmp_path, TAT_BENCH_FORCE_FAIL="A,B1M,B10M,SERVE"),
        timeout=600,
    )
    assert parsed["value"] == 12345.0
    assert parsed["vs_baseline"] == 99.0
    assert "LAST-GOOD" in parsed["metric"]
    assert "cosine top-10 QPS (cached)" in parsed["metric"]
