"""The bundled examples run end-to-end offline.

(Parity role: reference tests/test_demo.py — its demo driver runs under
test.) Each example is executed as a real subprocess so import paths,
sys.path bootstrap, and CLI entry behavior are all exercised.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXAMPLES = [
    ("simple_query_demo.py", ["bach"]),
    ("batch_query_demo.py", []),
    ("sharded_corpus_demo.py", []),
    ("serving_demo.py", ["serving demo ok"]),
]


@pytest.mark.parametrize("script,markers", EXAMPLES, ids=[e[0] for e in EXAMPLES])
def test_example_runs_offline(script, markers):
    env = dict(os.environ)
    # Hermetic: no accidental network keys; CPU mesh like the test suite.
    env.pop("OPENAI_API_KEY", None)
    env.pop("AZURE_OPENAI_API_KEY", None)
    env["TAT_JAX_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script)],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
        env=env,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    out = result.stdout.lower()
    for marker in markers:
        assert marker in out, (marker, result.stdout[-2000:])
