"""The bundled examples run end-to-end offline.

(Parity role: reference tests/test_demo.py — its demo driver runs under
test.) One example runs as a real standalone subprocess to prove import
paths, sys.path bootstrap, and CLI entry behavior; the rest share a second
subprocess (via runpy, each still executing as ``__main__``) so the suite
pays the ~3.5 s jax import once instead of per demo.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXAMPLES = [
    ("simple_query_demo.py", ["bach"]),
    ("batch_query_demo.py", []),
    ("sharded_corpus_demo.py", []),
    ("serving_demo.py", ["serving demo ok"]),
    ("ivf_demo.py", ["ivf demo ok"]),
]


def _offline_env() -> dict[str, str]:
    env = dict(os.environ)
    # Hermetic: no accidental network keys; CPU mesh like the test suite.
    env.pop("OPENAI_API_KEY", None)
    env.pop("AZURE_OPENAI_API_KEY", None)
    env["TAT_JAX_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    return env


def test_example_standalone_subprocess():
    script, markers = EXAMPLES[0]
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script)],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
        env=_offline_env(),
    )
    assert result.returncode == 0, result.stderr[-2000:]
    out = result.stdout.lower()
    for marker in markers:
        assert marker in out, (marker, result.stdout[-2000:])


def test_remaining_examples_run_offline():
    driver = (
        "import runpy, sys\n"
        "for script in sys.argv[1:]:\n"
        "    print('=== RUNNING', script, flush=True)\n"
        "    runpy.run_path(script, run_name='__main__')\n"
        "    print('=== DONE', script, flush=True)\n"
    )
    scripts = [os.path.join(REPO, "examples", s) for s, _ in EXAMPLES[1:]]
    result = subprocess.run(
        [sys.executable, "-c", driver, *scripts],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
        env=_offline_env(),
    )
    assert result.returncode == 0, result.stderr[-2000:]
    out = result.stdout.lower()
    for script, markers in EXAMPLES[1:]:
        assert f"=== done {os.path.join(REPO, 'examples', script)}".lower() in out
        for marker in markers:
            assert marker in out, (marker, result.stdout[-2000:])
