"""The static annotation gate runs green (parity role: the reference's
pyright-strict CI step, reference `pyproject.toml` / `.github/workflows`).

Running it from pytest means a plain ``pytest tests/`` enforces it — no
separate CI wiring required for local development.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
CHECKER = REPO / "tools" / "check_types.py"


def test_annotation_gate_is_green():
    proc = subprocess.run(
        [sys.executable, str(CHECKER)], capture_output=True, text=True, cwd=REPO
    )
    assert proc.returncode == 0, f"\n{proc.stdout}\n{proc.stderr}"


def test_gate_catches_a_regression(tmp_path):
    """The gate actually fails on a public unannotated def (self-test)."""
    bad = REPO / "typeagent_tpu" / "_gate_selftest_tmp.py"
    bad.write_text("def totally_public(x):\n    return x\n")
    try:
        proc = subprocess.run(
            [sys.executable, str(CHECKER)], capture_output=True, text=True, cwd=REPO
        )
        assert proc.returncode == 1
        assert "totally_public" in proc.stdout
    finally:
        bad.unlink()
