"""Hermeticity tests for the driver entry points (__graft_entry__.py).

The multi-chip dry run must validate sharding on the virtual host platform
without ever initializing a TPU/accelerator client — round 1's gate failure
was exactly a TPU-client env skew killing a CPU-only dry run. We prove
hermeticity by running the dry run in a subprocess with a poisoned
accelerator environment: if any code path touches the non-CPU backend, the
subprocess fails.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run_dryrun(extra_env: dict[str, str]) -> subprocess.CompletedProcess:
    env = os.environ.copy()
    # Start from a clean platform slate, then poison.
    env.pop("TAT_TEST_TPU", None)
    env.pop("TAT_JAX_PLATFORM", None)
    # Same 4 stages, 10% corpus: full scale is the driver gate's job and
    # costs ~20 s per subprocess on a single CPU core.
    env.setdefault("TAT_DRYRUN_SCALE", "0.1")
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, str(REPO / "__graft_entry__.py"), "multichip", "8"],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=str(REPO),
    )


def test_dryrun_multichip_poisoned_tpu_env():
    """Dry run succeeds even when the accelerator plugin env is broken.

    JAX_PLATFORMS pointing at a nonexistent plugin would make any default-
    backend initialization raise — the dry run must pin cpu before that
    can happen.
    """
    proc = _run_dryrun({"JAX_PLATFORMS": "no_such_platform_xyz"})
    assert proc.returncode == 0, f"stderr:\n{proc.stderr}\nstdout:\n{proc.stdout}"
    assert "dryrun_multichip OK" in proc.stdout


def test_dryrun_multichip_default_env():
    """Dry run succeeds with the ambient environment (driver invocation)."""
    proc = _run_dryrun({})
    assert proc.returncode == 0, f"stderr:\n{proc.stderr}\nstdout:\n{proc.stdout}"
    assert "dryrun_multichip OK" in proc.stdout
