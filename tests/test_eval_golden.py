"""Golden eval runs hermetically through BOTH query engines.

The 13 pinned stage-1 outputs exercise entity or_max groups, facet halves,
pronoun skips, actor scopes with the verbless fallback, multi-expression
queries and date scoping — the committed goldens pin ordinals and message
matches for each, through the device engine AND the host VM.
"""

import pytest

from typeagent_tpu.tools.eval_golden import run_eval


@pytest.mark.parametrize("device", [True, False], ids=["device", "host-vm"])
async def test_golden_eval_matches(device):
    assert await run_eval(update=False, use_device_executor=device) == 0


async def test_golden_eval_matches_with_approx_lookups():
    """The approx serving mode reproduces the committed goldens (CPU
    approx_max_k is near-exact; this pins the plumbing, not the recall)."""
    assert await run_eval(update=False, search_mode="approx") == 0
