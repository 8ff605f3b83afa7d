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
