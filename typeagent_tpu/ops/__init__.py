"""Device kernels: fused cosine top-k, buffer append programs.

This is the data plane that replaces the reference's serial numpy kernel
(`aitools/vectorbase.py:163-230` in microsoft/typeagent-py).
"""

from .topk import cosine_topk, cosine_scores, subset_cosine_topk
from .append import append_rows, grow_buffer, make_buffer

__all__ = [
    "cosine_topk",
    "cosine_scores",
    "subset_cosine_topk",
    "append_rows",
    "grow_buffer",
    "make_buffer",
]
