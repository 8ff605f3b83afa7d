#!/usr/bin/env python3
"""Line-similarity self-check against the reference implementation.

Flags files in typeagent_tpu/ whose difflib line-similarity to a same-named
(or known renamed counterpart) reference file exceeds the threshold. Logic
modules should stay below it; the schema contracts (see NOTES.md "On
reference similarity") are allowlisted with their rationale.

Usage: python tools/check_similarity.py [--reference DIR] [--threshold 0.6]
Exits 1 if any non-allowlisted file exceeds the threshold.
"""

from __future__ import annotations

import argparse
import difflib
import os
import sys

# Renamed counterparts the same-name probe would miss.
RENAMES = {
    "typeagent_tpu/knowpro/kplib.py": "src/typeagent/knowpro/knowledge_schema.py",
    "typeagent_tpu/vectorstore.py": "src/typeagent/aitools/vectorbase.py",
    "typeagent_tpu/models/adapters.py": "src/typeagent/aitools/model_adapters.py",
    "typeagent_tpu/models/embeddings.py": "src/typeagent/aitools/embeddings.py",
    "typeagent_tpu/knowpro/fields.py": "src/typeagent/knowpro/field_helpers.py",
}

# Wire/prompt contracts: field names + Doc() text ARE behavior (see NOTES.md).
ALLOWLIST = {
    "typeagent_tpu/knowpro/search_query_schema.py",
    "typeagent_tpu/knowpro/answer_context_schema.py",
    "typeagent_tpu/knowpro/answer_response_schema.py",
    "typeagent_tpu/knowpro/date_time_schema.py",
    "typeagent_tpu/knowpro/kplib.py",
}


def reference_candidates(repo_rel: str, reference: str) -> list[str]:
    fname = os.path.basename(repo_rel)
    sub = os.path.relpath(repo_rel, "typeagent_tpu")
    return [
        os.path.join(reference, p)
        for p in (
            RENAMES.get(repo_rel, ""),
            f"src/typeagent/{sub}",
            f"src/typeagent/knowpro/{fname}",
            f"src/typeagent/aitools/{fname}",
            f"tools/{fname}",
            f"src/typeagent/storage/memory/{fname}",
            f"src/typeagent/storage/sqlite/{fname}",
        )
        if p
    ]


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--reference", default="/root/reference")
    parser.add_argument("--threshold", type=float, default=0.6)
    args = parser.parse_args()

    failures = 0
    for root, dirs, files in os.walk("typeagent_tpu"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            mine = os.path.join(root, f)
            ref = next(
                (c for c in reference_candidates(mine, args.reference)
                 if os.path.exists(c)),
                None,
            )
            if ref is None:
                continue
            a = open(mine).read().splitlines()
            b = open(ref).read().splitlines()
            ratio = difflib.SequenceMatcher(None, a, b).ratio()
            if ratio <= args.threshold:
                continue
            status = "allowed (schema contract)" if mine in ALLOWLIST else "FLAGGED"
            print(f"{ratio:.2f}  {mine}  <->  {os.path.relpath(ref, args.reference)}"
                  f"  [{status}]")
            if mine not in ALLOWLIST:
                failures += 1
    if failures:
        print(f"\n{failures} file(s) above threshold — restructure them.")
        return 1
    print("similarity check OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
