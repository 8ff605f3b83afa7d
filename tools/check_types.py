#!/usr/bin/env python3
"""Static type-annotation gate for typeagent_tpu/ (CI + `make typecheck`).

The reference gates on pyright strict in CI (reference `pyproject.toml`);
this image ships no pyright/mypy and installs are off-limits, so this is an
AST-based gate that enforces the part of strict mode that catches real
regressions and is decidable without a constraint solver:

* **Tier 1 — public API, zero tolerance.** Every public (non-underscore)
  function/method at module or class level must annotate every parameter
  (``self``/``cls`` exempt) and its return type (``__init__`` exempt).
* **Tier 2 — everything else, ratchet.** Private/dunder-internal defs are
  counted per file against the committed baseline
  (``tools/type_baseline.json``). Any file whose incomplete-def count RISES
  fails the gate; improvements print a reminder to re-pin the baseline
  (``--update-baseline``) so the ratchet only ever tightens.

Nested (closure) defs are exempt in both tiers: they are locals, their types
flow from the enclosing scope, and annotating Pallas kernel inner functions
(``def kernel(q_ref, emb_ref, out_ref)``) is pure noise.

Exit 0 = clean. Exit 1 = violations (each printed as file:line).
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PACKAGE = REPO / "typeagent_tpu"
BASELINE_FILE = Path(__file__).resolve().parent / "type_baseline.json"


def iter_defs(tree: ast.Module):
    """Yield (def_node, dotted_name, enclosing_class_private) for every
    module-level and class-level def. Nested function bodies are not
    descended into."""

    def walk(node: ast.AST, prefix: str, private_cls: bool):
        for child in ast.iter_child_nodes(node):
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                yield child, prefix + child.name, private_cls
            elif isinstance(child, ast.ClassDef):
                yield from walk(
                    child,
                    prefix + child.name + ".",
                    private_cls or child.name.startswith("_"),
                )

    yield from walk(tree, "", False)


def missing_annotations(fn: ast.FunctionDef | ast.AsyncFunctionDef) -> list[str]:
    """Names of unannotated parameters plus 'return' if the return type is
    missing (``__init__`` exempt: its return is always None)."""
    args = fn.args
    missing = [
        a.arg
        for a in args.posonlyargs + args.args + args.kwonlyargs
        if a.annotation is None and a.arg not in ("self", "cls")
    ]
    if args.vararg is not None and args.vararg.annotation is None:
        missing.append("*" + args.vararg.arg)
    if args.kwarg is not None and args.kwarg.annotation is None:
        missing.append("**" + args.kwarg.arg)
    if fn.returns is None and fn.name != "__init__":
        missing.append("return")
    return missing


def is_public(dotted: str, leaf: str, private_cls: bool) -> bool:
    if private_cls:
        return False
    if any(part.startswith("_") for part in dotted.split(".")[:-1]):
        return False
    if leaf.startswith("__") and leaf.endswith("__"):
        return True  # dunders on public classes are API (e.g. __aexit__)
    return not leaf.startswith("_")


def scan() -> tuple[list[str], dict[str, int]]:
    """Returns (tier-1 violations, tier-2 per-file incomplete counts)."""
    violations: list[str] = []
    counts: dict[str, int] = {}
    for path in sorted(PACKAGE.rglob("*.py")):
        rel = str(path.relative_to(REPO))
        tree = ast.parse(path.read_text(), filename=rel)
        for fn, dotted, private_cls in iter_defs(tree):
            missing = missing_annotations(fn)
            if not missing:
                continue
            if is_public(dotted, fn.name, private_cls):
                violations.append(
                    f"{rel}:{fn.lineno} public `{dotted}` missing: "
                    + ", ".join(missing)
                )
            else:
                counts[rel] = counts.get(rel, 0) + 1
    return violations, counts


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument(
        "--update-baseline",
        action="store_true",
        help="Re-pin tools/type_baseline.json to the current tier-2 counts",
    )
    args = parser.parse_args()

    violations, counts = scan()
    failed = False

    if violations:
        failed = True
        print(f"TIER 1: {len(violations)} public defs missing annotations:")
        for v in violations:
            print("  " + v)

    if args.update_baseline:
        BASELINE_FILE.write_text(json.dumps(counts, indent=1, sort_keys=True) + "\n")
        print(f"Baseline re-pinned: {sum(counts.values())} private incomplete defs "
              f"across {len(counts)} files -> {BASELINE_FILE}")
        return 1 if failed else 0

    baseline: dict[str, int] = {}
    if BASELINE_FILE.exists():
        baseline = json.loads(BASELINE_FILE.read_text())
    regressions = {
        f: (baseline.get(f, 0), n) for f, n in counts.items() if n > baseline.get(f, 0)
    }
    if regressions:
        failed = True
        print(f"TIER 2: annotation-count regressions vs {BASELINE_FILE.name}:")
        for f, (was, now) in sorted(regressions.items()):
            print(f"  {f}: {was} -> {now} incomplete private defs")
    improvements = {
        f: (b, counts.get(f, 0)) for f, b in baseline.items() if counts.get(f, 0) < b
    }
    if improvements and not failed:
        print(
            f"{len(improvements)} file(s) improved vs baseline — tighten the "
            "ratchet: python tools/check_types.py --update-baseline"
        )

    total = sum(counts.values())
    print(
        f"typecheck: {'FAIL' if failed else 'ok'} "
        f"(public API clean: {not violations}; "
        f"{total} private incomplete defs vs baseline {sum(baseline.values())})"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    os.chdir(REPO)
    sys.exit(main())
