"""Deterministic notebook writing for the example builders.

Re-executing a builder used to dirty the tree every time even when the
physics outputs were identical (VERDICT r3 weak #6): nbformat assigns
RANDOM cell ids, and printed wall-clock lines differ per run. This helper
makes rebuilds diff-clean on a fixed backend:

* cell ids become deterministic (``cell-<i>``);
* the freshly executed notebook is compared against the committed file
  with VOLATILE content scrubbed — floating-point numbers on lines that
  mention timings or rates (run_time, photon-steps/s, seconds, compile)
  — and the file is rewritten only when the non-volatile content
  actually changed.

Executing on a *different* backend (CPU smoke vs the chip) legitimately
changes recorded numbers and plots, so that still rewrites — on-chip
evidence is only ever replaced by a run that really differs.
"""

from __future__ import annotations

import copy
import json
import os
import re

import nbformat as nbf

_VOLATILE_LINE = re.compile(
    r"run_time|steps/s|photons/s|photon-steps|seconds|elapsed|compile|"
    r"wall[- ]clock|\bsec\b|\bms\b|/ s\b", re.I)
_FLOAT = re.compile(r"[-+]?\d+\.?\d*(?:[eE][-+]?\d+)?")
_TIMESTAMP = re.compile(  # 2026-08-19 11:45:54,034 / ISO variants
    r"\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}[.,]?\d*")


def _scrub_text(text: str) -> str:
    lines = []
    for line in text.splitlines():
        line = _TIMESTAMP.sub("<ts>", line)
        if _VOLATILE_LINE.search(line):
            line = _FLOAT.sub("<n>", line)
        lines.append(line)
    return "\n".join(lines)


def _scrubbed(book) -> str:
    """Canonical comparison form of a notebook: volatile text normalized,
    transient metadata dropped."""
    book = copy.deepcopy(book)
    for i, cell in enumerate(book.cells):
        cell["id"] = f"cell-{i}"
        cell.get("metadata", {}).pop("execution", None)
        for out in cell.get("outputs", []):
            if "text" in out:
                out["text"] = _scrub_text(out["text"])
            data = out.get("data", {})
            if "text/plain" in data:
                data["text/plain"] = _scrub_text(data["text/plain"])
    book.metadata.pop("language_info", None)
    return json.dumps(book, sort_keys=True, default=str)


def write_executed(book, path: str) -> bool:
    """Write ``book`` to ``path`` unless the committed notebook already has
    the same non-volatile content. Returns True when the file was written."""
    for i, cell in enumerate(book.cells):
        cell["id"] = f"cell-{i}"
    if os.path.exists(path):
        try:
            old = nbf.read(path, as_version=4)
            if _scrubbed(old) == _scrubbed(book):
                print(f"unchanged (volatile-only diff): {path}")
                return False
        except Exception:
            pass  # unreadable existing file: rewrite it
    with open(path, "w") as f:
        nbf.write(book, f)
    print("wrote", path)
    return True
