#!/usr/bin/env python
"""Executable lint gate for this image (no ruff/mypy available here).

Runs everywhere Python runs, so the lint contract is testable in CI *and*
in this image (tests/test_lint_gate.py executes it as part of the suite;
.github/workflows/lint.yml runs it before the full ruff/mypy steps, which
execute only where those tools exist).  Implements the load-bearing subset
of the promised ruff rules (pyproject [tool.ruff]):

* syntax: every file must compile (py_compile)
* E501  line longer than 100 chars
* E722  bare ``except:``
* F401  unused import (exempt: ``__init__.py``, any line carrying
  ``# noqa``, names re-exported via ``__all__``)
* W191  tab indentation
* W291/W293 trailing whitespace

Usage: ``python tools/lint.py`` (from the repo root) — exits non-zero with
a report when violations exist.
"""
from __future__ import annotations

import ast
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
TARGETS = ["xitorch_tpu", "tests", "benchmarks", "examples", "tools",
           "bench.py", "__graft_entry__.py"]
MAX_LINE = 100


def _iter_files():
    for t in TARGETS:
        p = ROOT / t
        if p.is_file():
            yield p
        else:
            yield from sorted(p.rglob("*.py"))


def _imported_names(node):
    """(local-name, lineno) pairs bound by an import statement."""
    out = []
    if isinstance(node, ast.Import):
        for a in node.names:
            name = a.asname or a.name.split(".")[0]
            out.append((name, node.lineno))
    elif isinstance(node, ast.ImportFrom):
        if node.module == "__future__":
            return out
        for a in node.names:
            if a.name == "*":
                continue
            out.append((a.asname or a.name, node.lineno))
    return out


def _used_names(tree):
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # a.b.c -> record the root name
            inner = node
            while isinstance(inner, ast.Attribute):
                inner = inner.value
            if isinstance(inner, ast.Name):
                used.add(inner.id)
        elif (isinstance(node, ast.Assign)
              and any(isinstance(t, ast.Name) and t.id == "__all__"
                      for t in node.targets)):
            for c in ast.walk(node.value):
                if isinstance(c, ast.Constant) and isinstance(c.value, str):
                    used.add(c.value)
    return used


def check_file(path: Path):
    errors = []
    rel = path.relative_to(ROOT)
    src = path.read_text()
    try:
        compile(src, str(path), "exec")
    except SyntaxError as e:
        return ["%s:%s: syntax error: %s" % (rel, e.lineno, e.msg)]

    lines = src.splitlines()
    for i, line in enumerate(lines, 1):
        if len(line) > MAX_LINE:
            errors.append("%s:%d: E501 line too long (%d > %d)"
                          % (rel, i, len(line), MAX_LINE))
        if line != line.rstrip():
            errors.append("%s:%d: W291 trailing whitespace" % (rel, i))
        stripped = line.lstrip(" ")
        if stripped.startswith("\t") or line.startswith("\t"):
            errors.append("%s:%d: W191 tab indentation" % (rel, i))

    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            errors.append("%s:%d: E722 bare except" % (rel, node.lineno))

    if path.name != "__init__.py":
        used = _used_names(tree)
        for node in ast.walk(tree):
            for name, lineno in _imported_names(node):
                if name in used or name == "_":
                    continue
                if "# noqa" in lines[lineno - 1]:
                    continue
                errors.append("%s:%d: F401 '%s' imported but unused"
                              % (rel, lineno, name))
    return errors


def main() -> int:
    all_errors = []
    nfiles = 0
    for path in _iter_files():
        nfiles += 1
        all_errors.extend(check_file(path))
    if all_errors:
        print("\n".join(all_errors))
        print("\nlint gate: %d violation(s) across %d files"
              % (len(all_errors), nfiles))
        return 1
    print("lint gate: OK (%d files)" % nfiles)
    return 0


if __name__ == "__main__":
    sys.exit(main())
