"""Version with git-derived dev suffix.

Parity with the reference's scheme (/root/reference/xitorch/version.py:1-62):
release builds carry the plain base version; working-tree builds append
``.dev0+g<short-hash>[.dirty]`` derived from git at import time.  The git
probe is best-effort — any failure (no git, not a checkout, packaged
install) silently falls back to the base version, and the result is cached
so the subprocess runs at most once per process.
"""
from __future__ import annotations

import os
import subprocess

_BASE_VERSION = "0.2.0"
_RELEASE = False  # flip for tagged releases: suppresses the dev suffix


def _git_version(base: str) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        def run(*args: str) -> str:
            return subprocess.run(
                ["git", *args], cwd=here, capture_output=True, text=True,
                timeout=5, check=True).stdout.strip()

        # only report a hash if the discovered repo actually tracks THIS
        # package — a pip-installed copy inside some unrelated checkout
        # (e.g. a project-local venv) would otherwise report the user's
        # repo hash and run `git status` over their whole working tree
        # (raises -> base if the file is untracked)
        run("ls-files", "--error-unmatch", os.path.abspath(__file__))
        short = run("rev-parse", "--short", "HEAD")
        dirty = bool(run("status", "--porcelain", "--untracked-files=no"))
        return "%s.dev0+g%s%s" % (base, short, ".dirty" if dirty else "")
    except Exception:
        return base


__version__ = _BASE_VERSION if _RELEASE else _git_version(_BASE_VERSION)
