"""Mechanical driver-window rotation (VERDICT r12 next-round #2 + #8).

The real driver oracle-checks only the FIRST 50 registry keys each
round (every CORRECTNESS_r*.json holds exactly 50 entries), so
registry order IS the verification schedule. Through r12 the window
was a hand-maintained list in ``__init__.py`` — a once-per-round edit
that r11 forgot mid-round, stalling the staleness ladder. From r13
the window is DERIVED from the recorded history:

1. Keys whose plan/code changed this round (the hand-declared
   ``changed`` list — the one judgment call automation can't make)
   verify first.
2. Any key whose NEWEST recorded check failed is promoted next —
   a red key must never wait out a rotation cycle.
3. Everything else sorts stalest-first: ascending by the newest
   round in which a CORRECTNESS_r*.json recorded the key, ties
   alphabetical. Keys never recorded rank stalest of all (round 0).

The derivation reads the committed CORRECTNESS_r*.json files at
import time (cheap: a few KB of JSON); with no history present the
window degrades to changed-keys + alphabetical, still deterministic.
tests/test_rotation.py pins both the unit semantics and the actual
r13 window against the real history files.
"""

from __future__ import annotations

import json
import os
import re

#: repo root = parent of the package directory; the CORRECTNESS files
#: are driver-written siblings of the package.
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def correctness_history(repo_root: str = REPO_ROOT) -> dict[str, tuple[int, bool]]:
    """{key: (newest round the real driver checked it, that check ok)}.

    "ok" = the hash gate passed, or the key is a sanctioned rows-only
    entry (err mentions ``no_oracle``) whose Spark side produced rows.
    A malformed or unreadable history file is skipped — rotation must
    never break the registry import.
    """
    hist: dict[str, tuple[int, bool]] = {}
    try:
        names = os.listdir(repo_root)
    except OSError:
        return hist
    for fn in sorted(names):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fn)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(os.path.join(repo_root, fn)) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for key, rec in data.items():
            if not isinstance(rec, dict):
                continue
            ok = bool(rec.get("hash_match")) or (
                "no_oracle" in str(rec.get("err") or "")
                and rec.get("spark_rows", -1) >= 0
            )
            prev = hist.get(key)
            if prev is None or rnd >= prev[0]:
                hist[key] = (rnd, ok)
    return hist


def compute_driver_window(
    keys: list[str],
    changed: list[str],
    history: dict[str, tuple[int, bool]] | None = None,
    size: int = 50,
) -> list[str]:
    """The next driver window: changed-first, then failed-last-check,
    then stalest-first (ascending newest-check round, ties
    alphabetical), truncated to ``size``."""
    if history is None:
        history = correctness_history()
    changed_in = [k for k in changed if k in set(keys)]
    changed_set = set(changed_in)

    def rank(key: str) -> tuple[int, int, str]:
        rnd, ok = history.get(key, (0, True))
        return (0 if not ok else 1, rnd, key)

    rest = sorted((k for k in keys if k not in changed_set), key=rank)
    return (changed_in + rest)[:size]
