#!/usr/bin/env python
"""Mechanical end-of-round closing gate (VERDICT r9 item 2).

Two rounds in a row the snapshot commit carried an engine code change
with no verification artifact dated after it (r8: graph.py; r9:
aggregates.py). This tool makes the closing receipt mechanical: run it
as the round's LAST act, after the final code edit and before the
final commit.

What it does:
  (a) runs the full pytest suite,
  (b) runs tools/driver_sim.py on every registry key whose
      implementing file changed since the last closing receipt
      (or the FULL registry when shared infrastructure changed),
  (c) runs the FULL registry driver_sim at the BENCH scale factor
      sf0.1 (VERDICT r10 item 3 — the final-tree receipt must cover
      every key at the SF the bench anchors are quoted at, not just
      sf0.001 + changed keys),
  (d) writes tools/receipts/pytest_r{N}_closing.txt,
      tools/receipts/driver_sim_r{N}_closing.txt and
      tools/receipts/driver_sim_r{N}_sf01_final.txt, stamped with
      the HEAD sha + dirty state they verified.

Usage:  python tools/closing_gate.py <round>          # e.g. 10
Env:    CLOSING_BASE=<sha>   override the diff base commit
        CLOSING_SKIP_PYTEST=1  (receipts must then come from an
        equally-fresh manual run — only for re-running the sim half)
        CLOSING_SKIP_SF01=1  skip the full sf0.1 sweep (same rule:
        an equally-fresh manual receipt must exist)

Exit status is non-zero if pytest or driver_sim fails, so the gate
can never green-wash a red tree.
"""
import inspect
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECEIPTS = os.path.join(REPO, "tools", "receipts")
sys.path.insert(0, REPO)

#: Paths (repo-relative prefixes) whose change invalidates EVERY key —
#: shared plumbing that no single key "implements".
INFRA_PREFIXES = (
    "__spark_entry__.py",
    "bigdataprojectspring16_spark/__init__.py",
    "bigdataprojectspring16_spark/registry.py",
    "bigdataprojectspring16_spark/session.py",
    "bigdataprojectspring16_spark/sql.py",
    "bigdataprojectspring16_spark/tables.py",
    "bigdataprojectspring16_spark/plans/",
    "bigdataprojectspring16_spark/functions/money.py",
    "bigdataprojectspring16_spark/functions/hashing.py",
)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=False
    ).stdout.strip()


def find_base() -> str:
    """The commit the 'changed since last receipt' diff runs against."""
    env = os.environ.get("CLOSING_BASE")
    if env:
        return env
    # Newest commit that touched a closing receipt — that tree was
    # verified, so only changes after it need re-verification.
    sha = _git(
        "log", "-n1", "--format=%H", "--", "tools/receipts/*_closing.txt"
    )
    if sha:
        return sha
    # First round using the gate: fall back to the last round-boundary
    # artifact commit written by the driver.
    sha = _git("log", "-n1", "--format=%H", "--grep", "verdict/advice")
    return sha or _git("rev-list", "--max-parents=0", "HEAD")


def changed_files(base: str) -> list[str]:
    files = set(_git("diff", "--name-only", base, "HEAD").splitlines())
    # Uncommitted work counts — the gate runs BEFORE the final commit.
    for line in _git("status", "--porcelain").splitlines():
        files.add(line[3:].split(" -> ")[-1])
    return sorted(f for f in files if f)


def keys_for(files: list[str]) -> tuple[list[str], bool]:
    """Map changed files to registry keys; True = infra changed."""
    import bigdataprojectspring16_spark as eng

    key_file = {}
    for key, fn in eng.QUERIES.items():
        src = inspect.getsourcefile(fn)
        key_file[key] = os.path.relpath(src, REPO) if src else ""
    changed = set(files)
    infra = any(
        f.startswith(INFRA_PREFIXES) or f in INFRA_PREFIXES for f in changed
    )
    keys = sorted(k for k, f in key_file.items() if f in changed)
    return keys, infra


def run_to_receipt(cmd: list[str], receipt: str, header: str) -> int:
    os.makedirs(RECEIPTS, exist_ok=True)
    path = os.path.join(RECEIPTS, receipt)
    with open(path, "w") as out:
        out.write(header)
        out.flush()
        proc = subprocess.run(
            cmd, cwd=REPO, stdout=out, stderr=subprocess.STDOUT, check=False
        )
        out.write(f"\n[closing_gate] exit status: {proc.returncode}\n")
    print(f"wrote {os.path.relpath(path, REPO)} (exit {proc.returncode})")
    return proc.returncode


def main() -> int:
    if len(sys.argv) != 2 or not sys.argv[1].isdigit():
        print(__doc__)
        return 2
    rnd = int(sys.argv[1])
    base = find_base()
    head = _git("rev-parse", "HEAD")
    dirty = _git("status", "--porcelain")
    files = changed_files(base)
    keys, infra = keys_for(files)
    header = (
        f"closing gate r{rnd}\n"
        f"HEAD: {head}{' (dirty working tree)' if dirty else ''}\n"
        f"base: {base}\n"
        f"changed files since base ({len(files)}):\n"
        + "".join(f"  {f}\n" for f in files)
        + (
            "infra changed -> FULL registry driver_sim\n"
            if infra
            else f"keys to re-verify ({len(keys)}): {' '.join(keys) or '(none)'}\n"
        )
        + "=" * 60
        + "\n"
    )
    print(header)

    status = 0
    if os.environ.get("CLOSING_SKIP_PYTEST") == "1":
        print("CLOSING_SKIP_PYTEST=1 — pytest half skipped (no receipt)")
    else:
        status |= run_to_receipt(
            [sys.executable, "-m", "pytest", "tests/", "-q"],
            f"pytest_r{rnd:02d}_closing.txt",
            header,
        )

    sim_cmd = [sys.executable, "tools/driver_sim.py"]
    skip_changed_half = False
    if not infra:
        if not keys:
            print("no engine changes since base — driver_sim half skipped")
            with open(
                os.path.join(RECEIPTS, f"driver_sim_r{rnd:02d}_closing.txt"),
                "w",
            ) as out:
                out.write(header + "no engine changes — nothing to re-verify\n")
            skip_changed_half = True
        else:
            sim_cmd += keys
    if not skip_changed_half:
        status |= run_to_receipt(
            sim_cmd, f"driver_sim_r{rnd:02d}_closing.txt", header
        )

    # (c) full-registry sweep at the bench SF — the final-tree receipt
    # the judge reads against the sf0.1 anchors (VERDICT r10 item 3).
    if os.environ.get("CLOSING_SKIP_SF01") == "1":
        print("CLOSING_SKIP_SF01=1 — sf0.1 full sweep skipped (no receipt)")
    else:
        env = dict(
            os.environ,
            DRIVER_SIM_SF_DIR="/root/testdata/sf0.1",
            DRIVER_SIM_HEAVY_LAST="1",
        )
        path = os.path.join(RECEIPTS, f"driver_sim_r{rnd:02d}_sf01_final.txt")
        with open(path, "w") as out:
            out.write(header)
            out.flush()
            proc = subprocess.run(
                [sys.executable, "tools/driver_sim.py"],
                cwd=REPO, stdout=out, stderr=subprocess.STDOUT,
                check=False, env=env,
            )
            out.write(f"\n[closing_gate] exit status: {proc.returncode}\n")
        print(f"wrote {os.path.relpath(path, REPO)} (exit {proc.returncode})")
        status |= proc.returncode
    return status


if __name__ == "__main__":
    sys.exit(main())
