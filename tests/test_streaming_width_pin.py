"""Mechanical enforcement of the streaming state-width contract
(VERDICT r13 item 6).

Streaming state partitioning freezes at the first micro-batch and
every state partition is its own RocksDB instance, so a stateful
query started at a byte-autosized ``spark.sql.shuffle.partitions``
dies by fd exhaustion at scale (measured r13: ~3.2k partitions →
``error=24, Too many open files`` at 50M events,
``tools/receipts/streaming_sf50_r13.txt``). The fix is
``streams.pin_state_store_width`` before ``writeStream.start()`` —
this test makes that contract MECHANICAL, like the broadcast-bounds
audit: any module in the package or tools/ that starts a streaming
query must call the pin (lexically before its first ``.start(``),
or be listed in the justified exemption table below.

tests/ are exempt as a class: their sessions run fixture-scale with
the suite's own tiny shuffle width, and several tests exist precisely
to exercise the pin helper itself.
"""

from __future__ import annotations

import ast
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCAN_DIRS = ("bigdataprojectspring16_spark", "tools")

#: path (repo-relative, posix) -> one-line justification for starting
#: a streaming query without pin_state_store_width. Empty today; a
#: future entry must explain why the byte-autosizer cannot reach its
#: session (e.g. a fixed-width test harness).
EXEMPT: dict[str, str] = {}


def _scan(path: str):
    """(has_writeStream, [(func, line) of .start() calls],
    [(func, line) of pin calls]) for one source file.

    Cross-function call ORDER is not statically decidable, so the
    enforcement below requires lexical pin-before-start only when
    both sit in the SAME function; across functions, a pin call
    anywhere in the file satisfies the contract (the harness pins in
    main() before invoking the helper that starts the query).
    """
    with open(path, encoding="utf-8") as f:
        tree = ast.parse(f.read(), filename=path)
    has_write_stream = False
    starts: list[tuple[str, int]] = []
    pins: list[tuple[str, int]] = []

    def visit(node: ast.AST, func: str) -> None:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            func = node.name
        nonlocal has_write_stream
        if isinstance(node, ast.Attribute) and node.attr == "writeStream":
            has_write_stream = True
        if isinstance(node, ast.Call):
            fn = node.func
            if isinstance(fn, ast.Attribute) and fn.attr == "start":
                starts.append((func, node.lineno))
            name = (
                fn.attr
                if isinstance(fn, ast.Attribute)
                else fn.id
                if isinstance(fn, ast.Name)
                else None
            )
            if name == "pin_state_store_width":
                pins.append((func, node.lineno))
        for child in ast.iter_child_nodes(node):
            visit(child, func)

    visit(tree, "<module>")
    return has_write_stream, starts, pins


def test_every_streaming_start_pins_state_width():
    offenders = []
    for scan_dir in SCAN_DIRS:
        root = os.path.join(REPO, scan_dir)
        for dirpath, _dirs, files in os.walk(root):
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                path = os.path.join(dirpath, fn)
                rel = os.path.relpath(path, REPO).replace(os.sep, "/")
                has_ws, starts, pins = _scan(path)
                if not (has_ws and starts):
                    continue  # no streaming query started here
                if rel in EXEMPT:
                    continue
                if not pins:
                    offenders.append(
                        f"{rel}: starts a streaming query (line "
                        f"{starts[0][1]}) without pin_state_store_width"
                    )
                    continue
                for func, line in starts:
                    same_func = [ln for f2, ln in pins if f2 == func]
                    if same_func and min(same_func) > line:
                        offenders.append(
                            f"{rel}:{func}: pin_state_store_width (line "
                            f"{min(same_func)}) comes after .start() "
                            f"(line {line})"
                        )
    assert not offenders, "\n".join(offenders)


def test_scanner_sees_the_known_harness():
    """Self-check: the scanner must actually find the replay harness's
    streaming start and its pin — an empty scan would make the
    enforcement test vacuous."""
    path = os.path.join(REPO, "tools", "streaming_sf1_run.py")
    has_ws, starts, pins = _scan(path)
    assert has_ws and starts
    assert pins, "harness pin call not seen by the scanner"
