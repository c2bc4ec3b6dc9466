#!/usr/bin/env python
"""Full-registry plan-shape audit (r13 closing receipt).

The optimization brief tracks plan-shape properties per query:
Exchange count, join strategy, Python-boundary nodes, cartesian
products, pushed filters. PLANS.md carries the full formatted dumps
for the 47 bench headline keys; this tool closes the loop over the
ENTIRE declared registry (207 keys) without a 15k-line artifact: it
builds every query at sf0.01, captures the INITIAL formatted plan
in memory, and writes one audit line per key plus aggregate
verdicts:

- ``BatchEvalPython``             — must be 0 everywhere (the
  row-at-a-time Python boundary; the declared UDF keys are
  Arrow-batched and show up as ArrowEvalPython / *InPandas /
  MapInArrow nodes, which are reported but sanctioned). This is the
  mechanical PASS/FAIL gate.
- ``BroadcastNestedLoopJoin``     — allowed only as the sanctioned
  broadcast-of-a-provably-tiny-frame cross joins (1-row totals, a
  single query vector, kxdim centroids, hyperplane buckets — see
  PLANS.md header); keys carrying one are listed for eyeball review.
- ``CartesianProduct``            — gated against the adjudicated
  allowlist (r14, ADVICE r13 #1): the guide's ban is on DATA-SIZED
  cartesians; under the declared-only broadcast rule (both
  thresholds -1) a cross of two constant-bounded frames plans as
  CartesianProduct unless a docstring-audited broadcast hint marks a
  side. The three allowlisted sites were each adjudicated
  constant-bounded: events_funnel (three 1-row global totals),
  events_moving_avg_7d (date spine x distinct event-type
  vocabulary), sim_ann_lsh (Range(16) x Range(64) hyperplane grid,
  under a BroadcastExchange). A cartesian on ANY OTHER key now FAILS
  the audit instead of relying on a human to eyeball the list.
  tests/test_plan_shapes.py separately asserts ZERO cartesians in
  every pair-generating plan, where a data-sized one could hide.
- per-key Exchange / join-operator counts and whether any scan
  carries a non-empty PushedFilters — the summary the brief asks to
  "note" for every query. ``exch`` counts SHUFFLE exchanges only
  (``\\bExchange\\b`` matches neither BroadcastExchange nor
  ReusedExchange — ADVICE r13 #2); broadcasts are visible in the
  join-operator column (every B*Join has one build side).

Initial (pre-AQE) plans, same capture path as tools/dump_plans.py.

Run:  python tools/plan_audit.py > tools/receipts/plan_audit_r13.txt 2>&1
"""

import re
import sys

sys.path.insert(0, ".")

from bigdataprojectspring16_spark import QUERIES, get_session  # noqa: E402
from plan_text import formatted_plan  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

#: Keys whose CartesianProduct was adjudicated constant-bounded (see
#: module docstring). A cartesian on any key NOT listed here fails
#: the audit (ADVICE r13 #1 — the gate used to check only
#: BatchEvalPython, so a future data-sized cartesian on a new key
#: would have printed PASS).
CARTESIAN_ALLOWLIST = frozenset(
    ("events_funnel", "events_moving_avg_7d", "sim_ann_lsh")
)

JOIN_OPS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)
PY_OPS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "MapInArrow",
    "FlatMapGroupsInPandasWithState",
)


def main() -> int:
    spark = get_session("plan-audit")
    bad_cartesian: list[str] = []
    bad_batch_eval: list[str] = []
    bnlj_keys: list[str] = []
    print(f"plan audit @ {SF_DIR}: {len(QUERIES)} declared keys")
    print(
        f"{'key':34s} {'exch':>4s} {'joins (by operator)':28s} "
        f"{'python-boundary':22s} pushed"
    )
    for key in sorted(QUERIES):
        df = QUERIES[key](spark, SF_DIR)
        plan = formatted_plan(df)
        # The formatted dump lists each node in the tree AND in the
        # node-detail section; count tree occurrences only (lines
        # like "+- Exchange (12)" / ":- BroadcastHashJoin ...").
        tree = plan.split("\n\n")[0]
        n_exch = len(re.findall(r"\bExchange\b", tree))
        joins = {
            op: len(re.findall(rf"\b{op}\b", tree))
            for op in JOIN_OPS
        }
        pys = {op: len(re.findall(rf"\b{op}\b", tree)) for op in PY_OPS}
        pushed = len(
            re.findall(r"PushedFilters: \[(?!\])", plan)
        )  # scans with at least one pushed filter
        if joins["CartesianProduct"]:
            bad_cartesian.append(key)
        if pys["BatchEvalPython"]:
            bad_batch_eval.append(key)
        if joins["BroadcastNestedLoopJoin"]:
            bnlj_keys.append(key)
        jtxt = ",".join(
            f"{op.replace('Join', '').replace('Broadcast', 'B').replace('SortMerge', 'SM').replace('ShuffledHash', 'SH').replace('NestedLoop', 'NL').replace('CartesianProduct', 'CART')}:{n}"
            for op, n in joins.items()
            if n
        ) or "-"
        ptxt = ",".join(
            f"{op.replace('EvalPython', '').replace('FlatMapGroupsInPandas', 'fmgPandas').replace('MapInPandas', 'mapPandas').replace('MapInArrow', 'mapArrow')}:{n}"
            for op, n in pys.items()
            if n
        ) or "-"
        print(f"{key:34s} {n_exch:4d} {jtxt:28s} {ptxt:22s} {pushed}")
    print()
    unlisted_cartesian = sorted(
        set(bad_cartesian) - CARTESIAN_ALLOWLIST
    )
    print(f"BatchEvalPython keys      : {bad_batch_eval or 'NONE'}")
    print(f"CartesianProduct keys     : {len(bad_cartesian)} "
          f"(allowlisted constant-bounded): {bad_cartesian}")
    print(f"  outside allowlist       : {unlisted_cartesian or 'NONE'}")
    print(f"BroadcastNestedLoopJoin   : {len(bnlj_keys)} keys "
          f"(sanctioned tiny-frame cross joins): {bnlj_keys}")
    ok = not bad_batch_eval and not unlisted_cartesian
    print(f"RESULT: {'PASS' if ok else 'FAIL'} "
          f"(gates: BatchEvalPython == 0 AND CartesianProduct only on "
          f"the {len(CARTESIAN_ALLOWLIST)}-key allowlist, "
          f"all {len(QUERIES)} keys)")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
