#!/usr/bin/env python
"""Dump .explain('formatted') for r14-touched keys → plans/r14/.

    python tools/dump_r14_plans.py before|after key [key ...]

Same convention as plans/r13: sf0.1, initial adaptive plans.
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from bigdataprojectspring16_spark import QUERIES, get_session  # noqa: E402
from plan_text import formatted_plan  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = "/root/repo/plans/r14"


def main() -> None:
    suffix, keys = sys.argv[1], sys.argv[2:]
    assert suffix in ("before", "after"), suffix
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_session("dump-r14-plans")
    for key in keys:
        df = QUERIES[key](spark, SF_DIR)
        plan = formatted_plan(df)
        path = os.path.join(OUT_DIR, f"{key}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(f"# {key} ({suffix}, sf={SF_DIR})\n\n{plan}")
        print(f"wrote {path} ({plan.count('Exchange')} Exchange lines)")
    spark.stop()


if __name__ == "__main__":
    main()
