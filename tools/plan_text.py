"""One shared path to a DataFrame's formatted plan string.

Uses private PySpark internals (``df._sc._jvm.PythonSQLUtils``),
which can move across Spark versions — acceptable for receipt
tooling, but every plan-dumping tool must go through THIS helper so
a version bump breaks (and gets fixed) in exactly one place
(ADVICE r13 #4).
"""

from __future__ import annotations


def formatted_plan(df) -> str:
    """``EXPLAIN FORMATTED`` text for a DataFrame's initial plan."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )
