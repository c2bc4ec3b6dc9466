"""Engine-portable deterministic key hashing (ADVICE r6).

Every reproducible split/sample in the repo hashes an integer key with
Knuth's multiplicative constant. The raw form ``key * 2654435761``
overflows int64 once the key passes ~3.47e9 — reachable for TPC-H
order keys near the 100 TB target SF — and the two engines then
DIVERGE: non-ANSI Spark wraps silently while DuckDB raises an
out-of-range error. The fix (already used by
``docs_leakage_safe_split``, llmops/pipeline.py) is to pre-reduce the
key into a prime-sized window first::

    ((key % 100003) * 2654435761) % m

The product is bounded by 100002 * 2654435761 ≈ 2.66e14 — int64-safe
for ANY int64 key — and the pre-reduction by a prime keeps the hash
well-mixed across every modulus used here (5/10/97/100/2^32; all
coprime to or much smaller than 100003). The hash is no longer
injective, so any ORDERING use must carry the raw key as a tiebreak
(the sample_* top-K orderings all do).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Knuth's 32-bit multiplicative hash constant (public domain, TAOCP §6.4).
KNUTH = 2654435761

#: Prime pre-reduction window; see module docstring for the bound.
KEY_MOD = 100003


def knuth_hash(key: Column, modulus: int) -> Column:
    """``((key % KEY_MOD) * KNUTH) % modulus`` — overflow-free for any
    int64 key, identical on Spark and DuckDB (pure integer arithmetic,
    non-negative keys)."""
    return ((key % F.lit(KEY_MOD)) * F.lit(KNUTH)) % F.lit(modulus)


def knuth_hash_sql(key: str, modulus: int) -> str:
    """DuckDB/ANSI mirror of :func:`knuth_hash`."""
    return f"((({key}) % {KEY_MOD}) * {KNUTH}) % {modulus}"
