"""Engine-portable deterministic key hashing (ADVICE r6, r8).

Every reproducible split/sample in the repo hashes an integer key with
Knuth's multiplicative constant. Two hazards shape the formula:

1. **Overflow** (ADVICE r6): the raw form ``key * 2654435761``
   overflows int64 once the key passes ~3.47e9 — reachable for TPC-H
   order keys near the 100 TB target SF — and the two engines then
   DIVERGE: non-ANSI Spark wraps silently while DuckDB raises an
   out-of-range error. Fix: pre-reduce the key into a prime-sized
   window first, bounding the product at 100002 * 2654435761 ≈
   2.66e14 — int64-safe for ANY int64 key.

2. **Weak low bits** (ADVICE r7): a multiplicative hash mixes the
   HIGH bits of the product, not the low ones — and worse,
   KNUTH ≡ 1 (mod 5) and (mod 10), so ``(k' * KNUTH) % m`` for
   m ∈ {5, 10} degenerates to ``k' % m``: a systematic key-residue
   split, not a hash (k-fold assignment correlated with key parity
   is a leakage vector in a training-data engine). Fix: Fibonacci
   range reduction — reduce the product mod 2^32 and take the TOP
   bits via ``(h32 * m) >> 32`` instead of a low-order residue.

The small-modulus reduction therefore is::

    h32  = ((key % 100003) * 2654435761) % 4294967296
    hash = (h32 * m) // 4294967296          -- in [0, m)

Engine equivalence of the final division: DuckDB evaluates it as
BIGINT integer division (``//``); Spark evaluates
``floor(h32 * m / 4294967296)`` in doubles — exact because
``h32 * m < 2^32 * 2^20 = 2^52 < 2^53`` is exactly representable and
dividing by a power of two only shifts the exponent, so the floor
sees the true rational value. ``ORDERING_MOD``-sized moduli
(≥ 2^32) keep the plain ``% m`` residue — there the full mixed h32
IS the value (the ``(h32 * m)`` product would overflow int64), and
for m = 2^32 the two forms coincide bit-for-bit, so the r7 ordering
hashes are unchanged.

The hash is not injective, so any ORDERING use must carry the raw
key as a tiebreak (the sample_* top-K orderings all do).
Uniformity + small-modulus decorrelation are pinned by
tests/test_scale_paths.py::test_knuth_hash_folds_decorrelated.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Knuth's 32-bit multiplicative hash constant (public domain, TAOCP §6.4).
KNUTH = 2654435761

#: Prime pre-reduction window; see module docstring for the bound.
KEY_MOD = 100003

#: The mixing field: products are reduced mod 2^32 before the range map.
M32 = 4294967296

#: Largest small modulus the Fibonacci branch accepts (double-exactness
#: bound: h32 * m must stay under 2^53).
MAX_SMALL_MOD = 1 << 20


def knuth_hash(key: Column, modulus: int) -> Column:
    """Deterministic hash of a non-negative integer key into
    ``[0, modulus)`` — overflow-free for any int64 key, identical on
    Spark and DuckDB (pure integer arithmetic; see module docstring
    for the high-bits range reduction and its exactness argument)."""
    h32 = ((key % F.lit(KEY_MOD)) * F.lit(KNUTH)) % F.lit(M32)
    if modulus >= M32:
        return h32 % F.lit(modulus)
    if modulus > MAX_SMALL_MOD:  # pragma: no cover - no such caller
        raise ValueError(f"modulus {modulus} exceeds {MAX_SMALL_MOD}")
    return F.floor(h32 * F.lit(modulus) / F.lit(M32)).cast("long")


def knuth_hash_sql(key: str, modulus: int) -> str:
    """DuckDB/ANSI mirror of :func:`knuth_hash` (BIGINT ``//`` replaces
    the float floor-division — same integer by the exactness argument
    in the module docstring)."""
    h32 = f"((({key}) % {KEY_MOD}) * {KNUTH}) % {M32}"
    if modulus >= M32:
        return f"({h32}) % {modulus}"
    if modulus > MAX_SMALL_MOD:  # pragma: no cover - no such caller
        raise ValueError(f"modulus {modulus} exceeds {MAX_SMALL_MOD}")
    return f"(({h32}) * {modulus}) // {M32}"
