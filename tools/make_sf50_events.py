#!/usr/bin/env python
"""Events-only sf50 fixture for the streaming third decade
(VERDICT r12 stretch #7).

Same isomorphic-copy construction as tools/make_sf10.py (500 copies
of the sf0.1 events universe, key-strided so copies are disjoint in
event_id/user_id and identical in ts distribution), emitted into the
existing ``.bench_sf50/`` directory next to documents.parquet. Only
events is generated: the streaming replay (tools/streaming_sf1_run.py
with STREAMING_SF_DIR pointed here) reads nothing else, and the full
8-table sf50 universe would cost ~10 GB of scratch the decade points
need.

Copies share timestamps, so every micro-batch of the time-sliced
replay carries 500x the per-instant rows and the state store holds
500x the concurrent user/session state — exactly the past-10M-rows
state-store probe the stretch item asks for. Correctness is still
exact: sessions/joins/counters key on user_id, copies are
user-disjoint, so the batch twin equality is the same per-copy
isomorphism argument as SCALING.md §SF100.

Run:  python tools/make_sf50_events.py   (writes .bench_sf50/events.parquet)
"""
import os

import duckdb

SRC = os.environ.get("SF50_SRC", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("SF50_OUT", os.path.join(REPO, ".bench_sf50"))
COPIES = int(os.environ.get("SF50_COPIES", "500"))
FORCE = os.environ.get("FORCE", "") == "1"

# At 500 copies the max remapped key is 500x stride = 5e8 (event_id)
# / 5e7 (user_id) — int64-safe and inside the engine-portable bound.
from strides import STRIDE  # noqa: E402 — shared copy-stride table

STRIDE_EVENT = STRIDE["event_id"]
STRIDE_USER = STRIDE["user_id"]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    dest = f"{OUT}/events.parquet"
    con = duckdb.connect()
    for col, stride in (("event_id", STRIDE_EVENT), ("user_id", STRIDE_USER)):
        mx = con.execute(
            f"SELECT max({col}) FROM '{SRC}/events.parquet'"
        ).fetchone()[0]
        assert mx < stride, (col, mx, stride)
    if os.path.exists(dest) and not FORCE:
        n = con.execute(f"SELECT count(*) FROM '{dest}'").fetchone()[0]
        print(f"events: kept existing ({n} rows)", flush=True)
        return
    con.execute(f"CREATE VIEW copies AS SELECT unnest(range({COPIES})) AS i")
    con.execute(
        f"""
        COPY (
            SELECT event_id + i * {STRIDE_EVENT} AS event_id,
                   ts,
                   user_id + i * {STRIDE_USER} AS user_id,
                   event_type, value, props
            FROM '{SRC}/events.parquet', copies
        ) TO '{dest}' (FORMAT PARQUET)
        """
    )
    n = con.execute(f"SELECT count(*) FROM '{dest}'").fetchone()[0]
    print(f"events: {n} rows ({COPIES} copies of {SRC})", flush=True)


if __name__ == "__main__":
    main()
