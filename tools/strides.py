"""The isomorphic-copy key strides, named once (ADVICE r13).

Every big-fixture generator (make_sf1 / make_sf10 / make_sf50_events /
make_sf{10,100}_docs) remaps each copy's keys by ``key + i * stride``;
the strides must satisfy ``max(source key) < stride`` (each generator
asserts this against its actual source before writing) and
``copies * stride`` must stay far inside int64 and the
engine-portable hash bound. One table here instead of a copy per
generator — the values are the ones every committed fixture was
built with, so they are LOAD-BEARING: changing one silently
invalidates the copy-isomorphism audits of any existing fixture
built under the old value.
"""

STRIDE = {
    "custkey": 100_000,   # max c_custkey 15,000 at sf0.1
    "suppkey": 10_000,    # max s_suppkey 1,000
    "partkey": 100_000,   # max p_partkey 20,000
    "orderkey": 1_000_000,  # max o_orderkey <= 600,000
    "event_id": 1_000_000,  # max event_id <= 100,000
    "user_id": 100_000,
    "doc_id": 10_000,     # max doc_id 4,999
    "vec_id": 10_000,     # max vec_id 1,999
}
