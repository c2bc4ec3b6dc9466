"""tools/closing_gate.py mapping logic (VERDICT r9 item 2).

The gate's value is that the changed-file -> key mapping is mechanical;
these tests pin the two decisions that matter: infra files trigger a
full-registry run, and an implementing file maps to exactly its keys.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import closing_gate as cg  # noqa: E402


def test_operator_file_maps_to_its_keys_only():
    keys, infra = cg.keys_for(["bigdataprojectspring16_spark/operators/sorts.py"])
    assert not infra
    assert keys == ["limit_topk", "sort_multikey", "sort_nulls_boundary"]


def test_infra_file_triggers_full_run():
    for f in (
        "bigdataprojectspring16_spark/session.py",
        "__spark_entry__.py",
        "bigdataprojectspring16_spark/plans/barriers.py",
    ):
        _keys, infra = cg.keys_for([f])
        assert infra, f


def test_non_engine_files_map_to_nothing():
    keys, infra = cg.keys_for(
        ["tools/make_sf10.py", "tests/test_survey_sync.py", "BASELINE.md"]
    )
    assert not infra
    assert keys == []


def test_every_registry_key_has_a_source_file():
    import inspect

    import bigdataprojectspring16_spark as eng

    for key, fn in eng.QUERIES.items():
        src = inspect.getsourcefile(fn)
        assert src and os.path.exists(src), key
