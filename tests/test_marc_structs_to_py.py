"""Parity pin for _marc_structs_to_py (the r13 flat-cursor Arrow →
Python reconstruction feeding the renormalize serializer): for every
adversarial null placement, its tuples must equal the nested
``to_pylist`` dicts it replaced, normalized to the same tuple shape.
The cursor arithmetic's hazard case — a NULL outer struct over a
NON-null child list, whose flattened elements must still be consumed —
is constructed explicitly."""

from __future__ import annotations

import pyarrow as pa
import pytest

from recordmanager_spark.extractors.marc import _marc_structs_to_py

SUB_T = pa.struct([("code", pa.string()), ("value", pa.string())])
FLD_T = pa.struct(
    [
        ("tag", pa.string()),
        ("ind1", pa.string()),
        ("ind2", pa.string()),
        ("value", pa.string()),
        ("subfields", pa.list_(SUB_T)),
    ]
)
TYP = pa.struct([("leader", pa.string()), ("fields", pa.list_(FLD_T))])


def _norm(py_rec):
    if py_rec is None:
        return None
    flds = py_rec["fields"]
    if flds is None:
        return (py_rec["leader"], None)
    return (
        py_rec["leader"],
        [
            (
                f["tag"], f["ind1"], f["ind2"], f["value"],
                None
                if f["subfields"] is None
                else [(s["code"], s["value"]) for s in f["subfields"]],
            )
            for f in flds
        ],
    )


def _check(arr):
    assert _marc_structs_to_py(arr) == [_norm(p) for p in arr.to_pylist()]


def test_adversarial_null_placements():
    recs = [
        None,                                        # null struct
        {"leader": None, "fields": None},            # null children
        {"leader": "L", "fields": []},               # empty fields
        {
            "leader": "L",
            "fields": [
                {"tag": "001", "ind1": None, "ind2": None,
                 "value": "r1", "subfields": None},
                {"tag": "245", "ind1": "1", "ind2": "0", "value": None,
                 "subfields": []},                   # empty subfields
                {"tag": "100", "ind1": None, "ind2": " ", "value": None,
                 "subfields": [{"code": "a", "value": None},
                               {"code": None, "value": "Ünïcode 🎶"}]},
            ],
        },
        None,                                        # null between rows
        {"leader": "", "fields": [
            {"tag": None, "ind1": "x", "ind2": "y", "value": "",
             "subfields": [{"code": "z", "value": "v"}]},
        ]},
    ]
    _check(pa.array(recs, type=TYP))


def test_null_struct_over_nonnull_child_list_consumes_cursor():
    # build children by hand so the NULL struct row carries a NON-null
    # fields list whose flattened elements must be skipped exactly
    fields_child = pa.array(
        [
            [{"tag": "GHOST", "ind1": None, "ind2": None, "value": "g",
              "subfields": [{"code": "q", "value": "ghost-sub"}]}],
            [{"tag": "245", "ind1": "1", "ind2": "0", "value": None,
              "subfields": [{"code": "a", "value": "real"}]}],
        ],
        type=pa.list_(FLD_T),
    )
    leader_child = pa.array(["X", "L"], type=pa.string())
    arr = pa.StructArray.from_arrays(
        [leader_child, fields_child],
        names=["leader", "fields"],
        mask=pa.array([True, False]),  # row 0 struct-null
    )
    out = _marc_structs_to_py(arr)
    assert out[0] is None
    # row 1 must see ITS subfield, not the ghost's
    assert out[1] == (
        "L", [("245", "1", "0", None, [("a", "real")])]
    )
    _check(arr)


def test_sliced_batch_offsets():
    recs = [
        {"leader": f"L{i}", "fields": [
            {"tag": "977", "ind1": " ", "ind2": " ", "value": None,
             "subfields": [{"code": "a", "value": f"v{i}"}]},
        ]}
        for i in range(10)
    ]
    arr = pa.array(recs, type=TYP)
    _check(arr.slice(3, 4))


def test_randomized_parity():
    import random

    rng = random.Random(977)

    def rand_sub():
        if rng.random() < 0.15:
            return None
        return {
            "code": rng.choice(["a", "w", None]),
            "value": rng.choice(["val", "", None, "ümlaut"]),
        }

    def rand_field():
        return {
            "tag": rng.choice(["001", "245", "977", None]),
            "ind1": rng.choice(["1", " ", None]),
            "ind2": rng.choice(["0", None]),
            "value": rng.choice(["ctl", None]),
            "subfields": rng.choice(
                [None, []]
            ) if rng.random() < 0.3 else [
                s for s in (rand_sub() for _ in range(rng.randrange(3)))
                if s is not None
            ],
        }

    recs = []
    for _ in range(500):
        r = rng.random()
        if r < 0.1:
            recs.append(None)
        elif r < 0.2:
            recs.append({"leader": None, "fields": None})
        else:
            recs.append({
                "leader": rng.choice(["L", "", None]),
                "fields": [rand_field() for _ in range(rng.randrange(5))],
            })
    _check(pa.array(recs, type=TYP))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
