"""Model-based property test for the Mongo-subset filter DSL
(plans/filter_dsl.py, reference PDODatabase.php:1015-1152): random
filters over a null/empty-rich dataset, evaluated by Spark's compiled
Column AND by an independent pure-Python reimplementation of the
documented semantics — including SQL three-valued logic, the
array-contains rewrite, $in/$nin null members, and Mongo's
null-matching $ne."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from recordmanager_spark.plans.filter_dsl import Regex, apply_query

# --- the dataset: every null/empty/overlap shape the semantics branch on
ROWS = [
    # (id, s, n, tags)
    (0, "a", 1, ["a"]),
    (1, "ab", 2, ["a", "b"]),
    (2, "abc", 3, ["b"]),
    (3, "banana", -1, ["c", "a"]),
    (4, "x", 0, []),
    (5, "", 7, None),
    (6, None, None, ["a", "b", "c"]),
    (7, "a", None, []),
    (8, None, 2, None),
    (9, "bxn", 5, ["b", "c"]),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        ROWS, "id int, s string, n int, tags array<string>"
    )


PATTERNS = ["^a", "x$", "[ab]c", "b.n", "an", "^$"]
S_VALS = ["a", "ab", "banana", "x", "", "zz"]
N_VALS = [-1, 0, 1, 2, 3, 5, 7, 9]
TAG_VALS = ["a", "b", "c", "z"]

s_eq = st.one_of(
    st.sampled_from(S_VALS),
    st.none(),
    st.sampled_from(PATTERNS).map(Regex),
)
tags_eq = st.one_of(
    st.sampled_from(TAG_VALS),
    st.none(),
    st.sampled_from(PATTERNS).map(Regex),
)


def _op_value(field, op, draw):
    if op == "$exists":
        return draw(st.booleans())
    if op in ("$gt", "$gte", "$lt", "$lte"):
        return draw(st.sampled_from(N_VALS))
    if op == "$ne":
        pool = {"s": S_VALS, "n": N_VALS, "tags": TAG_VALS}[field]
        return draw(st.one_of(st.sampled_from(pool), st.none()))
    # $in / $nin
    pool = {"s": S_VALS, "n": N_VALS, "tags": TAG_VALS}[field]
    return draw(
        st.lists(
            st.one_of(st.sampled_from(pool), st.none()),
            min_size=0, max_size=3,
        )
    )


_FIELD_OPS = {
    "s": ["$ne", "$in", "$nin", "$exists"],
    "n": ["$ne", "$in", "$nin", "$exists", "$gt", "$gte", "$lt", "$lte"],
    "tags": ["$ne", "$in", "$nin", "$exists"],
}


@st.composite
def field_term(draw):
    field = draw(st.sampled_from(["s", "n", "tags"]))
    if draw(st.booleans()):
        if field == "s":
            return field, draw(s_eq)
        if field == "tags":
            return field, draw(tags_eq)
        return field, draw(st.one_of(st.sampled_from(N_VALS), st.none()))
    ops = draw(
        st.lists(
            st.sampled_from(_FIELD_OPS[field]),
            min_size=1, max_size=2, unique=True,
        )
    )
    return field, {op: _op_value(field, op, draw) for op in ops}


@st.composite
def filter_dict(draw, depth=1):
    terms = dict(draw(st.lists(field_term(), min_size=1, max_size=2)))
    if depth > 0 and draw(st.booleans()):
        key = draw(st.sampled_from(["$or", "$nor"]))
        terms[key] = draw(
            st.lists(filter_dict(depth=depth - 1), min_size=1, max_size=2)
        )
    return terms


# --- the independent model: Kleene 3VL over the documented semantics


def _not(x):
    return None if x is None else not x


def _and(xs):
    xs = list(xs)
    if any(x is False for x in xs):
        return False
    if any(x is None for x in xs):
        return None
    return True


def _or(xs):
    xs = list(xs)
    if any(x is True for x in xs):
        return True
    if any(x is None for x in xs):
        return None
    return False


def _eval_eq(rv, value, arr):
    if isinstance(value, Regex):
        if rv is None:
            return None
        vals = rv if arr else [rv]
        return any(re.search(value.pattern, x) is not None for x in vals)
    if value is None:
        return rv is None  # isNull: 2-valued
    if rv is None:
        return None
    return (value in rv) if arr else (rv == value)


def _eval_ops(rv, ops, arr):
    conds = []
    for op, v in ops.items():
        if op == "$in":
            # "UNSET" = no condition was BUILT (python-None in the
            # compiler) — distinct from a built condition evaluating
            # to SQL NULL (model None)
            vals = [x for x in v if x is not None]
            c = "UNSET"
            if vals:
                if arr:
                    c = None if rv is None else bool(set(rv) & set(vals))
                else:
                    c = None if rv is None else rv in vals
            if None in v:
                if arr:
                    absent = _or(
                        [rv is None,
                         None if rv is None else len(rv) == 0]
                    )
                else:
                    absent = rv is None
                c = absent if c == "UNSET" else _or([c, absent])
            conds.append(False if c == "UNSET" else c)
        elif op == "$nin":
            vals = [x for x in v if x is not None]
            if arr:
                c = (
                    (None if rv is None else not (set(rv) & set(vals)))
                    if vals else True
                )
            else:
                c = (None if rv is None else rv not in vals) if vals else True
            if None in v:
                present = _and(
                    [rv is not None,
                     None if rv is None else len(rv) > 0]
                ) if arr else (rv is not None)
                c = _and([c, present])
            else:
                c = _or([c, rv is None])
            conds.append(c)
        elif op == "$ne":
            if v is None:
                conds.append(rv is not None)
            elif arr:
                conds.append(
                    _or([None if rv is None else v not in rv, rv is None])
                )
            else:
                conds.append(
                    _or([None if rv is None else rv != v, rv is None])
                )
        elif op == "$exists":
            conds.append((rv is not None) if v else (rv is None))
        elif op in ("$gt", "$gte", "$lt", "$lte"):
            if rv is None:
                conds.append(None)
            else:
                conds.append(
                    {"$gt": rv > v, "$gte": rv >= v,
                     "$lt": rv < v, "$lte": rv <= v}[op]
                )
    return _and(conds)


def _eval_filter(row, flt):
    terms = []
    for field, cond in flt.items():
        if field == "$or":
            terms.append(_or(_eval_filter(row, s) for s in cond))
        elif field == "$nor":
            terms.append(_not(_or(_eval_filter(row, s) for s in cond)))
        elif isinstance(cond, dict):
            terms.append(
                _eval_ops(row[field], cond, arr=(field == "tags"))
            )
        else:
            terms.append(
                _eval_eq(row[field], cond, arr=(field == "tags"))
            )
    return _and(terms)


@settings(max_examples=60, deadline=None)
@given(filter_dict())
def test_filter_dsl_matches_independent_model(df, flt):
    got = {r["id"] for r in apply_query(df, flt).select("id").collect()}
    rows = [dict(zip(("id", "s", "n", "tags"), r)) for r in ROWS]
    want = {r["id"] for r in rows if _eval_filter(r, flt) is True}
    assert got == want, f"filter {flt!r}: spark={sorted(got)} model={sorted(want)}"


@settings(max_examples=25, deadline=None)
@given(
    filter_dict(),
    st.sampled_from([("n", 1), ("n", -1), ("s", 1), ("s", -1)]),
    st.integers(min_value=0, max_value=4),
    st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
)
def test_pagination_matches_model(df, flt, first_sort, skip, limit):
    """sort/skip/limit (PDODatabase.php:1190-1219): with the unique id
    as the FINAL sort term (the documented determinism contract), the
    page equals the model's slice of the model's sort. Spark orderBy
    puts NULLs FIRST ascending / LAST descending — encode that."""
    sort = [first_sort, ("id", 1)]
    got = [
        r["id"]
        for r in apply_query(
            df, flt, sort=sort, skip=skip, limit=limit
        ).select("id").collect()
    ]
    rows = [dict(zip(("id", "s", "n", "tags"), r)) for r in ROWS]
    kept = [r for r in rows if _eval_filter(r, flt) is True]
    field, direction = first_sort

    nulls = sorted(
        (r for r in kept if r[field] is None), key=lambda r: r["id"]
    )
    vals = [r for r in kept if r[field] is not None]
    if direction == 1:
        vals.sort(key=lambda r: (r[field], r["id"]))
        ordered = nulls + vals  # Spark: NULLS FIRST ascending
    else:
        vals.sort(key=lambda r: r["id"])  # tiebreak, then stable desc
        vals.sort(key=lambda r: r[field], reverse=True)
        ordered = vals + nulls  # Spark: NULLS LAST descending
    want = [r["id"] for r in ordered[skip:]]
    if limit is not None:
        want = want[:limit]
    assert got == want, (flt, sort, skip, limit, got, want)
