"""Property tests for the comment-preserving ini editor: random files,
random settings — add makes the setting visible to the parser in every
targeted section exactly once, remove erases it, and every comment line
survives both operations (the whole point of text-level editing)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from recordmanager_spark.config import _parse_php_ini
from recordmanager_spark.ini_edit import add_setting, remove_setting

key_st = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)
val_st = st.from_regex(r"[A-Za-z0-9_. -]{1,12}", fullmatch=True).map(
    str.strip
).filter(bool)
name_st = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)


@st.composite
def ini_file(draw):
    sections = draw(
        st.lists(name_st, min_size=1, max_size=4, unique=True)
    )
    lines = ["; header comment"]
    for sec in sections:
        lines.append(f"[{sec}]")
        for _ in range(draw(st.integers(0, 4))):
            k = draw(key_st)
            v = draw(val_st)
            arr = draw(st.booleans())
            lines.append(f"{k}{'[]' if arr else ''} = {v}")
        if draw(st.booleans()):
            lines.append("; a section comment")
        if draw(st.booleans()):
            lines.append("")
    return "\n".join(lines) + "\n", sections


def _values(kv: dict, key: str) -> set:
    v = kv.get(key)
    if v is None:
        return set()
    return set(v) if isinstance(v, list) else {v}


@settings(max_examples=60, deadline=None)
@given(ini_file(), key_st, val_st, st.booleans())
def test_add_then_remove_properties(ini_and_secs, key, val, arr):
    text, sections = ini_and_secs
    target = sections[0]
    setting = f"{key}{'[]' if arr else ''} = {val}"
    comments = [
        ln for ln in text.splitlines() if ln.strip().startswith(";")
    ]

    added = add_setting(text, setting, sources=[target])
    parsed = _parse_php_ini(added)
    # visible to the parser in the targeted section
    assert val in _values(parsed[target], key)
    # untouched sections gained nothing
    for other in sections[1:]:
        before = _values(_parse_php_ini(text)[other], key)
        assert _values(parsed[other], key) == before
    # no duplicate line sneaks in on a second add (idempotent)
    assert add_setting(added, setting, sources=[target]).count(
        setting
    ) == added.count(setting)
    # every comment survives
    for c in comments:
        assert c in added

    removed = remove_setting(added, setting, sources=[target])
    assert val not in _values(_parse_php_ini(removed)[target], key)
    for c in comments:
        assert c in removed
