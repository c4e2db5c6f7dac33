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
        keys = draw(
            st.lists(key_st, min_size=0, max_size=4, unique=True)
        )
        for k in keys:
            v = draw(val_st)
            arr = draw(st.booleans())
            lines.append(f"{k}{'[]' if arr else ''} = {v}")
        if draw(st.booleans()):
            lines.append("; a section comment")
        if draw(st.booleans()):
            lines.append("")
    return "\n".join(lines) + "\n", sections


def _section_lines(text: str, target: str) -> list[str]:
    cur, out = None, []
    for ln in text.splitlines():
        t = ln.split(";", 1)[0].strip()
        if t.startswith("[") and t.endswith("]") and len(t) > 2:
            cur = t[1:-1]
            continue
        if cur == target:
            out.append(ln)
    return out


def _eq_count(text: str, target: str, setting) -> int:
    from recordmanager_spark.ini_edit import parse_setting_line

    want = parse_setting_line(setting)
    return sum(
        1
        for ln in _section_lines(text, target)
        if parse_setting_line(ln) == want
    )


@settings(max_examples=60, deadline=None)
@given(ini_file(), key_st, val_st, st.booleans())
def test_add_then_remove_properties(ini_and_secs, key, val, arr):
    # NOTE line-level semantics: `k = v` and `k[] = v` are DIFFERENT
    # settings (PHP parse_ini_string: scalar vs array — hypothesis
    # found the value-level version of this property conflating them)
    text, sections = ini_and_secs
    target = sections[0]
    setting = f"{key}{'[]' if arr else ''} = {val}"
    comments = [
        ln for ln in text.splitlines() if ln.strip().startswith(";")
    ]

    added = add_setting(text, setting, sources=[target])
    # exactly one parse-equal line in the targeted section (pre-existing
    # identical settings are not duplicated)
    assert _eq_count(added, target, setting) == 1
    # the parser sees it
    assert _parse_php_ini(added)[target].get(
        key, None
    ) is not None
    # untouched sections keep their exact line content
    for other in sections[1:]:
        assert _section_lines(added, other) == _section_lines(text, other)
    # second add is idempotent
    assert _eq_count(
        add_setting(added, setting, sources=[target]), target, setting
    ) == 1
    # every comment survives
    for c in comments:
        assert c in added

    removed = remove_setting(added, setting, sources=[target])
    assert _eq_count(removed, target, setting) == 0
    for c in comments:
        assert c in removed


@settings(max_examples=60, deadline=None)
@given(
    ini_file(),
    st.data(),
    st.sampled_from(["all", "leading", "trailing", "none"]),
)
def test_delete_sources_properties(ini_and_secs, data, keep):
    """delete_sources: whatever the keep-comments mode does to COMMENT
    placement, the PARSED view of the result is exactly the input's
    parsed view minus the deleted sections, kept sections keep their
    non-comment lines verbatim, and deletion is idempotent."""
    from recordmanager_spark.ini_edit import delete_sources

    text, sections = ini_and_secs
    victims = data.draw(
        st.lists(st.sampled_from(sections), min_size=1, unique=True)
    )
    out = delete_sources(text, victims, keep_comments=keep)

    before = _parse_php_ini(text)
    after = _parse_php_ini(out)
    assert after == {
        k: v for k, v in before.items() if k not in victims
    }
    # kept sections: every non-comment line survives verbatim
    for sec in sections:
        if sec in victims:
            continue
        kept_lines = [
            ln for ln in _section_lines(text, sec)
            if ln.split(";", 1)[0].strip()
        ]
        out_lines = _section_lines(out, sec)
        for ln in kept_lines:
            assert ln in out_lines
    # idempotent
    assert delete_sources(out, victims, keep_comments=keep) == out
    # deleting nothing is identity
    assert delete_sources(text, ["zz_no_such"], keep_comments=keep) == text
