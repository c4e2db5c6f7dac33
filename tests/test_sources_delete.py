"""sources-delete (Command/Sources/Delete.php:105-200): whole-section
removal from datasources.ini with the reference's keep-comments
reattachment semantics, plus the records-exist refusal gate."""

from __future__ import annotations

import pytest

from recordmanager_spark.cli import main
from recordmanager_spark.ini_edit import delete_sources

INI = """\
; file preamble
[alpha]
format = marc
; alpha internal note

; describes beta, line 1
; describes beta, line 2
[beta]
format = dc

; describes gamma
[gamma]
format = ead
url = x
"""


def test_delete_middle_section_default_trailing():
    out = delete_sources(INI, ["beta"])
    assert "[beta]" not in out and "format = dc" not in out
    # beta's trailing comment run ("; describes gamma") reattaches to
    # the head of gamma's section
    lines = out.splitlines()
    g = lines.index("[gamma]")
    assert lines[g - 1] == "; describes gamma"
    # beta's LEADING comments (the trailing run of alpha's section) are
    # removed under the default 'trailing' mode
    assert "describes beta" not in out
    # comments not adjacent to the deleted section survive
    assert "; file preamble" in out
    assert "; alpha internal note" in out
    assert "[alpha]" in out and "[gamma]" in out


def test_delete_keep_all_retains_leading_comments():
    out = delete_sources(INI, ["beta"], keep_comments="all")
    assert "[beta]" not in out
    assert "; describes beta, line 1" in out
    assert "; describes gamma" in out


def test_delete_keep_leading_drops_trailing_run():
    out = delete_sources(INI, ["beta"], keep_comments="leading")
    assert "[beta]" not in out
    # leading comments kept, trailing comment dies with the section
    assert "; describes beta, line 1" in out
    assert "; describes gamma" not in out


def test_delete_keep_none_drops_both():
    out = delete_sources(INI, ["beta"], keep_comments="none")
    assert "describes beta" not in out
    assert "; describes gamma" not in out
    assert "; alpha internal note" in out  # blank-separated: not a run


def test_trailing_reattachment_mirrors_reference_bottom_up_order():
    # Delete.php collects the trailing run scanning UPWARD and
    # array_merges it as-is, so a multi-line block arrives reversed —
    # parity over polish, pinned here so nobody "fixes" one side only
    out = delete_sources(INI, ["alpha"], keep_comments="all")
    lines = out.splitlines()
    b = lines.index("[beta]")
    assert lines[b - 2 : b] == [
        "; describes beta, line 2",
        "; describes beta, line 1",
    ]


def test_delete_last_section_trailing_run_has_nowhere_to_go():
    out = delete_sources(INI, ["gamma"])
    assert "[gamma]" not in out and "url = x" not in out
    assert "; describes gamma" not in out  # leading run removed too
    assert "[beta]" in out


def test_delete_multiple_and_adjacent_deleted_previous_kept_intact():
    out = delete_sources(INI, ["beta", "gamma"])
    assert "[beta]" not in out and "[gamma]" not in out
    # alpha is previous to beta: its trailing run is trimmed once;
    # beta (previous to gamma) is itself deleted so no double-trim
    assert "[alpha]" in out and "format = marc" in out


def test_invalid_keep_comments_raises():
    with pytest.raises(ValueError):
        delete_sources(INI, ["beta"], keep_comments="sometimes")


def test_roundtrip_no_deletion_is_identity():
    assert delete_sources(INI, ["nosuch"]) == INI


def test_cli_sources_delete_write_and_records_gate(tmp_path, capsys, spark):
    ini = tmp_path / "ds.ini"
    ini.write_text(INI)
    # records gate: beta still holds records -> refuse, file untouched
    rec = str(tmp_path / "records")
    spark.createDataFrame(
        [("r1", "beta")], "id string, source_id string"
    ).write.parquet(rec)
    with pytest.raises(SystemExit):
        main(
            [
                "sources-delete", "--config", str(ini), "beta",
                "--records", rec, "--write",
            ]
        )
    assert "[beta]" in ini.read_text()
    err = capsys.readouterr().err
    assert "contains records" in err
    # alpha holds none -> deleted in place
    main(
        [
            "sources-delete", "--config", str(ini), "alpha",
            "--records", rec, "--write",
        ]
    )
    text = ini.read_text()
    assert "[alpha]" not in text and "[beta]" in text


def test_highlight_preview_keeps_everything_marked():
    from recordmanager_spark.ini_edit import _RED, _RESET, delete_sources

    out = delete_sources(INI, ["beta"], highlight=True)
    # nothing removed: every input line still present (marked or not)
    for ln in INI.splitlines():
        assert ln in out.replace(_RED, "").replace(_RESET, "")
    # the victim's lines are marked
    assert f"{_RED}[beta]{_RESET}" in out
    assert f"{_RED}format = dc{_RESET}" in out
    # leading comments (alpha's trailing run) marked, not removed
    assert f"{_RED}; describes beta, line 1{_RESET}" in out
    # untouched sections unmarked
    assert "\n[alpha]\n" in "\n" + out
    assert f"{_RED}[gamma]" not in out


def test_cli_highlight_write_mutually_exclusive(tmp_path):
    ini = tmp_path / "ds.ini"
    ini.write_text(INI)
    with pytest.raises(SystemExit, match="highlight"):
        main(
            [
                "sources-delete", "--config", str(ini), "beta",
                "--highlight", "--write",
            ]
        )


def test_cli_token_hygiene_trailing_comma_and_spaces(tmp_path):
    """'gamma,' must not produce an '' victim (the preamble
    pseudo-section — deleting it silently drops the file header), and
    ' gamma' must still match gamma despite the pad space."""
    ini = tmp_path / "ds.ini"
    ini.write_text(INI)
    main(["sources-delete", "--config", str(ini), " gamma,", "--write"])
    text = ini.read_text()
    assert "[gamma]" not in text
    assert "[alpha]" in text and "[beta]" in text
    # the file preamble survives a trailing comma ('' victim never made)
    assert text.splitlines()[0] == INI.splitlines()[0]
    # all-empty input is an error, not a silent no-op
    with pytest.raises(SystemExit, match="no source ids"):
        main(["sources-delete", "--config", str(ini), ",", "--write"])
