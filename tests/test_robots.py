"""robots.txt gate (functions/robots.py, RFC 9309): group selection,
prefix/wildcard/$ matching, most-specific-match with allow-wins ties,
opt-out defaults, and the broadcast-join Spark gate."""

from __future__ import annotations

from recordmanager_spark.functions.robots import (
    parse_robots,
    robots_gate,
    robots_path_allowed,
)

BASIC = """
# frontier policy
User-agent: *
Disallow: /private/
Allow: /private/public$
Disallow: /*.pdf$

User-agent: heavybot
Disallow: /
"""


def _allowed(txt, path, agent="*"):
    return robots_path_allowed(path, parse_robots(txt, agent))


def test_prefix_wildcard_and_anchor():
    assert _allowed(BASIC, "/") is True
    assert _allowed(BASIC, "/private/x") is False
    assert _allowed(BASIC, "/private/public") is True   # $-anchored allow
    assert _allowed(BASIC, "/private/public2") is False  # anchor held
    assert _allowed(BASIC, "/docs/a.pdf") is False       # * spans
    assert _allowed(BASIC, "/docs/a.pdfx") is True       # $ anchor held
    assert _allowed(BASIC, "/docs/a.pdf?dl=1") is True   # query after $


def test_most_specific_match_and_allow_tie():
    txt = "User-agent: *\nDisallow: /p\nAllow: /page\n"
    assert _allowed(txt, "/p/x") is False
    assert _allowed(txt, "/pagex") is True  # longer allow wins
    tie = "User-agent: *\nDisallow: /dir\nAllow: /dir\n"
    assert _allowed(tie, "/dir/a") is True  # tie -> allow wins


def test_group_selection_longest_agent_token():
    assert _allowed(BASIC, "/anything", agent="HeavyBot/1.0") is False
    assert _allowed(BASIC, "/private/x", agent="otherbot") is False
    # blank lines do NOT split a user-agent run (RFC 9309: only rule
    # lines end one): mybot and * here are ONE group sharing the rule
    txt = "User-agent: mybot\n\nUser-agent: *\nDisallow: /\n"
    assert _allowed(txt, "/x", agent="mybot") is False
    assert _allowed(txt, "/x", agent="elsebot") is False
    # an empty matched group (only possible at EOF) = allow all,
    # NOT fall through to *
    txt2 = "User-agent: *\nDisallow: /\n\nUser-agent: mybot\n"
    assert _allowed(txt2, "/x", agent="mybot") is True
    assert _allowed(txt2, "/x", agent="elsebot") is False


def test_consecutive_agent_lines_form_one_group():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert _allowed(txt, "/x/1", agent="a") is False
    assert _allowed(txt, "/x/1", agent="b") is False
    assert _allowed(txt, "/y", agent="a") is True


def test_optout_defaults():
    assert _allowed("", "/anything") is True
    assert _allowed("User-agent: *\nDisallow:\n", "/x") is True  # empty
    assert _allowed("garbage lines\nSitemap: /s.xml\n", "/x") is True
    assert _allowed(None, "/x") is True


def test_merged_same_token_groups():
    txt = (
        "User-agent: *\nDisallow: /a\n\n"
        "User-agent: *\nDisallow: /b\n"
    )
    assert _allowed(txt, "/a/1") is False
    assert _allowed(txt, "/b/1") is False
    assert _allowed(txt, "/c") is True


def test_robots_gate_broadcast_join(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://h0.example/private/x"),
            (2, "https://h0.example/ok"),
            (3, "https://H0.EXAMPLE/private/public"),  # host case-folded
            (4, "https://h1.example/anything"),        # no robots row
            (5, "https://h2.example/blocked/1"),
            (6, "https://h2.example"),                 # bare host -> "/"
        ],
        "id long, url string",
    )
    robots = spark.createDataFrame(
        [
            ("h0.example", BASIC),
            ("h2.example", "User-agent: *\nDisallow: /blocked\n"),
        ],
        "host string, robots_txt string",
    )
    out = {
        r["id"]: r["robots_allowed"]
        for r in robots_gate(docs, robots).collect()
    }
    assert out == {1: False, 2: True, 3: True, 4: True, 5: False, 6: True}
    # the robots side broadcasts; the docs never shuffle
    plan = robots_gate(docs, robots)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_corpus_config_robots_gate(spark, tmp_path):
    """`robots_txt = <parquet>` in a [corpus:] section enforces the
    RFC 9309 verdict as part of stage -1, before any text hygiene."""
    from recordmanager_spark.corpus_config import (
        parse_corpus_ini,
        pre_dedup_gates,
    )

    robots_path = str(tmp_path / "robots")
    spark.createDataFrame(
        [("crawl.example", "User-agent: nlbot\nDisallow: /private/\n")],
        "host string, robots_txt string",
    ).write.parquet(robots_path)

    cfg = parse_corpus_ini(
        "[corpus:web]\n"
        f"robots_txt = {robots_path}\n"
        "robots_agent = nlbot/2.1\n"
        "keep_text = true\n"
    )["web"]
    assert cfg.robots_txt == robots_path
    assert cfg.robots_agent == "nlbot/2.1"

    docs = spark.createDataFrame(
        [
            ("https://crawl.example/private/a", "x"),
            ("https://crawl.example/public/a", "y"),
            ("https://other.example/private/a", "z"),  # no robots row
        ],
        "doc_id string, text string",
    )
    kept = {
        r["doc_id"]
        for r in pre_dedup_gates(docs, cfg, id_col="doc_id").collect()
    }
    assert kept == {
        "https://crawl.example/public/a",
        "https://other.example/private/a",
    }


def test_robots_gate_duplicate_host_rows_do_not_fan_out(spark):
    """One robots.txt per authority (RFC 9309): a robots table carrying
    duplicate host rows (two harvest runs unioned, http+https recorded
    separately) must stay a filter — never multiply documents."""
    docs = spark.createDataFrame(
        [(1, "https://h0.example/private/x"), (2, "https://h0.example/ok")],
        "id long, url string",
    )
    robots = spark.createDataFrame(
        [
            ("h0.example", BASIC),
            ("h0.example", BASIC),            # duplicate harvest row
            ("H0.EXAMPLE", BASIC),            # case-variant duplicate
        ],
        "host string, robots_txt string",
    )
    rows = robots_gate(docs, robots).collect()
    assert len(rows) == 2  # no fan-out
    out = {r["id"]: r["robots_allowed"] for r in rows}
    assert out == {1: False, 2: True}
