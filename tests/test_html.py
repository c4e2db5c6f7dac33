"""HTML extraction: tag/script/style/comment stripping, entity decode
order, title pull, link density; RE2-compatibility of every pattern."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from recordmanager_spark.functions.html import (
    HTML_ENTITIES,
    html_title,
    html_to_text,
    link_density,
)

DOC = (
    "<html><head><title> My  Page </title>"
    "<script>var a = '<p>not text</p>';</script>"
    "<style>p{color:blue}</style></head>"
    "<body><nav><a href='/'>Home</a> <a href='/x'>About <b>us</b></a></nav>"
    "<h1>Header</h1><p>Body &amp; text with &lt;brackets&gt;</p>"
    "<!-- secret --></body></html>"
)


def _run(spark, col_expr, s=DOC):
    df = spark.createDataFrame([(s,)], ["h"])
    return df.select(col_expr.alias("v")).collect()[0]["v"]


def test_html_to_text(spark):
    out = _run(spark, html_to_text("h"))
    assert out == "My Page Home About us Header Body & text with <brackets>"
    assert "secret" not in out and "color" not in out and "var a" not in out


def test_html_title(spark):
    assert _run(spark, html_title("h")) == "My Page"
    assert _run(spark, html_title("h"), "<body>no title</body>") == ""


def test_link_density(spark):
    # anchors: "Home" (4) + "About us" (8) = 12 chars
    text_len = len("My Page Home About us Header Body & text with <brackets>")
    expected = round(12 / text_len, 6)
    assert _run(spark, link_density("h")) == pytest.approx(expected)
    assert _run(spark, link_density("h"), "<p>no links at all</p>") == 0.0
    assert _run(spark, link_density("h"), "") == 0.0


def test_entity_order_no_double_decode(spark):
    # &amp;lt; must become the literal text "&lt;", not "<"
    out = _run(spark, html_to_text("h"), "<p>&amp;lt;kept&amp;gt;</p>")
    assert out == "&lt;kept&amp;gt;".replace("&amp;", "&")
    assert HTML_ENTITIES[-1][0] == "&amp;"  # the order that guarantees it


def test_patterns_are_re2_safe():
    """No backreferences or lookarounds — every pattern must compile
    under RE2 semantics (DuckDB oracle). Python re accepts a superset,
    so assert the banned constructs are absent textually."""
    from recordmanager_spark.functions import html as H

    for pat in (H._SCRIPT, H._STYLE, H._COMMENT, H._TAG, H._ANCHOR, H._TITLE):
        re.compile(pat)
        assert not re.search(r"\\[1-9]", pat), pat  # backreference
        assert "(?=" not in pat and "(?!" not in pat and "(?<" not in pat
