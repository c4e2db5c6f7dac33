"""Replay SolrUpdaterTest.php testFieldProcessingRules.

Expected values transcribed from the data provider
(processSingleRecordProvider); the reference represents single values as
scalars and removed fields as missing keys, this engine as one-element
and empty arrays — expectations are normalized to arrays.
"""

from __future__ import annotations

import pytest

from recordmanager_spark.plans import mapping as MP

TOPIC = [
    "oppaat", "ft: kirjoittaminen", "apurahat", "tutkimusrahoitus",
    "tutkimuspolitiikka", "opinnäytteet", "tiedonhaku", "kielioppaat",
    "tutkimustyö", "tutkimus",
]


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame(
        [("Test", "marc", TOPIC)],
        "institution string, record_format string, topic array<string>",
    ).coalesce(1)


@pytest.mark.parametrize(
    "rules,expected",
    [
        (["copy foo newfield"], {"newfield": None}),
        # positional default may be multi-word
        (["copy foo newfield DEFAULT VALUE"], {"newfield": ["DEFAULT VALUE"]}),
        (
            ['copy foo newfield default="DEFAULT FIELD"'],
            {"newfield": ["DEFAULT FIELD"]},
        ),
        (["copy institution newfield"], {"newfield": ["Test"]}),
        (['copy institution newfield match="Test"'], {"newfield": ["Test"]}),
        (
            ['copy institution newfield match="/^test$/i"'],
            {"newfield": ["Test"]},
        ),
        (['copy institution newfield match="/test/" '], {"newfield": []}),
        (["delete institution"], {"institution": []}),
        (['delete institution match="Test"'], {"institution": []}),
        (
            [
                "copy institution newfield",
                "copy record_format newfield",
                "delete institution",
            ],
            {"newfield": ["Test", "marc"], "institution": []},
        ),
        # move appends its default when the (already-moved) source is gone
        (
            [
                "move institution newfield DEFAULT",
                "move institution newfield DEFAULT2 ",
            ],
            {"newfield": ["Test", "DEFAULT2"], "institution": []},
        ),
        (
            ['copy topic newtopic match="/^tutkimus/"'],
            {
                "newtopic": [
                    "tutkimusrahoitus", "tutkimuspolitiikka", "tutkimustyö",
                    "tutkimus",
                ],
                "topic": TOPIC,
            },
        ),
    ],
)
def test_golden_field_rules(spark, base, rules, expected):
    got = MP.apply_field_rules(base, rules).collect()[0].asDict()
    mism = {k: (got.get(k), v) for k, v in expected.items() if got.get(k) != v}
    assert not mism, mism
