"""Live OAI-PMH fetch loop (examples/oaipmh_harvester.py) over a fake
transport: multi-page resumption, retry/backoff, same-token abort,
noRecordsMatch handling, Identify granularity, deletion records
(Harvest/OaiPmh.php:220-246,326-339,405-502,781-812)."""

from __future__ import annotations

import pytest

from recordmanager_spark.examples.oaipmh_harvester import (
    OaiPmhHarvester,
    harvest_to_dataframe,
)

IDENTIFY = """<?xml version="1.0"?>
<OAI-PMH xmlns="http://www.openarchives.org/OAI/2.0/">
  <responseDate>2024-05-01T10:00:00Z</responseDate>
  <Identify>
    <repositoryName>test repo</repositoryName>
    <granularity>YYYY-MM-DDThh:mm:ssZ</granularity>
  </Identify>
</OAI-PMH>"""


def _page(records, token=""):
    recs = "".join(records)
    tok = f"<resumptionToken>{token}</resumptionToken>" if token else ""
    return f"""<?xml version="1.0"?>
<OAI-PMH xmlns="http://www.openarchives.org/OAI/2.0/">
  <responseDate>2024-05-01T10:00:00Z</responseDate>
  <ListRecords>{recs}{tok}</ListRecords>
</OAI-PMH>"""


def _rec(ident, deleted=False, payload="<dc><title>t</title></dc>"):
    status = ' status="deleted"' if deleted else ""
    meta = "" if deleted else f"<metadata>{payload}</metadata>"
    return (
        f"<record><header{status}>"
        f"<identifier>oai:repo:{ident}</identifier>"
        f"<datestamp>2024-04-30</datestamp></header>{meta}</record>"
    )


class FakeServer:
    """Scripted transport: answers by verb/token, records every URL."""

    def __init__(self, pages, identify=IDENTIFY, failures=0):
        self.pages = pages  # token ('' = initial) -> body
        self.identify = identify
        self.failures = failures  # leading failures per unique URL
        self.urls = []
        self.seen = {}

    def __call__(self, url):
        self.urls.append(url)
        n = self.seen.get(url, 0)
        self.seen[url] = n + 1
        if n < self.failures:
            return 503, "busy"
        if "verb=Identify" in url:
            return 200, self.identify
        if "resumptionToken=" in url:
            token = url.split("resumptionToken=")[1].split("&")[0]
            return 200, self.pages[token]
        return 200, self.pages[""]


def _sleepless(**kw):
    sleeps = []
    kw.setdefault("sleeper", sleeps.append)
    return kw, sleeps


def test_multi_page_harvest_with_deletions(spark):
    server = FakeServer(
        {
            "": _page([_rec("a"), _rec("b", deleted=True)], token="t1"),
            "t1": _page([_rec("c")], token="t2"),
            "t2": _page([_rec("d")]),  # no token: done
        }
    )
    h = OaiPmhHarvester(server, base_url="http://x/oai")
    df = harvest_to_dataframe(spark, h, id_prefix="repo")
    rows = {r["_id"]: r["deleted"] for r in df.collect()}
    assert rows == {
        "repo.a": False, "repo.b": True, "repo.c": False, "repo.d": False,
    }
    # 1 Identify + 3 ListRecords
    assert h.requests_sent == 4
    # the server's responseDate (never the local clock) becomes the
    # next incremental run's from-date, at full detected granularity
    assert h.last_harvested_date == "2024-05-01T10:00:00Z"


def test_retry_then_success(spark):
    server = FakeServer({"": _page([_rec("a")])}, failures=2)
    kw, sleeps = _sleepless()
    h = OaiPmhHarvester(
        server, base_url="http://x/oai", retry_wait=7, **kw
    )
    pages = h.harvest()
    assert len(pages) == 1
    # 2 failures each for Identify and ListRecords, 7s backoff between
    assert sleeps == [7, 7, 7, 7]


def test_retry_exhaustion_raises():
    server = FakeServer({"": _page([_rec("a")])}, failures=99)
    kw, _ = _sleepless()
    h = OaiPmhHarvester(
        server, base_url="http://x/oai", max_tries=3, **kw
    )
    with pytest.raises(RuntimeError, match="after 3 tries"):
        h.harvest()
    # exactly max_tries attempts on the first (Identify) URL
    assert server.seen[server.urls[0]] == 3


def test_same_token_abort():
    # broken repository: t1 returns itself forever (OaiPmh.php:326-339)
    server = FakeServer(
        {
            "": _page([_rec("a")], token="t1"),
            "t1": _page([_rec("a")], token="t1"),
        }
    )
    kw, _ = _sleepless()
    h = OaiPmhHarvester(
        server, base_url="http://x/oai", same_token_limit=5, **kw
    )
    with pytest.raises(RuntimeError, match="Same resumptionToken"):
        h.harvest()


def test_no_records_match_initial_ok_resumption_raises():
    err = """<?xml version="1.0"?>
<OAI-PMH xmlns="http://www.openarchives.org/OAI/2.0/">
  <responseDate>2024-05-01T10:00:00Z</responseDate>
  <error code="noRecordsMatch">no matches</error>
</OAI-PMH>"""
    # initial request: empty incremental window is a normal outcome
    server = FakeServer({"": err})
    kw, _ = _sleepless()
    h = OaiPmhHarvester(
        server, base_url="http://x/oai", from_date="2024-05-01", **kw
    )
    assert len(h.harvest()) == 1
    # mid-pagination it is an error (unless ignore_no_records_match)
    server = FakeServer({"": _page([_rec("a")], token="t1"), "t1": err})
    kw, _ = _sleepless()
    h = OaiPmhHarvester(server, base_url="http://x/oai", **kw)
    with pytest.raises(RuntimeError, match="noRecordsMatch"):
        h.harvest()
    server = FakeServer({"": _page([_rec("a")], token="t1"), "t1": err})
    kw, _ = _sleepless()
    h = OaiPmhHarvester(
        server, base_url="http://x/oai",
        ignore_no_records_match=True, **kw
    )
    assert len(h.harvest()) == 2


def test_granularity_detection_and_from_param():
    day_identify = IDENTIFY.replace(
        "YYYY-MM-DDThh:mm:ssZ", "YYYY-MM-DD"
    )
    server = FakeServer(
        {"": _page([_rec("a")])}, identify=day_identify
    )
    kw, _ = _sleepless()
    h = OaiPmhHarvester(
        server, base_url="http://x/oai", from_date="2024-04-01", **kw
    )
    h.harvest()
    assert h.granularity == "YYYY-MM-DD"
    # from= passed on the initial ListRecords request
    lr = [u for u in server.urls if "ListRecords" in u][0]
    assert "from=2024-04-01" in lr
    # saved date trimmed to date-only granularity
    assert h.last_harvested_date == "2024-05-01"


def test_protocol_error_not_retried():
    bad = """<?xml version="1.0"?>
<OAI-PMH xmlns="http://www.openarchives.org/OAI/2.0/">
  <error code="badArgument">nope</error>
</OAI-PMH>"""
    server = FakeServer({"": bad})
    kw, sleeps = _sleepless()
    h = OaiPmhHarvester(server, base_url="http://x/oai", **kw)
    with pytest.raises(RuntimeError, match="badArgument"):
        h.harvest()
    assert sleeps == []  # an OAI <error> is not a transport flake
