"""Live OAI-PMH fetch loop over the engine's network-free seam.

Behavioral spec (reference, NOT code): ``Base/Harvest/OaiPmh.php``
- ``harvest`` :220-246 — start from a stored resumptionToken
  (incremental restart), else from ``from``/``until``/``set`` +
  metadataPrefix; keep requesting ``ListRecords`` while the response
  carries a non-empty resumptionToken.
- safeguard :326-339 — a broken repository that returns the SAME
  resumption token over and over must abort: after
  ``sameResumptionTokenLimit`` (default 100, :135) consecutive
  identical tokens, raise instead of looping forever.
- ``sendRequest`` :405-461 — up to ``maxTries`` (default 5,
  AbstractBase.php:209) attempts per request; status >= 300 OR a
  transport exception OR an empty body warns and sleeps ``retryWait``
  seconds (default 30, :216) before retrying; the last attempt
  re-raises.
- ``processResponse`` :474-502 — parse failures raise INSIDE the
  retry loop (a truncated body heals on retry, so the reference
  retries them; mirrored here). An <error> element raises UNLESS the
  code is noRecordsMatch on an initial (non-resumption) request — an
  empty incremental window is a normal outcome, the same error
  mid-pagination is not (unless ``ignore_no_records_match``).
  Deliberate divergence: protocol <error>s are NOT retried here — the
  reference retries them like any exception, but a repository that
  answers badArgument deterministically will answer it 5 times; we
  fail fast and keep the retry budget for transport flakes.
- ``identifyServer`` :781-812 — granularity 'auto' reads
  <granularity> from the Identify response; the server's
  <responseDate> is remembered and becomes the saved "last harvested"
  date when the loop completes (:627-630) — the NEXT incremental run's
  ``from``, formatted per granularity.
- deletion records flow through as header status="deleted"
  (:562-575); the parse side (sources/oaipmh.harvest_records) carries
  the flag.

Like examples/solr_pusher.py the transport is INJECTED:
``transport(url) -> (status, body)``. Tests pass a fake; deployments
pass a urllib wrapper. The fetch loop is inherently sequential (each
page's token names the next page), so it runs on the driver — the
parallel part is the PARSE, which hands the fetched pages to
``sources/oaipmh.harvest_records`` as a DataFrame: at 1000-executor
scale one driver thread fetching pages feeds the cluster-parallel
parse/extract pipeline, and multiple SOURCES harvest concurrently
(the reference's per-source worker processes).
"""

from __future__ import annotations

import time
import xml.etree.ElementTree as ET
from typing import Callable
from urllib.parse import urlencode

__all__ = [
    "OaiPmhHarvester",
    "make_urllib_transport",
    "harvest_to_dataframe",
]


def make_urllib_transport(timeout: float | None = None):
    """Deployment transport: GET via stdlib urllib, returns
    (status_code, body_text); transport failures raise (the retry loop
    treats them like the reference's HTTP client exceptions). Delegates
    to the solr_pusher's urllib wrapper (body=None = GET) so the two
    examples share one maintained HTTP seam."""
    from .solr_pusher import make_urllib_transport as _base

    base = _base(timeout=timeout)

    def transport(url: str):
        return base(url, None, None)

    return transport


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _find_first(root, name):
    for el in root.iter():
        if _local(el.tag) == name:
            return el
    return None


class OaiPmhHarvester:
    """The reference's OAI-PMH fetch loop: resumption-token paging with
    the same-token abort guard, bounded retry with backoff, Identify
    granularity detection, and incremental from/until windows. Collects
    raw response pages — parsing/splitting them is the cluster's job
    (``sources/oaipmh.harvest_records``)."""

    def __init__(
        self,
        transport: Callable,
        *,
        base_url: str,
        metadata_prefix: str = "oai_dc",
        set_spec: str | None = None,
        from_date: str | None = None,
        until_date: str | None = None,
        granularity: str = "auto",
        max_tries: int = 5,
        retry_wait: float = 30,
        same_token_limit: int = 100,
        ignore_no_records_match: bool = False,
        sleeper: Callable = time.sleep,
        log: Callable = lambda level, msg: None,
    ):
        self.transport = transport
        self.base_url = base_url
        self.metadata_prefix = metadata_prefix
        self.set_spec = set_spec
        self.from_date = from_date
        self.until_date = until_date
        self.granularity = granularity
        self.max_tries = max_tries
        self.retry_wait = retry_wait
        self.same_token_limit = same_token_limit
        self.ignore_no_records_match = ignore_no_records_match
        self.sleeper = sleeper
        self.log = log
        self.server_date: str | None = None
        self.last_harvested_date: str | None = None
        self.requests_sent = 0

    # -- transport + response validation (OaiPmh.php:405-502) ----------
    def send_request(self, verb: str, params: dict | None = None) -> str:
        q = dict(params or {})
        q["verb"] = verb
        url = self.base_url + "?" + urlencode(q)
        resumption = "resumptionToken" in q
        last_err: Exception | None = None
        for attempt in range(1, self.max_tries + 1):
            self.log("info", f"Sending request: {url}")
            self.requests_sent += 1
            try:
                status, body = self.transport(url)
                if status >= 300:
                    raise RuntimeError(f"Request failed: {status}")
                if body == "":
                    raise RuntimeError("Empty response from server")
                return self._process_response(body, resumption)
            except _OaiError:
                raise  # protocol-level error: retrying won't help
            except Exception as e:
                last_err = e
                if attempt < self.max_tries:
                    self.log(
                        "warning",
                        f"Request '{url}' failed ({e}), retrying in "
                        f"{self.retry_wait} seconds...",
                    )
                    self.sleeper(self.retry_wait)
        raise RuntimeError(f"Request failed after {self.max_tries} tries") from last_err

    def _process_response(self, body: str, resumption: bool) -> str:
        try:
            root = ET.fromstring(body)
        except ET.ParseError as e:
            raise RuntimeError(f"Failed to parse XML response: {e}") from e
        err = _find_first(root, "error")
        if err is not None:
            code = err.get("code", "")
            if (resumption and not self.ignore_no_records_match) or (
                code != "noRecordsMatch"
            ):
                raise _OaiError(
                    f"OAI-PMH error -- code: {code}, value: {err.text or ''}"
                )
        rd = _find_first(root, "responseDate")
        if rd is not None and rd.text:
            self.server_date = rd.text.strip()
        return body

    # -- Identify (OaiPmh.php:781-812) ----------------------------------
    def identify(self) -> None:
        body = self.send_request("Identify")
        if self.granularity == "auto":
            root = ET.fromstring(body)
            g = _find_first(root, "granularity")
            if g is None or not (g.text or "").strip():
                raise RuntimeError(
                    "Could not find date granularity in the Identify response"
                )
            self.granularity = g.text.strip()
            self.log("info", f"Detected date granularity: {self.granularity}")

    def _format_server_date(self) -> str | None:
        if not self.server_date:
            return None
        # serverDate arrives ISO-8601; trim to the granularity the
        # repository accepts (OaiPmh.php:627-629)
        if self.granularity == "YYYY-MM-DD":
            return self.server_date[:10]
        return self.server_date

    @staticmethod
    def _token_of(body: str) -> str:
        tok = _find_first(ET.fromstring(body), "resumptionToken")
        return (tok.text or "").strip() if tok is not None else ""

    # -- the loop (OaiPmh.php:220-246 + safeguard :326-339) --------------
    def harvest(self, resumption_token: str | None = None) -> list[str]:
        """Fetch every ListRecords page; returns the raw page bodies.
        ``resumption_token`` restarts an interrupted harvest mid-stream
        (the reference persists it per source)."""
        self.identify()
        if resumption_token:
            self.log("info", "Incremental harvest from given resumptionToken")
            body = self.send_request(
                "ListRecords", {"resumptionToken": resumption_token}
            )
        else:
            params = {"metadataPrefix": self.metadata_prefix}
            if self.from_date:
                self.log(
                    "info",
                    f"Incremental harvest from timestamp {self.from_date}",
                )
                params["from"] = self.from_date
            else:
                self.log("info", "Initial harvest for all records")
            if self.until_date:
                params["until"] = self.until_date
            if self.set_spec:
                params["set"] = self.set_spec
            body = self.send_request("ListRecords", params)
        pages = [body]
        token = self._token_of(body)
        last_token, same_count = "", 0
        while token:
            if token == last_token:
                same_count += 1
                if same_count >= self.same_token_limit:
                    raise RuntimeError(
                        f"Same resumptionToken received {same_count} "
                        "times, aborting"
                    )
            else:
                last_token, same_count = token, 0
            body = self.send_request(
                "ListRecords", {"resumptionToken": token}
            )
            pages.append(body)
            token = self._token_of(body)
        # loop complete: the server's own date becomes the next run's
        # incremental 'from' (never the local clock — clock skew would
        # drop records)
        self.last_harvested_date = self._format_server_date()
        return pages


class _OaiError(RuntimeError):
    """Protocol-level OAI-PMH <error> — not retriable."""


def harvest_to_dataframe(spark, harvester: OaiPmhHarvester, **parse_kwargs):
    """Run the fetch loop and hand the pages to the cluster-parallel
    parse (sources/oaipmh.harvest_records): one row per harvested
    record with deletion flags and harvested-id handling."""
    from ..sources.oaipmh import harvest_records

    pages = harvester.harvest()
    df = spark.createDataFrame([(p,) for p in pages], "xml string")
    return harvest_records(df, xml_col="xml", **parse_kwargs)
