"""EAD (archival finding aid) extractor — component XML → wide columns.

Behavioral spec (reference, NOT code): Record/Ead.php:159-281 —
- ctrlnum from the element's @id
- description: scopecontent/p paragraphs joined with '   /   '
- authors from controlaccess/persname ('-' placeholders dropped),
  corporate from controlaccess/corpname / did/origination/corpname
- title from did/unittitle (subtitle-prepend default), lowercase
  punctuation-stripped sort title
- language from did/langmaterial/language (@langcode preferred)
- physical from physdesc/extent ('-' dropped)
- hierarchy fields (hierarchy_top_id/title, sequence) from the
  splitter's archive metadata — our splitter carries them as columns
  (archive_id / archive_title / sequence) instead of injected XML.

All element access is namespace-agnostic ``xpath`` expressions — fully
JVM like the DC extractor; input is masked through the same
well-formedness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import keys as K
from .dc import well_formed_xml
from recordmanager_spark.sparkcompat import try_element_at


def _els(xml: Column, path: str) -> Column:
    steps = "/".join(f'*[local-name()="{p}"]' for p in path.split("/"))
    return F.xpath(xml, F.lit(f"//{steps}/text()"))


def _el(xml: Column, path: str) -> Column:
    return F.coalesce(try_element_at(_els(xml, path), 1), F.lit(""))


def _attr(xml: Column, expr: str) -> Column:
    return F.coalesce(try_element_at(F.xpath(xml, F.lit(expr)), 1), F.lit(""))


def to_solr_columns(
    df: DataFrame,
    xml_col: str = "part_xml",
    archive_id_col: str | None = "archive_id",
    archive_title_col: str | None = "archive_title",
    sequence_col: str | None = "sequence",
    validate: bool = True,
) -> DataFrame:
    x = F.col(xml_col)
    if validate:
        x = F.when(well_formed_xml(x), F.col(xml_col))
    title_short = F.trim(_el(x, "did/unittitle"))
    cols: dict[str, Column] = {
        "record_format": F.lit("ead"),
        "ctrlnum": _attr(x, "/*/@id"),
        "level": F.coalesce(
            F.when(_attr(x, "/*/@level") != "", _attr(x, "/*/@level")),
            F.lit(""),
        ),
        "description": F.when(
            F.size(_els(x, "scopecontent/p")) > 0,
            F.array_join(
                F.transform(_els(x, "scopecontent/p"), lambda v: F.trim(v)), "   /   "
            ),
        ).otherwise(F.trim(_el(x, "scopecontent"))),
        "author": F.filter(
            F.transform(_els(x, "controlaccess/persname"), lambda v: F.trim(v)),
            lambda v: (v != "-") & (v != ""),
        ),
        "author_corporate": F.when(
            _el(x, "did/origination/corpname") != "",
            F.array(F.trim(_el(x, "did/origination/corpname"))),
        ).otherwise(
            F.transform(_els(x, "controlaccess/corpname"), lambda v: F.trim(v))
        ),
        "topic": F.transform(_els(x, "controlaccess/subject"), lambda v: F.trim(v)),
        "institution": F.coalesce(
            F.when(
                _el(x, "did/repository/corpname") != "",
                _el(x, "did/repository/corpname"),
            ),
            F.trim(_el(x, "did/repository")),
        ),
        "title_short": title_short,
        "title": title_short,
        "title_full": title_short,
        "title_sort": F.lower(K.strip_punctuation(title_short)),
        "language": F.filter(
            F.transform(
                F.concat(
                    F.xpath(
                        x,
                        F.lit(
                            '//*[local-name()="langmaterial"]/*[local-name()="language"]/@langcode'
                        ),
                    ),
                    _els(x, "langmaterial/language"),
                ),
                lambda v: F.lower(F.trim(v)),
            ),
            lambda v: v != "",
        ),
        "physical": F.filter(
            F.transform(_els(x, "physdesc/extent"), lambda v: F.trim(v)),
            lambda v: (v != "-") & (v != ""),
        ),
        "allfields": F.filter(
            F.transform(F.xpath(x, F.lit("//*[not(*)]/text()")), lambda v: F.trim(v)),
            lambda v: v != "",
        ),
        "hierarchytype": F.lit("Default"),
    }
    out = df.withColumns(cols)
    if archive_id_col and archive_id_col in df.columns:
        out = out.withColumn("hierarchy_top_id", F.col(archive_id_col))
    if archive_title_col and archive_title_col in df.columns:
        out = out.withColumn("hierarchy_top_title", F.col(archive_title_col))
    if sequence_col and sequence_col in df.columns:
        out = out.withColumn("hierarchy_sequence", F.col(sequence_col))
    return out
