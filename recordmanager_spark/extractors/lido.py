"""LIDO (museum object) extractor — XML → wide columns.

Behavioral spec (reference, NOT code): Record/Lido.php:143-281 —
titles from titleWrap appellation values (sort title via createSortTitle),
object/work type as format, legal body as institution, event-derived
authors / display dates (era) / display places (geographic), materials,
subject terms, record-info ids, link resources (first = thumbnail).

Scope note: the reference's event-type filtering (creation/production
relators, secondaryAuthorEvents) and related-work hierarchy are
simplified to their common paths; cited divergence in SURVEY §8.

Namespace-agnostic xpath expressions behind the shared XML gate, like the
DC/EAD extractors — fully JVM.
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


def _trimmed(arr: Column) -> Column:
    return F.filter(
        F.transform(arr, lambda v: F.trim(v)), lambda v: v != ""
    )


def to_solr_columns(df: DataFrame, xml_col: str = "xml", validate: bool = True) -> DataFrame:
    x = F.col(xml_col)
    if validate:
        x = F.when(well_formed_xml(x), F.col(xml_col))
    title = F.trim(_el(x, "titleWrap/titleSet/appellationValue"))
    urls = _trimmed(_els(x, "linkResource"))
    cols: dict[str, Column] = {
        "record_format": F.lit("lido"),
        "title": title,
        "title_short": title,
        "title_full": title,
        "title_sort": K.create_sort_title(title),
        "title_alt": F.slice(
            F.concat(
                _trimmed(_els(x, "titleWrap/titleSet/appellationValue")),
            ),
            2,
            100,
        ),
        "description": F.trim(
            _el(x, "objectDescriptionWrap/objectDescriptionSet/descriptiveNoteValue")
        ),
        "format": F.trim(_el(x, "objectWorkTypeWrap/objectWorkType/term")),
        "institution": F.trim(_el(x, "legalBodyName/appellationValue")),
        "author": _trimmed(
            _els(x, "eventActor/actorInRole/actor/nameActorSet/appellationValue")
        ),
        "topic": _trimmed(_els(x, "subjectWrap/subjectSet/subject/subjectConcept/term")),
        "material": _trimmed(
            _els(x, "eventMaterialsTech/materialsTech/termMaterialsTech/term")
        ),
        "era": _trimmed(_els(x, "eventDate/displayDate")),
        "geographic": _trimmed(
            _els(x, "eventPlace/place/namePlaceSet/appellationValue")
        ),
        "ctrlnum": F.trim(_el(x, "recordWrap/recordID")),
        "url": urls,
        "thumbnail": F.coalesce(try_element_at(urls, 1), F.lit("")),
        "allfields": F.filter(
            F.transform(
                F.xpath(x, F.lit("//*[not(*)]/text()")), lambda v: F.trim(v)
            ),
            lambda v: v != "",
        ),
    }
    out = df.withColumns(cols)
    return out.withColumn(
        "author_sort", F.coalesce(try_element_at(F.col("author"), 1), F.lit(""))
    )
