"""LIDO (museum object) extractor — XML → wide columns.

Behavioral spec (reference, NOT code): Record/Lido.php:143-210 (toSolrArray)
with the event-type machinery :55-85, :722-805, :1101-1160:

- events are selected BY TYPE with priority: main events are design(0) then
  creation(1); place events are usage(0) (getEventNodes matches event
  type terms case-insensitively)
- authors = actors of main events (first appellation value per role node,
  getActors :722-749)
- era = subject display dates, falling back to the first main-event
  display date (getDisplayDates :1418-1425)
- geographic = usage-event display places + subject display places +
  repository locations (getDisplayPlaces :1432-1441); geographic_facet
  additionally carries subject place appellations (toSolrArray :171-176)
- topic = subject concept terms with iconclass-type subjects excluded
  (getSubjectTerms :844-857, getSubjectNodes :1161-1175)
- materials = main-event materialsTech terms, falling back to the display
  terms (getEventMaterials :952-970)
- collection = related work display object for collection-ish relation
  types (getCollection, relatedWorkRelationTypes :93-95)

Namespace-agnostic xpath expressions behind the shared XML gate, like the
DC/EAD extractors — fully JVM. Event-type priority becomes one xpath call
per type, concatenated in priority order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import keys as K
from .dc import well_formed_xml
from recordmanager_spark.sparkcompat import try_element_at

# Event type vocabularies (Lido.php:61-85; config-overridable per source)
MAIN_EVENTS = ("design", "creation")
PLACE_EVENTS = ("usage",)
RELATED_WORK_RELATION_TYPES = (
    "Collection", "belongs to collection", "collection",
)

_LOWER = (
    "translate(normalize-space(.),"
    " 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')"
)


def _steps(path: str) -> str:
    out = []
    for p in path.split("/"):
        if p.endswith("[1]"):
            out.append(f'*[local-name()="{p[:-3]}"][1]')
        else:
            out.append(f'*[local-name()="{p}"]')
    return "/".join(out)


def _els(xml: Column, path: str) -> Column:
    return F.xpath(xml, F.lit(f"//{_steps(path)}/text()"))


def _el(xml: Column, path: str) -> Column:
    return F.coalesce(try_element_at(_els(xml, path), 1), F.lit(""))


def _event_els(xml: Column, event_types, subpath: str) -> Column:
    """Values under events of the given types, in priority order (one xpath
    per type keeps getEventNodes' priority ordering)."""
    parts = []
    for et in event_types:
        ev = (
            f'*[local-name()="event"]'
            f'[*[local-name()="eventType"]/*[local-name()="term"][{_LOWER}="{et}"]]'
        )
        parts.append(
            F.xpath(xml, F.lit(f"//{ev}/{_steps(subpath)}/text()"))
        )
    return F.concat(*parts) if len(parts) > 1 else parts[0]


# subjects whose @type is not an excluded classification (iconclass)
_SUBJECT = (
    '*[local-name()="subject"]'
    f'[not(@type) or not({_LOWER.replace("(.)", "(@type)")}="iconclass")]'
)


def _subject_els(xml: Column, subpath: str, exclude_types: bool = False) -> Column:
    subj = _SUBJECT if exclude_types else '*[local-name()="subject"]'
    return F.xpath(xml, F.lit(f"//{subj}/{_steps(subpath)}/text()"))


def _trimmed(arr: Column) -> Column:
    return F.filter(F.transform(arr, lambda v: F.trim(v)), lambda v: v != "")


def _stripped(arr: Column) -> Column:
    """trim + stripTrailingPunctuation(str, '.') — the form the reference
    applies to display places/dates."""
    return F.filter(
        F.transform(
            arr,
            lambda v: F.trim(K.strip_trailing_punctuation(F.trim(v), additional=".")),
        ),
        lambda v: v != "",
    )


def to_solr_columns(df: DataFrame, xml_col: str = "xml", validate: bool = True) -> DataFrame:
    x = F.col(xml_col)
    if validate:
        x = F.when(well_formed_xml(x), F.col(xml_col))
    title = F.trim(_el(x, "titleWrap/titleSet/appellationValue"))
    urls = _trimmed(_els(x, "linkResource"))
    subj_dates = _stripped(_subject_els(x, "subjectDate/displayDate"))
    main_date = F.coalesce(
        try_element_at(
            _trimmed(_event_els(x, MAIN_EVENTS, "eventDate/displayDate")), 1
        ),
        F.lit(""),
    )
    era = F.when(F.size(subj_dates) > 0, subj_dates).otherwise(
        F.filter(F.array(main_date), lambda v: v != "")
    )
    event_places = _stripped(
        _event_els(x, PLACE_EVENTS, "eventPlace/displayPlace")
    )
    subj_display_places = _stripped(_subject_els(x, "subjectPlace/displayPlace"))
    repo_locations = _trimmed(
        _els(x, "repositorySet/repositoryLocation/namePlaceSet/appellationValue")
    )
    geographic = F.concat(event_places, subj_display_places, repo_locations)
    subj_places = _stripped(
        _subject_els(x, "subjectPlace/place/namePlaceSet/appellationValue")
    )
    materials = _trimmed(
        _event_els(
            x, MAIN_EVENTS, "eventMaterialsTech/materialsTech/termMaterialsTech/term"
        )
    )
    display_materials = _trimmed(
        _event_els(x, MAIN_EVENTS, "eventMaterialsTech/displayMaterialsTech")
    )
    rel = (
        '*[local-name()="relatedWorkSet"]'
        "[" + " or ".join(
            f'*[local-name()="relatedWorkRelType"]/*[local-name()="term"]'
            f'[normalize-space(.)="{t}"]'
            for t in RELATED_WORK_RELATION_TYPES
        ) + "]"
    )
    collection = F.coalesce(
        try_element_at(
            F.xpath(
                x,
                F.lit(
                    f'//{rel}/*[local-name()="relatedWork"]'
                    f'/*[local-name()="displayObject"]/text()'
                ),
            ),
            1,
        ),
        F.lit(""),
    )
    cols: dict[str, Column] = {
        "record_format": F.lit("lido"),
        "title": title,
        "title_short": title,
        "title_full": title,
        "title_sort": K.create_sort_title(title),
        "title_alt": F.slice(
            _trimmed(_els(x, "titleWrap/titleSet/appellationValue")), 2, 100
        ),
        "description": F.trim(
            _el(x, "objectDescriptionWrap/objectDescriptionSet/descriptiveNoteValue")
        ),
        "format": F.trim(_el(x, "objectWorkTypeWrap/objectWorkType/term")),
        "institution": F.trim(_el(x, "legalBodyName/appellationValue")),
        # actors of MAIN events only; first appellation value per role node
        "author": _trimmed(
            _event_els(
                x,
                MAIN_EVENTS,
                "eventActor/actorInRole/actor/nameActorSet/appellationValue[1]",
            )
        ),
        "topic": _trimmed(
            _subject_els(x, "subjectConcept/term", exclude_types=True)
        ),
        "material": F.when(F.size(materials) > 0, materials).otherwise(
            display_materials
        ),
        "era": era,
        "era_facet": era,
        "geographic": geographic,
        "geographic_facet": F.concat(geographic, subj_places),
        "collection": collection,
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
