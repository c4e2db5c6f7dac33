"""Forward authority extractor — film-agent authority records.

Behavioral spec (reference, NOT code): Record/ForwardAuthority.php:47-336 —
- the record lives under the envelope's FIRST child element ("main
  element", ForwardAuthority.php:331-336); all paths below are relative
  to it
- id = AgentIdentifier IDTypeName '_' IDValue; record_type = IDTypeName
- heading: CAgentName/PersonName else CAgentName/CorporateName; use_for
  is just [heading] (ForwardAuthority.php:231-241,321-324)
- birth/death date+place from AgentDate entries typed by
  AgentDateEventType 51 (birth) / 52 (death); year extracted
  (ForwardAuthority.php:196-214)
- related_place from AgentPlace/LocationName
- occupation: Affiliation ': ' ProfessionalPosition combined label
  (ForwardAuthority.php:258-278)
- allfields = agency name (RecordSource/SourceName joined with '. ',
  else the source id) + biographical note + heading + use_for.

xpath expressions behind the shared XML gate; no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import keys as K
from .dc import well_formed_xml
from recordmanager_spark.sparkcompat import try_element_at

# main element = first child of the document root
_MAIN = "/*/*[1]"


def _els(xml: Column, path: str) -> Column:
    steps = "".join(f'/*[local-name()="{p}"]' for p in path.split("/"))
    return F.xpath(xml, F.lit(f"{_MAIN}{steps}/text()"))


def _el(xml: Column, path: str) -> Column:
    return F.coalesce(try_element_at(_els(xml, path), 1), F.lit(""))


def _agent_date(xml: Column, event_type: int, part: str) -> Column:
    """DateText/LocationName of the first AgentDate with the event type."""
    vals = F.xpath(
        xml,
        F.lit(
            f'{_MAIN}/*[local-name()="AgentDate"]'
            f'[*[local-name()="AgentDateEventType"][normalize-space(text())="{event_type}"]][1]'
            f'/*[local-name()="{part}"]/text()'
        ),
    )
    return F.coalesce(try_element_at(vals, 1), F.lit(""))


def heading(xml: Column) -> Column:
    person = _el(xml, "CAgentName/PersonName")
    corporate = _el(xml, "CAgentName/CorporateName")
    return F.when(person != "", person).otherwise(corporate)


def agency_name(xml: Column, source: str | None) -> Column:
    names = F.filter(
        F.transform(_els(xml, "RecordSource/SourceName"), lambda v: F.trim(v)),
        lambda v: v != "",
    )
    joined = F.array_join(names, ". ")
    fallback = F.lit(source or "")
    return F.when(joined != "", joined).otherwise(fallback)


def occupations(xml: Column) -> Column:
    affiliation = _el(xml, "ProfessionalAffiliation/Affiliation")
    position = _el(xml, "ProfessionalAffiliation/ProfessionalPosition")
    has_any = F.size(F.xpath(xml, F.lit(f'{_MAIN}/*[local-name()="ProfessionalAffiliation"]'))) > 0
    label = F.when(
        (affiliation != "") & (position != ""),
        F.concat(affiliation, F.lit(": "), position),
    ).otherwise(F.when(position != "", position).otherwise(affiliation))
    return F.when(has_any, F.array(label)).otherwise(F.array().cast("array<string>"))


def to_solr_columns(
    df: DataFrame,
    xml_col: str = "xml",
    source: str | None = None,
    validate: bool = True,
) -> DataFrame:
    x = F.col(xml_col)
    if validate:
        x = F.when(well_formed_xml(x), F.col(xml_col))
    h = heading(x)
    id_type = F.trim(_el(x, "AgentIdentifier/IDTypeName"))
    cols = {
        "id": F.concat(id_type, F.lit("_"), F.trim(_el(x, "AgentIdentifier/IDValue"))),
        "record_format": F.lit("forwardAuthority"),
        "record_type": id_type,
        "heading": h,
        "use_for": F.array(h),
        "birth_date": K.extract_year(_agent_date(x, 51, "DateText")),
        "death_date": K.extract_year(_agent_date(x, 52, "DateText")),
        "birth_place": _agent_date(x, 51, "LocationName"),
        "death_place": _agent_date(x, 52, "LocationName"),
        "related_place": F.filter(
            F.array(_el(x, "AgentPlace/LocationName")), lambda v: v != ""
        ),
        "field_of_activity": F.array().cast("array<string>"),
        "occupation": occupations(x),
        "allfields": F.filter(
            F.concat(
                F.array(agency_name(x, source), _el(x, "BiographicalNote"), h),
                F.array(h),
            ),
            lambda v: v != "",
        ),
    }
    if source is not None:
        cols["source_str_mv"] = F.lit(source)
        cols["datasource_str_mv"] = F.lit(source)
    return df.withColumns(cols)
