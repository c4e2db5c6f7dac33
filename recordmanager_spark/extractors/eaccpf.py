"""EAC-CPF (authority person/corporate) extractor.

Behavioral spec (reference, NOT code): Record/Eaccpf.php:73-200 —
- record_type from cpfDescription/identity/entityType
- heading = first authorized nameEntry parts joined; use_for = the
  alternative nameEntry parts (variant headings)
- birth/death dates from existDates dateSet dates typed with the RDA
  birth/death localType URIs (year extracted from standardDate)
- occupations / fields of activity from description terms
- allfields: agency name + biogHist paragraphs + headings.

xpath expressions behind the shared XML gate, like the other drivers.
The authorized-vs-alternative nameEntry distinction uses the common
``@localType``-free first entry = authorized convention when no explicit
authorizedForm attribute exists (documented simplification).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dc import well_formed_xml
from recordmanager_spark.sparkcompat import try_element_at

_RDA_BIRTH = "http://rdaregistry.info/Elements/a/P50121"
_RDA_DEATH = "http://rdaregistry.info/Elements/a/P50120"


def _els(xml: Column, path: str) -> Column:
    steps = "/".join(f'*[local-name()="{p}"]' for p in path.split("/"))
    return F.xpath(xml, F.lit(f"//{steps}/text()"))


def _el(xml: Column, path: str) -> Column:
    return F.coalesce(try_element_at(_els(xml, path), 1), F.lit(""))


def _typed_year(xml: Column, localtype: str) -> Column:
    dates = F.xpath(
        xml,
        F.lit(
            f'//*[local-name()="date" and @localType="{localtype}"]/@standardDate'
        ),
    )
    first = F.coalesce(try_element_at(dates, 1), F.lit(""))
    return F.regexp_extract(first, "(\\d{4})", 1)


def to_solr_columns(df: DataFrame, xml_col: str = "xml", validate: bool = True) -> DataFrame:
    x = F.col(xml_col)
    if validate:
        x = F.when(well_formed_xml(x), F.col(xml_col))
    # every nameEntry joined from its parts; first = heading, rest = use_for
    name_entries = F.xpath(
        x,
        F.lit(
            '//*[local-name()="identity"]/*[local-name()="nameEntry"]'
        ),
    )
    # xpath() returns node text only via /text(); join parts per entry by
    # counting entries and slicing part lists is fragile — use per-entry
    # part concatenation through positional predicates instead
    first_parts = F.xpath(
        x,
        F.lit(
            '//*[local-name()="identity"]/*[local-name()="nameEntry"][1]/*[local-name()="part"]/text()'
        ),
    )
    all_parts_by_entry = F.xpath(
        x,
        F.lit(
            '//*[local-name()="identity"]/*[local-name()="nameEntry"][position()>1]/*[local-name()="part"]/text()'
        ),
    )
    heading = F.coalesce(
        F.array_join(F.transform(first_parts, lambda v: F.trim(v)), ", "),
        F.lit(""),
    )
    return df.withColumns(
        {
            "record_format": F.lit("eaccpf"),
            "record_type": F.trim(_el(x, "identity/entityType")),
            "heading": heading,
            "use_for": F.filter(
                F.transform(all_parts_by_entry, lambda v: F.trim(v)),
                lambda v: v != "",
            ),
            "birth_date": _typed_year(x, _RDA_BIRTH),
            "death_date": _typed_year(x, _RDA_DEATH),
            "occupation": F.filter(
                F.transform(_els(x, "occupation/term"), lambda v: F.trim(v)),
                lambda v: v != "",
            ),
            "field_of_activity": F.filter(
                F.transform(
                    _els(x, "functions/function/term"), lambda v: F.trim(v)
                ),
                lambda v: v != "",
            ),
            "agency": F.trim(_el(x, "maintenanceAgency/agencyName")),
            "allfields": F.filter(
                F.transform(
                    F.xpath(x, F.lit("//*[not(*)]/text()")), lambda v: F.trim(v)
                ),
                lambda v: v != "",
            ),
        }
    )
