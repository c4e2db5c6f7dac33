"""EAC-CPF (authority person/corporate) extractor.

Behavioral spec (reference, NOT code): Record/Eaccpf.php:70-383 —
- heading from the identity's direct nameEntry parts: the LAST
  localType=TONI1 part (surname) + the LAST TONI4 part (forename),
  falling back to the first use_for heading
- use_for = one "TONI1 TONI4" heading per nameEntryParallel (parts of
  its first nameEntry)
- birth/death dates from existDates dates with the RDA birth/death
  localType URIs (first standardDate with an extractable year)
- birth/death places from places typed P50119/P50118 (first placeEntry);
  related_place = the first placeEntry of every OTHER place
- field_of_activity = functions typed TJ37, descriptiveNote paragraphs
  joined with '. '
- language = control/languageDeclaration/language @languageCode
- source = maintenance agency name
- allfields = agency name + biogHist paragraphs + heading + use_for.

xpath expressions behind the shared XML gate, like the other drivers.
Replayed against the reference's eaccpf1.xml golden fixture in
tests/test_golden_authority.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dc import well_formed_xml
from recordmanager_spark.sparkcompat import try_element_at

_RDA_BIRTH_DATE = "http://rdaregistry.info/Elements/a/P50121"
_RDA_DEATH_DATE = "http://rdaregistry.info/Elements/a/P50120"
_RDA_BIRTH_PLACE = "http://rdaregistry.info/Elements/a/P50119"
_RDA_DEATH_PLACE = "http://rdaregistry.info/Elements/a/P50118"

# nameEntryParallel / function nodes probed positionally (records carry a
# handful; 6 covers the corpus)
_MAX_PARALLEL = 6


def _els(xml: Column, path: str) -> Column:
    steps = "/".join(f'*[local-name()="{p}"]' for p in path.split("/"))
    return F.xpath(xml, F.lit(f"//{steps}/text()"))


def _el(xml: Column, path: str) -> Column:
    return F.coalesce(try_element_at(_els(xml, path), 1), F.lit(""))


def _typed_year(xml: Column, localtype: str) -> Column:
    dates = F.xpath(
        xml,
        F.lit(
            f'//*[local-name()="date" and @localType="{localtype}"]'
            "/@standardDate"
        ),
    )
    years = F.filter(
        F.transform(dates, lambda d: F.regexp_extract(d, "(\\d{4})", 1)),
        lambda y: y != "",
    )
    return F.coalesce(try_element_at(years, 1), F.lit(""))


def _typed_place(xml: Column, localtype: str) -> Column:
    vals = F.xpath(
        xml,
        F.lit(
            f'//*[local-name()="place"][@localType="{localtype}"]'
            '/*[local-name()="placeEntry"][1]/text()'
        ),
    )
    return F.coalesce(try_element_at(vals, 1), F.lit(""))


def _name_pair(name1: Column, name2: Column) -> Column:
    """trim("$name1 $name2") with either side possibly empty."""
    return F.trim(
        F.concat_ws(
            " ",
            F.nullif(F.trim(name1), F.lit("")),
            F.nullif(F.trim(name2), F.lit("")),
        )
    )


def to_solr_columns(
    df: DataFrame, xml_col: str = "xml", validate: bool = True
) -> DataFrame:
    x = F.col(xml_col)
    if validate:
        x = F.when(well_formed_xml(x), F.col(xml_col))

    def last_part(scope: str, toni: str) -> Column:
        vals = F.xpath(
            x,
            F.lit(f'{scope}/*[local-name()="part"][@localType="{toni}"]/text()'),
        )
        return F.coalesce(try_element_at(vals, -1), F.lit(""))

    direct_entry = (
        '//*[local-name()="identity"]/*[local-name()="nameEntry"]'
    )
    heading_names = _name_pair(
        last_part(direct_entry, "TONI1"), last_part(direct_entry, "TONI4")
    )

    use_for_parts = []
    for i in range(1, _MAX_PARALLEL + 1):
        scope = (
            f'(//*[local-name()="nameEntryParallel"])[{i}]'
            '/*[local-name()="nameEntry"][1]'
        )
        use_for_parts.append(
            _name_pair(last_part(scope, "TONI1"), last_part(scope, "TONI4"))
        )
    use_for = F.filter(F.array(*use_for_parts), lambda v: v != "")

    heading = F.when(heading_names != "", heading_names).otherwise(
        F.coalesce(try_element_at(use_for, 1), F.lit(""))
    )

    # functions typed TJ37: descriptiveNote paragraphs joined with '. '
    activity_parts = []
    for i in range(1, _MAX_PARALLEL + 1):
        ps = F.xpath(
            x,
            F.lit(
                f'(//*[local-name()="function"][@localType="TJ37"])[{i}]'
                '/*[local-name()="descriptiveNote"]/*[local-name()="p"]/text()'
            ),
        )
        activity_parts.append(F.array_join(ps, ". "))
    field_of_activity = F.filter(
        F.array(*activity_parts), lambda v: v.isNotNull() & (v != "")
    )

    related = F.xpath(
        x,
        F.lit(
            '//*[local-name()="place"]'
            f'[not(@localType="{_RDA_BIRTH_PLACE}")]'
            f'[not(@localType="{_RDA_DEATH_PLACE}")]'
            '/*[local-name()="placeEntry"][1]/text()'
        ),
    )

    agency = F.trim(_el(x, "maintenanceAgency/agencyName"))
    biog = F.filter(
        F.transform(_els(x, "biogHist/p"), lambda v: F.trim(v)),
        lambda v: v != "",
    )
    lang = F.coalesce(
        try_element_at(
            F.xpath(
                x,
                F.lit(
                    '//*[local-name()="languageDeclaration"]'
                    '/*[local-name()="language"]/@languageCode'
                ),
            ),
            1,
        ),
        F.lit(""),
    )

    return df.withColumns(
        {
            "record_format": F.lit("eaccpf"),
            "record_type": F.coalesce(
                F.nullif(F.trim(_el(x, "identity/entityType")), F.lit("")),
                F.lit("undefined"),
            ),
            "heading": heading,
            "use_for": use_for,
            "birth_date": _typed_year(x, _RDA_BIRTH_DATE),
            "death_date": _typed_year(x, _RDA_DEATH_DATE),
            "birth_place": _typed_place(x, _RDA_BIRTH_PLACE),
            "death_place": _typed_place(x, _RDA_DEATH_PLACE),
            "related_place": F.filter(
                F.transform(related, lambda v: F.trim(v)), lambda v: v != ""
            ),
            "occupation": F.filter(
                F.transform(_els(x, "occupation/term"), lambda v: F.trim(v)),
                lambda v: v != "",
            ),
            "field_of_activity": field_of_activity,
            "language": F.trim(lang),
            "source": agency,
            "agency": agency,
            # getAllFields (Eaccpf.php:113-130): agency + biogHist
            # paragraphs + heading + use_for, in that order
            "allfields": F.filter(
                F.concat(
                    F.array(agency), biog, F.array(heading), use_for
                ),
                lambda v: v != "",
            ),
        }
    )
