"""MARC authority extractor — person/corporate name records.

Behavioral spec (reference, NOT code): Record/MarcAuthority.php:45-266 —
- id from 035$a; record_type 'Personal Name' when a 100 field exists,
  else 'Corporate Name' (MarcAuthority.php:59-62,235-248)
- heading: 100$a right-trimmed of ' .'; otherwise the first 110/111 field
  with $a, joined with its $b values by ' / ' (MarcAuthority.php:184-203)
- use_for headings: subfield $a of 400/410 + 111/411/500/510/511, unique,
  trailing '. ' trimmed (MarcAuthority.php:112-144)
- birth/death year from 046$f/$g; places from 370$a/$b/$c; related
  places = unique 370$e/$f (MarcAuthority.php:87-95,210-218)
- field_of_activity = ALL 372$a values; occupation = first $a per 374
  field; occupation ids for enrichment = 374$0
  (MarcAuthority.php:131-134,151-177).

Runs entirely over the parsed MARC struct column (same
``array<struct<tag,ind1,ind2,value,subfields>>`` layout as
``extractors/marc.py``) — JVM higher-order functions, no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import keys as K
from .marc import _sub_values, fields_by_tag, first_subfield, marc_allfields
from recordmanager_spark.sparkcompat import try_element_at


def _trim_dot_space(v: Column) -> Column:
    return F.regexp_replace(v, "[. ]+\\z", "")


def _first_sub_per_field(marc: Column, tag: str, code: str) -> Column:
    """First `code` value of EACH `tag` field (non-empty only)."""
    return F.filter(
        F.transform(
            fields_by_tag(marc, tag),
            lambda f: F.coalesce(try_element_at(_sub_values(f, [code]), 1), F.lit("")),
        ),
        lambda v: v != "",
    )


def _all_subs(marc: Column, tag: str, code: str) -> Column:
    """All `code` values across all `tag` fields."""
    return F.filter(
        F.flatten(
            F.transform(fields_by_tag(marc, tag), lambda f: _sub_values(f, [code]))
        ),
        lambda v: v != "",
    )


def heading(marc: Column) -> Column:
    """100$a (rtrim ' .') else first 110/111 joined '$a / $b / ...'."""
    personal = F.regexp_replace(first_subfield(marc, "100", "a"), "[ .]+\\z", "")

    def corp(tag: str) -> Column:
        field = try_element_at(
            F.filter(
                fields_by_tag(marc, tag),
                lambda f: F.size(
                    F.filter(_sub_values(f, ["a"]), lambda v: v != "")
                )
                > 0,
            ),
            1,
        )
        parts = F.concat(
            F.slice(F.filter(_sub_values(field, ["a"]), lambda v: v != ""), 1, 1),
            F.filter(_sub_values(field, ["b"]), lambda v: v != ""),
        )
        joined = F.array_join(F.transform(parts, _trim_dot_space), " / ")
        return F.when(joined != "", joined)

    return F.coalesce(
        F.when(personal != "", personal), corp("110"), corp("111"), F.lit("")
    )


def use_for_headings(marc: Column) -> Column:
    """$a of 400/410/111/411/500/510/511, order-preserving unique, trimmed."""
    arrays = [
        _first_sub_per_field(marc, tag, "a")
        for tag in ("400", "410", "111", "411", "500", "510", "511")
    ]
    return F.transform(F.array_distinct(F.concat(*arrays)), _trim_dot_space)


def to_solr_columns(df: DataFrame, marc_col: str = "marc", source: str | None = None) -> DataFrame:
    m = F.col(marc_col)
    h = heading(m)
    cols = {
        "id": first_subfield(m, "035", "a"),
        "record_format": F.lit("marcAuthority"),
        "allfields": marc_allfields(m),
        "heading": h,
        "heading_keywords": h,
        "use_for": use_for_headings(m),
        "use_for_keywords": use_for_headings(m),
        "record_type": F.when(
            F.size(fields_by_tag(m, "100")) > 0, F.lit("Personal Name")
        ).otherwise(F.lit("Corporate Name")),
        "birth_date": K.extract_year(first_subfield(m, "046", "f")),
        "death_date": K.extract_year(first_subfield(m, "046", "g")),
        "birth_place": first_subfield(m, "370", "a"),
        "death_place": first_subfield(m, "370", "b"),
        "country": first_subfield(m, "370", "c"),
        "related_places_str_mv": F.filter(
            F.array_distinct(
                F.array(
                    K.strip_trailing_punctuation(first_subfield(m, "370", "e")),
                    K.strip_trailing_punctuation(first_subfield(m, "370", "f")),
                )
            ),
            lambda v: v != "",
        ),
        "field_of_activity": _all_subs(m, "372", "a"),
        "occupation": _first_sub_per_field(m, "374", "a"),
        "occupation_ids": _all_subs(m, "374", "0"),
    }
    if source is not None:
        cols["source_str_mv"] = F.lit(source)
        cols["datasource_str_mv"] = F.lit(source)
    return df.withColumns(cols)
