"""GeniePlus API harvester — offline page processing.

Behavioral spec (reference, NOT code): Harvest/GeniePlus.php —
- pages of ``{"total": N, "records": [...]}``; every template field is
  ``[{"display": value}, ...]`` (GeniePlus.php:455-486); OAuth + offset
  paging stay driver-side network code
- the bibliographic record is line-based ("tagged") MARC text in the
  ``MarcRecord`` field, converted and then augmented with a 999$c unique
  record id and 852 holdings fields (GeniePlus.php:676-733)
- holdings group location/sublocation/callnumber/barcode arrays BY INDEX
  into (a, b, h, p) items keyed on ``loc-subloc-callno``; empty rows are
  skipped; ``itemLimitPerLocationGroup`` caps each group, negative =
  unlimited (GeniePlus.php:598-673)
- oai id = ``genieplus:<source>:<id>`` (GeniePlus.php:566-569).

Spark shape: ``from_json`` with a ``map<string, array<struct<display>>>``
record schema (template field names are config, so a map beats a fixed
struct), the line-MARC parse reuses the Arrow-batched parser from
``extractors/linemarc.py``, and the 999/852 injection is array
expressions over the parsed struct.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..extractors.linemarc import parse_line_based_marc
from recordmanager_spark.sparkcompat import try_element_at

GENIE_PAGE_SCHEMA = (
    "total bigint, records array<map<string, array<struct<display string>>>>"
)

_FIELD_TYPE = (
    "array<struct<tag:string,ind1:string,ind2:string,value:string,"
    "subfields:array<struct<code:string,value:string>>>>"
)


def _displays(rec: Column, field: str) -> Column:
    return F.transform(
        F.coalesce(rec[field], F.array()),
        lambda v: F.coalesce(v["display"], F.lit("")),
    )


def _first_display(rec: Column, field: str) -> Column:
    return F.coalesce(try_element_at(rec[field], 1)["display"], F.lit(""))


def _holdings_852(rec: Column, fields: dict[str, str], item_limit: int) -> Column:
    """852 field structs from index-aligned location/callnumber arrays."""
    locs = _displays(rec, fields["location"])
    subs = _displays(rec, fields["sublocation"])
    calls = _displays(rec, fields["callnumber"])
    bars = _displays(rec, fields["barcode"])
    n = F.greatest(F.size(locs), F.size(subs), F.size(calls), F.size(bars))
    at = lambda arr, i: F.coalesce(try_element_at(arr, i + 1), F.lit(""))  # noqa: E731
    idx = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    items = F.filter(
        F.transform(
            idx,
            lambda i: F.struct(
                at(locs, i).alias("a"),
                at(subs, i).alias("b"),
                at(calls, i).alias("h"),
                at(bars, i).alias("p"),
                F.concat_ws("-", at(locs, i), at(subs, i), at(calls, i)).alias("key"),
            ),
        ),
        lambda it: (it["p"] != "") | (it["key"] != "--"),
    )
    keys = F.transform(items, lambda it: it["key"])
    uniq_pos = F.filter(
        F.when(F.size(keys) > 0, F.sequence(F.lit(0), F.size(keys) - 1)).otherwise(
            F.array().cast("array<int>")
        ),
        lambda i: ~F.array_contains(F.slice(keys, 1, i), try_element_at(keys, i + 1)),
    )
    cap = 1_000_000 if item_limit < 0 else item_limit
    grouped = F.flatten(
        F.transform(
            uniq_pos,
            lambda i: F.slice(
                F.filter(items, lambda it: it["key"] == try_element_at(keys, i + 1)),
                1,
                cap,
            ),
        )
    )
    return F.transform(
        grouped,
        lambda it: F.struct(
            F.lit("852").alias("tag"),
            F.lit(" ").alias("ind1"),
            F.lit(" ").alias("ind2"),
            F.lit(None).cast("string").alias("value"),
            F.filter(
                F.array(
                    F.struct(F.lit("a").alias("code"), it["a"].alias("value")),
                    F.struct(F.lit("b").alias("code"), it["b"].alias("value")),
                    F.struct(F.lit("h").alias("code"), it["h"].alias("value")),
                    F.struct(F.lit("p").alias("code"), it["p"].alias("value")),
                ),
                lambda s: s["value"].isNotNull(),
            ).alias("subfields"),
        ),
    )


def harvest_pages(
    pages: DataFrame,
    json_col: str = "json",
    source: str = "genie",
    keep: list[str] | None = None,
    id_field: str = "UniqRecNum",
    marc_field: str = "MarcRecord",
    location_field: str = "Inventory.Location.CodeDesc",
    sublocation_field: str = "Inventory.SubLoc.CodeDesc",
    callnumber_field: str = "Inventory.CallNumLC",
    barcode_field: str = "Inventory.Barcode",
    item_limit_per_location_group: int = -1,
    unique_id_field: str = "999",
    unique_id_subfield: str = "c",
) -> DataFrame:
    """GeniePlus JSON pages → one row per record with the parsed-MARC
    struct augmented with the 999$c record id and 852 holdings.

    Columns: oai_id, local_id, marc. An ``item_limit_per_location_group``
    of 0 disables holdings entirely (reference short-circuit).

    Plan note: put a materialization barrier (write to the records table,
    ``repartition``, or checkpoint) between this and a WIDE projection
    like ``marc.to_solr_columns`` — chaining directly makes Catalyst
    inline the sizeable marc-construction expression into every output
    column and the plan tree explodes. The normal pipeline (harvest →
    upsert into records → extract) has that barrier naturally.
    """
    parsed = pages.select(
        *(keep or []),
        F.explode(
            F.coalesce(
                F.from_json(F.col(json_col), GENIE_PAGE_SCHEMA)["records"],
                F.array(),
            )
        ).alias("__r"),
    )
    r = F.col("__r")
    local_id = _first_display(r, id_field)
    with_marc = parsed.select(
        *(keep or []),
        F.concat(F.lit(f"genieplus:{source}:"), local_id).alias("oai_id"),
        local_id.alias("local_id"),
        parse_line_based_marc(_first_display(r, marc_field)).alias("__marc"),
        r.alias("__r"),
    )
    r = F.col("__r")
    id_999 = F.array(
        F.struct(
            F.lit(unique_id_field).alias("tag"),
            F.lit(" ").alias("ind1"),
            F.lit(" ").alias("ind2"),
            F.lit(None).cast("string").alias("value"),
            F.array(
                F.struct(
                    F.lit(unique_id_subfield).alias("code"),
                    F.col("local_id").alias("value"),
                )
            ).alias("subfields"),
        )
    )
    holdings = (
        F.array().cast(_FIELD_TYPE)
        if item_limit_per_location_group == 0
        else _holdings_852(
            r,
            {
                "location": location_field,
                "sublocation": sublocation_field,
                "callnumber": callnumber_field,
                "barcode": barcode_field,
            },
            item_limit_per_location_group,
        )
    )
    marc = F.struct(
        F.col("__marc")["leader"].alias("leader"),
        F.concat(
            F.coalesce(F.col("__marc")["fields"], F.array().cast(_FIELD_TYPE)),
            id_999,
            holdings,
        ).alias("fields"),
    )
    return with_marc.select(
        *(keep or []), "oai_id", "local_id", marc.alias("marc")
    )
