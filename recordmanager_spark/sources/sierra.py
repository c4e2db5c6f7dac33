"""Sierra REST API harvester — offline page processing.

Behavioral spec (reference, NOT code): Harvest/SierraApi.php —
- pages of ``{"entries": [...], "total": N}`` JSON from the bibs
  endpoint (offset/limit paging, SierraApi.php:204-260; OAuth +
  paging stay driver-side network code, out of engine scope)
- record → MARC conversion (SierraApi.php:537-614): 001 from the bib
  id; leader from the ``fieldTag == '_'`` varField (default
  ``00000nam  2200000   4500``); varFields keep only entries with a
  marcTag (852 dropped unless keepExisting852Fields), tags zero-padded
  to 3 chars; subfield lists become MARC subfields; fields WITHOUT
  subfields become control fields; an 852$b is emitted per location
  code and 977$a from fixedField 30; fields sort by tag
- deletion: ``deleted`` flag OR fixedField 31 (BCODE3) in the
  configured suppression list (SierraApi.php:637-652)
- oai id = ``sierra:<source>:<id>`` (SierraApi.php:525-528).

Spark-first: the page parses with ``from_json`` and the MARC struct is
assembled with array expressions straight into the SAME
``struct<leader, fields>`` layout the MARC extractor consumes — no
MARC-in-JSON intermediate, no Python UDF, fully codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from recordmanager_spark.sparkcompat import try_element_at

SIERRA_PAGE_SCHEMA = (
    "entries array<struct<"
    "id string, deleted boolean, catalogDate string, "
    "locations array<struct<code string, name string>>, "
    "fixedFields map<string, struct<label string, value string>>, "
    "varFields array<struct<fieldTag string, marcTag string, ind1 string, "
    "ind2 string, content string, "
    "subfields array<struct<tag string, content string>>>>"
    ">>, total bigint"
)

_DEFAULT_LEADER = "00000nam  2200000   4500"

_EMPTY_SUBS = "array<struct<code:string,value:string>>"


def _field(tag, ind1, ind2, value, subfields) -> Column:
    return F.struct(
        tag.alias("tag"),
        ind1.alias("ind1"),
        ind2.alias("ind2"),
        value.alias("value"),
        subfields.alias("subfields"),
    )


def _marc_struct(entry: Column, keep_852: bool) -> Column:
    """Build the parsed-MARC struct for one Sierra bib entry."""
    var_fields = F.coalesce(entry["varFields"], F.array())
    raw_leader = try_element_at(
        F.filter(var_fields, lambda v: v["fieldTag"] == "_"), 1
    )["content"]
    # empty() check in the reference: '' also falls back to the default
    leader = F.when(
        F.coalesce(raw_leader, F.lit("")) != "", raw_leader
    ).otherwise(F.lit(_DEFAULT_LEADER))
    marc_vars = F.filter(
        var_fields,
        lambda v: (v["fieldTag"] != "_")
        & v["marcTag"].isNotNull()
        & (F.lit(True) if keep_852 else F.trim(v["marcTag"]) != "852"),
    )
    tag_of = lambda v: F.substring(  # noqa: E731
        F.concat(F.lit("000"), F.trim(v["marcTag"])), -3, 3
    )
    # data fields: subfields present AND numeric tag >= 010; control fields:
    # no subfields (PHP drops subfielded entries with control-range tags)
    converted = F.filter(
        F.transform(
            marc_vars,
            lambda v: F.when(
                v["subfields"].isNotNull() & (tag_of(v).cast("int") >= 10),
                _field(
                    tag_of(v),
                    F.coalesce(v["ind1"], F.lit(" ")),
                    F.coalesce(v["ind2"], F.lit(" ")),
                    F.lit(None).cast("string"),
                    F.transform(
                        v["subfields"],
                        lambda s: F.struct(
                            s["tag"].alias("code"), s["content"].alias("value")
                        ),
                    ),
                ),
            ).otherwise(
                F.when(
                    v["subfields"].isNull(),
                    _field(
                        tag_of(v),
                        F.lit(None).cast("string"),
                        F.lit(None).cast("string"),
                        v["content"],
                        F.lit(None).cast(_EMPTY_SUBS),
                    ),
                )
            ),
        ),
        lambda f: f.isNotNull(),
    )
    loc_852 = F.transform(
        F.coalesce(entry["locations"], F.array()),
        lambda loc: _field(
            F.lit("852"),
            F.lit(" "),
            F.lit(" "),
            F.lit(None).cast("string"),
            F.array(F.struct(F.lit("b").alias("code"), loc["code"].alias("value"))),
        ),
    )
    mat_type = F.trim(entry["fixedFields"]["30"]["value"])
    f977 = F.when(
        mat_type.isNotNull(),
        F.array(
            _field(
                F.lit("977"),
                F.lit(" "),
                F.lit(" "),
                F.lit(None).cast("string"),
                F.array(F.struct(F.lit("a").alias("code"), mat_type.alias("value"))),
            )
        ),
    ).otherwise(F.array().cast(f"array<struct<tag:string,ind1:string,ind2:string,value:string,subfields:{_EMPTY_SUBS}>>"))
    f001 = F.array(
        _field(
            F.lit("001"),
            F.lit(None).cast("string"),
            F.lit(None).cast("string"),
            entry["id"],
            F.lit(None).cast(_EMPTY_SUBS),
        )
    )
    unsorted = F.concat(f001, converted, loc_852, f977)
    # stable sort by tag: pair each field with its position, compare
    # (tag, position) — PHP 8 uasort is stable
    indexed = F.transform(
        unsorted, lambda f, i: F.struct(f.alias("f"), i.alias("i"))
    )
    ordered = F.array_sort(
        indexed,
        lambda a, b: F.when(a["f"]["tag"] < b["f"]["tag"], -1)
        .when(a["f"]["tag"] > b["f"]["tag"], 1)
        .otherwise(a["i"] - b["i"]),
    )
    fields = F.transform(ordered, lambda p: p["f"])
    return F.struct(leader.alias("leader"), fields.alias("fields"))


def harvest_pages(
    pages: DataFrame,
    json_col: str = "json",
    source: str = "sierra",
    keep: list[str] | None = None,
    suppressed_bib_code3: list[str] | None = None,
    keep_852: bool = False,
) -> DataFrame:
    """Sierra JSON pages → one row per bib with the parsed-MARC struct.

    Columns: oai_id, local_id, deleted, catalog_date, marc (null for
    deleted records, like the reference's callback contract).
    """
    parsed = pages.select(
        *(keep or []),
        F.explode(
            F.coalesce(
                F.from_json(F.col(json_col), SIERRA_PAGE_SCHEMA)["entries"],
                F.array(),
            )
        ).alias("__e"),
    )
    e = F.col("__e")
    suppressed = F.lit(False)
    if suppressed_bib_code3:
        suppressed = F.coalesce(
            e["fixedFields"]["31"]["value"].isin(*suppressed_bib_code3),
            F.lit(False),
        )
    deleted = F.coalesce(e["deleted"], F.lit(False)) | suppressed
    return parsed.select(
        *(keep or []),
        F.concat(F.lit(f"sierra:{source}:"), e["id"]).alias("oai_id"),
        e["id"].alias("local_id"),
        deleted.alias("deleted"),
        e["catalogDate"].alias("catalog_date"),
        F.when(~deleted, _marc_struct(e, keep_852)).alias("marc"),
    )
