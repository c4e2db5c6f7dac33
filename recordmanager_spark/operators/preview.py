"""Preview: run the full transform pipeline on ONE record for inspection.

Behavioral spec (reference, NOT code): Solr/PreviewCreator.php +
Controller/CreatePreview.php — a single pasted record flows through the
exact production path (extract → field rules → mappings → hierarchical
facets → allfields → normalization) and the resulting field map is shown
to the user.

Spark-first: the production operators ARE the preview — they run on a
1-row DataFrame. Nothing is reimplemented; this module is composition.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extractors import dc as DC
from ..extractors import linemarc as LM
from ..extractors import marc as MARC
from ..operators import normalize as NZ
from ..plans import mapping as MP


def preview_record(
    spark: SparkSession,
    raw: str,
    fmt: str = "marc",
    field_rules: list[str] | None = None,
    mappings: dict[str, "MP.Mapping"] | None = None,
    hierarchical_facets: list[str] | None = None,
    institution: str | None = None,
    limits: dict[str, int] | None = None,
    non_indexed: list[str] | None = None,
) -> dict[str, Any]:
    """One serialized record → its final field map (the preview payload)."""
    df = spark.createDataFrame([(raw,)], "raw string")
    if fmt in ("marc", "linemarc"):
        parse = (
            MARC.parse_marc_in_json if fmt == "marc" else LM.parse_line_based_marc
        )
        parsed = df.select(parse("raw").alias("m"))
        post_steps = any(
            (field_rules, mappings, hierarchical_facets, institution)
        )
        if not post_steps:
            # Optimizer + codegen cost over the full ~60-column expression
            # tree is superlinear in tree size and dominates a 1-row run
            # (minutes for one record). Without cross-column post steps the
            # field map can be collected in COLUMN CHUNKS — each chunk's
            # plan is small, and the parse is shared.
            parsed = parsed.cache()
            names = list(MARC._solr_col_builders(F.col("m"), None, {}))
            out: dict[str, Any] = {}
            for i in range(0, len(names), 8):
                chunk = names[i : i + 8]
                part = MARC.to_solr_columns(parsed, "m", only=chunk).drop("m")
                part = NZ.normalize_fields(
                    part, limits=limits, non_indexed=non_indexed, barrier=True
                )
                out.update(part.collect()[0].asDict())
            parsed.unpersist()
            return {k: v for k, v in out.items() if v not in (None, "", [])}
        wide = MARC.to_solr_columns(parsed, "m").drop("m")
    elif fmt == "dc":
        wide = DC.to_solr_columns(df, "raw").drop("raw")
    else:
        raise ValueError(f"unknown preview format: {fmt!r}")

    if field_rules:
        wide = MP.apply_field_rules(wide, field_rules)
    for field, mapping in (mappings or {}).items():
        if field in wide.columns:
            wide = wide.withColumn(
                field, MP.map_array_column(F.col(field), mapping)
            )
    if institution:
        wide = NZ.add_institution_to_building(wide, institution)
    for facet in hierarchical_facets or []:
        if facet in wide.columns:
            wide = wide.withColumn(facet, NZ.hierarchical_facet(F.col(facet)))
    # barrier: the wide frame is raw extractor expressions here
    wide = NZ.normalize_fields(
        wide, limits=limits, non_indexed=non_indexed, barrier=True
    )
    row = wide.collect()[0]
    return {k: v for k, v in row.asDict().items() if v not in (None, "", [])}


def preview_df(wide: DataFrame) -> dict[str, Any]:
    """Preview an already-extracted 1-row DataFrame (pipeline tail only)."""
    row = wide.limit(1).collect()
    if not row:
        return {}
    return {k: v for k, v in row[0].asDict().items() if v not in (None, "", [])}
