"""Preview: run the full transform pipeline on ONE record for inspection.

Behavioral spec (reference, NOT code): Solr/PreviewCreator.php +
Controller/CreatePreview.php — a single pasted record flows through the
exact production path (extract → field rules → mappings → hierarchical
facets → allfields → normalization) and the resulting field map is shown
to the user.

Spark-first: the production operators ARE the preview — they run on a
1-row DataFrame. Nothing is reimplemented; this module is composition.

Latency design: the reference's preview.php is an interactive endpoint,
so repeat calls must answer sub-second. Building the ~60-column MARC
expression tree costs ~10s of driver-side work per call (thousands of
py4j round trips) and Catalyst pays seconds more analyzing it — all of it
identical across calls; only the pasted record differs. So the built,
analyzed, optimized plan is CACHED per configuration, and the record
reaches it through a plan-stable side channel: the input DataFrame wraps
an RDD whose partition function reads a fixed scratch file at execution
time. Each preview overwrites the file and re-collects the same
DataFrame — zero plan work, one 1-row job. (The scratch file must be
visible to executors: trivially true on local[N]; use a shared scratch
dir if the preview service ever runs on a distributed master.)
"""

from __future__ import annotations

import os
import tempfile
import threading
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extractors import dc as DC
from ..extractors import linemarc as LM
from ..extractors import marc as MARC
from ..operators import normalize as NZ
from ..plans import mapping as MP

# (session id, config signature) -> (wide DataFrame, scratch file path)
_PLAN_CACHE: dict[tuple, tuple[DataFrame, str]] = {}
_CACHE_LOCK = threading.Lock()


def _input_df(spark: SparkSession, path: str) -> DataFrame:
    """1-row DataFrame whose content is read from ``path`` at EXECUTION
    time — a LogicalRDD, so the cached plan re-reads fresh bytes on every
    collect while the plan itself never changes."""

    def read_current(_it):
        with open(path, encoding="utf-8") as fh:
            yield (fh.read(),)

    rdd = spark.sparkContext.parallelize([0], 1).mapPartitions(read_current)
    return spark.createDataFrame(rdd, "raw string")


def _mapping_sig(m: "MP.Mapping") -> tuple:
    return (
        m.name,
        m.type,
        tuple((k, tuple(v)) for k, v in m.entries.items()),
        tuple(_mapping_sig(s) for s in m.sub_maps),
    )


def _build_wide(
    spark: SparkSession,
    path: str,
    fmt: str,
    field_rules: list[str] | None,
    mappings: dict[str, "MP.Mapping"] | None,
    hierarchical_facets: list[str] | None,
    institution: str | None,
    limits: dict[str, int] | None,
    non_indexed: list[str] | None,
    source_id: str | None,
    institution_field: str | None,
) -> DataFrame:
    df = _input_df(spark, path)
    if fmt in ("marc", "marcxml", "linemarc"):
        parse = {
            "marc": MARC.parse_marc_in_json,
            "marcxml": MARC.parse_marcxml,
            "linemarc": LM.parse_line_based_marc,
        }[fmt]
        # The Arrow identity pass is a PLAN BARRIER, not a perf cache:
        # without it CollapseProject inlines the parse expression into
        # each of the ~60 downstream columns and the optimizer walks a
        # 60x tree. (The old .cache() barrier would pin the FIRST
        # record's bytes forever now that the input re-reads a file.)
        parsed = df.select(parse("raw").alias("m"))
        parsed = parsed.mapInArrow(lambda batches: batches, parsed.schema)
        wide = MARC.to_solr_columns(parsed, "m", id_prefix=source_id)
        wide = wide.withColumn(
            "work_keys_str_mv", MARC.work_keys(F.col("m"))
        ).drop("m")
    elif fmt == "dc":
        wide = DC.to_solr_columns(df, "raw").drop("raw")
    else:
        raise ValueError(f"unknown preview format: {fmt!r}")

    if source_id:
        # previews stamp the epoch, like PreviewCreator's fake timestamps
        wide = wide.withColumn(
            "first_indexed", F.lit("1970-01-01T00:00:00Z")
        ).withColumn("last_indexed", F.lit("1970-01-01T00:00:00Z"))
    if institution_field:
        # the data source's institution setting becomes a scalar field
        # (SolrUpdater copies it onto every record); distinct from the
        # institution-in-building PREFIXING driven by `institution`
        wide = wide.withColumn("institution", F.lit(institution_field))
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
    return NZ.normalize_fields(
        wide, limits=limits, non_indexed=non_indexed, barrier=True
    )


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
    source_id: str | None = None,
    institution_field: str | None = None,
) -> dict[str, Any]:
    """One serialized record → its final field map (the preview payload).

    ``source_id`` mirrors CreatePreview's source argument: the id gains
    the '<source>.' prefix, an ``institution`` scalar rides along when
    given, work keys are computed, and the preview carries the epoch
    first/last_indexed timestamps (Controller/CreatePreview.php +
    PreviewCreator; golden-replayed in tests/test_golden_marc.py).

    The first call per configuration builds and caches the plan; repeat
    calls only overwrite the scratch file and re-collect (sub-second).
    """
    key = (
        id(spark),
        fmt,
        tuple(field_rules or ()),
        tuple(sorted((k, _mapping_sig(v)) for k, v in (mappings or {}).items())),
        tuple(hierarchical_facets or ()),
        institution,
        tuple(sorted((limits or {}).items())),
        tuple(non_indexed or ()),
        source_id,
        institution_field,
    )
    with _CACHE_LOCK:
        entry = _PLAN_CACHE.get(key)
        if entry is None:
            fd, path = tempfile.mkstemp(
                prefix="rm_preview_", suffix=".rec", text=True
            )
            os.close(fd)
            wide = _build_wide(
                spark, path, fmt, field_rules, mappings,
                hierarchical_facets, institution, limits, non_indexed,
                source_id, institution_field,
            )
            entry = _PLAN_CACHE[key] = (wide, path)
        wide, path = entry
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(raw)
        row = _collect_interpreted(spark, wide)
    return {k: v for k, v in row.asDict().items() if not _empty(v)}


def _empty(v) -> bool:
    """Fields absent from a preview: null/'' scalars, empty arrays, and
    arrays whose every element is empty (the reference's preview omits
    e.g. an author_role of [''])."""
    if v is None or v == "" or v == []:
        return True
    if isinstance(v, list):
        return all(x in (None, "") for x in v)
    return False


def _collect_interpreted(spark: SparkSession, wide: DataFrame):
    """Collect a 1-row frame with whole-stage codegen disabled.

    The full ~60-column MARC expression tree is hundreds of kilobytes of
    expression nodes; Janino compiling that into bytecode dominates a
    single-record run (it is pure fixed cost — there is one row to
    evaluate). Interpreted expression eval answers the same plan in a
    fraction of the time, so flip codegen off just for this collect and
    restore the session confs afterwards.
    """
    conf = spark.conf
    saved = {
        "spark.sql.codegen.wholeStage": conf.get(
            "spark.sql.codegen.wholeStage", "true"
        ),
        "spark.sql.codegen.factoryMode": conf.get(
            "spark.sql.codegen.factoryMode", "FALLBACK"
        ),
    }
    try:
        conf.set("spark.sql.codegen.wholeStage", "false")
        conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        return wide.collect()[0]
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def preview_df(wide: DataFrame) -> dict[str, Any]:
    """Preview an already-extracted 1-row DataFrame (pipeline tail only)."""
    row = wide.limit(1).collect()
    if not row:
        return {}
    return {k: v for k, v in row[0].asDict().items() if v not in (None, "", [])}
