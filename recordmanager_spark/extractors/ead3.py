"""EAD3 (archival finding aid, v3) extractor — component XML → wide columns.

Behavioral spec (reference, NOT code): Record/Ead3.php:125-589 —
- EAD3 wraps displayed values in <part>: authors from controlaccess
  name/persname parts + did/origination name/persname parts; corporate
  from controlaccess/origination corpname parts (Ead3.php:337-382)
- topics/geographic from controlaccess subject/geogname first <part>;
  @identifier values become enrichment topic ids (Ead3.php:385-430)
- format: controlaccess/genreform/part, else the component @level
  (Ead3.php:181-188)
- institution from did/repository/corpname/part (Ead3.php:432-439)
- language from did/langmaterial/language/@langcode only (Ead3.php:444-459)
- physical from did/physdesc/extent, '-' placeholders dropped
- thumbnail: first dao with @localtype='thumbnail' href under did or
  did/daoset (Ead3.php:478-496)
- title: title_sub = unitid (suppressed for fonds/collection formats,
  inherited from Ead.php:403-414); the default prependTitleWithSubtitle
  makes title = 'unitid unittitle' when they differ; sort title is the
  lowercase punctuation-stripped title
- series = parent title when a non-archive parent exists and the format
  is not fonds/collection/series/subseries/undefined (Ead.php:421-450)
- hierarchy fields (top/parent id+title, sequence, title_in_hierarchy)
  come from the EAD3 splitter's columns (Ead3.php:518-567); the
  reference injects them as <add-data> XML, we carry columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import keys as K
from .dc import well_formed_xml
from .ead import _attr, _el, _els
from recordmanager_spark.sparkcompat import try_element_at

_NO_SUBTITLE_FORMATS = ("fonds", "collection")
_NON_SERIES_FORMATS = ("fonds", "collection", "series", "subseries", "")


def _parts(xml: Column, *names: str) -> Column:
    """Trimmed text of .../<names>/part elements."""
    steps = "".join(f'/*[local-name()="{n}"]' for n in names)
    return F.filter(
        F.transform(
            F.xpath(xml, F.lit(f'//{steps[1:]}/*[local-name()="part"]/text()')),
            lambda v: F.trim(v),
        ),
        lambda v: v != "",
    )


def to_solr_columns(
    df: DataFrame,
    xml_col: str = "part_xml",
    archive_id_col: str | None = "archive_id",
    archive_title_col: str | None = "archive_title",
    sequence_col: str | None = "sequence",
    parent_id_col: str | None = "parent_id",
    parent_title_col: str | None = "parent_title",
    validate: bool = True,
) -> DataFrame:
    x = F.col(xml_col)
    if validate:
        x = F.when(well_formed_xml(x), F.col(xml_col))
    fmt = F.coalesce(
        F.when(
            F.trim(_el(x, "controlaccess/genreform/part")) != "",
            F.trim(_el(x, "controlaccess/genreform/part")),
        ),
        _attr(x, "/*/@level"),
    )
    title_short = F.trim(_el(x, "did/unittitle"))
    unit_id = F.trim(_el(x, "did/unitid"))
    title_sub = F.when(
        fmt.isin(*_NO_SUBTITLE_FORMATS), F.lit("")
    ).otherwise(unit_id)
    title = F.when(
        (title_sub != "") & (title_sub != title_short),
        F.concat(title_sub, F.lit(" "), title_short),
    ).otherwise(title_short)
    authors = F.concat(
        _parts(x, "controlaccess", "name"),
        _parts(x, "controlaccess", "persname"),
        _parts(x, "did", "origination", "name"),
        _parts(x, "did", "origination", "persname"),
    )
    cols: dict[str, Column] = {
        "record_format": F.lit("ead3"),
        "ctrlnum": _attr(x, "/*/@id"),
        "level": _attr(x, "/*/@level"),
        "description": F.when(
            F.size(_els(x, "scopecontent/p")) > 0,
            F.array_join(
                F.transform(_els(x, "scopecontent/p"), lambda v: F.trim(v)), "   /   "
            ),
        ).otherwise(F.trim(_el(x, "scopecontent"))),
        "author": authors,
        "author_sort": F.coalesce(try_element_at(authors, 1), F.lit("")),
        "author_corporate": F.concat(
            _parts(x, "controlaccess", "corpname"),
            _parts(x, "did", "origination", "corpname"),
        ),
        "topic": _parts(x, "controlaccess", "subject"),
        "topic_ids": F.xpath(
            x,
            F.lit(
                '//*[local-name()="controlaccess"]/*[local-name()="subject"]/@identifier'
            ),
        ),
        "geographic": _parts(x, "controlaccess", "geogname"),
        "format": fmt,
        "institution": F.trim(_el(x, "did/repository/corpname/part")),
        "title_short": title_short,
        "title_sub": title_sub,
        "title": title,
        "title_full": title,
        "title_sort": F.lower(K.strip_punctuation(title)),
        "language": F.filter(
            F.transform(
                F.xpath(
                    x,
                    F.lit(
                        '//*[local-name()="langmaterial"]/*[local-name()="language"]/@langcode'
                    ),
                ),
                lambda v: F.trim(v),
            ),
            lambda v: v != "",
        ),
        "physical": F.filter(
            F.transform(_els(x, "did/physdesc/extent"), lambda v: F.trim(v)),
            lambda v: (v != "-") & (v != ""),
        ),
        "thumbnail": F.coalesce(
            try_element_at(
                F.xpath(
                    x,
                    F.lit(
                        '//*[local-name()="did"]//*[local-name()="dao"]'
                        '[@localtype="thumbnail"]/@href'
                    ),
                ),
                1,
            ),
            F.lit(""),
        ),
        "allfields": F.filter(
            F.transform(F.xpath(x, F.lit("//*[not(*)]/text()")), lambda v: F.trim(v)),
            lambda v: v != "",
        ),
        "hierarchytype": F.lit("Default"),
    }
    out = df.withColumns(cols)

    has_parent = (
        F.coalesce(F.col(parent_id_col), F.lit("")) != ""
        if parent_id_col and parent_id_col in df.columns
        else F.lit(False)
    )
    if parent_id_col and parent_id_col in df.columns:
        out = out.withColumns(
            {
                "hierarchy_parent_id": F.when(has_parent, F.col(parent_id_col)),
                "hierarchy_parent_title": F.when(
                    has_parent, F.col(parent_title_col or parent_id_col)
                ),
                # series: parent title unless parent is the archive itself
                # or the format suppresses series
                "series": F.when(
                    has_parent
                    & ~fmt.isin(*_NON_SERIES_FORMATS)
                    & (
                        F.col(parent_id_col)
                        != F.coalesce(
                            F.col(archive_id_col)
                            if archive_id_col and archive_id_col in df.columns
                            else F.lit(None),
                            F.lit(""),
                        )
                    ),
                    F.col(parent_title_col or parent_id_col),
                ).otherwise(F.lit("")),
            }
        )
    if archive_id_col and archive_id_col in df.columns:
        out = out.withColumn("hierarchy_top_id", F.col(archive_id_col))
    if archive_title_col and archive_title_col in df.columns:
        out = out.withColumn("hierarchy_top_title", F.col(archive_title_col))
    if sequence_col and sequence_col in df.columns:
        out = out.withColumn("hierarchy_sequence", F.col(sequence_col))
        out = out.withColumn(
            "title_in_hierarchy",
            F.when(unit_id != "", F.trim(F.concat(unit_id, F.lit(" "), title))).otherwise(
                title
            ),
        )
    return out
