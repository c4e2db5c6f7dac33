"""Forward (film record) extractor — agents classified by relator codes.

Behavioral spec (reference, NOT code): Record/Forward.php:50-230 —
- title from IdentifyingTitle; other TitleText values become title_alt
- agents (HasAgent: AgentName + Activity) classify into author /
  author2 by normalized relator code: primary d02/a00/a03/a06/a50/a99
  (directors etc.), secondary d01/e01/f01/f02 (actors, performers);
  role arrays ride along position-aligned with the names
- publishDate from YearOfReference; description joins description texts.

Pure xpath expressions with the relator classification as array
filter/transform over position-zipped (name, relator) structs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import keys as K
from .dc import well_formed_xml
from recordmanager_spark.sparkcompat import try_element_at

PRIMARY_RELATORS = ("d02", "a00", "a03", "a06", "a50", "a99")
SECONDARY_RELATORS = ("d01", "e01", "f01", "f02")


def _els(xml: Column, path: str) -> Column:
    steps = "/".join(f'*[local-name()="{p}"]' for p in path.split("/"))
    return F.xpath(xml, F.lit(f"//{steps}/text()"))


def _el(xml: Column, path: str) -> Column:
    return F.coalesce(try_element_at(_els(xml, path), 1), F.lit(""))


def _agents(xml: Column) -> Column:
    """array<struct<name, relator>> from HasAgent elements.

    AgentName and Activity extract as position-aligned lists; zip_with
    pairs them. Caveat: the pairing is positional over the flat xpath
    result, so a HasAgent missing one of the two children shifts later
    pairs (Forward exports carry both; agents with a null/empty name are
    dropped rather than emitted as None).
    """
    names = F.xpath(
        xml, F.lit('//*[local-name()="HasAgent"]/*[local-name()="AgentName"]/text()')
    )
    acts = F.xpath(
        xml, F.lit('//*[local-name()="HasAgent"]/*[local-name()="Activity"]/text()')
    )
    zipped = F.zip_with(
        names,
        acts,
        lambda n, a: F.struct(
            F.trim(n).alias("name"), K.normalize_relator(a).alias("relator")
        ),
    )
    return F.filter(
        zipped, lambda s: s["name"].isNotNull() & (s["name"] != "")
    )


def _by_relators(agents: Column, relators: tuple[str, ...], field: str) -> Column:
    lits = F.array(*[F.lit(r) for r in relators])
    return F.transform(
        F.filter(agents, lambda a: F.array_contains(lits, a["relator"])),
        lambda a: a[field],
    )


def to_solr_columns(df: DataFrame, xml_col: str = "xml", validate: bool = True) -> DataFrame:
    # zip_with rejects Python UDFs anywhere in its child expressions, so the
    # well-formedness gate materializes into its own column first (multi-
    # referenced aliases are not collapsed back into the consumers)
    gate_col = "__fw_xml"
    if validate:
        df = df.withColumn(
            gate_col, F.when(well_formed_xml(F.col(xml_col)), F.col(xml_col))
        )
    else:
        df = df.withColumn(gate_col, F.col(xml_col))
    x = F.col(gate_col)
    agents = _agents(x)
    title = F.trim(_el(x, "IdentifyingTitle"))
    all_titles = F.transform(_els(x, "Title/TitleText"), lambda v: F.trim(v))
    return df.withColumns(
        {
            "record_format": F.lit("forward"),
            "title": title,
            "title_short": title,
            "title_full": title,
            "title_sort": K.create_sort_title(title),
            "title_alt": F.filter(all_titles, lambda v: (v != title) & (v != "")),
            "publishDate": F.trim(_el(x, "YearOfReference")),
            "author": _by_relators(agents, PRIMARY_RELATORS, "name"),
            "author_role": _by_relators(agents, PRIMARY_RELATORS, "relator"),
            "author2": _by_relators(agents, SECONDARY_RELATORS, "name"),
            "author2_role": _by_relators(agents, SECONDARY_RELATORS, "relator"),
            "author_sort": F.coalesce(
                try_element_at(_by_relators(agents, PRIMARY_RELATORS, "name"), 1),
                F.lit(""),
            ),
            "description": F.array_join(
                F.transform(_els(x, "ContentDescription/DescriptionText"), lambda v: F.trim(v)),
                " ",
            ),
            "topic": F.filter(
                F.transform(_els(x, "SubjectTerms/Term"), lambda v: F.trim(v)),
                lambda v: v != "",
            ),
            "genre": F.filter(
                F.transform(_els(x, "Genre"), lambda v: F.trim(v)),
                lambda v: v != "",
            ),
            "ctrlnum": F.trim(_el(x, "Identifier/IDValue")),
        }
    ).drop("__fw_xml")
