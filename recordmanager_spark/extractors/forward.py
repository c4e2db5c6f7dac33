"""Forward (EN15907 film record) extractor — agents classified by relator.

Behavioral spec (reference, NOT code): Record/Forward.php:59-532 —
- ctrlnum/getID: the Identifier element's text, prefixed with its
  IDTypeName attribute and '_' when present
- title from IdentifyingTitle; every Title/TitleText different from it
  becomes title_alt (duplicates kept, as in the reference)
- agents (HasAgent: AgentName + Activity) classify by normalized
  relator: primary d02/a00/a03/a06/a50/a99 with DIRECTORS (d02) sorted
  first; secondary d01/e01/f01/f02; corporate = the empty relator list,
  which in the reference means NO filter — every agent
- description = Synopsis-type ContentDescriptions in the primary
  language (en), falling back to all languages, followed by
  'Content description'-type ones with the same fallback, joined ' '
- geographic from CountryOfReference/Country/RegionName; genres,
  publishers, urls and thumbnail are hardwired empty; format is the
  constant 'MotionPicture'
- allfields: every element text under the main element except the
  Identifier/RecordSource/TitleRelationship/Activity/AgentIdentifier/
  ProductionEventType/DescriptionType/Language subtrees, trailing
  punctuation stripped.

Replayed against the reference's forward1.xml golden fixture in
tests/test_golden_authority.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import keys as K
from .dc import well_formed_xml
from recordmanager_spark.sparkcompat import try_element_at

PRIMARY_RELATORS = ("d02", "a00", "a03", "a06", "a50", "a99")
SECONDARY_RELATORS = ("d01", "e01", "f01", "f02")

# getAllFields skips these subtrees (Forward.php:85-88)
_ALLFIELDS_IGNORED = (
    "Identifier", "RecordSource", "TitleRelationship", "Activity",
    "AgentIdentifier", "ProductionEventType", "DescriptionType", "Language",
)

_PRIMARY_LANGUAGE = "en"

# The main metadata element (getMainElement, Forward.php:281-287): the
# FIRST child of the exchange-set root — a Forward dump carries the film
# plus sibling related works/persons that must NOT contribute fields.
# The union also accepts a bare work as the document root (unit fixtures).
_MAIN = (
    '(/*[*[local-name()="IdentifyingTitle"]]'
    ' | /*/*[position()=1][*[local-name()="IdentifyingTitle"]])'
)


def _els(xml: Column, path: str) -> Column:
    steps = "/".join(f'*[local-name()="{p}"]' for p in path.split("/"))
    return F.xpath(xml, F.lit(f"{_MAIN}/{steps}/text()"))


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
        xml,
        F.lit(
            f'{_MAIN}/*[local-name()="HasAgent"]'
            '/*[local-name()="AgentName"]/text()'
        ),
    )
    acts = F.xpath(
        xml,
        F.lit(
            f'{_MAIN}/*[local-name()="HasAgent"]'
            '/*[local-name()="Activity"]/text()'
        ),
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


def _descriptions(xml: Column, desc_type: str) -> Column:
    """DescriptionTexts of the given type in the primary language,
    falling back to every language (Forward.php:177-184, 422-466)."""

    def of(lang_pred: str) -> Column:
        return F.xpath(
            xml,
            F.lit(
                f'{_MAIN}/*[local-name()="ContentDescription"]'
                f'[*[local-name()="DescriptionType"]="{desc_type}"]{lang_pred}'
                '/*[local-name()="DescriptionText"]/text()'
            ),
        )

    primary = of(f'[*[local-name()="Language"]="{_PRIMARY_LANGUAGE}"]')
    any_lang = of("")
    return F.when(F.size(primary) > 0, primary).otherwise(any_lang)


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
    # getPrimaryAuthorsSorted: directors first, then the other primary
    # relators, both in document order
    directors = F.filter(agents, lambda a: a["relator"] == "d02")
    other_primary = F.filter(
        agents,
        lambda a: F.array_contains(
            F.array(*[F.lit(r) for r in PRIMARY_RELATORS if r != "d02"]),
            a["relator"],
        ),
    )
    primary_sorted = F.concat(directors, other_primary)
    title = F.trim(_el(x, "IdentifyingTitle"))
    all_titles = F.transform(_els(x, "Title/TitleText"), lambda v: F.trim(v))
    id_text = F.trim(
        F.coalesce(
            try_element_at(
                F.xpath(
                    x, F.lit(f'{_MAIN}/*[local-name()="Identifier"][1]/text()')
                ), 1
            ),
            F.lit(""),
        )
    )
    id_type = F.coalesce(
        try_element_at(
            F.xpath(
                x,
                F.lit(f'{_MAIN}/*[local-name()="Identifier"][1]/@IDTypeName'),
            ), 1
        ),
        F.lit(""),
    )
    description = F.array_join(
        F.concat(
            _descriptions(x, "Synopsis"),
            _descriptions(x, "Content description"),
        ),
        " ",
    )
    topics = F.filter(
        F.transform(_els(x, "SubjectTerms/Term"), lambda v: F.trim(v)),
        lambda v: v != "",
    )
    geographic = F.filter(
        F.transform(
            _els(x, "CountryOfReference/Country/RegionName"),
            lambda v: F.trim(v),
        ),
        lambda v: v != "",
    )
    empty = F.array().cast("array<string>")
    return df.withColumns(
        {
            "record_format": F.lit("forward"),
            "title": title,
            "title_short": title,
            "title_full": title,
            "title_sort": K.create_sort_title(title),
            "title_alt": F.filter(all_titles, lambda v: (v != title) & (v != "")),
            "publishDate": F.trim(_el(x, "YearOfReference")),
            "author": F.transform(primary_sorted, lambda a: a["name"]),
            "author_role": F.transform(primary_sorted, lambda a: a["relator"]),
            "author2": _by_relators(agents, SECONDARY_RELATORS, "name"),
            "author2_role": _by_relators(agents, SECONDARY_RELATORS, "relator"),
            # corporateAuthorRelators defaults to [], and an empty relator
            # list means NO filter in getAuthorsByRelator — every agent
            "author_corporate": F.transform(agents, lambda a: a["name"]),
            "author_corporate_role": F.transform(agents, lambda a: a["relator"]),
            "author_sort": F.coalesce(
                try_element_at(
                    F.transform(primary_sorted, lambda a: a["name"]), 1
                ),
                F.lit(""),
            ),
            "description": description,
            "topic": topics,
            "topic_facet": topics,
            "geographic": geographic,
            "geographic_facet": geographic,
            "genre": empty,
            "genre_facet": empty,
            "format": F.lit("MotionPicture"),
            "publisher": empty,
            "url": empty,
            "thumbnail": F.lit(""),
            "ctrlnum": F.when(
                id_type != "", F.concat(id_type, F.lit("_"), id_text)
            ).otherwise(id_text),
            # leaf text under the record outside ignored subtrees, trailing
            # punctuation stripped (getAllFields, Forward.php:295-315)
            "allfields": F.filter(
                F.transform(
                    F.xpath(
                        x,
                        F.lit(
                            f"{_MAIN}//*[not(*)][not(ancestor-or-self::*["
                            + " or ".join(
                                f'local-name()="{t}"'
                                for t in _ALLFIELDS_IGNORED
                            )
                            + "])]/text()"
                        ),
                    ),
                    lambda v: K.strip_trailing_punctuation(F.trim(v)),
                ),
                lambda v: v != "",
            ),
        }
    ).drop("__fw_xml")
