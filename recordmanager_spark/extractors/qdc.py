"""Qualified Dublin Core extractor — DC plus typed titles/identifiers.

Behavioral spec (reference, NOT code): Record/Qdc.php:155-210 —
- the first ``title`` element WITHOUT type="alternative" is the main
  title (split on ' : ' like DC); every other title lands in title_alt
- identifiers typed ``issn`` feed the issn field; ISBN digits are
  recognized in any identifier
- contents/description from description elements (primary = first).

Shares the DC building blocks (xpath local-name access, the XML gate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import keys as K
from .dc import _el, _els, dc_languages, well_formed_xml
from recordmanager_spark.sparkcompat import try_element_at


def _typed(xml: Column, name: str, type_test: str) -> Column:
    return F.xpath(
        xml, F.lit(f'//*[local-name()="{name}" and {type_test}]/text()')
    )


def to_solr_columns(df: DataFrame, xml_col: str = "xml", validate: bool = True) -> DataFrame:
    x = F.col(xml_col)
    if validate:
        x = F.when(well_formed_xml(x), F.col(xml_col))
    main_titles = _typed(x, "title", 'not(@type="alternative")')
    title = K.strip_trailing_punctuation(
        F.trim(F.coalesce(try_element_at(main_titles, 1), F.lit("")))
    )
    alt = F.concat(
        F.transform(F.slice(main_titles, 2, 1000), lambda v: F.trim(v)),
        F.transform(_typed(x, "title", '@type="alternative"'), lambda v: F.trim(v)),
    )
    identifiers = F.transform(_els(x, "identifier"), lambda v: F.trim(v))
    isbn_digits = F.transform(identifiers, lambda v: K.normalize_isbn(v))
    descriptions = F.transform(_els(x, "description"), lambda v: F.trim(v))
    return df.withColumns(
        {
            "id": F.trim(_el(x, "recordID")),
            "record_format": F.lit("qdc"),
            "ctrlnum": F.trim(_el(x, "recordID")),
            "language": dc_languages(x),
            "format": F.trim(_el(x, "type")),
            "author": F.filter(
                F.transform(_els(x, "creator"), lambda v: K.strip_trailing_punctuation(F.trim(v))),
                lambda v: v != "",
            ),
            "author2": F.filter(
                F.transform(_els(x, "contributor"), lambda v: K.strip_trailing_punctuation(F.trim(v))),
                lambda v: v != "",
            ),
            "title": title,
            "title_full": title,
            "title_short": try_element_at(F.split(title, " : ", 2), 1),
            "title_sub": F.coalesce(
                try_element_at(F.split(title, " : ", 2), 2), F.lit("")
            ),
            "title_alt": F.filter(alt, lambda v: v != ""),
            "title_sort": K.create_sort_title(title),
            "publisher": F.array(F.trim(_el(x, "publisher"))),
            "publishDate": F.regexp_extract(_el(x, "date"), "(\\d{4})", 1),
            "isbn": F.array_distinct(
                F.filter(isbn_digits, lambda v: v.isNotNull() & (v != ""))
            ),
            "issn": F.filter(
                F.transform(
                    _typed(x, "identifier", '@type="issn"'), lambda v: F.trim(v)
                ),
                lambda v: v != "",
            ),
            "topic": F.filter(
                F.transform(_els(x, "subject"), lambda v: F.trim(v)), lambda v: v != ""
            ),
            "url": F.filter(identifiers, lambda v: v.rlike("^https?")),
            "contents": F.filter(descriptions, lambda v: v != ""),
            "description": F.coalesce(try_element_at(descriptions, 1), F.lit("")),
        }
    )
