"""Record splitters: one harvested XML document → N component records.

Behavioral spec (reference, NOT code):
- Splitter/File.php:106-152 — generic ``recordXPath`` / ``oaiIDXPath``
  extraction of repeated record elements from one file.
- Splitter/Ead.php:150-244 — EAD finding aids split on
  ``archdesc | archdesc/dsc//*[@level]``; every component inherits ancestor
  ``did`` blocks (minus configured non-inherited fields), gets the archive
  id/title and a zero-padded sequence number, and derives its identifier
  from its unitid (prefixed with the archive id when different).

Spark-first: splitting is a per-document flatMap — an Arrow-batched pandas
UDF parses the XML once and emits an ``array<struct<...>>`` which callers
``explode`` into component rows. The parse is embarrassingly parallel (one
document at a time, no shuffle); downstream extraction operates on the
emitted XML strings with the normal extractor expressions.
"""

from __future__ import annotations

import urllib.parse
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _findall_local(root: ET.Element, name: str) -> list[ET.Element]:
    return [e for e in root.iter() if _strip_ns(e.tag) == name]


SPLIT_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("part_xml", T.StringType()),
            T.StructField("part_id", T.StringType()),
            T.StructField("sequence", T.IntegerType()),
        ]
    )
)


def make_xpath_splitter(record_tag: str, id_tag: str | None = None):
    """File-splitter equivalent: extract repeated ``record_tag`` elements.

    (The reference's recordXPath is a full XPath; local-name matching covers
    the overwhelmingly common ``//record``-style configurations and stays
    namespace-agnostic.)
    """

    @pandas_udf(SPLIT_SCHEMA)
    def split(xml: pd.Series) -> pd.Series:
        def one(doc):
            if not doc:
                return []
            try:
                root = ET.fromstring(doc)
            except ET.ParseError:
                return []
            out = []
            for i, el in enumerate(_findall_local(root, record_tag), start=1):
                pid = None
                if id_tag:
                    ids = _findall_local(el, id_tag)
                    pid = (ids[0].text or "").strip() if ids else None
                out.append(
                    (ET.tostring(el, encoding="unicode"), pid or str(i), i)
                )
            return out

        return xml.map(one)

    return split


EAD_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("part_xml", T.StringType()),
            T.StructField("part_id", T.StringType()),
            T.StructField("archive_id", T.StringType()),
            T.StructField("archive_title", T.StringType()),
            T.StructField("sequence", T.StringType()),
            T.StructField("level", T.StringType()),
            T.StructField("inherited_titles", T.ArrayType(T.StringType())),
        ]
    )
)

# did children that components do NOT inherit (Splitter/Ead.php default)
NON_INHERITED = {"unitid", "unittitle", "unitdate", "unitdatestructured"}


def _ead_components(doc: str | None):
    """One EAD document → component tuples per Splitter/Ead.php:150-244."""
    if not doc:
        return []
    try:
        root = ET.fromstring(doc)
    except ET.ParseError:
        return []

    # eadheader/eadid: agency + archive id/title
    archive_id = ""
    archive_title = ""
    for eadid in _findall_local(root, "eadid"):
        archive_id = urllib.parse.quote(
            eadid.get("identifier") or (eadid.text or "").strip()
        )
        break
    for tp in _findall_local(root, "titleproper"):
        archive_title = (tp.text or "").strip()
        break

    # components: archdesc + every descendant with a @level, in doc order,
    # tracking ancestor did unittitles for inheritance
    comps = []
    archdescs = _findall_local(root, "archdesc")
    if not archdescs:
        return []
    arch = archdescs[0]

    def walk(el, ancestors_titles):
        is_component = el is arch or el.get("level") is not None
        my_titles = ancestors_titles
        if is_component:
            comps.append((el, list(ancestors_titles)))
            own = [
                (t.text or "").strip()
                for did in el
                if _strip_ns(did.tag) == "did"
                for t in did
                if _strip_ns(t.tag) == "unittitle"
            ]
            my_titles = ancestors_titles + own
        for child in el:
            walk(child, my_titles)

    walk(arch, [])

    out = []
    for seq, (el, inherited) in enumerate(comps, start=1):
        unit_id = None
        for did in el:
            if _strip_ns(did.tag) != "did":
                continue
            for uid in did:
                if _strip_ns(uid.tag) == "unitid":
                    unit_id = urllib.parse.quote(
                        uid.get("identifier") or (uid.text or "").strip()
                    )
                    break
            break
        if unit_id:
            if unit_id != archive_id:
                unit_id = f"{archive_id}_{unit_id}"
        else:
            unit_id = f"{archive_id}_{seq}"
        out.append(
            (
                ET.tostring(el, encoding="unicode"),
                unit_id,
                archive_id,
                archive_title,
                str(seq).zfill(7),
                _strip_ns(el.tag) if el.get("level") is None else el.get("level"),
                inherited,
            )
        )
    return out


@pandas_udf(EAD_SCHEMA)
def split_ead(xml: pd.Series) -> pd.Series:
    return xml.map(_ead_components)


def explode_parts(df: DataFrame, parts_col: Column, keep: list[str]) -> DataFrame:
    """Explode a split result into one row per component part."""
    exploded = df.select(*keep, F.explode(parts_col).alias("__part"))
    part_fields = exploded.schema["__part"].dataType.names
    return exploded.select(*keep, *[F.col(f"__part.{f}").alias(f) for f in part_fields])
