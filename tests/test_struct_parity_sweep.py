"""Presence/absence lattice parity sweeps: struct engine == xpath engine.

The round-3 LRMI bug (``language`` emptied whenever ``<material>`` was
absent, via F.concat null-propagation) was a present/absent element
combination no fixture covered. These sweeps close that class: for each
dual-engine driver, enumerate the FULL subset lattice of its optional
elements (2^n combinations), build ONE DataFrame with one row per
combination plus a malformed row, and assert the struct and xpath
engines produce identical rows for every combination.

Fixtures keep multi-valued elements at the root level (the reference's
own record shape): the struct engines read DIRECT children like the
reference's SimpleXML chains, while the xpath engines' ``//`` search
would also match nested occurrences — an intended faithfulness
improvement, not a parity target (see extractors/ead3.py docstring).
"""

from __future__ import annotations



def _lattice(wrapper: str, elements: dict[str, str]) -> list[str]:
    """Every subset of ``elements`` spliced into ``wrapper`` ({body})."""
    names = list(elements)
    assert len(names) <= 8, "keep the sweep bounded"
    combos = []
    for mask in range(2 ** len(names)):
        body = "".join(
            elements[names[i]] for i in range(len(names)) if mask >> i & 1
        )
        combos.append(wrapper.format(body=body))
    combos.append("<broken")
    return combos


def _assert_engines_agree(spark, mod, xmls, xml_col="xml", exclude=(), **kwargs):
    if xmls and isinstance(xmls[0], tuple):
        rows = [(i, *x) for i, x in enumerate(xmls)]
        schema = f"__i int, {xml_col} string, oai_id string"
    else:
        rows = [(i, x) for i, x in enumerate(xmls)]
        schema = f"__i int, {xml_col} string"
    df = spark.createDataFrame(rows, schema).coalesce(4)
    cols = sorted(
        c
        for c in mod.to_solr_columns(df, xml_col, **kwargs).columns
        if c not in ("__i", xml_col) and c not in exclude
    )
    a = (
        mod.to_solr_columns(df, xml_col, engine="struct", **kwargs)
        .select("__i", *cols).orderBy("__i").collect()
    )
    b = (
        mod.to_solr_columns(df, xml_col, engine="xpath", **kwargs)
        .select("__i", *cols).orderBy("__i").collect()
    )
    assert len(a) == len(b) == len(xmls)
    for ra, rb in zip(a, b):
        for c in cols:
            assert ra[c] == rb[c], (mod.__name__, ra["__i"], c, ra[c], rb[c])


_DC_ELEMENTS = {
    "title": "<title>Main : sub</title><title type=\"alternative\">Alt</title>",
    "identifier": (
        '<identifier type="issn">1234-5679</identifier>'
        "<identifier>urn:isbn:978-0-12-345678-6</identifier>"
        "<identifier>https://x.example/r1</identifier>"
    ),
    "description": (
        '<description lang="en">Primary one.</description>'
        "<description>Secondary two.</description>"
    ),
    "type": '<type type="material">Book</type>',
    "creator": "<creator>Author, A.</creator>",
    "contributor": "<contributor>Helper, H.</contributor>",
    "language": "<language>en fi</language>",
    "date": "<date>1999-05</date>",
}


def test_sweep_qdc(spark):
    from recordmanager_spark.extractors import qdc

    _assert_engines_agree(
        spark, qdc, _lattice("<dc><recordID>r</recordID>{body}</dc>", _DC_ELEMENTS)
    )


def test_sweep_ese(spark):
    from recordmanager_spark.extractors import ese

    _assert_engines_agree(
        spark, ese, _lattice("<dc><recordID>r</recordID>{body}</dc>", _DC_ELEMENTS)
    )


def test_sweep_dc(spark):
    from recordmanager_spark.extractors import dc

    # allfields: the DC struct engine concatenates parsed fields in
    # schema order, not document order — the same documented divergence
    # test_dc_engines_agree excludes.
    _assert_engines_agree(
        spark,
        dc,
        _lattice("<dc><recordID>r</recordID>{body}</dc>", _DC_ELEMENTS),
        exclude=("allfields",),
    )


def test_sweep_lrmi(spark):
    from recordmanager_spark.extractors import lrmi

    elements = {
        "title": "<title>Fractions : one</title>",
        "material": (
            "<material><inLanguage>FI</inLanguage>"
            "<url>https://material.example/1</url></material>"
        ),
        "inLanguage": "<inLanguage>sv</inLanguage>",
        "author": (
            "<author><person><name>Person, P.</name></person>"
            "<organization><legalName>Org Oy</legalName></organization></author>"
        ),
        "about": (
            "<about><thing><name>topic A</name>"
            "<identifier>https://ont/a</identifier></thing></about>"
            "<about><thing><identifier>https://no-name/skip</identifier></thing></about>"
        ),
        "identifier": "<identifier>urn:isbn:978-0-12-345678-6</identifier>",
        "description": "<description>Plain words.</description>",
        "language": "<language>en fi</language>",
    }
    _assert_engines_agree(
        spark, lrmi, _lattice("<lrmi><recordID>r</recordID>{body}</lrmi>", elements)
    )


def test_sweep_doaj(spark):
    from recordmanager_spark.extractors import doaj

    elements = {
        "title": "<title>Open access : survey /</title>",
        "authors": (
            "<authors><author><name>First, F.</name></author>"
            "<author><name>Second, S.</name></author></authors>"
        ),
        "keywords": (
            "<keywords><keyword>kw1</keyword><keyword>kw2</keyword></keywords>"
        ),
        "language": "<language>engfinswe</language>",
        "publisher": "<publisher>OA Press.</publisher>",
        "publicationDate": "<publicationDate>2012-05-01</publicationDate>",
        "fullTextUrl": "<fullTextUrl>https://doaj.example/a/1</fullTextUrl>",
        "issn": "<issn>1234-5679</issn>",
    }
    _assert_engines_agree(
        spark,
        doaj,
        [
            (x, "oai:doaj.example:art-42")
            for x in _lattice("<record>{body}</record>", elements)
        ],
        oai_id_col="oai_id",
    )


def test_sweep_forward(spark):
    from recordmanager_spark.extractors import forward

    elements = {
        "identifier": '<Identifier IDTypeName="fw">1</Identifier>',
        "identifying_title": "<IdentifyingTitle>The Great Film</IdentifyingTitle>",
        "titles": (
            "<Title><TitleText>The Great Film</TitleText></Title>"
            "<Title><TitleText>Le Grand Film</TitleText></Title>"
        ),
        "year": "<YearOfReference>1972</YearOfReference>",
        "director": (
            "<HasAgent><AgentName>Director, Dana</AgentName>"
            "<Activity>D02</Activity></HasAgent>"
        ),
        "other_agents": (
            "<HasAgent><AgentName>Actor, Amy</AgentName>"
            "<Activity>E01</Activity></HasAgent>"
            "<HasAgent><AgentName>Grip, Gary</AgentName>"
            "<Activity>x99</Activity></HasAgent>"
        ),
        "description": (
            "<ContentDescription><DescriptionType>Synopsis</DescriptionType>"
            "<Language>en</Language>"
            "<DescriptionText>A film about things.</DescriptionText>"
            "</ContentDescription>"
        ),
        "subjects": "<SubjectTerms><Term>drama</Term></SubjectTerms>",
    }
    _assert_engines_agree(
        spark, forward, _lattice("<ProductionWork>{body}</ProductionWork>", elements)
    )


def test_sweep_eaccpf(spark):
    from recordmanager_spark.extractors import eaccpf

    # occupations-wrapped BEFORE bare occupation: the xpath engine's
    # //occupation/term follows document order while the struct engine
    # concatenates wrapped-then-bare.
    elements = {
        "agency": (
            "<control><maintenanceAgency><agencyName>Nat Lib</agencyName>"
            "</maintenanceAgency></control>"
        ),
        "name_entry": (
            '<nameEntry><part localType="TONI1">Author, Alice</part>'
            '<part localType="TONI4">1880-1950</part></nameEntry>'
        ),
        "name_parallel": (
            "<nameEntryParallel><nameEntry>"
            '<part localType="TONI1">A. Author</part>'
            "</nameEntry></nameEntryParallel>"
        ),
        "exist_dates": (
            "<existDates><dateSet>"
            '<date localType="http://rdaregistry.info/Elements/a/P50121"'
            ' standardDate="1880-01-02">1880</date>'
            '<date localType="http://rdaregistry.info/Elements/a/P50120"'
            ' standardDate="1950-03-04">1950</date>'
            "</dateSet></existDates>"
        ),
        "occupations": (
            "<occupations><occupation><term>Poet</term></occupation>"
            "</occupations>"
        ),
        "occupation": "<occupation><term>Novelist</term></occupation>",
        "biog": "<biogHist><p>Lived.</p><p>Wrote.</p></biogHist>",
        "functions": (
            '<functions><function localType="TJ37">'
            "<descriptiveNote><p>Writing</p></descriptiveNote>"
            "</function></functions>"
        ),
    }

    def wrap(body: str) -> str:
        # identity-level vs description-level elements split by name
        ident = "".join(
            v
            for k, v in elements.items()
            if k in ("name_entry", "name_parallel") and v in body
        )
        desc = "".join(
            v
            for k, v in elements.items()
            if k in ("exist_dates", "occupations", "occupation", "biog", "functions")
            and v in body
        )
        ctrl = elements["agency"] if elements["agency"] in body else ""
        return (
            f"<eac-cpf>{ctrl}<cpfDescription>"
            f"<identity><entityType>person</entityType>{ident}</identity>"
            f"<description>{desc}</description>"
            f"</cpfDescription></eac-cpf>"
        )

    xmls = [
        wrap(x) if x != "<broken" else x
        for x in _lattice("{body}", elements)
    ]
    _assert_engines_agree(spark, eaccpf, xmls)


def test_sweep_ead(spark):
    from recordmanager_spark.extractors import ead

    elements = {
        "unittitle": "<unittitle>Papers of A</unittitle>",
        "origination": "<origination><corpname>Orig Corp</corpname></origination>",
        "repository": "<repository><corpname>Repo Corp</corpname></repository>",
        "langmaterial": (
            '<langmaterial><language langcode="fin">Finnish</language>'
            "</langmaterial>"
        ),
        "physdesc": "<physdesc><extent>3 boxes</extent><extent>-</extent></physdesc>",
        "controlaccess": (
            "<controlaccess><persname>Person, P.</persname>"
            "<corpname>CA Corp</corpname><subject>archives</subject>"
            "</controlaccess>"
        ),
        "scopecontent": "<scopecontent><p>About stuff.</p></scopecontent>",
    }

    def wrap(body: str) -> str:
        did = "".join(
            v
            for k, v in elements.items()
            if k in ("unittitle", "origination", "repository", "langmaterial", "physdesc")
            and v in body
        )
        rest = "".join(
            v
            for k, v in elements.items()
            if k in ("controlaccess", "scopecontent") and v in body
        )
        return f'<c id="c1" level="file"><did>{did}</did>{rest}</c>'

    xmls = [wrap(x) if x != "<broken" else x for x in _lattice("{body}", elements)]
    _assert_engines_agree(spark, ead, xmls, xml_col="part_xml")


def test_sweep_ead3(spark):
    from recordmanager_spark.extractors import ead3

    # origination-without-controlaccess is the round-3 advice repro:
    # authors concatenates controlaccess parts with origination parts.
    elements = {
        "unittitle": "<unittitle>Papers of B</unittitle>",
        "unitid": "<unitid>X:1</unitid>",
        "origination": (
            "<origination><persname><part>Orig Person</part></persname>"
            "<corpname><part>Orig Corp</part></corpname></origination>"
        ),
        "repository": (
            "<repository><corpname><part>Repo Corp</part></corpname></repository>"
        ),
        "langmaterial": (
            '<langmaterial><language langcode="swe"/></langmaterial>'
        ),
        "physdesc": "<physdesc><extent>2 m</extent></physdesc>",
        "controlaccess": (
            "<controlaccess><persname><part>CA Person</part></persname>"
            "<corpname><part>CA Corp</part></corpname>"
            '<subject identifier="https://ont/s"><part>archives</part></subject>'
            "<geogname><part>Helsinki</part></geogname>"
            "<genreform><part>letters</part></genreform>"
            "</controlaccess>"
        ),
        "scopecontent": "<scopecontent><p>About B.</p></scopecontent>",
    }

    def wrap(body: str) -> str:
        did = "".join(
            v
            for k, v in elements.items()
            if k
            in ("unittitle", "unitid", "origination", "repository", "langmaterial", "physdesc")
            and v in body
        )
        rest = "".join(
            v
            for k, v in elements.items()
            if k in ("controlaccess", "scopecontent") and v in body
        )
        return f'<c id="c1" level="file"><did>{did}</did>{rest}</c>'

    xmls = [wrap(x) if x != "<broken" else x for x in _lattice("{body}", elements)]
    _assert_engines_agree(spark, ead3, xmls, xml_col="part_xml")
