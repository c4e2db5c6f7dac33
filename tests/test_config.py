"""datasources.ini compiler tests — parsed against the reference's own
fixture configs and the documented sample-key inventory."""

from __future__ import annotations

from recordmanager_spark import config as C

FIXCFG = "/root/reference/tests/fixtures/Base/config/basic/conf/datasources.ini"
FIXMAPS = "/root/reference/tests/fixtures/Base/config/basic/mappings"


def test_parse_reference_fixture_config():
    cfgs = C.parse_datasources_ini(open(FIXCFG).read())
    assert set(cfgs) == {"test"}
    cfg = cfgs["test"]
    assert cfg.institution == "Test"
    assert cfg.format == "marc"
    assert cfg.effective_id_prefix == "test"  # section name default
    assert cfg.mappings == {
        "building": [("building.map", "normal"), ("building_sub.map", "regexp")]
    }


def test_parse_sample_key_inventory():
    text = """
; comment line
[src1]
institution = "My Inst"
format = dc
idPrefix = pfx
dedup = true
recordXPath = //record
driverParams[] = "003InLinkingID=true"
driverParams[] = holdingsInBuilding=false
fieldRules[] = "delete collection"
fieldRules[] = "move author author2"
extraFields[] = sector_str_mv:library
building_mapping[] = "main.map"
building_mapping[] = "sub.map,regexp"
format_mapping = formats.map
institutionInBuilding = "none"
componentParts = merge_non_articles
indexUnprefixedIds = true
idSearch[] = "/^oai:x:/"
idReplace[] = "x-"
authority[person] = person_source
authority[*] = default_source
"""
    cfg = C.parse_datasources_ini(text)["src1"]
    assert cfg.institution == "My Inst"
    assert cfg.dedup is True
    assert cfg.effective_id_prefix == "pfx"
    assert cfg.record_xpath == "//record"
    assert cfg.driver_params == {
        "003InLinkingID": "true",
        "holdingsInBuilding": "false",
    }
    assert cfg.field_rules == ["delete collection", "move author author2"]
    assert cfg.extra_fields == [("sector_str_mv", "library")]
    assert cfg.mappings == {
        "building": [("main.map", "normal"), ("sub.map", "regexp")],
        "format": [("formats.map", "normal")],
    }
    assert cfg.institution_in_building == "none"
    assert cfg.component_parts == "merge_non_articles"
    assert cfg.index_unprefixed_ids is True
    assert cfg.id_search_replace == [("/^oai:x:/", "x-")]
    assert cfg.raw["authority"] == {
        "person": "person_source",
        "*": "default_source",
    }


def test_compile_source_resolves_files():
    cfgs = C.parse_datasources_ini(open(FIXCFG).read())
    loader = lambda name: open(f"{FIXMAPS}/{name}").read()  # noqa: E731
    compiled = C.compile_source(cfgs["test"], loader)
    m = compiled.mappings["building"]
    assert m.type == "normal"
    assert len(m.sub_maps) == 1
    assert m.sub_maps[0].type == "regexp"
    assert compiled.field_rules == []


def test_apply_source_pipeline_end_to_end(spark):
    """Config-driven tail over an extracted frame: field rules, mapping,
    institution-in-building, extra fields — SolrUpdater's order."""
    from pyspark.sql import functions as F  # noqa: F401

    text = """
[lib]
institution = Inst
format = marc
fieldRules[] = "copy format genre"
format_mapping = formats.map
extraFields[] = sector_str_mv:library
"""
    maps = {"formats.map": "Book = Monograph\n##default = Other\n"}
    compiled = C.compile_source(
        C.parse_datasources_ini(text)["lib"], maps.__getitem__
    )
    df = spark.createDataFrame(
        [("r1", ["Book"], ["MAIN"]), ("r2", ["CD"], ["SUB"])],
        "id string, format array<string>, building array<string>",
    )
    out = {
        r.id: r
        for r in C.apply_source_pipeline(
            df, compiled, hierarchical_facets=["building"]
        ).collect()
    }
    assert out["r1"].genre == ["Book"]  # copied BEFORE mapping ran
    assert out["r1"].format == ["Monograph"]
    assert out["r2"].format == ["Other"]
    assert out["r1"].building == ["0/Inst/", "1/Inst/MAIN/"]
    assert out["r1"].sector_str_mv == ["library"]
