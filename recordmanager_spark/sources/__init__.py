from .files import read_table, read_xml_records, MARC_IN_JSON_SCHEMA

__all__ = ["read_table", "read_xml_records", "MARC_IN_JSON_SCHEMA"]
