"""Format-specific record extractors (reference: src/RecordManager/Base/Record/)."""

from . import dc, ead, eaccpf, format_calculator, forward, lido, linemarc, marc, qdc  # noqa: F401
