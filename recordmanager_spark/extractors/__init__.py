"""Format-specific record extractors (reference: src/RecordManager/Base/Record/)."""

from . import dc, format_calculator, marc  # noqa: F401
