"""Small shims over PySpark API asymmetries.

``F.element_at(col, 1)`` accepts a literal index, but under an ANSI-enabled
session (the Spark 4 default, and what the driver's oracle harness uses) it
throws ``INVALID_ARRAY_INDEX_IN_ELEMENT_AT`` on an empty array instead of
returning NULL.  ``F.try_element_at`` has the permissive semantics this
engine wants (the reference coerces and never errors), but its Python
wrapper only accepts a Column for the index/key argument.  This shim gives
``try_element_at`` the same literal-friendly signature ``element_at`` has,
so call sites read identically.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def try_element_at(col: Column | str, extraction) -> Column:
    """``F.try_element_at`` accepting literal indexes / map keys.

    A non-Column ``extraction`` (int index, str map key, ...) is wrapped in
    ``F.lit`` — mirroring ``F.element_at``'s treatment — instead of being
    misread as a column name.
    """
    if not isinstance(extraction, Column):
        extraction = F.lit(extraction)
    return F.try_element_at(col, extraction)
