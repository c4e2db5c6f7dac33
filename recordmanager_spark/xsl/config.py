"""ini-file driven stylesheet loading (XslTransformation.php parity).

Behavioral spec (reference, NOT code): Utils/XslTransformation.php:74-131 —
a ``.properties`` ini file names the stylesheet (``[General] xslt=``) and
supplies global parameters (``[Parameters]``); caller params merge on top
at transform time. ``php_function`` / ``custom_class`` registration has no
Python analogue — configuring one raises, mirroring the fail-fast the
reference gets from a missing PHP class file.
"""

from __future__ import annotations

import configparser
from pathlib import Path

from .engine import MiniXSLT, XsltError


def _strip_quotes(v: str) -> str:
    v = v.strip()
    if len(v) >= 2 and v[0] == v[-1] and v[0] in "'\"":
        return v[1:-1]
    return v


class XslTransformationConfig:
    """Load a transformation from a ``.properties`` file + base path."""

    def __init__(self, base_path: str | Path, config_file: str,
                 params: dict[str, object] | None = None):
        base = Path(base_path)
        cp = configparser.ConfigParser(interpolation=None, strict=False)
        # parse_ini_file-compatible enough: our corpus is [Section] k = v
        text = (base / config_file).read_text()
        cp.read_string(text)
        general = cp["General"] if cp.has_section("General") else {}
        for forbidden in ("php_function[]", "php_function", "custom_class[]",
                          "custom_class"):
            if forbidden in general:
                raise XsltError(
                    f"{config_file}: {forbidden} requires PHP function "
                    "registration, which this engine does not support"
                )
        xslt_name = _strip_quotes(general.get("xslt", ""))
        if not xslt_name:
            raise XsltError(f"{config_file}: [General] xslt= is required")
        self.filename = str(base / xslt_name)
        self.params: dict[str, object] = {}
        if cp.has_section("Parameters"):
            for k, v in cp["Parameters"].items():
                self.params[k] = _strip_quotes(v)
        if params:
            self.params.update(params)

        def resolver(href: str) -> str:
            return (base / href).read_text()

        self.engine = MiniXSLT(Path(self.filename).read_text(), resolver=resolver)

    def transform(self, xml: str, params: dict[str, object] | None = None) -> str:
        merged = dict(self.params)
        if params:
            merged.update(params)
        return self.engine.transform(xml, merged)

    def transform_to_fields(self, xml: str, params=None) -> list[tuple[str, str]]:
        merged = dict(self.params)
        if params:
            merged.update(params)
        return self.engine.transform_to_fields(xml, merged)
