"""MARC format calculation from leader/007/008.

Behavioral spec: Record/Marc/FormatCalculator.php (getFormatsAsList,
getFormatFrom007, getFormatFromRecordType, getFormatFromBibLevel) in the
reference. This is irreducibly procedural (nested decision tables over fixed
positions), so it runs as one Arrow-batched pandas UDF — a pure function of
three small inputs, no shuffle, applied once per record at extract time.

Scope note: the 33x-field partial heuristics and a few rare special cases
(isGovernmentDocument 086, braille/large-print 008 nuances) are implemented
in simplified form; divergences are listed in test comments.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

_007A = {"d": "Globe", "f": "Braille", "h": "Microfilm", "r": "SensorImage"}

_007C2 = {
    "a": "TapeCartridge", "b": "ChipCartridge", "c": "DiscCartridge",
    "f": "TapeCassette", "h": "TapeReel", "j": "FloppyDisk",
    "m": "CDROM", "o": "CDROM",
}

_007K2 = {
    "c": "Collage", "d": "Drawing", "e": "Painting", "f": "Print",
    "g": "Photonegative", "j": "Print", "l": "Drawing", "o": "FlashCard",
    "n": "Chart", "z": "Photo",
}

_007M2 = {"f": "VideoCassette", "r": "Filmstrip"}

_007V2 = {
    "c": "VideoCartridge", "d": "VideoDisc", "f": "VideoCassette",
    "r": "VideoReel",
}

_RECORD_TYPE = {
    "c": "MusicalScore", "d": "MusicalScore", "e": "Map", "f": "Map",
    "i": "SoundRecording", "j": "MusicRecording", "k": "Photo",
    "o": "Kit", "p": "Kit", "r": "PhysicalObject", "t": "Manuscript",
}

_NOT_BOOK_TYPES = {"e", "f", "g", "i", "j", "k", "r"}


def _get008(f008: str, pos: int) -> str:
    return f008[pos].lower() if f008 and len(f008) > pos else ""


def _format_from_007(code: str, s: str) -> str:
    c2 = s[1] if len(s) > 1 else " "
    if code == "a":
        return "Atlas" if c2 == "d" else "Map"
    if code == "c":
        if c2 == "r":
            return ""
        return _007C2.get(c2, "ElectronicResource")
    if code == "g":
        if c2 in ("c", "d", "f", "o"):
            return "Filmstrip"
        if c2 == "t":
            return "Transparency"
        return "Slide"
    if code == "k":
        return _007K2.get(c2, "Photo")
    if code == "m":
        return _007M2.get(c2, "MotionPicture")
    if code == "o":
        return "Kit"
    if code == "q":
        return "MusicalScore"
    if code == "s":
        if c2 == "d":
            return "SoundDisc"
        if c2 in ("s", "c"):  # cassette
            return "SoundCassette"
        return "SoundRecording"
    if code == "v":
        return _007V2.get(c2, "Video")
    return _007A.get(code, "")


def _format_from_record_type(rtype: str, f008: str, codes007: list[str]) -> str:
    if rtype == "a":
        return ""  # handled by bib level
    if rtype == "g":
        # Projected medium: video unless 008/33 says slide/transparency
        v = _get008(f008, 33)
        if v in ("t",):
            return "Transparency"
        if v in ("s",):
            return "Slide"
        return "Video"
    if rtype == "m":
        ftype = _get008(f008, 26)
        if ftype == "a":
            return "DataSet"
        if ftype == "b":
            return "ComputerProgram"
        if ftype == "g":
            return "VideoGame"
        return "ElectronicResource" if "c" not in codes007 else ""
    return _RECORD_TYPE.get(rtype, "")


def _format_from_bib_level(
    rtype: str, blevel: str, f008: str, could_be_book: bool, codes007: list[str]
) -> str:
    if blevel == "m":  # Monograph
        if could_be_book:
            return "eBook" if "c" in codes007 else "Book"
        return ""
    if blevel == "s":  # Serial
        if rtype == "a":
            stype = _get008(f008, 21)
            if stype == "n":
                return "Newspaper"
            if stype in ("m", "p", ""):
                return "Journal"
            return "Serial"
        return "Serial"
    if blevel == "a":  # Monograph component part
        return "BookSection" if could_be_book else "Article"
    if blevel == "b":  # Serial component part
        return "Article"
    if blevel == "c":
        return "Collection"
    if blevel == "d":
        return "SubUnit"
    if blevel == "i":
        return "ContinuingResource"
    return ""


def formats_as_list(leader: str | None, f007s, f008: str | None) -> list[str]:
    """Python port of the decision flow in FormatCalculator::getFormatsAsList."""
    leader = leader or ""
    f008 = f008 or ""
    f007s = [s.lower() for s in (f007s or []) if s]
    rtype = leader[6].lower() if len(leader) > 6 else " "
    blevel = leader[7].lower() if len(leader) > 7 else " "
    result: list[str] = []
    could_be_book = True

    # Thesis: 502 is not visible here (control-only UDF) — callers append it.
    if _get008(f008, 28) in ("f", "i", "o") and rtype == "a":
        result.append("GovernmentDocument")
    if rtype in ("m",) or _get008(f008, 23) in ("o", "q", "s"):
        result.append("Electronic")
    if _get008(f008, 29) == "1" and rtype in ("a", "t"):
        result.append("ConferenceProceeding")

    codes007: list[str] = []
    for s in f007s:
        code = s[0] if s else " "
        codes007.append(code)
        if code in ("g", "k", "m", "v"):
            could_be_book = False
        if code == "v":
            result.append("Video")
        fmt = _format_from_007(code, s)
        if fmt:
            result.append(fmt)

    if rtype in _NOT_BOOK_TYPES:
        could_be_book = False
    elif rtype == "m" and _get008(f008, 26) not in ("d", "i", "m", "u", "z"):
        could_be_book = False

    fmt = _format_from_record_type(rtype, f008, codes007)
    if fmt:
        result.append(fmt)
    fmt = _format_from_bib_level(rtype, blevel, f008, could_be_book, codes007)
    if fmt:
        result.append(fmt)

    if not result:
        if blevel in ("c", "d"):
            result.append("Kit")
        elif rtype == "a":
            result.append("Text")
        else:
            result.append("Unknown")
    # getFormats deduplicates preserving order
    seen: set[str] = set()
    out = []
    for r in result:
        if r not in seen:
            seen.add(r)
            out.append(r)
    return out


@pandas_udf(ArrayType(StringType()))
def format_udf(leader: pd.Series, f007s: pd.Series, f008: pd.Series) -> pd.Series:
    return pd.Series(
        [formats_as_list(ld, fs, f8) for ld, fs, f8 in zip(leader, f007s, f008)]
    )
