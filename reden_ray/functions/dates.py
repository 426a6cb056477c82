"""Date scalar functions (reference parity).

* ``parse_year`` — M5: string → year int via ``yyyy-MM-dd`` then
  ``yyyy`` formats, else None
  (src/fr/lip6/reden/nelinker/DateSpecificProcessingNEL.java:39-63).
* ``date_overlap`` — M6: lifespan-overlap score
  ``max(0, min(d1,d2) - max(b1,b2))``
  (DateSpecificProcessingNEL.java:15-28).
* ``clean_year`` — M7: birth/death-date cleaner used at
  dictionary-build time
  (src/fr/lip6/reden/ldextractor/per/QueryAuthorBNF.java:201-221):
  keep a leading 4-digit year; 2- or 1-digit century forms like
  ``18..`` keep the digits; ISO dates keep the year; else ``"-"``.
"""

from __future__ import annotations

import re

_ISO_RE = re.compile(r"^(\d{4})-\d{2}-\d{2}")
_Y4_RE = re.compile(r"^(\d{4})")
_CENT_RE = re.compile(r"^(\d{1,2})\.\.")


def parse_year(s: str | None) -> int | None:
    """M5: year from 'yyyy-MM-dd' or 'yyyy'; None otherwise."""
    if not s:
        return None
    m = _ISO_RE.match(s) or _Y4_RE.match(s)
    if m:
        return int(m.group(1))
    return None


def date_overlap(b1: int, d1: int, b2: int, d2: int) -> int:
    """M6: max(0, min(deaths) - max(births))."""
    return max(0, min(d1, d2) - max(b1, b2))


def clean_year(s: str | None) -> str:
    """M7: normalized year string for dictionary rows; '-' sentinel."""
    if not s:
        return "-"
    s = s.strip()
    m = _ISO_RE.match(s)
    if m:
        return m.group(1)
    m = _Y4_RE.match(s)
    if m:
        return m.group(1)
    m = _CENT_RE.match(s)
    if m:
        return m.group(1)
    return "-"
