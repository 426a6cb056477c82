"""Alias generation for dictionary construction (reference parity M9/M10).

The reference generates ~15 alias patterns per person entity from
(first name, last name, gender, honorific particles):
src/fr/lip6/reden/ldextractor/per/AuthorBNF.java:138-192 (makeAliases)
and 93-105 (getNormalisedName). We re-derive the *semantics* — full
name, family-only, M/Mme titles with and without dot, nobiliary
particles, initials with and without dots — with a deterministic,
order-free (set → sorted list) implementation.
"""

from __future__ import annotations

PARTICLES = ("de", "d'", "von", "da")


def make_aliases(first: str, last: str, gender: str = "", particle: str = "") -> list[str]:
    """Alias patterns for a person entity (sorted, deduplicated).

    Patterns (cf. AuthorBNF.java:138-192):
      * "First Last", "Last"
      * title forms: "M. Last" / "M Last" (male), "Mme. Last" / "Mme Last"
      * particle forms: "First de Last", "de Last" (for the given particle)
      * initial forms: "F. Last", "F Last"
      * "Last, First"
    """
    aliases: set[str] = set()
    first = first.strip()
    last = last.strip()
    if not last:
        return sorted(aliases)
    aliases.add(last)
    if first:
        aliases.add(f"{first} {last}")
        aliases.add(f"{last}, {first}")
        initial = first[0].upper()
        aliases.add(f"{initial}. {last}")
        aliases.add(f"{initial} {last}")
    title = "M" if gender.upper().startswith("M") else ("Mme" if gender else "")
    if title:
        aliases.add(f"{title}. {last}")
        aliases.add(f"{title} {last}")
    if particle:
        sep = "" if particle.endswith("'") else " "
        aliases.add(f"{particle}{sep}{last}")
        if first:
            aliases.add(f"{first} {particle}{sep}{last}")
        if title:
            aliases.add(f"{title}. {particle}{sep}{last}")
    return sorted(aliases)


def clean_rejected_form(form: str) -> str:
    """M8: rejected-form cleaner — truncate the alias at the first
    ``(`` and trim (reference:
    src/fr/lip6/reden/ldextractor/per/QueryAuthorBNF.java:175-181)."""
    i = form.find("(")
    if i >= 0:
        form = form[:i]
    return form.strip()


def clean_rejected_forms(forms: list[str]) -> list[str]:
    """M8 applied to a list with order-preserving dedup
    (QueryAuthorBNF.java:229-235)."""
    out: list[str] = []
    seen: set[str] = set()
    for f in forms:
        c = clean_rejected_form(f)
        if c and c not in seen:
            seen.add(c)
            out.append(c)
    return out


def normalized_display_name(first: str, last: str, birth: str = "-", death: str = "-") -> str:
    """M10: canonical display name "Last, First (birth-death)"
    (AuthorBNF.java:93-105)."""
    base = f"{last}, {first}" if first else last
    return f"{base} ({birth}-{death})"
