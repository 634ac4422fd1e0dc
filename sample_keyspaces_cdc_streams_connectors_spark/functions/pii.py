"""PII detection and redaction over text columns.

A standard pre-training corpus stage: scrub personally-identifying
strings (emails, phone numbers, IP addresses, SSNs, credit-card-like
digit runs) before anything downstream sees the text.  Everything is
JVM-side ``regexp_replace`` / ``regexp_count`` — zero Python in the
data path, so the scrub rides inside whole-stage codegen and costs
one projection at any scale.

Pattern notes (deliberately conservative, precision over recall —
the knob a real pipeline tunes per-corpus):

- email: RFC-ish local@domain.tld
- phone: NANP-style with optional +1 / separators, 10+ digits —
  anchored on word boundaries so it does not eat arbitrary numbers
- ipv4: four dotted octets, each 0-255 enforced structurally
- ssn: NNN-NN-NNNN with separators required (unseparated 9-digit
  runs are too ambiguous)
- card: 13-16 digit runs with optional space/dash groups (Luhn is
  not checkable in one regex; the digit-run shape is the standard
  first-pass filter)

The reference engine has no PII surface (its transforms end at cell
decoding / projection); this module is part of the
training-data-pipeline extension surface (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "pii_counts", "scrub_pii", "with_pii_scrubbed"]

#: kind -> Java regex (order matters: card before phone so grouped
#: 16-digit runs are classified as card numbers, not phone numbers)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "card": r"\b(?:\d[ -]?){13,16}(?<![ -])\b",
    "ssn": r"\b\d{3}[- ]\d{2}[- ]\d{4}\b",
    # lookarounds reject dotted-quad substrings of longer dotted runs
    # (version strings like 1.2.3.4.5 are not addresses)
    "ipv4": (
        r"(?<![\w.])(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
        r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(?![\w.])"
    ),
    "phone": (
        r"(?<![\dA-Za-z])(?:\+?1[ .-]?)?(?:\(\d{3}\)|\d{3})"
        r"[ .-]?\d{3}[ .-]?\d{4}(?![\dA-Za-z])"
    ),
}


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind match-count columns (``regexp_count``, JVM-side)."""
    return {
        kind: F.regexp_count(col, F.lit(pat)).alias(f"n_{kind}")
        for kind, pat in PII_PATTERNS.items()
    }


def scrub_pii(col: Column, token: str = "[PII:{kind}]") -> Column:
    """Redact every PII kind in ``col``; one chained projection.

    ``token`` may reference ``{kind}`` — the default leaves a typed
    marker so downstream quality filters can count redactions.
    """
    out = col
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, token.format(kind=kind))
    return out


def with_pii_scrubbed(
    df: DataFrame, text_col: str = "text", keep_counts: bool = True
) -> DataFrame:
    """Scrub ``text_col`` in place, optionally appending per-kind
    match counts (counted BEFORE redaction) for quality auditing."""
    cols = [c for c in df.columns if c != text_col]
    extra = (
        list(pii_counts(F.col(text_col)).values()) if keep_counts else []
    )
    return df.select(
        *cols, scrub_pii(F.col(text_col)).alias(text_col), *extra
    )
