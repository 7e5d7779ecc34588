"""PII detection / redaction — the scrubbing stage of a corpus build.

Conservative, deterministic regex redaction (emails, IPv4 addresses,
phone-like and long digit runs), applied as map-only JVM
``regexp_replace`` expressions — zero shuffle, whole-stage codegen, no
Python. Patterns deliberately stay in the Java-regex ∩ RE2 common
dialect (no lookaround, no backreferences) so any engine reproduces
the exact output — the DuckDB oracle runs the same patterns.

Redaction order matters and is part of the contract: emails first
(so an address's host digits are never half-eaten by the number
pass), then IPv4, then phone-like digit runs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered (pattern, replacement) — applied top to bottom
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    (r"\b\d{9,}\b", "<NUMBER>"),
)


def redact_pii(c: Column | str) -> Column:
    """Replace PII spans with typed placeholders, in contract order."""
    out = F.col(c) if isinstance(c, str) else c
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(c: Column | str) -> Column:
    """Struct of per-kind match counts on the ORIGINAL text —
    ``(n_email, n_ip, n_phone, n_number)``. Counts use the same
    patterns and the same order semantics as ``redact_pii`` applied to
    the progressively-redacted text, so a phone number inside an email
    address is counted once, as an email."""
    text = F.col(c) if isinstance(c, str) else c
    names = ("n_email", "n_ip", "n_phone", "n_number")
    fields = []
    for (pat, repl), name in zip(PII_PATTERNS, names):
        fields.append(
            F.size(F.regexp_extract_all(text, F.lit(pat), 0)).cast("long").alias(name)
        )
        text = F.regexp_replace(text, pat, repl)
    return F.struct(*fields)
