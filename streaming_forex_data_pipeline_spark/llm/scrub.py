"""Pattern scrubbing (PII redaction + blocklist filtering) for
LLM-training-data pipelines.

Web-scale corpora are scrubbed before training: PII spans (emails,
phone numbers, IP addresses) are replaced with typed placeholder
tokens, and blocklisted terms are masked or used to drop documents
(the C4 "bad-words" stage).  The reference pipeline has no text-
scrubbing stage (its payloads are numeric candles); this implements
the standard operator Spark-first.

Everything is codegen'd `regexp_replace` / `regexp_count` — one corpus
scan, zero shuffles, zero Python.  The regexes deliberately stay
inside the common Java-regex/RE2 dialect (character classes, counted
repetition, alternation, `\b` word boundaries; no backreferences or
lookaround), so the DuckDB oracle runs the IDENTICAL patterns and the
output is exactly hash-checkable.

Redaction order is fixed (email -> ipv4 -> phone -> terms) and the
placeholder tokens contain no digits or blocklisted words, so later
patterns can never match inside an earlier replacement — the composed
output is order-deterministic on both engines.

Scale: a narrow map stage; at 100 TB this is the cheapest kind of
operator (scan-bound, whole-stage codegen, trivially partitionable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: PII patterns in the Java-regex ∩ RE2 dialect.  Order matters and is
#: the redaction order: emails before phones (an email's digit runs
#: must not half-match the phone pattern after the '@' is consumed).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d[\d()\[\] -]{7,}\d",
}


def term_pattern(terms: tuple[str, ...]) -> str:
    """Whole-word alternation for a blocklist (terms are expected to be
    plain lowercase words; regex metacharacters are not escaped because
    blocklists are code-reviewed constants, not user input)."""
    return r"\b(" + "|".join(terms) + r")\b"


def scrub(
    docs: DataFrame, terms: tuple[str, ...] = (), text: str = "text"
) -> DataFrame:
    """Redact PII spans and blocklisted terms from ``text``.

    Adds per-category match counts (``n_email``/``n_ipv4``/``n_phone``/
    ``n_terms``), the total, and the redacted text column ``scrubbed``
    (placeholders ``<EMAIL>``/``<IPV4>``/``<PHONE>``/``<TERM>``).

    Contract: counts are DETECTIONS on the ORIGINAL text, while
    replacements apply sequentially in the documented order — so when
    categories overlap (a phone-shaped digit run inside an email
    local-part), an earlier replacement can consume a later category's
    span and ``n_redactions`` exceeds the number of placeholders in
    ``scrubbed``.  That is deliberate: the counts answer "what PII was
    present" (the audit question), not "how many substitutions ran";
    the oracle mirrors the same original-text counting.
    """
    counts: list[Column] = []
    out = F.col(text)
    for name, pat in PII_PATTERNS.items():
        counts.append(
            F.regexp_count(F.col(text), F.lit(pat)).cast("long").alias(
                f"n_{name}"
            )
        )
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    if terms:
        tp = term_pattern(terms)
        counts.append(
            F.regexp_count(F.col(text), F.lit(tp)).cast("long").alias("n_terms")
        )
        out = F.regexp_replace(out, tp, "<TERM>")
    else:
        counts.append(F.lit(0).cast("long").alias("n_terms"))
    scrubbed = docs.select("*", *counts, out.alias("scrubbed"))
    return scrubbed.withColumn(
        "n_redactions",
        F.col("n_email") + F.col("n_ipv4") + F.col("n_phone") + F.col("n_terms"),
    )
