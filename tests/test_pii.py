"""PII redaction vs a python `re` reference (same patterns, same order)."""

from __future__ import annotations

import re

from turboxsl_spark.functions.pii import PII_PATTERNS, pii_counts, redact_pii

CASES = [
    "contact me at john.doe+spam@mail.example.co.uk today",
    "server at 10.0.255.1 and 192.168.1.254 rebooted",
    "call 555-123-4567 or 555.123.4567 x 555 123 4567",
    "account 123456789 and card 4111111111111111",
    "a@b.io pinged 8.8.8.8 then dialed 800-555-1212 ref 987654321",
    "no pii here, just words and 42 and 1.5 and v1.2.3",
    "",
    "edge email-ish a@@b.com and ip-ish 999.999.999.999",
]


def _ref_redact(s: str) -> str:
    for pat, repl in PII_PATTERNS:
        s = re.sub(pat, repl, s)
    return s


def _ref_counts(s: str):
    out = []
    for pat, repl in PII_PATTERNS:
        out.append(len(re.findall(pat, s)))
        s = re.sub(pat, repl, s)
    return tuple(out)


def test_redact_and_counts_match_python(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "id long, text string"
    )
    rows = (
        df.select("id", "text", redact_pii("text").alias("red"), pii_counts("text").alias("c"))
        .select("id", "text", "red", "c.*")
        .collect()
    )
    for r in rows:
        assert r["red"] == _ref_redact(r["text"]), r["text"]
        got = (r["n_email"], r["n_ip"], r["n_phone"], r["n_number"])
        assert got == _ref_counts(r["text"]), (r["text"], got)


def test_phone_inside_email_counted_once(spark):
    # the digits of an address's local part must not double-count
    df = spark.createDataFrame([(1, "mail 555-123-4567@ex.com now")], "id long, t string")
    r = df.select(pii_counts("t").alias("c")).select("c.*").collect()[0]
    assert (r["n_email"], r["n_phone"]) == (1, 0)


def test_redaction_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, "a@b.co")], "id long, t string")
    out = df.select(redact_pii("t").alias("r"), pii_counts("t").alias("c"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
