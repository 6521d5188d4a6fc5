"""PII detection/redaction: per-row pinned counts and redacted strings."""

from __future__ import annotations

from pyspark.sql import functions as F

from workbook_exporter_fe_spark.functions import textops

CASES = [
    # (text, n_email, n_ssn, n_phone, n_ipv4, redacted)
    (
        "contact alice@example.com or bob.smith+x@sub.domain.org today",
        2, 0, 0, 0,
        "contact <EMAIL> or <EMAIL> today",
    ),
    (
        "ssn 123-45-6789 phone 415-555-0123 alt 415.555.0123",
        0, 1, 2,  # note: the ssn is NOT a phone (3-2-4 vs 3-3-4 groups)
        0,
        "ssn <SSN> phone <PHONE> alt <PHONE>",
    ),
    (
        "servers 10.0.0.1 and 192.168.255.254; not 1.2.3",
        0, 0, 0, 2,
        "servers <IP> and <IP>; not 1.2.3",
    ),
    ("no pii here at all", 0, 0, 0, 0, "no pii here at all"),
    (
        "mixed joe@x.io 10.1.2.3 555-123-4567",
        1, 0, 1, 1,
        "mixed <EMAIL> <IP> <PHONE>",
    ),
]


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(CASES)], "i long, text string"
    )
    counts = textops.pii_counts(F.col("text"))
    out = {
        r.i: r
        for r in df.select(
            "i",
            *[c.alias(k) for k, c in counts.items()],
            textops.redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    for i, (text, ne, ns, np_, ni, red) in enumerate(CASES):
        r = out[i]
        assert (r.n_email, r.n_ssn, r.n_phone, r.n_ipv4) == (ne, ns, np_, ni), text
        assert r.red == red, text


def test_redaction_order_email_wins_over_digits(spark):
    # the local part may contain digit runs a later pattern could chew on;
    # email redacts first so the whole address becomes one placeholder
    df = spark.createDataFrame([("x 555-123-4567abc@mail.com y",)], "text string")
    red = df.select(textops.redact_pii(F.col("text")).alias("r")).first().r
    assert red == "x <EMAIL> y"
