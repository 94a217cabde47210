"""PII detection/redaction (functions/pii.py)."""

import pytest
from pyspark.sql import functions as F

from tachyon_spark.functions.pii import pii_density, scrub_pii


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "contact me at jane.doe+spam@mail.example.org for details"),
        (2, "server 192.168.0.17 and backup 10.0.0.1 are down"),
        (3, "ssn 123-45-6789 leaked with phone +1 415 555 0132 today"),
        (4, "clean prose with no identifiers at all"),
        (5, "two mails a@b.co c@d.io one ip 8.8.8.8"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scrub_counts_and_redaction(corpus):
    out = {r["doc_id"]: r for r in scrub_pii(corpus).collect()}
    assert out[1]["n_email"] == 1 and "<EMAIL>" in out[1]["clean"]
    assert "jane" not in out[1]["clean"]
    assert out[2]["n_ip"] == 2 and out[2]["clean"].count("<IP>") == 2
    assert out[3]["n_ssn"] == 1 and out[3]["n_phone"] == 1
    assert "<SSN>" in out[3]["clean"] and "<PHONE>" in out[3]["clean"]
    assert "123-45-6789" not in out[3]["clean"]
    assert out[4]["n_email"] == out[4]["n_ip"] == out[4]["n_ssn"] == 0
    assert out[4]["clean"] == "clean prose with no identifiers at all"
    assert out[5]["n_email"] == 2 and out[5]["n_ip"] == 1


def test_placeholders_not_rematched(corpus):
    # a second scrub pass over already-clean text is a no-op
    once = scrub_pii(corpus).select(F.col("doc_id"), F.col("clean").alias("text"))
    twice = {r["doc_id"]: r for r in scrub_pii(once).collect()}
    for r in twice.values():
        assert r["n_email"] == r["n_ip"] == r["n_ssn"] == r["n_phone"] == 0


def test_density(corpus):
    d = {r["doc_id"]: r for r in pii_density(corpus).collect()}
    assert d[4]["n_pii"] == 0 and d[4]["pii_per_100_tok"] == 0.0
    assert d[5]["n_pii"] == 3
    assert d[5]["pii_per_100_tok"] == pytest.approx(3 * 100 / d[5]["n_tok"])


def test_plan_is_narrow(corpus):
    plan = scrub_pii(corpus)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection, no shuffle


def test_guards_preserve_null_and_tricky_rows(spark):
    # edge semantics pinned through the r12 regexp_count rewrite: NULL
    # text keeps NULL counts/clean (regexp_count(NULL) is NULL, matching
    # the old size(regexp_extract_all(NULL))), digit-bearing text with no
    # PII counts 0, and '@' with no valid email counts 0
    rows = [(1, None), (2, "version 2 of chapter 7"), (3, "not@anemail")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert out[1]["n_email"] is None and out[1]["clean"] is None
    assert out[1]["n_phone"] is None
    assert out[2]["n_phone"] == 0 and out[2]["clean"] == "version 2 of chapter 7"
    assert out[3]["n_email"] == 0  # no TLD -> pattern ran, no match
    d = {r["doc_id"]: r for r in pii_density(df).collect()}
    assert d[1]["n_pii"] is None
    assert d[2]["n_pii"] == 0
