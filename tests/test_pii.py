"""PII scrub: exact behavior on constructed strings + corpus invariants.

The reference has no PII handling; this is a north-star training-data-
pipeline operator (BASELINE.json). The synthetic corpus contains no digits,
so the oracle query (queries.pii_scrub) plants deterministic PII first —
these unit tests pin the scrub semantics themselves on hand-built rows.
"""

from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark.operators.text import with_pii_scrubbed


def _scrub(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return with_pii_scrubbed(df).collect()[0]


def test_scrubs_each_kind(spark):
    r = _scrub(
        spark,
        "mail bob.smith+x@corp.example.org call 415-555-0199 ssn 042-68-1234 end",
    )
    assert r.scrubbed_text == "mail <EMAIL> call <PHONE> ssn <SSN> end"
    assert (r.n_email, r.n_phone, r.n_ssn) == (1, 1, 1)
    assert r.residual_digits == 0


def test_multiple_matches_counted_and_replaced(spark):
    r = _scrub(spark, "a@b.co c@d.io 111-22-3333 444-55-6666")
    assert r.n_email == 2 and r.n_ssn == 2 and r.n_phone == 0
    assert r.scrubbed_text == "<EMAIL> <EMAIL> <SSN> <SSN>"


def test_ssn_phone_disjoint(spark):
    # 3-2-4 digit groups must never match the phone pattern and vice versa
    r = _scrub(spark, "ssn 123-45-6789 phone 123-456-7890")
    assert (r.n_ssn, r.n_phone) == (1, 1)
    assert r.scrubbed_text == "ssn <SSN> phone <PHONE>"


def test_word_boundaries_prevent_partial_matches(spark):
    # digit runs embedded in longer numbers are NOT SSNs/phones
    r = _scrub(spark, "serial 1123-45-6789 and 123-45-67890 stay")
    assert r.n_ssn == 0 and r.n_phone == 0
    assert r.residual_digits > 0  # non-PII digits survive the scrub


def test_clean_text_untouched(spark):
    r = _scrub(spark, "no pii here at all")
    assert r.scrubbed_text == "no pii here at all"
    assert (r.n_email, r.n_phone, r.n_ssn, r.residual_digits) == (0, 0, 0, 0)


def test_scrub_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a@b.co")], "doc_id long, text string")
    plan = with_pii_scrubbed(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
