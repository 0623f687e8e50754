"""Unit tests for PII scrubbing, stratified sampling, and corpus stats
(operators/text.py, operators/splits.py)."""

import pytest

from timeseriesutils_spark.operators.splits import hash_bucket, stratified_sample
from timeseriesutils_spark.operators.text import corpus_stats, length_histogram, pii_scrub


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "contact me at alice@example.com or bob@test.org today", "en", "web"),
        (2, "my ssn is 123-45-6789 and phone 555-123-4567", "en", "web"),
        (3, "server at 192.168.1.1 responded", "en", "crawl"),
        (4, "nothing sensitive here at all", "de", "web"),
        (5, "a" * 450, "de", "crawl"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_pii_scrub_counts_and_redaction(spark, docs):
    out = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert out[1].n_email == 2 and out[1].n_pii == 2
    assert out[2].n_ssn == 1 and out[2].n_phone == 1 and out[2].n_pii == 2
    assert out[3].n_ipv4 == 1
    assert out[4].n_pii == 0
    # redaction shrinks the text (placeholders shorter than the matches)
    assert out[1].n_chars_scrubbed < len(
        "contact me at alice@example.com or bob@test.org today"
    )


def test_pii_scrub_placeholders(spark):
    df = spark.createDataFrame(
        [(1, "mail x@y.com ssn 123-45-6789 ip 10.0.0.1")],
        "doc_id long, text string",
    )
    import pyspark.sql.functions as F
    from timeseriesutils_spark.operators.text import PII_PATTERNS

    scrubbed = F.col("text")
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    got = df.select(scrubbed.alias("s")).head().s
    assert got == "mail <EMAIL> ssn <SSN> ip <IP>"


def test_stratified_sample_deterministic_and_rate(spark):
    n = 2000
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(n)],
        "doc_id long, lang string",
    )
    kept = stratified_sample(df, "doc_id", "lang", {"en": 1.0, "de": 0.25})
    counts = {r.lang: r.cnt for r in kept.groupBy("lang").count().withColumnRenamed("count", "cnt").collect()}
    assert counts["en"] == n // 2  # rate 1.0 keeps everything
    assert 0.15 * n / 2 < counts.get("de", 0) < 0.35 * n / 2  # ~25%
    # rerun → identical membership (pure function of key)
    a = sorted(r.doc_id for r in kept.collect())
    b = sorted(r.doc_id for r in stratified_sample(df, "doc_id", "lang", {"en": 1.0, "de": 0.25}).collect())
    assert a == b
    # unlisted stratum with default_rate=0 disappears
    none_kept = stratified_sample(df, "doc_id", "lang", {"en": 1.0})
    assert none_kept.filter("lang = 'de'").count() == 0


def test_stratified_subset_property(spark):
    """Lower rate ⊆ higher rate for the same stratum (threshold monotone)."""
    df = spark.createDataFrame([(i, "x") for i in range(500)], "doc_id long, lang string")
    lo = {r.doc_id for r in stratified_sample(df, "doc_id", "lang", {"x": 0.2}).collect()}
    hi = {r.doc_id for r in stratified_sample(df, "doc_id", "lang", {"x": 0.6}).collect()}
    assert lo <= hi


def test_corpus_stats_totals(spark, docs):
    out = {(r.lang, r.source): r for r in corpus_stats(docs).collect()}
    assert out[("en", "web")].n_docs == 2
    assert out[("de", "crawl")].total_chars == 450
    assert out[("de", "crawl")].mean_words == 1.0


def test_length_histogram_buckets(spark, docs):
    out = {(r.stratum, r.bucket_lo): r.n_docs for r in length_histogram(docs, bucket_width=200).collect()}
    assert out[("de", 400)] == 1  # the 450-char doc
    assert ("en", 0) in out


def test_zipf_fit_power_law(spark):
    # exact power law c(r) = 1000 * r^-1: slope must be -1, r2 = 1
    from timeseriesutils_spark.operators.text import zipf_fit

    # construct a corpus whose word counts follow the law exactly:
    # word w_r appears floor(60/r) times
    body = []
    for r in range(1, 13):
        body += [f"w{r:02d}"] * (60 // r)
    docs = spark.createDataFrame(
        [(1, "x", " ".join(body))], "doc_id long, lang string, text string"
    )
    r = zipf_fit(docs, max_rank=6).collect()[0]  # top ranks: exact 60/r
    assert r.n_ranks == 6
    assert abs(r.slope - (-1.0)) < 0.02  # floor(60/r) ~ 60/r
    assert r.r2 > 0.999


def test_zipf_fit_uniform_slope_zero(spark):
    from timeseriesutils_spark.operators.text import zipf_fit

    body = " ".join(f"u{i}" for _ in range(4) for i in range(50))
    docs = spark.createDataFrame(
        [(1, "x", body)], "doc_id long, lang string, text string"
    )
    r = zipf_fit(docs, max_rank=50).collect()[0]
    assert abs(r.slope) < 1e-9  # all counts equal -> flat line


def test_jsonl_pack_escaping_and_validity(spark):
    import json as _json

    from timeseriesutils_spark.operators.text import jsonl_pack

    docs = spark.createDataFrame(
        [(1, 'He said "hi"\nback\\slash\ttab', "en", "src1")],
        "doc_id long, text string, lang string, source string",
    )
    r = jsonl_pack(docs).collect()[0]
    obj = _json.loads(r.line)  # escaper must produce VALID json
    assert obj["id"] == 1
    assert obj["text"] == 'He said "hi"\nback\\slash\ttab'
    assert obj["meta"] == {"lang": "en", "source": "src1"}
    assert r.n_bytes == len(r.line)
