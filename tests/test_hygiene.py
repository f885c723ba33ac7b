"""Pre-training hygiene ops: benchmark decontamination + PII redaction."""

from pyspark.sql import Row, functions as F

from standardized_omop_data_etl_spark.functions.text_analysis import (
    pii_counts,
    redact_pii,
)
from standardized_omop_data_etl_spark.operators.dedup import benchmark_contamination


def test_benchmark_contamination_flags_echoes(spark):
    probes = spark.createDataFrame(
        [Row(doc_id=1000, text="the quick brown fox jumps over the lazy dog")]
    )
    docs = spark.createDataFrame([
        Row(doc_id=1, text="totally unrelated words here nothing shared at all"),
        # echoes two 3-gram windows of the probe
        Row(doc_id=2, text="he said the quick brown fox jumps again"),
        # echoes one 3-gram only — below min_shared=2
        Row(doc_id=3, text="a lazy dog sleeps and the lazy dog snores"),
        Row(doc_id=1000, text="the quick brown fox jumps over the lazy dog"),  # self
    ])
    out = benchmark_contamination(docs, probes, "text", "doc_id", k=3, min_shared=2)
    rows = {(r["doc_id"], r["probe_id"]): r["shared_ngrams"] for r in out.collect()}
    assert (2, 1000) in rows and rows[(2, 1000)] >= 2
    assert all(d != 1000 for d, _ in rows)  # self-pair excluded
    assert (1, 1000) not in rows and (3, 1000) not in rows


def test_benchmark_contamination_stop_gram_cap(spark):
    # a gram present in every doc fans out without the cap; with
    # corpus_df_max it is anti-joined away and only the rare echo survives
    probes = spark.createDataFrame([Row(doc_id=99, text="alpha beta gamma delta rare one two")])
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha beta gamma filler{i} x y z") for i in range(10)]
        + [Row(doc_id=50, text="junk junk delta rare one two tail")]
    )
    capped = benchmark_contamination(
        docs, probes, "text", "doc_id", k=3, min_shared=1, corpus_df_max=3
    )
    got = {r["doc_id"] for r in capped.collect()}
    assert got == {50}  # the common "alpha beta gamma" gram was capped away


def test_redact_pii_and_counts(spark):
    df = spark.createDataFrame([Row(t=(
        "write to jane.doe+x@corp.example.org or call 555-123-4567; "
        "server 192.168.1.7, ssn 123-45-6789, clean text stays"
    ))])
    out = df.select(redact_pii(F.col("t")).alias("clean"),
                    pii_counts(F.col("t")).alias("c")).collect()[0]
    assert "[EMAIL]" in out["clean"] and "[PHONE]" in out["clean"]
    assert "[IP]" in out["clean"] and "[SSN]" in out["clean"]
    assert "jane.doe" not in out["clean"] and "4567" not in out["clean"]
    assert "clean text stays" in out["clean"]
    assert out["c"]["email"] == 1 and out["c"]["phone"] == 1
    assert out["c"]["ip"] == 1 and out["c"]["ssn"] == 1
