"""Micro-bench: the three text-profile formulations.

* **naive** — the pre-rework detect_lang/quality_score: ``split(text)``
  embedded once per language per reference (HOF lambdas block Catalyst's
  subexpression elimination → re-tokenizes every row ~12×);
* **fold** — single ``F.aggregate`` pass with a struct accumulator
  (one tokenization, but per-element struct rebuilds are interpreted);
* **ws_col** — ``with_text_profile``: the words array materialized as its own
  column, counters are cheap array scans over the attribute. The shipped
  scale path — measured ~4.7× faster than naive, ~3.5× faster than fold on
  200-word docs.

Run: python bench/text_profile_bench.py [n_docs] [n_words]
Prints one JSON line with all three timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from standardized_omop_data_etl_spark.functions.text_analysis import (
    LANG_MARKERS,
    detect_lang_from_profile,
    quality_from_profile,
    text_profile,
    words,
)


def naive_lang_score(text, lang):
    # the pre-rework formulation: words() re-embedded per reference
    marker = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    ws = words(text)
    hits = F.size(F.filter(ws, lambda w: F.array_contains(marker, w)))
    return F.when(F.size(ws) > 0, hits.cast("double") / F.size(ws).cast("double")).otherwise(0.0)


def naive_detect_lang(text):
    scores = [(lang, naive_lang_score(text, lang)) for lang in LANG_MARKERS]
    best = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    for lang, s in reversed(scores):
        out = F.when((s == best) & (best > 0.0), F.lit(lang)).otherwise(out)
    return out


def naive_quality(text):
    n = F.length(text)
    ws = words(text)
    n_words = F.size(ws)
    punct = F.length(F.regexp_replace(text, r"[^.!?,;:]", ""))
    punct_ratio = F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(0.0)
    stop_ratio = naive_lang_score(text, "en")
    mean_wlen = F.when(n_words > 0, n.cast("double") / n_words.cast("double")).otherwise(0.0)
    len_band = F.when((n >= 100) & (n <= 20000), 1.0).when(n >= 20, 0.5).otherwise(0.0)
    wlen_band = F.when((mean_wlen >= 3.0) & (mean_wlen <= 12.0), 1.0).otherwise(0.3)
    punct_band = F.when((punct_ratio > 0.001) & (punct_ratio < 0.2), 1.0).otherwise(0.4)
    stop_band = F.when(stop_ratio > 0.05, 1.0).when(stop_ratio > 0.01, 0.6).otherwise(0.2)
    return F.round(0.35 * len_band + 0.2 * wlen_band + 0.2 * punct_band + 0.25 * stop_band, 4)


def main() -> None:
    from standardized_omop_data_etl_spark.functions.text_analysis import with_text_profile

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_words = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = SparkSession.builder.getOrCreate()
    vocab = ["the", "cat", "und", "der", "data", "les", "los", "alpha", "beta", "x9"]
    word = lambda i: F.element_at(  # noqa: E731
        F.array(*[F.lit(w) for w in vocab]),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(i)), F.lit(len(vocab))) + 1).cast("int"),
    )
    text = F.concat_ws(" ", *[word(i) for i in range(n_words)])
    docs = spark.range(n_docs).select(text.alias("text")).persist()
    docs.count()

    def timed(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    def scored(profile_col):
        return [
            detect_lang_from_profile(profile_col).alias("lang"),
            quality_from_profile(profile_col).alias("q"),
        ]

    variants = {
        "naive_sec": docs.select(
            naive_detect_lang(F.col("text")).alias("lang"),
            naive_quality(F.col("text")).alias("q"),
        ),
        "fold_sec": docs.withColumn("_p", text_profile(F.col("text"))).select(
            *scored(F.col("_p"))
        ),
        "ws_col_sec": with_text_profile(docs, "text").select(*scored(F.col("_p"))),
    }
    out = {"metric": "text_profile_variants", "n_docs": n_docs, "n_words": n_words}
    for name, df in variants.items():
        timed(df)  # warm-up
        out[name] = min(timed(df), timed(df))
    out["speedup_vs_naive"] = round(out["naive_sec"] / out["ws_col_sec"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
