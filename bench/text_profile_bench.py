"""Micro-bench: one-pass text_profile vs the naive per-language formulation.

The naive detect_lang/quality_score embedded ``split(text)`` once per
language per reference — higher-order-function lambdas block Catalyst's
subexpression elimination, so a 4-language argmax re-tokenized every row ~16×.
``text_profile`` folds every counter into ONE ``F.aggregate`` pass.

Run: spark-submit --master local[N] --py-files sodes.zip bench/text_profile_bench.py [n_docs]
Prints one JSON line with both timings and the speedup.
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = SparkSession.builder.getOrCreate()
    # ~60-word synthetic docs, deterministic
    vocab = ["the", "cat", "und", "der", "data", "les", "los", "alpha", "beta", "x9"]
    word = lambda i: F.element_at(  # noqa: E731
        F.array(*[F.lit(w) for w in vocab]),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(i)), F.lit(len(vocab))) + 1).cast("int"),
    )
    text = F.concat_ws(" ", *[word(i) for i in range(60)])
    docs = spark.range(n_docs).select(text.alias("text")).persist()
    docs.count()

    def timed(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    new_df = docs.withColumn("_p", text_profile(F.col("text"))).select(
        detect_lang_from_profile(F.col("_p")).alias("lang"),
        quality_from_profile(F.col("_p")).alias("q"),
    )
    old_df = docs.select(
        naive_detect_lang(F.col("text")).alias("lang"),
        naive_quality(F.col("text")).alias("q"),
    )
    # warm-up then measure each twice, keep best
    timed(new_df)
    t_new = min(timed(new_df), timed(new_df))
    t_old = min(timed(old_df), timed(old_df))
    print(json.dumps({
        "metric": "text_profile_one_pass_vs_naive",
        "n_docs": n_docs,
        "one_pass_sec": t_new,
        "naive_sec": t_old,
        "speedup": round(t_old / t_new, 2),
    }))


if __name__ == "__main__":
    main()
