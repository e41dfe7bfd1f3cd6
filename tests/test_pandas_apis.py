"""Pandas-interop API surface beyond mapInPandas: cogrouped
applyInPandas and the Spark 4 Python UDTF — each checked against an
equivalent relational plan so the Arrow plumbing is verified, not just
exercised."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from aiesec_guc_spark.catalog import load_table


def test_cogroup_apply_in_pandas_matches_join(spark, sf_dir):
    """Cogroup clicks/purchases per user; the pandas-side conversion
    stat must equal the join/aggregate plan's."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "event_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id"
    )

    def stats(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": pd.Series([key[0]], dtype="int64"),
                "n_clicks": pd.Series([len(left)], dtype="int64"),
                "n_purchases": pd.Series([len(right)], dtype="int64"),
            }
        )

    got = (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(stats, "user_id long, n_clicks long, n_purchases long")
    )

    want = (
        clicks.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_clicks"))
        .join(
            purchases.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_purchases")),
            "user_id",
            "full",
        )
        .fillna(0)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_python_udtf_lateral_explode(spark):
    """Spark 4 Python UDTF: one input row → many output rows via a
    lateral join, equal to the split+explode relational form."""
    try:
        from pyspark.sql.functions import udtf
    except ImportError:
        pytest.skip("Python UDTF API unavailable")

    @udtf(returnType="sentence: string, idx: int")
    class SplitSentences:
        def eval(self, text: str):
            for i, s in enumerate(text.split(".")):
                s = s.strip()
                if s:
                    yield s, i

    spark.udtf.register("split_sentences", SplitSentences)
    docs = spark.createDataFrame(
        [(1, "One. Two.  Three."), (2, "Only")], "doc_id long, text string"
    )
    docs.createOrReplaceTempView("_udtf_docs")
    got = spark.sql(
        "SELECT d.doc_id, s.sentence, s.idx "
        "FROM _udtf_docs d, LATERAL split_sentences(d.text) s"
    )
    rows = sorted(map(tuple, got.collect()))
    assert rows == [
        (1, "One", 0),
        (1, "Three", 2),
        (1, "Two", 1),
        (2, "Only", 0),
    ]
