"""Round-8 optimization invariants.

The optimizations must be invisible to results:
- ``partitioning.grouped_stream`` (sorted streaming mapInPandas) must equal
  ``groupBy().applyInPandas`` exactly — including when one group spans
  multiple Arrow batches (the buffering path).
- ``dedup.km_minhash_batch`` (whole-batch vectorized KM minhash) must be
  byte-identical to the retained scalar reference ``_km_sig_doc``.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


SCHEMA = "k int, n long, s double, first_v double"


def test_grouped_stream_equals_apply_in_pandas(spark):
    from geo_raster_spark.partitioning import grouped_stream

    def _agg_fn(key, pdf):   # closure: pickled by value for the workers
        return pd.DataFrame([{
            "k": int(key[0]),
            "n": len(pdf),
            "s": float(pdf["v"].sum()),
            "first_v": float(pdf.sort_values("v")["v"].iloc[0]),
        }])

    # one giant group (9000 rows) guarantees Arrow-batch spanning at the
    # session's maxRecordsPerBatch=4096; plus many small groups
    df = (spark.range(0, 12000)
          .withColumn("k", F.when(F.col("id") < 9000, F.lit(7))
                            .otherwise((F.col("id") % 50).cast("int")))
          .withColumn("v", (F.col("id") * 13 % 997).cast("double")))

    got = grouped_stream(df, ["k"], _agg_fn, SCHEMA).toPandas() \
        .sort_values("k").reset_index(drop=True)
    ref = (df.repartition("k").groupBy("k")
             .applyInPandas(_agg_fn, schema=SCHEMA).toPandas()
             .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, ref)
    # the giant group must have been processed whole, not per batch
    expect = 9000 + sum(1 for i in range(9000, 12000) if i % 50 == 7)
    assert int(got.loc[got["k"] == 7, "n"].iloc[0]) == expect
    assert expect > 4096  # really spans multiple Arrow batches


def test_grouped_stream_multi_key_and_empty_results(spark):
    from geo_raster_spark.partitioning import grouped_stream

    def fn(key, pdf):
        if int(key[1]) == 0:        # empty-result groups must vanish
            return pd.DataFrame([], columns=["a", "b", "n"])
        return pd.DataFrame([{"a": int(key[0]), "b": int(key[1]),
                              "n": len(pdf)}])

    df = (spark.range(0, 1000)
          .withColumn("a", (F.col("id") % 7).cast("int"))
          .withColumn("b", (F.col("id") % 3).cast("int")))
    got = grouped_stream(df, ["a", "b"], fn, "a int, b int, n long") \
        .toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    ref = (df.groupBy("a", "b").agg(F.count("*").alias("n"))
             .where(F.col("b") != 0).toPandas()
             .sort_values(["a", "b"]).reset_index(drop=True))
    ref["a"] = ref["a"].astype("int32")
    ref["b"] = ref["b"].astype("int32")
    pd.testing.assert_frame_equal(got, ref)


@pytest.mark.parametrize("text", [
    "", "a", "abcd", "abcde", "hello world", "Ünïcode tëxt ê",
    "x" * 500, "the quick brown fox " * 40,
])
def test_km_minhash_batch_matches_scalar(text):
    from geo_raster_spark.operators.dedup import _km_sig_doc, km_minhash_batch

    batch = km_minhash_batch([text, "padding doc", text + "!"])
    assert np.array_equal(batch[0], _km_sig_doc(text))
    assert np.array_equal(batch[1], _km_sig_doc("padding doc"))
    assert np.array_equal(batch[2], _km_sig_doc(text + "!"))


def test_km_minhash_batch_fuzz():
    import random

    from geo_raster_spark.operators.dedup import _km_sig_doc, km_minhash_batch

    rng = random.Random(20260822)
    alphabet = "abcdefgh ijklmnop XYZ0123 äöü"
    texts = ["".join(rng.choice(alphabet)
                     for _ in range(rng.randint(0, 200)))
             for _ in range(200)]
    batch = km_minhash_batch(texts)
    for i, t in enumerate(texts):
        assert np.array_equal(batch[i], _km_sig_doc(t)), i
