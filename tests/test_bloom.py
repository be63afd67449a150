from __future__ import annotations

from pyspark.sql import functions as F

from whatsapp_vectordb_spark.operators.bloom import bloom_might_contain, bloom_words


def test_bloom_no_false_negatives_and_low_fp(spark, sf_dir):
    import os

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    words = [(r["word"], r["bits"]) for r in bloom_words(urgent, "o_orderkey").collect()]

    # every member key must pass (Bloom invariant)
    n_urgent = urgent.count()
    n_pass_members = urgent.where(
        bloom_might_contain(words, F.col("o_orderkey"))
    ).count()
    assert n_pass_members == n_urgent

    # non-members mostly rejected (m=32768, k=4 at fixture cardinality)
    others = orders.where(F.col("o_orderpriority") != "1-URGENT")
    n_others = others.count()
    fp = others.where(bloom_might_contain(words, F.col("o_orderkey"))).count()
    assert fp / max(n_others, 1) < 0.05
