from __future__ import annotations

from pyspark.sql import functions as F


def test_weighted_mix_hits_target_proportions(spark, documents):
    from whatsapp_vectordb_spark.operators.sampling import weighted_mix

    docs = documents.select("doc_id", "lang")
    weights = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}
    out = weighted_mix(docs, weights, group_col="lang", id_col="doc_id")
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    orig = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}

    # the binding (scarcest relative to its weight) group keeps ~everything
    lam = min(orig[g] / w for g, w in weights.items())
    binding = min(weights, key=lambda g: orig[g] / weights[g])
    assert got[binding] >= 0.9 * orig[binding]
    # every group lands near its λ-scaled target (hash-bucket granularity
    # on a small fixture: allow a generous band)
    for g, w in weights.items():
        target = min(orig[g], lam * w)
        assert abs(got.get(g, 0) - target) <= max(5, 0.35 * target), (g, got.get(g), target)
    # membership is deterministic
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in weighted_mix(docs, weights, "lang", "doc_id").collect()}
    assert a == b


def test_weighted_mix_drops_unlisted_groups(spark, documents):
    from whatsapp_vectordb_spark.operators.sampling import weighted_mix

    docs = documents.select("doc_id", "lang")
    out = weighted_mix(docs, {"en": 1.0}, group_col="lang", id_col="doc_id")
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    # sole group with weight 1 -> keeps everything (rate 1.0)
    assert out.count() == docs.where(F.col("lang") == "en").count()


def test_temperature_mix_flattens_toward_small_groups(spark, documents):
    from whatsapp_vectordb_spark.operators.sampling import temperature_mix

    docs = documents.select("doc_id", "lang")
    before = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    out = temperature_mix(docs, group_col="lang", id_col="doc_id")
    after = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    nmin = min(before.values())
    smallest = min(before, key=before.get)
    # scarcest group keeps everything
    assert after[smallest] == before[smallest]
    for g, n in before.items():
        # expected survivors ~ n * sqrt(nmin/n) = sqrt(nmin * n); hash
        # sampling is binomial around it
        import math
        expect = math.sqrt(nmin * n)
        assert abs(after[g] - expect) <= max(6, 0.35 * expect), (g, after[g], expect)
    # ratios flattened: biggest/smallest ratio strictly shrinks
    big = max(before, key=before.get)
    assert after[big] / after[smallest] < before[big] / before[smallest]
