"""Z-order layout planning (operators/layout.py)."""


def _py_morton(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_key_matches_python(spark):
    from pyspark.sql import functions as F
    from whatsapp_vectordb_spark.operators.layout import morton_key

    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (1234, 4321)]
    df = spark.createDataFrame(rows, "x long, y long").select(
        "x", "y", morton_key(F.col("x"), F.col("y")).alias("z")
    )
    for r in df.collect():
        assert r["z"] == _py_morton(r["x"], r["y"])


def test_zorder_envelopes_tighter_than_single_column_sort(spark):
    """The point of Z-order: after splitting into files, BOTH dimensions
    have sub-range envelopes — a y-sorted layout leaves x spanning the
    full domain in every file."""
    import random

    from pyspark.sql import functions as F
    from whatsapp_vectordb_spark.operators.layout import zorder_file_stats

    rng = random.Random(11)
    rows = [(i, rng.randrange(256), rng.randrange(256)) for i in range(4096)]
    df = spark.createDataFrame(rows, "rid long, x long, y long")
    stats = zorder_file_stats(df, "x", "y", "rid", n_files=16, bits=8).collect()
    assert len(stats) == 16 and sum(r["n_rows"] for r in stats) == 4096
    # average per-file x-envelope must be well under the full 0..255 domain
    avg_x_span = sum(r["max_x"] - r["min_x"] for r in stats) / len(stats)
    avg_y_span = sum(r["max_y"] - r["min_y"] for r in stats) / len(stats)
    assert avg_x_span < 200 and avg_y_span < 200
