

def test_embedding_outliers_finds_planted_garbage(spark):
    """A degenerate vector (one dimension railed) must top the screen;
    the z2 score is deterministic (exact integer moments) and repeat
    runs are identical."""
    import numpy as np

    from cloud_optimized_data_pipelines_spark.operators.similarity import (
        embedding_outliers,
    )

    rng = np.random.default_rng(0)
    rows = [
        (int(i), [float(x) for x in rng.normal(0, 0.1, 8)])
        for i in range(200)
    ]
    bad = [0.0] * 8
    bad[3] = 0.49  # railed dimensions ~5 sigma out
    bad[5] = -0.49
    bad[7] = 0.49
    rows.append((999, bad))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = embedding_outliers(df, "vec_id", "embedding", top_k=5).collect()
    assert out[0]["vec_id"] == 999
    assert out[0]["n_extreme_dims"] >= 1
    out2 = embedding_outliers(df, "vec_id", "embedding", top_k=5).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in out2]
    # zero-variance guard: constant dimension contributes 0, not NaN
    cdf = spark.createDataFrame(
        [(1, [1.0, 0.5]), (2, [1.0, -0.5])],
        "vec_id long, embedding array<float>",
    )
    res = embedding_outliers(cdf, "vec_id", "embedding", top_k=2).collect()
    assert all(r["z2_score"] == r["z2_score"] for r in res)  # no NaN


def test_embedding_outliers_int64_headroom(spark):
    """r10 ADVICE: moment sums must not silently wrap int64.  (a) a
    9M-row-equivalent magnitude is now exact (DECIMAL(38,0) sums);
    proxied by components whose squares sum past 2^63 within a few
    rows.  (b) a component so large its quantization would saturate
    Java's double->long cast raises loudly instead of diverging from
    the (erroring) oracle."""
    import pytest as _pytest

    from cloud_optimized_data_pipelines_spark.operators.similarity import (
        embedding_outliers,
    )

    # (a) per-dim sum(x^2) = 4 * (3.5e12)^2 ~ 4.9e25 >> 2^63: the old
    # BIGINT sum wrapped (negative variance -> NaN/garbage order);
    # decimal sums keep variance finite and non-negative.
    big = [
        (1, [3.5e6, 0.0]), (2, [-3.5e6, 0.0]),
        (3, [3.5e6, 1.0]), (4, [-3.5e6, -1.0]),
    ]
    bdf = spark.createDataFrame(big, "vec_id long, embedding array<double>")
    out = embedding_outliers(bdf, "vec_id", "embedding", top_k=4).collect()
    assert len(out) == 4
    assert all(r["z2_score"] >= 0.0 for r in out)
    # (b) quantized |component| >= 2^62 -> loud failure, not silent
    # divergence: ANSI (Spark 4 default) raises CAST_OVERFLOW at the
    # quantization cast; non-ANSI saturates there and trips the
    # assert_true headroom guard instead.
    sat = spark.createDataFrame(
        [(1, [1.0e13, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(Exception, match="int64 headroom|CAST_OVERFLOW"):
        embedding_outliers(sat, "vec_id", "embedding", top_k=2).collect()
