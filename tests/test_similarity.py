

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
