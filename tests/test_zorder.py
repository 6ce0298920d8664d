"""Z-order clustering: footer-verified multi-dimension file skipping."""

import pyspark.sql.functions as F
import pytest

from cloud_optimized_data_pipelines_spark.operators.zorder import (
    file_ranges,
    files_matching,
    morton_code,
    write_zorder_clustered,
)
from cloud_optimized_data_pipelines_spark.sinks import write_range_clustered

N_FILES = 16
SIDE = 256  # x,y uniform over [0, SIDE)


@pytest.fixture(scope="module")
def grid(spark):
    # 64k points on a 256x256 grid, shuffled order (id bit-mixed) so
    # neither dimension is accidentally pre-sorted
    return spark.range(SIDE * SIDE).select(
        (F.col("id") % SIDE).alias("x"),
        (F.col("id") / SIDE).cast("long").alias("y"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )


def test_morton_code_orders_locally(spark):
    """Known interleavings: (x=1,y=0)->1, (x=0,y=1)->2, (x=3,y=5)->39."""
    rows = spark.createDataFrame(
        [(1, 0), (0, 1), (3, 5)], "x long, y long"
    ).select(morton_code([F.col("x"), F.col("y")], bits=4).alias("z"))
    assert [r["z"] for r in rows.collect()] == [1, 2, 39]


def test_zorder_prunes_both_dimensions(spark, grid, tmp_path):
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    write_zorder_clustered(grid, zpath, ("x", "y"), num_files=N_FILES, bits=8)
    write_range_clustered(grid, lpath, ("x",), num_files=N_FILES)

    # a 1/16-wide point-range predicate on each dim
    probe = (0, SIDE // 16 - 1)
    for dim in ("x", "y"):
        zr = file_ranges(zpath, dim)
        assert len(zr) == N_FILES
        touched = len(files_matching(zr, *probe))
        # Morton layout: ~sqrt(N_FILES) files per thin slab; allow 2x
        assert touched <= 2 * int(N_FILES**0.5), (dim, touched)

    # linear layout prunes the lead dim but must touch (nearly) every
    # file for the second dim — the gap z-ordering closes
    lr_x = files_matching(file_ranges(lpath, "x"), *probe)
    lr_y = files_matching(file_ranges(lpath, "y"), *probe)
    assert len(lr_x) <= 2
    assert len(lr_y) >= N_FILES - 1


def test_zorder_write_roundtrips_all_rows(spark, grid, tmp_path):
    path = str(tmp_path / "zorder_rt")
    write_zorder_clustered(grid, path, ("x", "y"), num_files=4, bits=8)
    back = spark.read.parquet(path)
    assert back.count() == SIDE * SIDE
    assert back.agg(F.sum("x"), F.sum("y")).first() == grid.agg(
        F.sum("x"), F.sum("y")
    ).first()
    assert "__z" not in back.columns


def test_zorder_plan_stays_jvm_side(grid):
    """The morton expression must not fall out of codegen into Python."""
    z = grid.select(
        morton_code([F.col("x"), F.col("y")], bits=8).alias("z")
    )
    plan = z._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_quantile_cells_survive_skew(spark, tmp_path):
    """On a heavily skewed column, equal-WIDTH cells collapse (most
    rows share cell 0 → no curve resolution → a probe in the dense
    region touches every file); equal-POPULATION (quantile) cells keep
    pruning."""
    from cloud_optimized_data_pipelines_spark.operators.zorder import (
        write_zorder_quantile,
    )

    df = spark.range(65536).select(
        # zipf-ish: x = 1e6/(k+1) concentrates mass at small values
        (F.lit(1_000_000) / (F.col("id") % 4096 + 1)).cast("long").alias("x"),
        (F.col("id") % 256).alias("y"),
        F.md5(F.col("id").cast("string")).alias("pay"),
    )
    wpath, qpath = str(tmp_path / "w"), str(tmp_path / "q")
    write_zorder_clustered(df, wpath, ("x", "y"), num_files=N_FILES, bits=8)
    write_zorder_quantile(df, qpath, ("x", "y"), num_files=N_FILES, bits=8)

    probe = (240, 260)  # thin slab inside the dense low-x region
    width_touch = len(files_matching(file_ranges(wpath, "x"), *probe))
    quant_touch = len(files_matching(file_ranges(qpath, "x"), *probe))
    assert width_touch == N_FILES  # equal-width layout degenerated
    assert quant_touch <= N_FILES // 2  # quantile layout still prunes

    # the uniform dimension keeps pruning under either layout
    for p in (wpath, qpath):
        assert len(files_matching(file_ranges(p, "y"), 0, 15)) <= 2 * int(
            N_FILES**0.5
        )
