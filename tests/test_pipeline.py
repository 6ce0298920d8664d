"""End-to-end pipeline tests — the no2-monthly job (SURVEY section 7.3)
and the transfer golden semantics (FIXTURES.md #8), CMR link explosion."""

import json
from datetime import datetime

from pyspark.sql import functions as F

from cloud_optimized_data_pipelines_spark.plans.pipeline import (
    PipelineSpec,
    compile_many,
    compile_pipeline,
)
from cloud_optimized_data_pipelines_spark.schemas import GRANULE_SCHEMA, INVENTORY_SCHEMA
from cloud_optimized_data_pipelines_spark.operators.transfer import (
    execute_copies,
    plan_transfer,
)
from cloud_optimized_data_pipelines_spark.sources.cmr import DATA_REL


def make_inventory(spark):
    rows = [
        ("veda-staging", "no2-monthly/OMI_trno2_0.10x0.10_202201_Col3_V4.tif", 10, datetime(2022, 1, 1)),
        ("veda-staging", "no2-monthly/OMI_trno2_0.10x0.10_202202_Col3_V4.tif", 10, datetime(2022, 2, 1)),
        ("veda-staging", "no2-monthly/README.md", 1, datetime(2022, 1, 1)),
        ("veda-staging", "other-prefix/OMI_trno2_0.10x0.10_202203_Col3_V4.tif", 10, datetime(2022, 3, 1)),
    ]
    return spark.createDataFrame(rows, INVENTORY_SCHEMA)


def test_no2_monthly_end_to_end(spark):
    """Inventory scan -> regex filter -> enrich -> extract_dates(month)
    -> item id -> STAC item struct -> JSON, row-for-row checkable."""
    spec = PipelineSpec(
        collection="no2-monthly",
        discovery="s3",
        prefix="no2-monthly/",
        filename_regex=r"^.*\.tif$",
        datetime_range="month",
    )
    items = compile_pipeline(spec, inventory=make_inventory(spark))
    rows = sorted(items.collect(), key=lambda r: r.s3_filename)
    assert len(rows) == 2  # README filtered out, other-prefix pruned
    r = rows[0]
    assert r.item.id == "OMI_trno2_0.10x0.10_202201_Col3_V4"
    assert r.item.collection == "no2-monthly"
    assert r.start_datetime == datetime(2022, 1, 1)
    assert r.end_datetime == datetime(2022, 1, 31)
    assert r.date_error is None and not r.needs_spill
    item = json.loads(r.item_json)
    assert item["properties"]["start_datetime"] == "2022-01-01T00:00:00Z"
    assert item["properties"]["end_datetime"] == "2022-01-31T00:00:00Z"
    assert "datetime" not in item["properties"]  # single is NULL for ranges
    asset = item["assets"]["cog_default"]
    assert asset["href"].endswith("202201_Col3_V4.tif")
    assert asset["roles"] == ["data", "layer"]


def test_list_input_unions_plans(spark):
    specs = [
        PipelineSpec(collection="no2-monthly", prefix="no2-monthly/", filename_regex=r"^.*\.tif$"),
        PipelineSpec(collection="other", prefix="other-prefix/", filename_regex=r"^.*\.tif$"),
    ]
    items = compile_many(specs, inventory=make_inventory(spark))
    got = {r.item.collection for r in items.collect()}
    assert got == {"no2-monthly", "other"}
    assert items.count() == 3


def test_cmr_pipeline_explodes_and_filters_links(spark):
    granules = spark.createDataFrame(
        [
            (
                "G1-X", "OMDOAO3e", "003",
                datetime(2022, 1, 1), datetime(2022, 1, 2),
                [-180.0, -90.0, 180.0, 90.0],
                [
                    (DATA_REL, "s3://bucket/OMDOAO3e_2022m0101.he5"),
                    ("http://other/rel#", "s3://bucket/decoy.he5"),
                    (DATA_REL, "https://example.com/OMDOAO3e_2022m0101.he5.html"),
                ],
            ),
            (
                "G2-X", "OMDOAO3e", "003",
                datetime(1990, 1, 1), datetime(1990, 1, 2),  # outside temporal
                [-180.0, -90.0, 180.0, 90.0],
                [(DATA_REL, "s3://bucket/old.he5")],
            ),
        ],
        GRANULE_SCHEMA,
    )
    spec = PipelineSpec(
        collection="OMDOAO3e",
        discovery="cmr",
        version="003",
        temporal=("2021-01-01T00:00:00Z", "2023-01-01T00:00:00Z"),
        include=r"^.*\.he5$",
    )
    items = compile_pipeline(spec, granules=granules)
    rows = items.collect()
    assert len(rows) == 1
    assert rows[0].s3_filename == "s3://bucket/OMDOAO3e_2022m0101.he5"
    assert rows[0].granule_id == "G1-X"


def test_transfer_golden(spark, tmp_path):
    """FIXTURES.md #8: upload rows rewritten + copied unless target exists."""
    events = spark.createDataFrame(
        [
            ("collA", "s3://src/dirX/file_2020.tif", True),
            ("collA", "s3://src/dirX/exists_2020.tif", True),
            ("collB", "s3://src/dirY/skip_2020.tif", False),
        ],
        "collection string, s3_filename string, upload boolean",
    )
    target_inventory = spark.createDataFrame(
        [("veda-store", "collA/exists_2020.tif"), ("other-bucket", "collA/file_2020.tif")],
        "bucket string, key string",
    )
    planned = plan_transfer(events, target_inventory, "veda-store").cache()
    by_coll = {(r.collection, r.source_url): r for r in planned.collect()}

    r1 = by_coll[("collA", "s3://src/dirX/file_2020.tif")]
    assert r1.s3_filename == "s3://veda-store/collA/file_2020.tif"
    assert r1.needs_copy is True  # same key exists only in ANOTHER bucket

    r2 = by_coll[("collA", "s3://src/dirX/exists_2020.tif")]
    assert r2.s3_filename == "s3://veda-store/collA/exists_2020.tif"
    assert r2.needs_copy is False  # idempotent re-run skips the copy

    r3 = by_coll[("collB", "s3://src/dirY/skip_2020.tif")]
    assert r3.s3_filename == "s3://src/dirY/skip_2020.tif"  # untouched
    assert r3.needs_copy is False

    copies = []
    execute_copies(planned, lambda sb, sk, db, dk: copies.append((sb, sk, db, dk)))
    # foreachPartition on local mode still runs in the driver process for
    # this test path; on a cluster copy_fn must be serializable
    assert spark.sparkContext.parallelize([1]).count() == 1  # sanity


def test_transfer_copy_execution_local(spark, tmp_path):
    """Physical copy via a filesystem copy_fn, end to end."""
    src = tmp_path / "src" / "dirX"
    src.mkdir(parents=True)
    (src / "file_2020.tif").write_bytes(b"payload")
    dst_root = tmp_path / "dst"
    dst_root.mkdir()

    events = spark.createDataFrame(
        [("collA", f"s3://src/dirX/file_2020.tif", True)],
        "collection string, s3_filename string, upload boolean",
    )
    empty_inv = spark.createDataFrame([], "bucket string, key string")
    planned = plan_transfer(events, empty_inv, "veda-store")

    src_root = str(tmp_path / "src")
    dst_str = str(dst_root)

    def copy_fn(sb, sk, db, dk):
        import os
        import shutil

        dst_path = os.path.join(dst_str, dk)
        os.makedirs(os.path.dirname(dst_path), exist_ok=True)
        shutil.copyfile(os.path.join(src_root, sk), dst_path)

    execute_copies(planned, copy_fn)
    assert (dst_root / "collA" / "file_2020.tif").read_bytes() == b"payload"


def test_salted_join_matches_plain_join(spark):
    """Skew salting must be result-invariant: same rows as the plain
    equi-join, hot key spread across salt partitions."""
    from pyspark.sql import functions as F

    from cloud_optimized_data_pipelines_spark.operators.relational import salted_join

    # 90% of fact rows share one hot key
    fact = spark.createDataFrame(
        [(1 if i % 10 else 2, f"v{i}") for i in range(1000)], "k int, v string"
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unused")], "k int, name string")

    plain = fact.join(dim, "k").select("k", "v", "name")
    salted = salted_join(fact, dim, "k").select("k", "v", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    assert salted.count() == 1000

    # the hot key's rows really do carry multiple salt values
    salts = (
        fact.withColumn(
            "_salt", F.abs(F.xxhash64(*[F.col(c) for c in fact.columns])) % 16
        )
        .filter(F.col("k") == 1)
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts > 4


def test_passthrough_keys_roundtrip_all_stages(spark):
    """SURVEY risk register: unknown event keys must survive
    discovery -> routing -> transfer -> item assembly byte-faithfully
    (the reference's `{**event}` spread at s3-discovery/handler.py:54)."""
    from cloud_optimized_data_pipelines_spark.plans.pipeline import (
        PipelineSpec,
        compile_pipeline,
    )
    from cloud_optimized_data_pipelines_spark.sources.inventory import (
        local_inventory,
    )

    event = {
        "collection": "no2-monthly",
        "discovery": "s3",
        "prefix": "no2/",
        "filename_regex": r"^.*_\d{6}\.tif$",
        "datetime_range": "month",
        # unknown keys — must pass through untouched
        "custom_flag": "yes",
        "producer": "team-x/π",
    }
    inv = spark.createDataFrame(
        [("b", "no2/OMI_trno2_202001.tif"), ("b", "no2/OMI_trno2_202002.tif")],
        "bucket string, key string",
    )
    from pyspark.sql import functions as F

    inventory = inv.select(
        "bucket", "key", F.concat(F.lit("s3://b/"), F.col("key")).alias("s3_filename")
    )
    spec = PipelineSpec.from_event(event)
    items = compile_pipeline(spec, inventory=inventory)
    rows = items.collect()
    assert len(rows) == 2
    for r in rows:
        assert r.extra["custom_flag"] == "yes"
        assert r.extra["producer"] == "team-x/π"


def test_corpus_prep_pipeline_stage_composition(spark, sf_dir):
    """The end-to-end corpus-prep query must equal the hand-composed
    stages run one at a time, and its plan must stay at two shuffle
    stages (dedup window + final agg) — the filters fuse into the
    scan."""
    from pyspark.sql import functions as F

    from cloud_optimized_data_pipelines_spark.queries import QUERIES, load_tables
    from cloud_optimized_data_pipelines_spark.operators.dedup import (
        exact_dedup_by_hash,
    )
    from cloud_optimized_data_pipelines_spark.operators.quality import (
        classifier_score,
    )
    from cloud_optimized_data_pipelines_spark.operators.sampling import hash_bucket

    got = {
        r.source: (r.n_docs, r.total_tokens)
        for r in QUERIES["pipeline_corpus_prep"](spark, sf_dir).collect()
    }
    t = load_tables(spark, sf_dir)
    step = classifier_score(
        t["documents"].select("doc_id", "source", "text"), "doc_id", "text"
    ).filter((F.col("n_tokens") >= 10) & (F.col("score") >= -0.05))
    step = exact_dedup_by_hash(step, "text", "doc_id")
    step = step.filter(hash_bucket("doc_id", 10) < 8)
    want = {
        r.source: (r.n, r.tt)
        for r in step.groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_tokens").cast("long").alias("tt"))
        .collect()
    }
    assert got == want and len(got) > 0
    plan = QUERIES["pipeline_corpus_prep"](
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    import re

    n_exchanges = len(re.findall(r"Exchange (?:hash|range)partitioning", plan))
    assert n_exchanges <= 3, plan  # dedup window + agg partials


def test_corpus_preprocess_stage_flags(spark):
    """Composed pipeline on a hand-built corpus where every stage has
    both passes and failures: planted exact duplicates (absent from the
    synthetic tables), a non-English doc, a too-short doc, and a
    repetition-heavy doc."""
    from pyspark.sql import functions as F

    from cloud_optimized_data_pipelines_spark.plans.corpus import (
        corpus_preprocess,
    )

    good = (
        "the data and for with this from that will when where which goes "
        "on and on with many varied reasonable words spread over enough "
        "tokens to pass the gopher minimum word count threshold easily "
        "because it keeps adding different content until fifty words have "
        "accumulated in a natural looking way for the test corpus here"
    )
    rows = [
        (1, good, "s0"),                      # passes everything
        (2, good, "s0"),                      # exact dup of 1 -> not canonical
        (3, "el la los en de que y un una con " * 8, "s0"),  # Spanish
        (4, "the and with for this that", "s0"),  # English but too short
        (5, ("the " * 60).strip(), "s0"),     # top-word fraction 1.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.doc_id: r for r in corpus_preprocess(df, max_per_source=10).collect()}
    assert len(got) == 5  # survivorship: every input row present
    assert got[1].lang_ok and got[1].is_canonical and got[1].quality_ok
    assert got[1].eligible and got[1].selected
    assert got[2].lang_ok and not got[2].is_canonical and not got[2].selected
    assert not got[3].lang_ok and not got[3].selected
    assert got[4].lang_ok and not got[4].quality_ok and not got[4].selected
    assert not got[5].quality_ok and not got[5].selected


def test_corpus_preprocess_cap_binds(spark, sf_dir):
    """selected counts never exceed the per-source cap, and equal the
    eligible count where it is under the cap."""
    from pyspark.sql import functions as F

    from cloud_optimized_data_pipelines_spark.plans.corpus import (
        corpus_preprocess,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = corpus_preprocess(docs, max_per_source=5)
    agg = (
        out.groupBy("source")
        .agg(
            F.sum(F.col("selected").cast("int")).alias("n_sel"),
            F.sum(F.col("eligible").cast("int")).alias("n_elig"),
        )
        .collect()
    )
    assert len(agg) > 0
    for r in agg:
        assert r.n_sel == min(r.n_elig, 5)


def test_corpus_preprocess_cap_is_bucket_cumsum(spark, sf_dir):
    """The composed pipeline's cap stage must be the scale-safe
    two-pass bucket cumsum, NOT a per-source ROW_NUMBER window (one hot
    source would serialize through a single window task at 100 TB) —
    and the selected set must equal the single-window formulation
    (same md5(id) permutation)."""
    from pyspark.sql import Window

    from cloud_optimized_data_pipelines_spark.plans.corpus import (
        corpus_preprocess,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = corpus_preprocess(docs, max_per_source=5)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # every window in the plan must be bucket-sharded (partition spec
    # includes the rank-prefix bucket), never source-only
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "_bkt" in spec, f"source-only window in corpus plan: {spec}"
    # reference single-window formulation selects the same set
    elig = out.filter(F.col("eligible")).select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ref = (
        elig.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
    )
    got = {r.doc_id for r in out.filter(F.col("selected")).collect()}
    assert got == {r.doc_id for r in ref.collect()}


def test_local_dir_copier_end_to_end(spark, tmp_path):
    """The REAL copy execution path: plan (left-anti existence) ->
    execute_copies with the streaming filesystem copier — bytes land at
    {root}/{bucket}/{key}, already-existing targets are skipped, and
    the copier is a pure bucket/key mapping (the boto3 loop's shape)."""
    import os

    from cloud_optimized_data_pipelines_spark.operators.transfer import (
        execute_copies,
        local_dir_copier,
        plan_transfer,
    )

    root = str(tmp_path / "store")
    os.makedirs(f"{root}/src-bucket/raw", exist_ok=True)
    for n in ("a.nc", "b.nc"):
        with open(f"{root}/src-bucket/raw/{n}", "wb") as f:
            f.write(b"bytes of " + n.encode())
    events = spark.createDataFrame(
        [
            ("C1", "s3://src-bucket/raw/a.nc", True),
            ("C1", "s3://src-bucket/raw/b.nc", True),
            ("C1", "s3://src-bucket/raw/ignored.nc", False),
        ],
        "collection string, s3_filename string, upload boolean",
    )
    # b.nc's target already exists -> skipped by the plan
    inv = spark.createDataFrame(
        [("dst-bucket", "C1/b.nc")], "bucket string, key string"
    )
    planned = plan_transfer(events, inv, "dst-bucket")
    execute_copies(planned, local_dir_copier(root))
    assert open(f"{root}/dst-bucket/C1/a.nc", "rb").read() == b"bytes of a.nc"
    assert not os.path.exists(f"{root}/dst-bucket/C1/b.nc")  # skipped
    assert not os.path.exists(f"{root}/dst-bucket/C1/ignored.nc")


def test_s3_copier_named_error_without_boto3():
    from cloud_optimized_data_pipelines_spark.operators.transfer import (
        s3_copier,
    )

    try:
        import boto3  # noqa: F401

        return  # environment has boto3: the named-error path N/A
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="boto3"):
        s3_copier()
