"""SURVEY.md §2.L surface tests: the four UDF kinds added in
``functions/udfs.py`` agree with their built-in / JVM-side equivalents,
and §2.A IO round-trips (csv/json scan, partitioned parquet sink)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from time_series_spark_spark.functions.udfs import (
    ShinglesUDTF,
    embedding_norm_iter,
    token_count_pandas,
    value_band_expr,
    value_band_row_udf,
)
from time_series_spark_spark.sources.io import (
    from_rows,
    load,
    read_csv,
    read_json,
    read_orc,
    write_orc,
    write_parquet,
)

SF = "/root/testdata/sf0.001"


def test_row_udf_matches_expr_twin(spark):
    """L1: the discouraged row UDF and its codegen-friendly twin agree."""
    ev = load(spark, SF, "events").select("value").limit(500)
    both = ev.select(
        value_band_row_udf("value").alias("udf_band"),
        value_band_expr("value").alias("expr_band"),
    )
    assert both.filter(F.col("udf_band") != F.col("expr_band")).count() == 0


def test_scalar_pandas_udf_matches_builtin(spark):
    """L2: pandas token count == size(split(...))."""
    docs = load(spark, SF, "documents").select("text").limit(300)
    diff = docs.select(
        token_count_pandas("text").alias("a"),
        F.size(F.split("text", " ")).alias("b"),
    ).filter(F.col("a") != F.col("b"))
    assert diff.count() == 0


def test_iterator_pandas_udf_matches_aggregate_expr(spark):
    """L3: numpy norm == JVM-side higher-order-function norm."""
    emb = load(spark, SF, "embeddings").limit(200)
    jvm_norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    diff = emb.select(
        F.round(embedding_norm_iter("embedding"), 6).alias("a"),
        F.round(jvm_norm, 6).alias("b"),
    ).filter(F.abs(F.col("a") - F.col("b")) > 1e-6)
    assert diff.count() == 0


def test_udtf_shingles_lateral(spark):
    """L8: UDTF via LATERAL emits exactly len(tokens)-k+1 shingles."""
    spark.udtf.register("shingles_test", ShinglesUDTF)
    from_rows(
        spark,
        [(1, "a b c d e"), (2, "x y"), (3, "p q r")],
        "doc_id int, text string",
    ).createOrReplaceTempView("_sh_docs")
    rows = spark.sql(
        """
        SELECT d.doc_id, count(*) AS n
        FROM _sh_docs d, LATERAL shingles_test(d.text, 3) s
        GROUP BY d.doc_id ORDER BY d.doc_id
        """
    ).collect()
    # doc 2 has 2 tokens < k → no rows at all (UDTF yields nothing)
    assert [(r.doc_id, r.n) for r in rows] == [(1, 3), (3, 1)]


# --------------------------------------------------------------------------
# §2.A IO round-trips
# --------------------------------------------------------------------------
def test_csv_json_roundtrip(spark, tmp_path):
    """A2/A3: write a slice out as CSV and JSON-lines, read both back with
    an explicit schema, and get identical rows."""
    src = load(spark, SF, "nation")
    csv_dir, json_dir = str(tmp_path / "csv"), str(tmp_path / "json")
    src.write.mode("overwrite").option("header", "true").csv(csv_dir)
    src.write.mode("overwrite").json(json_dir)
    schema = "n_nationkey int, n_name string, n_regionkey int"
    back_csv = read_csv(spark, csv_dir, schema=schema)
    back_json = read_json(spark, json_dir, schema=schema)
    expect = sorted(map(tuple, src.collect()))
    assert sorted(map(tuple, back_csv.collect())) == expect
    assert sorted(map(tuple, back_json.collect())) == expect


def test_partitioned_parquet_sink(spark, tmp_path):
    """A4: partitionBy layout exists on disk and a partition-pruned read
    only returns that partition."""
    out = str(tmp_path / "by_flag")
    li = load(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    write_parquet(li, out, partition_by=["l_returnflag"])
    import os

    parts = {p for p in os.listdir(out) if p.startswith("l_returnflag=")}
    assert parts == {"l_returnflag=A", "l_returnflag=N", "l_returnflag=R"}
    pruned = spark.read.parquet(out).filter(F.col("l_returnflag") == "A")
    expect = li.filter(F.col("l_returnflag") == "A").count()
    assert pruned.count() == expect


def test_orc_roundtrip_partitioned(spark, tmp_path):
    """A2b/A4c: ORC round-trip preserves rows, partitionBy layout exists on
    disk, and a partition-filtered read prunes to that partition."""
    import os

    out = str(tmp_path / "orc_by_flag")
    li = load(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    write_orc(li, out, partition_by=["l_returnflag"])
    parts = {p for p in os.listdir(out) if p.startswith("l_returnflag=")}
    assert parts == {"l_returnflag=A", "l_returnflag=N", "l_returnflag=R"}
    back = read_orc(spark, out)
    assert sorted(map(tuple, back.select(*li.columns).collect())) == sorted(
        map(tuple, li.collect())
    )
    pruned = back.filter(F.col("l_returnflag") == "A")
    assert pruned.count() == li.filter(F.col("l_returnflag") == "A").count()


def test_events_nanos_shim(spark):
    """A1: events.ts arrives as a proper TimestampType spanning Jan 2024."""
    ev = load(spark, SF, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    assert lo.year == 2024 and hi.year == 2024


def test_parquet_schema_evolution_read(spark, tmp_path):
    """A2c: files written before a column existed read as NULL under the
    merged superset schema; newer files keep their values."""
    from time_series_spark_spark.sources.io import read_parquet_evolved

    out = str(tmp_path / "evolving")
    v1 = from_rows(spark, [(1, "a")], "id int, name string")
    v1.write.parquet(out + "/gen=1")
    v2 = from_rows(
        spark, [(2, "b", 9.5)], "id int, name string, score double"
    )
    v2.write.parquet(out + "/gen=2")
    back = read_parquet_evolved(spark, out)
    assert set(back.columns) == {"id", "name", "score", "gen"}
    got = {r.id: (r.name, r.score) for r in back.collect()}
    assert got == {1: ("a", None), 2: ("b", 9.5)}


def test_xml_roundtrip(spark, tmp_path):
    """A2d/A4d: XML round-trip via Spark 4's built-in XML source preserves
    rows and types survive re-inference for longs/strings (Avro is
    unavailable in this environment — external module jar, no network —
    so XML is the third interchange format beside CSV/JSON)."""
    from time_series_spark_spark.sources.io import read_xml, write_xml

    out = str(tmp_path / "nation_xml")
    nat = load(spark, SF, "nation").select("n_nationkey", "n_name")
    write_xml(nat, out, row_tag="nation", root_tag="nations")
    back = read_xml(spark, out, row_tag="nation")
    assert sorted(map(tuple, back.select("n_nationkey", "n_name").collect())) == sorted(
        map(tuple, nat.collect())
    )


def test_python_datasource_deterministic_and_prunes(spark):
    """A11: (1) output is bit-identical across shard counts (per-series
    rng); (2) pushed series_id predicates prune SHARDS at the reader —
    partitions() only plans the surviving ids; (3) source-filtered read
    ≡ post-filtered full read."""
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    from time_series_spark_spark.sources.pydatasource import (
        SyntheticSeriesReader,
        register_synthetic_source,
    )

    register_synthetic_source(spark)

    def read(n_shards):
        return (
            spark.read.format("synthetic_series")
            .option("n_series", 6)
            .option("points_per_series", 48)
            .option("seed", 3)
            .option("n_shards", n_shards)
            .load()
        )

    a = sorted(map(tuple, read(2).collect()))
    b = sorted(map(tuple, read(5).collect()))
    assert a == b and len(a) == 6 * 48

    # reader-level pruning: only ids in [2, 5) survive partition planning
    r = SyntheticSeriesReader(
        {"n_series": "6", "points_per_series": "48", "seed": "3",
         "n_shards": "4"}
    )
    leftover = list(
        r.pushFilters(
            [GreaterThanOrEqual(("series_id",), 2), LessThan(("series_id",), 5)]
        )
    )
    assert leftover == []  # both absorbed
    planned = sorted(
        sid for sh in r.partitions() for sid in sh.series_ids
    )
    assert planned == [2, 3, 4]

    # end-to-end: pushed filter ≡ engine-side filter on the full read
    import pyspark.sql.functions as F

    filtered = sorted(
        map(tuple, read(3).filter(F.col("series_id") >= 4).collect())
    )
    full = [t for t in a if t[0] >= 4]
    assert filtered == full


def test_synthetic_source_negation_filter_yielded_back(spark):
    """A pushed ``Not`` filter has no ``attribute`` field in pyspark 4.x —
    pushFilters must yield it back for Spark to re-apply, not raise
    AttributeError (ADVICE round-5 item). End-to-end: a != predicate on
    the source must read clean and match the engine-side filter."""
    from pyspark.sql.datasource import EqualTo, Not

    from time_series_spark_spark.sources.pydatasource import (
        SyntheticSeriesReader,
        register_synthetic_source,
    )

    r = SyntheticSeriesReader(
        {"n_series": "6", "points_per_series": "8", "seed": "3",
         "n_shards": "2"}
    )
    neg = Not(EqualTo(("series_id",), 3))
    leftover = list(r.pushFilters([neg]))
    assert leftover == [neg]  # yielded back, not absorbed, not crashed
    assert (r.lo, r.hi) == (0, 5)  # no bogus narrowing from the negation

    register_synthetic_source(spark)
    import pyspark.sql.functions as F

    got = (
        spark.read.format("synthetic_series")
        .option("n_series", 6).option("points_per_series", 8)
        .option("seed", 3).option("n_shards", 2)
        .load()
        .filter(F.col("series_id") != 3)
    )
    ids = {row["series_id"] for row in got.collect()}
    assert ids == {0, 1, 2, 4, 5}
