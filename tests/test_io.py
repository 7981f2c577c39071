"""IO tests: schema dump/load round-trips, CREATE TABLE generation,
CSV/JSON round-trips through explicit schemas."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from taps_spark.io import sources
from taps_spark.io.schema import create_table_sql, dump_schema, load_schema
from taps_spark.io.tables import load_table
from taps_spark.transfer.verify import compare


def test_schema_round_trip_all_fixture_tables(spark, sf_dir):
    from taps_spark.io.tables import TABLE_NAMES

    for name in TABLE_NAMES:
        schema = load_table(spark, sf_dir, name).schema
        assert load_schema(dump_schema(schema)) == schema, name


def test_schema_round_trip_nested():
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("emb", T.ArrayType(T.FloatType()), True),
            T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
            T.StructField(
                "nested", T.StructType([T.StructField("a", T.IntegerType(), True)]), True
            ),
        ]
    )
    assert load_schema(dump_schema(schema)) == schema


def test_create_table_sql_dialects(spark, sf_dir):
    schema = load_table(spark, sf_dir, "orders").schema
    pg = create_table_sql("orders", schema, "postgres", primary_key="o_orderkey")
    assert "o_orderkey BIGINT PRIMARY KEY" in pg
    assert "o_orderdate TIMESTAMP" in pg
    my = create_table_sql("orders", schema, "mysql")
    assert "o_orderdate DATETIME" in my
    lite = create_table_sql("orders", schema, "sqlite")
    assert "o_totalprice REAL" in lite
    with pytest.raises(KeyError):
        create_table_sql("orders", schema, "oracle9i")


def test_csv_round_trip(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    sources.write_csv(nation, path)
    back = sources.read_csv(spark, path, nation.schema)
    assert compare(nation, back).ok


def test_json_round_trip(spark, sf_dir, tmp_path):
    customer = load_table(spark, sf_dir, "customer")
    path = str(tmp_path / "customer_json")
    sources.write_json(customer, path)
    back = sources.read_json(spark, path, customer.schema)
    assert compare(customer, back).ok


def test_orc_round_trip(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    sources.write_orc(orders, path)
    back = sources.read_orc(spark, path)
    assert back.schema == orders.schema
    assert compare(orders, back).ok


def test_clustered_write_enables_stat_skipping(spark, sf_dir, tmp_path):
    """write_clustered must produce parquet files owning DISJOINT
    l_shipdate ranges (footer min/max stats), while a plain unsorted
    multi-file write makes every file span ~the whole domain — the
    difference between a range filter touching 1 file and all of them
    at 100 TB."""
    from taps_spark.io.layout import file_stat_ranges, write_clustered

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    clustered = str(tmp_path / "clustered")
    plain = str(tmp_path / "plain")
    write_clustered(li, clustered, ["l_shipdate"], num_files=8)
    li.repartition(8).write.mode("overwrite").parquet(plain)

    cr = sorted(file_stat_ranges(clustered, "l_shipdate"))
    pr = sorted(file_stat_ranges(plain, "l_shipdate"))
    assert len(cr) >= 4

    def overlaps(ranges):
        n = 0
        for i, (_, hi) in enumerate(ranges[:-1]):
            lo_next = ranges[i + 1][0]
            n += hi > lo_next
        return n

    # Range-partitioned files are disjoint (boundary duplicates at
    # most); random placement overlaps almost everywhere.
    assert overlaps(cr) == 0, cr
    assert overlaps(pr) >= len(pr) - 1, pr

    # And the round-trip result is identical.
    assert (
        spark.read.parquet(clustered).count()
        == spark.read.parquet(plain).count()
        == li.count()
    )


def test_zorder_write_bounds_both_dimensions(spark, sf_dir, tmp_path):
    """Z-ordered files must own a bounded range of BOTH columns
    (Morton boxes), while a single-column sort leaves the second
    column spanning ~the whole domain in every file — the difference
    between pruning on either predicate and only one."""
    from taps_spark.io.layout import file_stat_ranges, write_clustered, write_zordered

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(li, zpath, "l_orderkey", "l_partkey", num_files=16)
    write_clustered(li, spath, ["l_orderkey"], num_files=16)

    lo = li.agg({"l_partkey": "min"}).collect()[0][0]
    hi = li.agg({"l_partkey": "max"}).collect()[0][0]
    domain = hi - lo

    def avg_width(path):
        rs = file_stat_ranges(path, "l_partkey")
        assert len(rs) >= 8
        return sum(h - l for l, h in rs) / len(rs) / domain

    z_width, s_width = avg_width(zpath), avg_width(spath)
    # Single-col sort: partkey spans ~the full domain per file.
    assert s_width > 0.8, s_width
    # Z-order: materially bounded on the non-leading dimension too.
    assert z_width < 0.7 * s_width, (z_width, s_width)
    # Orderkey remains bounded as well (not a plain partkey sort).
    rs = file_stat_ranges(zpath, "l_orderkey")
    ok_lo = min(l for l, _ in rs)
    ok_hi = max(h for _, h in rs)
    assert sum(h - l for l, h in rs) / len(rs) / (ok_hi - ok_lo) < 0.6
    assert spark.read.parquet(zpath).count() == li.count()


def test_schema_evolution_merge_read(spark, tmp_path):
    """Old files (3 columns) and new files (4 columns) must read as
    one frame: the added column is NULL for pre-evolution rows, typed
    from the new footer, and projection pruning still applies."""
    from pyspark.sql import functions as F

    from taps_spark.io.sources import read_parquet_evolved

    v1 = spark.range(3).select(
        F.col("id"), F.lit("a").alias("src"), F.lit(1.5).alias("score")
    )
    v2 = spark.range(3, 6).select(
        F.col("id"), F.lit("b").alias("src"), F.lit(2.5).alias("score"),
        F.lit("en").alias("lang"),
    )
    p1, p2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    v1.write.parquet(p1)
    v2.write.parquet(p2)

    df = read_parquet_evolved(spark, p1, p2)
    assert set(df.columns) == {"id", "src", "score", "lang"}
    rows = {r["id"]: r["lang"] for r in df.collect()}
    assert all(rows[i] is None for i in range(3))
    assert all(rows[i] == "en" for i in range(3, 6))
    assert df.schema["lang"].dataType.typeName() == "string"


def test_compact_small_files_collapses_and_preserves(spark, sf_dir, tmp_path):
    """200 tiny files must compact to the byte-sized target count in
    one staged+swapped rewrite, with row-identical content and the
    requested clustering (disjoint per-file ranges) applied."""
    from taps_spark.io.layout import compact_small_files, file_stat_ranges

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(20000)
    p = str(tmp_path / "frag")
    li.repartition(200).write.parquet(p)
    import glob
    assert len(glob.glob(p + "/*.parquet")) == 200

    before = li.count()
    stats = compact_small_files(
        spark, p, target_file_bytes=256 * 1024, cluster_cols=["l_orderkey"]
    )
    assert stats["files_before"] == 200
    assert stats["files_after"] < 30
    got = spark.read.parquet(p)
    assert got.count() == before
    # clustering applied during compaction: file ranges mostly disjoint
    rs = sorted(file_stat_ranges(p, "l_orderkey"))
    overlaps = sum(1 for (a, b), (c, d) in zip(rs, rs[1:]) if c < b)
    assert overlaps <= len(rs) // 4


def test_audited_readers_quarantine_malformed_rows(spark, tmp_path):
    """PERMISSIVE + _corrupt_record must parse every clean row, carry
    every malformed line verbatim for quarantine, and never raise —
    the only acceptable ingestion failure mode at scale."""
    from taps_spark.io.sources import read_csv_audited, read_json_audited

    csv = tmp_path / "in.csv"
    csv.write_text("id,score\n1,2.5\n2,notanumber\n3,4.0\nthis,is,junk,extra\n")
    df = read_csv_audited(spark, str(csv), "id BIGINT, score DOUBLE")
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {(r["id"], r["score"]) for r in good} == {(1, 2.5), (3, 4.0)}
    assert len(bad) == 2
    assert any("notanumber" in r["_corrupt_record"] for r in bad)
    assert any("junk" in r["_corrupt_record"] for r in bad)

    js = tmp_path / "in.jsonl"
    js.write_text('{"id": 1, "score": 2.5}\n{broken json\n{"id": 2, "score": "NaNope"}\n')
    jf = read_json_audited(spark, str(js), "id BIGINT, score DOUBLE")
    jrows = jf.collect()
    jgood = [r for r in jrows if r["_corrupt_record"] is None]
    jbad = [r for r in jrows if r["_corrupt_record"] is not None]
    assert [(r["id"], r["score"]) for r in jgood] == [(1, 2.5)]
    assert len(jbad) == 2


# ---------- Python DataSource: keyset-chunked sqlite pull ----------


@pytest.fixture(scope="module")
def orders_sqlite(spark, sf_dir, tmp_path_factory):
    import os

    from taps_spark.io.pull_source import sqlite_from_parquet

    db = str(tmp_path_factory.mktemp("pull") / "orders.db")
    return sqlite_from_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        db,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
    )


def test_pull_source_round_trips_live_sqlite(spark, sf_dir, orders_sqlite):
    from taps_spark.io.pull_source import register_pull_source

    register_pull_source(spark)
    got = (
        spark.read.format("taps_pull")
        .option("path", orders_sqlite)
        .option("table", "orders")
        .option("pk", "o_orderkey")
        .option("chunk_rows", "400")
        .load()
    )
    # schema inferred from sqlite affinity
    assert dict(got.dtypes) == {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
    }
    expect = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))


def test_pull_source_keyset_chunks_are_exact(spark, orders_sqlite):
    from pyspark.sql.types import StructType

    from taps_spark.io.pull_source import SqlitePullDataSource, SqlitePullReader

    ds = SqlitePullDataSource(
        {"path": orders_sqlite, "table": "orders", "pk": "o_orderkey", "chunk_rows": "400"}
    )
    schema = ds.schema()
    assert isinstance(schema, StructType)
    reader = ds.reader(schema)
    parts = reader.partitions()
    # 1500 orders at sf0.001 → 4 chunks: 400/400/400/300
    counts = []
    for p in parts:
        counts.append(sum(b.num_rows for b in reader.read(p)))
    assert sum(counts) == 1500
    assert all(c == 400 for c in counts[:-1]) and counts[-1] <= 400
    # half-open ranges: chunk ends chain exactly (no gap, no overlap)
    for left, right in zip(parts, parts[1:]):
        assert left.hi == right.lo


def test_pull_source_pushes_pk_filter_into_chunk_planning(spark, orders_sqlite):
    from pyspark.sql.datasource import GreaterThan, StringStartsWith

    from taps_spark.io.pull_source import SqlitePullDataSource, register_pull_source

    ds = SqlitePullDataSource(
        {"path": orders_sqlite, "table": "orders", "pk": "o_orderkey", "chunk_rows": "400"}
    )
    reader = ds.reader(ds.schema())
    keep = list(
        reader.pushFilters(
            [GreaterThan(("o_orderkey",), 4000), StringStartsWith(("o_orderstatus",), "F")]
        )
    )
    # the pk comparison is absorbed; the string predicate is returned to Spark
    assert keep == [StringStartsWith(("o_orderstatus",), "F")]
    assert len(reader.partitions()) < 4  # planning narrowed, not post-filtered
    # end-to-end: the pushed predicate leaves no Filter residue in the plan
    register_pull_source(spark)
    df = (
        spark.read.format("taps_pull")
        .option("path", orders_sqlite)
        .option("table", "orders")
        .option("pk", "o_orderkey")
        .option("chunk_rows", "400")
        .load()
        .filter(F.col("o_orderkey") > 4000)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "4000" not in plan, plan
    assert df.count() == df.filter(F.col("o_orderkey") > 4000).count()


def test_xml_round_trip(spark, sf_dir, tmp_path):
    """Spark 4 built-in XML: write nation as XML, read it back with
    the same rowTag, and get identical rows."""
    from taps_spark.io.sources import read_xml, write_xml

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    path = str(tmp_path / "nation_xml")
    write_xml(nation.select("n_nationkey", "n_name"), path)
    back = read_xml(spark, path)
    assert sorted(back.columns) == ["n_name", "n_nationkey"]
    a = sorted(tuple(r) for r in back.select("n_nationkey", "n_name").collect())
    b = sorted(tuple(r) for r in nation.select("n_nationkey", "n_name").collect())
    assert a == b


def test_binary_file_source_reads_assets(spark, sf_dir):
    """binaryFile: every fixture parquet file arrives as one row with
    its on-disk length and a non-empty content column — the
    multimodal ingestion path."""
    from taps_spark.io.sources import read_binary_files

    df = read_binary_files(spark, sf_dir, glob="*.parquet")
    rows = df.selectExpr("path", "length", "length(content) AS n").collect()
    assert len(rows) == 10  # the ten fixture tables
    assert all(r.n == r.length and r.n > 0 for r in rows)


def test_avro_raises_actionable_error_without_jar(spark, sf_dir):
    """Without the external spark-avro jar the reader must fail with
    instructions, not a raw ClassNotFoundException."""
    import pytest

    from taps_spark.io.sources import read_avro

    with pytest.raises(NotImplementedError, match="spark-avro"):
        read_avro(spark, f"{sf_dir}/nation.avro")


def test_surrogate_keys_match_global_row_number(spark, sf_dir):
    """Two-phase distributed assignment must equal the single-node
    ROW_NUMBER() OVER (ORDER BY doc_id) - 1, with a dense gap-free
    range, across multiple range partitions."""
    from taps_spark.operators.keys import assign_surrogate_keys

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    keyed = assign_surrogate_keys(docs, "doc_id", num_partitions=7)
    rows = keyed.orderBy("doc_id").collect()
    ids = [r.sk for r in rows]
    assert ids == list(range(len(rows)))
    assert [r.doc_id for r in rows] == sorted(r.doc_id for r in rows)


def test_versioned_table_time_travel_and_rollback(spark, sf_dir, tmp_path):
    """Snapshot versions: current follows the latest commit, explicit
    versions time-travel, rollback is a pointer flip, and the
    manifest survives it all."""
    from taps_spark.io.versioned import read_version, rollback, versions, write_version

    table = str(tmp_path / "nation_versions")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")

    v1 = write_version(nation.filter("n_nationkey < 10"), table)
    v2 = write_version(nation, table)
    assert (v1, v2) == (1, 2)
    assert versions(table) == {"current": 2, "versions": [1, 2]}

    assert read_version(spark, table).count() == nation.count()
    assert read_version(spark, table, 1).count() == 10

    rollback(table, 1)
    assert read_version(spark, table).count() == 10
    assert read_version(spark, table, 2).count() == nation.count()

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_version(spark, table, 99)


def test_schema_drift_report(spark):
    """diff_schemas flags added / removed / retyped / nullability
    transitions and nothing else."""
    from pyspark.sql import types as T

    from taps_spark.io.schema import diff_schemas

    old = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("score", T.IntegerType(), True),
            T.StructField("legacy", T.StringType(), True),
        ]
    )
    new = T.StructType(
        [
            T.StructField("id", T.LongType(), True),       # nullability
            T.StructField("name", T.StringType(), True),   # unchanged
            T.StructField("score", T.DoubleType(), True),  # retyped
            T.StructField("added_at", T.TimestampType(), True),  # added
        ]
    )
    report = diff_schemas(old, new)
    by_col = {r["column"]: r for r in report}
    assert by_col["id"]["change"] == "nullability"
    assert by_col["score"] == {
        "column": "score", "change": "retyped", "old_type": "int", "new_type": "double"
    }
    assert by_col["added_at"]["change"] == "added"
    assert by_col["legacy"]["change"] == "removed"
    assert "name" not in by_col
