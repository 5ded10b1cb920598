"""Medallion writer tests: layout, zstd, and the K4 idempotency contract."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from portfolio_data_pipelines_spark.operators.medallion import write_bronze
from portfolio_data_pipelines_spark.schemas import WEATHER_BRONZE


def _batch(spark, day: int, n: int = 4, temp: float = 20.0):
    rows = [
        (
            dt.datetime(2025, 8, day, h),
            temp + h,
            50.0,
            "-23.55",
            "-46.63",
            dt.datetime(2025, 8, day, 12),
        )
        for h in range(n)
    ]
    return spark.createDataFrame(rows, schema=WEATHER_BRONZE)


class TestBronzeWriter:
    def test_hive_layout_and_zstd(self, spark, tmp_path):
        path = str(tmp_path / "bronze")
        write_bronze(_batch(spark, day=20), path)
        # Hive-style date= directories (K2 parity)
        assert any(d.startswith("date=2025-08-20") for d in os.listdir(path))
        part_dir = os.path.join(path, "date=2025-08-20")
        files = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
        assert len(files) == 1  # one file per day per batch, like the reference
        assert ".zstd." in files[0]

    def test_dynamic_overwrite_only_touches_batch_days(self, spark, tmp_path):
        path = str(tmp_path / "bronze2")
        write_bronze(_batch(spark, day=20), path)
        write_bronze(_batch(spark, day=21), path)
        df = spark.read.parquet(path)
        assert df.count() == 8  # day-21 write did not clobber day-20

    def test_rerun_same_day_idempotent(self, spark, tmp_path):
        path = str(tmp_path / "bronze3")
        write_bronze(_batch(spark, day=20, temp=20.0), path)
        write_bronze(_batch(spark, day=20, temp=30.0), path)  # reprocess day
        df = spark.read.parquet(path)
        assert df.count() == 4  # replaced, not appended
        assert df.agg(F.min("temperature_2m")).first()[0] == 30.0


def test_bronze_date_filter_prunes_partitions(spark, tmp_path):
    """A date predicate on the bronze lake must prune at the partition
    level (PartitionFilters in the scan), not post-filter rows — the
    property that makes day-scoped queries O(day) instead of O(lake)."""
    from pyspark.sql import functions as F

    from portfolio_data_pipelines_spark.operators.medallion import write_bronze
    from portfolio_data_pipelines_spark.sources.parquet import scan_table

    out = str(tmp_path / "bronze_prune")
    write_bronze(
        scan_table(spark, "/root/testdata/sf0.001", "events"),
        out, partition_col="date", derive_from="ts",
    )
    one_day = spark.read.parquet(out).filter(F.col("date") == "2024-01-05")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # The predicate lands in PartitionFilters (directory-level pruning),
    # not DataFilters (row-level post-filtering).
    assert "PartitionFilters: [isnotnull(date" in plan
    assert "= 2024-01-05)" in plan.split("PartitionFilters:")[1].split("]")[0]
    assert one_day.count() > 0


def test_compact_partition_merges_small_files(spark, tmp_path):
    from pyspark.sql import functions as F

    from portfolio_data_pipelines_spark.operators.medallion import compact_partition
    from portfolio_data_pipelines_spark.sources.parquet import scan_table

    out = str(tmp_path / "frag")
    src = scan_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "date", F.to_date("ts")
    )
    one_day = src.filter(F.col("date") == "2024-01-05")
    # Fragment: 8 separate appends → ≥8 files in the partition.
    for _ in range(8):
        one_day.coalesce(1).write.mode("append").partitionBy("date").parquet(out)
    # Materialize the pre-compaction rows: the lazy plan would re-list
    # files after the rewrite deleted them.
    before_rows = sorted(map(tuple, spark.read.parquet(out).collect()))

    n_files = compact_partition(spark, out, "date", "2024-01-05")
    after = spark.read.parquet(out)
    assert n_files == 1  # tiny partition → single file
    assert sorted(map(tuple, after.collect())) == before_rows  # no rows lost


def test_bronze_uri_scheme_bucket_layout(spark, tmp_path):
    """K2 end-to-end through an explicit URI scheme: writing to a
    file:// "bucket" exercises the same Hadoop FileSystem abstraction an
    s3a:// target uses (scheme -> FS impl resolution, qualified-path key
    construction); only the FS implementation differs. Asserts the
    Hive-key layout and a round-trip read through the same URI."""
    bucket = f"file://{tmp_path}/lake-bucket/weather"
    write_bronze(_batch(spark, day=22), bucket)
    local = str(tmp_path / "lake-bucket" / "weather")
    part_dir = os.path.join(local, "date=2025-08-22")
    assert os.path.isdir(part_dir), os.listdir(local)
    assert any(f.endswith(".parquet") for f in os.listdir(part_dir))
    back = spark.read.parquet(bucket)
    assert back.count() == 4
    assert set(back.select("date").distinct().toPandas()["date"].astype(str)) == {"2025-08-22"}


class TestJdbcWarehouse:
    """K4 over JDBC, driven end-to-end against embedded Derby — the one
    JDBC engine whose driver ships inside pyspark's jars. Covers table
    creation, the delete-then-append upsert, idempotent re-runs, and
    the identifier guard."""

    URL_TMPL = "jdbc:derby:{db};create=true"

    def _ddl(self, spark, url: str, sql: str) -> None:
        jvm = spark._jvm
        conn = jvm.java.sql.DriverManager.getConnection(url)
        try:
            st = conn.createStatement()
            st.executeUpdate(sql)
            st.close()
        finally:
            conn.close()

    def test_upsert_roundtrip_idempotent(self, spark, tmp_path):
        import pytest

        from portfolio_data_pipelines_spark.operators.medallion import write_warehouse_jdbc

        url = self.URL_TMPL.format(db=tmp_path / "derbydb")
        # `time` is reserved in Derby; the warehouse column is ts there.
        self._ddl(
            spark, url,
            "CREATE TABLE weather_hourly (ts TIMESTAMP, temperature_2m DOUBLE)",
        )
        day = dt.date(2025, 8, 20)
        batch = _batch(spark, day=20).select(
            F.col("time").alias("ts"), "temperature_2m"
        )

        write_warehouse_jdbc(batch, url, "weather_hourly", day, date_col="ts")
        props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
        assert spark.read.jdbc(url, "weather_hourly", properties=props).count() == 4

        # Re-running the same day replaces, never duplicates (K4).
        write_warehouse_jdbc(batch, url, "weather_hourly", day, date_col="ts")
        assert spark.read.jdbc(url, "weather_hourly", properties=props).count() == 4

        # Another day appends alongside.
        write_warehouse_jdbc(
            _batch(spark, day=21).select(F.col("time").alias("ts"), "temperature_2m"),
            url, "weather_hourly", dt.date(2025, 8, 21), date_col="ts",
        )
        assert spark.read.jdbc(url, "weather_hourly", properties=props).count() == 8

        with pytest.raises(ValueError, match="unsafe table identifier"):
            write_warehouse_jdbc(batch, url, "weather_hourly; DROP TABLE x", day)

    def test_partitioned_readback_with_pushdown(self, spark, tmp_path):
        import pytest

        from portfolio_data_pipelines_spark.operators.medallion import (
            read_warehouse_jdbc,
            write_warehouse_jdbc,
        )

        url = self.URL_TMPL.format(db=tmp_path / "derbydb_rb")
        self._ddl(
            spark, url,
            "CREATE TABLE weather_hourly (ts TIMESTAMP, temperature_2m DOUBLE)",
        )
        batches = [
            _batch(spark, day=20).select(F.col("time").alias("ts"), "temperature_2m"),
            _batch(spark, day=21).select(F.col("time").alias("ts"), "temperature_2m"),
        ]
        for day, b in zip((dt.date(2025, 8, 20), dt.date(2025, 8, 21)), batches):
            write_warehouse_jdbc(b, url, "weather_hourly", day, date_col="ts")

        got = read_warehouse_jdbc(
            spark, url, "weather_hourly",
            partition_column="ts", num_partitions=3,
            driver="org.apache.derby.jdbc.EmbeddedDriver",
        )
        # Round-trip equality vs what was written.
        expected = sorted(
            (r["ts"], r["temperature_2m"]) for b in batches for r in b.collect()
        )
        assert sorted((r["TS"], r["TEMPERATURE_2M"]) for r in got.collect()) == expected
        # The scan is genuinely partitioned: one range query per partition.
        assert got.rdd.getNumPartitions() == 3

        # Predicate pushdown reaches the JDBCRelation (warehouse-side WHERE).
        filtered = got.filter(F.col("TEMPERATURE_2M") > 15.0)
        plan = filtered._jdf.queryExecution().executedPlan().toString()
        assert "JDBCRelation" in plan
        assert "PushedFilters" in plan and "TEMPERATURE_2M" in plan.split("PushedFilters")[1][:200]
        exp_n = sum(1 for b in batches for r in b.collect() if r["temperature_2m"] > 15.0)
        assert filtered.count() == exp_n

        # Empty table: bounds probe finds no min/max, falls back to a plain scan.
        self._ddl(spark, url, "CREATE TABLE empty_t (ts TIMESTAMP, v DOUBLE)")
        empty = read_warehouse_jdbc(
            spark, url, "empty_t", partition_column="ts",
            driver="org.apache.derby.jdbc.EmbeddedDriver",
        )
        assert empty.count() == 0

        with pytest.raises(ValueError, match="unsafe partition_column"):
            read_warehouse_jdbc(spark, url, "weather_hourly", partition_column="ts; DROP")


class TestMergeUpsert:
    def test_update_insert_and_untouched_partitions(self, spark, tmp_path):
        from portfolio_data_pipelines_spark.operators.medallion import merge_upsert

        path = str(tmp_path / "merge_lake")
        merge_upsert(spark, path, _batch(spark, day=20, temp=20.0), key_cols=["time"])
        merge_upsert(spark, path, _batch(spark, day=21, temp=40.0), key_cols=["time"])
        assert spark.read.parquet(path).count() == 8

        # One matched key (hour 0 of day 20, new temp) + one new key (hour 9).
        upd = spark.createDataFrame(
            [
                (dt.datetime(2025, 8, 20, 0), 99.0, 50.0, "-23.55", "-46.63",
                 dt.datetime(2025, 8, 20, 13)),
                (dt.datetime(2025, 8, 20, 9), 77.0, 50.0, "-23.55", "-46.63",
                 dt.datetime(2025, 8, 20, 13)),
            ],
            schema=_batch(spark, day=20).schema,
        )
        merge_upsert(spark, path, upd, key_cols=["time"])

        lake = spark.read.parquet(path)
        d20 = lake.filter(F.col("date") == "2025-08-20")
        assert d20.count() == 5  # 4 original, 1 updated in place, 1 inserted
        temps = {r["time"]: r["temperature_2m"] for r in d20.collect()}
        assert temps[dt.datetime(2025, 8, 20, 0)] == 99.0   # WHEN MATCHED: updated
        assert temps[dt.datetime(2025, 8, 20, 1)] == 21.0   # untouched row kept
        assert temps[dt.datetime(2025, 8, 20, 9)] == 77.0   # WHEN NOT MATCHED: inserted
        # Partition not present in the update batch is never rewritten.
        d21 = lake.filter(F.col("date") == "2025-08-21")
        assert d21.count() == 4
        assert d21.agg(F.min("temperature_2m")).first()[0] == 40.0

    def test_merge_rerun_idempotent(self, spark, tmp_path):
        from portfolio_data_pipelines_spark.operators.medallion import merge_upsert

        path = str(tmp_path / "merge_lake2")
        batch = _batch(spark, day=20)
        merge_upsert(spark, path, batch, key_cols=["time"])
        merge_upsert(spark, path, batch, key_cols=["time"])  # same batch again
        assert spark.read.parquet(path).count() == 4


class TestVersionedLake:
    """Manifest-swap atomic commits: multi-day batches become visible
    all-or-nothing; readers pinned to an old manifest keep a consistent
    snapshot; crashed (manifest-less) writes are invisible."""

    def test_commit_read_roundtrip_and_layering(self, spark, tmp_path):
        from portfolio_data_pipelines_spark.operators.medallion import (
            commit_versioned,
            read_versioned,
        )

        path = str(tmp_path / "vlake")
        v1 = commit_versioned(spark, path, _batch(spark, day=20, temp=10.0))
        v2 = commit_versioned(
            spark,
            path,
            _batch(spark, day=20, temp=99.0).unionByName(
                _batch(spark, day=21, temp=50.0)
            ),
        )
        assert (v1, v2) == (1, 2)
        got = read_versioned(spark, path)
        days = {
            str(r["date"]): r["n"]
            for r in got.groupBy("date").agg(F.count("*").alias("n")).collect()
        }
        assert days == {"2025-08-20": 4, "2025-08-21": 4}
        # day 20 must come from batch 2 (temp 99-base), not batch 1
        t20 = got.filter(F.col("date") == "2025-08-20").agg(
            F.min("temperature_2m")
        ).collect()[0][0]
        assert t20 == 99.0

    def test_reader_snapshot_survives_concurrent_commit(self, spark, tmp_path):
        from portfolio_data_pipelines_spark.operators.medallion import (
            commit_versioned,
            read_versioned,
        )

        path = str(tmp_path / "vlake2")
        commit_versioned(spark, path, _batch(spark, day=20, temp=10.0))
        snapshot = read_versioned(spark, path)  # resolves manifest v1
        # a second multi-day commit replaces day 20 and adds day 21 ...
        commit_versioned(
            spark,
            path,
            _batch(spark, day=20, temp=99.0).unionByName(_batch(spark, day=21)),
        )
        # ... but the in-flight reader still materializes the v1 snapshot:
        # old batch dirs are immutable and vacuum has not run.
        rows = snapshot.collect()
        assert len(rows) == 4
        assert min(r["temperature_2m"] for r in rows) == 10.0
        # a fresh read resolves v2 — all-or-nothing visibility of the batch
        assert read_versioned(spark, path).count() == 8

    def test_crashed_write_without_manifest_is_invisible(self, spark, tmp_path):
        from portfolio_data_pipelines_spark.operators.medallion import (
            commit_versioned,
            read_versioned,
        )

        path = str(tmp_path / "vlake3")
        commit_versioned(spark, path, _batch(spark, day=20))
        # simulate a committer that crashed after data placement, before
        # its manifest: the directory exists but no _manifest_v000002
        (
            _batch(spark, day=21)
            .withColumn("date", F.to_date("time"))
            .write.mode("overwrite")
            .partitionBy("date")
            .parquet(f"{path}/_batch_000002")
        )
        got = read_versioned(spark, path)
        assert {str(r["date"]) for r in got.select("date").distinct().collect()} == {
            "2025-08-20"
        }

    def test_concurrent_version_claim_raises(self, spark, tmp_path, monkeypatch):
        """The create(overwrite=False) guard: a committer whose manifest
        read went stale (a racer claimed the next version between its
        read and its create) must fail loudly, not overwrite."""
        import pytest as _pytest

        from portfolio_data_pipelines_spark.operators import medallion

        path = str(tmp_path / "vlake4")
        medallion.commit_versioned(spark, path, _batch(spark, day=20))
        # racer lands v2 while our committer still believes latest == v1
        with open(os.path.join(path, "_manifest_v000002.json"), "w") as f:
            f.write('{"version": 2, "partition_col": "date", "entries": {}}')
        monkeypatch.setattr(medallion, "_latest_manifest_doc", lambda *_: (1, None))
        with _pytest.raises(medallion.ConcurrentCommitError):
            medallion.commit_versioned(spark, path, _batch(spark, day=21))

    def test_vacuum_removes_only_unreferenced(self, spark, tmp_path):
        from portfolio_data_pipelines_spark.operators.medallion import (
            commit_versioned,
            read_versioned,
            vacuum_versioned,
        )

        path = str(tmp_path / "vlake5")
        commit_versioned(spark, path, _batch(spark, day=20, temp=10.0))
        commit_versioned(spark, path, _batch(spark, day=20, temp=99.0))
        removed = vacuum_versioned(spark, path)
        # batch 1 is fully superseded; manifest v1 is stale
        assert "_batch_000001" in removed and "_manifest_v000001.json" in removed
        got = read_versioned(spark, path)
        assert got.count() == 4
        assert got.agg(F.min("temperature_2m")).collect()[0][0] == 99.0

    def test_vacuum_keeps_partially_referenced_batches(self, spark, tmp_path):
        from portfolio_data_pipelines_spark.operators.medallion import (
            commit_versioned,
            read_versioned,
            vacuum_versioned,
        )

        path = str(tmp_path / "vlake6")
        commit_versioned(
            spark, path, _batch(spark, day=20).unionByName(_batch(spark, day=21))
        )
        commit_versioned(spark, path, _batch(spark, day=21, temp=99.0))
        removed = vacuum_versioned(spark, path)
        # batch 1 still serves day 20 → must survive; only manifest v1 goes
        assert removed == ["_manifest_v000001.json"]
        assert read_versioned(spark, path).count() == 8


class TestSchemaEvolution:
    """Versioned-lake schema evolution: later batches may ADD columns;
    snapshot reads serve each version with ITS schema, and vacuum never
    breaks the newest-schema manifest."""

    def test_added_column_merges_and_time_travels(self, spark, tmp_path):
        from portfolio_data_pipelines_spark.operators.medallion import (
            commit_versioned,
            read_versioned,
        )

        path = str(tmp_path / "evo")
        v1 = commit_versioned(spark, path, _batch(spark, day=20, temp=10.0))
        evolved = _batch(spark, day=21, temp=50.0).withColumn(
            "station", F.lit("sp-01")
        )
        v2 = commit_versioned(spark, path, evolved)
        assert (v1, v2) == (1, 2)

        latest = read_versioned(spark, path)
        assert "station" in latest.columns
        rows = {str(r["date"]): r for r in latest.collect()}
        # pre-evolution rows surface the new column as null
        assert rows["2025-08-20"]["station"] is None
        assert rows["2025-08-21"]["station"] == "sp-01"
        assert latest.count() == 8

        # snapshot at v1 reproduces the v1 schema exactly
        old = read_versioned(spark, path, version=1)
        assert "station" not in old.columns
        assert old.count() == 4

    def test_vacuum_keeps_evolved_manifest_readable(self, spark, tmp_path):
        import pytest as _pytest

        from portfolio_data_pipelines_spark.operators.medallion import (
            commit_versioned,
            read_versioned,
            vacuum_versioned,
        )

        path = str(tmp_path / "evo2")
        commit_versioned(spark, path, _batch(spark, day=20, temp=10.0))
        # v2 REPLACES day 20 with the evolved schema → batch 1 unreferenced
        commit_versioned(
            spark,
            path,
            _batch(spark, day=20, temp=99.0).withColumn("station", F.lit("sp-01")),
        )
        removed = vacuum_versioned(spark, path)
        assert "_batch_000001" in removed and "_manifest_v000001.json" in removed
        got = read_versioned(spark, path)
        assert "station" in got.columns and got.count() == 4
        assert got.agg(F.min("temperature_2m")).collect()[0][0] == 99.0
        # the vacuumed snapshot is gone loudly, not silently wrong
        with _pytest.raises(FileNotFoundError):
            read_versioned(spark, path, version=1)

    def test_mixed_schema_day_union_within_latest(self, spark, tmp_path):
        """Old and new batches both referenced by the latest manifest:
        day-level entries from each must union with merged schema."""
        from portfolio_data_pipelines_spark.operators.medallion import (
            commit_versioned,
            read_versioned,
            vacuum_versioned,
        )

        path = str(tmp_path / "evo3")
        commit_versioned(
            spark, path, _batch(spark, day=20).unionByName(_batch(spark, day=21))
        )
        commit_versioned(
            spark,
            path,
            _batch(spark, day=21, temp=99.0).withColumn("station", F.lit("x")),
        )
        vacuum_versioned(spark, path)  # batch 1 still serves day 20 → survives
        got = read_versioned(spark, path)
        per_day = {
            str(r["date"]): r["s"]
            for r in got.groupBy("date").agg(F.first("station").alias("s")).collect()
        }
        assert per_day == {"2025-08-20": None, "2025-08-21": "x"}


class TestTimeTravelAndCompaction:
    """timestampAsOf reads + OPTIMIZE-style compaction on the versioned
    lake — the Delta/Iceberg parity features the manifest design covers
    without dependencies."""

    @staticmethod
    def _committed_at(path, version):
        import json

        with open(os.path.join(path, f"_manifest_v{version:06d}.json")) as f:
            return json.load(f)["committed_at"]

    def test_asof_reads_between_commits(self, spark, tmp_path):
        import time

        import pytest as _pytest

        from portfolio_data_pipelines_spark.operators.medallion import (
            commit_versioned,
            read_versioned,
        )

        path = str(tmp_path / "tt")
        commit_versioned(spark, path, _batch(spark, day=20, temp=10.0))
        time.sleep(0.05)
        commit_versioned(spark, path, _batch(spark, day=20, temp=99.0))
        t1 = self._committed_at(path, 1)
        t2 = self._committed_at(path, 2)
        assert t1 < t2
        # as-of v1's commit instant → v1 content; as-of v2's → v2
        old = read_versioned(spark, path, as_of=t1)
        assert old.agg(F.min("temperature_2m")).collect()[0][0] == 10.0
        new = read_versioned(spark, path, as_of=t2)
        assert new.agg(F.min("temperature_2m")).collect()[0][0] == 99.0
        with _pytest.raises(FileNotFoundError):  # before any commit
            read_versioned(spark, path, as_of="1999-01-01T00:00:00.000000Z")
        with _pytest.raises(ValueError):
            read_versioned(spark, path, version=1, as_of=t1)

    def test_asof_parses_timestamps_not_lexicographic(self, spark, tmp_path):
        """as_of must compare instants, not strings: an equivalent
        timestamp expressed with a +02:00 offset (or without the
        fractional part) must select the same version as the canonical
        '...%fZ' form — lexicographic comparison would misorder both."""
        import datetime as dt
        import time

        from portfolio_data_pipelines_spark.operators.medallion import (
            commit_versioned,
            read_versioned,
        )

        path = str(tmp_path / "tt_tz")
        commit_versioned(spark, path, _batch(spark, day=20, temp=10.0))
        time.sleep(0.05)
        commit_versioned(spark, path, _batch(spark, day=20, temp=99.0))
        t1 = self._committed_at(path, 1)
        # Same instant as t1, rendered in +02:00 — lexicographically this
        # sorts AFTER t2's UTC string (hour digits differ), so a string
        # compare would wrongly pick v2.
        t1_offset = (
            dt.datetime.fromisoformat(t1.replace("Z", "+00:00"))
            .astimezone(dt.timezone(dt.timedelta(hours=2)))
            .isoformat()
        )
        old = read_versioned(spark, path, as_of=t1_offset)
        assert old.agg(F.min("temperature_2m")).collect()[0][0] == 10.0
        # No-fraction form one second past t1 (still before t2 only if
        # the gap allows; just assert it parses and returns some version).
        nofrac = dt.datetime.fromisoformat(t1.replace("Z", "+00:00")).strftime(
            "%Y-%m-%dT%H:%M:%SZ"
        )
        # floor-of-second ≤ t1's fractional instant ⇒ v1 only if commit
        # landed exactly on the second; either way it must not raise and
        # must never return v2 (whose commit is strictly later).
        try:
            got = read_versioned(spark, path, as_of=nofrac)
            assert got.agg(F.min("temperature_2m")).collect()[0][0] == 10.0
        except FileNotFoundError:
            pass  # commit had a nonzero fraction and floor(t1) < t1

    def test_compact_coalesces_snapshot_into_one_batch(self, spark, tmp_path):
        import glob

        from portfolio_data_pipelines_spark.operators.medallion import (
            commit_versioned,
            compact_versioned,
            read_versioned,
            vacuum_versioned,
        )

        path = str(tmp_path / "opt")
        for day in (20, 21, 22):
            commit_versioned(spark, path, _batch(spark, day=day, temp=float(day)))
        before = sorted(
            (str(r["date"]), r["temperature_2m"])
            for r in read_versioned(spark, path).collect()
        )
        v = compact_versioned(spark, path)
        assert v == 4
        after = read_versioned(spark, path)
        assert sorted((str(r["date"]), r["temperature_2m"]) for r in after.collect()) == before
        # all days now live in the single compacted batch; old ones reclaim
        removed = vacuum_versioned(spark, path)
        assert {"_batch_000001", "_batch_000002", "_batch_000003"} <= set(removed)
        files = glob.glob(f"{path}/_batch_000004/date=*/*.parquet")
        assert len(files) == 3  # one file per day after per-partition repartition

    def test_partition_scoped_compaction(self, spark, tmp_path):
        import pytest as _pytest

        from portfolio_data_pipelines_spark.operators.medallion import (
            commit_versioned,
            compact_versioned,
            read_versioned,
        )

        path = str(tmp_path / "opt2")
        for day in (20, 21, 22):
            commit_versioned(spark, path, _batch(spark, day=day, temp=float(day)))
        compact_versioned(spark, path, partitions=["2025-08-20", "2025-08-21"])
        import json

        with open(os.path.join(path, "_manifest_v000004.json")) as f:
            entries = json.load(f)["entries"]
        assert entries["2025-08-20"] == "_batch_000004"
        assert entries["2025-08-21"] == "_batch_000004"
        assert entries["2025-08-22"] == "_batch_000003"  # untouched
        assert read_versioned(spark, path).count() == 12
        with _pytest.raises(ValueError, match="no rows"):
            compact_versioned(spark, path, partitions=["2030-01-01"])


def test_read_versioned_prunes_partitions_in_scan(spark, tmp_path):
    """A date filter over the versioned-lake read must prune at the FILE
    level inside every per-batch scan (PartitionFilters on the
    FileSourceScan), not post-union — the property that keeps day-scoped
    reads O(day) instead of O(lake) at 100 TB."""
    from portfolio_data_pipelines_spark.operators.medallion import (
        commit_versioned,
        read_versioned,
    )

    path = str(tmp_path / "prune")
    commit_versioned(
        spark, path, _batch(spark, day=20).unionByName(_batch(spark, day=21))
    )
    commit_versioned(spark, path, _batch(spark, day=22))
    snap = read_versioned(spark, path).filter(F.col("date") == "2025-08-21")
    assert snap.count() == 4
    plan = snap._jdf.queryExecution().executedPlan().toString()
    # every scan carries the pushed partition predicate
    scans = [seg for seg in plan.split("FileScan") if "PartitionFilters" in seg]
    assert scans, plan
    assert all("2025-08-21" in seg.split("PartitionFilters", 1)[1][:200] or
               "date" in seg.split("PartitionFilters", 1)[1][:200] for seg in scans)


class TestDiffVersions:
    """CDC-lite between snapshots: inserts, updates, deletes per key,
    including across an ADD-column schema evolution."""

    def test_insert_update_delete(self, spark, tmp_path):
        from portfolio_data_pipelines_spark.operators.medallion import (
            commit_versioned,
            diff_versions,
        )

        path = str(tmp_path / "cdc")
        v1_rows = _batch(spark, day=20, n=3, temp=10.0)  # hours 0,1,2
        commit_versioned(spark, path, v1_rows)
        # v2 REPLACES day 20: hour 0 unchanged, hour 1 new temp (update),
        # hour 2 gone (delete), hour 3 added (insert)
        import datetime as _dt

        from portfolio_data_pipelines_spark.schemas import WEATHER_BRONZE

        rows = [
            (_dt.datetime(2025, 8, 20, 0), 10.0, 50.0, "-23.55", "-46.63", _dt.datetime(2025, 8, 20, 12)),
            (_dt.datetime(2025, 8, 20, 1), 42.0, 50.0, "-23.55", "-46.63", _dt.datetime(2025, 8, 20, 12)),
            (_dt.datetime(2025, 8, 20, 3), 13.0, 50.0, "-23.55", "-46.63", _dt.datetime(2025, 8, 20, 12)),
        ]
        commit_versioned(spark, path, spark.createDataFrame(rows, schema=WEATHER_BRONZE))
        got = {
            r["time"]: r["_change_type"]
            for r in diff_versions(spark, path, 1, 2, key_cols=["time"]).collect()
        }
        assert got == {
            _dt.datetime(2025, 8, 20, 1): "update",
            _dt.datetime(2025, 8, 20, 2): "delete",
            _dt.datetime(2025, 8, 20, 3): "insert",
        }

    def test_schema_evolution_diff(self, spark, tmp_path):
        from portfolio_data_pipelines_spark.operators.medallion import (
            commit_versioned,
            diff_versions,
        )

        path = str(tmp_path / "cdc2")
        commit_versioned(spark, path, _batch(spark, day=20, n=2, temp=10.0))
        # v2 re-commits the SAME rows with an added column: only rows whose
        # new column is non-null should read as updates
        evolved = _batch(spark, day=20, n=2, temp=10.0).withColumn(
            "station", F.when(F.hour("time") == 1, F.lit("sp-01"))
        )
        commit_versioned(spark, path, evolved)
        got = {
            r["time"].hour: (r["_change_type"], r["station"])
            for r in diff_versions(spark, path, 1, 2, key_cols=["time"]).collect()
        }
        # hour 0: station null on both sides after alignment → unchanged
        assert got == {1: ("update", "sp-01")}


def test_compact_after_schema_evolution_widens_old_days(spark, tmp_path):
    """Compacting a snapshot whose batches have different schemas must
    rewrite old days WITH the widened schema (null-filled new columns) —
    after compaction plus vacuum, one batch serves everything and the
    per-day values are unchanged."""
    from portfolio_data_pipelines_spark.operators.medallion import (
        commit_versioned,
        compact_versioned,
        read_versioned,
        vacuum_versioned,
    )

    path = str(tmp_path / "evo_opt")
    commit_versioned(spark, path, _batch(spark, day=20, temp=10.0))
    commit_versioned(
        spark, path, _batch(spark, day=21, temp=50.0).withColumn("station", F.lit("sp"))
    )
    compact_versioned(spark, path)
    vacuum_versioned(spark, path)
    got = read_versioned(spark, path)
    per_day = {
        str(r["date"]): (r["s"], r["t"])
        for r in got.groupBy("date")
        .agg(F.first("station").alias("s"), F.min("temperature_2m").alias("t"))
        .collect()
    }
    assert per_day == {"2025-08-20": (None, 10.0), "2025-08-21": ("sp", 50.0)}
    import glob

    assert not glob.glob(f"{path}/_batch_00000[12]")  # old batches reclaimed


def test_jdbc_readback_numeric_partition_column(spark, tmp_path):
    """Numeric partitionColumn with explicit and probed bounds: all rows
    exactly once across the range queries."""
    from portfolio_data_pipelines_spark.operators.medallion import read_warehouse_jdbc

    url = f"jdbc:derby:{tmp_path}/derbynum;create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate("CREATE TABLE t (id INT, v DOUBLE)")
    for i in range(50):
        st.executeUpdate(f"INSERT INTO t VALUES ({i}, {i * 1.5})")
    st.close()
    conn.close()
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    # explicit bounds
    got = read_warehouse_jdbc(
        spark, url, "t", partition_column="id", num_partitions=4,
        lower_bound=0, upper_bound=49, driver=drv,
    )
    assert got.rdd.getNumPartitions() == 4
    assert sorted(r["ID"] for r in got.collect()) == list(range(50))
    # probed bounds (driver-side MIN/MAX)
    probed = read_warehouse_jdbc(
        spark, url, "t", partition_column="id", num_partitions=3, driver=drv
    )
    assert sorted(r["ID"] for r in probed.collect()) == list(range(50))


class TestCheckpointAndRetention:
    """Manifest checkpointing (_last_checkpoint + rolled-up commit-time
    index every CHECKPOINT_EVERY commits) and retention-policy vacuum —
    the two pieces that keep manifest I/O O(1) and history bounded as
    the table ages."""

    @staticmethod
    def _tiny(spark, temp: float):
        return spark.createDataFrame(
            [("2025-08-20", temp)], "date string, temperature_2m double"
        )

    def test_100_commits_reads_bounded_by_checkpoint(self, spark, tmp_path):
        from portfolio_data_pipelines_spark.operators import medallion as med

        path = str(tmp_path / "cp100")
        for i in range(100):
            med.commit_versioned(spark, path, self._tiny(spark, float(i)))
        # checkpoint landed at v100 and the pointer tracks it
        assert os.path.exists(os.path.join(path, "_checkpoint_v000100.json"))
        assert os.path.exists(os.path.join(path, "_last_checkpoint"))

        med.IO_STATS.update(manifest_reads=0, lists=0)
        snap = med.read_versioned(spark, path)
        assert snap.agg(F.max("temperature_2m")).collect()[0][0] == 99.0
        # pointer + latest manifest; never a directory listing, never a
        # per-version scan
        assert med.IO_STATS["lists"] == 0
        assert med.IO_STATS["manifest_reads"] <= 2 + med.CHECKPOINT_EVERY

        # time travel through the checkpoint's commit-time index
        import json

        with open(os.path.join(path, "_manifest_v000042.json")) as f:
            t42 = json.load(f)["committed_at"]
        med.IO_STATS.update(manifest_reads=0, lists=0)
        old = med.read_versioned(spark, path, as_of=t42)
        assert old.agg(F.max("temperature_2m")).collect()[0][0] == 41.0
        assert med.IO_STATS["lists"] == 0
        assert med.IO_STATS["manifest_reads"] <= 3 + med.CHECKPOINT_EVERY

    def test_checkpoint_cadence_and_tail_probing(self, spark, tmp_path, monkeypatch):
        from portfolio_data_pipelines_spark.operators import medallion as med

        monkeypatch.setattr(med, "CHECKPOINT_EVERY", 3)
        path = str(tmp_path / "cp3")
        for i in range(7):
            med.commit_versioned(spark, path, self._tiny(spark, float(i)))
        assert os.path.exists(os.path.join(path, "_checkpoint_v000003.json"))
        assert os.path.exists(os.path.join(path, "_checkpoint_v000006.json"))
        import json

        with open(os.path.join(path, "_last_checkpoint")) as f:
            assert json.load(f)["version"] == 6
        with open(os.path.join(path, "_checkpoint_v000006.json")) as f:
            doc = json.load(f)
        assert sorted(map(int, doc["commit_times"])) == [1, 2, 3, 4, 5, 6]
        med.IO_STATS.update(manifest_reads=0, lists=0)
        v, entries = med._latest_manifest(spark, path)
        assert v == 7 and entries
        assert med.IO_STATS["lists"] == 0
        assert med.IO_STATS["manifest_reads"] == 2  # pointer + v7 manifest

    def test_vacuum_retention_window(self, spark, tmp_path, monkeypatch):
        import json
        import time

        import pytest as _pytest

        from portfolio_data_pipelines_spark.operators import medallion as med

        monkeypatch.setattr(med, "CHECKPOINT_EVERY", 3)
        path = str(tmp_path / "ret")
        for i in range(1, 6):
            med.commit_versioned(spark, path, self._tiny(spark, float(i)))
            time.sleep(0.02)

        def committed(v):
            with open(os.path.join(path, f"_manifest_v{v:06d}.json")) as f:
                return json.load(f)["committed_at"]

        t = {v: committed(v) for v in range(1, 6)}
        now = t[5]
        # retention window reaching back to v3's commit, exclusive of v2
        span_h = (
            med._parse_iso_ts(now) - med._parse_iso_ts(t[3])
        ).total_seconds() / 3600
        removed = med.vacuum_versioned(
            spark, path, retain_hours=span_h + 1e-9, now=now
        )
        assert "_manifest_v000001.json" in removed
        assert "_manifest_v000002.json" in removed
        assert "_batch_000001" in removed and "_batch_000002" in removed
        assert "_manifest_v000003.json" not in removed

        # inside retention: version- and time-travel both survive
        assert (
            med.read_versioned(spark, path, version=3)
            .agg(F.max("temperature_2m")).collect()[0][0] == 3.0
        )
        assert (
            med.read_versioned(spark, path, as_of=t[4])
            .agg(F.max("temperature_2m")).collect()[0][0] == 4.0
        )
        # outside retention: loud failures, not silent fallbacks
        with _pytest.raises(FileNotFoundError):
            med.read_versioned(spark, path, version=2)
        with _pytest.raises(FileNotFoundError):
            med.read_versioned(spark, path, as_of=t[1])

        # vacuum re-checkpointed at the latest version: reads stay O(1)
        # and the commit-time index dropped the vacuumed versions
        with open(os.path.join(path, "_last_checkpoint")) as f:
            assert json.load(f)["version"] == 5
        with open(os.path.join(path, "_checkpoint_v000005.json")) as f:
            assert sorted(map(int, json.load(f)["commit_times"])) == [3, 4, 5]
        med.IO_STATS.update(manifest_reads=0, lists=0)
        assert (
            med.read_versioned(spark, path)
            .agg(F.max("temperature_2m")).collect()[0][0] == 5.0
        )
        assert med.IO_STATS["lists"] == 0

    def test_vacuum_default_retains_only_latest_and_recheckpoints(
        self, spark, tmp_path
    ):
        from portfolio_data_pipelines_spark.operators import medallion as med

        path = str(tmp_path / "ret0")
        for i in range(1, 4):
            med.commit_versioned(spark, path, self._tiny(spark, float(i)))
        removed = med.vacuum_versioned(spark, path)
        assert {"_batch_000001", "_batch_000002",
                "_manifest_v000001.json", "_manifest_v000002.json"} <= set(removed)
        assert (
            med.read_versioned(spark, path)
            .agg(F.max("temperature_2m")).collect()[0][0] == 3.0
        )
        # post-vacuum lakes are checkpointed even below CHECKPOINT_EVERY
        assert os.path.exists(os.path.join(path, "_last_checkpoint"))
        med.IO_STATS.update(manifest_reads=0, lists=0)
        med._latest_manifest(spark, path)
        assert med.IO_STATS["lists"] == 0
