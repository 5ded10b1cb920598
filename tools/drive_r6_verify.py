import sys, json, warnings
sys.path.insert(0, "/root/repo")
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.delta_log import (
    write_delta, read_delta, merge_delta, read_delta_changes)
spark = get_spark(master="local[4]", extra_conf={
    "spark.ui.enabled": "false", "spark.sql.shuffle.partitions": "4"})

# --- Delta lifecycle with URI-encoded special partitions + type guard ---
import tempfile, shutil, os
root = tempfile.mkdtemp(prefix="r6drive_")
t = os.path.join(root, "tbl")
d0 = spark.createDataFrame([(1, "100%"), (2, "a b")], "id bigint, k string")
write_delta(spark, d0, t, partition_col="k")
print("read:", sorted(tuple(r) for r in read_delta(spark, t).collect()))
log0 = open(os.path.join(t, "_delta_log", f"{0:020d}.json")).read().splitlines()
print("log add paths:", sorted(json.loads(x)["add"]["path"] for x in log0 if "add" in json.loads(x)))
try:
    write_delta(spark, spark.createDataFrame([(3, 4)], "id bigint, k bigint"), t, partition_col="k")
    print("TYPE GUARD FAILED")
except ValueError as e:
    print("type guard OK:", str(e)[:60])
src = spark.createDataFrame([(2, "a b"), (5, "new")], "id bigint, k string")
merge_delta(spark, t, src, key_cols=["id"])
print("post-merge:", sorted(tuple(r) for r in read_delta(spark, t).collect()))
print("feed:", sorted(r["id"] for r in read_delta_changes(spark, t, 0).collect()))
with warnings.catch_warnings(record=True) as w:
    warnings.simplefilter("always")
    try:
        write_delta(spark, d0, "s3a://nope/t")
    except Exception:
        pass
    print("s3a warn:", any("not atomic" in str(x.message) for x in w))
shutil.rmtree(root)

# --- reshaped sketch queries vs DuckDB, driver-style ---
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
import __spark_entry__ as e
import duckdb
con = duckdb.connect()
for tname in ["events", "lineitem"]:
    con.sql(f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('/root/testdata/sf0.01/{tname}.parquet')")
qs, osql = e.queries(), e.oracle_sql()
for name in ["approx_distinct_users_daily", "approx_price_percentiles"]:
    sdf = qs[name](spark, "/root/testdata/sf0.01").toPandas()
    odf = con.sql(osql[name]).df()
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    s = sorted(map(tuple, sdf[scols].itertuples(index=False)))
    o = sorted(map(tuple, odf[ocols].itertuples(index=False)))
    print(name, "cols_match:", scols == ocols, "rows:", len(s), "values_match:", s == o)
print("ENTRY rows:", e.entry(spark).count())
