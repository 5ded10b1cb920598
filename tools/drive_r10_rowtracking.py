import sys, os, shutil
sys.path.insert(0, "/root/repo")
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.delta_log import (
    write_delta, read_delta, enable_row_tracking, merge_delta,
    optimize_delta, delete_where, update_where, restore_delta,
    delete_where_dv, purge_delta,
)
from portfolio_data_pipelines_spark.operators.delta_reader import (
    read_delta_external,
)
from pyspark.sql import functions as F

spark = get_spark(master="local[4]", extra_conf={
    "spark.ui.enabled": "false", "spark.sql.shuffle.partitions": "4"})
root = "/tmp/rt_smoke"
shutil.rmtree(root, ignore_errors=True)

def ids_both(p, **kw):
    df = read_delta(spark, p, row_ids=True, **kw)
    s = sorted((r["id"], r["_row_id"], r["_row_commit_version"])
               for r in df.collect())
    nm, rows = read_delta_external(p, row_ids=True, **({"version": kw["version"]} if "version" in kw else {}))
    ii, ri, rc = nm.index("id"), nm.index("_row_id"), nm.index("_row_commit_version")
    e = sorted((r[ii], r[ri], r[rc]) for r in rows)
    assert s == e, (s[:5], e[:5])
    return s

# creation-time enablement
p = f"{root}/t1"
write_delta(spark, spark.createDataFrame(
    [(i, float(i)) for i in range(1, 6)], "id bigint, v double"
).coalesce(1), p, configuration={"delta.enableRowTracking": "true"})
got = ids_both(p)
assert [g[1] for g in got] == [0, 1, 2, 3, 4], got
assert all(g[2] == 0 for g in got), got
print("v0 fresh ids OK", got)

# append: ids continue past the mark
write_delta(spark, spark.createDataFrame(
    [(10, 1.0), (11, 2.0)], "id bigint, v double").coalesce(1), p)
got = ids_both(p)
assert sorted(g[1] for g in got) == [0, 1, 2, 3, 4, 5, 6], got
id_of = {g[0]: g[1] for g in got}
print("append OK", got)

# update keeps id, bumps cv; delete removes only its row's id
update_where(spark, p, "id = 2", {"v": "v * 100"})
got = ids_both(p)
m = {g[0]: (g[1], g[2]) for g in got}
assert m[2][0] == id_of[2] and m[2][1] == 2, m
assert m[1] == (id_of[1], 0), m
delete_where(spark, p, "id = 3")
got = ids_both(p)
assert sorted(g[0] for g in got) == [1, 2, 4, 5, 10, 11]
m2 = {g[0]: g[1] for g in got}
assert all(m2[k] == id_of[k] for k in m2), (m2, id_of)
print("update/delete OK")

# merge: matched keeps id, insert gets fresh
merge_delta(spark, p, spark.createDataFrame(
    [(4, 444.0), (99, 9.0)], "id bigint, v double"), key_cols=["id"])
got = ids_both(p)
m3 = {g[0]: (g[1], g[2]) for g in got}
assert m3[4][0] == id_of[4] and m3[4][1] == 4, m3
assert m3[99][0] > 6, m3  # fresh, past the mark
print("merge OK", m3)

# optimize: nothing changes logically
v_before = sorted(got)
optimize_delta(spark, p)
assert ids_both(p) == v_before
print("optimize preserves OK")

# DV delete then purge: survivors keep ids
delete_where_dv(spark, p, "id = 10")
got = ids_both(p)
assert sorted(g[0] for g in got) == [1, 2, 4, 5, 11, 99]
m4 = {g[0]: g[1] for g in got}
assert m4[11] == id_of[11]
purge_delta(spark, p)
assert {g[0]: g[1] for g in ids_both(p)} == m4
print("dv+purge OK")

# restore: ids roll back with the files
# (restore to the post-merge version v_before state)
# post-merge version: creation=0 append=1 update=2 delete=3 merge=4 optimize=5 dv=6 purge=7
restore_delta(spark, p, 4)
assert sorted(ids_both(p)) == v_before
print("restore OK")

# enable on an EXISTING table (backfill path)
p2 = f"{root}/t2"
write_delta(spark, spark.createDataFrame(
    [(i, float(i)) for i in range(5)], "id bigint, v double"
).repartition(2), p2)
enable_row_tracking(spark, p2)
got2 = ids_both(p2)
assert sorted(g[1] for g in got2) == [0, 1, 2, 3, 4], got2
print("backfill OK", got2)
print("RT SMOKE ALL OK")
