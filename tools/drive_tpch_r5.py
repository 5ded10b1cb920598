import sys; sys.path.insert(0, "/root/repo")
import duckdb
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.queries import EXTRA_REGISTRY, _load_all
_load_all()
spark = get_spark(master="local[4]", extra_conf={"spark.ui.enabled": "false",
                                                 "spark.sql.shuffle.partitions": "4"})
sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
names = sorted(n for n in EXTRA_REGISTRY if n.rsplit("_q",1)[-1].isdigit())
ok = 0
for n in names:
    spec = EXTRA_REGISTRY[n]
    sdf = spec.fn(spark, sf)
    srows = sorted(tuple(str(x) for x in r) for r in
                   (tuple(row[c] for c in sorted(sdf.columns)) for row in (r.asDict() for r in sdf.collect())))
    rel = con.sql(spec.oracle)
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    drows = sorted(tuple(str(r[i]) for i in order) for r in rel.fetchall())
    status = "OK" if srows == drows else "MISMATCH"
    if srows == drows: ok += 1
    print(f"{n}: {len(srows)} rows {status}")
print(f"{ok}/{len(names)} end-to-end parity")
