import sys, time
sys.path.insert(0, "/root/repo")
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.bpe import bpe_encode_table, FIXTURE_MERGES
from portfolio_data_pipelines_spark.sources.parquet import scan_table
spark = get_spark(master="local[8]", extra_conf={"spark.ui.enabled":"false","spark.sql.shuffle.partitions":"8"})
spark.sparkContext.setLogLevel("ERROR")
docs = scan_table(spark, "/root/testdata/sf0.01", "documents").select("doc_id", "text")
t0 = time.perf_counter()
out = bpe_encode_table(docs, "text", "doc_id", FIXTURE_MERGES)
n = out.count()
tot = out.selectExpr("sum(size(token_ids)) s").collect()[0]["s"]
print(f"encoded {n} docs, {tot} tokens in {time.perf_counter()-t0:.1f}s")
print(out.orderBy("doc_id").limit(2).collect())
