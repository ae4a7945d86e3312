import sys, re; sys.path.insert(0,"/root/repo")
from fusionspark.session import get_spark
from fusionspark.io import load_table
from pyspark.sql import functions as F
spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"

def audit(name, df):
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    schemas = re.findall(r"ReadSchema: ([^\n]*)", plan)
    n_shuffle = plan.count("Exchange")
    n_bcast = plan.count("BroadcastExchange")
    n_wsc = plan.count("codegen id")
    print(f"== {name}: shuffles={n_shuffle - n_bcast} broadcasts={n_bcast} codegen_spans={n_wsc}")
    for p in pushed[:3]:
        print("   pushed:", p[:100])
    for s in schemas[:3]:
        print("   schema:", s[:110])

# 1. filtered scan: does the filter reach parquet?
e = load_table(spark, sf, "embeddings")
audit("filter_eq", e.filter(F.col("label") == 3).select("vec_id", "label"))

# 2. knn plan
from fusionspark.operators.knn import knn, self_probes
audit("knn", knn(e, self_probes(e, 4), k=5))

# 3. star join: broadcasts?
c = load_table(spark, sf, "customer"); n = load_table(spark, sf, "nation")
o = load_table(spark, sf, "orders").filter(F.col("o_orderstatus")=="F")
li = load_table(spark, sf, "lineitem")
j = (li.join(F.broadcast(o), li.l_orderkey==o.o_orderkey)
      .join(F.broadcast(c), o.o_custkey==c.c_custkey)
      .join(F.broadcast(n), c.c_nationkey==n.n_nationkey)
      .groupBy("c_custkey").agg(F.sum("l_extendedprice").alias("rev")))
audit("star_join", j)

# 4. column pruning on media metadata (payload must not be read)
from fusionspark.operators.multimodal import synth_media
m = synth_media(spark, sf)
audit("media_meta", m.groupBy("kind").count())

# 5. keyword scan column pruning
d = load_table(spark, sf, "documents")
from fusionspark.operators.keyword import keyword_search
audit("keyword", keyword_search(d, "fast table scan", 10))
