"""sf10 minhash cross-engine parity with a BINDING bucket cap.

At sf10 the synthetic corpus has ~100 near-identical copies per document
(make_sf_big suffix construction), so every LSH bucket holds ~100 ids and
the default uncapped candidate set is ~25M pairs by construction — the
degenerate case the max_bucket_size cap exists for. This run sets the cap
to 64 so it BINDS (drops the 100-copy buckets) and checks the engine
against the DuckDB oracle with the same cap modeled — the r6 sf1 lesson
(caps must be modeled in the oracle at the scale where they bind), pushed
one more decade.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
import duckdb

SF = "/dev/shm/sf10"
CAP = 64
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "16")
         .config("spark.driver.memory", "8g")
         .config("spark.local.dir", "/dev/shm/spark-local")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from monotonic_optimal_binning_spark.operators.dedup import minhash_lsh_candidates

docs = spark.read.parquet(f"{SF}/documents.parquet").repartition(16)
t0 = time.time()
out = minhash_lsh_candidates(
    docs, "text", "doc_id", num_hashes=32, n_bands=8,
    shingle_size=3, shingle_unit="word", shingle_hash="md5",
    max_bucket_size=CAP, threshold=0.5, materialize=True,
)
sp = out.select("id_a", "id_b", F.round("jaccard", 6).alias("j")).toPandas()
t_spark = time.time() - t0
print(f"spark: {len(sp)} pairs in {t_spark:.1f}s", flush=True)
spark.stop()

import __spark_entry__ as e
cte = e._minhash_sig_cte(num_hashes=32, n_bands=8, max_bucket_size=CAP)
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
t0 = time.time()
dd = con.execute(f"""
WITH {cte}
SELECT id_a, id_b,
       round(len(list_intersect(ha.hlist, hb.hlist)) /
             CAST(len(ha.hlist) + len(hb.hlist)
                  - len(list_intersect(ha.hlist, hb.hlist)) AS DOUBLE), 6) AS j
FROM cand JOIN hl ha ON ha.doc_id = id_a JOIN hl hb ON hb.doc_id = id_b
WHERE len(list_intersect(ha.hlist, hb.hlist)) /
      CAST(len(ha.hlist) + len(hb.hlist)
           - len(list_intersect(ha.hlist, hb.hlist)) AS DOUBLE) >= 0.5
""").fetchdf()
t_duck = time.time() - t0
print(f"duck : {len(dd)} pairs in {t_duck:.1f}s", flush=True)
a = set(map(tuple, sp.itertuples(index=False)))
b = set(map(tuple, dd.itertuples(index=False)))
print("MATCH" if a == b else f"FAIL only_spark={len(a-b)} only_duck={len(b-a)}")
