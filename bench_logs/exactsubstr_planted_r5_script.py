"""ExactSubstr at bench scale: sf0.1 documents with planted 10-30%
duplication (the realistic crawl regime, Lee et al. ~13%)."""
import os, sys, time, json
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/tools')
import scaling_bench as sb
from ocr_module_spark.session import get_spark
from pyspark.sql import functions as F
from ocr_module_spark.functions.exactsubstr import exact_substr_frame, MIN_RUN

extra = {"spark.local.dir": "/dev/shm/spark-local"}
spark = get_spark('es-bench', cores=32, shuffle_partitions=32, extra_conf=extra)
docs = spark.read.parquet('/root/testdata/sf0.1/documents.parquet') \
    .select("doc_id", "text")
n = docs.count()

# plant duplication: every doc_id % 4 == 1 doc gets donor (doc_id-1)'s
# word slice [off, off+60) appended at its tail — arbitrary alignment,
# donor-dependent offset, deterministic
donors = docs.select(F.col("doc_id").alias("donor_id"),
                     F.split(F.trim("text"), r"\s+").alias("dw"))
tgt = docs.where("doc_id % 4 = 1") \
    .withColumn("donor_id", F.col("doc_id") - 1)
planted = (tgt.join(donors, "donor_id")
           .withColumn("off", (F.pmod(F.col("doc_id"), F.lit(13)) + 1).cast("int"))
           .withColumn("run", F.expr(f"array_join(slice(dw, off, {MIN_RUN * 2 + 10}), ' ')"))
           .withColumn("text", F.when(F.size("dw") >= F.col("off") + MIN_RUN,
                                      F.concat_ws(" ", "text", "run"))
                       .otherwise(F.col("text")))
           .select("doc_id", "text"))
corpus = (docs.where("doc_id % 4 != 1").unionByName(planted)
          .repartition(32).localCheckpoint(eager=True))
nc = corpus.count()
frame = exact_substr_frame(corpus)

def mat(df): df.write.mode("overwrite").format("noop").save()
steal0 = sb._steal_sec(); bw0, mt0 = sb._bw_probe_gbs(), sb._bw_probe_mt_gbs()
mat(frame)  # warm
best = float("inf"); reps = []
for _ in range(3):
    t0 = time.time(); mat(frame); dtt = time.time() - t0
    reps.append(round(dtt, 3)); best = min(best, dtt)
stats = frame.selectExpr(
    "sum(n_words) AS nw", "sum(dup_words) AS dup",
    "sum(case when dup_words > 0 then 1 else 0 end) AS docs_hit").first()
bw1, mt1 = sb._bw_probe_gbs(), sb._bw_probe_mt_gbs()
print(json.dumps({
    "docs": nc, "reps": reps, "best_sec": round(best, 3),
    "total_words": stats["nw"], "dup_words": stats["dup"],
    "dup_fraction": round(stats["dup"] / stats["nw"], 4),
    "docs_with_dups": stats["docs_hit"],
    "docs_per_sec": round(nc / best, 1),
    "markers": {"steal": round(sb._steal_sec() - steal0, 1),
                 "load": round(os.getloadavg()[0], 2),
                 "bw": [round(bw0, 1), round(bw1, 1)],
                 "mt": [round(mt0, 1), round(mt1, 1)]}}))
spark.stop()
