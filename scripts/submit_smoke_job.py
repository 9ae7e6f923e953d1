"""Flagship region-count job driven via ``spark-submit --py-files``
on a multi-executor (separate-JVM) master — hexspark.zip is the only
code path, proving the package runs off the driver's PYTHONPATH.

    ./scripts/package.sh
    spark-submit --master local-cluster[2,4,2048] \
        --py-files dist/hexspark.zip scripts/submit_smoke_job.py

Env: HEXSPARK_SF_DIR (default /root/testdata/sf0.001), COPIES=40.
Prints one line: ``RESULT {"master": ..., "counts": {...}}``.
"""
import json
import os

from pyspark.sql import SparkSession, functions as F

spark = SparkSession.builder.appName("hexspark-submit-smoke").getOrCreate()
from hexspark import ops, synth  # noqa: E402  (resolved from --py-files)
from hexspark.geo import grid_encode  # noqa: E402

SF_DIR = os.environ.get("HEXSPARK_SF_DIR", "/root/testdata/sf0.001")
COPIES = int(os.environ.get("COPIES", "40"))

docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
n = docs.count()
pages = spark.range(0, n * COPIES, 1, 8).select(
    F.col("id").alias("page_key"),
    F.concat(F.lit("l"), (F.col("id") % 4).cast("string")).alias("lang"),
)
lat, lon = synth.latlon_from_key(F.col("page_key"))
pages = pages.withColumn("lat", lat).withColumn("lon", lon).withColumn(
    "cell", grid_encode(F.col("lat"), F.col("lon"), 12)
)
regions = ops.region_map(spark)
out = {r["region"]: r["n_pages"] for r in ops.region_counts(pages, regions).collect()}
print("RESULT " + json.dumps(
    {"master": spark.sparkContext.getConf().get("spark.master"), "counts": out}
))
spark.stop()
