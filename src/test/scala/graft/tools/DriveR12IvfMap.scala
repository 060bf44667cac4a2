package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch end-to-end driver (test scope), round-12: the id->cluster map
  * sidecar behind IVF maintenance, driven through the PUBLIC API over
  * REAL testdata embeddings — build, append, two CDC update deliveries
  * (backfill + mapped path), then expect-vs-got the maintained index
  * against a from-scratch build over the merged corpus. */
object DriveR12IvfMap {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint(true)
    val cents = Similarity.kMeans(emb, "vec_id", "embedding", "cid", k = 4, iters = 3)
      .localCheckpoint(true)
    def rows(d: org.apache.spark.sql.DataFrame) =
      Similarity.ivfAssign(d, cents, "vec_id", "embedding", "cid")
        .select(col("vec_id"), col("embedding"), col("cluster"))
    val dir = java.nio.file.Files.createTempDirectory("r12ivf").toString + "/idx"

    val base = emb.where($"vec_id" % 10 =!= 0L)
    Similarity.writeIvfIndex(rows(base), dir)
    // append NEW ids before any map exists, then an update that
    // backfills the sidecar, then a second update that must use it
    Similarity.appendToIvfIndex(spark,
      rows(emb.where($"vec_id" % 10 === 0L && $"vec_id" < 100L)), dir, "a1")
    val u1 = emb.where($"vec_id".isin(1L, 11L))
      .select($"vec_id", $"embedding", lit("D").as("op"))
    Similarity.updateIvfIndex(spark, u1, cents, "vec_id", "embedding",
      "cid", "op", dir, "u1")
    val mapFiles = new java.io.File(dir + "_idmap").listFiles()
    println(s"[info] map partitions after u1: ${if (mapFiles == null) 0 else mapFiles.count(_.getName.startsWith("id_bucket="))}")
    val nv = emb.orderBy($"vec_id".desc).select("embedding").as[Seq[Float]].head()
    val u2 = Seq(2L).toDF("vec_id")
      .select($"vec_id", typedLit(nv).as("embedding"), lit("U").as("op"))
      .unionByName(Seq((21L, "D")).toDF("vec_id", "op")
        .withColumn("embedding", lit(null).cast(emb.schema("embedding").dataType))
        .select("vec_id", "embedding", "op"))
    Similarity.updateIvfIndex(spark, u2, cents, "vec_id", "embedding",
      "cid", "op", dir, "u2")
    // replay must no-op
    Similarity.updateIvfIndex(spark, u2, cents, "vec_id", "embedding",
      "cid", "op", dir, "u2")

    val merged = base.unionByName(emb.where($"vec_id" % 10 === 0L && $"vec_id" < 100L))
      .where(!$"vec_id".isin(1L, 11L, 2L, 21L))
      .unionByName(Seq(2L).toDF("vec_id").select($"vec_id", typedLit(nv).as("embedding")))
    val freshDir = java.nio.file.Files.createTempDirectory("r12ivf_f").toString + "/idx"
    Similarity.writeIvfIndex(rows(merged), freshDir)
    def contents(d: String) = spark.read.parquet(d)
      .select($"vec_id", $"cluster".cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = contents(dir); val want = contents(freshDir)
    println(s"[info] expect ${want.size} rows, got ${got.size} rows, match=${got == want}")
    // the map itself must mirror the index's (id, cluster) pairs
    val mapPairs = spark.read.parquet(dir + "_idmap")
      .select($"vec_id", $"cluster".cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[info] map==index pairs: ${mapPairs == want}")
    require(got == want && mapPairs == want && got.nonEmpty, "ivf map drive failed")
    println("[info] DriveR12IvfMap OK")
    spark.stop()
  }
}
