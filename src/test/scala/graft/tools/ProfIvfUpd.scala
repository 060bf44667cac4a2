package graft.tools
import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfIvfUpd {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint(true)
    val cents = Similarity.kMeans(emb, "vec_id", "embedding", "cid", k = 16, iters = 3)
      .localCheckpoint(true)
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val dir = java.nio.file.Files.createTempDirectory("profivf").toString + "/idx"
    t("writeIvfIndex") {
      Similarity.writeIvfIndex(Similarity.ivfAssign(emb, cents, "vec_id", "embedding", "cid")
        .select(col("vec_id"), col("embedding"), col("cluster")), dir)
    }
    val changes = emb.where($"vec_id" % 7 === 1L)
      .select($"vec_id", $"embedding", lit("U").as("op"))
      .unionByName(emb.where($"vec_id" % 7 === 3L)
        .select($"vec_id", $"embedding", lit("D").as("op"))).localCheckpoint(true)
    t("buildIvfIdMap") { Similarity.buildIvfIdMap(spark, dir, "vec_id") }
    t("updateIvfIndex") {
      Similarity.updateIvfIndex(spark, changes, cents, "vec_id", "embedding",
        "cid", "op", dir, "u1")
    }
    spark.stop()
  }
}
