package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Round-11 probe: [[Dedup.refreshCommunityIndex]]'s per-delivery cost
  * must track the TOUCHED components, not the corpus. Corpus = 4-doc
  * near-dup families with family-specific vocabulary (cross-family
  * overlap ~0); a fixed 20-doc delivery touches 20 families. Compare
  * refresh wall time at 1× and 10× corpus, and against the full
  * rebuild at 10×. Scratch tool; results in SCALE.md.
  *
  * Usage: Test/runMain graft.tools.ProbeCommunityRefresh
  */
object ProbeCommunityRefresh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def mk(n: Long): DataFrame = {
      val fam = (col("id") / 4L).cast("long")
      spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ",
          (0 until 10).map(i =>
            concat(lit(s"w${i}_"), pmod(fam * (i * 31 + 7), lit(9973L)))) :+
            concat(lit("doc"), col("id")): _*).as("text"))
    }

    def probe(n: Long, tag: String): (Double, Double) = {
      val idx = s"comm_probe_${tag}_${System.nanoTime()}"
      val path = Files.createTempDirectory(s"commP$tag").toString + "/t"
      val corpus = mk(n).localCheckpoint(true)
      Dedup.writeLshIndex(corpus, "doc_id", "text", idx, buckets = 8)
      val t0 = System.nanoTime()
      Dedup.buildCommunityIndex(spark, idx, path): Unit
      val build = (System.nanoTime() - t0) / 1e9
      // fixed delivery: 20 docs across 20 families rewritten in place
      val delivery = corpus.where(col("doc_id") % 4 === 0 && col("doc_id") < 80)
        .select(col("doc_id"), concat(col("text"), lit(" changed")).as("text"),
          lit("U").as("op")).localCheckpoint(true)
      Dedup.updateLshIndex(spark, delivery, "doc_id", "text", "op", idx,
        buckets = 8, batchId = "p1")
      val t1 = System.nanoTime()
      Dedup.refreshCommunityIndex(spark, idx, path,
        delivery.select("doc_id")): Unit
      val refresh = (System.nanoTime() - t1) / 1e9
      spark.sql(s"DROP TABLE IF EXISTS $idx")
      (build, refresh)
    }

    val (b1, r1) = probe(20000L, "a")
    val (b10, r10) = probe(200000L, "b")
    println(f"[comm-refresh] 20k docs: full build=$b1%.1f s, 20-doc refresh=$r1%.1f s")
    println(f"[comm-refresh] 200k docs: full build=$b10%.1f s, 20-doc refresh=$r10%.1f s")
    println(f"[comm-refresh] 10x-corpus refresh ratio=${r10 / r1}%.2f (flat = 1.0); refresh vs rebuild at 10x = ${r10 / b10}%.2f")
    spark.stop()
  }
}
