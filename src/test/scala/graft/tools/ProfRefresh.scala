package graft.tools

import graft.ops.Dedup
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Job-level profile of Dedup.refreshCommunityIndex on the sf0.1
  * fixture — where the fixed per-delivery floor actually goes. */
object ProfRefresh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text").localCheckpoint(true)
    val table = s"prof_refresh_${System.nanoTime()}"
    val path = java.nio.file.Files.createTempDirectory("profRef").toString + "/t"
    Dedup.writeLshIndex(d, "doc_id", "text", table, buckets = 8)
    Dedup.buildCommunityIndex(spark, table, path)
    val changes = d.where($"doc_id" % 97 === 1L)
      .select($"doc_id", concat($"text", lit(" incr delivery")).as("text"),
        lit("U").as("op"))
      .unionByName(d.where($"doc_id" % 97 === 3L)
        .select($"doc_id", lit(null).cast("string").as("text"), lit("D").as("op")))
      .localCheckpoint(true)
    Dedup.updateLshIndex(spark, changes, "doc_id", "text", "op", table,
      buckets = 8, batchId = "p1")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("callSite.short")).getOrElse("?")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, cs) = starts.getOrDefault(j.jobId, (System.nanoTime(), "?"))
        lines.add(f"[job] ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f  $cs")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    Dedup.refreshCommunityIndex(spark, table, path, changes.select("doc_id"))
    val dt = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    lines.asScala.foreach(println)
    println(f"[prof] refresh total: $dt%.2f s, jobs: ${lines.size}")
    spark.sql(s"SHOW TABLES LIKE '$table*'").collect()
      .foreach(r => spark.sql(s"DROP TABLE IF EXISTS ${r.getAs[String]("tableName")}"))
    spark.stop()
  }
}
