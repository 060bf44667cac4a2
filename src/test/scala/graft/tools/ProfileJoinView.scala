package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off phase profiler for cdc_incr_join_after_ingest: times each
  * delivery phase separately so optimization targets the real cost. */
object ProfileJoinView {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.plans.GraftOptimizations.install(spark)
    spark.sparkContext.setLogLevel("WARN")
    // job-duration listener: find the slow jobs inside a delivery
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (js.time,
          Option(js.properties.getProperty("callSite.short")).getOrElse("?")))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, d) = jobs.getOrDefault(je.jobId, (je.time, "?"))
        val sec = (je.time - t0) / 1e3
        println(f"[job] ${je.jobId}%4d ${sec}%7.2f s  $d")
      }
    })
    import graft.queries.Tables
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }
    // mirror the query body, phase-timed
    val dirTmp = java.nio.file.Files.createTempDirectory("pjv").toString
    (1 to 2).foreach { round =>
      println(s"== round $round")
      val base = s"$dirTmp/r$round"
      val factCfg = graft.cdc.TableConfig(Seq("o_orderkey"), Nil, active = true)
      val viewCfg = graft.cdc.TableConfig(Seq("o_orderkey"), Nil, active = true)
      val dim = Tables(spark, sfDir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"), col("c_acctbal"))
      val target = graft.queries.CdcQueries.target(spark, sfDir)
      val chg = graft.queries.CdcQueries.changes(spark, sfDir)
      t("fixture: fact overwrite") {
        target.write.mode("overwrite").parquet(s"$base/fact")
      }
      t("fixture: view overwrite") {
        target.drop(graft.cdc.Op.column)
          .join(dim, Seq("o_custkey"), "left")
          .withColumn(graft.cdc.Op.column, lit(graft.cdc.Op.Insert))
          .write.mode("overwrite").parquet(s"$base/view")
      }
      def tag(df: DataFrame, name: String) = df
        .withColumn(graft.io.CdcPipeline.SrcFile, lit(name))
        .withColumn(graft.io.CdcPipeline.RowIdx, lit(0L))
      Seq(1L, 2L).foreach { i =>
        t(s"delivery $i") {
          graft.streaming.JoinViewStream.ingestBatch(
            tag(chg.where(col(graft.cdc.Merge.FileSeq) === i)
              .drop(graft.cdc.Merge.FileSeq), f"2026010${i + 1}%d-000000"),
            s"$base/fact", s"$base/view", dim,
            Seq("o_orderkey"), Seq("o_custkey"), factCfg, viewCfg, i)
        }
      }
      t("read-back noop") {
        spark.read.parquet(s"$base/view")
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "c_mktsegment", "c_acctbal")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
