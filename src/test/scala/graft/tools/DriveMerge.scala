package graft.tools
import org.apache.spark.sql.{SparkSession, functions => F}
import graft.cdc.Merge
/** Scratch end-to-end driver for manual verification (test scope). */
object DriveMerge {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val target = Merge.tagInitial(orders)
    println(s"target rows: ${target.count}")
    val upd = orders.filter($"o_orderkey".isin(1L, 2L, 3L))
      .withColumn("Op", F.lit("U")).withColumn("o_totalprice", $"o_totalprice" + 1000.0)
    val del = orders.filter($"o_orderkey".isin(4L, 5L)).withColumn("Op", F.lit("D"))
    val ins = orders.orderBy($"o_orderkey".desc).limit(1)
      .withColumn("o_orderkey", $"o_orderkey" + 1000000L).withColumn("Op", F.lit("I"))
    val changes = upd.unionByName(del).unionByName(ins).withColumn("file_seq", F.lit(1L))
    val merged = Merge.mergeCdc(target, changes, Seq("o_orderkey"), Seq($"o_orderkey"))
    val outDir = java.nio.file.Files.createTempDirectory("lake").toString + "/orders"
    merged.write.mode("overwrite").parquet(outDir)
    val back = spark.read.parquet(outDir)
    println(s"merged rows: ${back.count} (expect ${orders.count - 2 + 1})")
    back.filter($"o_orderkey".isin(1L, 2L, 3L))
      .select("o_orderkey", "Op", "o_totalprice").orderBy("o_orderkey").show()
    println("deleted keys present (expect 0): " + back.filter($"o_orderkey".isin(4L, 5L)).count)
    println("inserted key present (expect 1): " + back.filter($"o_orderkey" > 999999L).count)
    try { Merge.mergeCdc(target, changes, Seq(), Seq($"o_orderkey")); println("PROBE-NOPK: no error (BAD)") }
    catch { case e: IllegalArgumentException => println("PROBE-NOPK ok: " + e.getMessage) }
    val replay = Merge.mergeCdc(back, changes, Seq("o_orderkey"), Seq($"o_orderkey"))
    println("replay row delta (expect 0): " + (replay.count - back.count))
    spark.stop()
  }
}
