package graft.tools
import org.apache.spark.sql.{SparkSession, functions => F}
import graft.cdc.Merge
import graft.ops.Dedup
/** Scale smoke: replicate testdata 8x (shifted keys) and time the flagship
  * operators — validates near-linear scaling of the plan shapes. */
object ScaleSmoke {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"$label%-36s ${(System.nanoTime()-t0)/1e9}%6.1f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val orders = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    def rep(n: Int) = (0 until n).map(i =>
      orders.withColumn("o_orderkey", $"o_orderkey" + F.lit(i.toLong * 10000000L)))
      .reduce(_.unionByName(_))
    for (n <- Seq(1, 4, 8)) {
      val big = rep(n)
      val target = big.withColumn("Op", F.lit("I"))
      val changes = big.where($"o_orderkey" % 10 === 0)
        .withColumn("Op", F.lit("U")).withColumn("o_totalprice", $"o_totalprice" + 1.0)
        .withColumn("file_seq", F.lit(1L))
      time(s"cdc_merge ${n}x (${n*150}k target rows)") {
        noop(Merge.mergeCdc(target, changes, Seq("o_orderkey"), Nil))
      }
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def repD(n: Int) = (0 until n).map(i =>
      docs.withColumn("doc_id", $"doc_id" + F.lit(i.toLong * 1000000L)))
      .reduce(_.unionByName(_))
    for (n <- Seq(1, 4, 8)) {
      time(s"dedup_exact ${n}x (${n*5}k docs)") {
        noop(Dedup.exact(repD(n), "doc_id", "text"))
      }
      time(s"minhash_lsh_pairs ${n}x") {
        noop(Dedup.lshCandidatePairs(repD(n), "doc_id", "text", 3, 16, 4, 1000))
      }
    }
    spark.stop()
  }
}
