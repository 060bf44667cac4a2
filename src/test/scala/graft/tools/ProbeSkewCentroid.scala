package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the bounded centroid fold: a 90%-in-one-cluster
  * assignment (the head-heavy shape real corpus clusterings have) at 1×
  * and 10× rows. The sliced two-phase fold must stay ~linear (vs-linear
  * ratio = t(10×)/(10·t(1×)) well under 1) and survive the skew that
  * would OOM a single per-(cluster, dim) collect_list of the whole
  * membership. Scratch tool; results recorded in SCALE.md.
  *
  * Usage: Test/runMain graft.tools.ProbeSkewCentroid [millionsOfRows] [dims]
  */
object ProbeSkewCentroid {
  def main(args: Array[String]): Unit = {
    val millions = if (args.nonEmpty) args(0).toInt else 1
    val dims = if (args.length > 1) args(1).toInt else 16
    val n = millions * 1000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 90% of vectors in cluster 0, the rest spread over 7 clusters;
    // synthetic float components that vary per (id, dim)
    def mk(rows: Long): DataFrame = spark.range(rows).select(
      col("id").as("vec_id"),
      when(pmod(col("id"), lit(10L)) =!= 0L, 0L)
        .otherwise(pmod(col("id"), lit(7L)) + 1L).as("cluster"),
      transform(sequence(lit(1), lit(dims)),
        d => pmod(col("id") * 31L + d.cast("long") * 17L, lit(1000L))
          .cast("float") / 1000f).as("embedding"))

    def time(rows: Long): Double = {
      val df = graft.ops.Similarity.centroidUpdate(mk(rows), "vec_id", "embedding")
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def best2(rows: Long): Double = math.min(time(rows), time(rows))

    time(100000L) // warm-up
    val t1 = best2(n)
    val t10 = best2(n * 10)
    println(f"[probe] centroidUpdate 90%%-one-cluster: ${millions}M rows x $dims dims = $t1%.1f s, " +
      f"10x = $t10%.1f s, vs-linear ratio = ${t10 / (10 * t1)}%.2f")
    spark.stop()
  }
}
