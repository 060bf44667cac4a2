package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbePct {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]").appName("pct")
      .config("spark.ui.enabled", false).getOrCreate()
    import spark.implicits._
    for ((n, p) <- Seq((10, 0.2), (10, 0.25), (7, 0.2), (5, 0.2), (1, 0.2), (4, 0.5), (10, 0.0))) {
      val df = (1 to n).toDF("x")
      val r = df.agg(percentile_approx(col("x"), lit(p), lit(100000))).first().get(0)
      println(s"PROBE n=$n p=$p spark percentile_approx=$r")
    }
    spark.stop()
  }
}
