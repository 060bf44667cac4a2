package graft.tools
import graft.queries.RelationalQueries
import org.apache.spark.sql.SparkSession
object ProfileJoinAgg {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/target/sfx"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val q = RelationalQueries.queries("rel_join_agg")(spark, dir)
    time("run1")(q.write.format("noop").mode("overwrite").save())
    time("run2")(q.write.format("noop").mode("overwrite").save())
    q.explain("formatted")
    spark.stop()
  }
}
