package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Introspection scratch: print the optimized-plan expression tree of
  * the ordered-fold idiom so OrderedFoldRule's matcher is written
  * against the REAL tree, not a guess. */
object ShowFoldPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq((1L, 2L, 0.5), (1L, 1L, 0.25)).toDF("g", "o", "v")
      .groupBy("g")
      .agg(
        aggregate(
          array_sort(collect_list(struct(col("o"), col("v")))),
          lit(0.0), (acc, s) => acc + s.getField("v")).as("fold"),
        count(lit(1)).as("n"))
    val opt = df.queryExecution.optimizedPlan
    println(opt.treeString)
    opt.foreach {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        a.aggregateExpressions.foreach { e =>
          println("=== result expr ===")
          println(e.treeString)
          e.foreach(x => println(s"  node: ${x.getClass.getName} :: ${x.simpleString(80)}"))
        }
      case _ => ()
    }
    spark.stop()
  }
}
