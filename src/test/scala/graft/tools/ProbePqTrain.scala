package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measure PQ ADC shortlist recall: trained codebook (kMeansSub) vs the
  * untrained first-16 stand-in, against brute-force squared L2.
  * Usage: Test/runMain graft.tools.ProbePqTrain [iters...]
  */
object ProbePqTrain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where($"vec_id" % 100 === 0).select($"vec_id".as("qid"), $"embedding")
    val qv = e.where($"vec_id" % 100 === 0).select($"vec_id".as("qid"), $"embedding".as("qv"))
    val exact = e.crossJoin(broadcast(qv)).where($"qid" =!= $"vec_id")
      .select($"qid", $"vec_id",
        aggregate(zip_with($"embedding", $"qv",
          (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
          lit(0.0), (a, d) => a + d).as("d2"))
      .withColumn("rank", row_number().over(Window.partitionBy("qid").orderBy($"d2", $"vec_id")))
      .where($"rank" <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def recall(cb: org.apache.spark.sql.DataFrame): Double = {
      val codes = Similarity.pqCodes(e, cb, "vec_id", "embedding", "cid", m = 4)
        .select("vec_id", "pq_code")
      val approx = Similarity.pqKnn(codes, q, cb, "vec_id", "embedding", "qid", "cid",
        m = 4, k = 50)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      approx.intersect(exact).size.toDouble / exact.size
    }
    val standIn = e.where($"vec_id" < 16).select($"vec_id".as("cid"), $"embedding")
    println(f"[pq] stand-in recall: ${recall(standIn)}%.3f")
    val iters = if (args.isEmpty) Seq(1, 2, 4) else args.map(_.toInt).toSeq
    iters.foreach { i =>
      val trained = Similarity.kMeansSub(e, "vec_id", "embedding", "cid", m = 4, k = 16, iters = i)
      println(f"[pq] trained iters=$i recall: ${recall(trained)}%.3f")
    }
    spark.stop()
  }
}
