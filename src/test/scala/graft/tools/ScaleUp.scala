package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe data amplifier: replicate the sf0.1 tables `reps`× with
  * key-space offsets (consistent across FK relationships) into a local
  * scratch dir, to surface operators whose constant factors hide at
  * sf0.1 — NOT a substitute for the driver's testdata (correctness still
  * gates on /root/testdata; this output is uncommitted scratch).
  *
  * Replicas keep dimension tables (region/nation) shared, shift every
  * PK/FK by `i * 1e9`, de-duplicate document texts per replica (so the
  * dedup family sees 10× corpus, not 10 exact copies of each doc), and
  * keep embeddings identical (stress: sign-LSH buckets grow 10×, pair
  * generation must survive via the bucket caps).
  *
  * Usage: Test/runMain graft.tools.ScaleUp [reps] [outDir]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 10
    val out = if (args.length > 1) args(1) else "/root/repo/target/sfx"
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val OFF = 1000000000L
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
    def amplify(t: String)(shift: (DataFrame, Long) => DataFrame): Unit = {
      val base = read(t)
      val all = (0 until reps).map(i => shift(base, i * OFF)).reduce(_ unionByName _)
      write(all, t)
      println(s"[scaleup] $t -> ${reps}x")
    }

    // shared dimensions: single copy
    write(read("region"), "region")
    write(read("nation"), "nation")

    amplify("customer")((df, o) => df.withColumn("c_custkey", col("c_custkey") + o))
    amplify("supplier")((df, o) => df.withColumn("s_suppkey", col("s_suppkey") + o))
    amplify("part")((df, o) => df.withColumn("p_partkey", col("p_partkey") + o))
    amplify("orders")((df, o) => df
      .withColumn("o_orderkey", col("o_orderkey") + o)
      .withColumn("o_custkey", col("o_custkey") + o))
    amplify("lineitem")((df, o) => df
      .withColumn("l_orderkey", col("l_orderkey") + o)
      .withColumn("l_partkey", col("l_partkey") + o)
      .withColumn("l_suppkey", col("l_suppkey") + o))
    amplify("events")((df, o) => df
      .withColumn("event_id", col("event_id") + o)
      .withColumn("user_id", col("user_id") + o))
    amplify("documents")((df, o) => df
      .withColumn("doc_id", col("doc_id") + o)
      .withColumn("text",
        if (o == 0L) col("text") else concat(col("text"), lit(s" replica $o"))))
    amplify("embeddings")((df, o) => df.withColumn("vec_id", col("vec_id") + o))
    spark.stop()
  }
}
