package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Testdata table readers (TESTDATA.md). One parquet file per table. */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"${sfDir.stripSuffix("/")}/$name.parquet")

  /** `events` with `ts` normalized to the nanos-since-epoch LONG contract
    * every consumer assumes (`ts div 1000` → micros).
    *
    * The generated table has shipped in two layouts: parquet
    * TIMESTAMP(NANOS) — which vanilla Spark 4 refuses to read, so the
    * legacy flag surfaces it as a nanos LONG directly — and plain
    * TIMESTAMP(MICROS), which Spark reads as TIMESTAMP_NTZ. For the
    * latter, `unix_micros(cast to timestamp)` under the suite's fixed UTC
    * session timezone recovers the exact epoch micros (the same statistic
    * DuckDB's `epoch_us(ts)` computes in the oracles), and ×1000 restores
    * the nanos contract (epoch nanos ≈ 1.8e18 ≪ Long.Max — no overflow).
    * We never output `ts` itself, so oracle comparison is unaffected. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case LongType => df
      case _ => df.withColumn("ts",
        unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }
  }
}
