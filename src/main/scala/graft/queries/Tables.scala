package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata table readers (TESTDATA.md). One parquet file per table. */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"${sfDir.stripSuffix("/")}/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which vanilla Spark 4 refuses
    * to read; the legacy flag surfaces it as nanos-since-epoch LONG, which
    * preserves ordering/equality (we never output `ts` itself, so oracle
    * comparison is unaffected). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(spark, sfDir, "events")
  }
}
