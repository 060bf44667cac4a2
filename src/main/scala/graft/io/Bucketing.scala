package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables for shuffle-free co-located joins.
  *
  * The repeated big join in this engine is fact ⋈ fact on a shared key
  * (e.g. lineitem ⋈ orders on orderkey at 100 TB — neither side
  * broadcastable). Writing both sides bucketed by the join key lets every
  * subsequent join run with zero exchanges: Spark matches the output
  * partitioning of the bucketed scans to the join requirement.
  *
  * Bucket metadata lives in the session catalog (`saveAsTable`); on a
  * real deployment that is the shared metastore.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    sorted: Boolean = true): Unit = {
    require(buckets > 0)
    val w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Append rows into an existing bucketed table, preserving the bucket
    * layout (the spec must match the table's; `saveAsTable` validates).
    * Each append adds one file per non-empty bucket — readers still get
    * exchange-free joins (bucket files group by bucket id), at the cost
    * of file-count growth: compact periodically (re-`writeBucketed`) on a
    * high-churn table. */
  def appendBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                     sorted: Boolean = true): Unit = {
    require(buckets > 0)
    val w = df.write.mode("append").format("parquet").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  def readBucketed(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
