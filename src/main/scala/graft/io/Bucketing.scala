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

  /** Delete a managed table's default filesystem location when the
    * catalog has NO entry for the table — exactly the state a crashed
    * write (or a metastore that did not survive the JVM while the
    * warehouse directory did) leaves behind. Without this,
    * `mode("overwrite").saveAsTable` takes the CREATE path on the
    * missing catalog entry and dies with LOCATION_ALREADY_EXISTS on the
    * stale directory. No-op when the table exists (overwrite handles
    * it) or the location is absent. */
  def clearOrphanLocation(spark: SparkSession, table: String): Unit =
    if (!spark.catalog.tableExists(table)) {
      val parts = table.split('.')
      val (db, tbl) =
        if (parts.length == 2) (parts(0), parts(1))
        else (spark.catalog.currentDatabase, parts.last)
      val loc = new org.apache.hadoop.fs.Path(
        spark.catalog.getDatabase(db).locationUri,
        tbl.toLowerCase(java.util.Locale.ROOT))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    sorted: Boolean = true): Unit = {
    require(buckets > 0)
    clearOrphanLocation(df.sparkSession, table)
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
