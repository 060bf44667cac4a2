package graft.io

import graft.SparkSpec
import org.apache.hadoop.fs.Path

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def managedLocation(table: String): Path =
    new Path(spark.catalog.getDatabase(spark.catalog.currentDatabase).locationUri,
      table.toLowerCase(java.util.Locale.ROOT))

  test("writeBucketed overwrites an ORPHANED location (catalog lost, files survived)") {
    // The crashed-write / metastore-lost state: the managed table's
    // directory exists on disk but the catalog has no entry. A naive
    // saveAsTable takes the CREATE path and dies with
    // LOCATION_ALREADY_EXISTS; the hardened path must clear and write.
    val table = "bucketing_orphan_spec"
    val loc = managedLocation(table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(loc)
    fs.create(new Path(loc, "stale-file.parquet")).close()
    assert(!spark.catalog.tableExists(table) && fs.exists(loc))

    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Bucketing.writeBucketed(df, table, "k", buckets = 2)
    assert(spark.table(table).count() == 2)
    assert(!fs.exists(new Path(loc, "stale-file.parquet")))
    spark.sql(s"DROP TABLE $table")
  }

  test("writeBucketed twice over the same table succeeds (catalog present → plain overwrite)") {
    val table = "bucketing_rewrite_spec"
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    Bucketing.writeBucketed(df, table, "k", buckets = 2)
    Bucketing.writeBucketed(df.where($"k" =!= 3L), table, "k", buckets = 2)
    assert(spark.table(table).count() == 2)
    spark.sql(s"DROP TABLE $table")
  }

  test("writeBm25Index is re-runnable after the catalog entry is lost") {
    // Same orphan state, via the Retrieval write path (postings + stats
    // sidecar both overwrite managed tables).
    val table = "bm25_orphan_spec"
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    graft.ops.Retrieval.writeBm25Index(docs, "doc_id", "text", table, buckets = 2)
    // Simulate metastore loss: drop catalog entries WITHOUT deleting the
    // locations (move files aside and back across the drop).
    val fs = managedLocation(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sidecars = Seq(table, table + "_docs", table + "_segments", table + "_tombstones")
    for (t <- sidecars) {
      val loc = managedLocation(t)
      val aside = new Path(loc.getParent, t + "__aside")
      fs.rename(loc, aside)
      spark.sql(s"DROP TABLE $t")
      fs.rename(aside, loc)
      assert(!spark.catalog.tableExists(t) && fs.exists(loc))
    }
    graft.ops.Retrieval.writeBm25Index(docs, "doc_id", "text", table, buckets = 2)
    assert(spark.table(table).count() > 0 &&
      spark.table(table + "_segments").count() == 1)
    sidecars.foreach(t => spark.sql(s"DROP TABLE $t"))
  }
}
