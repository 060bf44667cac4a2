package graft

import graft.cdc.TableConfig
import graft.io.CdcPipeline
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Schema evolution through the FILE pipeline: a CDC batch introduces a
  * new column; only impacted files are rewritten, so the lake dir holds
  * mixed schemas — reads must still surface the union schema. */
class EvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def writeFile(df: DataFrame, dir: String, name: String): Unit = {
    val tmp = Files.createTempDirectory("stage").toString
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/$name"))
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  test("new CDC column survives copy-on-write merge with mixed-schema target") {
    val lake = Files.createTempDirectory("lake").toString + "/db/t"
    val raw = Files.createTempDirectory("raw").toString + "/db/t"
    // two target files, old schema (no 'note' column)
    writeFile((1 to 10).map(i => ("I", i, s"v$i")).toDF("Op", "id", "v"), lake, "part-a.parquet")
    writeFile((11 to 20).map(i => ("I", i, s"v$i")).toDF("Op", "id", "v"), lake, "part-b.parquet")
    // CDC batch adds 'note', touches only key 3 (file part-a)
    writeFile(Seq(("U", 3, "NEW", "annotated")).toDF("Op", "id", "v", "note"),
      raw, "20260812-1.parquet")
    CdcPipeline.loadIncremental(spark, Seq(s"$raw/20260812-1.parquet"), lake,
      TableConfig(Seq("id"), Nil, active = true))
    // lake now holds: rewritten file (4 cols incl. note) + part-b (3 cols)
    val back = spark.read.option("mergeSchema", "true").parquet(lake)
    assert(back.columns.contains("note"), s"union schema lost: ${back.columns.toSeq}")
    assert(back.count() == 20)
    val m = back.select("id", "note").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(m(3) == "annotated" && m(11) == null)
    // and a SECOND merge over the mixed-schema target must not lose 'note'
    writeFile(Seq(("U", 12, "NEWER", null)).toDF("Op", "id", "v", "note"),
      raw, "20260812-2.parquet")
    CdcPipeline.loadIncremental(spark, Seq(s"$raw/20260812-2.parquet"), lake,
      TableConfig(Seq("id"), Nil, active = true))
    val back2 = spark.read.option("mergeSchema", "true").parquet(lake)
    assert(back2.columns.contains("note"))
    val m2 = back2.select("id", "note").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(m2(3) == "annotated", "previously-evolved value lost by second merge")
    // THIRD merge rewrites the evolved file itself (key 4 shares key 3's
    // file): the target read must use the union schema or key 3's 'note'
    // bystander value silently drops when inference picks an old footer.
    writeFile(Seq(("U", 4, "NEWEST", null)).toDF("Op", "id", "v", "note"),
      raw, "20260812-3.parquet")
    CdcPipeline.loadIncremental(spark, Seq(s"$raw/20260812-3.parquet"), lake,
      TableConfig(Seq("id"), Nil, active = true))
    val back3 = spark.read.option("mergeSchema", "true").parquet(lake)
    val m3 = back3.select("id", "note").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(m3(3) == "annotated", "evolved bystander value lost when its file was rewritten")
  }
}
