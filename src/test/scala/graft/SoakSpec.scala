package graft

import graft.cdc.TableConfig
import graft.io.{CdcPipeline, Compaction}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Multi-batch soak: 15 sequential CDC merges against one table, with a
  * mid-stream compaction. Invariants checked after every batch: lake
  * contents equal an independently-maintained model, and file count stays
  * bounded (copy-on-write deletes superseded files; compaction resets
  * fragmentation).
  */
class SoakSpec extends SparkSpec {
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

  test("15 sequential merges with mid-stream compaction stay consistent with a model") {
    val lake = Files.createTempDirectory("lakeSoak").toString + "/db/t"
    val raw = Files.createTempDirectory("rawSoak").toString + "/db/t"
    val cfg = TableConfig(Seq("id"), Nil, active = true)
    val rnd = new scala.util.Random(42)

    var model = (1 to 200).map(i => i -> ("I", s"v$i")).toMap
    writeFile(model.toSeq.sortBy(_._1).map { case (id, (op, v)) => (op, id, v) }
      .toDF("Op", "id", "v"), raw, "LOAD00000001.parquet")
    CdcPipeline.loadInitial(spark, Seq(s"$raw/LOAD00000001.parquet"), lake, cfg)

    (1 to 15).foreach { batch =>
      // random ops: 10 updates, 3 deletes of live keys, 3 inserts of new keys
      val live = model.keys.toSeq.sorted
      val upd = rnd.shuffle(live).take(10).map(id => ("U", id, s"b$batch-$id"))
      val del = rnd.shuffle(live.diff(upd.map(_._2))).take(3).map(id => ("D", id, "x"))
      val ins = (1 to 3).map(i => ("I", 1000 + batch * 10 + i, s"new$batch-$i"))
      val ops = rnd.shuffle(upd ++ del ++ ins)
      val fname = f"20260812-$batch%06d.parquet"
      writeFile(ops.toDF("Op", "id", "v"), raw, fname)
      CdcPipeline.loadIncremental(spark, Seq(s"$raw/$fname"), lake, cfg)
      // maintain the model (each key appears once per batch → order-free)
      ops.foreach {
        case ("D", id, _) => model -= id
        case (op, id, v) => model += id -> (op, v)
      }
      if (batch == 8) Compaction.compact(spark, lake, Seq("id"))
      val got = spark.read.parquet(lake).select("id", "Op", "v").collect()
        .map(r => r.getInt(0) -> (r.getString(1), r.getString(2))).toMap
      assert(got == model, s"divergence after batch $batch")
    }
    // copy-on-write file accounting: far fewer files than 16 writes would
    // naively leave if superseded files weren't deleted
    val files = new java.io.File(lake).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files <= 16, s"file count $files not bounded")
  }
}
