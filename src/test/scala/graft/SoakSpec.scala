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

  test("conditional MOR soak: 12 guarded merges + threshold maintenance stay consistent with a model") {
    // the round-12 CDC surface end-to-end: updateWhen on a merge-on-read
    // table (matched rows whose CURRENT value is 'locked' reject
    // updates, deletes/inserts ride), with the auto-maintenance loop
    // firing mid-soak (compact + vacuum through maintainIfNeeded) —
    // guard decisions must survive the rewrite.
    import graft.cdc.Merge
    import graft.io.MorTable
    val base = Files.createTempDirectory("morSoak").toString + "/t"
    val rnd = new scala.util.Random(7)
    val guard = col("t.v") =!= "locked"

    var model = (1 to 150).map(i => i.toLong -> s"v$i").toMap
    MorTable.init(spark, model.toSeq.sortBy(_._1)
      .map { case (id, v) => ("I", id, v) }.toDF("Op", "id", "v"), base)

    var maintenanceFired = 0
    (1 to 12).foreach { batch =>
      val live = model.keys.toSeq.sorted
      val upd = rnd.shuffle(live).take(12).map { id =>
        val v = if (rnd.nextInt(5) == 0) "locked" else s"b$batch-$id"
        ("U", id, v)
      }
      val del = rnd.shuffle(live.diff(upd.map(_._2))).take(3).map(id => ("D", id, "x"))
      val ins = (1 to 3).map(i => ("I", 10000L + batch * 10 + i, s"new$batch-$i"))
      val ops = rnd.shuffle(upd ++ del ++ ins)
      MorTable.merge(spark,
        ops.toDF("Op", "id", "v").withColumn(Merge.FileSeq, lit(batch.toLong)),
        base, Seq("id"), updateWhen = Some(guard))
      ops.foreach {
        case ("D", id, _) => model -= id
        case ("U", id, v) => if (model(id) != "locked") model += id -> v
        case ("I", id, v) => model += id -> v
      }
      if (MorTable.maintainIfNeeded(spark, base,
          maxAmplification = 0.3, clusterBy = Seq("id")).isDefined)
        maintenanceFired += 1
      val got = MorTable.read(spark, base).select("id", "v").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == model, s"divergence after guarded batch $batch")
    }
    assert(maintenanceFired > 0,
      "fixture must trip the maintenance threshold at least once")
    // locked rows survived every later update attempt
    assert(model.values.exists(_ == "locked"))
  }
}
