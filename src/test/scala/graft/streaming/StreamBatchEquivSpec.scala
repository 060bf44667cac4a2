package graft.streaming

import graft.SparkSpec
import graft.cdc.{Op, TableConfig}
import graft.io.CdcPipeline
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.Trigger
import org.scalacheck.{Gen, Prop, Test => SCTest}
import java.nio.file.Files

/** End-to-end streaming/batch equivalence (extends MergePropertySpec's
  * batch-split invariance to the checkpoint-recovery path): for arbitrary
  * op sequences split across CDC files, applying them through CdcStream —
  * one file per micro-batch, with a full stop/restart from the checkpoint
  * mid-stream — must leave the lake in exactly the state one batch
  * `loadIncremental` of all files produces.
  */
class StreamBatchEquivSpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  private case class Change(op: String, id: Int, v: Int, file: Int, pos: Long)

  private val genOps: Gen[List[Change]] = for {
    n <- Gen.choose(1, 40)
    nFiles <- Gen.choose(2, 4)
    ops <- Gen.listOfN(n, for {
      op <- Gen.oneOf(Op.Insert, Op.Update, Op.Delete)
      id <- Gen.choose(1, 10) // small key space → per-key collisions
      v <- Gen.choose(0, 1000)
    } yield (op, id, v))
  } yield {
    val chunk = math.max(1, (ops.size + nFiles - 1) / nFiles)
    ops.zipWithIndex.map { case ((op, id, v), i) =>
      Change(op, id, v, i / chunk, (i % chunk).toLong)
    }
  }

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

  private def lakeState(path: String): Set[(String, Int, Int)] =
    if (!new java.io.File(path).exists()) Set.empty
    else spark.read.parquet(path).collect()
      .map(r => (r.getAs[String]("Op"), r.getAs[Int]("id"), r.getAs[Int]("v"))).toSet

  test("streamed micro-batches + mid-stream restart ≡ one batch merge") {
    val cfg = TableConfig(Seq("id"), Nil, active = true)
    check(Prop.forAll(genOps) { changes =>
      val root = Files.createTempDirectory("equiv").toString
      val raw = s"$root/raw"
      val lakeS = s"$root/lakeS"
      val lakeB = s"$root/lakeB"
      val ckpt = s"$root/ckpt"

      // Shared fixture: a LOAD snapshot seeds both lakes identically.
      val load = Seq(("I", 1, -1), ("I", 2, -2), ("I", 3, -3)).toDF("Op", "id", "v")
      writeFile(load, raw, "LOAD00000001.parquet")
      val cdcNames = changes.groupBy(_.file).toSeq.sortBy(_._1).map { case (f, rows) =>
        val name = f"20260812-${f + 1}%06d.parquet"
        writeFile(rows.sortBy(_.pos).map(c => (c.op, c.id, c.v)).toDF("Op", "id", "v"), raw, name)
        name
      }
      // Batch side: one merge of every CDC file.
      CdcPipeline.loadInitial(spark, Seq(s"$raw/LOAD00000001.parquet"), lakeB, cfg)
      CdcPipeline.loadIncremental(spark, cdcNames.map(n => s"$raw/$n"), lakeB, cfg)

      // Streaming side: one file per micro-batch; stop after the first
      // catch-up run, then restart from the SAME checkpoint with the
      // remaining files added — checkpoint recovery must not skip,
      // reorder, or replay-with-different-result any batch.
      CdcPipeline.loadInitial(spark, Seq(s"$raw/LOAD00000001.parquet"), lakeS, cfg)
      val splitAt = math.max(1, cdcNames.size / 2)
      val staged = Files.createTempDirectory("staged").toString
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      // hold back the tail files, run, then reveal them and resume
      cdcNames.drop(splitAt).foreach { n =>
        fs.rename(new org.apache.hadoop.fs.Path(s"$raw/$n"),
          new org.apache.hadoop.fs.Path(s"$staged/$n"))
      }
      val q1 = CdcStream.start(spark, raw, lakeS, cfg, ckpt,
        Trigger.AvailableNow(), maxFilesPerTrigger = 1)
      q1.awaitTermination()
      cdcNames.drop(splitAt).foreach { n =>
        fs.rename(new org.apache.hadoop.fs.Path(s"$staged/$n"),
          new org.apache.hadoop.fs.Path(s"$raw/$n"))
      }
      val q2 = CdcStream.start(spark, raw, lakeS, cfg, ckpt,
        Trigger.AvailableNow(), maxFilesPerTrigger = 1)
      q2.awaitTermination()

      lakeState(lakeS) == lakeState(lakeB)
    }, 6)
  }

  test("CDF sidecar across restart: deduped feed replay ≡ one batch merge") {
    val cfg = TableConfig(Seq("id"), Nil, active = true)
    check(Prop.forAll(genOps) { changes =>
      val root = Files.createTempDirectory("cdfEquiv").toString
      val raw = s"$root/raw"
      val lakeS = s"$root/lakeS"
      val lakeB = s"$root/lakeB"
      val cdf = s"$root/cdf"
      val ckpt = s"$root/ckpt"

      val load = Seq(("I", 1, -1), ("I", 2, -2), ("I", 3, -3)).toDF("Op", "id", "v")
      writeFile(load, raw, "LOAD00000001.parquet")
      val cdcNames = changes.groupBy(_.file).toSeq.sortBy(_._1).map { case (f, rows) =>
        val name = f"20260812-${f + 1}%06d.parquet"
        writeFile(rows.sortBy(_.pos).map(c => (c.op, c.id, c.v)).toDF("Op", "id", "v"), raw, name)
        name
      }
      CdcPipeline.loadInitial(spark, Seq(s"$raw/LOAD00000001.parquet"), lakeB, cfg)
      CdcPipeline.loadIncremental(spark, cdcNames.map(n => s"$raw/$n"), lakeB, cfg)

      CdcPipeline.loadInitial(spark, Seq(s"$raw/LOAD00000001.parquet"), lakeS, cfg)
      val splitAt = math.max(1, cdcNames.size / 2)
      val staged = Files.createTempDirectory("stagedC").toString
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      cdcNames.drop(splitAt).foreach { n =>
        fs.rename(new org.apache.hadoop.fs.Path(s"$raw/$n"),
          new org.apache.hadoop.fs.Path(s"$staged/$n"))
      }
      val q1 = CdcStream.startWithChangeFeed(spark, raw, lakeS, cdf, Seq("v"), cfg, ckpt,
        Trigger.AvailableNow(), maxFilesPerTrigger = 1)
      q1.awaitTermination()
      cdcNames.drop(splitAt).foreach { n =>
        fs.rename(new org.apache.hadoop.fs.Path(s"$staged/$n"),
          new org.apache.hadoop.fs.Path(s"$raw/$n"))
      }
      val q2 = CdcStream.startWithChangeFeed(spark, raw, lakeS, cdf, Seq("v"), cfg, ckpt,
        Trigger.AvailableNow(), maxFilesPerTrigger = 1)
      q2.awaitTermination()

      // 1) the lake matches the batch merge
      val lakesMatch = lakeState(lakeS) == lakeState(lakeB)

      // 2) replaying the feed — keyed on (id, change_seq, batch_id), per-key
      // order (batch_id, change_seq) — over the LOAD snapshot reconstructs
      // the same state. The per-batch partition write makes the log
      // effectively exactly-once; distinct() is belt-and-braces.
      val feed = spark.read.parquet(cdf)
        .selectExpr("id", "change_seq", "CAST(batch_id AS BIGINT) AS batch_id",
          "Op", "v_new").distinct()
        .collect()
        .map(r => (r.getAs[Int]("id"), r.getAs[Long]("change_seq"),
          r.getAs[Long]("batch_id"), r.getAs[String]("Op"),
          Option(r.get(r.fieldIndex("v_new"))).map(_.asInstanceOf[Int])))
      var m = Map(1 -> ("I", -1), 2 -> ("I", -2), 3 -> ("I", -3))
      feed.sortBy(t => (t._1, t._3, t._2)).foreach { case (id, _, _, op, vNew) =>
        if (op == Op.Delete) m -= id else m += (id -> (op, vNew.get))
      }
      val replayMatch =
        m.map { case (id, (op, v)) => (op, id, v) }.toSet == lakeState(lakeB)

      lakesMatch && replayMatch
    }, 4)
  }
}
