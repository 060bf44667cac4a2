package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests (SURVEY.md §5.2.3): the distributed latest-wins merge
  * must agree with a naive sequential replay into a Map, for arbitrary op
  * sequences; merging per-file must equal merging all files at once; and
  * re-applying any batch must be a no-op.
  */
class MergePropertySpec extends SparkSpec {

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }
  import spark.implicits._

  private case class Change(op: String, id: Int, v: Int, fileSeq: Long, pos: Long)

  private val genOps: Gen[List[Change]] = for {
    n <- Gen.choose(0, 60)
    ops <- Gen.listOfN(n, for {
      op <- Gen.oneOf(Op.Insert, Op.Update, Op.Delete)
      id <- Gen.choose(1, 12) // small key space → plenty of per-key collisions
      v <- Gen.choose(0, 1000)
    } yield (op, id, v))
    nFiles <- Gen.choose(1, 4)
  } yield ops.zipWithIndex.map { case ((op, id, v), i) =>
    // deterministic assignment of ops to files, preserving order:
    // file = i mod nFiles would interleave; use contiguous chunks so
    // (fileSeq, pos) order == list order.
    val chunk = (ops.size + nFiles - 1) / nFiles
    Change(op, id, v, (i / math.max(1, chunk)).toLong + 1L, (i % math.max(1, chunk)).toLong)
  }

  private def targetRows = Seq((Op.Insert, 1, -1), (Op.Insert, 2, -2), (Op.Insert, 3, -3))

  /** Naive model: replay ops in order into a key→(op,v) map. */
  private def model(changes: List[Change]): Map[Int, (String, Int)] = {
    var m = targetRows.map { case (op, id, v) => id -> (op, v) }.toMap
    changes.sortBy(c => (c.fileSeq, c.pos)).foreach { c =>
      if (c.op == Op.Delete) m -= c.id else m += (c.id -> (c.op, c.v))
    }
    m
  }

  private def mergeSpark(changes: List[Change]): Map[Int, (String, Int)] = {
    val target = targetRows.toDF("Op", "id", "v")
    if (changes.isEmpty) return targetRows.map { case (op, id, v) => id -> (op, v) }.toMap
    val df = changes.map(c => (c.op, c.id, c.v, c.fileSeq, c.pos))
      .toDF("Op", "id", "v", "file_seq", "pos")
    val seq = Merge.sequenceBatch(df, Seq("id"), Seq(col("pos"))).drop("pos")
    Merge.applySequenced(target, seq, Seq("id"))
      .collect().map(r => r.getAs[Int]("id") -> (r.getAs[String]("Op"), r.getAs[Int]("v"))).toMap
  }

  test("merge ≡ naive sequential replay for arbitrary op sequences") {
    check(Prop.forAll(genOps) { changes =>
      mergeSpark(changes) == model(changes)
    }, 30)
  }

  test("batch-split invariance: per-file stepwise merge ≡ all-at-once") {
    check(Prop.forAll(genOps) { changes =>
      val allAtOnce = mergeSpark(changes)
      // stepwise: apply each file as its own single-file batch
      val target = targetRows.toDF("Op", "id", "v")
      val stepwise = changes.groupBy(_.fileSeq).toSeq.sortBy(_._1)
        .foldLeft(target) { case (tgt, (_, fileChanges)) =>
          val df = fileChanges.map(c => (c.op, c.id, c.v, 1L, c.pos))
            .toDF("Op", "id", "v", "file_seq", "pos")
          val seq = Merge.sequenceBatch(df, Seq("id"), Seq(col("pos"))).drop("pos")
          Merge.applySequenced(tgt, seq, Seq("id"))
        }
      val stepMap = stepwise.collect()
        .map(r => r.getAs[Int]("id") -> (r.getAs[String]("Op"), r.getAs[Int]("v"))).toMap
      stepMap == allAtOnce
    }, 15)
  }

  test("idempotence: re-applying the final batch is a no-op") {
    check(Prop.forAll(genOps.suchThat(_.nonEmpty)) { changes =>
      val df = changes.map(c => (c.op, c.id, c.v, c.fileSeq, c.pos))
        .toDF("Op", "id", "v", "file_seq", "pos")
      val seq = Merge.sequenceBatch(df, Seq("id"), Seq(col("pos"))).drop("pos")
      val target = targetRows.toDF("Op", "id", "v")
      val once = Merge.applySequenced(target, seq, Seq("id"))
      val twice = Merge.applySequenced(once, seq, Seq("id"))
      val a = once.collect().map(r => (r.getInt(1), r.getString(0), r.getInt(2))).toSet
      val b = twice.collect().map(r => (r.getInt(1), r.getString(0), r.getInt(2))).toSet
      a == b
    }, 15)
  }

  test("change feed replay ≡ merge: last post-image per surviving key reconstructs the table") {
    check(Prop.forAll(genOps.suchThat(_.nonEmpty)) { changes =>
      val target = targetRows.toDF("Op", "id", "v")
      val df = changes.map(c => (c.op, c.id, c.v, c.fileSeq, c.pos))
        .toDF("Op", "id", "v", "file_seq", "pos")
      val feed = ChangeFeed.feed(target, df, Seq("id"), Seq("v"), Seq(col("pos")))
        .collect().map(r => (r.getAs[Int]("id"), r.getAs[Long]("change_seq"),
          r.getAs[String]("Op"), r.getAs[Any]("v_new")))
      // replay: fold feed rows per key in change_seq order over the target
      var m = targetRows.map { case (op, id, v) => id -> (op, v) }.toMap
      feed.sortBy(t => (t._1, t._2)).foreach { case (id, _, op, vNew) =>
        if (op == Op.Delete) m -= id
        else m += (id -> (op, vNew.asInstanceOf[Int]))
      }
      m == mergeSpark(changes)
    }, 15)
  }
}
