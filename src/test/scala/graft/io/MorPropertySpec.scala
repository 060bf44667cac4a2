package graft.io

import graft.SparkSpec
import graft.cdc.Op
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import java.nio.file.Files

/** Property tests for the merge-on-read table: arbitrary op sequences
  * committed per-file through [[MorTable.merge]] must agree with the
  * naive sequential-replay model (the same model [[graft.cdc
  * .MergePropertySpec]] pins the CoW merge against), stay invariant
  * under a compact+vacuum interleaved at an arbitrary point, and
  * time-travel to every commit prefix's model state. */
class MorPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  /** `id = None` exercises the NULL-primary-key group: the batch
    * window groups NULLs together and the equality sidecar masks them
    * null-safely (`<=>`), so the model treats None as one more key —
    * exactly one survivor, removable by a winning delete (the r9
    * advisor's NULL-accumulation case, now generator-driven). */
  private case class Change(op: String, id: Option[Int], v: Int, fileSeq: Long, pos: Long)

  private val genOps: Gen[List[Change]] = for {
    n <- Gen.choose(0, 40)
    ops <- Gen.listOfN(n, for {
      op <- Gen.oneOf(Op.Insert, Op.Update, Op.Delete)
      id <- Gen.frequency(9 -> Gen.choose(1, 10).map(Some(_)), // collisions
        1 -> Gen.const(None)) // the NULL-key group
      v <- Gen.choose(0, 1000)
    } yield (op, id, v))
    nFiles <- Gen.choose(1, 3)
  } yield ops.zipWithIndex.map { case ((op, id, v), i) =>
    val chunk = (ops.size + nFiles - 1) / nFiles
    Change(op, id, v, (i / math.max(1, chunk)).toLong + 1L, (i % math.max(1, chunk)).toLong)
  }

  private def targetRows = Seq((Op.Insert, Option(1), -1),
    (Op.Insert, Option(2), -2), (Op.Insert, Option(3), -3))

  private def model(changes: List[Change]): Map[Option[Int], (String, Int)] = {
    var m = targetRows.map { case (op, id, v) => id -> (op, v) }.toMap
    changes.sortBy(c => (c.fileSeq, c.pos)).foreach { c =>
      if (c.op == Op.Delete) m -= c.id else m += (c.id -> (c.op, c.v))
    }
    m
  }

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[Option[Int], (String, Int)] =
    df.collect().map { r =>
      val id = if (r.isNullAt(r.fieldIndex("id"))) None
               else Some(r.getAs[Int]("id"))
      id -> (r.getAs[String]("Op"), r.getAs[Int]("v"))
    }.toMap

  test("MOR per-file commits ≡ sequential replay; compact/vacuum invariant mid-sequence") {
    check(Prop.forAll(genOps, Gen.choose(0, 2)) { (changes, compactAfter) =>
      val base = Files.createTempDirectory("morprop").toString + "/t"
      MorTable.init(spark, targetRows.toDF("Op", "id", "v"), base)
      val byFile = changes.groupBy(_.fileSeq).toSeq.sortBy(_._1)
      byFile.zipWithIndex.foreach { case ((_, cs), i) =>
        val df = cs.map(c => (c.op, c.id, c.v, c.fileSeq, c.pos))
          .toDF("Op", "id", "v", "file_seq", "pos")
        MorTable.merge(spark, df, base, Seq("id"),
          intraFileOrder = Seq(col("pos")), provenanceCols = Seq("pos"))
        if (i == compactAfter) {
          MorTable.compact(spark, base, minDeadFraction = 0.01)
          MorTable.vacuum(spark, base)
        }
      }
      asMap(MorTable.read(spark, base)) == model(changes)
    }, 10)
  }

  test("time travel: every commit prefix reconstructs its model state") {
    check(Prop.forAll(genOps) { changes =>
      val base = Files.createTempDirectory("morprop_tt").toString + "/t"
      MorTable.init(spark, targetRows.toDF("Op", "id", "v"), base)
      val byFile = changes.groupBy(_.fileSeq).toSeq.sortBy(_._1)
      byFile.foreach { case (_, cs) =>
        val df = cs.map(c => (c.op, c.id, c.v, c.fileSeq, c.pos))
          .toDF("Op", "id", "v", "file_seq", "pos")
        MorTable.merge(spark, df, base, Seq("id"),
          intraFileOrder = Seq(col("pos")), provenanceCols = Seq("pos"))
      }
      (0 to byFile.size).forall { j =>
        val prefix = byFile.take(j).flatMap(_._2).toList
        asMap(MorTable.readAsOf(spark, base, j.toLong)) == model(prefix)
      }
    }, 8)
  }
}
