package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def target =
    Seq(("I", 1, "a", 10.0), ("I", 2, "b", 20.0), ("I", 3, "c", 30.0))
      .toDF("Op", "id", "name", "price")

  test("history: update opens a new version and closes the old interval") {
    val changes = Seq(("U", 1, "a2", 11.0, 1L)).toDF("Op", "id", "name", "price", "file_seq")
    val h = Scd2.history(target, changes, Seq("id"), Seq(col("id")))
      .filter($"id" === 1).orderBy("version")
      .collect().map(r => (r.getAs[Long]("version"), r.getAs[String]("name"),
        r.getAs[Long]("valid_from_seq"), r.getAs[java.lang.Long]("valid_to_seq"),
        r.getAs[Boolean]("is_current")))
    assert(h.toSeq == Seq((1L, "a", 0L, java.lang.Long.valueOf(1L), false),
      (2L, "a2", 1L, null, true)))
  }

  test("history: delete closes the interval without emitting a version row") {
    val changes = Seq(("D", 2, "b", 20.0, 1L)).toDF("Op", "id", "name", "price", "file_seq")
    val h = Scd2.history(target, changes, Seq("id"), Seq(col("id")))
    val id2 = h.filter($"id" === 2).collect()
    // one row: the original version, closed at seq 1, not current
    assert(id2.length == 1)
    assert(id2(0).getAs[java.lang.Long]("valid_to_seq") == 1L)
    assert(!id2(0).getAs[Boolean]("is_current"))
    // untouched keys remain open
    assert(h.filter($"id" === 3 && $"is_current").count() == 1)
  }

  test("history: resurrection after delete keeps version numbers monotone") {
    val changes = Seq(
      ("D", 1, "a", 10.0, 1L),
      ("I", 1, "a3", 12.0, 2L)
    ).toDF("Op", "id", "name", "price", "file_seq")
    val h = Scd2.history(target, changes, Seq("id"), Seq(col("id")))
      .filter($"id" === 1).orderBy("version")
      .collect().map(r => (r.getAs[Long]("version"), r.getAs[String]("name"),
        r.getAs[Boolean]("is_current")))
    // delete consumed version 2; the resurrected row is version 3
    assert(h.toSeq == Seq((1L, "a", false), (3L, "a3", true)))
  }

  test("history current rows ≡ latest-wins merge") {
    val changes = Seq(
      ("U", 1, "a2", 11.0, 1L), ("D", 2, "b", 20.0, 1L),
      ("I", 4, "d", 40.0, 1L), ("U", 1, "a3", 12.0, 2L)
    ).toDF("Op", "id", "name", "price", "file_seq")
    val current = Scd2.history(target, changes, Seq("id"), Seq(col("id")))
      .filter($"is_current").select("Op", "id", "name", "price")
    val merged = Merge.mergeCdc(target, changes, Seq("id"), Seq(col("id")))
    assert(current.orderBy("id").collect().toSeq ==
      merged.orderBy("id").collect().toSeq)
  }

  test("snapshot diff classifies added / removed / changed and drops unchanged") {
    val before = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0))
      .toDF("id", "name", "price")
    val after = Seq((1, "a2", 10.0), (3, "c", 30.0), (4, "d", 40.0))
      .toDF("id", "name", "price")
    val d = SnapshotDiff.diff(before, after, Seq("id"))
      .collect().map(r => r.getAs[Int]("id") -> r.getAs[String]("change_type")).toMap
    assert(d == Map(1 -> "changed", 2 -> "removed", 4 -> "added"))
  }

  test("snapshot diff is null-safe: null→value is changed, null→null is unchanged") {
    val before = Seq((1, null.asInstanceOf[String]), (2, null.asInstanceOf[String]))
      .toDF("id", "name")
    val after = Seq((1, "x"), (2, null.asInstanceOf[String])).toDF("id", "name")
    val d = SnapshotDiff.diff(before, after, Seq("id")).collect()
    assert(d.map(_.getAs[Int]("id")).toSeq == Seq(1))
    assert(d(0).getAs[String]("change_type") == "changed")
    assert(d(0).getAs[String]("old_name") == null)
    assert(d(0).getAs[String]("new_name") == "x")
  }

  test("snapshot diff ignores columns missing from either side") {
    val before = Seq((1, "a", "only-before")).toDF("id", "name", "extra")
    val after = Seq((1, "a", 99)).toDF("id", "name", "only_after")
    assert(SnapshotDiff.diff(before, after, Seq("id")).count() == 0)
  }

  test("prune: asOf stays exact at/after the cutoff, current rows always survive") {
    val changes = Seq(
      ("U", 1, "a2", 11.0, 1L), ("D", 2, "b", 20.0, 1L),
      ("U", 1, "a3", 12.0, 2L), ("I", 4, "d", 40.0, 3L)
    ).toDF("Op", "id", "name", "price", "file_seq")
    val h = Scd2.history(target, changes, Seq("id"), Seq(col("id")))
      .localCheckpoint(true)
    val pruned = Scd2.prune(h, cutoffSeq = 2L)
    // versions closed at seq <= 2 are gone, currents survive
    assert(pruned.where($"valid_to_seq" <= 2L).count() == 0)
    assert(pruned.where($"is_current").count() == h.where($"is_current").count())
    // time travel at/after the cutoff is EXACT vs the unpruned history
    for (seq <- 2L to 3L) {
      assert(Scd2.asOf(pruned, seq).collect().map(_.toString).toSet ==
        Scd2.asOf(h, seq).collect().map(_.toString).toSet, s"asOf($seq)")
    }
    // ...and incomplete before it (version 1 of id=1 expired)
    assert(Scd2.asOf(pruned, 0L).count() < Scd2.asOf(h, 0L).count())
  }

  test("asOf: interval filter reproduces the state after each batch") {
    val changes = Seq(
      ("U", 1, "a2", 11.0, 1L),
      ("D", 2, "b", 20.0, 1L),
      ("U", 1, "a3", 12.0, 2L),
      ("I", 9, "z", 90.0, 2L)
    ).toDF("Op", "id", "name", "price", "file_seq")
    val h = Scd2.history(target, changes, Seq("id"), Seq(col("id")))
    def state(seq: Long) = Scd2.asOf(h, seq).collect()
      .map(r => r.getAs[Int]("id") -> r.getAs[String]("name")).toMap
    // seq 0: the original target
    assert(state(0L) == Map(1 -> "a", 2 -> "b", 3 -> "c"))
    // seq 1: update applied, key 2 deleted
    assert(state(1L) == Map(1 -> "a2", 3 -> "c"))
    // seq 2 == latest-wins merge result
    val merged = Merge.mergeCdc(target, changes, Seq("id"), Seq(col("id")))
      .collect().map(r => r.getAs[Int]("id") -> r.getAs[String]("name")).toMap
    assert(state(2L) == merged)
    assert(state(2L) == Map(1 -> "a3", 3 -> "c", 9 -> "z"))
  }

  test("asOf: same-batch supersession keeps only the batch's final version") {
    val changes = Seq(
      ("U", 1, "mid", 11.0, 1L),
      ("U", 1, "final", 12.0, 1L)
    ).toDF("Op", "id", "name", "price", "file_seq")
    // intra-file order by price: "mid" precedes "final"
    val h = Scd2.history(target, changes, Seq("id"), Seq(col("price")))
    val s1 = Scd2.asOf(h, 1L).filter($"id" === 1).collect()
    assert(s1.length == 1 && s1(0).getAs[String]("name") == "final")
  }
}
