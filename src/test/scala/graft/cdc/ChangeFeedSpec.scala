package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def target =
    Seq(("I", 1, "a", 10.0), ("I", 2, "b", 20.0)).toDF("Op", "id", "name", "price")

  private def feedOf(changes: org.apache.spark.sql.DataFrame) =
    ChangeFeed.feed(target, changes, Seq("id"), Seq("name", "price"), Seq(col("id")))
      .collect().map(r => (r.getAs[Int]("id"), r.getAs[Long]("change_seq"),
        r.getAs[String]("Op"), r.getAs[String]("name_old"), r.getAs[String]("name_new")))
      .sortBy(t => (t._1, t._2))

  test("update carries the target row as pre-image") {
    val f = feedOf(Seq(("U", 1, "a2", 11.0, 1L)).toDF("Op", "id", "name", "price", "file_seq"))
    assert(f.toSeq == Seq((1, 1L, "U", "a", "a2")))
  }

  test("two updates chain pre-images across files; delete nulls the post-image") {
    val changes = Seq(
      ("U", 1, "a2", 11.0, 1L),
      ("U", 1, "a3", 12.0, 2L),
      ("D", 2, "b", 20.0, 1L)
    ).toDF("Op", "id", "name", "price", "file_seq")
    val f = feedOf(changes)
    assert(f.toSeq == Seq(
      (1, 1L, "U", "a", "a2"),
      (1, 2L, "U", "a2", "a3"),
      (2, 1L, "D", "b", null)))
  }

  test("insert of a brand-new key has a NULL pre-image; re-insert after delete too") {
    val changes = Seq(
      ("I", 3, "c", 30.0, 1L),  // brand-new key: no target row
      ("D", 1, "a", 10.0, 1L),
      ("I", 1, "z", 99.0, 2L)   // resurrection: pre-image must be NULL, not 'a'
    ).toDF("Op", "id", "name", "price", "file_seq")
    val f = feedOf(changes)
    assert(f.toSeq == Seq(
      (1, 1L, "D", "a", null),
      (1, 2L, "I", null, "z"),
      (3, 1L, "I", null, "c")))
  }

  test("stateAsOf: every prefix of the feed restores the merge of that change prefix") {
    val changes = Seq(
      ("U", 1, "a2", 11.0, 1L), ("I", 3, "c", 30.0, 1L),
      ("D", 2, "b", 20.0, 2L), ("U", 1, "a3", 12.0, 2L),
      ("D", 1, "a3", 12.0, 3L), ("I", 4, "d", 40.0, 3L)
    ).toDF("Op", "id", "name", "price", "file_seq")
    val feed = ChangeFeed.feed(target, changes, Seq("id"),
      Seq("name", "price"), Seq(col("id")), keepFileSeq = true)
      .localCheckpoint(true)
    def restored(seq: Long) =
      ChangeFeed.stateAsOf(target.drop("Op"), feed, Seq("id"),
          Seq("name", "price"), seq)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
    def merged(seq: Long) =
      Merge.mergeCdc(target, changes.where(col("file_seq") <= seq),
          Seq("id"), Seq(col("id")))
        .select("id", "name", "price")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
    (0L to 3L).foreach(seqNo =>
      assert(restored(seqNo) == merged(seqNo), s"prefix $seqNo diverged"))
    // seq 0 is the base itself; the max seq is the full merge outcome
    // (1 and 2 deleted along the way, 3 and 4 inserted)
    assert(restored(0L) == Set((1, "a", 10.0), (2, "b", 20.0)))
    assert(restored(3L) == Set((3, "c", 30.0), (4, "d", 40.0)))
  }
}
