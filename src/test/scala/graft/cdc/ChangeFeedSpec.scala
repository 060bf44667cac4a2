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
}
