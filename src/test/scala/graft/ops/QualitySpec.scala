package graft.ops

import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("check counts violations per rule in one pass") {
    val df = Seq((1, "a"), (2, null), (3, "zz")).toDF("id", "v")
    val got = Quality.check(df, Seq(
        Quality.notNull("v"), Quality.matches("v", "^[a-y]+$")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSet == Set(
      ("not_null:v", 1L, 3L, false),
      ("matches:v", 1L, 3L, false)))
  }

  test("hostile rule names (quotes, backticks) are data, not SQL") {
    val df = Seq(1, 2).toDF("id")
    val name = "weird `name` with 'quotes' and \"doubles\""
    val got = Quality.check(df, Seq(Quality.Rule(name, col("id") < 0)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(3)))
    assert(got.toSeq == Seq((name, 0L, true)))
  }

  test("empty rule list yields zero rows, and suite still runs uniqueness") {
    val df = Seq((1, "a"), (1, "b")).toDF("id", "v")
    assert(Quality.check(df, Nil).count() == 0)
    val got = Quality.suite(df, Nil, uniqueKeys = Seq(Seq("id")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(3)))
    assert(got.toSeq == Seq(("unique:id", 1L, false)))
  }

  test("checkReferential: orphans counted, NULL FKs exempt, composite keys supported") {
    val parent = Seq((1, "x"), (2, "x"), (3, "y")).toDF("pk", "sub")
    val child = Seq(
      (10, Option(1)), (11, Option(2)), (12, Option(99)), // 99 = orphan
      (13, None)                                          // NULL FK exempt
    ).toDF("id", "fk")
    val r = Quality.checkReferential(child, parent, Seq("fk"), Seq("pk"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getBoolean(4))).head
    assert(r == (("fk:fk->pk", 1L, 1L, 4L, false)))

    // composite key: (a, b) must match as a pair, not independently
    val p2 = Seq((1, "u"), (2, "v")).toDF("a", "b")
    val c2 = Seq((1, "u"), (1, "v"), (2, "v")).toDF("a", "b") // (1,v) orphan
    val r2 = Quality.checkReferential(c2, p2, Seq("a", "b"), Seq("a", "b"))
      .collect().head
    assert(r2.getLong(1) == 1L && !r2.getBoolean(4))

    // clean edge passes
    val clean = Quality.checkReferential(
      Seq(Tuple1(1), Tuple1(2)).toDF("fk"), parent, Seq("fk"), Seq("pk"))
      .collect().head
    assert(clean.getLong(1) == 0L && clean.getBoolean(4))
  }

  private def col(c: String) = org.apache.spark.sql.functions.col(c)
}
