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

  private def col(c: String) = org.apache.spark.sql.functions.col(c)
}
