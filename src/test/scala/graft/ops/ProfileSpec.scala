package graft.ops

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts nulls and distincts per column in one pass") {
    val df = Seq((1, Some("a")), (2, None), (3, Some("a"))).toDF("id", "v")
    val got = Profile.profile(df, Seq("id", "v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSet == Set(("id", 3L, 0L, 3L), ("v", 3L, 1L, 1L)))
  }

  test("empty table profiles as zeros, not nulls") {
    val df = Seq.empty[(Int, String)].toDF("id", "v")
    val got = Profile.profile(df, Seq("id", "v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSet == Set(("id", 0L, 0L, 0L), ("v", 0L, 0L, 0L)))
  }

  test("zScores: exact population z per group, zero-variance guard, threshold flag") {
    // group a: values 2, 4, 6 → mean 4, pop-var 8/3; group b: constant.
    val df = Seq(("a", 2L), ("a", 4L), ("a", 6L), ("b", 7L), ("b", 7L))
      .toDF("g", "n")
    val got = Profile.zScores(df, Seq("g"), "n", threshold = 1.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val variance = (56.0 - (12.0 * 12.0) / 3.0) / 3.0
    val z6 = (6.0 - 12.0 / 3.0) / math.sqrt(variance)
    assert(got.filter(_._1 == "b").forall(t => t._3 == 0.0 && !t._4))
    val a6 = got.find(t => t._1 == "a" && t._2 == 6L).get
    assert(a6._3 == z6 && a6._4 == (math.abs(z6) >= 1.0))
    val a4 = got.find(t => t._1 == "a" && t._2 == 4L).get
    assert(a4._3 == 0.0 && !a4._4)
  }

  test("approx profile agrees on small cardinalities and skips the Expand") {
    val df = (1 to 100).map(i => (i, i % 5)).toDF("id", "m")
    val exact = Profile.profile(df, Seq("m")).collect().head.getLong(3)
    val approx = Profile.profile(df, Seq("m"), approx = true).collect().head.getLong(3)
    assert(exact == 5L && approx == 5L) // HLL is exact at tiny cardinality
    val plan = Profile.profile(df, Seq("id", "m"), approx = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx path must not Expand:\n$plan")
  }
}
