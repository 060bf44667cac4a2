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
