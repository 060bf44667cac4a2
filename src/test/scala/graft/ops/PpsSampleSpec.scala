package graft.ops

import graft.SparkSpec

class PpsSampleSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, 10L + (i % 7) * 5L)).toDF("id", "w")

  private def draw(df: org.apache.spark.sql.DataFrame, n: Long,
                   seed: String = "pps") =
    Curation.ppsSample(df, "id", "w", n, seed)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("draws exactly n copies; every weight positive") {
    val got = draw(corpus(200), 40)
    assert(got.map(_._3).sum == 40L)
    assert(got.forall(_._3 >= 1L))
    assert(got.forall(_._2 > 0L))
  }

  test("an item heavier than the stride is ALWAYS drawn, with multiplicity") {
    // One document holds ~2/3 of the mass: with n = 10 pointers its
    // interval spans several strides — it must appear with n_copies ≥ 2.
    val df = ((0 until 20).map(i => (i.toLong, 10L)) :+ (99L, 400L))
      .toDF("id", "w")
    val got = draw(df, 10)
    assert(got.map(_._3).sum == 10L)
    val heavy = got.find(_._1 == 99L)
    assert(heavy.isDefined && heavy.get._3 >= 2L,
      s"heavy item must be multiply drawn: $got")
  }

  test("deterministic per seed; a different seed draws a different sample") {
    val df = corpus(300)
    assert(draw(df, 50).toSeq == draw(df, 50).toSeq)
    val a = draw(df, 50, "s1").map(_._1).toSet
    val b = draw(df, 50, "s2").map(_._1).toSet
    assert(a != b, "two seeds agreeing exactly is astronomically unlikely")
  }

  test("zero-weight rows are excluded; n larger than corpus multiplies items") {
    val df = Seq((1L, 5L), (2L, 0L), (3L, 5L)).toDF("id", "w")
    val got = draw(df, 6)
    assert(!got.map(_._1).contains(2L))
    assert(got.map(_._3).sum == 6L) // 6 pointers over 2 items
  }
}
