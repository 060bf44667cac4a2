package graft.ops

import graft.SparkSpec
import graft.expressions.BloomExpressions
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloomSemiJoin equals the plain semi join (false positives removed)") {
    val big = (1L to 1000L).map(i => (i, s"v$i")).toDF("k", "v")
    val small = Seq(3L, 500L, 999L).toDF("sk")
    // tiny expectedItems → high fpp → false positives guaranteed to reach
    // the exact join, which must remove them
    val got = BloomJoin.bloomSemiJoin(big, "k", small, "sk",
      expectedItems = 3, fpp = 0.5).select("k").as[Long].collect().sorted
    assert(got.toSeq == Seq(3L, 500L, 999L))
  }

  test("bloomInnerJoin equals the plain inner join") {
    val big = (1L to 200L).map(i => (i, i * 2)).toDF("k", "x")
    val small = Seq((10L, "a"), (20L, "b")).toDF("sk", "tag")
    val got = BloomJoin.bloomInnerJoin(big, "k", small, "sk", expectedItems = 2)
      .select("k", "tag").as[(Long, String)].collect().sorted
    assert(got.toSeq == Seq((10L, "a"), (20L, "b")))
  }

  test("mightContain has no false negatives for long and string keys") {
    val bloom = Seq(1L, 2L, 3L).toDF("k").stat.bloomFilter("k", 100, 0.01)
    val hits = Seq(1L, 2L, 3L).toDF("k")
      .where(BloomExpressions.mightContain(col("k"), bloom)).count()
    assert(hits == 3, "inserted long keys must always probe true")

    val sBloom = Seq("alpha", "beta").toDF("s").stat.bloomFilter("s", 100, 0.01)
    val sHits = Seq("alpha", "beta").toDF("s")
      .where(BloomExpressions.mightContain(col("s"), sBloom)).count()
    assert(sHits == 2, "inserted string keys must always probe true")
  }
}
