package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned result equals the naive inequality join at several widths") {
    val rnd = new scala.util.Random(11)
    val points = (1 to 300).map(i => (rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("key", "ts", "pid")
    val iv = (1 to 60).map { i =>
      val s = rnd.nextInt(900).toLong
      (rnd.nextInt(4).toLong, s, s + rnd.nextInt(200).toLong, i.toLong)
    }.toDF("key", "lo", "hi", "iid")

    val naive = points.join(iv, Seq("key"))
      .where(col("ts") >= col("lo") && col("ts") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet

    for (width <- Seq(1L, 7L, 100L, 5000L)) {
      val binned = RangeJoin.pointInInterval(points, "ts", iv, "lo", "hi",
        Seq("key"), width).select("pid", "iid").as[(Long, Long)].collect()
      assert(binned.length == binned.toSet.size, s"width=$width produced duplicates")
      assert(binned.toSet == naive, s"width=$width mismatch")
    }
  }

  test("interval containing no point and point in no interval both drop out") {
    val points = Seq((1L, 50L, 1L)).toDF("key", "ts", "pid")
    val iv = Seq((1L, 100L, 200L, 1L), (2L, 0L, 100L, 2L)).toDF("key", "lo", "hi", "iid")
    assert(RangeJoin.pointInInterval(points, "ts", iv, "lo", "hi", Seq("key"), 10L)
      .count() == 0)
  }
}
