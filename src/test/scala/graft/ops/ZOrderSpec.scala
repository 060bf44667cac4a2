package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue matches a bit-by-bit reference interleave") {
    def ref(a: Long, b: Long): Long =
      (0 until 16).foldLeft(0L) { (z, i) =>
        z | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (70000L, 3L)) // >16-bit input: low bits only
    val got = rows.toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z")).as[Long].collect()
    assert(got.toSeq == rows.map { case (a, b) => ref(a & 0xFFFFL, b & 0xFFFFL) })
  }

  test("clustered partitions cover disjoint z ranges (file-pruning layout)") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 5000).map(_ => (rnd.nextInt(60000).toLong, rnd.nextInt(60000).toLong))
      .toDF("a", "b")
    val clustered = ZOrder.cluster(df, "a", "b", 8, keepZCol = Some("z"))
    val ranges = clustered
      .select(spark_partition_id().as("p"), col("z"))
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.nonEmpty)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping z ranges: $hi1 > $lo2")
      case _ =>
    }
    // row-preserving
    assert(clustered.count() == 5000)
  }
}
