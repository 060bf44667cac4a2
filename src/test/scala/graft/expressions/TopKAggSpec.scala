package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The native bounded top-k aggregate against the window formulation it
  * replaces, across the partial/merge/serialize paths. */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private val events =
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")

  private def viaAgg(k: Int) = events
    .groupBy(col("event_type"))
    .agg(TopKAgg.topK(struct(col("value"), col("event_id")), k,
      directions = Seq(false, true)).as("__top"))
    .select(col("event_type"), posexplode(col("__top")).as(Seq("__i", "__s")))
    .select(col("event_type"), (col("__i") + 1).as("rank"),
      col("__s.value").as("value"), col("__s.event_id").as("event_id"))

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("value").desc, col("event_id"))
    events.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select("event_type", "rank", "value", "event_id")
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getInt(1),
      r.getDouble(2), r.getLong(3))).toSet

  test("agg formulation == window formulation for several k, real data") {
    for (k <- Seq(1, 5, 23)) {
      assert(asSet(viaAgg(k)) == asSet(viaWindow(k)), s"k=$k")
    }
  }

  test("many input partitions force serialize + merge; result unchanged") {
    val shredded = events.repartition(13)
    val got = shredded.groupBy(col("event_type"))
      .agg(TopKAgg.topK(struct(col("value"), col("event_id")), 5,
        directions = Seq(false, true)).as("__top"))
      .select(col("event_type"), posexplode(col("__top")).as(Seq("__i", "__s")))
      .select(col("event_type"), (col("__i") + 1).as("rank"),
        col("__s.value").as("value"), col("__s.event_id").as("event_id"))
    assert(asSet(got) == asSet(viaWindow(5)))
  }

  test("plans as ObjectHashAggregate with a partial phase (map-side combine)") {
    val plan = viaAgg(5).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(800))
    assert(plan.contains("partial_topk"), plan.take(800))
  }

  test("ascending direction, groups smaller than k, and null ordering") {
    val df = Seq[(String, java.lang.Double, Long)](
      ("a", 3.0, 1L), ("a", 1.0, 2L), ("a", 2.0, 3L), ("a", null, 4L),
      ("b", 9.0, 5L)).toDF("g", "v", "id")
    // ascending on v: nulls first (Spark's NULLS FIRST under ASC)
    val asc = df.groupBy("g")
      .agg(TopKAgg.topK(struct(col("v"), col("id")), 2,
        directions = Seq(true, true)).as("t"))
      .select(col("g"), expr("transform(t, x -> x.id)").as("ids"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1).toList)).toMap
    assert(asc("a") == List(4L, 2L)) // null v first, then v=1.0
    assert(asc("b") == List(5L))     // group smaller than k: all rows
    // descending on v: nulls last — the null row misses the top-2
    val desc = df.groupBy("g")
      .agg(TopKAgg.topK(struct(col("v"), col("id")), 2,
        directions = Seq(false, true)).as("t"))
      .select(col("g"), expr("transform(t, x -> x.id)").as("ids"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1).toList)).toMap
    assert(desc("a") == List(1L, 3L)) // v=3.0 then v=2.0
  }

  test("misuse fails analysis: non-struct child, direction arity mismatch") {
    val df = Seq(("a", 1.0)).toDF("g", "v")
    intercept[Exception] {
      df.groupBy("g").agg(TopKAgg.topK(col("v"), 2, Seq(true)).as("t"))
        .collect()
    }
    intercept[Exception] {
      df.groupBy("g")
        .agg(TopKAgg.topK(struct(col("v")), 2, Seq(true, false)).as("t"))
        .collect()
    }
    intercept[IllegalArgumentException] {
      TopKAgg.topK(struct(col("v")), 0, Seq(true))
    }
  }
}
