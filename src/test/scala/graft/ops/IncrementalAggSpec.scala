package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  test("incremental refresh equals full recompute across random change sets") {
    val rnd = new scala.util.Random(11)
    val before = (1 to 2000).map(i => (i.toLong, rnd.nextInt(50).toLong, rnd.nextInt(1000)))
    // a random merge outcome: ~10% deletes, ~20% updates (new value and
    // possibly a NEW group — the group-migration case), ~10% inserts
    val deletes = (1 to 2000).filter(_ => rnd.nextInt(10) == 0).map(_.toLong).toSet
    val updates = (1 to 2000).filterNot(i => deletes(i.toLong))
      .filter(_ => rnd.nextInt(5) == 0)
      .map(i => i.toLong -> ((i.toLong, rnd.nextInt(50).toLong, rnd.nextInt(1000)))).toMap
    val inserts = (2001 to 2200).map(i => (i.toLong, rnd.nextInt(50).toLong, rnd.nextInt(1000)))
    val after = before.filterNot(r => deletes(r._1))
      .map(r => updates.getOrElse(r._1, r)) ++ inserts

    // groups that can change: old groups of deleted/updated rows, new
    // groups of updated rows, groups of inserted rows
    val touchedPks = deletes ++ updates.keySet
    val changedGroups = before.filter(r => touchedPks(r._1)).map(_._2) ++
      updates.values.map(_._2) ++ inserts.map(_._2)

    val aggs = Seq(count(lit(1)).as("n"), sum(col("v").cast("long")).as("sum_v"),
      max(col("v")).as("max_v"))
    val prevAgg = before.toDF("pk", "grp", "v")
      .groupBy("grp").agg(aggs.head, aggs.tail: _*)
    val got = IncrementalAgg.refresh(after.toDF("pk", "grp", "v"), prevAgg,
        changedGroups.toDF("grp"), Seq("grp"), aggs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val expected = after.toDF("pk", "grp", "v")
      .groupBy("grp").agg(aggs.head, aggs.tail: _*)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == expected)
  }

  test("the null group recomputes and evicts like any other group") {
    val aggs = Seq(count(lit(1)).as("n"), sum(col("v").cast("long")).as("sum_v"))
    def grp(x: java.lang.Long, v: Int) = (x, v)
    val before = Seq(grp(1L, 10), grp(null, 5), grp(null, 6)).toDF("grp", "v")
    val prevAgg = before.groupBy("grp").agg(aggs.head, aggs.tail: _*)
    // the merge deleted one null-group row; the null group MUST recompute
    val after = Seq(grp(1L, 10), grp(null, 5)).toDF("grp", "v")
    val changed = Seq(Option.empty[Long]).toDF("grp")
    val got = IncrementalAgg.refresh(after, prevAgg, changed, Seq("grp"), aggs)
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 10L), (-1L, 1L, 5L)),
      "null group kept a stale aggregate")
  }
}
