package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pins [[OrderedFoldRule]] + [[graft.expressions.OrderedSumAgg]]: the
  * ordered-fold idiom rewrites to the native aggregate with identical
  * results — including NULL ords (sort first), NULL values (poison the
  * sum), value tie-breaks, non-associative orderings that would differ
  * under any other fold order, and FILTER'd-empty groups — while
  * inadmissible shapes (string ord, custom comparator, non-zero seed,
  * filter clauses) are left untouched. */
class OrderedFoldRuleSpec extends SparkSpec {
  import spark.implicits._

  private def installed[T](f: => T): T =
    try { GraftOptimizations.install(spark); f }
    finally GraftOptimizations.uninstall(spark)

  private def fold(o: Column, v: Column): Column =
    aggregate(array_sort(collect_list(struct(o, v))),
      lit(0.0), (acc, s) => acc + s.getField(v.toString))

  /** Order-sensitive fixture: tiny and huge magnitudes so a different
    * fold order changes the IEEE sum. */
  private def df: DataFrame =
    spark.range(2000).select(($"id" % 7).as("g"),
      ((($"id" * 37) % 1000) - 500).as("o"),
      (when($"id" % 3 === 0, lit(1e15)).otherwise(lit(1.0)) +
        $"id".cast("double") / 7.0).as("v"))

  private def collectMap(d: DataFrame): Map[Long, Any] =
    d.collect().map(r => r.getLong(0) -> r.get(1)).toMap

  test("fold idiom rewrites to ordered_sum with bit-identical sums") {
    def q = df.groupBy("g").agg(
      fold($"o", $"v").as("s"), count(lit(1)).as("n"))
    val plain = collectMap(q.select($"g", $"s"))
    installed {
      val fresh = q
      val plan = fresh.queryExecution.optimizedPlan.toString
      assert(plan.contains("ordered_sum"), s"no rewrite in:\n$plan")
      assert(!plan.contains("aggregate(array_sort"), s"idiom survived:\n$plan")
      assert(collectMap(fresh.select($"g", $"s")) == plain)
      // the physical agg runs ObjectHashAggregate with a partial phase
      val phys = fresh.queryExecution.executedPlan.toString
      assert(phys.contains("ObjectHashAggregate"), phys)
      assert(phys.contains("partial_ordered_sum"), phys)
    }
  }

  test("NULL ords sort first; a NULL value poisons the group to NULL") {
    def q = Seq(
      (1L, Some(2L), Some(2.0)), (1L, None, Some(100.0)), (1L, Some(1L), Some(0.5)),
      (2L, Some(1L), Some(1.0)), (2L, Some(2L), None)
    ).toDF("g", "o", "v").groupBy("g").agg(fold($"o", $"v").as("s"))
    val plain = collectMap(q)
    assert(plain(2L) == null)
    installed {
      val fresh = q
      assert(fresh.queryExecution.optimizedPlan.toString.contains("ordered_sum"))
      assert(collectMap(fresh) == plain)
    }
  }

  test("value tie-break and duplicate pairs match the struct sort exactly") {
    def q = Seq(
      (1L, 5L, 2.0), (1L, 5L, -1.0), (1L, 5L, 2.0), (1L, 4L, 1e300)
    ).toDF("g", "o", "v").groupBy("g").agg(fold($"o", $"v").as("s"))
    val plain = collectMap(q)
    installed {
      val fresh = q
      assert(fresh.queryExecution.optimizedPlan.toString.contains("ordered_sum"))
      assert(collectMap(fresh) == plain)
    }
  }

  test("int ord rewrites; merge path exercised across many partitions") {
    def q = spark.range(0, 10000, 1, 13).select(($"id" % 3).as("g"),
      ($"id" % 100).cast("int").as("o"),
      ($"id".cast("double") / 3.0).as("v"))
      .groupBy("g").agg(fold($"o", $"v").as("s"))
    val plain = collectMap(q)
    installed { assert(collectMap(q) == plain) }
  }

  test("inadmissible shapes are left untouched") {
    installed {
      // string ord
      val s1 = df.select($"g", $"o".cast("string").as("o"), $"v")
        .groupBy("g").agg(fold($"o", $"v").as("s"))
      assert(!s1.queryExecution.optimizedPlan.toString.contains("ordered_sum"))
      // non-zero seed
      val s2 = df.groupBy("g").agg(
        aggregate(array_sort(collect_list(struct($"o", $"v"))),
          lit(1.0), (acc, s) => acc + s.getField("v")).as("s"))
      assert(!s2.queryExecution.optimizedPlan.toString.contains("ordered_sum"))
      // custom comparator (descending) must not match
      val s3 = df.groupBy("g").agg(
        aggregate(
          array_sort(collect_list(struct($"o", $"v")),
            (a, b) => when(a.getField("o") > b.getField("o"), -1)
              .when(a.getField("o") < b.getField("o"), 1).otherwise(0)),
          lit(0.0), (acc, s) => acc + s.getField("v")).as("s"))
      assert(!s3.queryExecution.optimizedPlan.toString.contains("ordered_sum"))
    }
  }

  test("whole-query integration: dsir/hll-style queries agree under the rule") {
    // the real consumers: run two released queries with and without the
    // rule — result sets must be identical
    for (name <- Seq("text_hll_distinct", "text_dsir_scores")) {
      val q = graft.SparkEntry.queries(name)
      val plain = q(spark, "/root/testdata/sf0.001").collect().map(_.toString).sorted
      installed {
        val ruled = q(spark, "/root/testdata/sf0.001").collect().map(_.toString).sorted
        assert(ruled.sameElements(plain), s"$name differs under OrderedFoldRule")
      }
    }
  }
}
