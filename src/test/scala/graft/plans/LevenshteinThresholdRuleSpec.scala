package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Pins [[LevenshteinThresholdRule]]: every comparison direction (and
  * the long-cast idiom) rewrites to the thresholded Levenshtein, results
  * are bit-identical with and without the rule, and NULL propagation is
  * preserved. DataFrames are built FRESH inside each measurement — a
  * DataFrame caches its QueryExecution, so one built before the rule is
  * installed never re-optimizes. */
class LevenshteinThresholdRuleSpec extends SparkSpec {
  import spark.implicits._

  // derived from range so ConvertToLocalRelation cannot constant-fold
  // the whole query away (a Seq.toDF fixture optimizes to a pre-computed
  // LocalRelation and the plan assertions would see nothing)
  private def pairs = spark.range(5).select(
    when($"id" === 0, "kitten").when($"id" === 1, "flaw")
      .when($"id" === 2, "abc").when($"id" === 3, "abcdefgh")
      .otherwise(lit(null)).as("a"), // distances 3, 2, 0, 8, NULL
    when($"id" === 0, "sitting").when($"id" === 1, "lawn")
      .when($"id" === 2, "abc").when($"id" === 3, "zzzzzzzz")
      .otherwise(lit("x")).as("b"))

  private def installed[T](f: => T): T =
    try { GraftOptimizations.install(spark); f }
    finally GraftOptimizations.uninstall(spark)

  private def hits(df: DataFrame): Set[(String, Any)] =
    df.collect().map(r =>
      (r.getString(0), if (r.isNullAt(2)) null else r.getBoolean(2))).toSet

  test("every comparison direction rewrites and preserves results exactly") {
    val preds: Seq[Column => Column] = Seq(
      l => l <= 2, l => lit(2) >= l, l => l < 3, l => lit(3) > l,
      l => l > 2, l => lit(2) < l, l => l >= 3, l => lit(3) <= l)
    preds.zipWithIndex.foreach { case (p, i) =>
      def df = pairs.select($"a", $"b", p(levenshtein($"a", $"b")).as("hit"))
      val plain = hits(df)
      installed {
        val fresh = df
        val optimized = fresh.queryExecution.optimizedPlan.toString
        assert(!optimized.contains(", None)"),
          s"predicate #$i left un-thresholded levenshtein in:\n$optimized")
        assert(optimized.contains("levenshtein("),
          s"predicate #$i lost the levenshtein entirely:\n$optimized")
        assert(hits(fresh) == plain, s"results diverge under the rule for #$i")
      }
    }
  }

  test("the long-cast idiom rewrites too; filters stay exact") {
    def df = pairs.where(levenshtein($"a", $"b").cast("long") <= 2L)
      .select("a", "b")
    val plain = df.collect().map(_.getString(1)).toSet
    installed {
      val fresh = df
      val opt = fresh.queryExecution.optimizedPlan.toString
      assert(opt.contains("levenshtein(") && !opt.contains(", None)"),
        s"expected a thresholded levenshtein in:\n$opt")
      assert(opt.contains("Some(2)) >= 0"), s"expected the >= 0 rewrite in:\n$opt")
      assert(fresh.collect().map(_.getString(1)).toSet == plain)
      assert(plain == Set("lawn", "abc")) // distances 2 and 0 pass; NULL row drops
    }
  }

  test("degenerate bounds are left alone") {
    installed {
      val df = pairs.select((levenshtein($"a", $"b") < 0).as("never"))
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains(", None)"), s"d-1 < 0 must not rewrite:\n$opt")
      assert(df.where($"never").count() == 0)
    }
  }
}
