package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins [[TokenContainsRule]]: the `array_contains(split(...), 'lit')`
  * token-membership idiom rewrites to [[graft.expressions
  * .ContainsTokenExpr]] with identical results across the split edge
  * cases (leading/trailing separators → empty parts, empty string →
  * [""], NULL input → NULL), and unsafe shapes (non-literal probe,
  * explicit limit, zero-width-matchable regex) are left untouched.
  * Frames are built FRESH under the installed rule (a DataFrame caches
  * its QueryExecution). */
class TokenContainsRuleSpec extends SparkSpec {
  import spark.implicits._

  private def installed[T](f: => T): T =
    try { GraftOptimizations.install(spark); f }
    finally GraftOptimizations.uninstall(spark)

  // derived from range so ConvertToLocalRelation cannot pre-fold it
  private def texts = spark.range(7).select(
    when($"id" === 0, "alpha beta gamma")
      .when($"id" === 1, "beta")
      .when($"id" === 2, "")
      .when($"id" === 3, " beta leading")
      .when($"id" === 4, "trailing beta ")
      .when($"id" === 5, "betamax alphabeta")
      .otherwise(lit(null)).as("t"))

  private def vals(df: DataFrame): Seq[Any] =
    df.collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0)).toSeq

  test("array_contains(split) rewrites; results identical incl. empties and NULL") {
    for (tok <- Seq("beta", "", "absent")) {
      def df = texts.select(array_contains(split($"t", "\\s+"), tok).as("hit"))
      val plain = vals(df)
      installed {
        val fresh = df
        val plan = fresh.queryExecution.optimizedPlan.toString
        assert(plan.contains("contains_token"), s"no rewrite in:\n$plan")
        assert(!plan.contains("array_contains"), s"idiom survived in:\n$plan")
        assert(vals(fresh) == plain, s"tok='$tok' diverged")
      }
    }
    // substring-vs-token discrimination pinned explicitly: 'betamax' and
    // 'alphabeta' must NOT count as the token 'beta'
    installed {
      val hits = texts.where($"t".isNotNull)
        .select(array_contains(split($"t", "\\s+"), "beta").as("hit"))
        .collect().map(_.getBoolean(0)).toSeq
      assert(hits == Seq(true, true, false, true, true, false))
    }
    // the repo-wide tokens() composition (trim inside) rewrites too
    def tok = texts.select(
      array_contains(graft.functions.TextFunctions.tokens($"t"), "beta").as("hit"))
    val plainTok = vals(tok)
    installed {
      val fresh = tok
      assert(fresh.queryExecution.optimizedPlan.toString.contains("contains_token"))
      assert(vals(fresh) == plainTok)
    }
  }

  test("non-rewrites: non-literal probe, explicit limit, zero-width regex") {
    installed {
      // probe is a column, not a literal
      val p1 = texts.select(
          array_contains(split($"t", "\\s+"), $"t").as("hit"))
        .queryExecution.optimizedPlan.toString
      assert(!p1.contains("contains_token"), p1)
      // explicit limit changes part boundaries
      val p2 = texts.select(
          array_contains(split($"t", "\\s+", 2), "beta").as("hit"))
        .queryExecution.optimizedPlan.toString
      assert(!p2.contains("contains_token"), p2)
      // 'a*' matches zero-width — unsafe, untouched
      val p3 = texts.select(
          array_contains(split($"t", "a*"), "beta").as("hit"))
        .queryExecution.optimizedPlan.toString
      assert(!p3.contains("contains_token"), p3)
    }
  }

  test("prunedReadToken's exact predicate runs under the rule unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("ctok").toString + "/d"
    spark.range(100).select($"id",
        concat(lit("alpha "), when($"id" < 10, "needle").otherwise("hay"))
          .as("text"))
      .write.parquet(dir)
    val stats = graft.io.StatsIndex.buildTokenBloom(spark, dir, "text")
      .localCheckpoint(true)
    installed {
      val r = graft.io.StatsIndex.prunedReadToken(spark, dir, stats, "text", "needle")
      assert(r.count() == 10L)
      assert(r.queryExecution.optimizedPlan.toString.contains("contains_token"))
    }
  }
}
