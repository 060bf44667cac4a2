package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins [[TokenCountRule]]: the `size(split(...))` token-count idiom
  * rewrites to the allocation-free counting expression with identical
  * results (empty strings, trailing separators, NULLs, multi-space
  * runs), legacy NULL semantics survive, and unsafe patterns
  * (zero-width-matchable, lookaround, non-literal, non-default limit)
  * are left untouched. Frames are built FRESH under the installed rule
  * (a DataFrame caches its QueryExecution). */
class TokenCountRuleSpec extends SparkSpec {
  import spark.implicits._

  private def installed[T](f: => T): T =
    try { GraftOptimizations.install(spark); f }
    finally GraftOptimizations.uninstall(spark)

  // derived from range so ConvertToLocalRelation cannot pre-fold it
  private def texts = spark.range(6).select(
    when($"id" === 0, "alpha beta gamma")
      .when($"id" === 1, "one")
      .when($"id" === 2, "")
      .when($"id" === 3, "  leading and  double  spaces ")
      .when($"id" === 4, "trailing space ")
      .otherwise(lit(null)).as("t"))

  private def counts(df: DataFrame): Seq[Any] =
    df.collect().map(r => if (r.isNullAt(0)) null else r.getInt(0)).toSeq

  test("size(split) rewrites to the counting expression; results identical incl. NULL/empty") {
    def df = texts.select(size(split($"t", "\\s+")).as("n"))
    val plain = counts(df)
    installed {
      val fresh = df
      val plan = fresh.queryExecution.optimizedPlan.toString
      assert(plan.contains("regexp_match_count"), s"no rewrite in:\n$plan")
      assert(!plan.contains("split("), s"split survived in:\n$plan")
      assert(counts(fresh) == plain)
    }
    // the repo-wide tokens() composition stays exact too
    def tok = texts.where($"t".isNotNull)
      .select(size(graft.functions.TextFunctions.tokens($"t")).as("n"))
    val plainTok = counts(tok)
    installed(assert(counts(tok) == plainTok))
  }

  test("legacy size(null) = -1 is preserved through the rewrite") {
    val prev = spark.conf.get("spark.sql.legacy.sizeOfNull")
    try {
      Seq("true", "false").foreach { legacy =>
        spark.conf.set("spark.sql.legacy.sizeOfNull", legacy)
        def df = texts.select(size(split($"t", ",")).as("n"))
        val plain = counts(df)
        installed(assert(counts(df) == plain, s"legacy=$legacy diverged"))
      }
    } finally spark.conf.set("spark.sql.legacy.sizeOfNull", prev)
  }

  test("unsafe patterns and non-default limits do NOT rewrite") {
    installed {
      // zero-width-matchable, lookaround, explicit limit, dynamic regex
      val unsafe = Seq(
        texts.select(size(split($"t", "x*")).as("n")),
        texts.select(size(split($"t", "(?=a)")).as("n")),
        texts.select(size(split($"t", "\\s+", 2)).as("n")),
        texts.select(size(split($"t", $"t")).as("n")))
      unsafe.foreach { df =>
        val plan = df.queryExecution.optimizedPlan.toString
        assert(!plan.contains("regexp_match_count"), s"unsafe rewrite in:\n$plan")
      }
    }
  }

  test("separator-count identity holds on adversarial shapes (leading/trailing/consecutive)") {
    val cases = Seq("", ",", ",,", "a,", ",a", "a,,b,", "a", "a,b,c")
    def df = spark.range(cases.length).select(
      element_at(typedLit(cases), ($"id" + 1).cast("int")).as("t"))
      .select(size(split($"t", ",")).as("n"))
    val plain = counts(df)
    installed(assert(counts(df) == plain, s"identity broke: $plain"))
  }
}
