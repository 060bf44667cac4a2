package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins [[DistinctCountRule]]: the `size(array_distinct(x))` idiom
  * rewrites to the hash-set counting expression with identical results
  * (duplicates, NULL elements, NULL arrays, empty arrays), legacy NULL
  * semantics survive, and inadmissible element types (doubles, whose
  * -0.0/NaN normalization belongs to the built-in) are left untouched.
  * Frames are built FRESH under the installed rule (a DataFrame caches
  * its QueryExecution). */
class DistinctCountRuleSpec extends SparkSpec {
  import spark.implicits._

  private def installed[T](f: => T): T =
    try { GraftOptimizations.install(spark); f }
    finally GraftOptimizations.uninstall(spark)

  // elements derived from the id ATTRIBUTE so constant folding cannot
  // collapse array_distinct before the rule sees it
  private def arrays = spark.range(5).select(expr(
    """CASE
      |  WHEN id = 0 THEN array(concat('a', id), concat('b', id),
      |                         concat('a', id), concat('b', id))
      |  WHEN id = 1 THEN array(concat('x', id))
      |  WHEN id = 2 THEN CAST(array() AS ARRAY<STRING>)
      |  WHEN id = 3 THEN array(concat('a', id), NULL, NULL, concat('a', id))
      |END""".stripMargin).as("a"))

  private def counts(df: DataFrame): Seq[Any] =
    df.collect().map(r => if (r.isNullAt(0)) null else r.getInt(0)).toSeq

  test("size(array_distinct) rewrites; results identical incl. NULLs, dups, empties") {
    def df = arrays.select(size(array_distinct($"a")).as("n"))
    val plain = counts(df)
    assert(plain == Seq(2, 1, 0, 2, null)) // one NULL element counts once
    installed {
      val fresh = df
      val plan = fresh.queryExecution.optimizedPlan.toString
      assert(plan.contains("array_distinct_count"), s"no rewrite in:\n$plan")
      assert(!plan.contains("array_distinct("), s"built-in survived in:\n$plan")
      assert(counts(fresh) == plain)
    }
    // integral element types rewrite too
    def ints = spark.range(3).select(
      array($"id", $"id" % 2, lit(7L)).as("a"))
      .select(size(array_distinct($"a")).as("n"))
    val plainInts = counts(ints)
    installed {
      val fresh = ints
      assert(fresh.queryExecution.optimizedPlan.toString
        .contains("array_distinct_count"))
      assert(counts(fresh) == plainInts)
    }
  }

  test("legacy size(null) = -1 is preserved through the rewrite") {
    val prev = spark.conf.get("spark.sql.legacy.sizeOfNull")
    try {
      Seq("true", "false").foreach { legacy =>
        spark.conf.set("spark.sql.legacy.sizeOfNull", legacy)
        def df = arrays.select(size(array_distinct($"a")).as("n"))
        val plain = counts(df)
        installed(assert(counts(df) == plain, s"legacy=$legacy diverged"))
      }
    } finally spark.conf.set("spark.sql.legacy.sizeOfNull", prev)
  }

  test("double-element arrays do NOT rewrite (-0.0/NaN stay the built-in's concern)") {
    installed {
      val df = spark.range(2)
        .select(array($"id".cast("double") * -0.0, lit(0.0)).as("a"))
        .select(size(array_distinct($"a")).as("n"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("array_distinct_count"), s"unsafe rewrite in:\n$plan")
    }
  }

  test("the repo-wide hot paths stay exact under the rule (tokenStats on real docs)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def stats = graft.ops.TextAnalysis.tokenStats(docs, "doc_id", "text")
      .orderBy("doc_id")
    val plain = stats.collect().toSeq
    installed {
      val fresh = stats
      assert(fresh.queryExecution.optimizedPlan.toString
        .contains("array_distinct_count"))
      assert(fresh.collect().toSeq == plain)
    }
  }
}
