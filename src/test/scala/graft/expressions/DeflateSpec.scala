package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the non-SQL-expressible deflate-size signal (COVERAGE.md ∅
  * convention): ordering properties, determinism, null/empty handling,
  * and the codegen path. */
class DeflateSpec extends SparkSpec {
  import spark.implicits._

  private def sizes(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      .select($"id", DeflateSizeExpr.deflateSize($"t").as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("repetitive text compresses far below prose of the same length") {
    val boiler = "click here click here click here " * 30 // ~1 KB, 1 phrase
    val prose = (1 to 165).map(i => s"w${i * 7919 % 9973}").mkString(" ")
    assert(boiler.length >= prose.length - 50)
    val m = sizes(Seq(boiler, prose))
    assert(m(0L) < m(1L) / 2,
      s"boilerplate ${m(0L)} should compress to < half of prose ${m(1L)}")
    // ratio sanity: both strictly positive, below raw length
    assert(m(0L) > 0 && m(1L) > 0 && m(1L) < prose.getBytes("UTF-8").length)
  }

  test("deterministic: same inputs give identical sizes across runs and partitionings") {
    val texts = (1 to 40).map(i => ("x" * i) + s" payload $i " + ("yz" * (i % 7)))
    val a = sizes(texts)
    val b = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t").repartition(7)
      .select($"id", DeflateSizeExpr.deflateSize($"t").as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }

  test("empty string → 0; NULL propagates; multibyte input counts UTF-8 bytes") {
    val out = Seq((1L, Some("")), (2L, None), (3L, Some("héllo wörld")))
      .toDF("id", "t")
      .select($"id", DeflateSizeExpr.deflateSize($"t").as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(out(1L).contains(0))
    assert(out(2L).isEmpty)
    assert(out(3L).exists(_ > 0))
  }

  test("stays inside whole-stage codegen (no fallback in the hot path)") {
    val df = spark.range(100).select(
      DeflateSizeExpr.deflateSize(concat(lit("doc "), $"id".cast("string"))).as("n"))
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen
    // stage; a CodegenFallback expression would strip it from Project
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.agg(sum($"n")).head().getLong(0) > 0)
  }
}
