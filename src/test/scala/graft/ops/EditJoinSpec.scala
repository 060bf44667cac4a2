package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Dedup.editDistanceJoin]]: the distributed blocking (two-phase
  * prefix-sum rank + rank-bucket equi-join) must produce exactly the
  * pairs a single-window reference formulation produces, the Levenshtein
  * verification must be exact, and the plan must stay a keyed equi-join
  * — no cartesian or nested-loop anywhere. */
class EditJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def norm(len: Int) =
    substring(regexp_replace(lower(trim(col("text"))), "\\s+", " "), 1, len)

  test("editDistanceJoin ≡ single-window reference on the real corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = Dedup.editDistanceJoin(docs, "doc_id", "text",
        window = 8, maxDist = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // reference: one global window (fine at sf0.001), all pairs within 8
    // positions, exact Levenshtein on the same normalized 120-char prefix
    val W = org.apache.spark.sql.expressions.Window.orderBy("k", "doc_id")
    val ranked = docs
      .select(col("doc_id"), norm(30).as("k"), norm(120).as("t"))
      .withColumn("r", row_number().over(W))
    val ref = ranked.select(col("doc_id").as("id_a"), col("r").as("ra"), col("t").as("ta"))
      .crossJoin(ranked.select(col("doc_id").as("id_b"), col("r").as("rb"), col("t").as("tb")))
      .where(col("rb") > col("ra") && col("rb") - col("ra") <= 8)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("ta"), col("tb")).cast("long").as("d"))
      .where(col("d") <= 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(ref.nonEmpty, "fixture must contain at least one qualifying pair")
    assert(got == ref,
      s"edit join must equal the reference: missing=${ref -- got} extra=${got -- ref}")
  }

  test("a planted near-duplicate verifies at exactly its edit distance") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // clone one doc with a 3-char substitution inside the first 120
    // normalized chars; the clone shares the 30-char blocking key, so it
    // sorts adjacent to its original and MUST verify at distance 3
    val origId = 0L
    val planted = docs.where(col("doc_id") === origId)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(expr("substring(text, 1, 60)"), lit("qqq"),
          expr("substring(text, 64)")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    val pairs = Dedup.editDistanceJoin(docs.unionByName(planted),
        "doc_id", "text", window = 8, maxDist = 10)
      .where((col("id_a") === origId && col("id_b") === origId + 1000000L) ||
             (col("id_b") === origId && col("id_a") === origId + 1000000L))
      .collect()
    assert(pairs.length == 1, s"planted pair must verify: ${pairs.toSeq}")
    // ≤ 3 substituted chars; whitespace re-collapse can shift it ±2
    val d = pairs.head.getLong(2)
    assert(d >= 1L && d <= 5L,
      s"3-char substitution must measure a small distance, got $d")
  }

  test("plan: no cartesian or nested-loop join anywhere in the edit join") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = Dedup.editDistanceJoin(docs, "doc_id", "text",
        window = 8, maxDist = 40)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
  }
}
