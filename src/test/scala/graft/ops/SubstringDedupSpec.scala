package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  test("winnowSet: shared substring of k+w-1 chars guarantees a shared fingerprint") {
    val shared = "zxqvwjkpyhgfdstr ablmnce uoqwerty" // 33 chars ≥ 16+8-1
    val docs = Seq(
      (1L, s"left padding text $shared and a tail"),
      (2L, s"completely different prefix $shared unrelated suffix"),
      (3L, "no overlap with the others at all, plain filler words here")
    ).toDF("doc_id", "text")
    val fps = Dedup.winnowed(docs, "doc_id", "text", k = 16, w = 8)
    val byDoc = fps.collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty)
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty)
  }

  test("winnowSet: output is distinct and sorted; empty text → empty set") {
    val docs = Seq((1L, "abababababababababababababab"), (2L, "")).toDF("doc_id", "text")
    val sets = docs.select(col("doc_id"),
      graft.expressions.TextSketches.winnowSet(col("text"), 4, 3).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sets(1L) == sets(1L).distinct.sorted)
    assert(sets(2L).isEmpty)
    // periodic text collapses to very few fingerprints
    assert(sets(1L).size <= 2)
  }

  test("substringCandidatePairs: finds the overlapping pair, respects minShared") {
    val shared = "the identical long boilerplate sentence that appears in both documents verbatim"
    val docs = Seq(
      (1L, s"doc one begins $shared doc one ends"),
      (2L, s"second doc intro $shared closing words"),
      (3L, "entirely unrelated content with zero common windows anywhere")
    ).toDF("doc_id", "text")
    val pairs = Dedup.substringCandidatePairs(docs, "doc_id", "text",
      k = 16, w = 8, minShared = 2, maxPostings = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)))
    assert(pairs.head._3 >= 2L)
  }

  test("substringCandidatePairs: maxPostings cap suppresses boilerplate fingerprints") {
    // 20 docs all sharing one hot sentence: cap=2 kills every posting list
    val hot = "this exact boilerplate navigation footer appears on every single page"
    val docs = (1L to 20L).map(i => (i, s"unique prefix $i $hot")).toDF("doc_id", "text")
    val capped = Dedup.substringCandidatePairs(docs, "doc_id", "text",
      k = 16, w = 8, minShared = 1, maxPostings = 2)
    assert(capped.count() == 0)
    val uncapped = Dedup.substringCandidatePairs(docs, "doc_id", "text",
      k = 16, w = 8, minShared = 1, maxPostings = 200)
    assert(uncapped.count() > 0)
  }
}
