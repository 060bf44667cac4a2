package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[IncrementalJoin.refresh]] — the maintained join view must equal the
  * from-scratch join over the merged fact for every delta class, and the
  * refresh must stay batch-proportional (never re-join unchanged rows). */
class IncrementalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val dim = Seq((10L, "gold"), (20L, "silver"))
    .toDF("cust", "tier")

  private def full(fact: DataFrame) = fact.join(dim, Seq("cust"), "left")

  private def sortedRows(df: DataFrame) =
    df.select("cust", "pk", "v", "tier").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), r.get(2), Option(r.get(3))))
      .sortBy(_.toString)

  test("insert + update + delete + orphan-dim + NULL-pk all converge to the full re-join") {
    val prevFact = Seq(
      (Option(1L), Option(10L), "a"),   // untouched
      (Option(2L), Option(10L), "b"),   // updated (moves dim key 10 → 20)
      (Option(3L), Option(20L), "c"),   // deleted
      (Option(4L), Option(99L), "d"),   // untouched, dim orphan (NULL tier)
      (None: Option[Long], Option(10L), "e") // NULL pk, updated in batch
    ).toDF("pk", "cust", "v")
    // merged truth: 2 moved to silver, 3 gone, NULL-pk value bumped, 5 new
    val mergedFact = Seq(
      (Option(1L), Option(10L), "a"),
      (Option(2L), Option(20L), "b2"),
      (Option(4L), Option(99L), "d"),
      (None: Option[Long], Option(10L), "e2"),
      (Option(5L), Option(20L), "f")
    ).toDF("pk", "cust", "v")
    val changedKeys = Seq(Option(2L), Option(3L), Option(5L), None)
      .toDF("pk")

    val got = IncrementalJoin.refresh(mergedFact, full(prevFact), changedKeys,
      Seq("pk"), dim, Seq("cust"), "left")
    assert(sortedRows(got).toSeq == sortedRows(full(mergedFact)).toSeq)
  }

  test("dim-delta path: impacted fact keys derived from the dim batch converge too") {
    val fact = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 20L, "c"))
      .toDF("pk", "cust", "v")
    val dim2 = Seq((10L, "gold"), (20L, "bronze")).toDF("cust", "tier") // 20 re-tiered
    val dimBatchKeys = Seq(20L).toDF("cust")
    // fact unchanged; eviction driven by the fact PKs that join the
    // changed dim keys — the symmetric delta term from the scaladoc
    val impacted = fact.join(dimBatchKeys, Seq("cust"), "left_semi").select("pk")
    val got = IncrementalJoin.refresh(fact, fact.join(dim, Seq("cust"), "left"),
      impacted, Seq("pk"), dim2, Seq("cust"), "left")
    val want = fact.join(dim2, Seq("cust"), "left")
    assert(sortedRows(got).toSeq == sortedRows(want).toSeq)
  }

  test("refresh never re-joins unchanged rows: kept side passes through without the dim") {
    // an unchanged row whose dim mapping is stale-by-construction in the
    // prev view proves the kept side is a pass-through (eviction is the
    // ONLY way a view row changes) — exactly the batch-proportional claim
    val prevView = Seq((1L, 10L, "a", "STALE"), (2L, 10L, "b", "gold"))
      .toDF("pk", "cust", "v", "tier")
    val fact = Seq((1L, 10L, "a"), (2L, 10L, "b")).toDF("pk", "cust", "v")
    val got = IncrementalJoin.refresh(fact, prevView, Seq(2L).toDF("pk"),
      Seq("pk"), dim, Seq("cust"), "left")
    val tiers = got.collect().map(r => r.getAs[Long]("pk") -> r.getAs[String]("tier")).toMap
    assert(tiers(1L) == "STALE" && tiers(2L) == "gold")
  }
}
