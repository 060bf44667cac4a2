package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Dedup.prefixJaccardJoin]]'s completeness guarantee: the prefix
  * filter must find EVERY pair with Jaccard ≥ τ (the property LSH cannot
  * give), verified against a brute-force all-pairs join on the real
  * sf0.001 corpus, plus plan-shape and pruning checks. */
class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("prefixJaccardJoin ≡ brute-force all-pairs at τ = 3/5 (no false negatives/positives)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = Dedup.prefixJaccardJoin(docs, "doc_id", "text", 3, 5)
      .select("id_a", "id_b", "n_shared").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val sh = docs.select(col("doc_id"),
      graft.expressions.TextSketches.shingleHashSet(col("text"), 3).as("s"))
    val brute = sh.select(col("doc_id").as("id_a"), col("s").as("sa"))
      .crossJoin(sh.select(col("doc_id").as("id_b"), col("s").as("sb")))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        size(col("sa")).cast("long").as("na"),
        size(col("sb")).cast("long").as("nb"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("ns"))
      .where(lit(5) * col("ns") >= lit(3) * (col("na") + col("nb") - col("ns")))
      .select("id_a", "id_b", "ns").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(brute.nonEmpty, "fixture must contain at least one qualifying pair")
    assert(got == brute,
      s"prefix join must equal brute force: missing=${brute -- got} extra=${got -- brute}")
  }

  test("prefix filter prunes: candidate elements are a strict subset of all elements") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sh = docs.select(col("doc_id").as("__id"),
      graft.expressions.TextSketches.shingleHashSet(col("text"), 3).as("__s"))
    val el = sh.select(col("__id"), explode(col("__s")).as("__e"))
    val W = org.apache.spark.sql.expressions.Window
    val dfreq = el.groupBy("__e").agg(count(lit(1)).as("__df"))
    val ranked = el.join(dfreq, "__e")
      .withColumn("__pos", row_number().over(W.partitionBy("__id").orderBy("__df", "__e")))
      .withColumn("__sz", count(lit(1)).over(W.partitionBy("__id")))
    val total = ranked.count()
    val prefix = ranked.where(col("__pos") <=
      col("__sz") - expr("(__sz * 3 + 4) DIV 5") + 1).count()
    // τ = 3/5 keeps ≤ 2/5 of each set (+1): the join input must shrink hard
    assert(prefix < total * 45 / 100,
      s"prefix rows $prefix should be well under 45% of $total")
  }

  test("plan: no cartesian or nested-loop join anywhere in the prefix join") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = Dedup.prefixJaccardJoin(docs, "doc_id", "text", 3, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"no nested loop:\n$plan")
  }

  test("property: ≡ brute force for random corpora across tau = 1/2, 3/5, 3/4") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // small vocab + short docs → dense overlap structure, many boundary
    // pairs sitting exactly at the threshold
    val genCorpus: Gen[(List[String], (Int, Int))] = for {
      n <- Gen.choose(2, 30)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 12)
        ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))
      } yield ws.mkString(" "))
      tau <- Gen.oneOf((1, 2), (3, 5), (3, 4))
    } yield (docs, tau)
    val prop = Prop.forAll(genCorpus) { case (texts, (tn, td)) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Dedup.prefixJaccardJoin(docs, "doc_id", "text", tn, td,
        shingleWords = 2)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sh = docs.select(col("doc_id"),
        graft.expressions.TextSketches.shingleHashSet(col("text"), 2).as("s"))
      val brute = sh.select(col("doc_id").as("id_a"), col("s").as("sa"))
        .crossJoin(sh.select(col("doc_id").as("id_b"), col("s").as("sb")))
        .where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          size(col("sa")).cast("long").as("na"),
          size(col("sb")).cast("long").as("nb"),
          size(array_intersect(col("sa"), col("sb"))).cast("long").as("ns"))
        .where(lit(td) * col("ns") >= lit(tn) * (col("na") + col("nb") - col("ns")))
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got == brute
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("tau = 1 finds exactly the identical-set pairs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words entirely here now"),
      (4L, "alpha beta gamma delta epsilon different")
    ).toDF("doc_id", "text")
    val got = Dedup.prefixJaccardJoin(docs, "doc_id", "text", 1, 1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }
}
