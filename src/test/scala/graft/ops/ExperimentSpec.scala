package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("abTest: hand-computed Welch t, tie-averaged Mann-Whitney U, degenerate cohorts") {
    // key x: A = {1, 2, 3}, B = {2, 4}. Pooled ranks 1,(2,3)avg 2.5,4,5
    // → R_a = 1 + 2.5 + 4 = 7.5, U_a = 7.5 − 3·4/2 = 1.5.
    // mean_a = 2, mean_b = 3, var_a = 1, var_b = 2.
    // key y: a single A row, no B — welch_t undefined (null).
    val df = Seq(
      ("x", 0L, 1.0), ("x", 2L, 2.0), ("x", 4L, 3.0),
      ("x", 1L, 2.0), ("x", 3L, 4.0),
      ("y", 0L, 5.0)
    ).toDF("k", "uid", "v")
    val out = Experiment.abTest(df, "k", "uid % 2 = 0", "v")
      .collect().map(r => r.getAs[String]("k") -> r).toMap

    val x = out("x")
    assert(x.getAs[Long]("n_a") == 3 && x.getAs[Long]("n_b") == 2)
    assert(x.getAs[Double]("mean_a") == 2.0 && x.getAs[Double]("mean_b") == 3.0)
    assert(x.getAs[Double]("u_stat") == 1.5)
    val expT = (2.0 - 3.0) / math.sqrt(1.0 / 3.0 + 2.0 / 2.0)
    assert(x.getAs[Double]("welch_t") == expT)

    val y = out("y")
    assert(y.getAs[Long]("n_a") == 1 && y.getAs[Long]("n_b") == 0)
    assert(y.isNullAt(y.fieldIndex("welch_t")))
    // lone A row: rank 1, ties 1 → r2 = 2; U_a = (2 − 1·2)/2 = 0
    assert(y.getAs[Double]("u_stat") == 0.0)
  }

  test("theilSen: outlier-immune median slope, equal-ts exclusion, thinning bound") {
    // slopes of {(0,0),(1,1),(2,2),(3,10)}: [1, 1, 10/3, 1, 4.5, 8]
    // sorted [1,1,1,10/3,4.5,8], lower median (rank 3) = 1.0 — the wild
    // point that would own an OLS fit cannot move it.
    val df = Seq((1L, 10L, 0L, 0.0), (1L, 11L, 1L, 1.0),
      (1L, 12L, 2L, 2.0), (1L, 13L, 3L, 10.0)).toDF("k", "id", "t", "v")
    val r = Experiment.theilSen(df, "k", "id", "t", "v").collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_points") == 4 && r(0).getAs[Long]("n_pairs") == 6)
    assert(r(0).getAs[Double]("theil_sen_slope") == 1.0)

    // equal-ts pairs are excluded: two points at one ts → 0 valid pairs
    // with each other, and a key with ONLY equal-ts points emits no row
    val eq = Seq((2L, 20L, 5L, 1.0), (2L, 21L, 5L, 9.0)).toDF("k", "id", "t", "v")
    assert(Experiment.theilSen(eq, "k", "id", "t", "v").collect().isEmpty)

    // systematic thinning caps points per key (n = 250, stride 3 → 84)
    val big = (0 until 250).map(i => (3L, i.toLong, i.toLong, i.toDouble))
      .toDF("k", "id", "t", "v")
    val rb = Experiment.theilSen(big, "k", "id", "t", "v", maxPerKey = 100).collect()
    assert(rb.length == 1)
    assert(rb(0).getAs[Long]("n_points") == 84)
    assert(rb(0).getAs[Double]("theil_sen_slope") == 1.0) // exact line survives thinning
  }

  test("abTest plans ONE shuffle: the tie window reuses the rank window's partitioning") {
    val e = spark.read.parquet(s"$sf/events.parquet")
    val plan = Experiment.abTest(e, "event_type", "user_id % 2 = 0", "value")
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected exactly 1 shuffle exchange in:\n$plan")
  }

  test("abTest: U_a + U_b = n_a·n_b and cohort-swap antisymmetry on real data") {
    val e = spark.read.parquet(s"$sf/events.parquet")
    val a = Experiment.abTest(e, "event_type", "user_id % 2 = 0", "value")
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val b = Experiment.abTest(e, "event_type", "user_id % 2 = 1", "value")
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(a.nonEmpty && a.keySet == b.keySet)
    a.foreach { case (k, ra) =>
      val rb = b(k)
      val (na, nb) = (ra.getAs[Long]("n_a"), ra.getAs[Long]("n_b"))
      assert(rb.getAs[Long]("n_a") == nb && rb.getAs[Long]("n_b") == na)
      // complementary U statistics partition the n_a·n_b pair count
      assert(ra.getAs[Double]("u_stat") + rb.getAs[Double]("u_stat") ==
        na.toDouble * nb.toDouble)
      // swapping cohorts flips the sign of the mean difference
      assert(ra.getAs[Double]("welch_t") == -rb.getAs[Double]("welch_t"))
    }
  }
}
