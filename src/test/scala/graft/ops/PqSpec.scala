package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // 8-dim vectors, m=2 subspaces of 4 dims; codebook = first 2 vectors.
  private def vecs = Seq(
    (0L, Array(0f, 0f, 0f, 0f, 9f, 9f, 9f, 9f)),
    (1L, Array(5f, 5f, 5f, 5f, 1f, 1f, 1f, 1f)),
    (2L, Array(0.1f, 0f, 0f, 0f, 1.2f, 1f, 1f, 1f)), // sub0→code0, sub1→code1
    (3L, Array(4.9f, 5f, 5f, 5f, 8.8f, 9f, 9f, 9f))  // sub0→code1, sub1→code0
  ).toDF("vec_id", "embedding")

  private def codebook = vecs.where($"vec_id" < 2)
    .select($"vec_id".as("cid"), $"embedding")

  test("pqCodes: assigns each subspace to the nearest codebook entry") {
    val out = Similarity.pqCodes(vecs, codebook, "vec_id", "embedding", "cid", m = 2)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("code0"), r.getAs[Long]("code1"), r.getAs[Long]("pq_code"))).toMap
    assert(out(0L) == ((0L, 0L, 0L)))      // codebook entries code to themselves
    assert(out(1L) == ((1L, 1L, 257L)))    // 1 + 1*256
    assert(out(2L) == ((0L, 1L, 256L)))    // mixed assignment
    assert(out(3L) == ((1L, 0L, 1L)))
  }

  test("pqCodes: equidistant ties resolve to the lowest code") {
    val cb = Seq((0L, Array(0f, 0f)), (1L, Array(2f, 0f))).toDF("cid", "embedding")
    val pts = Seq((10L, Array(1f, 0f))).toDF("vec_id", "embedding") // midway
    val out = Similarity.pqCodes(pts, cb, "vec_id", "embedding", "cid", m = 1).collect()
    assert(out.head.getAs[Long]("code0") == 0L)
  }

  test("pqKnn: ADC distance is exact when corpus vectors are codebook reconstructions") {
    // Corpus = the 4 concatenations of the 2 codebook subvectors: every
    // vector reconstructs exactly from its code, so ADC == true squared L2.
    val combos = Seq(
      (10L, Array(0f, 0f, 0f, 0f, 9f, 9f, 9f, 9f)), // (cb0, cb0)
      (11L, Array(0f, 0f, 0f, 0f, 1f, 1f, 1f, 1f)), // (cb0, cb1)
      (12L, Array(5f, 5f, 5f, 5f, 9f, 9f, 9f, 9f)), // (cb1, cb0)
      (13L, Array(5f, 5f, 5f, 5f, 1f, 1f, 1f, 1f))  // (cb1, cb1)
    ).toDF("vec_id", "embedding")
    val codes = Similarity.pqCodes(combos, codebook, "vec_id", "embedding", "cid", m = 2)
      .select("vec_id", "pq_code")
    val q = Seq((99L, Array(1f, 0f, 0f, 0f, 8f, 9f, 9f, 9f))).toDF("qid", "embedding")
    val got = Similarity.pqKnn(codes, q, codebook, "vec_id", "embedding", "qid", "cid",
      m = 2, k = 4)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("adc_dist"), r.getAs[Long]("rank"))).toMap
    def l2(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val qv = Array(1f, 0f, 0f, 0f, 8f, 9f, 9f, 9f)
    val expect = Map(
      10L -> l2(qv, Array(0f, 0f, 0f, 0f, 9f, 9f, 9f, 9f)),
      11L -> l2(qv, Array(0f, 0f, 0f, 0f, 1f, 1f, 1f, 1f)),
      12L -> l2(qv, Array(5f, 5f, 5f, 5f, 9f, 9f, 9f, 9f)),
      13L -> l2(qv, Array(5f, 5f, 5f, 5f, 1f, 1f, 1f, 1f)))
    expect.foreach { case (id, d) => assert(math.abs(got(id)._1 - d) < 1e-9) }
    // ranking = ascending true distance
    val byRank = got.toSeq.sortBy(_._2._2).map(_._1)
    assert(byRank == expect.toSeq.sortBy(_._2).map(_._1))
  }

  test("pqKnn recall vs brute-force L2 on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cb = e.where($"vec_id" < 16).select($"vec_id".as("cid"), $"embedding")
    val codes = Similarity.pqCodes(e, cb, "vec_id", "embedding", "cid", m = 4)
      .select("vec_id", "pq_code")
    val q = e.where($"vec_id" % 100 === 0).select($"vec_id".as("qid"), $"embedding")
    // ADC is a SHORTLIST stage (scan codes, rerank survivors with exact
    // math): assert the top-50 shortlist catches the exact top-5 far
    // beyond chance. These synthetic embeddings are near-random — the
    // hardest case for any quantizer — so chance recall is 50/499 ≈ 0.10;
    // measured ADC shortlist recall is ~0.36.
    val approx = Similarity.pqKnn(codes, q, cb, "vec_id", "embedding", "qid", "cid",
      m = 4, k = 50)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")))
    // exact top-5 by squared L2 (not cosine — ADC approximates L2)
    import org.apache.spark.sql.expressions.Window
    val qv = e.where($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val exact = e.crossJoin(broadcast(qv)).where($"qid" =!= $"vec_id")
      .select($"qid", $"vec_id",
        aggregate(zip_with($"embedding", $"qv",
          (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
          lit(0.0), (a, d) => a + d).as("d2"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy($"d2", $"vec_id")))
      .where($"rank" <= 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")))
    val recall = approx.toSet.intersect(exact.toSet).size.toDouble / exact.length
    assert(recall >= 0.2, s"PQ ADC shortlist recall vs brute L2 too low: $recall")
  }

  test("kMeansSub: subspace centroids move to subspace means independently") {
    // sub0 groups {v0,v2}≈0 / {v1,v3}≈5; sub1 groups {v0,v3}≈9 / {v1,v2}≈1
    // — the PAIRING differs per subspace, which only per-subspace
    // training can represent (a full-vector k-means cannot).
    def train(iters: Int) =
      Similarity.kMeansSub(vecs, "vec_id", "embedding", "cid", m = 2, k = 2, iters = iters)
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val t = train(2)
    assert(math.abs(t(0L)(0) - 0.05f) < 1e-4, s"entry0 sub0: ${t(0L)}")
    assert(math.abs(t(1L)(0) - 4.95f) < 1e-4, s"entry1 sub0: ${t(1L)}")
    assert(math.abs(t(0L)(4) - 8.9f) < 1e-4, s"entry0 sub1: ${t(0L)}")
    assert(math.abs(t(1L)(4) - 1.1f) < 1e-4, s"entry1 sub1: ${t(1L)}")
    assert(train(2) == t, "training must be deterministic")
    // iters = 0 returns the init (two lowest-id vectors) verbatim
    assert(train(0)(0L) == Seq(0f, 0f, 0f, 0f, 9f, 9f, 9f, 9f))
    // guards: width not divisible by m; corpus smaller than k
    intercept[IllegalArgumentException] {
      Similarity.kMeansSub(vecs, "vec_id", "embedding", "cid", m = 3, k = 2, iters = 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.kMeansSub(vecs, "vec_id", "embedding", "cid", m = 2, k = 9, iters = 0)
    }
  }

  test("kMeansSub-trained codebook beats the untrained stand-in on ADC recall") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where($"vec_id" % 100 === 0).select($"vec_id".as("qid"), $"embedding")
    val qv = e.where($"vec_id" % 100 === 0).select($"vec_id".as("qid"), $"embedding".as("qv"))
    import org.apache.spark.sql.expressions.Window
    val exact = e.crossJoin(broadcast(qv)).where($"qid" =!= $"vec_id")
      .select($"qid", $"vec_id",
        aggregate(zip_with($"embedding", $"qv",
          (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
          lit(0.0), (a, d) => a + d).as("d2"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy($"d2", $"vec_id")))
      .where($"rank" <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(cb: org.apache.spark.sql.DataFrame): Double = {
      val codes = Similarity.pqCodes(e, cb, "vec_id", "embedding", "cid", m = 4)
        .select("vec_id", "pq_code")
      Similarity.pqKnn(codes, q, cb, "vec_id", "embedding", "qid", "cid", m = 4, k = 50)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        .intersect(exact).size.toDouble / exact.size
    }
    val standIn = recall(e.where($"vec_id" < 16).select($"vec_id".as("cid"), $"embedding"))
    val trained = recall(Similarity.kMeansSub(e, "vec_id", "embedding", "cid",
      m = 4, k = 16, iters = 2))
    // measured (deterministic): stand-in 0.36, trained 0.60
    assert(trained >= 0.5, s"trained ADC shortlist recall too low: $trained")
    assert(trained >= standIn + 0.1,
      s"training must materially improve recall: trained=$trained standIn=$standIn")
  }

  test("ivfPqKnn: probing every cluster reduces exactly to plain PQ ADC search") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = e.where($"vec_id" < 8).select($"vec_id".as("cid"), $"embedding")
    val cb = e.where($"vec_id" < 16).select($"vec_id".as("cid"), $"embedding")
    val codes = Similarity.pqCodes(e, cb, "vec_id", "embedding", "cid", m = 4)
      .select("vec_id", "pq_code")
    val indexed = Similarity.ivfAssign(e, cents, "vec_id", "embedding", "cid")
      .select("vec_id", "cluster").join(codes, "vec_id")
    val q = e.where($"vec_id" % 100 === 0).select($"vec_id".as("qid"), $"embedding")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("adc_dist"), r.getAs[Long]("rank"))).toSet
    val full = rows(Similarity.pqKnn(codes, q, cb, "vec_id", "embedding", "qid", "cid",
      m = 4, k = 5))
    val ivfpqAll = rows(Similarity.ivfPqKnn(indexed, q, cents, cb,
      "vec_id", "embedding", "qid", "cid", m = 4, k = 5, nprobe = 8))
    assert(ivfpqAll == full, "nprobe = #clusters must equal plain ADC search")
    // fewer probes: results are a subset of the probed clusters, never empty
    val one = Similarity.ivfPqKnn(indexed, q, cents, cb,
      "vec_id", "embedding", "qid", "cid", m = 4, k = 5, nprobe = 1)
    assert(one.count() > 0)
  }

  test("persisted IVF-PQ index: probe set prunes the scan to its cluster partitions") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = e.where($"vec_id" < 8).select($"vec_id".as("cid"), $"embedding")
    val cb = e.where($"vec_id" < 16).select($"vec_id".as("cid"), $"embedding")
    val indexed = Similarity.ivfAssign(e, cents, "vec_id", "embedding", "cid")
      .select("vec_id", "cluster")
      .join(Similarity.pqCodes(e, cb, "vec_id", "embedding", "cid", m = 4)
        .select("vec_id", "pq_code"), "vec_id")
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString + "/idx"
    Similarity.writeIvfIndex(indexed, dir)
    // one query so its 2 probes are a strict subset of the 8 clusters
    val q = e.where($"vec_id" === 100).select($"vec_id".as("qid"), $"embedding")
    val probes = Similarity.probedClusters(q, cents, "qid", "embedding", "cid", nprobe = 2)
    assert(probes.nonEmpty && probes.size < 8, s"fixture must probe a strict subset: $probes")
    val pruned = Similarity.readIvfIndex(spark, dir, probes)
    // partition pruning is visible in the files actually READ (inputFiles
    // lists the pre-filter relation): only probed cluster= dirs appear
    val touched = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
      .map(f => f.split("cluster=")(1).split("/")(0).toLong).toSet
    assert(touched == probes.toSet, s"scan must open only probed partitions: $touched")
    // and the plan carries the static partition filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cluster"),
      s"expected a partition filter in:\n$plan")
    // and the pruned index answers identically to the full one
    val full = Similarity.ivfPqKnn(
      spark.read.parquet(dir), q, cents, cb,
      "vec_id", "embedding", "qid", "cid", m = 4, k = 5, nprobe = 2)
    val viaPruned = Similarity.ivfPqKnn(pruned, q, cents, cb,
      "vec_id", "embedding", "qid", "cid", m = 4, k = 5, nprobe = 2)
    assert(viaPruned.collect().toSet == full.collect().toSet)
  }

  test("pq guards: m > 8 and oversized codebooks are rejected") {
    intercept[IllegalArgumentException] {
      Similarity.pqCodes(vecs, codebook, "vec_id", "embedding", "cid", m = 9)
    }
    val big = spark.range(257).select($"id".as("cid"),
      array(lit(0f), lit(0f)).as("embedding"))
    intercept[IllegalArgumentException] {
      Similarity.pqCodes(vecs, big, "vec_id", "embedding", "cid", m = 1)
    }
  }
}
