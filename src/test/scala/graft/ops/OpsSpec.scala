package graft.ops

import graft.SparkSpec
import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("exact dedup finds identical normalized texts") {
    val d = Seq((1L, "hello  world"), (2L, "Hello World"), (3L, "other text"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(d, "doc_id", "text").collect()
    assert(out.length == 2)
    val dup = out.find(_.getAs[Long]("n_copies") == 2).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("lsh candidate pairs include a true near-duplicate and self-consistency") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val d = Seq((1L, base), (2L, base + " extra"), (3L, "completely different words here now ok"))
      .toDF("doc_id", "text")
    val pairs = Dedup.lshCandidatePairs(d, "doc_id", "text", 3, 16, 4).collect()
    assert(pairs.exists(r => r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L))
    pairs.foreach(r => assert(r.getAs[Double]("est_jaccard") >= 0.0 &&
      r.getAs[Double]("est_jaccard") <= 1.0))
  }

  test("simhash: identical docs get identical sketch; near docs small hamming") {
    val d = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma epsilon")).toDF("doc_id", "text")
    val sk = Dedup.simHashed(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sk(1L) == sk(2L))
    val ham = java.lang.Long.bitCount(sk(1L) ^ sk(3L))
    assert(ham < 16, s"near-dup hamming $ham should be well under half the bits")
  }

  test("ngram jaccard: identical=1.0, disjoint=0.0") {
    val d = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w v"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.ngramJaccard(d, pairs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 2L)) == 1.0 && out((1L, 3L)) == 0.0)
  }

  test("ngram containment: near-subset doc scores 1.0 where jaccard is low") {
    val d = Seq(
      (1L, "a b c d e"), // 3 shingles, all present in doc 2
      (2L, "a b c d e f g h i j k l"), // 10 shingles
      (3L, "x y z w v u t")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.ngramContainment(d, pairs, "doc_id", "text").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r).toMap
    val sub = out((1L, 2L))
    assert(sub.getAs[Double]("containment") == 1.0)
    assert(sub.getAs[Long]("n_shared") == sub.getAs[Long]("n_a"))
    // the same pair under Jaccard is far from 1 — union dominated by the
    // superset — which is exactly why the asymmetric measure exists
    val jac = Dedup.ngramJaccard(d, Seq((1L, 2L)).toDF("id_a", "id_b"),
      "doc_id", "text").collect()(0).getAs[Double]("jaccard")
    assert(jac <= 0.3)
    assert(out((1L, 3L)).getAs[Double]("containment") == 0.0)
  }

  test("contamination scores: bench copy = 1.0, disjoint = 0.0, partial counted exactly") {
    val d = Seq(
      (1L, "q w e r t y u"), // verbatim bench copy
      (2L, "a b c d e f"), // disjoint
      (3L, "q w e r zz xx yy")) // shares 2 of its 5 trigrams
      .toDF("doc_id", "text")
    val bench = Seq((100L, "q w e r t y u")).toDF("bench_id", "text")
    val out = Decontaminate.contaminationScores(d, "doc_id", "text",
      bench, "text", shingleWords = 3, threshold = 0.5).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Double]("overlap_frac") == 1.0 &&
      out(1L).getAs[Boolean]("contaminated"))
    assert(out(2L).getAs[Double]("overlap_frac") == 0.0 &&
      !out(2L).getAs[Boolean]("contaminated"))
    assert(out(3L).getAs[Long]("n_grams") == 5L &&
      out(3L).getAs[Long]("n_shared") == 2L &&
      !out(3L).getAs[Boolean]("contaminated"))
  }

  test("cross-corpus candidates: finds cross-side near-dups, never within-side pairs") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val crawl = Seq((1L, base), (3L, "completely unrelated words right here")).toDF("doc_id", "text")
    val ref = Seq((2L, base + " extra"), (4L, base + " extra"), (6L, "other unrelated reference text entirely"))
      .toDF("doc_id", "text")
    val out = Dedup.crossCorpusCandidates(crawl, ref, "doc_id", "text").collect()
    // 1 pairs with both near-identical reference docs; orientation a=crawl
    val pairs = out.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 4L)))
    // 2 and 4 are identical WITHIN the reference side — must not pair
    assert(out.forall(r => Set(1L, 3L)(r.getAs[Long]("id_a"))))
    assert(!pairs.contains((2L, 4L)) && !pairs.contains((4L, 2L)))
    out.foreach(r => assert(r.getAs[Double]("est_jaccard") >= 0.0 &&
      r.getAs[Double]("est_jaccard") <= 1.0))
  }

  test("contamination pairs: distinct bench id column resolves; counts shared grams") {
    val d = Seq((1L, "q w e r t"), (2L, "a b c d e")).toDF("doc_id", "text")
    val bench = Seq((9L, "q w e r t")).toDF("bid", "text")
    val out = Decontaminate.contaminationPairs(d, "doc_id", "text",
      bench, "bid", "text", shingleWords = 3, minShared = 2).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("doc_id") == 1L &&
      out(0).getAs[Long]("bench_id") == 9L &&
      out(0).getAs[Long]("n_shared") == 3L)
  }

  test("cluster sample: per-cluster cap, under-cap kept whole, seeded re-draw") {
    val assigned = ((1L to 100L).map((_, 0L)) ++
      Seq((200L, 1L), (201L, 1L), (202L, 1L))).toDF("vec_id", "cluster")
    val rows = Similarity.clusterSample(assigned, "vec_id", perCluster = 10,
      seed = "s1").collect()
    val byCluster = rows.groupBy(_.getAs[Long]("cluster"))
    assert(byCluster(0L).length == 10)
    assert(byCluster(1L).map(_.getAs[Long]("vec_id")).toSet ==
      Set(200L, 201L, 202L), "an under-cap cluster keeps every member")
    assert(rows.forall(_.getAs[Long]("sample_rank") <= 10))
    // deterministic per seed; a different seed draws a different subset
    val again = Similarity.clusterSample(assigned, "vec_id", 10, "s1").collect()
    assert(rows.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
    val other = Similarity.clusterSample(assigned, "vec_id", 10, "s2").collect()
      .filter(_.getAs[Long]("cluster") == 0L).map(_.getAs[Long]("vec_id")).toSet
    assert(other != byCluster(0L).map(_.getAs[Long]("vec_id")).toSet,
      "seed s2 should re-draw the head cluster's sample")
  }

  test("cluster resolution: chains collapse to one component, keeper = min id") {
    // 1-2, 2-3, 3-4 form a chain (diameter 3); 10-11 is separate; 20 isolated (absent)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Dedup.resolveClusters(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == (1L, true) && out(2L) == (1L, false) &&
      out(3L) == (1L, false) && out(4L) == (1L, false))
    assert(out(10L) == (10L, true) && out(11L) == (10L, false))
    assert(!out.contains(20L))
  }

  test("brute-force knn: self excluded, ranks contiguous, cosine in [-1,1]") {
    val q = emb.where($"vec_id" % 100 === 0).select($"vec_id".as("qid"), $"embedding")
    val out = Similarity.bruteForceKnn(emb, q, "vec_id", "embedding", "qid", 5)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("qid") != r.getAs[Long]("vec_id"))
      val c = r.getAs[Double]("cos")
      assert(c >= -1.0001 && c <= 1.0001)
    }
    val perQ = rows.groupBy(_.getAs[Long]("qid"))
    perQ.values.foreach(g => assert(g.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 5L)))
  }

  test("ann recall: bucketed top-1 matches brute-force top-1 for most queries") {
    val q = emb.where($"vec_id" % 50 === 0).select($"vec_id".as("qid"), $"embedding")
    val bf = Similarity.bruteForceKnn(emb, q, "vec_id", "embedding", "qid", 1)
      .select("qid", "vec_id").as[(Long, Long)].collect().toMap
    val ann = Similarity.annKnn(emb, q, "vec_id", "embedding", "qid", 1, bits = 4)
      .select("qid", "vec_id").as[(Long, Long)].collect().toMap
    val hits = bf.keys.count(k => ann.get(k).contains(bf(k)))
    // single-probe LSH: recall < 1 by design but must beat random (1/500)
    assert(hits.toDouble / bf.size > 0.3, s"recall ${hits}/${bf.size} too low")
  }

  test("cosine of identical vectors is 1.0 (double fold)") {
    val one = Seq((1L, Array(0.6f, 0.8f)), (2L, Array(0.6f, 0.8f))).toDF("vec_id", "embedding")
    val c = one.select(VectorFunctions.cosine(col("embedding"), col("embedding")).as("c"))
      .head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("language id predicts via stopwords with deterministic tie-break") {
    val d = Seq(
      (1L, "the cat of the house is in the garden"),
      (2L, "el perro de la casa y el gato"),
      (3L, "zzz qqq www")).toDF("doc_id", "text")
    val out = TextAnalysis.languageId(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en" && out(2L) == "es" && out(3L) == "und")
  }

  test("quality score lands in [0,1] on the real corpus") {
    val q = TextAnalysis.qualityScores(docs, "doc_id", "text")
      .agg(min("quality"), max("quality")).head()
    assert(q.getDouble(0) >= 0.0 && q.getDouble(1) <= 1.0)
  }

  test("spanDupRate: flags exactly the trigrams duplicated across the corpus") {
    // doc 1 and 2 share their full text (all trigrams duplicated); doc 3 is
    // unique except it repeats one trigram internally (count > 1 globally)
    val d = Seq(
      (1L, "a b c d"), // trigrams: "a b c", "b c d"
      (2L, "a b c d"),
      (3L, "x y z x y z"), // "x y z", "y z x", "z x y", "x y z" — first/last dup
      (4L, "p q r s")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.spanDupRate(d, "doc_id", "text", n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 2L, 1.0)))
    assert(out(2L) == ((2L, 2L, 1.0)))
    assert(out(3L) == ((4L, 2L, 0.5)))
    assert(out(4L) == ((2L, 0L, 0.0)))
  }

  test("gopherRules: each rule gates independently; pass is their conjunction") {
    val longText = (Seq.fill(60)("the good dog ran fast and slow") :+ "end").mkString(" ")
    val d = Seq(
      (1L, longText), // passes everything
      (2L, "the of short text here"), // < 50 words
      (3L, ("xx " * 60) + "the of"), // mean word length < 3
      (4L, Seq.fill(60)("#### #### the of").mkString(" ")) // symbol-heavy
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("pass"))
    assert(!out(2L).getAs[Boolean]("pass_word_count") && !out(2L).getAs[Boolean]("pass"))
    assert(!out(3L).getAs[Boolean]("pass_mean_len") && !out(3L).getAs[Boolean]("pass"))
    assert(!out(4L).getAs[Boolean]("pass_symbols") && !out(4L).getAs[Boolean]("pass"))
    // the signal columns are exact ratios
    assert(out(1L).getAs[Double]("alpha_frac") == 1.0)
    assert(out(1L).getAs[Long]("stopword_kinds") >= 2L)
  }

  test("oovRate: tokens outside the corpus top-k vocabulary are flagged") {
    // vocab size 2 → the two most frequent tokens ("a", "b") are in-vocab
    val d = Seq(
      (1L, "a a b b"), // all in-vocab
      (2L, "a b rare"), // 1/3 oov
      (3L, "rare other odd") // all oov... but "rare" appears twice globally
    ).toDF("doc_id", "text")
    val out = TextAnalysis.oovRate(d, "doc_id", "text", vocabSize = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((4L, 0L)))
    assert(out(2L) == ((3L, 1L)))
    assert(out(3L) == ((3L, 3L)))
  }

  test("multimodal feature extraction is deterministic and complete") {
    val media = Multimodal.mediaFromDocuments(docs, "doc_id", "text")
    val f1 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == docs.count())
    f1.foreach { r =>
      assert(r.getAs[Long]("n_bytes") > 0)
      val kind = r.getAs[String]("kind")
      if (kind == "image") assert(r.getAs[Int]("width") >= 1 && r.getAs[Double]("duration_s") == 0.0)
      if (kind == "audio") assert(r.getAs[Double]("duration_s") >= 0.0)
    }
  }

  test("extractFeatures: declarative and batched formulations agree bit-for-bit") {
    val media = Multimodal.mediaFromDocuments(docs, "doc_id", "text")
    val a = Multimodal.extractFeatures(media).orderBy("media_id").collect().toSeq
    val b = Multimodal.extractFeaturesBatched(media).orderBy("media_id").collect().toSeq
    assert(a == b)
  }

  test("simhash pairs: heavy half-key buckets are capped; clusters survive via reps") {
    val d = ((1L to 12L).map(i => (i, "same exact boilerplate text repeated verbatim")) :+
      (100L, "something completely different entirely here")).toDF("doc_id", "text")
    // 12 identical sketches = one 12-row half-key bucket on both halves:
    // dropped at cap 10, fully paired at cap 100.
    val capped = Dedup.simHashPairs(d, "doc_id", "text", maxHamming = 3, maxBucketSize = 10)
    assert(capped.count() == 0)
    val uncapped = Dedup.simHashPairs(d, "doc_id", "text", maxHamming = 3, maxBucketSize = 100)
    assert(uncapped.where($"id_a" <= 12 && $"id_b" <= 12).count() == 12 * 11 / 2)
    // The cluster path collapses identical sketches to ONE representative
    // row first, so even a tiny rep-level cap keeps the duplicate group.
    val clusters = Dedup.simHashClusters(d, "doc_id", "text", maxHamming = 3, maxBucketSize = 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster")).toMap
    (1L to 12L).foreach(i => assert(clusters(i) == 1L))
  }

  test("simhash60 4-band pairs: EXACT recall at hamming ≤ 3 vs brute force") {
    val d = docs.limit(300)
    val sk = Dedup.simHashed60(d, "doc_id", "text")
    val a = sk.select($"doc_id".as("id_a"), $"simhash".as("sh_a"))
    val b = sk.select($"doc_id".as("id_b"), $"simhash".as("sh_b"))
    val brute = a.crossJoin(b).where($"id_a" < $"id_b")
      .where(TextFunctions.hammingDistance($"sh_a", $"sh_b") <= 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val banded = Dedup.simHash60Pairs(d, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // pigeonhole: ≤3 flipped bits cannot touch all four 15-bit bands
    assert(banded == brute, s"banded=${banded.size} brute=${brute.size}")
  }

  test("cosine near-dup: multiprobe recovers sign-boundary pairs") {
    val vs = Seq(
      (1L, Array(0.01f, 1f, 1f, 1f, 1f, 1f, 1f, 1f)),
      (2L, Array(-0.01f, 1f, 1f, 1f, 1f, 1f, 1f, 1f)),
      (3L, Array(-1f, -1f, -1f, -1f, -1f, -1f, -1f, -1f))).toDF("vec_id", "embedding")
    // vectors 1 and 2 are near-identical (cos ≈ 0.9999) but one sign flip
    // apart in bucket space: lost without multiprobe, found with it.
    val single = Similarity.cosineNearDupPairs(vs, "vec_id", "embedding",
      threshold = 0.9, bits = 6, multiprobe = false).collect()
    assert(!single.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    val multi = Similarity.cosineNearDupPairs(vs, "vec_id", "embedding",
      threshold = 0.9, bits = 6).collect()
    assert(multi.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("cosine near-dup recall: single-probe ⊆ multiprobe ⊆ brute force") {
    val a = emb.select($"vec_id".as("id_a"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("id_b"), $"embedding".as("vb"))
    val brute = a.crossJoin(b).where($"id_a" < $"id_b")
      .select($"id_a", $"id_b", VectorFunctions.cosine($"va", $"vb").as("cos"))
      .where($"cos" >= 0.2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val single = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.2, bits = 6, multiprobe = false)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val multi = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.2, bits = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "fixture must produce at least one near-dup pair")
    assert(single.subsetOf(multi), "multiprobe must not lose single-probe pairs")
    assert(multi.subsetOf(brute), "bucketed pairs must be true near-dups")
  }

  test("kMeans: converges toward true centers, empty clusters keep init, deterministic") {
    // two tight groups around (1,1,1,1) and (-1,-1,-1,-1); k=2 init = the
    // two lowest-id vectors (one from each group)
    val vs = Seq(
      (1L, Array(1f, 1f, 1f, 1f)), (2L, Array(-1f, -1f, -1f, -1f)),
      (3L, Array(0.9f, 1f, 1f, 1.1f)), (4L, Array(1.1f, 1f, 1f, 0.9f)),
      (5L, Array(-0.9f, -1f, -1f, -1.1f)), (6L, Array(-1.1f, -1f, -1f, -0.9f))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.kMeans(vs, "vec_id", "embedding", "cid", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(cents.keySet == Set(0L, 1L))
    // cluster 0 ≈ mean of the + group, cluster 1 ≈ mean of the − group
    assert(cents(0L).forall(_ > 0.9f) && cents(1L).forall(_ < -0.9f))
    assert(math.abs(cents(0L).head - 1.0f) < 0.05f)
    // deterministic across runs
    val again = Similarity.kMeans(vs, "vec_id", "embedding", "cid", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(cents == again)
    // iters = 0 returns the init verbatim
    val init = Similarity.kMeans(vs, "vec_id", "embedding", "cid", k = 2, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(init(0L) == Seq(1f, 1f, 1f, 1f) && init(1L) == Seq(-1f, -1f, -1f, -1f))
    // a k larger than any nonempty cluster count: clusters that attract
    // no members keep their init centroid (here duplicate init vectors
    // lose every cosine tie to the lower cid)
    val k4 = Similarity.kMeans(vs.limit(2), "vec_id", "embedding", "cid", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(k4.keySet == Set(0L, 1L))
  }

  test("ivf multi-probe: recall rises with nprobe; probing all clusters = brute force") {
    val cents = emb.where($"vec_id" < 8).select($"vec_id".as("cid"), $"embedding")
    val qs = emb.where($"vec_id" % 100 === 0).select($"vec_id".as("qid"), $"embedding")
    val brute = Similarity.bruteForceKnn(emb, qs, "vec_id", "embedding", "qid", k = 3)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    def ivf(nprobe: Int) = Similarity.ivfKnn(emb, qs, cents,
      "vec_id", "embedding", "qid", "cid", k = 3, nprobe = nprobe)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val r1 = ivf(1).intersect(brute).size
    val r2 = ivf(2).intersect(brute).size
    assert(r2 >= r1, s"recall must not drop with more probes: $r1 -> $r2")
    // probing every cluster covers the whole corpus — exactly brute force
    assert(ivf(8) == brute, "nprobe = #clusters must equal brute force")
  }

  test("centroidUpdate: sliced two-phase fold is exact, deterministic, bounded") {
    // 400 members all in ONE cluster — the skew shape that would OOM a
    // single per-(cluster, dim) collect_list of the whole membership.
    // Integer-valued components keep every double fold exact, so the
    // sliced sum can be asserted against the closed form.
    val n = 400
    val vs = (1L to n).map(i => (i, Array(i.toFloat, (2 * i).toFloat)))
      .toDF("vec_id", "embedding").withColumn("cluster", lit(0L))
    def run() = Similarity.centroidUpdate(vs, "vec_id", "embedding", numSlices = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    val out = run()
    assert(out((0L, 0L)) == (n * (n + 1) / 2.0, n.toLong))
    assert(out((0L, 1L)) == (n * (n + 1).toDouble, n.toLong))
    assert(run() == out, "sliced fold must be deterministic across runs")
    // the fold is hash-sliced: no phase-1 group holds the whole cluster
    val width = ((1L << 60) + 7) / 8
    val sliceMax = vs
      .select(TextFunctions.hash60(
        concat(lit("cslice:"), $"vec_id".cast("string"))).as("k"))
      .select(expr(s"k div ${width}L").as("slice"))
      .groupBy("slice").count().agg(max("count")).as[Long].head()
    assert(sliceMax < n / 4, s"slices must bound group size, max=$sliceMax")
    // and the plan actually groups by the slice key
    val analyzed = Similarity.centroidUpdate(vs, "vec_id", "embedding")
      .queryExecution.analyzed.toString
    assert(analyzed.contains("__slice"), "phase-1 aggregation must be sliced")
  }

  test("kMeans seeded init: reproducible per seed, re-drawn across seeds") {
    def init(seed: Option[String]) = Similarity.kMeans(emb, "vec_id", "embedding",
      "cid", k = 8, iters = 0, initSeed = seed)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val a = init(Some("a"))
    assert(init(Some("a")) == a, "same seed must reproduce the same init")
    assert(init(Some("b")) != a, "a different seed must draw differently")
    assert(init(None) != a, "the seeded draw must differ from the lowest-id init")
    // the downstream loop is unchanged: training from a seeded init is
    // deterministic too
    val t = Similarity.kMeans(emb, "vec_id", "embedding", "cid",
      k = 8, iters = 1, initSeed = Some("a")).collect().map(_.toString).sorted
    val t2 = Similarity.kMeans(emb, "vec_id", "embedding", "cid",
      k = 8, iters = 1, initSeed = Some("a")).collect().map(_.toString).sorted
    assert(t.sameElements(t2))
  }

  test("ivfAssign degenerate inputs: empty centroids assign nothing; null vec -> lowest cid") {
    val vs = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val noCents = Seq.empty[(Long, Array[Float])].toDF("cid", "embedding")
    assert(Similarity.ivfAssign(vs, noCents, "vec_id", "embedding", "cid").count() == 0,
      "an empty centroid set must assign nothing, not emit NULL clusters")
    // a null embedding has no defined nearest centroid — it falls back to
    // the lowest cid (the desc_nulls_last tie-break), never a NULL cluster
    val withNull = vs.unionByName(
      Seq(3L).toDF("vec_id").withColumn("embedding",
        lit(null).cast("array<float>")))
    val cents = Seq((7L, Array(1f, 0f)), (9L, Array(0f, 1f))).toDF("cid", "embedding")
    val out = Similarity.ivfAssign(withNull, cents, "vec_id", "embedding", "cid")
      .select($"vec_id", $"cluster").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 7L, 2L -> 9L, 3L -> 7L))
  }

  test("kMeans: fails loudly when the corpus has fewer than k rows") {
    val vs = Seq((1L, Array(1f, 1f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.kMeans(vs, "vec_id", "embedding", "cid", k = 3, iters = 0)
    }
    assert(e.getMessage.contains("only 1 rows"))
  }

  test("semDedup: drops higher-id near-dups; over-cap clusters prune via LSH fallback") {
    // Two well-separated clusters around (1,1,...) and (-1,-1,...).
    // 1≈2 near-identical (same cluster → 2 dropped); 4≈5 near-identical
    // but land in the other cluster (→ 5 dropped); 3 unique (kept);
    // 6≈7 near-identical but ONE SIGN FLIP apart in bucket space (the
    // multiprobe case for the heavy-cluster fallback → 7 dropped).
    val vs = Seq(
      (1L, Array(1f, 1f, 1f, 1f)),
      (2L, Array(1f, 1f, 1f, 0.99f)),
      (3L, Array(1f, -0.2f, 1f, 1f)),
      (4L, Array(-1f, -1f, -1f, -1f)),
      (5L, Array(-1f, -1f, -0.99f, -1f)),
      (6L, Array(0.01f, 1f, 1f, 1f)),
      (7L, Array(-0.01f, 1f, 1f, 1f))).toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(1f, 1f, 1f, 1f)), (1L, Array(-1f, -1f, -1f, -1f)))
      .toDF("cid", "embedding")
    def run(cap: Int = 10000, bucketCap: Int = 1000) =
      Similarity.semDedup(vs, cents, "vec_id", "embedding", "cid",
        threshold = 0.999, maxClusterSize = cap,
        heavyMaxBucketSize = bucketCap)
        .select("vec_id").as[Long].collect().toSet
    val exact = run()
    assert(exact == Set(1L, 3L, 4L, 6L))
    // over-cap cluster 0 (5 members > cap 2) is NOT exempt: the LSH
    // fallback still drops 2 (same bucket as 1) AND 7 (one flip from 6,
    // recovered by multiprobe) — same answer as the all-pairs path here
    val viaLsh = run(cap = 2)
    assert(viaLsh == exact,
      s"heavy-cluster LSH fallback must still prune near-dups: $viaLsh")
    // the residual quadratic guard: over-cap BUCKETS inside a heavy
    // cluster are exempt from pair generation
    val guarded = run(cap = 2, bucketCap = 1)
    assert(guarded == Set(1L, 2L, 3L, 4L, 6L, 7L),
      s"over-cap buckets must be kept whole: $guarded")
  }

  test("media exact dedup: byte-identical payloads collapse, keeper = min id") {
    val m = Seq(
      (1L, Array[Byte](1, 2, 3)), (2L, Array[Byte](1, 2, 3)),
      (3L, Array[Byte](1, 2, 4)), (4L, Array[Byte]())) // empty payload groups alone
      .toDF("media_id", "payload")
    val out = Multimodal.exactDedup(m).collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("media exact dedup excludes NULL payloads instead of grouping them") {
    // md5(hex(NULL)) is NULL and groupBy treats NULLs as equal: without
    // the filter, distinct unfetched media would collapse into one group
    val m = Seq((1L, Array[Byte](9)), (2L, null), (3L, null))
      .toDF("media_id", "payload")
    val out = Multimodal.exactDedup(m).collect()
    assert(out.length == 1 && out.head.getAs[Long]("keep_id") == 1L
      && out.head.getAs[Long]("n_copies") == 1L)
  }

  test("resize fits dimensions in the target box, preserving aspect") {
    val media = Multimodal.mediaFromDocuments(docs, "doc_id", "text")
    val resized = Multimodal.resizeTo(Multimodal.extractFeatures(media), 640, 480).collect()
    resized.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (rw, rh) = (r.getAs[Int]("resized_w"), r.getAs[Int]("resized_h"))
      assert(rw <= 640 && rh <= 480 && rw >= 1 && rh >= 1)
      if (w <= 640 && h <= 480) assert(rw == w && rh == h) // no upscale
    }
  }

  test("frame sampling emits stride-aligned offsets within payload") {
    val media = Multimodal.mediaFromDocuments(docs.limit(10), "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, 64).collect()
    frames.foreach(r => assert(r.getAs[Long]("frame_offset") % 64 == 0))
    assert(frames.nonEmpty)
  }

  test("frameFeatures: window checksums; single-window payload equals whole-payload checksum") {
    import spark.implicits._
    val media = Seq((1L, "abcdefgh".getBytes("UTF-8")), (2L, Array.emptyByteArray))
      .toDF("media_id", "payload")
    val out = Multimodal.frameFeatures(media, stride = 5).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("frame_offset"),
        r.getAs[Long]("frame_bytes"), r.getAs[Long]("frame_checksum")))
    // 8 bytes at stride 5 → windows [0,5) and [5,8); empty payload → none
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((1L, 0L, 5L), (1L, 5L, 3L)))
    // a payload within one stride folds identically to extractFeatures'
    // whole-payload checksum
    val whole = graft.expressions.ByteFoldChecksumExpr(null).compute("abcde".getBytes("UTF-8"))
    assert(out.head._4 == whole)
  }

  test("frame sampling emits nothing for an empty payload") {
    import spark.implicits._
    val media = Seq((1L, Array.emptyByteArray), (2L, "abc".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val frames = Multimodal.sampleFrames(media, 64).collect()
    assert(frames.map(_.getLong(0)).toSeq == Seq(2L),
      "zero-byte payload must produce no frame offsets")
  }

  test("chunkTokens: stride overlap, final short chunk, exact chunk ids") {
    val d = Seq((1L, "t1 t2 t3 t4 t5")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(d, "doc_id", "text", chunkSize = 3, stride = 2)
      .orderBy("chunk_id").collect()
      .map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("n_chunk_tokens"),
        r.getAs[String]("chunk_text")))
    assert(out.toSeq == Seq(
      (0L, 3L, "t1 t2 t3"),   // [0, 3)
      (1L, 3L, "t3 t4 t5"),   // [2, 5) — overlaps by chunkSize - stride = 1
      (2L, 1L, "t5")))        // [4, 5) — final short chunk, token 5 covered
  }

  test("chunkTokens: disjoint when stride == chunkSize; every token covered once") {
    val d = Seq((1L, (1 to 10).map("w" + _).mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(d, "doc_id", "text", chunkSize = 4, stride = 4)
      .collect()
    assert(out.map(_.getAs[Long]("n_chunk_tokens")).sum == 10L)
    assert(out.length == 3) // 4 + 4 + 2
  }

  test("piiRedact masks email before the phone pattern can split it") {
    val d = Seq(
      (1L, "mail me9123456789@ex.com or call +1 (415) 555-0199 via https://x.io/a?q=12345"),
      (2L, "clean text, no identifiers here"),
      (3L, "already says <EMAIL> literally")).toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(d, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("redacted"), r.getAs[Boolean]("was_redacted"))).toMap
    assert(out(1L)._1 == "mail <EMAIL> or call <PHONE> via <URL>")
    assert(out(1L)._2)
    assert(out(2L) == ("clean text, no identifiers here", false))
    // a literal tag in the source is NOT a rewrite
    assert(out(3L) == ("already says <EMAIL> literally", false))
  }

  test("lengthOutliers: deviation beyond k MADs flags; per-domain centers") {
    // domain a: lengths 10,10,10,10,100 → med 10, absdevs 0,0,0,0,90 → mad 0
    //   ⇒ any deviation > 0 flags (100 flags; the 10s don't: 0 > 0 false)
    // domain b: lengths 1..5 → med 3, absdevs 2,1,0,1,2 → mad 1 ⇒ none > 4
    def doc(n: Int) = (1 to n).map(_ => "w").mkString(" ")
    val d = (Seq.fill(4)(10) :+ 100).zipWithIndex.map { case (n, i) => (i.toLong, doc(n), "a") } ++
      (1 to 5).map(n => (10L + n, doc(n), "b"))
    val out = Curation.lengthOutliers(d.toDF("doc_id", "text", "source"),
      "doc_id", "text", "source", k = 4.0).collect()
    val flagged = out.filter(_.getAs[Boolean]("is_outlier")).map(_.getAs[Long]("doc_id"))
    assert(flagged.toSeq == Seq(4L), s"only the 100-token doc flags: ${flagged.toSeq}")
    val b = out.filter(_.getAs[String]("source") == "b")
    assert(b.forall(r => r.getAs[Double]("med") == 3.0 && r.getAs[Double]("mad") == 1.0))
  }

  test("lengthOutliers: NULL-domain rows form their own group, never vanish") {
    val d = Seq((1L, "a b c", null: String), (2L, "a b c d e", null: String),
      (3L, "x", "s")).toDF("doc_id", "text", "source")
    val out = Curation.lengthOutliers(d, "doc_id", "text", "source").collect()
    assert(out.length == 3, "null-domain rows must not be dropped by the center joins")
    val nulls = out.filter(_.isNullAt(1))
    // null group: lengths 3,5 → med 4.0, absdevs 1.0 → mad 1.0, none flag
    assert(nulls.length == 2)
    assert(nulls.forall(r => r.getAs[Double]("med") == 4.0 &&
      r.getAs[Double]("mad") == 1.0 && !r.getAs[Boolean]("is_outlier")))
  }

  test("chunkTokens rejects stride > chunkSize (would skip tokens)") {
    val d = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkTokens(d, "doc_id", "text", chunkSize = 4, stride = 8)
    }
  }

  test("centroidOutliers: below-threshold cosine flags; assignment matches ivfAssign") {
    val cents = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding"))
    val out = Similarity.centroidOutliers(emb, cents, "vec_id", "embedding", "cid",
      minCos = 0.5)
    val rows = out.collect()
    assert(rows.length == emb.count())
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_outlier") == (r.getAs[Double]("centroid_cos") < 0.5))
    }
    // the cluster column must agree with the plain assignment
    val assign = Similarity.ivfAssign(emb, cents, "vec_id", "embedding", "cid")
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(assign(r.getAs[Long]("vec_id")) == r.getAs[Long]("cluster")))
  }

  test("knnGraph: per-src cap, directed twin edges, WindowGroupLimit plan") {
    val g = Similarity.knnGraph(emb, "vec_id", "embedding", k = 3, bits = 6)
    val edges = g.collect()
    val bySrc = edges.groupBy(_.getAs[Long]("src"))
    assert(bySrc.values.forall(_.length <= 3))
    bySrc.values.foreach { es =>
      val sorted = es.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length).toSeq)
      // rank order follows (cos desc, dst asc)
      val pairs = sorted.map(r => (r.getAs[Double]("cos"), r.getAs[Long]("dst")))
      assert(pairs.sliding(2).forall {
        case Array((c1, d1), (c2, d2)) => c1 > c2 || (c1 == c2 && d1 < d2)
        case _ => true
      })
    }
    // every candidate pair fed both directions: an edge's reverse exists
    // as a CANDIDATE, so if dst has spare capacity (< k edges) the
    // reverse edge must be present.
    val edgeSet = edges.map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
    edges.foreach { r =>
      val (s0, d0) = (r.getAs[Long]("src"), r.getAs[Long]("dst"))
      if (bySrc(d0).length < 3) assert(edgeSet.contains((d0, s0)),
        s"$d0 has spare capacity but is missing reverse edge to $s0")
    }
    // top-k must plan as WindowGroupLimit (partial heaps before exchange)
    val plan = g.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("silhouette: exact toy geometry, boundary point scores 0, range [0,1]") {
    val cents = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f))).toDF("cid", "embedding")
    val pts = Seq(
      (10L, Array(1f, 0f)),    // on centroid 0: a=0, b=1 → s=1
      (11L, Array(0.7f, 0.7f)) // equidistant: a=b → s=0, tie-break cluster 0
    ).toDF("vec_id", "embedding")
    val out = Similarity.silhouette(pts, cents, "vec_id", "embedding", "cid")
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(out(10L).getAs[Long]("cluster") == 0L)
    assert(out(10L).getAs[Double]("a_dist") == 0.0)
    assert(out(10L).getAs[Double]("b_dist") == 1.0)
    assert(out(10L).getAs[Double]("silhouette") == 1.0)
    assert(out(11L).getAs[Long]("cluster") == 0L) // tie → smaller cid
    assert(out(11L).getAs[Double]("silhouette") == 0.0)

    // real data: every point emitted once, a ≤ b, s ∈ [0, 1]
    val real = Similarity.silhouette(emb,
      emb.where(col("vec_id") < 8).select(col("vec_id").as("cid"), col("embedding")),
      "vec_id", "embedding", "cid").collect()
    assert(real.length == emb.count())
    real.foreach { r =>
      val (a, b, s0) = (r.getAs[Double]("a_dist"), r.getAs[Double]("b_dist"),
        r.getAs[Double]("silhouette"))
      assert(a <= b && s0 >= 0.0 && s0 <= 1.0)
    }
  }

  test("residuals + ivfPqResidualKnn: assignment agrees with ivfAssign, codebook self-codes, probed-cluster containment") {
    val cents = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding"))
    val res = Similarity.residuals(emb, cents, "vec_id", "embedding", "cid")
    // the window-based assignment must agree with ivfAssign's argmax
    val viaAssign = Similarity.ivfAssign(emb, cents, "vec_id", "embedding", "cid")
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val resRows = res.collect()
    resRows.foreach { r =>
      assert(viaAssign(r.getAs[Long]("vec_id")) == r.getAs[Long]("cluster"))
    }
    // residual + centroid reconstructs the vector (float-in-double: tight)
    val cvs = cents.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val origs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    resRows.take(50).foreach { r =>
      val v = origs(r.getAs[Long]("vec_id")); val c = cvs(r.getAs[Long]("cluster"))
      r.getSeq[Double](2).zipWithIndex.foreach { case (d, i) =>
        assert(math.abs(d + c(i).toDouble - v(i).toDouble) < 1e-9)
      }
    }
    // codebook entries code LOSSLESSLY to themselves: the chosen code's
    // subvector equals the entry's own (== self up to distance-0 ties —
    // the 8 centroid rows all have zero residuals and tie to code 0)
    val cbres = res.where(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("residual"))
    val selfCodes = Similarity.pqCodes(cbres.select(col("cid").as("vec_id"),
      col("residual")), cbres, "vec_id", "residual", "cid", m = 4).collect()
    val cbVecs = cbres.collect().sortBy(_.getLong(0)).map(_.getSeq[Double](1))
    val ownVec = cbres.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val sub = cbVecs.head.length / 4
    selfCodes.foreach { r =>
      val mine = ownVec(r.getAs[Long]("vec_id"))
      (0 until 4).foreach { i =>
        val chosen = cbVecs(r.getAs[Long](s"code$i").toInt)
        assert(chosen.slice(i * sub, (i + 1) * sub) ==
          mine.slice(i * sub, (i + 1) * sub),
          s"codebook entry ${r.getAs[Long]("vec_id")} subspace $i not lossless")
      }
    }
    // search results come only from the query's 2 probed clusters
    val indexed = Similarity.pqCodes(res, cbres, "vec_id", "residual", "cid",
      m = 4, extraCols = Seq("cluster")).select("vec_id", "cluster", "pq_code")
    val qs = emb.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val got = Similarity.ivfPqResidualKnn(indexed, qs, cents, cbres,
      "vec_id", "embedding", "qid", "cid", "residual", m = 4, k = 5, nprobe = 2)
      .collect()
    val probed = Similarity.ivfAssignTop(qs, cents, "qid", "embedding", "cid", 2)
      .select("qid", "cluster").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val clusterOf = resRows.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    got.foreach { r =>
      assert(probed(r.getAs[Long]("qid")).contains(clusterOf(r.getAs[Long]("vec_id"))))
      assert(r.getAs[Long]("rank") <= 5 && r.getAs[Double]("adc_dist") >= 0.0)
    }
    assert(got.nonEmpty)
  }

  test("daviesBouldin: scatter = mean member distance, worst-neighbor component, membership partition") {
    val cents = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding"))
    val out = Similarity.daviesBouldin(emb, cents, "vec_id", "embedding", "cid")
      .collect().map(r => r.getAs[Long]("cluster") -> r).toMap
    // driver model: per-point distances from the same silhouette op
    // (identical cosine expression), grouped by assigned cluster
    val pts = Similarity.silhouette(emb, cents, "vec_id", "embedding", "cid")
      .collect().map(r => (r.getAs[Long]("cluster"), r.getAs[Double]("a_dist")))
    val byCluster = pts.groupBy(_._1)
    // memberships partition the corpus
    assert(out.values.map(_.getAs[Long]("n_members")).sum == emb.count())
    assert(out.keySet == byCluster.keySet)
    byCluster.foreach { case (k, ds) =>
      assert(out(k).getAs[Long]("n_members") == ds.length)
      // mean within double tolerance of the model (summation order differs)
      val mean = ds.map(_._2).sum / ds.length
      assert(math.abs(out(k).getAs[Double]("scatter") - mean) < 1e-12)
    }
    // DB component: recompute from the emitted scatters + centroid dists
    val cvs = cents.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      if (na * nb == 0) 0.0 else dot / (na * nb)
    }
    out.foreach { case (i, ri) =>
      val best = out.keys.filter(_ != i).map { j =>
        val r = (ri.getAs[Double]("scatter") + out(j).getAs[Double]("scatter")) /
          (1.0 - cos(cvs(i), cvs(j)))
        (j, r)
      }.toSeq.sortBy { case (j, r) => (-r, j) }.head
      assert(ri.getAs[Long]("db_peer") == best._1)
      assert(math.abs(ri.getAs[Double]("db_component") - best._2) < 1e-9)
    }
  }

  test("fellegiSunter: hand-computed m/u ratios, smoothing bounds, field-order product") {
    // n=5, nd=2; agree_f: mc=2, uc=3 → m=(2+1)/(2+2)=0.75, u=(3+1)/(5+2)=4/7
    val pairs = Seq(
      (1L, 2L, true, true, true), (3L, 4L, true, true, false),
      (5L, 6L, false, false, true), (7L, 8L, false, true, false),
      (9L, 10L, false, false, true)
    ).toDF("id_a", "id_b", "is_dup", "agree_f", "agree_g")
    val one = Dedup.fellegiSunter(pairs, Seq("agree_f")).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Double]("score"))).toMap
    val m = 3.0 / 4.0; val u = 4.0 / 7.0
    assert(one(1L) == m / u && one(3L) == m / u && one(7L) == m / u)
    assert(one(5L) == (1.0 - m) / (1.0 - u) && one(9L) == (1.0 - m) / (1.0 - u))
    // agreement on the match-predictive field raises the score
    assert(m / u > 1.0 && (1.0 - m) / (1.0 - u) < 1.0)

    // two fields: score is the left-associated product of the
    // single-field ratios (same smoothed m/u — the stats pass is global)
    // agree_g: mc=1 (only pair 1 is dup∧g), uc=3 → mg=(1+1)/4, ug=(3+1)/7
    val mg = (1 + 1.0) / (2 + 2.0); val ug = (3 + 1.0) / (5 + 2.0)
    val two = Dedup.fellegiSunter(pairs, Seq("agree_f", "agree_g")).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Double]("score"))).toMap
    assert(two(1L) == (m / u) * (mg / ug))
    assert(two(3L) == (m / u) * ((1.0 - mg) / (1.0 - ug)))
    assert(two(5L) == ((1.0 - m) / (1.0 - u)) * (mg / ug))
    // smoothing keeps every ratio finite even for all-true/all-false fields
    val deg = Seq((1L, 2L, true, true), (3L, 4L, false, true))
      .toDF("id_a", "id_b", "is_dup", "agree_all")
    Dedup.fellegiSunter(deg, Seq("agree_all")).collect().foreach { r =>
      val sc = r.getAs[Double]("score")
      assert(!sc.isNaN && !sc.isInfinite && sc > 0.0)
    }
  }

  test("bandingPlan: S-curve values exact, monotone in s, band-count ordering") {
    val binned = Seq((2L, 100L), (5L, 40L), (9L, 7L)).toDF("bin", "n_pairs")
    val plan = Dedup.bandingPlan(binned, k = 16).collect()
      .map(r => (r.getAs[Long]("bands"), r.getAs[Long]("rows_per_band"),
        r.getAs[Long]("bin"), r.getAs[Long]("n_pairs"),
        r.getAs[Double]("p_detect"), r.getAs[Double]("exp_caught")))
    // every divisor split of 16 × every bin
    assert(plan.map(p => (p._1, p._2)).toSet ==
      Set((1L, 16L), (2L, 8L), (4L, 4L), (8L, 2L), (16L, 1L)))
    assert(plan.length == 5 * 3)
    // exact value check with the same left-associated multiplication
    def powInt(x: Double, n: Int) = (1 until n).foldLeft(x)((a, _) => a * x)
    plan.foreach { case (b, r, bin, n, p, e) =>
      val s0 = (2 * bin + 1).toDouble / 20.0
      val expP = 1.0 - powInt(1.0 - powInt(s0, r.toInt), b.toInt)
      assert(p == expP && e == n.toDouble * expP)
    }
    // monotone in similarity for a fixed split
    plan.groupBy(p => (p._1, p._2)).values.foreach { rows =>
      val bySim = rows.sortBy(_._3).map(_._5)
      assert(bySim.sliding(2).forall { case Array(x, y) => x <= y; case _ => true })
    }
    // more, narrower bands catch at least as much at every s (r divides):
    // (16,1) dominates (1,16) pointwise
    val wide = plan.filter(p => p._1 == 16L).sortBy(_._3).map(_._5)
    val tall = plan.filter(p => p._1 == 1L).sortBy(_._3).map(_._5)
    wide.zip(tall).foreach { case (w, t) => assert(w >= t) }
  }

  test("graphSearch: exact driver-model equivalence, rank contract, hops=0 entries-only") {
    val g = Similarity.knnGraph(emb, "vec_id", "embedding", k = 3, bits = 6)
    val qs = emb.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val got = Similarity.graphSearch(emb, qs, g, "vec_id", "embedding", "qid",
      entries = 4, beam = 8, hops = 3, k = 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cos"), r.getAs[Long]("rank")))

    // Driver model built from the SAME cosine expression (no float drift):
    // score every (query, corpus) pair once, then replay the beam walk.
    val scores = Similarity.bruteForceKnn(emb, qs, "vec_id", "embedding",
      "qid", k = emb.count().toInt).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")) -> r.getAs[Double]("cos"))
      .toMap
    val adj = g.collect().groupBy(_.getAs[Long]("src"))
      .map { case (s0, es) => s0 -> es.map(_.getAs[Long]("dst")).toSet }
    val entryIds = emb.select("vec_id").collect().map(_.getLong(0)).sorted.take(4).toSet
    def topN(qid: Long, cand: Set[Long], n: Int): Seq[Long] =
      cand.filter(_ != qid).toSeq
        .sortBy(id => (-scores((qid, id)), id)).take(n)
    val expect = qs.select("qid").collect().map(_.getLong(0)).flatMap { qid =>
      var beam = topN(qid, entryIds, 8).toSet
      for (_ <- 0 until 3)
        beam = topN(qid, beam ++ beam.flatMap(adj.getOrElse(_, Set.empty)), 8).toSet
      topN(qid, beam, 5).zipWithIndex.map { case (id, i) =>
        (qid, id, scores((qid, id)), (i + 1).toLong)
      }
    }
    assert(got.sorted.toSeq == expect.sorted.toSeq)
    // rank contract: dense 1..n per query, ordered (cos desc, id)
    got.groupBy(_._1).values.foreach { rs =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.sliding(2).forall {
        case Array((_, i1, c1, _), (_, i2, c2, _)) => c1 > c2 || (c1 == c2 && i1 < i2)
        case _ => true
      })
    }
    // hops = 0 degenerates to top-k of the scored entry set
    val h0 = Similarity.graphSearch(emb, qs, g, "vec_id", "embedding", "qid",
      entries = 4, beam = 8, hops = 0, k = 5).collect()
    h0.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rs) =>
      assert(rs.map(_.getAs[Long]("vec_id")).toSet ==
        topN(qid, entryIds, 8).take(5).toSet)
    }
  }

  test("mutualKnn keeps exactly the edges whose reverse survived top-k") {
    val g = Similarity.knnGraph(emb, "vec_id", "embedding", k = 3, bits = 6)
    val edges = g.collect().map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
    val mutual = Similarity.mutualKnn(g).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
    assert(mutual.nonEmpty && mutual.subsetOf(edges))
    assert(mutual == edges.filter { case (s0, d0) => edges.contains((d0, s0)) })
    // the mutual backbone is symmetric by construction
    assert(mutual.forall { case (s0, d0) => mutual.contains((d0, s0)) })
  }

  test("knnDensity: mean of top-k cosines per node, threshold flags, isolated absent") {
    val g = Similarity.knnGraph(emb, "vec_id", "embedding", k = 3, bits = 6)
    val d = Similarity.knnDensity(g, threshold = 0.35).collect()
      .map(r => r.getAs[Long]("src") ->
        (r.getAs[Long]("n_edges"), r.getAs[Double]("density"), r.getAs[Boolean]("prune")))
      .toMap
    val byNode = g.collect().groupBy(_.getAs[Long]("src"))
    assert(d.keySet == byNode.keySet) // exactly the nodes with edges
    byNode.foreach { case (s0, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos"))
      val mean = sorted.foldLeft(0.0)(_ + _) / rows.length
      val (n, dens, prune) = d(s0)
      assert(n == rows.length && dens == mean && prune == (mean >= 0.35))
    }
  }

  test("randomProject: deterministic, distance-preserving on average, null on bad width") {
    import spark.implicits._
    val p = Similarity.randomProject(emb, "embedding", "proj", 64, 16, "rp")
      .select("vec_id", "proj")
    val rows = p.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rows.values.forall(_.length == 16))
    // determinism: exact same values on rerun
    val again = Similarity.randomProject(emb, "embedding", "proj", 64, 16, "rp")
      .select("vec_id", "proj").collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(again == rows)
    // JL sanity: mean squared norm is preserved in expectation — check the
    // aggregate ratio lands in a loose band rather than per-pair bounds.
    val orig = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val ratios = rows.toSeq.map { case (id, pv) =>
      val on = orig(id).map(x => x * x).sum
      val pn = pv.map(x => x * x).sum
      pn / on
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.5 && mean < 2.0, s"mean norm ratio $mean out of band")
    // a wrong-width vector surfaces as null components, not silent truncation
    val bad = Seq((99L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val badP = Similarity.randomProject(bad, "embedding", "proj", 64, 16, "rp")
      .select(org.apache.spark.sql.functions.col("proj")).collect().head.getSeq[Any](0)
    assert(badP.forall(_ == null))
  }

  test("labelPropagate: clamped seeds, majority with min-label ties, round tags, frontier growth") {
    import spark.implicits._
    // Path 1-2-3-4 plus node 5 adjacent to both seeds 1 (label 10) and 3
    // (label 20): 5 sees a 1-1 tie in round 1 → min label wins (10).
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 5L), (3L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq((1L, 10L), (3L, 20L)).toDF("vec_id", "label")
    val got = Similarity.labelPropagate(edges, seeds, "vec_id", "label", rounds = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (10L, 0L) && got(3L) == (20L, 0L))   // seeds clamped
    assert(got(2L)._2 == 1L && got(4L) == (20L, 1L))       // 1-hop in round 1
    assert(got(2L)._1 == 10L)                              // 2's tie (10 vs 20) → min
    assert(got(5L) == (10L, 1L))                           // 5's tie → min label
    // zero rounds = seeds only; reruns identical
    assert(Similarity.labelPropagate(edges, seeds, "vec_id", "label", 0).count() == 2)
    val again = Similarity.labelPropagate(edges, seeds, "vec_id", "label", rounds = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again == got)
  }

  test("centroidOutliers with an empty centroid set assigns (and flags) nothing") {
    val cents = emb.where(col("vec_id") < 0)
      .select(col("vec_id").as("cid"), col("embedding"))
    // ivfAssign's degenerate-input contract: empty centroids assign no
    // rows, so the outlier screen emits zero rows rather than NULLs.
    assert(Similarity.centroidOutliers(emb, cents, "vec_id", "embedding",
      "cid", minCos = 0.5).count() == 0)
  }

  test("chunkTokens: null text yields no chunks; single token yields one") {
    val d = Seq((1L, null: String), (2L, "only")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(d, "doc_id", "text", chunkSize = 4, stride = 4)
      .collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L),
      "null text must produce no chunk rows (sequence over null explodes to nothing)")
    assert(out.head.getAs[Long]("n_chunk_tokens") == 1L
      && out.head.getAs[String]("chunk_text") == "only")
  }

  test("rrfFuse at kConst = 0 ranks purely by 1/rank sums") {
    val a = Seq((1L, 10L, 1L)).toDF("qid", "vec_id", "rank")
    val b = Seq((1L, 11L, 1L), (1L, 10L, 2L)).toDF("qid", "vec_id", "rank")
    val out = Similarity.rrfFuse(a, b, "qid", "vec_id", k = 2, kConst = 0)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("rrf_score")))
    // 10: 1/1 + 1/2 = 1.5 beats 11: 1/1 = 1.0
    assert(out.toSeq == Seq((10L, 1.5), (11L, 1.0)))
  }

  test("recallAtK: identical lists score 1.0, disjoint 0.0, partial exact fraction") {
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L), (3L, 30L))
      .toDF("qid", "vec_id")
    val approx = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 99L), (3L, 99L))
      .toDF("qid", "vec_id")
    val out = Similarity.recallAtK(truth, approx, "qid", "vec_id").collect()
      .map(r => r.getAs[Long]("qid") ->
        (r.getAs[Long]("k"), r.getAs[Long]("n_hits"), r.getAs[Double]("recall"))).toMap
    assert(out(1L) == ((2L, 2L, 1.0)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((1L, 0L, 0.0)))
  }

  test("rrfFuse: overlap sums both lists, absent-list candidates score one term") {
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("qid", "vec_id", "rank")
    val b = Seq((1L, 10L, 2L), (1L, 12L, 1L)).toDF("qid", "vec_id", "rank")
    val out = Similarity.rrfFuse(a, b, "qid", "vec_id", k = 3, kConst = 60)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("rrf_score"), r.getAs[Long]("rank")))
    // 10: 1/61 + 1/62 (both lists) > 12: 1/61 > 11: 1/62
    assert(out.map(_._1).toSeq == Seq(10L, 12L, 11L))
    assert(out(0)._2 == 1.0 / 61 + 1.0 / 62)
    assert(out(1)._2 == 1.0 / 61 && out(2)._2 == 1.0 / 62)
    assert(out.map(_._3).toSeq == Seq(1L, 2L, 3L))
  }

  test("triangles: each clique listed once in canonical order, wedges without closure absent") {
    // K4 on {1,2,3,4} minus edge (3,4), plus a pendant 5 and a duplicate
    // reversed edge: triangles are exactly (1,2,3) and (1,2,4).
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (4L, 5L)
    ).toDF("src", "dst")
    val got = Similarity.triangles(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 3L), (1L, 2L, 4L)))
    // plan: keyed joins only
    val plan = Similarity.triangles(edges).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("hits: star center is the authority, leaves are the hubs") {
    // all leaves point at 1; 1 points at 2 only
    val edges = Seq((3L, 1L), (4L, 1L), (5L, 1L), (1L, 2L)).toDF("src", "dst")
    val out = Similarity.hits(edges, rounds = 2).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L)._2 == 1.0) // max-normalized top authority
    assert(out(3L)._1 == 1.0 && out(4L)._1 == 1.0 && out(5L)._1 == 1.0)
    assert(out(3L)._2 == 0.0) // nothing points at a leaf
    assert(out(2L)._1 == 0.0) // node 2 points at nothing
    // node 1's hub score trails the leaves: its one target (2) is a
    // weaker authority than 1 itself
    assert(out(1L)._1 < 1.0)
  }

  test("pageRankWeighted: rank follows similarity mass, conserves total") {
    // node 1 splits rank 0.9/0.1 between 2 and 3 by weight; unweighted
    // would split evenly — node 2 must out-rank node 3 only here.
    val edges = Seq(
      (1L, 2L, 0.9), (1L, 3L, 0.1),
      (2L, 1L, 1.0), (3L, 1L, 1.0)
    ).toDF("src", "dst", "cos")
    val pr = Similarity.pageRankWeighted(edges, rounds = 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(2L) > pr(3L))
    assert(math.abs(pr.values.sum - 1.0) < 1e-9) // no dangling nodes
    val un = Similarity.pageRank(edges, rounds = 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(un(2L) == un(3L)) // the unweighted walk cannot tell them apart
  }

  test("kCore: cascading peel removes the pendant chain, keeps the triangle") {
    // triangle {1,2,3} + chain 3-4-5: round 1 peels 5 (deg 1), round 2
    // peels 4 (deg fell to 1) — the 2-core is exactly the triangle.
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Similarity.kCore(edges, k = 2, rounds = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // one round is not enough for the cascade — pins that rounds matter
    val oneRound = Similarity.kCore(edges, k = 2, rounds = 1).collect()
      .map(_.getLong(0)).toSet
    assert(oneRound == Set(1L, 2L, 3L, 4L))
  }

  test("bfsHops: nearest-seed hops, min-root ties at equal distance, rounds bound") {
    // path 1-2-3-4-5-6 with seeds {1, 6}: node 3 is 2 hops from seed 1,
    // node 4 is 2 hops from seed 6; with the extra chord (3,7)+(7,4) the
    // midpoint 7 sits at 3 hops from BOTH seeds → root = min(1, 6) = 1.
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (3L, 7L), (7L, 4L))
    val edges = und.toDF("src", "dst") // directed input; op symmetrizes
    val seeds = Seq(1L, 6L).toDF("vec_id")
    val got = Similarity.bfsHops(edges, seeds, "vec_id", rounds = 4).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> (1L, 0L), 6L -> (6L, 0L),
      2L -> (1L, 1L), 5L -> (6L, 1L),
      3L -> (1L, 2L), 4L -> (6L, 2L),
      7L -> (1L, 3L))) // equidistant tie → min seed id
    // rounds bound: 1 round reaches only the seeds' direct neighbors
    val r1 = Similarity.bfsHops(edges, seeds, "vec_id", rounds = 1).collect()
      .map(_.getLong(0)).toSet
    assert(r1 == Set(1L, 2L, 5L, 6L))
    // early exit at an empty frontier ≡ running the remaining rounds
    val r9 = Similarity.bfsHops(edges, seeds, "vec_id", rounds = 9).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(r9 == got)
    // an isolated seed (not in the edge list) still reports hop 0
    val iso = Similarity.bfsHops(edges, Seq(99L).toDF("vec_id"),
      "vec_id", rounds = 2).collect()
    assert(iso.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((99L, 99L, 0L)))
  }

  test("kTruss: edge-support peel cascades; bridge edges die even between kept nodes") {
    // two triangles {1,2,3} and {4,5,6} joined by the bridge (3,4): the
    // bridge closes no triangle → peels round 1, even though BOTH its
    // endpoints sit in surviving triangles (the edge-vs-node cohesion
    // distinction kCore cannot make); triangle edges survive at support 1.
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Similarity.kTruss(edges, k = 3, rounds = 3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.keySet == Set((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L),
      (5L, 6L), (4L, 6L)))
    assert(got.values.forall(_ == 1L))
    // two triangles glued on (1,3): 3-truss keeps all five edges
    val und2 = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (1L, 4L))
    val e2 = (und2 ++ und2.map(_.swap)).toDF("src", "dst")
    val all2 = Similarity.kTruss(e2, k = 3, rounds = 3).collect()
    assert(all2.length == 5)
    // 4-truss (support ≥ 2): only the shared edge (1,3) reaches 2, and
    // alone it cannot survive (its witnesses died) — the CASCADE empties
    val t4 = Similarity.kTruss(e2, k = 4, rounds = 4).collect()
    assert(t4.isEmpty, s"4-truss of two glued triangles must be empty: ${t4.toSeq}")
  }

  test("knnClassify: majority wins; ties break to the smaller label; self-label unused") {
    // node 1's neighbors: 2,3 labeled "x", 4 labeled "y" → majority x.
    // node 2's neighbors: 3 ("x"), 4 ("y") → 1-1 tie → "x" (lexical).
    // node 1's own label "z" must not vote for itself.
    val graph = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("src", "dst")
    val labels = Seq((1L, "z"), (2L, "x"), (3L, "x"), (4L, "y"))
      .toDF("id", "lab")
    val got = Similarity.knnClassify(graph, labels, "id", "lab").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == Map(1L -> ("x", 2L), 2L -> ("x", 1L)))
  }

  test("heavyHitters: exact phi-frequent set, bounded candidate state") {
    // 10k rows: "hot" = 600 (6%), "warm" = 300 (3%), tail = 9100 distinct
    val rows = (Seq.fill(600)("hot") ++ Seq.fill(300)("warm") ++
      (0 until 9100).map(i => s"tail$i"))
    val df = rows.toDF("v").repartition(8)
    val got = TextAnalysis.heavyHitters(df, "v", phiNum = 1, phiDen = 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("hot" -> 600L), s"phi=5% must keep exactly hot: $got")
    val got2 = TextAnalysis.heavyHitters(df, "v", phiNum = 1, phiDen = 50)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got2 == Map("hot" -> 600L, "warm" -> 300L),
      s"phi=2% must keep hot+warm: $got2")
  }
}
