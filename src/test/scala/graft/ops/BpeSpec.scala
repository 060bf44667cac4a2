package graft.ops

import graft.SparkSpec

import scala.util.Random

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** The textbook BPE corpus: low×5, lower×2, newest×6, widest×3. */
  private def fixture = Seq(
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  /** Reference implementation: classic BPE on a word-frequency map with
    * the (count desc, lhs, rhs) tie-break — the list-fold ground truth
    * the string-replace rewrite must match. */
  private def referenceMerges(wf: Map[String, Long],
                              m: Int): Seq[(String, String, Long)] = {
    var words = wf.keys.map(w => w -> w.map(_.toString).toList).toMap
    val out = Seq.newBuilder[(String, String, Long)]
    var continue = true
    for (_ <- 1 to m if continue) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, syms) <- words; i <- 0 until syms.length - 1)
        pc((syms(i), syms(i + 1))) = pc.getOrElse((syms(i), syms(i + 1)), 0L) + wf(w)
      if (pc.isEmpty) continue = false
      else {
        val ((a, b), n) = pc.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((a, b, n))
        words = words.map { case (w, syms) =>
          val folded = syms.foldLeft(List.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
            else acc :+ x
          }
          w -> folded
        }
      }
    }
    out.result()
  }

  test("classic fixture learns the textbook merge table (tie-break exercised)") {
    val got = Bpe.trainMerges(fixture, "text", 6)
      .map(m => (m.rank, m.lhs, m.rhs, m.n))
    // Round 1 is a genuine tie: (e,s) = (s,t) = 9 → lhs order decides.
    assert(got == Seq(
      (1L, "e", "s", 9L), (2L, "es", "t", 9L), (3L, "l", "o", 7L),
      (4L, "lo", "w", 7L), (5L, "e", "w", 6L), (6L, "ew", "est", 6L)))
  }

  test("segmentVocab applies merges in rank order: textbook segmentations") {
    val merges = Bpe.trainMerges(fixture, "text", 6)
    val vocab = Bpe.segmentVocab(fixture, "text", merges)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // low→[low], lower→[low,e,r], newest→[n,ewest], widest→[w,i,d,est]
    assert(vocab == Map(
      "low" -> ((5L, 1L)), "lower" -> ((2L, 3L)),
      "newest" -> ((6L, 2L)), "widest" -> ((3L, 4L))))
  }

  test("string-replace rewrite ≡ reference list fold on random corpora") {
    val rnd = new Random(7)
    val alphabet = "abc"
    for (trial <- 0 until 5) {
      val words = Seq.fill(12)(
        (0 until (1 + rnd.nextInt(5))).map(_ => alphabet(rnd.nextInt(3))).mkString)
      val docs = words.grouped(4).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
        .toDF("doc_id", "text")
      val wf = words.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val want = referenceMerges(wf, 4)
      val got = Bpe.trainMerges(docs, "text", 4).map(m => (m.lhs, m.rhs, m.n))
      assert(got == want, s"trial $trial: corpus=$words")
    }
  }

  test("encode emits the textbook segmentation in document order") {
    val merges = Bpe.trainMerges(fixture, "text", 6)
    val doc = Seq((7L, "newest lower widest")).toDF("doc_id", "text")
    val got = Bpe.encode(doc, "doc_id", "text", merges)
      .orderBy("pos").collect().map(r => (r.getLong(1), r.getString(2)))
    // newest→[n,ewest], lower→[low,e,r], widest→[w,i,d,est], in order
    assert(got.toSeq == Seq(1L -> "n", 2L -> "ewest", 3L -> "low",
      4L -> "e", 5L -> "r", 6L -> "w", 7L -> "i", 8L -> "d", 9L -> "est"))
  }

  test("viterbiSegment: fewest pieces wins, then freq, then lexicographic") {
    val words = Seq(("abcd", 4), ("abc", 3), ("xy", 2)).toDF("word", "len")
    // 'abcd' covered by ab+cd (2 pieces) and abc+d (2 pieces): the freq
    // tie-break must pick the higher-sum pair; 'xy' has only chars.
    val vocab = Seq(("a", 10L), ("b", 10L), ("c", 10L), ("d", 10L),
      ("x", 1L), ("y", 1L), ("ab", 5L), ("cd", 9L), ("abc", 7L), ("bc", 2L))
      .toDF("piece", "freq")
    val got = Bpe.viterbiSegment(words, vocab, maxLen = 6)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // ab+cd = 14 beats abc+d = 17? no: abc+d = 7+10 = 17 > ab+cd = 14
    assert(got("abcd") == ((2L, 17L, "abc d")))
    // 'abc' whole piece (1) beats any 2-piece split
    assert(got("abc") == ((1L, 7L, "abc")))
    // chars only
    assert(got("xy") == ((2L, 2L, "x y")))
    // lexicographic tie-break: equal count and freq → smallest sequence
    val w2 = Seq(("aa", 2)).toDF("word", "len")
    val v2 = Seq(("a", 3L), ("b", 3L)).toDF("piece", "freq")
    assert(Bpe.viterbiSegment(w2, v2, maxLen = 4)
      .head().getString(3) == "a a")
    // words longer than maxLen are excluded (caller's filter contract)
    assert(Bpe.viterbiSegment(
      Seq(("toolong", 7)).toDF("word", "len"),
      Seq(("t", 1L), ("o", 1L), ("l", 1L), ("n", 1L), ("g", 1L)).toDF("piece", "freq"),
      maxLen = 4).count() == 0L)
  }

  test("vocabulary exhausted before numMerges: returns what was learnable") {
    val docs = Seq((0L, "a b a b b")).toDF("doc_id", "text")
    // Single-character words: no adjacent pairs at all.
    assert(Bpe.trainMerges(docs, "text", 3).isEmpty)
    // "ab" fuses in one merge; nothing left for rounds 2-3.
    val one = Bpe.trainMerges(Seq((0L, "ab ab")).toDF("doc_id", "text"), "text", 3)
    assert(one.map(m => (m.lhs, m.rhs, m.n)) == Seq(("a", "b", 2L)))
  }
}
