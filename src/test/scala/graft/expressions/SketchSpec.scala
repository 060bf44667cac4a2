package graft.expressions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the JVM hash construction to DuckDB's
  * `('0x'||substr(md5(s),1,15))::BIGINT` — including non-ASCII text
  * (md5 over UTF-8 bytes must agree byte-for-byte or every sketch oracle
  * silently diverges on non-English corpora). Expected values computed
  * with DuckDB 1.0. */
class SketchSpec extends AnyFunSuite {

  test("hash60 matches DuckDB for ascii and multi-byte text") {
    assert(Sketch.hash60("héllo wörld 中文") == 399406170694562618L)
    assert(Sketch.hash60("naïve café") == 648216096711513950L)
    assert(Sketch.hash60("日本語のテキスト です") == 509015920110900456L)
  }

  test("md5Hex matches the canonical digest") {
    assert(Sketch.md5Hex("abc") == "900150983cd24fb0d6963f7d28e17f72")
    assert(Sketch.hash60("abc") == java.lang.Long.parseLong("900150983cd24fb", 16))
  }

  test("shingles: fewer tokens than k collapses to one joined shingle") {
    assert(Sketch.shingles(Array("a", "b"), 3).toSeq == Seq("a b"))
    assert(Sketch.shingles(Array("a", "b", "c", "d"), 3).toSeq == Seq("a b c", "b c d"))
    assert(Sketch.shingles(Array(""), 3).toSeq == Seq(""))
  }

  test("rolling min-hash: naive recompute agrees with the rolling update") {
    val B = 257L; val M = 2147483647L
    // naive reference over CODEPOINTS — the SQL mirror reads unicode(t[i])
    def naive(s: String, w0: Int): Long = {
      val cps = s.codePoints().toArray
      if (cps.isEmpty) return 0L
      val w = math.min(w0, cps.length)
      (0 to cps.length - w).map { i =>
        cps.slice(i, i + w).foldLeft(0L)((a, c) => (a * B + c.toLong) % M)
      }.min
    }
    val e = RollingMinHashExpr(org.apache.spark.sql.catalyst.expressions.Literal("x"), 16)
    for (s <- Seq("", "a", "short", "the quick brown fox jumps over the lazy dog",
                  "aaaaaaaaaaaaaaaaaaaaaaaa", "abc" * 40,
                  // non-BMP: astral chars are ONE codepoint (two UTF-16
                  // units) — charAt-based hashing would diverge here
                  "café 😀 naïve 😀😁 end",
                  "😀")) {
      val got = e.compute(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(got == naive(s, 16), s"mismatch for '$s'")
    }
  }

  test("affine coefficients are odd (a) and in 31-bit range") {
    (1 to 16).foreach { i =>
      val a = Sketch.coeffA(i)
      val b = Sketch.coeffB(i)
      assert((a & 1L) == 1L && a > 0 && a <= Sketch.Mask31)
      assert(b >= 0 && b <= Sketch.Mask31)
    }
  }

  test("winnow set: naive recompute agrees, including non-BMP text") {
    val B = 257L; val M = 2147483647L
    def naive(s: String, k0: Int, w0: Int): Seq[Long] = {
      val cps = s.codePoints().toArray
      if (cps.isEmpty) return Seq.empty
      val k = math.min(k0, cps.length)
      val hs = (0 to cps.length - k).map { i =>
        cps.slice(i, i + k).foldLeft(0L)((a, c) => (a * B + c.toLong) % M)
      }
      val w = math.min(w0, hs.length)
      (0 to hs.length - w).map(j => hs.slice(j, j + w).min).distinct.sorted
    }
    val e = WinnowSetExpr(org.apache.spark.sql.catalyst.expressions.Literal("x"), 8, 4)
    for (s <- Seq("", "tiny", "the quick brown fox jumps over the lazy dog and more text",
                  "abab" * 30, "café 😀 naïve 😀😁 end padding to exceed window size")) {
      val got = e.compute(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .toLongArray().toSeq
      assert(got == naive(s, 8, 4), s"mismatch for '$s'")
    }
  }

  test("char-ngram hash set: codepoint positions, short-text collapse") {
    def naive(s: String, n: Int): Seq[Long] = {
      val cps = s.codePoints().toArray
      val grams = if (cps.length < n) Seq(s)
      else (0 to cps.length - n).map(i => new String(cps, i, n))
      grams.map(Sketch.hash60).distinct.sorted
    }
    val e = CharNgramHashSetExpr(org.apache.spark.sql.catalyst.expressions.Literal("x"), 3)
    for (s <- Seq("", "ab", "abc", "abcdef", "café 😀 naïve", "😀😁")) {
      val got = e.compute(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .toLongArray().toSeq
      assert(got == naive(s, 3), s"mismatch for '$s'")
    }
  }

  test("blockhash60: empty → 0, reference bit math, same-length locality") {
    val e = BlockHash60Expr(org.apache.spark.sql.catalyst.expressions.Literal("x"))
    assert(e.compute(Array.emptyByteArray) == 0L)
    // reference recompute for an arbitrary payload
    val bytes = (0 until 300).map(i => ((i * 37 + 11) % 251).toByte).toArray
    val sums = new Array[Long](60)
    var total = 0L
    bytes.zipWithIndex.foreach { case (b, j) =>
      val v = (b & 0xff).toLong; sums(j * 60 / bytes.length) += v; total += v
    }
    val expect = (0 until 60).map(i => if (60L * sums(i) > total) 1L << i else 0L).sum
    assert(e.compute(bytes) == expect)
    // a single corrupted byte (same length) flips at most a few bits:
    // the locality that makes the sketch a NEAR-dup detector
    val corrupted = bytes.clone(); corrupted(5) = 0
    val d = java.lang.Long.bitCount(e.compute(bytes) ^ e.compute(corrupted))
    assert(d <= 3, s"single-byte corruption moved $d bits")
  }

  test("shingle hash set mirrors Sketch.shingles semantics") {
    val e = ShingleHashSetExpr(org.apache.spark.sql.catalyst.expressions.Literal("x"), 3)
    def run(s: String): Seq[Long] =
      e.compute(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toLongArray().toSeq
    assert(run("a b") == Seq(Sketch.hash60("a b")))
    assert(run("a b c d") ==
      Seq("a b c", "b c d").map(Sketch.hash60).distinct.sorted)
    assert(run("") == Seq(Sketch.hash60("")))
  }
}
