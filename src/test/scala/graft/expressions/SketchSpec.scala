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
}
