package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.types._
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Native Catalyst expressions for text sketches (MinHash, SimHash,
  * shingle content hash).
  *
  * The Column-function formulations (transform/aggregate lambdas) are
  * correct but Spark evaluates higher-order array functions interpreted —
  * k=16 MinHash over 5 k docs cost ~56 s at sf0.1. These expressions
  * compute the identical result in one JVM eval per row: tokenize →
  * shingle → one md5 per distinct shingle → k affine permutations
  * `(a_i·x + b_i) mod (2^61−1)` — ~100× less interpreter overhead and one
  * md5 instead of k per shingle.
  *
  * Every algorithm stays bit-for-bit reproducible in DuckDB SQL (see the
  * `dedup_*` oracles): md5 is md5, and the affine coefficients are
  * themselves md5-derived (`a_i = h60("a:"+i) & 0x7FFFFFFF | 1`).
  */
object Sketch {
  /** 2^61 − 1 (Mersenne prime) — modulus of the affine MinHash family. */
  val P: Long = 2305843009213693951L
  /** 31-bit mask applied to shingle hashes so `a·x` fits in a signed 64. */
  val Mask31: Long = 0x7FFFFFFFL

  private val md5 = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))
  private val hex = "0123456789abcdef".toCharArray

  def md5Hex(s: String): String = {
    val d = md5.get().digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hex((d(i) & 0xf0) >> 4)
      out(2 * i + 1) = hex(d(i) & 0x0f)
      i += 1
    }
    new String(out)
  }

  /** First 15 hex digits of md5 as a 60-bit long —
    * `('0x'||substr(md5(s),1,15))::BIGINT` in DuckDB. */
  def hash60(s: String): Long = {
    val d = md5.get().digest(s.getBytes(StandardCharsets.UTF_8))
    // first 15 hex digits = first 7 bytes + high nibble of byte 8
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  def tokens(s: String): Array[String] = s.trim.split("\\s+")

  /** k-word shingles; single joined string when fewer than k tokens
    * (mirrors TextFunctions.wordShingles / the SQL CASE). */
  def shingles(toks: Array[String], k: Int): Array[String] =
    if (toks.length < k) Array(toks.mkString(" "))
    else Array.tabulate(toks.length - k + 1)(i => toks.slice(i, i + k).mkString(" "))

  /** Affine family coefficients, md5-derived (computable inline in SQL). */
  def coeffA(i: Int): Long = (hash60(s"a:$i") & Mask31) | 1L
  def coeffB(i: Int): Long = hash60(s"b:$i") & Mask31
}

/** MinHash signature of a text column: array<long> of length k. */
case class MinHashSignatureExpr(child: Expression, k: Int, shingleWords: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  private lazy val as = Array.tabulate(k)(i => Sketch.coeffA(i + 1))
  private lazy val bs = Array.tabulate(k)(i => Sketch.coeffB(i + 1))

  /** Called from both interpreted eval and generated code — keeps the
    * surrounding projection inside whole-stage codegen. */
  def compute(input: Object): GenericArrayData =
    nullSafeEval(input).asInstanceOf[GenericArrayData]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSignatureExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val sh = Sketch.shingles(Sketch.tokens(input.toString), shingleWords).distinct
    val xs = sh.map(s => Sketch.hash60(s) & Sketch.Mask31)
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      var m = Long.MaxValue
      var j = 0
      while (j < xs.length) {
        val v = (as(i) * xs(j) + bs(i)) % Sketch.P
        if (v < m) m = v
        j += 1
      }
      sig(i) = if (xs.isEmpty) 0L else m
      i += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 32-bit SimHash of a text column (distinct whitespace tokens). */
case class SimHash32Expr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  def compute(input: Object): Long = nullSafeEval(input).asInstanceOf[Long]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash32Expr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = Sketch.tokens(input.toString).distinct
    val counts = new Array[Int](32)
    var i = 0
    while (i < toks.length) {
      val h = Sketch.hash60(toks(i))
      var j = 0
      while (j < 32) {
        counts(j) += (((h >> j) & 1L).toInt * 2 - 1)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 60-bit SimHash of a text column (distinct whitespace tokens, bits from
  * [[Sketch.hash60]]). The wide variant of [[SimHash32Expr]] for corpora
  * where 32 bits saturate (random 32-bit sketches collide at billions of
  * docs): 60 bits stay non-negative in a signed BIGINT, so the DuckDB
  * mirror needs no unsigned casts, and four 15-bit bands give EXACT
  * recall for Hamming ≤ 3 by pigeonhole (≤ 3 flipped bits cannot touch
  * all four bands). */
case class SimHash60Expr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  def compute(input: Object): Long = nullSafeEval(input).asInstanceOf[Long]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash60", this, classOf[SimHash60Expr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = Sketch.tokens(input.toString).distinct
    val counts = new Array[Int](60)
    var i = 0
    while (i < toks.length) {
      val h = Sketch.hash60(toks(i))
      var j = 0
      while (j < 60) {
        counts(j) += (((h >> j) & 1L).toInt * 2 - 1)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Minimum raw shingle hash — a one-value content fingerprint. */
case class ShingleMinHashExpr(child: Expression, shingleWords: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  def compute(input: Object): Long = nullSafeEval(input).asInstanceOf[Long]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleMinHash", this, classOf[ShingleMinHashExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val sh = Sketch.shingles(Sketch.tokens(input.toString), shingleWords)
    var m = Long.MaxValue
    var i = 0
    while (i < sh.length) {
      val v = Sketch.hash60(sh(i))
      if (v < m) m = v
      i += 1
    }
    java.lang.Long.valueOf(if (sh.isEmpty) 0L else m)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Winnowing-style rolling fingerprint: minimum Rabin-Karp hash over all
  * `window`-char windows of the normalized text (base 257 mod 2^31−1 —
  * products stay under 2^40, exactly representable in BIGINT for the SQL
  * mirror). Stable under edits outside the minimizing window — the
  * classic partial-duplicate fingerprint. */
case class RollingMinHashExpr(child: Expression, window: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  private val B = 257L
  private val M = 2147483647L // 2^31 - 1

  def compute(input: Object): Long = nullSafeEval(input).asInstanceOf[Long]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rollingMinHash", this, classOf[RollingMinHashExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def nullSafeEval(input: Any): Any = {
    // Hash Unicode CODEPOINTS, not UTF-16 code units: the SQL mirror reads
    // unicode(t[i]) per codepoint, and the rest of the text stack counts
    // codepoints — charAt would split astral-plane chars into surrogate
    // pairs and diverge on any non-BMP text. Codepoints reach 0x10FFFF so
    // products stay < 2^52, still exact in the modular arithmetic.
    val cps = input.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return java.lang.Long.valueOf(0L)
    val w = math.min(window, n)
    // B^(w-1) mod M for the outgoing character
    var bw = 1L
    var k = 0
    while (k < w - 1) { bw = (bw * B) % M; k += 1 }
    var h = 0L
    var i = 0
    while (i < w) { h = (h * B + cps(i).toLong) % M; i += 1 }
    var min = h
    while (i < n) {
      h = (h - (cps(i - w).toLong * bw) % M + M) % M
      h = (h * B + cps(i).toLong) % M
      if (h < min) min = h
      i += 1
    }
    java.lang.Long.valueOf(min)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hash-bucket ids of a document's unigram + bigram features WITH
  * multiplicity (the DSIR feature vector): `hash60(tok) % buckets` for
  * every token, then `hash60(tok_i || ' ' || tok_{i+1}) % buckets` for
  * every adjacent pair (none when fewer than 2 tokens). One JVM pass —
  * the interpreted `transform`-lambda shingle formulation evaluated its
  * lambda per element and round-tripped md5 through hex-string `conv`
  * (measured ~10x slower at sf0.1, ProfileDsir). Mirrors the SQL
  * `list_concat(tk, list_transform(range(1, len(tk)), ...))` + h60 CTE
  * exactly: counts, not a set. */
case class HashedNgramBucketsExpr(child: Expression, buckets: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  def compute(input: Object): GenericArrayData =
    nullSafeEval(input).asInstanceOf[GenericArrayData]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashedNgramBuckets", this,
      classOf[HashedNgramBucketsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = Sketch.tokens(input.toString)
    val nBi = if (toks.length < 2) 0 else toks.length - 1
    val out = new Array[Long](toks.length + nBi)
    var i = 0
    while (i < toks.length) {
      out(i) = Sketch.hash60(toks(i)) % buckets
      i += 1
    }
    var j = 0
    while (j < nBi) {
      out(toks.length + j) = Sketch.hash60(toks(j) + " " + toks(j + 1)) % buckets
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct hash60 set of character n-grams, sorted — the hashed-shingle
  * representation of a document for set-similarity verification (standard
  * MinHash-literature practice: Jaccard over hashed shingles). One JVM
  * pass replaces an interpreted per-position substring lambda, and the
  * downstream joins/intersects move array<long> instead of array<string>.
  * Mirrors `TextFunctions.charNgramsOf`: texts shorter than `n` hash the
  * whole string (including empty). Positions are CODEPOINT-based, like
  * the SQL mirror's substr. */
case class CharNgramHashSetExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  def compute(input: Object): GenericArrayData =
    nullSafeEval(input).asInstanceOf[GenericArrayData]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charNgramHashSet", this, classOf[CharNgramHashSetExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.toString
    val cps = s.codePoints().toArray
    val out = new java.util.TreeSet[java.lang.Long]()
    if (cps.length < n) out.add(Sketch.hash60(s))
    else {
      var i = 0
      while (i <= cps.length - n) {
        out.add(Sketch.hash60(new String(cps, i, n)))
        i += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var x = 0
    while (it.hasNext) { arr(x) = it.next(); x += 1 }
    new GenericArrayData(arr)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct hash60 set of k-word shingles, sorted — the word-level twin
  * of [[CharNgramHashSetExpr]] (mirrors `Sketch.shingles`: fewer than k
  * tokens hash the whole joined token string). */
case class ShingleHashSetExpr(child: Expression, shingleWords: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  def compute(input: Object): GenericArrayData =
    nullSafeEval(input).asInstanceOf[GenericArrayData]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashSet", this, classOf[ShingleHashSetExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val sh = Sketch.shingles(Sketch.tokens(input.toString), shingleWords)
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < sh.length) { out.add(Sketch.hash60(sh(i))); i += 1 }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var x = 0
    while (it.hasNext) { arr(x) = it.next(); x += 1 }
    new GenericArrayData(arr)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Winnowing fingerprint set (Schleimer/Wilkerson/Aiken, MOSS): Rabin-Karp
  * hashes of every `k`-codepoint window (same base-257 mod 2^31−1 rolling
  * hash as [[RollingMinHashExpr]]), then the minimum over each run of `w`
  * consecutive window hashes, distinct + sorted. Guarantee: two documents
  * sharing any substring of length ≥ k + w − 1 share a fingerprint, and
  * the set size is ~n/w — the index stays a constant fraction of the
  * corpus. Sliding minima via monotonic deque (O(n) per document).
  *
  * DuckDB mirror: per-window hashes via list_reduce over codepoint
  * slices, minima via list_min over list_slice, then
  * list_sort(list_distinct(...)) — O(n·k + n·w) interpreted but value-
  * identical (all arithmetic is exact modular integer math). */
case class WinnowSetExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private val B = 257L
  private val M = 2147483647L // 2^31 - 1

  def compute(input: Object): GenericArrayData =
    nullSafeEval(input).asInstanceOf[GenericArrayData]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowSet", this, classOf[WinnowSetExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val kk = math.min(k, n)
    // window hashes h(0..m-1), m = n - kk + 1
    val m = n - kk + 1
    val hs = new Array[Long](m)
    var bw = 1L
    var t = 0
    while (t < kk - 1) { bw = (bw * B) % M; t += 1 }
    var h = 0L
    var i = 0
    while (i < kk) { h = (h * B + cps(i).toLong) % M; i += 1 }
    hs(0) = h
    while (i < n) {
      h = (h - (cps(i - kk).toLong * bw) % M + M) % M
      h = (h * B + cps(i).toLong) % M
      hs(i - kk + 1) = h
      i += 1
    }
    // sliding min over w consecutive hashes (monotonic deque)
    val ww = math.min(w, m)
    val out = new java.util.TreeSet[java.lang.Long]()
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // deque[head until tail) holds candidate indices
    var j = 0
    while (j < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(j)) tail -= 1
      deque(tail) = j; tail += 1
      if (deque(head) <= j - ww) head += 1
      if (j >= ww - 1) out.add(hs(deque(head)))
      j += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var x = 0
    while (it.hasNext) { arr(x) = it.next(); x += 1 }
    new GenericArrayData(arr)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Stopword-hit counts per language: array<long> in the declared language
  * order — one tokenization pass instead of one interpreted
  * filter/array_contains pipeline per language. */
case class LangHitsExpr(child: Expression, langWords: Seq[Seq[String]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  private lazy val sets: Array[Set[String]] = langWords.map(_.toSet).toArray

  def compute(input: Object): GenericArrayData =
    nullSafeEval(input).asInstanceOf[GenericArrayData]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langHits", this, classOf[LangHitsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = Sketch.tokens(input.toString)
    val counts = new Array[Long](sets.length)
    var i = 0
    while (i < toks.length) {
      var l = 0
      while (l < sets.length) {
        if (sets(l).contains(toks(i))) counts(l) += 1L
        l += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-facing constructors. */
object TextSketches {
  private def expr(c: Column) = GraftColumnShim.expression(c)
  def minHashSignature(text: Column, k: Int, shingleWords: Int): Column =
    GraftColumnShim.column(MinHashSignatureExpr(expr(text), k, shingleWords))
  def simHash32(text: Column): Column =
    GraftColumnShim.column(SimHash32Expr(expr(text)))
  def simHash60(text: Column): Column =
    GraftColumnShim.column(SimHash60Expr(expr(text)))
  def shingleMinHash(text: Column, shingleWords: Int): Column =
    GraftColumnShim.column(ShingleMinHashExpr(expr(text), shingleWords))
  def langHits(text: Column, langWords: Seq[Seq[String]]): Column =
    GraftColumnShim.column(LangHitsExpr(expr(text), langWords))
  def rollingMinHash(text: Column, window: Int): Column =
    GraftColumnShim.column(RollingMinHashExpr(expr(text), window))
  def winnowSet(text: Column, k: Int, w: Int): Column =
    GraftColumnShim.column(WinnowSetExpr(expr(text), k, w))
  def charNgramHashSet(text: Column, n: Int): Column =
    GraftColumnShim.column(CharNgramHashSetExpr(expr(text), n))
  def shingleHashSet(text: Column, k: Int): Column =
    GraftColumnShim.column(ShingleHashSetExpr(expr(text), k))
  def hashedNgramBuckets(text: Column, buckets: Int): Column =
    GraftColumnShim.column(HashedNgramBucketsExpr(expr(text), buckets))
}
