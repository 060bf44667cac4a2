package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math as pure Column functions over `array<float>`
  * columns (cast to double element-wise before accumulation so results are
  * bit-identical to the DuckDB oracle's sequential fold).
  *
  * All per-row, codegen-friendly, shuffle-free; the pair-generation for
  * kNN/ANN is where the distribution strategy lives (see
  * [[graft.queries.SimilarityQueries]]).
  */
object VectorFunctions {

  /** Element-wise cast to double (floats widen exactly). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product (deterministic accumulation order).
    * Native expression — the aggregate/zip_with formulation evaluates
    * interpreted per element (see graft.expressions.VectorExpressions). */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.dot(a, b)

  /** L2 norm. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity (0 when either norm is zero). */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.cosine(a, b)

  /** Sign-LSH bucket for cosine similarity from the first `bits`
    * axis-aligned hyperplanes: bit j set iff `v[j] > 0`. Exact comparisons
    * (no float arithmetic) → identical bucketing in any engine; recall
    * comes from multiple probes at query time. */
  def signBucket(v: Column, bits: Int): Column =
    graft.expressions.VectorExpressions.signBucket(v, bits)

  /** Sign mask of dims [start, start+bits) — bit j ⇔ v[start+j] > 0.
    * Binary quantization packing: 32 dims per LONG word (see
    * [[graft.expressions.SignMaskExpr]]). */
  def signMask(v: Column, start: Int, bits: Int): Column =
    graft.expressions.VectorExpressions.signMask(v, start, bits)
}
