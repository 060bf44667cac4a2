package graft.io

import graft.io.SchemaDrift._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaDriftSpec extends AnyFunSuite {
  private val base = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("qty", IntegerType)))

  test("no drift on identical schemas") {
    assert(diff(base, base).isEmpty)
    assert(isCompatible(Nil))
  }

  test("adds, drops and type changes are all reported") {
    val incoming = StructType(Seq(
      StructField("id", LongType), StructField("qty", LongType),
      StructField("color", StringType)))
    val changes = diff(base, incoming)
    assert(changes.toSet == Set(
      Added("color", StringType),
      Dropped("name", StringType),
      TypeChanged("qty", IntegerType, LongType)))
    assert(isCompatible(changes), "int->long widens; add/drop are union-safe")
  }

  test("narrowing type change is incompatible") {
    val narrowed = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("qty", IntegerType)))
    val changes = diff(base, narrowed)
    assert(changes == Seq(TypeChanged("id", LongType, IntegerType)))
    assert(!isCompatible(changes))
    assert(describe(changes) == Seq("~ id: bigint -> int"))
  }

  test("decimal widening respects integer-digit and scale headroom") {
    assert(widens(DecimalType(10, 2), DecimalType(12, 2)))
    assert(widens(DecimalType(10, 2), DecimalType(14, 4)))
    assert(!widens(DecimalType(10, 2), DecimalType(10, 4)), "loses integer digits")
    assert(!widens(DecimalType(10, 2), DecimalType(10, 0)), "loses scale")
  }
}
