package graft

import graft.expressions.TextSketches
import org.apache.spark.sql.functions._

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("SQL-registered sketch functions match the Column API") {
    GraftFunctions.register(spark)
    val df = Seq((1L, "alpha beta gamma delta epsilon")).toDF("id", "text")
    df.createOrReplaceTempView("t")
    val viaSql = spark.sql(
      """SELECT graft_simhash32(text) AS sh,
        |       graft_minhash_signature(text, 4, 2) AS sig,
        |       graft_shingle_minhash(text, 2) AS ch,
        |       graft_simhash60(text) AS sh60,
        |       graft_rolling_minhash(text, 8) AS rmh,
        |       graft_byte_checksum(CAST(text AS BINARY)) AS bck,
        |       graft_winnow_set(text, 8, 4) AS ws FROM t""".stripMargin).head()
    val viaCol = df.select(
      TextSketches.simHash32($"text").as("sh"),
      TextSketches.minHashSignature($"text", 4, 2).as("sig"),
      TextSketches.shingleMinHash($"text", 2).as("ch"),
      TextSketches.simHash60($"text").as("sh60"),
      TextSketches.rollingMinHash($"text", 8).as("rmh"),
      graft.expressions.MediaExpressions.byteFoldChecksum($"text".cast("binary")).as("bck"),
      TextSketches.winnowSet($"text", 8, 4).as("ws")).head()
    assert(viaSql.getLong(0) == viaCol.getLong(0))
    assert(viaSql.getSeq[Long](1) == viaCol.getSeq[Long](1))
    assert(viaSql.getLong(2) == viaCol.getLong(2))
    assert(viaSql.getLong(3) == viaCol.getLong(3))
    assert(viaSql.getLong(4) == viaCol.getLong(4))
    assert(viaSql.get(5) == viaCol.get(5))
    assert(viaSql.getSeq[Long](6) == viaCol.getSeq[Long](6))
  }

  test("non-literal k is rejected with a clear error") {
    GraftFunctions.register(spark)
    Seq((1L, "x")).toDF("id", "text").createOrReplaceTempView("t2")
    val e = intercept[Exception](
      spark.sql("SELECT graft_minhash_signature(text, id + 1, 3) FROM t2").collect())
    assert(e.getMessage.contains("integer literal") || e.getMessage.contains("k must be"))
  }
}
