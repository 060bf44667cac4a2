package graft.io

import graft.SparkSpec
import graft.cdc.TableConfig
import java.nio.file.{Files, Paths}

class CsvCdcSpec extends SparkSpec {
  import spark.implicits._

  test("csv change files drive the same merge semantics") {
    val lake = Files.createTempDirectory("lake").toString + "/db/t"
    val raw = Files.createTempDirectory("raw").toString + "/db/t"
    Files.createDirectories(Paths.get(raw))
    Files.writeString(Paths.get(s"$raw/LOAD00000001.csv"),
      "Op,id,v\nI,1,a\nI,2,b\nI,3,c\n")
    Files.writeString(Paths.get(s"$raw/20260812-000001.csv"),
      "Op,id,v\nU,1,a2\nD,2,b\nI,4,d\n")

    val cfg = TableConfig(Seq("id"), Nil, active = true)
    assert(CdcPipeline.loadInitial(spark, Seq(s"$raw/LOAD00000001.csv"), lake, cfg, "csv") == 3)
    val stats = CdcPipeline.loadIncremental(spark,
      Seq(s"$raw/20260812-000001.csv"), lake, cfg, "csv")
    assert(!stats.insertOnly)
    val back = spark.read.parquet(lake).orderBy("id").collect()
      .map(r => (r.getAs[String]("Op"), r.getAs[Int]("id"), r.getAs[String]("v")))
    assert(back.toSeq == Seq(("U", 1, "a2"), ("I", 3, "c"), ("I", 4, "d")))
  }

  test("json change files work too") {
    val lake = Files.createTempDirectory("lake").toString + "/db/t"
    val raw = Files.createTempDirectory("raw").toString + "/db/t"
    Files.createDirectories(Paths.get(raw))
    Files.writeString(Paths.get(s"$raw/20260812-000001.json"),
      """{"Op":"I","id":1,"v":"a"}
        |{"Op":"I","id":2,"v":"b"}
        |""".stripMargin)
    val cfg = TableConfig(Seq("id"), Nil, active = true)
    // first load over empty target → insert-only path
    val stats = CdcPipeline.loadIncremental(spark,
      Seq(s"$raw/20260812-000001.json"), lake, cfg, "json")
    assert(stats.insertOnly && stats.rowsWritten == 2)
    assert(spark.read.parquet(lake).count() == 2)
  }
}
