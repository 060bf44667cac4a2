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

  test("large csv file split across tasks still merges in line order") {
    // 2000 updates to ONE key in one file; correctness requires the LAST
    // line to win even when Spark splits the file into many scan tasks
    // (the round-1 advisory: monotonically_increasing_id alone is not
    // line order under split reads — file_block_start disambiguates).
    val lake = Files.createTempDirectory("lake").toString + "/db/t"
    val raw = Files.createTempDirectory("raw").toString + "/db/t"
    Files.createDirectories(Paths.get(raw))
    val n = 2000
    val lines = (1 to n).map(i => f"U,1,v$i%05d")
    Files.writeString(Paths.get(s"$raw/LOAD00000001.csv"), "Op,id,v\nI,1,v0\n")
    Files.writeString(Paths.get(s"$raw/20260812-000001.csv"),
      "Op,id,v\n" + lines.mkString("\n") + "\n")
    val cfg = TableConfig(Seq("id"), Nil, active = true)
    assert(CdcPipeline.loadInitial(spark, Seq(s"$raw/LOAD00000001.csv"), lake, cfg, "csv") == 1)
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val parts = spark.read.option("header", "true")
        .csv(s"$raw/20260812-000001.csv").rdd.getNumPartitions
      assert(parts > 1, s"fixture must force a split read, got $parts partition(s)")
      CdcPipeline.loadIncremental(spark, Seq(s"$raw/20260812-000001.csv"), lake, cfg, "csv")
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
      spark.conf.unset("spark.sql.files.openCostInBytes")
    }
    val back = spark.read.parquet(lake).collect()
    assert(back.length == 1 && back(0).getAs[String]("v") == f"v$n%05d")
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
    // first load of a PK table merges against an empty target (so a
    // multi-file first batch can't drop updates/deletes)
    val stats = CdcPipeline.loadIncremental(spark,
      Seq(s"$raw/20260812-000001.json"), lake, cfg, "json")
    assert(!stats.insertOnly && stats.rowsWritten == 2)
    assert(spark.read.parquet(lake).count() == 2)
  }
}
