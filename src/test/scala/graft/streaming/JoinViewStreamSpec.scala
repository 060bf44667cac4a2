package graft.streaming

import graft.SparkSpec
import graft.cdc.TableConfig
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** [[JoinViewStream]]: the streamed fact⋈dim view must converge to the
  * from-scratch join over the final fact lake, across micro-batch splits,
  * for both view formats (CoW and MOR). */
class JoinViewStreamSpec extends SparkSpec {
  import spark.implicits._

  private def writeFile(df: DataFrame, dir: String, name: String): Unit = {
    val tmp = Files.createTempDirectory("stage").toString
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/$name"))
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  private val dim = Seq((10, "gold"), (20, "silver")).toDF("cust", "tier")

  private def run(viewMor: Boolean): Unit = {
    val raw = Files.createTempDirectory("jvRaw").toString + "/db/t"
    val factLake = Files.createTempDirectory("jvFact").toString + "/db/t"
    val viewLake = Files.createTempDirectory("jvView").toString + "/db/v"
    val ckpt = Files.createTempDirectory("jvCkpt").toString
    val factCfg = TableConfig(Seq("id"), Nil, active = true)
    val viewCfg = TableConfig(Seq("id"), Nil, active = true, mergeOnRead = viewMor)
    writeFile((1 to 10).map(i => ("I", i, if (i % 2 == 0) 10 else 20, s"v$i"))
      .toDF("Op", "id", "cust", "v"), raw, "20260816-000001.parquet")
    // id 2 moves dim key 10 → 20 (its tier must refresh), id 3 deleted,
    // id 11 inserted with a dim orphan key (NULL tier must appear)
    writeFile(Seq(("U", 2, 20, "moved"), ("D", 3, 20, "v3"), ("I", 11, 99, "new"))
      .toDF("Op", "id", "cust", "v"), raw, "20260816-000002.parquet")

    val q = JoinViewStream.start(spark, raw, factLake, viewLake, dim,
      Seq("id"), Seq("cust"), factCfg, viewCfg, ckpt,
      Trigger.AvailableNow(), maxFilesPerTrigger = 1) // maintenance must span batches
    q.awaitTermination()

    val view = (if (viewMor) graft.io.MorTable.read(spark, viewLake)
                else spark.read.parquet(viewLake))
      .select("id", "cust", "v", "tier")
    val want = spark.read.parquet(factLake)
      .select("id", "cust", "v").join(dim, Seq("cust"), "left")
      .select("id", "cust", "v", "tier")
    val got = view.collect().map(_.toSeq).sortBy(_.toString).toSeq
    val exp = want.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(got == exp, s"view diverged from full re-join (mor=$viewMor)")

    val byId = view.collect().map(r => r.getAs[Int]("id") ->
      (r.getAs[String]("v"), Option(r.getAs[String]("tier")))).toMap
    assert(!byId.contains(3), "deleted fact key must leave the view")
    assert(byId(2) == (("moved", Some("silver"))), "dim attrs must refresh on key move")
    assert(byId(11) == (("new", None)), "dim orphan keeps a NULL-attr view row")
    assert(byId(5) == (("v5", Some("silver"))), "untouched keys survive maintenance")
  }

  test("streamed join view converges to the full re-join (CoW view)") { run(viewMor = false) }
  test("streamed join view converges to the full re-join (MOR view)") { run(viewMor = true) }
}
