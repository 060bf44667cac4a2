package graft.io

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

class DiscoverySpec extends AnyFunSuite {

  private def mkTree(paths: String*): String = {
    val root = Files.createTempDirectory("disc").toString
    paths.foreach { p =>
      val f = Paths.get(root, p)
      Files.createDirectories(f.getParent)
      Files.writeString(f, "x")
    }
    root
  }

  test("two-level schema/table discovery, sorted, files at root ignored") {
    val root = mkTree(
      "dbA/t1/LOAD00000001.parquet",
      "dbA/t2/20260812-1.parquet",
      "dbB/t1/LOAD00000001.parquet",
      "stray.parquet")
    val tables = Discovery.listTables(root)
    assert(tables.map(_.key) == Seq("dbA/t1", "dbA/t2", "dbB/t1"))
  }

  test("cdc file selection: strictly-after watermark, name-ordered, LOAD files excluded") {
    val root = mkTree(
      "db/t/LOAD00000001.parquet",
      "db/t/20260812-000001.parquet",
      "db/t/20260812-000002.parquet",
      "db/t/20260812-000003.parquet")
    val dir = s"$root/db/t"
    // default watermark (0.parquet) → all three cdc files, ordered
    val all = Discovery.cdcFilesAfter(dir, s"$dir/0.parquet").get
    assert(all.files.map(f => f.substring(f.lastIndexOf('/') + 1)) ==
      Seq("20260812-000001.parquet", "20260812-000002.parquet", "20260812-000003.parquet"))
    assert(all.newWatermark.endsWith("20260812-000003.parquet"))
    // mid watermark → strictly-after selection (the watermark file itself excluded)
    val two = Discovery.cdcFilesAfter(dir, s"$dir/20260812-000001.parquet").get
    assert(two.files.length == 2)
    // at the end → None
    assert(Discovery.cdcFilesAfter(dir, s"$dir/20260812-000003.parquet").isEmpty)
    // missing dir → None
    assert(Discovery.cdcFilesAfter(s"$root/nope", "w").isEmpty)
  }

  test("full-load mtime reflects the newest LOAD file only") {
    val root = mkTree("db/t/LOAD00000001.parquet", "db/t/20990101-9.parquet")
    val dir = s"$root/db/t"
    val m = Discovery.latestFullLoadMtime(dir)
    assert(m.nonEmpty)
    assert(Discovery.loadFiles(dir).map(f => f.substring(f.lastIndexOf('/') + 1)) ==
      Seq("LOAD00000001.parquet"))
  }
}
