package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Raw-bucket discovery + watermark file selection, on the Hadoop
  * `FileSystem` API so local paths and `s3a://` behave identically.
  *
  * Reference behaviors re-expressed:
  *  - C1 two-level `{schema}/{table}` folder discovery
  *    (/root/reference/DMSCDC_Controller.py:49,57-61);
  *  - C3 full-load trigger: any `LOAD*` file newer than the stored
  *    full-load watermark (DMSCDC_ProcessTable.py:63-75);
  *  - C4 incremental selection: CDC files are named `2<timestamp>…`
  *    (a DMS convention, kept as a configurable prefix); exactly the
  *    names lexicographically greater than the stored watermark are new
  *    (DMSCDC_ProcessTable.py:93-104, DMSCDC_LoadIncremental.py:41-45).
  *
  * All listings are driver-side control-plane work over file *names* —
  * O(files in one table dir), independent of data volume.
  */
object Discovery {

  final case class TableDir(schema: String, table: String, dir: String) {
    def key: String = s"$schema/$table"
  }
  final case class CdcBatch(files: Seq[String], newWatermark: String)

  val LoadFilePrefix = "LOAD"
  val CdcFilePrefix = "2"

  private def fs(p: Path, conf: Configuration): FileSystem = p.getFileSystem(conf)

  /** C1: list `<root>/<schema>/<table>` two levels deep. */
  def listTables(root: String, conf: Configuration = new Configuration()): Seq[TableDir] = {
    val rootPath = new Path(root)
    val f = fs(rootPath, conf)
    if (!f.exists(rootPath)) return Nil
    for {
      schema <- f.listStatus(rootPath).toSeq.filter(_.isDirectory).sortBy(_.getPath.getName)
      table <- f.listStatus(schema.getPath).toSeq.filter(_.isDirectory).sortBy(_.getPath.getName)
    } yield TableDir(schema.getPath.getName, table.getPath.getName, table.getPath.toString)
  }

  /** C3: newest `LOAD*` mtime, or None when no snapshot files exist. */
  def latestFullLoadMtime(tableDir: String, conf: Configuration = new Configuration()): Option[Long] = {
    val p = new Path(tableDir)
    val f = fs(p, conf)
    if (!f.exists(p)) return None
    val loads = f.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith(LoadFilePrefix))
    if (loads.isEmpty) None else Some(loads.map(_.getModificationTime).max)
  }

  /** All `LOAD*` snapshot files, sorted by name. */
  def loadFiles(tableDir: String, conf: Configuration = new Configuration()): Seq[String] = {
    val p = new Path(tableDir)
    val f = fs(p, conf)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith(LoadFilePrefix))
      .map(_.getPath.toString).sorted
  }

  /** C4: CDC files strictly after the watermark, in commit (name) order.
    * The watermark is a full path; comparison is on file name, matching the
    * reference's `StartAfter` semantics. */
  def cdcFilesAfter(tableDir: String, lastIncrementalFile: String,
                    conf: Configuration = new Configuration()): Option[CdcBatch] = {
    val p = new Path(tableDir)
    val f = fs(p, conf)
    if (!f.exists(p)) return None
    val lastName = new Path(lastIncrementalFile).getName
    val fresh = f.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith(CdcFilePrefix))
      .map(_.getPath)
      .filter(_.getName > lastName)
      .sortBy(_.getName)
    if (fresh.isEmpty) None
    else Some(CdcBatch(fresh.map(_.toString), fresh.last.toString))
  }
}
