package graft.state

import graft.cdc.{TableConfig, TableState}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Per-table pipeline state: the reference keeps one DynamoDB item per table
  * path with watermarks + config (/root/reference/DMSCDC_Controller.py:63-100,
  * DMSCDC_ProcessTable.py:85-89,118-122). Locally we keep one flat JSON file
  * per table. The store is tiny control-plane metadata (one item per table,
  * not per row), so a file-per-table layout shards trivially and stays
  * correct at 100 TB data scale — state volume scales with table count only.
  */
final case class TableItem(
    path: String,
    config: TableConfig = TableConfig(),
    state: TableState = TableState())

trait StateStore {
  /** C2: get existing item or create with reference-default values
    * (DMSCDC_Controller.py:76-100). */
  def upsertDefaults(path: String): TableItem
  def get(path: String): Option[TableItem]
  def put(item: TableItem): Unit
  /** C8: advance watermarks only after a successful load
    * (DMSCDC_ProcessTable.py:85-89,118-122). */
  def commitFullLoad(path: String, fullLoadDate: String): Unit =
    get(path).foreach(i => put(i.copy(state = i.state.copy(lastFullLoadDate = fullLoadDate))))
  def commitIncremental(path: String, lastFile: String): Unit =
    get(path).foreach(i => put(i.copy(state = i.state.copy(lastIncrementalFile = lastFile))))
  def all: Seq[TableItem]
}

/** One flat JSON object per table under `dir`. Atomic replace on write. */
final class JsonFileStateStore(dir: String) extends StateStore {
  private val root: Path = Paths.get(dir)
  Files.createDirectories(root)

  // Sanitizing alone is not injective (schema "a_b"/table "c" and schema
  // "a"/table "b_c" both sanitize to "a_b_c"); a short hash of the raw path
  // keeps distinct tables on distinct state files. The human-readable
  // prefix is capped (keeping the distinctive schema/table tail) so a deep
  // bucket prefix cannot push the filename past the 255-byte limit — the
  // digest carries the injectivity either way.
  private def fileFor(path: String): Path = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes(StandardCharsets.UTF_8))
    val h = digest.take(4).map(b => f"$b%02x").mkString
    val sanitized = path.replaceAll("[^A-Za-z0-9._-]", "_")
    val prefix = if (sanitized.length > 180) sanitized.takeRight(180) else sanitized
    root.resolve(prefix + s"-$h.json")
  }

  private def legacyFor(path: String): Path =
    root.resolve(path.replaceAll("[^A-Za-z0-9._-]", "_") + ".json")

  override def upsertDefaults(path: String): TableItem =
    get(path).getOrElse {
      val item = TableItem(path, TableConfig(), TableState.initial(path))
      put(item); item
    }

  override def get(path: String): Option[TableItem] = {
    val f = fileFor(path)
    val legacy = legacyFor(path)
    if (Files.exists(f)) {
      // Finish an interrupted migration: a crash between put() and the
      // legacy delete leaves both files, and all() would double-count.
      if (Files.exists(legacy) &&
          fromJson(new String(Files.readAllBytes(legacy), StandardCharsets.UTF_8)).path == path)
        Files.deleteIfExists(legacy)
      Some(fromJson(new String(Files.readAllBytes(f), StandardCharsets.UTF_8)))
    } else {
      // Pre-hash deployments named files "<sanitized>.json" (no digest).
      // Silently ignoring those would reset every committed watermark and
      // replay history, so migrate a matching legacy file in place. The
      // path check guards against a sanitize-collision sibling's file.
      if (!Files.exists(legacy)) None
      else {
        val item = fromJson(new String(Files.readAllBytes(legacy), StandardCharsets.UTF_8))
        if (item.path != path) None
        else { put(item); Files.deleteIfExists(legacy); Some(item) }
      }
    }
  }

  override def put(item: TableItem): Unit = {
    val tmp = Files.createTempFile(root, "state", ".tmp")
    Files.write(tmp, toJson(item).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, fileFor(item.path), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  override def all: Seq[TableItem] = {
    val listing = Files.list(root) // close it: the stream holds a directory fd
    val items =
      try listing.iterator().asScala
        .filter(_.toString.endsWith(".json")).toSeq.sortBy(_.toString)
        .map(p => p -> fromJson(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)))
      finally listing.close()
    // an interrupted migration can briefly leave a digest-named file AND
    // its legacy twin: one item per table, the canonical (digest) file wins
    items.groupBy(_._2.path).toSeq.sortBy(_._1).map { case (path, dupes) =>
      dupes.find(_._1 == fileFor(path)).map(_._2).getOrElse(dupes.head._2)
    }
  }

  // --- flat string-JSON codec (state is a flat string map; no dep needed) ---
  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
                case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
  private def toJson(i: TableItem): String = {
    val kv = Seq(
      "path" -> i.path,
      "primaryKey" -> i.config.primaryKeys.mkString(","),
      "partitionKey" -> i.config.partitionKeys.mkString(","),
      "activeFlag" -> i.config.active.toString,
      "replayGuard" -> i.config.replayGuard.toString,
      "mergeOnRead" -> i.config.mergeOnRead.toString,
      "patchUpdates" -> i.config.patchUpdates.toString,
      "updateWhen" -> i.config.updateWhen.getOrElse(""),
      "lastFullLoadDate" -> i.state.lastFullLoadDate,
      "lastIncrementalFile" -> i.state.lastIncrementalFile)
    kv.map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{\n  ", ",\n  ", "\n}\n")
  }
  private def fromJson(s: String): TableItem = {
    val re = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    // single-pass unescape: sequential String.replace corrupts adjacent
    // escapes (a literal backslash followed by 'n' round-trips as "\\n",
    // which a naive replace("\\n","\n") would mangle)
    def unesc(x: String): String = {
      val sb = new StringBuilder(x.length)
      var i = 0
      while (i < x.length) {
        if (x(i) == '\\' && i + 1 < x.length) {
          x(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'u' if i + 6 <= x.length &&
                x.substring(i + 2, i + 6).forall(c => Character.digit(c, 16) >= 0) =>
              sb.append(Integer.parseInt(x.substring(i + 2, i + 6), 16).toChar); i += 6
            case 'u' =>
              // truncated/malformed \u escape (hand-edited or torn file):
              // keep it literally instead of crashing the whole store
              sb.append("\\u"); i += 2
            case other => sb.append(other); i += 2
          }
        } else { sb.append(x(i)); i += 1 }
      }
      sb.toString
    }
    val m = re.findAllMatchIn(s).map(m => unesc(m.group(1)) -> unesc(m.group(2))).toMap
    def split(k: String) = m.getOrElse(k, "") match {
      case "" | "null" => Nil
      case v => v.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    }
    TableItem(
      m.getOrElse("path", ""),
      TableConfig(split("primaryKey"), split("partitionKey"),
        m.get("activeFlag").contains("true"),
        // absent in pre-guard state files → false (backward compatible)
        m.get("replayGuard").contains("true"),
        m.get("mergeOnRead").contains("true"),
        // absent → false, like the other opt-in flags; dropping it on a
        // restart would silently revert a patch-configured table to
        // whole-row latest-wins — NULL (= unchanged) columns would then
        // overwrite real lake values (the r9 advisor's data-corruption
        // case; round-trip pinned in StateStoreSpec)
        m.get("patchUpdates").contains("true"),
        // the conditional-merge guard text rides the state item like
        // patchUpdates (the r10 lesson): dropping it on restart would
        // silently revert a guarded table to unconditional latest-wins
        m.get("updateWhen").filter(_.nonEmpty)),
      TableState(
        m.getOrElse("lastFullLoadDate", TableState.EpochFullLoad),
        m.getOrElse("lastIncrementalFile", "")))
  }
}
