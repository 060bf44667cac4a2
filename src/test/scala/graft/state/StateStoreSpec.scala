package graft.state

import graft.cdc.{TableConfig, TableState}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StateStoreSpec extends AnyFunSuite {

  private def newStore = new JsonFileStateStore(Files.createTempDirectory("state").toString)

  test("upsertDefaults creates the reference's default item exactly once") {
    val store = newStore
    val item = store.upsertDefaults("/raw/db/table")
    assert(item.config == TableConfig())
    assert(item.state.lastFullLoadDate == "1900-01-01 00:00:00")
    assert(item.state.lastIncrementalFile == "/raw/db/table/0.parquet")
    // second call returns the stored item, not fresh defaults
    store.commitIncremental("/raw/db/table", "/raw/db/table/2026.parquet")
    assert(store.upsertDefaults("/raw/db/table").state.lastIncrementalFile
      == "/raw/db/table/2026.parquet")
  }

  test("round-trips config, composite keys, and hostile characters") {
    val store = newStore
    val item = TableItem("/raw/x/y",
      TableConfig(Seq("id", "region"), Seq("dt"), active = true),
      TableState("2026-08-12 00:00:00", "/raw/x/y/2026\"weird\\name\n.parquet"))
    store.put(item)
    assert(store.get("/raw/x/y").contains(item))
    assert(store.all == Seq(item))
    // every opt-in flag survives a restart (a dropped patchUpdates would
    // silently revert a table to whole-row merges — NULL columns then
    // clobber real lake values)
    val flagged = TableItem("/raw/x/z",
      TableConfig(Seq("id"), Nil, active = true, replayGuard = true,
        mergeOnRead = false, patchUpdates = true),
      TableState("2026-08-12 00:00:00", "f1"))
    store.put(flagged)
    assert(store.get("/raw/x/z").contains(flagged),
      "replayGuard/mergeOnRead/patchUpdates must round-trip through JSON")
    // the conditional-merge guard TEXT survives too (hostile chars and
    // all) — a dropped guard would silently revert to unconditional
    // latest-wins
    val guarded = TableItem("/raw/x/w",
      TableConfig(Seq("id"), Nil, active = true,
        updateWhen = Some("c.ts > t.ts AND t.status <> 'F\"\\n'")),
      TableState("2026-08-12 00:00:00", "f1"))
    store.put(guarded)
    assert(store.get("/raw/x/w").contains(guarded),
      "updateWhen must round-trip through JSON")
  }

  test("watermark commits are independent and ordered") {
    val store = newStore
    store.upsertDefaults("/t")
    store.commitFullLoad("/t", "2026-01-01 00:00:00")
    store.commitIncremental("/t", "/t/20260101.parquet")
    val s = store.get("/t").get.state
    assert(s == TableState("2026-01-01 00:00:00", "/t/20260101.parquet"))
  }

  test("legacy pre-hash state files are migrated, not orphaned") {
    val dir = Files.createTempDirectory("state")
    val store = new JsonFileStateStore(dir.toString)
    store.upsertDefaults("/raw/db/t")
    store.commitIncremental("/raw/db/t", "/raw/db/t/42.parquet")
    // simulate a pre-digest deployment: strip the digest suffix off the file
    import scala.jdk.CollectionConverters._
    val hashed = Files.list(dir).iterator().asScala.find(_.toString.endsWith(".json")).get
    val legacy = dir.resolve("_raw_db_t.json")
    Files.move(hashed, legacy)
    val fresh = new JsonFileStateStore(dir.toString)
    // a sanitize-collision sibling must NOT claim the legacy file...
    assert(fresh.get("/raw/db_t").isEmpty)
    assert(Files.exists(legacy))
    // ...but the true owner reads it and migrates it to the digest name
    assert(fresh.get("/raw/db/t").get.state.lastIncrementalFile == "/raw/db/t/42.parquet")
    assert(!Files.exists(legacy))
    assert(fresh.get("/raw/db/t").get.state.lastIncrementalFile == "/raw/db/t/42.parquet")
  }

  test("interrupted migration (both files present) yields one item, then heals") {
    val dir = Files.createTempDirectory("state")
    val store = new JsonFileStateStore(dir.toString)
    store.upsertDefaults("/raw/db/t")
    // simulate the crash window: canonical file written, legacy not deleted
    import scala.jdk.CollectionConverters._
    val hashed = Files.list(dir).iterator().asScala.find(_.toString.endsWith(".json")).get
    val legacy = dir.resolve("_raw_db_t.json")
    Files.copy(hashed, legacy)
    val fresh = new JsonFileStateStore(dir.toString)
    assert(fresh.all.size == 1, "duplicate items for one table after torn migration")
    fresh.get("/raw/db/t") // the read heals the leftover
    assert(!Files.exists(legacy))
  }

  test("hostile state-file contents degrade gracefully") {
    val dir = Files.createTempDirectory("state")
    val store = new JsonFileStateStore(dir.toString)
    // truncated unicode escape must not crash the parse (built by concat:
    // a literal backslash-u in Scala source is itself an escape)
    val torn = "{\"path\": \"/x\", \"lastFullLoadDate\": \"bad" + '\\' + "u00\"}"
    Files.write(dir.resolve("bad-00000000.json"), torn.getBytes("UTF-8"))
    assert(store.all.nonEmpty) // parses, escape kept literally
    // very long table paths still map to a writable filename
    val long = "/raw/" + ("deeply/nested/prefix/" * 20) + "schema/table"
    store.upsertDefaults(long)
    assert(store.get(long).exists(_.path == long))
  }

  test("commit on unknown table is a no-op, not a crash") {
    val store = newStore
    store.commitFullLoad("/missing", "2026-01-01 00:00:00")
    assert(store.get("/missing").isEmpty)
  }
}
