package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def target =
    Seq(("I", 1, "a", 10.0), ("I", 2, "b", 20.0), ("I", 3, "c", 30.0))
      .toDF("Op", "id", "name", "price")

  test("upsert + delete: latest version per key survives, deletes drop the key") {
    val changes = Seq(
      ("U", 1, "a2", 11.0, 1L), // update id 1
      ("D", 2, "b", 20.0, 1L),  // delete id 2
      ("I", 4, "d", 40.0, 1L)   // insert id 4
    ).toDF("Op", "id", "name", "price", "file_seq")
    val out = Merge.mergeCdc(target, changes, Seq("id"), Seq(col("id")))
      .orderBy("id").collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(out.toSeq == Seq(("U", 1, "a2"), ("I", 3, "c"), ("I", 4, "d")))
  }

  test("multi-op per key within one batch: file order then intra-file order wins") {
    val changes = Seq(
      ("U", 1, "v1", 1.0, 1L, 1L),
      ("U", 1, "v2", 2.0, 1L, 2L), // later in same file
      ("U", 1, "v3", 3.0, 2L, 1L)  // later file — final winner
    ).toDF("Op", "id", "name", "price", "file_seq", "pos")
    val seq = Merge.sequenceBatch(changes, Seq("id"), Seq(col("pos"))).drop("pos")
    val merged = Merge.applySequenced(target, seq, Seq("id"))
    val r = merged.filter($"id" === 1).collect()
    assert(r.length == 1 && r(0).getAs[String]("name") == "v3")
  }

  test("insert-then-delete of a brand-new key in one batch leaves no row") {
    val changes = Seq(
      ("I", 9, "x", 1.0, 1L, 1L),
      ("D", 9, "x", 1.0, 1L, 2L)
    ).toDF("Op", "id", "name", "price", "file_seq", "pos")
    val seq = Merge.sequenceBatch(changes, Seq("id"), Seq(col("pos"))).drop("pos")
    val merged = Merge.applySequenced(target, seq, Seq("id"))
    assert(merged.filter($"id" === 9).count() == 0)
  }

  test("schema evolution: new change column null-fills old target rows") {
    val changes = Seq(("U", 1, "a2", 11.0, "extra", 1L))
      .toDF("Op", "id", "name", "price", "note", "file_seq")
    val merged = Merge.mergeCdc(target, changes, Seq("id"), Seq(col("id")))
    assert(merged.columns.toSeq == Seq("Op", "id", "name", "price", "note"))
    val byId = merged.collect().map(r => r.getAs[Int]("id") -> r.getAs[String]("note")).toMap
    assert(byId(1) == "extra" && byId(2) == null && byId(3) == null)
  }

  test("idempotence: re-applying the same batch is a no-op") {
    val changes = Seq(("U", 1, "a2", 11.0, 1L), ("D", 2, "b", 0.0, 1L))
      .toDF("Op", "id", "name", "price", "file_seq")
    val once = Merge.mergeCdc(target, changes, Seq("id"), Seq(col("id")))
    val twice = Merge.mergeCdc(once, changes, Seq("id"), Seq(col("id")))
    assert(once.orderBy("id").collect().toSeq == twice.orderBy("id").collect().toSeq)
  }

  test("batch-split invariance: merging files one at a time == all at once") {
    val f1 = Seq(("U", 1, "a2", 11.0, 1L), ("I", 5, "e", 50.0, 1L))
      .toDF("Op", "id", "name", "price", "file_seq")
    val f2 = Seq(("D", 1, "a2", 11.0, 2L), ("U", 5, "e2", 55.0, 2L))
      .toDF("Op", "id", "name", "price", "file_seq")
    val atOnce = Merge.mergeCdc(target, f1.union(f2), Seq("id"), Seq(col("id")))
    val stepwise = Merge.mergeCdc(
      Merge.mergeCdc(target, f1, Seq("id"), Seq(col("id"))),
      f2.withColumn("file_seq", lit(1L)), Seq("id"), Seq(col("id")))
    assert(atOnce.orderBy("id").collect().toSeq == stepwise.orderBy("id").collect().toSeq)
  }

  test("reference parity: target-only columns drop when changes lack them") {
    // The reference's final select(inputfile.columns) drops columns that
    // exist only in the target (SURVEY.md §7.3 risk 3) — pinned here.
    val evolvedTarget = target.withColumn("note", lit("x"))
    val changes = Seq(("U", 1, "a2", 11.0, 1L))
      .toDF("Op", "id", "name", "price", "file_seq")
    val merged = Merge.mergeCdc(evolvedTarget, changes, Seq("id"), Seq(col("id")))
    assert(merged.columns.toSeq == Seq("Op", "id", "name", "price"))
  }

  test("insertOnly keeps only I rows; tagInitial adds Op='I'") {
    val changes = Seq(("I", 7, "g", 1.0), ("U", 1, "x", 2.0), ("D", 2, "y", 3.0))
      .toDF("Op", "id", "name", "price")
    assert(Merge.insertOnly(changes).collect().map(_.getInt(1)).toSeq == Seq(7))
    val snap = Seq((1, "a")).toDF("id", "name")
    val tagged = Merge.tagInitial(snap)
    assert(tagged.columns.contains("Op") &&
      tagged.select("Op").head().getString(0) == "I")
  }

  test("patchMerge: sequential partial patches compose, NULL means unchanged, deletes drop, later patch resurrects") {
    val patches = Seq(
      // id 1: file 1 patches only name, file 2 patches only price — BOTH stick
      ("U", 1, Some("a2"), Option.empty[Double], 1L, 1L),
      ("U", 1, Option.empty[String], Some(11.0), 2L, 1L),
      // id 2: deleted
      ("D", 2, Option.empty[String], Option.empty[Double], 1L, 1L),
      // id 3: delete then a later patch resurrects with the folded history
      ("D", 3, Option.empty[String], Option.empty[Double], 1L, 1L),
      ("U", 3, Some("c2"), Option.empty[Double], 2L, 1L)
    ).toDF("Op", "id", "name", "price", "file_seq", "pos")
    val out = Merge.patchMerge(target, patches, Seq("id"), Seq(col("pos")))
      .orderBy("id").collect()
      .map(r => (r.getAs[String]("Op"), r.getAs[Int]("id"),
        r.getAs[String]("name"), r.getAs[Double]("price")))
    assert(out.toSeq == Seq(
      ("U", 1, "a2", 11.0), // composed: file-1 name + file-2 price
      ("U", 3, "c2", 30.0)  // resurrected: patched name, target price kept
    ))
    // the same batch through whole-row latest-wins would ERASE file 1's
    // name patch on id 1 (the property patchMerge exists for)
    val wholeRow = Merge.mergeCdc(target, patches, Seq("id"), Seq(col("pos")))
      .filter($"id" === 1).collect()
    assert(wholeRow.length == 1 && wholeRow(0).getAs[String]("name") == null)
    // intra-file order: later pos wins the fold within one file
    val sameFile = Seq(
      ("U", 1, Some("x1"), Option.empty[Double], 1L, 1L),
      ("U", 1, Some("x2"), Option.empty[Double], 1L, 2L)
    ).toDF("Op", "id", "name", "price", "file_seq", "pos")
    val r2 = Merge.patchMerge(target, sameFile, Seq("id"), Seq(col("pos")))
      .filter($"id" === 1).collect()
    assert(r2.length == 1 && r2(0).getAs[String]("name") == "x2" &&
      r2(0).getAs[Double]("price") == 10.0)
  }

  test("conditional merge: guard gates updates only; deletes/inserts ride; winner folds first") {
    // target rows: 1 mutable, 2 locked, 3 locked
    val tgt = Seq(("I", 1, "open", 10.0), ("I", 2, "locked", 20.0),
      ("I", 3, "locked", 30.0)).toDF("Op", "id", "name", "price")
    val changes = Seq(
      ("U", 1, "open", 11.0, 1L, 1L),   // guard passes → updated
      ("U", 2, "hack", 99.0, 1L, 1L),   // guard fails → target kept
      ("D", 3, "locked", 0.0, 1L, 1L),  // delete applies regardless
      ("I", 4, "new", 40.0, 1L, 1L),    // insert applies regardless
      ("U", 5, "v1", 1.0, 1L, 1L),      // not-matched update = insert…
      ("U", 5, "v2", 2.0, 2L, 1L)       // …and the batch winner folds first
    ).toDF("Op", "id", "name", "price", "file_seq", "pos")
    val out = Merge.mergeConditional(tgt, changes, Seq("id"), Seq(col("pos")),
        updateWhen = col("t.name") =!= "locked")
      .orderBy("id").collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[String]("name"), r.getAs[Double]("price")))
    assert(out.toSeq == Seq(
      (1, "open", 11.0),   // updated
      (2, "locked", 20.0), // immutable — stale update rejected
      (4, "new", 40.0),    // inserted
      (5, "v2", 2.0)))     // inserted at the batch's FINAL image
    // a delete-then-reinsert of one key in one batch resolves to the winner
    val flip = Seq(("D", 1, "x", 0.0, 1L, 1L), ("I", 1, "re", 5.0, 2L, 1L))
      .toDF("Op", "id", "name", "price", "file_seq", "pos")
    val re = Merge.mergeConditional(tgt, flip, Seq("id"), Seq(col("pos")),
        updateWhen = lit(false)) // even a never-update guard: winner is an I
      .filter($"id" === 1).collect()
    // winner Op='I' on a MATCHED key with updateWhen=false keeps the target
    assert(re.length == 1 && re(0).getAs[String]("name") == "open")
  }

  test("conditional merge: NULL guard keeps the target row (SQL MERGE unknown semantics)") {
    // guard `c.price > t.price` with a NULL batch price: UNKNOWN, not false —
    // SQL MERGE falls through to keep, never drops the row
    val tgt = Seq(("I", 1, "a", Some(10.0)), ("I", 2, "b", Some(20.0)))
      .toDF("Op", "id", "name", "price")
    val changes = Seq(
      ("U", 1, "a2", Option.empty[Double], 1L, 1L), // NULL price → guard UNKNOWN
      ("U", 2, "b2", Some(25.0), 1L, 1L)            // guard true → updated
    ).toDF("Op", "id", "name", "price", "file_seq", "pos")
    val out = Merge.mergeConditional(tgt, changes, Seq("id"), Seq(col("pos")),
        updateWhen = col("c.price") > col("t.price"))
      .orderBy("id").collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[String]("name"), r.getAs[Double]("price")))
    assert(out.toSeq == Seq(
      (1, "a", 10.0),  // kept, NOT lost and NOT updated
      (2, "b2", 25.0)))
  }
}
