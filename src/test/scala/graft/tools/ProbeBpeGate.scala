package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for BPE merge training (r8): incremental pair-count
  * maintenance vs the pre-r8 per-round full re-derivation, at a
  * vocabulary large enough that per-round WORK dominates per-round job
  * overhead (the sf0.01 corpus vocabulary is a few thousand words —
  * there, both variants are scheduling-bound and indistinguishable).
  * The claim: re-derive pays Θ(vocabulary explode) per round; the
  * incremental trainer pays (contains-scan + affected-words explode +
  * pair-table fold), so its marginal round cost stays flat as the
  * vocabulary grows while re-derive's grows linearly.
  * Scratch tool; results in SCALE.md.
  *
  * Usage: Test/runMain graft.tools.ProbeBpeGate [nWords] [rounds]
  */
object ProbeBpeGate {
  /** The pre-r8 trainer verbatim (argmax re-derives all pairs each
    * round) — kept here as the comparison baseline. */
  private def trainRederive(words0: DataFrame, numMerges: Int): Seq[(String, String)] = {
    var words = words0.localCheckpoint(true)
    val out = Seq.newBuilder[(String, String)]
    var rank = 1
    while (rank <= numMerges) {
      val top = words
        .select(col("freq"), filter(split(col("s"), "  "), x => x =!= "").as("t"))
        .where(size(col("t")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(col("t")) - 1),
          i => struct(element_at(col("t"), i).as("l"),
            element_at(col("t"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) rank = numMerges + 1
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        out += ((l, r)); rank += 1
        if (rank <= numMerges)
          words = words.withColumn("s",
            replace(col("s"), lit(" " + l + "  " + r + " "), lit(" " + l + r + " ")))
            .localCheckpoint(true)
      }
    }
    out.result()
  }

  def main(args: Array[String]): Unit = {
    val nWords = if (args.length > 0) args(0).toInt else 500000
    val rounds = if (args.length > 1) args(1).toInt else 24
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Synthetic Zipf-ish corpus as a (word) stream: words drawn from a
    // base-7 alphabet so pair statistics are dense and merges keep
    // finding work at every round.
    val docs = spark.range(nWords)
      .select((col("id") % 13 + 1).cast("long").as("freq"),
        // base-7 digits of id spell the word → nWords distinct words
        concat_ws("", transform(sequence(lit(0), lit(6) + (col("id") % 3).cast("int")),
          i => element_at(split(lit("a,b,c,d,e,f,g"), ","),
            (pmod(floor(col("id") / pow(lit(7.0), i)).cast("long"), lit(7)) + 1).cast("int")))).as("w"))
      .select(col("w"), explode(sequence(lit(1), col("freq"))).as("__i"))
      .select(lit(0L).as("doc_id"), col("w").as("text"))
    val wordTable = docs.groupBy("text").agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        concat(lit("  "), regexp_replace(col("text"), "(.)", "$1  ")).as("s"))
      .localCheckpoint(true)
    println(s"[bpe] vocab=${wordTable.count()} rounds=$rounds")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // docs-level API for the incremental path (same word table inside)
    val docsForApi = wordTable
      .select(explode(sequence(lit(1), col("freq"))).as("__i"),
        regexp_replace(col("s"), " ", "").as("w"))
      .select(lit(0L).as("doc_id"), col("w").as("text"))
      .localCheckpoint(true)

    val tInc1 = time(graft.ops.Bpe.trainMerges(docsForApi, "text", rounds / 2): Unit)
    val tInc2 = time(graft.ops.Bpe.trainMerges(docsForApi, "text", rounds): Unit)
    println(f"[bpe] incremental: t(${rounds / 2})=$tInc1%.1f s t($rounds)=$tInc2%.1f s " +
      f"marginal=${(tInc2 - tInc1) / (rounds / 2)}%.3f s/round")
    val tRe1 = time(trainRederive(wordTable, rounds / 2): Unit)
    val tRe2 = time(trainRederive(wordTable, rounds): Unit)
    println(f"[bpe] re-derive:   t(${rounds / 2})=$tRe1%.1f s t($rounds)=$tRe2%.1f s " +
      f"marginal=${(tRe2 - tRe1) / (rounds / 2)}%.3f s/round")
    spark.stop()
  }
}
