package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities.
  *
  * AQE's runtime skew splitting covers sort-merge joins; these helpers
  * cover the cases AQE does not: aggregations whose partial state is
  * itself heavy (large per-key maps), and broadcast-ineligible joins
  * against a skewed key distribution.
  */
object Skew {

  /** Key-distribution diagnostics — the pre-flight that decides whether a
    * join/agg key needs salting or AQE skew handling before a 100 TB run
    * commits to a plan: per-key counts reduced to corpus-level shape
    * metrics (key count, row count, heaviest key's rows and share, mean
    * rows per key). One partial-aggregated exchange on the key plus one
    * scalar aggregation over the (much smaller) per-key count table; the
    * divisions are single IEEE ops on exact integer counts, so the
    * numbers are engine-exact. A `top_share` far above `1 / n_keys`
    * flags the salting candidates. Output: one row. */
  def keyStats(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("__n"))
    counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("__n")).as("n_rows"),
      max(col("__n")).as("max_key_rows"),
      (max(col("__n")).cast("double") / sum(col("__n")).cast("double"))
        .as("top_share"),
      (sum(col("__n")).cast("double") / count(lit(1)).cast("double"))
        .as("mean_key_rows"))
  }

  /** Two-phase salted aggregation: groupBy (key, salt) partial-aggregates
    * into `salts` shards per key, then merges shards. Use when one key
    * dominates the shuffle (e.g. counting a heavy-hitter event type at
    * 100 TB): phase 1 spreads the hot key over `salts` reducers.
    *
    * `aggs` supplies (partial, merge) column pairs over an alias, e.g.
    * count → (count(*), sum). */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int = 16): DataFrame = {
    require(salts > 0)
    df.withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("n"))
  }

  /** Salted sum in exact decimal (shards then merges — result identical to
    * a direct sum because decimal addition is associative). Casts through
    * the WIDEST decimal (38 digits): a narrower one would overflow to null
    * under non-ANSI mode and silently drop rows from the sum. */
  def saltedSumDecimal(df: DataFrame, keys: Seq[String], valueCol: Column,
                       scale: Int, salts: Int = 16): DataFrame = {
    require(salts > 0)
    val dec = valueCol.cast(org.apache.spark.sql.types.DecimalType(38, scale))
    df.withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
      .withColumn("__v", dec)
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col("__v")).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).cast("double").as("total"))
  }

  /** Salted join for a skewed fact against a small-but-not-broadcastable
    * dimension: the fact side gets a random salt, the dim side explodes to
    * all salt values — each (key, salt) shard joins independently. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int = 16): DataFrame = {
    require(salts > 0)
    val saltedFact = fact.withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
