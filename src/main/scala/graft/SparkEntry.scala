package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every SURVEY.md §2 operator is exposed as a named query over the
  * `/root/testdata/<sf>/` parquet tables, each with an equivalent DuckDB
  * oracle in [[oracleSql]]. Query families:
  *  - `cdc_*`    — the reference's CDC merge semantics on a deterministic
  *    change fixture ([[graft.queries.CdcQueries]]);
  *  - `rel_*`    — scans/filters/joins/aggregates/windows/unions
  *    ([[graft.queries.RelationalQueries]]);
  *  - `events_*` — windowed/JSON/gap analytics on the event stream;
  *  - `dedup_*`  — exact, MinHash+LSH, SimHash, n-gram Jaccard dedup;
  *  - `sim_*`    — brute-force and LSH-bucketed cosine kNN / near-dup;
  *  - `text_*`   — token stats, quality, language-ID, fingerprints;
  *  - `mm_*`     — multimodal binary columns with stubbed decode.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("cdc_merge")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CdcQueries.queries ++ RelationalQueries.queries ++ EventQueries.queries ++
      DedupQueries.queries ++ SimilarityQueries.queries ++ TextQueries.queries ++
      MultimodalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CdcQueries.oracles ++ RelationalQueries.oracles ++ EventQueries.oracles ++
      DedupQueries.oracles ++ SimilarityQueries.oracles ++ TextQueries.oracles ++
      MultimodalQueries.oracles
}
