package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in the [[Q]] registry (one `Q` per declared operator
  * from SURVEY §2b); this object is a thin adapter over it.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The composed pretraining pipeline with the near-dup stage
    * (l28) — exact dedup → 3-gram-Jaccard pairs closed into transitive
    * components (min-id survivor) → quality/repetition gates →
    * benchmark decontamination → content-hash split → per-(split,
    * source) stats — exercises scans, hash aggregation, the iterative
    * component closure, window-free row-local gates, shingle
    * equi-joins, anti-joins, and a final grouped aggregate in one
    * declared query. */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.LlmQueries.l28PipelineNearDup.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Q.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Q.all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap

  /** What Bench times per name: the production operator shape. Equal to
    * [[queries]] except where a query's DECLARED form is an invariant
    * wrapper (operator + in-plan truth check, for the driver's DuckDB
    * gate) — there the benchmark times the bare operator, so timings
    * stay comparable round over round and to BASELINE.md. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    Q.all.map(q => q.name -> q.bench.getOrElse(q.run)).toMap
}
