package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry over the driver-generated fixture tables (TESTDATA.md).
  *
  * Scale note (100 TB): every table is read through `spark.read.parquet`,
  * so Catalyst/DataSource-V2 predicate pushdown, column pruning and
  * partition pruning apply unchanged when the path points at a large
  * partitioned dataset instead of a single local file. Nothing here
  * assumes single-file or single-partition input.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one fixture table as a DataFrame. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every fixture table as a temp view (for spark.sql queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
