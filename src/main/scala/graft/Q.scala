package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator-query from SURVEY.md §2b.
  *
  * @param name   stable key (drives `SparkEntry.queries` and the driver's
  *               CORRECTNESS report)
  * @param run    Spark implementation; `dir` is an sf fixture directory
  * @param oracle equivalent DuckDB SQL over the same fixture tables; None for
  *               operators that SQL can't express (streaming, LSH internals) —
  *               those get a rows-only check plus a ScalaTest oracle
  * @param bench  the PRODUCTION operator shape for Bench to time, when it
  *               differs from `run`. Approximate operators (ANN, sketches)
  *               declare `run` as an INVARIANT query — the operator composed
  *               with its in-plan truth check (planted-duplicate recall,
  *               read-path parity, tolerance vs the exact aggregate) so the
  *               driver's DuckDB gate can verify it with a trivially-SQL
  *               oracle — while the benchmark keeps timing the bare operator
  *               a deployment actually runs, comparable round over round.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    bench: Option[(SparkSession, String) => DataFrame] = None)

object Q {
  /** All declared queries, in SURVEY §2b group order. */
  def all: Seq[Q] =
    graft.queries.CoreQueries.all ++
      graft.queries.JoinQueries.all ++
      graft.queries.AggQueries.all ++
      graft.queries.WindowQueries.all ++
      graft.queries.ScalarQueries.all ++
      graft.queries.UdxQueries.all ++
      graft.plans.PlanPipeline.all ++
      graft.operators.LlmQueries.all ++
      graft.streaming.WindowBatchQueries.all
}
