package graft

/** Spill-path safety: the 100 TB mandate claims every operator is
  * "spill-safe by construction" because it rides Spark aggregates and
  * joins — but no spec had ever EXERCISED the degraded paths, so the
  * claim was architectural, not tested (the r9 verdict's gap #5).
  *
  * Two degradations, forced via session conf for the duration of a run:
  *
  *   - `spark.sql.objectHashAggregate.sortBased.fallbackThreshold = 1`:
  *     every ObjectHashAggregate (the operator that executes typed
  *     imperative aggregates — TopKAgg, TopKScreenAgg, collect_list)
  *     abandons hash mode after ONE group and falls back to sort-based
  *     aggregation, which SERIALIZES aggregation buffers between
  *     partial and final — the code path a memory-pressured executor
  *     takes, where a buggy serializeAggregateBufferInPlace silently
  *     corrupts results.
  *   - `spark.sql.windowExec.buffer.spill.threshold = 128` and
  *     `spark.sql.sortMergeJoinExec.buffer.spill.threshold = 128`:
  *     window-frame buffers and sort-merge-join match buffers spill to
  *     disk every 128 rows, exercising the ExternalAppendOnlyUnsafeRow
  *     spill-merge path in the rank windows and buffered joins. (The
  *     core `spark.shuffle.spill.numElementsForceSpillThreshold` would
  *     degrade every sorter but is a STATIC conf — not settable on a
  *     live session, so the SQL-layer thresholds carry the spill
  *     coverage here.)
  *
  * The law: bit-identical results in the degraded session. Queries
  * chosen for their buffer machinery: l13 (TopKScreenAgg's
  * branch-and-bound screen buffers), l14 (TopKAgg primitive heaps), d7
  * (collect_list nesting), h2 (Aggregator-based UDAF).
  */
class SpillSpec extends SparkSpec {

  private val degraded = Seq(
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "1",
    "spark.sql.windowExec.buffer.spill.threshold" -> "128",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "128")

  private def withConf[A](pairs: Seq[(String, String)])(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf).collect()
      .map(_.toString).sorted.toSeq

  test("sort-based agg fallback + forced shuffle spills leave results bit-identical") {
    // l39/l41: the reconstruction tier — paragraphDedup's rebuild and
    // windowDedup's bad-starts collection both ride collect_list
    // through ObjectHashAggregate, and l41 adds the native excise
    // expression downstream of the degraded aggregate
    val names = Seq("l13_lsh_topk", "l14_ivf_topk", "d7_collect_nested",
      "h2_udaf_sumsquares", "l39_paragraph_dedup", "l41_window_dedup")
    val normal = names.map(n => n -> rows(n)).toMap
    // the degraded config must actually reach an ObjectHashAggregate —
    // otherwise the fallback threshold is a no-op and this spec proves
    // nothing. l14's rank is size-dispatched (rankTopK routes to the
    // WINDOW form below WindowTopKMaxCorpus, so at spec scale it never
    // aggregates), but l13's code screen runs TopKScreenAgg + TopKAgg
    // through ObjectHashAggregate at EVERY scale, and d7's collect_list
    // nesting is ObjectHashAggregate by construction.
    for (n <- Seq("l13_lsh_topk", "d7_collect_nested")) {
      val plan = SparkEntry.queries(n)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("ObjectHashAggregate"),
        s"expected an ObjectHashAggregate in $n's plan:\n${plan.take(2000)}")
    }
    withConf(degraded) {
      for (n <- names)
        assert(rows(n) == normal(n), s"$n changed under the spill config")
    }
  }
}
