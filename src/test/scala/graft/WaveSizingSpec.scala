package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Laws for [[Similarity.denseShuffleSides]] — the in-engine form of the
  * per-regime AQE advisory split (BENCH_LOCAL.md round-10/11): identity
  * below one 64 MB wave, explicit cores×waves repartition above it,
  * results untouched either way. In package graft.operators to reach the
  * private[operators] helper directly. */
class WaveSizingSpec extends SparkSpec {

  test("below one 64 MB wave the inputs come back untouched (identical plan)") {
    val emb = Tables(spark, sf, "embeddings")
      .select(col("vec_id").as("k"), col("embedding"))
    // tiny estimate: far under cores × 64 MB
    val (a, b) = Similarity.denseShuffleSides(emb, emb, Seq("k"), 1000L, 100)
    // the helper must return the VERY SAME frames — not equivalent ones —
    // so downstream plans are byte-identical to the pre-sizing engine
    assert(a eq emb, "query side must be returned untouched")
    assert(b eq emb, "corpus side must be returned untouched")
  }

  test("above the wave threshold: explicit repartition on the join keys, derived count, rows identical") {
    import spark.implicits._
    val cores = spark.sparkContext.defaultParallelism
    // keep the join a shuffle join: an AQE broadcast conversion would
    // local-read the streamed side and change its partition count,
    // which is exactly the physical property this test pins
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try testBody(cores)
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
  }

  private def testBody(cores: Int): Unit = {
    import spark.implicits._
    val df = (0L until 2000L).map(i => (i % 97, i)).toDF("k", "v")
    // force engagement with a synthetic estimate: 1e9 rows × 448 B
    // ≈ 417 GB ≫ cores × 64 MB; derived tasks hit the 32× cores cap
    val (a, b) = Similarity.denseShuffleSides(df, df, Seq("k"), 1_000_000_000L, 448)
    assert(!(a eq df) && !(b eq df))
    val joined = a.join(b, Seq("k"))
    // the sized sides carry HashPartitioning(k, 32 × cores): the join
    // reuses it (no AQE coalescing of an explicit-count repartition),
    // so the join output keeps exactly that partition count
    assert(joined.rdd.getNumPartitions == 32 * cores,
      s"expected ${32 * cores} partitions, got ${joined.rdd.getNumPartitions}")
    // sizing is physical only — the join result is row-identical
    val plain = df.join(df, Seq("k")).count()
    assert(joined.count() == plain)
    // mid-regime: the derived count follows ceil(estBytes / 16 MB)
    // before the cap — 200k rows × 448 B ≈ 85.4 MB... use a 6-wave
    // estimate: 6 × cores × 16 MB worth of rows
    val estRows = (6L * cores * 16 * 1024 * 1024) / 448
    val (c, d) = Similarity.denseShuffleSides(df, df, Seq("k"), estRows, 448)
    val expected = math.max(
      math.ceil(estRows.toDouble * 448 / (16d * 1024 * 1024)), 4.0 * cores).toInt
    assert(c.join(d, Seq("k")).rdd.getNumPartitions == expected)
  }
}
