package graft

import graft.operators.Cdc
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def spansOf(text: String, minSize: Int = 32, avgBits: Int = 6,
      maxSize: Int = 256) =
    Cdc.chunkSpans(text.getBytes("UTF-8"), minSize, avgBits, maxSize)

  test("chunks tile the document exactly (concatenation invariance)") {
    Tables(spark, sf, "documents").limit(100)
      .select(col("doc_id"), col("text")).collect().foreach { r =>
        val text = r.getString(1)
        val bytes = text.getBytes("UTF-8")
        val (offs, lens, _) = spansOf(text)
        assert(offs.zip(lens).map { case (o, l) => o + l }.toSeq ===
          (offs.drop(1) :+ bytes.length).toSeq, s"doc ${r.getLong(0)}: gaps/overlap")
        assert(offs.headOption.forall(_ == 0))
        if (bytes.nonEmpty) assert(offs.nonEmpty)
      }
  }

  test("size bounds hold: every chunk in [minSize, maxSize] except the last") {
    Tables(spark, sf, "documents").limit(100).select(col("text")).collect().foreach { r =>
      val (_, lens, _) = spansOf(r.getString(0))
      lens.dropRight(1).foreach { l => assert(l >= 32 && l <= 256, s"len $l") }
      lens.lastOption.foreach { l => assert(l >= 1 && l <= 256, s"last len $l") }
    }
  }

  test("boundary locality: a suffix edit leaves earlier chunks intact") {
    // the CDC selling point vs fixed windows: boundaries before the
    // edit depend only on bytes before it, so shared prefixes produce
    // identical chunk (offset, fp) prefixes up to the last cut before
    // the edit point
    val base = Tables(spark, sf, "documents").limit(20)
      .select(col("text")).collect().map(_.getString(0))
    base.foreach { text =>
      val edited = text + " zzz appended tail content that changes everything after"
      val (o1, l1, f1) = spansOf(text)
      val (o2, _, f2) = spansOf(edited)
      // every chunk of the original except possibly the LAST (the tail
      // chunk absorbs the appended bytes) must reappear unchanged
      val keep = math.max(o1.length - 1, 0)
      assert(o2.take(keep).toSeq === o1.take(keep).toSeq)
      assert(f2.take(keep).toSeq === f1.take(keep).toSeq)
      assert(l1.sum === text.getBytes("UTF-8").length)
    }
  }

  test("determinism and null/empty handling in the declared table") {
    val docs = Seq((1L, "a" * 200), (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("doc_id", "text")
    val rows = Cdc.chunkTable(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.forall(_._1 == 1L), "null and empty text yield no chunks")
    assert(rows.nonEmpty)
    val again = Cdc.chunkTable(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq === again.toSeq)
  }

  test("dedup stats: exact copies are fully shared, unique docs are not") {
    val unique = "q w e r t y u i o p " * 20
    val docs = Seq((1L, unique), (2L, unique), (3L, "z x c v b n m l k j " * 20))
      .toDF("doc_id", "text")
    val stats = Cdc.chunkDedupStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // docs 1 and 2 are byte-identical: every chunk appears in >= 2 docs
    assert(stats(1L)._3 === 1.0)
    assert(stats(2L)._3 === 1.0)
    // doc 3 shares nothing
    assert(stats(3L)._2 === 0L)
    assert(stats(3L)._3 === 0.0)
  }

  test("near-copy with a local edit still shares most bytes (the CDC property)") {
    val base = ("the quick brown fox jumps over the lazy dog again and again " * 10).trim
    // splice an insertion into the middle — fixed windows would shift
    // every downstream block; CDC re-aligns within a few chunks
    val mid = base.length / 2
    val edited = base.substring(0, mid) + " INSERTED-EDIT " + base.substring(mid)
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val stats = Cdc.chunkDedupStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(stats(1L) > 0.5, s"base shared_frac ${stats(1L)} should be > 0.5")
    assert(stats(2L) > 0.5, s"edited shared_frac ${stats(2L)} should be > 0.5")
  }
}
