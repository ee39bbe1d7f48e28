package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def fp(texts: (Long, String)*) =
    texts.toSeq.toDF("id", "t")
      .select(col("id"), TextAnalysis.winnowingFingerprints(col("t"), k = 3, window = 2).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap

  test("winnowing: identical docs share all fingerprints; edits keep most") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val edited = "w1 w2 w3 w4 w5 w6 CHANGED w8 w9 w10 w11 w12"
    val other = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12"
    val m = fp(1L -> base, 2L -> base, 3L -> edited, 4L -> other)
    assert(m(1L) == m(2L)) // deterministic & identical
    val overlapEdited = m(1L).intersect(m(3L)).size.toDouble / m(1L).size
    val overlapOther = m(1L).intersect(m(4L)).size.toDouble / m(1L).size
    assert(overlapEdited > 0.3, s"edited overlap $overlapEdited")
    assert(overlapOther == 0.0)
  }

  test("winnowing on docs shorter than k yields an empty sketch") {
    val m = fp(1L -> "a b")
    assert(m(1L).isEmpty)
  }

  test("winnowingNearDupPairs: exact dups score 1.0, edits land in the band, strangers absent") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val docs = Seq(
      1L -> base, 2L -> base,
      3L -> "w1 w2 w3 w4 w5 w6 CHANGED w8 w9 w10 w11 w12",
      4L -> "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12",
      5L -> "a b" // sub-k doc: empty sketch, never pairs
    ).toDF("doc_id", "text")
    val got = Dedup.winnowingNearDupPairs(docs, "doc_id", "text",
      k = 3, window = 2, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((1L, 2L)) == 1.0)
    assert(got.contains((1L, 3L)) && got((1L, 3L)) < 1.0 && got((1L, 3L)) > 0.2)
    assert(got((1L, 3L)) == got((2L, 3L))) // resemblance is sketch-determined
    assert(!got.keys.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!got.keys.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("winnowing pairs compose with dedupKeepBest (MOSS-based dedup end to end)") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val docs = Seq(
      (1L, base, 0.2), (2L, base, 0.9), // exact dups: higher score survives
      (3L, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10", 0.1) // unrelated singleton
    ).toDF("doc_id", "text", "quality")
    val pairs = Dedup.winnowingNearDupPairs(docs, "doc_id", "text",
      k = 3, window = 2, threshold = 0.5).select("doc_a", "doc_b")
    val kept = Dedup.dedupKeepBest(docs, "doc_id", pairs, "quality")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("winnowingNearDupPairs maxDf drops ubiquitous sketches with consistent denominators") {
    // fingerprint(s) of the shared boilerplate run appear in ALL 4 docs;
    // with maxDf = 3 those hot sketches vanish from counts AND sizes
    val docs = (1L to 4L).map(i =>
      (i, s"common1 common2 common3 common4 common5 unique${i}a unique${i}b unique${i}c"))
      .toDF("doc_id", "text")
    val uncut = Dedup.winnowingNearDupPairs(docs, "doc_id", "text",
      k = 3, window = 2, threshold = 0.01)
    val cut = Dedup.winnowingNearDupPairs(docs, "doc_id", "text",
      k = 3, window = 2, threshold = 0.01, maxDf = 3)
    assert(uncut.count() > 0) // shared boilerplate pairs everything
    // after the cut only sketches private to <=3 docs remain — the
    // all-shared grams are gone, so cross-doc overlap collapses
    assert(cut.count() < uncut.count())
  }
}
