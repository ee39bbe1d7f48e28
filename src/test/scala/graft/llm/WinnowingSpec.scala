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
}
