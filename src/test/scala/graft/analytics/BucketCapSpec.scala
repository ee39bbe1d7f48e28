package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Pins for the round-19 map-side bucket pre-cut (VERDICT r18 #1): the
  * capped form must be BYTE-IDENTICAL to the plain rank window it
  * replaced (the containment argument makes the pre-cut exact), the
  * observed drop metric must stay exact, and the whole point — the
  * saturated bucket's shuffle input is bounded at cap × map partitions
  * instead of the full bucket — must hold in the EXECUTED plan's
  * shuffle-write metrics, not just in argument.
  */
class BucketCapSpec extends SparkSpec {

  /** The r18 semantics: one rank window over the uncut input. */
  private def referenceCap(df: DataFrame, bucketCols: Seq[String],
                           orderCols: Seq[String], cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(bucketCols.map(col): _*).orderBy(orderCols.map(col): _*)
    df.withColumn("_arrival", row_number().over(w))
      .filter(col("_arrival") <= cap).drop("_arrival")
  }

  /** Adversarial frame: one saturated bucket (identical key for 40% of
    * rows), several warm buckets, a long tail of singletons, spread
    * over `parts` input partitions in id order (so every partition
    * holds a slice of the hot bucket).
    */
  private def fixture(n: Int, parts: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map { i =>
      val bucket =
        if (i % 5 < 2) 0L // saturated
        else if (i % 5 == 2) (i % 7).toLong + 1 // warm
        else 1000L + i // singleton
      (i.toLong, bucket % 4, bucket, s"payload_$i")
    }.toDF("id", "band", "bh", "payload").repartition(parts, col("id"))
  }

  test("preCut + window is byte-identical to the plain rank window (containment)") {
    for (cap <- Seq(1, 3, 17); parts <- Seq(1, 7)) {
      val df = fixture(400, parts)
      val got = BucketCap.capByRank(df, Seq("band", "bh"), Seq("id"), cap,
        s"graft.test.bcap.$cap.$parts")
      val want = referenceCap(df, Seq("band", "bh"), Seq("id"), cap)
      assert(rowsOf(got) == rowsOf(want),
        s"cap=$cap parts=$parts: pre-cut changed the capped result")
      assert(got.columns.toSeq == df.columns.toSeq,
        "capByRank leaked an internal column")
    }
  }

  test("preCut flush path (tiny maxTrackedRows) stays exact — flushes only weaken the cut") {
    val df = fixture(400, 5)
    val pre = BucketCap.preCut(df, Seq("band", "bh"), Seq("id"), 3, "_pd",
      maxTrackedRows = 8)
    // kept rows ⊇ the global first-3 of every bucket, and total drops
    // are conserved: window-finishing over the flushed pre-cut equals
    // the reference exactly
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bh")).orderBy(col("id"))
    val finished = pre.withColumn("_arrival", row_number().over(w))
      .filter(col("_arrival") <= 3).drop("_arrival", "_pd")
    assert(rowsOf(finished) == rowsOf(referenceCap(df, Seq("band", "bh"), Seq("id"), 3)))
    // drop conservation: map-side drops + rows surviving to the window
    // = input rows
    val agg = pre.agg(sum(col("_pd")), count(lit(1))).head()
    assert(agg.getLong(0) + agg.getLong(1) == 400L,
      s"pre-cut lost rows: ${agg.getLong(0)} dropped + ${agg.getLong(1)} kept != 400")
  }

  test("observed dropped_rows metric is exact: map-side drops + window drops = total past cap") {
    val df = fixture(400, 7)
    var observed = -1L
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             d: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name == "graft.test.bcap.metric") observed = row.getLong(0)
        }
      override def onFailure(f: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      BucketCap.capByRank(df, Seq("band", "bh"), Seq("id"), 3,
        "graft.test.bcap.metric").count()
      // bucket sizes: per (band, bh) count in the fixture
      val expect = df.groupBy("band", "bh").count()
        .agg(sum(greatest(col("count") - 3L, lit(0L)))).head().getLong(0)
      val deadline = System.currentTimeMillis() + 30000
      while (observed < 0 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(observed == expect,
        s"dropped_rows metric $observed != true past-cap total $expect")
    } finally spark.listenerManager.unregister(listener)
  }

  test("string order cols sort by UTF-8 bytes, not UTF-16 code units (ADVICE r19)") {
    import spark.implicits._
    // "zz" < U+E000 < U+1F600 in UTF-8 (Spark's order) but
    // "zz" < U+1F600 < U+E000 in UTF-16 code units (Java's String
    // order: the emoji's lead surrogate 0xD83D sorts below 0xE000).
    // With cap 2 on one partition the pre-cut itself picks the kept
    // set, so a Java-ordered comparator would keep {zz, emoji} while
    // the window's order keeps {zz, U+E000} — the silent divergence
    // the per-type comparator closes.
    val df = Seq(("😀", 1), ("", 2), ("zz", 3))
      .toDF("s", "payload").withColumn("bh", lit(0L)).repartition(1)
    val got = BucketCap.capByRank(df, Seq("bh"), Seq("s"), 2, "graft.test.bcap.utf8")
    val want = referenceCap(df, Seq("bh"), Seq("s"), 2)
    assert(rowsOf(got) == rowsOf(want), "UTF-16 comparator divergence")
    assert(got.select("s").as[String].collect().toSet == Set("zz", ""))
  }

  test("binary order cols compare unsigned-lexicographic and match the window (ADVICE r19)") {
    import spark.implicits._
    // 0x80 as a signed byte is -128 (below 0x01); Spark's binary order
    // is unsigned, so 0x01 < 0x7f < 0x80. The r19 Comparable cast threw
    // ClassCastException mid-job on BinaryType order cols.
    val df = Seq(Array[Byte](0x80.toByte), Array[Byte](0x01), Array[Byte](0x7f))
      .toDF("b").withColumn("bh", lit(0L)).repartition(1)
    val got = BucketCap.capByRank(df, Seq("bh"), Seq("b"), 2, "graft.test.bcap.bin")
    val want = referenceCap(df, Seq("bh"), Seq("b"), 2)
    // hex-project for the comparison: Row equality on Array[Byte] is
    // reference equality
    assert(rowsOf(got.select(hex(col("b")).as("h"), col("bh")))
      == rowsOf(want.select(hex(col("b")).as("h"), col("bh"))))
    assert(got.select("b").as[Array[Byte]].collect().map(_.head & 0xff).toSet
      == Set(0x01, 0x7f))
  }

  test("double order cols treat -0.0 and 0.0 as EQUAL, like SQL (ADVICE r19)") {
    import spark.implicits._
    // Java's Double.compareTo orders -0.0 < 0.0; SQL treats them equal
    // and falls through to the tiebreaker. With cap 1 on one partition
    // the pre-cut picks the kept row itself: a Java-ordered comparator
    // keeps (d=-0.0, id=2) while the window's order keeps (0.0, id=1).
    val df = Seq((0.0d, 1L), (-0.0d, 2L), (1.0d, 3L))
      .toDF("d", "id").withColumn("bh", lit(0L)).repartition(1)
    val got = BucketCap.capByRank(df, Seq("bh"), Seq("d", "id"), 1, "graft.test.bcap.zero")
    val want = referenceCap(df, Seq("bh"), Seq("d", "id"), 1)
    assert(rowsOf(got) == rowsOf(want), "-0.0 < 0.0 comparator divergence")
    assert(got.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("unsupported order-col types fail loud at plan build, not mid-job (ADVICE r19)") {
    import spark.implicits._
    val df = Seq((Seq(1, 2), 0L)).toDF("arr", "bh")
    val e = intercept[IllegalArgumentException] {
      BucketCap.preCut(df, Seq("bh"), Seq("arr"), 1, "_pd")
    }
    assert(e.getMessage.contains("unsupported type"))
  }

  test("bytes-bound flush: wide rows trigger the sampled-width flush and stay exact (ADVICE r19)") {
    import spark.implicits._
    // 60 x ~256 KB rows ≈ 15 MB through a 1 MB budget: the row-count
    // bound (128k) never fires, so any flushing observed is the bytes
    // bound working. Exactness must survive the flushes (containment).
    val wide = (1 to 60).map(i => (i.toLong, (i % 3).toLong, Array.fill(256 * 1024)(i.toByte)))
      .toDF("id", "bh", "payload").repartition(4, col("id")).persist()
    wide.count()
    try {
      val got = BucketCap.capByRank(wide, Seq("bh"), Seq("id"), 3,
        "graft.test.bcap.bytes", maxTrackedBytes = 1L << 20)
      val want = referenceCap(wide, Seq("bh"), Seq("id"), 3)
      assert(got.select("id", "bh").collect().map(_.toSeq).sortBy(_.toString).toSeq
        == want.select("id", "bh").collect().map(_.toSeq).sortBy(_.toString).toSeq)
      // conservation through flushes: drops + survivors = input
      val pre = BucketCap.preCut(wide, Seq("bh"), Seq("id"), 3, "_pd",
        maxTrackedBytes = 1L << 20)
      val agg = pre.agg(sum(col("_pd")), count(lit(1))).head()
      assert(agg.getLong(0) + agg.getLong(1) == 60L)
    } finally wide.unpersist()
  }

  test("executed plan: the saturated bucket's shuffle input is bounded by cap x map partitions") {
    import spark.implicits._
    // ONE bucket holding ALL n rows across `parts` partitions — the
    // degenerate skew the pre-cut exists for. Uncut, the rank window
    // shuffles all n rows to one reducer; pre-cut, at most
    // cap x parts (+1 drop-count carrier rounding) may reach it.
    val n = 4000
    val parts = 8
    val cap = 5
    val hot = (1 to n).map(i => (i.toLong, 0L, 42L, s"p$i"))
      .toDF("id", "band", "bh", "payload").repartition(parts, col("id"))
      .persist() // isolate the measured shuffle from the repartition
    hot.count()
    val recs = new java.util.concurrent.atomic.AtomicLong()
    val tl = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          recs.addAndGet(e.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(tl)
    try {
      // noop write: an action with no aggregation tail of its own, so
      // the ONLY shuffle measured is the rank window's Exchange
      BucketCap.capByRank(hot, Seq("band", "bh"), Seq("id"), cap,
        "graft.test.bcap.bound").write.format("noop").mode("overwrite").save()
      // listenerBus is private[spark]; poll instead — task-end events for
      // a completed job land well inside this window
      val deadline = System.currentTimeMillis() + 30000
      var last = -1L
      while (System.currentTimeMillis() < deadline &&
        (recs.get() == 0L || recs.get() != last)) {
        last = recs.get(); Thread.sleep(200)
      }
      val written = recs.get()
      val bound = cap.toLong * parts
      assert(written <= bound,
        s"saturated bucket shuffled $written rows; map-side pre-cut bounds it at $bound (n=$n)")
      assert(written > 0, "expected the capped window to shuffle something")
    } finally {
      spark.sparkContext.removeSparkListener(tl)
      hot.unpersist()
    }
  }
}
