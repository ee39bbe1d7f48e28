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
