package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables — shuffle-free co-located joins and aggregations.
  *
  * At 100 TB the dominant cost of a fact–fact join is shuffling both
  * sides. Writing both tables bucketed (and sorted) on the join key gives
  * every future join/aggregation on that key a plan with NO Exchange: the
  * scan's output partitioning already satisfies the join's distribution
  * requirement, and the sort order feeds SortMergeJoin directly. One write
  * amortizes over every downstream query — the canonical warehouse layout
  * for repeatedly-joined big tables.
  *
  * CATALOG LIFETIME: `saveAsTable` records the bucket spec in the
  * session catalog, which is per-application for the default in-memory
  * catalog — a FRESH application cannot `spark.table(name)` what a
  * previous one registered. [[writeBucketed]] therefore also writes a
  * `_bucketspec` sidecar (underscore-prefixed → invisible to the table's
  * own file listing) carrying (bucketCols, numBuckets, sortCols), and
  * [[readBucketedOrRegister]] re-issues the external-table DDL from it
  * when the name is absent — so persisted bucketed indexes survive
  * application restarts without a Hive metastore.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted table backed by parquet at `path`.
    * `numBuckets` should be sized so a bucket fits an executor's working
    * memory at full scale (buckets = parallelism unit for later reads).
    * Also writes the `_bucketspec` sidecar [[readBucketedOrRegister]]
    * re-registers from in a fresh application.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCols: Seq[String], numBuckets: Int,
                    sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
    // sidecar AFTER the table write (overwrite wipes the directory);
    // comma-joined names are safe — bucket keys are identifier columns
    val spark = df.sparkSession
    import spark.implicits._
    Seq((bucketCols.mkString(","), numBuckets, sortCols.mkString(",")))
      .toDF("bucket_cols", "num_buckets", "sort_cols")
      .repartition(1).write.mode("overwrite").parquet(s"$path/_bucketspec")
  }

  /** Read a bucketed table (bucketing metadata lives in the catalog, so
    * reads must go through the table name, not the path).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** [[readBucketed]] that survives a fresh application: when `table` is
    * absent from the catalog (the default in-memory catalog dies with
    * the app), re-register it as an EXTERNAL bucketed table over the
    * files at `path` using the `_bucketspec` sidecar, then read through
    * the catalog so the bucket spec is honored (scan satisfies the
    * bucket-key distribution — no Exchange). Falls back to a plain
    * parquet read (correct, but bucketing-blind — joins will reshuffle)
    * when no sidecar exists, i.e. the layout predates the sidecar.
    */
  def readBucketedOrRegister(spark: SparkSession, table: String,
                             path: String): DataFrame = {
    if (!spark.catalog.tableExists(table)) {
      val specPath = s"$path/_bucketspec"
      // one read job probes existence AND yields the row
      val specOpt = scala.util.Try(spark.read.parquet(specPath).head()).toOption
      specOpt match {
        case None => return spark.read.parquet(path)
        case Some(spec) =>
          val bucketCols = spec.getAs[String]("bucket_cols").split(',').toSeq
          val numBuckets = spec.getAs[Int]("num_buckets")
          val sortCols = spec.getAs[String]("sort_cols").split(',').toSeq
            .filter(_.nonEmpty)
          // schema from the data files themselves (the sidecar dir is
          // underscore-hidden, so it never pollutes the inference)
          val schemaDdl = spark.read.parquet(path).schema.toDDL
          def q(id: String) = s"`${id.replace("`", "``")}`"
          val qualified = table.split('.').map(q).mkString(".")
          val sorted =
            if (sortCols.nonEmpty) s"SORTED BY (${sortCols.map(q).mkString(", ")}) "
            else ""
          // IF NOT EXISTS closes the check-then-create race: two sessions
          // (or threads sharing one catalog) that both passed the
          // tableExists probe must not fail the second CREATE — the loser
          // falls through to spark.table and the location check below
          // still validates whatever entry won
          spark.sql(
            s"CREATE TABLE IF NOT EXISTS $qualified ($schemaDdl) USING parquet " +
              s"CLUSTERED BY (${bucketCols.map(q).mkString(", ")}) " +
              sorted +
              s"INTO $numBuckets BUCKETS LOCATION '${path.replace("'", "''")}'")
      }
    }
    // NEVER trust a pre-existing catalog entry blindly: a stale name from
    // an earlier registration pointing at a DIFFERENT path would silently
    // serve wrong data — the worst failure class. Loud mismatch beats
    // silent wrong rows; callers wanting both layouts use distinct names.
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = spark.sessionState.catalog.getTableMetadata(ident).location
    require(sameLocation(spark, loc, path),
      s"readBucketedOrRegister: catalog entry '$table' points at $loc, " +
        s"not the requested $path — a stale registration from another " +
        "dataset; drop the table or use a per-path table name")
    spark.table(table)
  }

  /** Location equality tolerant of scheme/normalization differences
    * (`file:/a/b` vs `/a/b` vs `/a/b/`): the requested path is first
    * QUALIFIED against the session's default filesystem (the catalog
    * stores fully-qualified URIs, so on an hdfs://-or-s3a:// defaultFS a
    * scheme-less request would never string-match the catalog entry and
    * the guard above would reject the very table it just created); local
    * paths then compare canonical file paths, non-local URIs compare
    * string forms sans trailing slash.
    */
  private[sources] def sameLocation(spark: SparkSession, loc: java.net.URI,
                                    path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val want =
      try p.getFileSystem(spark.sessionState.newHadoopConf()).makeQualified(p).toUri
      catch { case scala.util.control.NonFatal(_) => p.toUri }
    def norm(u: java.net.URI): String =
      if (u.getScheme == null || u.getScheme == "file")
        try new java.io.File(u.getPath).getCanonicalPath
        catch { case _: java.io.IOException => u.getPath.stripSuffix("/") }
      else u.toString.stripSuffix("/")
    norm(loc) == norm(want)
  }

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the property bucketing is supposed to buy. Exposed for tests and
    * plan audits.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")
}
