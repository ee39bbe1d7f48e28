package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Source-format roundtrips beyond parquet/csv/json: ORC, raw text, and
  * the binaryFile media ingestion path.
  */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  test("ORC sink/source roundtrip preserves rows and types") {
    val dir = Files.createTempDirectory("orc").toString + "/t"
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    OrcSink(graft.core.StageId("orcw"), dir)(docs)
    val back = OrcSource(dir)(spark.emptyDataFrame)
    assert(back.schema == docs.schema)
    assert(rowsOf(back) == rowsOf(docs))
  }

  test("text source reads one row per line into `value`") {
    val dir = Files.createTempDirectory("txt")
    Files.write(dir.resolve("a.txt"), "first line\nsecond line\n".getBytes)
    val df = TextSource(dir.toString)(spark.emptyDataFrame)
    assert(df.columns.toSeq == Seq("value"))
    assert(df.as[String].collect().sorted.toSeq == Seq("first line", "second line"))
  }

  test("compactTo reduces partitions toward the byte target without a shuffle") {
    val docs = Tables.load(spark, sf, "documents").repartition(32)
    val compacted = Tables.compactTo(docs, targetFileBytes = 512L * 1024 * 1024)
    assert(compacted.rdd.getNumPartitions < 32)
    // compaction itself adds no exchange beyond the test's own repartition
    def exchanges(p: String) = p.sliding("Exchange".length).count(_ == "Exchange")
    assert(exchanges(compacted.queryExecution.executedPlan.toString) ==
      exchanges(docs.queryExecution.executedPlan.toString),
      "coalesce must not add a shuffle")
    assert(compacted.count() == docs.count())
    // never inflates an already-small frame
    val one = docs.coalesce(1)
    assert(Tables.compactTo(one, 1L).rdd.getNumPartitions == 1)
    // unknown/huge stats (sizeInBytes defaults near Long.MaxValue) must
    // not overflow Int and throw — compaction is skipped instead
    val unknown = spark.createDataFrame(docs.rdd, docs.schema) // LogicalRDD: default stats
    val kept = Tables.compactTo(unknown, 1L)
    assert(kept.rdd.getNumPartitions == unknown.rdd.getNumPartitions)
  }

  test("JSONL sink/readWithErrors: lossless roundtrip, corrupt lines become dead letters") {
    val dir = Files.createTempDirectory("jsonl").toString + "/t"
    val docs = Tables.load(spark, sf, "documents")
    JsonSink(graft.core.StageId("jw"), dir)(docs)
    val clean = JsonLines.readWithErrors(spark, dir, docs.schema)
    assert(clean.columns.toSeq == docs.columns.toSeq :+ graft.core.ErrorChannel.ColName)
    assert(clean.filter(col("_err").isNotNull).count() == 0)
    assert(rowsOf(clean.drop("_err")) == rowsOf(docs))

    // poison one extra file: two malformed lines + one good line
    Files.write(Paths.get(dir, "poison.json"),
      "not json at all\n{\"doc_id\": 1, \"text\": \"ok\"\n{\"doc_id\": 7, \"text\": \"good\", \"lang\": \"en\", \"source\": \"s\", \"n_chars\": 4}\n".getBytes)
    val mixed = JsonLines.readWithErrors(spark, dir, docs.schema, stage = "src")
    // an _err-ONLY slice is the first thing a dead-letter consumer runs;
    // the text-scan + from_json design must allow it uncached (the raw
    // json scan throws QUERY_ONLY_CORRUPT_RECORD_COLUMN here)
    val dead = mixed.filter(col("_err").isNotNull)
    assert(dead.count() == 2)
    // the raw line is preserved for replay, the stage id is on the path
    val msgs = dead.select(col("_err.msg")).as[String].collect().toSet
    assert(msgs.exists(_.contains("not json at all")))
    assert(dead.select(col("_err.path")(0)).as[String].collect().toSet == Set("src"))
    // healthy rows parse through the same scan
    assert(mixed.filter(col("_err").isNull).count() == docs.count() + 1)
  }

  test("CSV sink/readWithErrors: lossless scalar roundtrip, corrupt lines become dead letters") {
    val dir = Files.createTempDirectory("csv").toString + "/t"
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_shipdate")
    CsvSink(graft.core.StageId("cw"), dir)(li)
    val clean = CsvLines.readWithErrors(spark, dir, li.schema)
    assert(clean.columns.toSeq == li.columns.toSeq :+ graft.core.ErrorChannel.ColName)
    assert(clean.filter(col("_err").isNotNull).count() == 0)
    assert(rowsOf(clean.drop("_err")) == rowsOf(li))

    // poison one extra file: a non-numeric key, a short line, one good line
    Files.write(Paths.get(dir, "poison.csv"),
      ("notanumber,1,A,5.0,1995-01-01T00:00:00.000\n" +
        "7,2\n" +
        "7,2,N,3.0,1995-01-01T00:00:00.000\n").getBytes)
    val mixed = CsvLines.readWithErrors(spark, dir, li.schema, stage = "src")
    val dead = mixed.filter(col("_err").isNotNull)
    assert(dead.count() == 2)
    // raw line preserved for replay; stage id on the path
    val msgs = dead.select(col("_err.msg")).as[String].collect().toSet
    assert(msgs.exists(_.contains("notanumber")))
    assert(dead.select(col("_err.path")(0)).as[String].collect().toSet == Set("src"))
    assert(mixed.filter(col("_err").isNull).count() == li.count() + 1)
  }

  test("CSV embedded-newline boundary: quoted multi-line fields are OUT of the line reader's contract") {
    // the writer quotes a field containing \n; the line-oriented reader
    // then sees two broken records — the documented boundary that routes
    // free-text columns to JSONL instead
    val dir = Files.createTempDirectory("csvnl").toString + "/t"
    val df = Seq((1L, "one\ntwo")).toDF("id", "text")
    CsvSink(graft.core.StageId("cw2"), dir)(df)
    val back = CsvLines.readWithErrors(spark, dir, df.schema)
    assert(back.filter(col("_err").isNull && col("id") === 1L && col("text") === "one\ntwo")
      .count() == 0)
  }

  test("binaryFile ingestion surfaces bytes + metadata per file") {
    val dir = Files.createTempDirectory("bin")
    Files.write(dir.resolve("x.bin"), Array[Byte](1, 2, 3))
    Files.write(dir.resolve("y.bin"), Array[Byte](9, 8, 7, 6))
    Files.write(dir.resolve("skip.txt"), "no".getBytes)
    val media = Multimodal.readBinaryFiles(spark, dir.toString, glob = "*.bin")
    val rows = media.select(col("path"), col("length"), col("bytes")).collect()
    assert(rows.length == 2)
    val byName = rows.map(r => Paths.get(r.getString(0).stripPrefix("file:")).getFileName.toString ->
      (r.getLong(1), r.getAs[Array[Byte]](2))).toMap
    assert(byName("x.bin")._1 == 3L && byName("x.bin")._2.toSeq == Seq[Byte](1, 2, 3))
    assert(byName("y.bin")._1 == 4L && byName("y.bin")._2.toSeq == Seq[Byte](9, 8, 7, 6))
    // the feature plumbing applies directly to the ingested bytes column
    val parts = Multimodal.repartitionByBytes(media, "bytes", targetBytesPerTask = 4)
    assert(parts.count() == 2)
  }
}
