package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, Literal}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.SparkSession

/** User-facing table-generating function (UDTF analog): the custom
  * `Generator` registration path the SURVEY §2.3 UDF/UDAF/UDTF row calls
  * for. `explode` covers array columns; this covers computed row expansion
  * — each input row yields its word n-grams as rows, without first
  * materializing an array column.
  *
  * SQL: `SELECT explode_ngrams(text, 2) AS ngram FROM docs` (or LATERAL
  * VIEW). DataFrame: `df.select(Generators.ngrams(col("text"), 2))`.
  *
  * Generators run inside Catalyst's Generate operator, so the expansion
  * streams per row — no intermediate array allocation per document, which
  * at 100 TB of text is the difference between one pass and a
  * doc-sized-array materialization per row.
  */
case class ExplodeNgrams(child: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)

  override def elementSchema: StructType =
    StructType(Seq(StructField("ngram", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, n.dataType) match {
      case (StringType, IntegerType) if n.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"explode_ngrams expects (STRING, INT literal), got " +
            s"(${child.dataType.sql}, ${n.dataType.sql})")
    }

  private lazy val width: Int = n.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input)
    if (text == null || width <= 0) Iterator.empty
    else {
      val toks = text.asInstanceOf[UTF8String].toString
        .split(' ').iterator.filter(_.nonEmpty).toArray
      if (toks.length < width) Iterator.empty
      else (0 to toks.length - width).iterator.map { i =>
        InternalRow(UTF8String.fromString(toks.slice(i, i + width).mkString(" ")))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), n = newChildren(1))
}

/** Per-document term frequencies as generated rows: one (term, tf) row per
  * DISTINCT token of the input text (space-split, empty tokens dropped —
  * the `Dedup.tokens` vocabulary), counted in one local hash pass.
  *
  * This is the in-scan form of `explode(tokens) → groupBy(id, term)`: the
  * relational shape pays a corpus-sized Exchange to merge occurrence rows
  * into (doc, term) counts, while the generator emits the merged counts
  * directly off the scan — the aggregation is per-document, so no shuffle
  * is ever needed to compute it. Emission order is first occurrence
  * (deterministic, though downstream aggs don't depend on it).
  *
  * `withDl` (optimization round 21) adds a third generated column `dl` =
  * the document's TOTAL token count (Σ tf — identical to
  * `size(Dedup.tokens(text))`, spec-pinned): the BM25 build used to
  * compute `dl` as a separate `size(tokens)` projection, which the
  * optimizer placed ABOVE this generator — re-tokenizing the document
  * once per POSTING row instead of once per document (the r21 ql67 plan
  * read: a ~20x redundant tokenize at the fixture's vocabulary). The
  * generator already holds the total, so emitting it is free.
  */
case class ExplodeTermCounts(child: Expression, withDl: Boolean = false)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child)

  override def elementSchema: StructType = {
    val base = Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))
    StructType(if (withDl) base :+ StructField("dl", LongType, nullable = false) else base)
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"explode_term_counts expects STRING, got ${other.sql}")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input)
    if (text == null) Iterator.empty
    else {
      val counts = new java.util.LinkedHashMap[String, Long]()
      var total = 0L
      val it = text.asInstanceOf[UTF8String].toString.split(' ').iterator
      while (it.hasNext) {
        val t = it.next()
        if (t.nonEmpty) { counts.merge(t, 1L, (a, b) => a + b); total += 1L }
      }
      val dl = total
      val entries = counts.entrySet().iterator()
      new Iterator[InternalRow] {
        def hasNext: Boolean = entries.hasNext
        def next(): InternalRow = {
          val e = entries.next()
          if (withDl) InternalRow(UTF8String.fromString(e.getKey), e.getValue, dl)
          else InternalRow(UTF8String.fromString(e.getKey), e.getValue)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object Generators {
  /** Column face — use in `select` like `explode`. */
  def ngrams(text: Column, n: Int): Column =
    Bridge.column(ExplodeNgrams(Bridge.expression(text), Literal(n)))

  /** Column face for [[ExplodeTermCounts]] — two generated columns, so
    * `.as(Seq("term", "tf"))` (the posexplode convention).
    */
  def termCounts(text: Column): Column =
    Bridge.column(ExplodeTermCounts(Bridge.expression(text)))

  /** [[ExplodeTermCounts]] with the per-document total as a third column —
    * `.as(Seq("term", "tf", "dl"))`.
    */
  def termCountsWithDl(text: Column): Column =
    Bridge.column(ExplodeTermCounts(Bridge.expression(text), withDl = true))

  /** SQL registration (`SELECT explode_ngrams(text, 2) FROM t`). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "explode_ngrams", exprs => ExplodeNgrams(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "explode_term_counts", exprs => ExplodeTermCounts(exprs.head), "scala_udf")
  }
}
