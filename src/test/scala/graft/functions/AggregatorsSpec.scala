package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("WeightedMean distributes (partial+final) and matches the closed form") {
    val ds = Seq((10.0, 1.0), (20.0, 3.0), (40.0, 1.0)).toDS()
    val wm = udaf(new Aggregators.WeightedMean())
    val got = ds.toDF("x", "w").agg(wm(col("x"), col("w"))).head().getDouble(0)
    assert(math.abs(got - (10 * 1 + 20 * 3 + 40 * 1) / 5.0) < 1e-12)
  }

  test("TopKBySim ranks NaN first, matching `sim DESC` in Spark SQL and DuckDB") {
    // a zero-norm embedding yields cosine = NaN; SQL DESC puts NaN above
    // every real value, so the bounded aggregate must agree or ql4's
    // agg-vs-window equivalence breaks on degenerate vectors
    val ds = Seq((Double.NaN, 7L), (0.9, 1L), (0.9, 2L), (0.1, 3L))
      .toDF("sim", "id")
    val topk = udaf(Aggregators.TopKBySim.ofLong(3))
    val got = ds.repartition(4).agg(topk(col("sim"), col("id")))
      .head().getSeq[org.apache.spark.sql.Row](0).map(r => r.getLong(1))
    assert(got == Seq(7L, 1L, 2L)) // NaN first, then sim desc with id tiebreak
  }

  test("TopKBySim dedups candidate ids in-buffer (multi-probe re-encounters)") {
    // the same (sim, id) pair arriving once per colliding probe/table must
    // count once — this is what lets the ANN tails skip the dedicated
    // dropDuplicates Exchange before ranking
    val ds = Seq((0.9, 1L), (0.9, 1L), (0.9, 1L), (0.5, 2L), (0.5, 2L), (0.1, 3L))
      .toDF("sim", "id")
    val topk = udaf(Aggregators.TopKBySim.ofLong(2))
    val got = ds.repartition(3).agg(topk(col("sim"), col("id")))
      .head().getSeq[org.apache.spark.sql.Row](0).map(r => (r.getDouble(0), r.getLong(1)))
    assert(got == Seq((0.9, 1L), (0.5, 2L)))
  }

  test("TopKBySim string ids survive the aggregate with lexicographic tiebreak") {
    val ds = Seq((0.9, "doc-b"), (0.9, "doc-a"), (0.1, "doc-z"))
      .toDF("sim", "id")
    val topk = udaf(Aggregators.TopKBySim.ofString(2))
    val got = ds.repartition(2).agg(topk(col("sim"), col("id")))
      .head().getSeq[org.apache.spark.sql.Row](0).map(r => r.getString(1))
    assert(got == Seq("doc-a", "doc-b"))
  }

  test("TopKBySim.ofString ties break by UTF-8 bytes (window-form ORDER BY parity)") {
    // U+FFFF (one UTF-16 code unit) sorts BELOW U+10000 (surrogate pair)
    // in UTF-8 byte order — Spark's UTF8String / ORDER BY semantics — but
    // ABOVE it in Java String (UTF-16 code unit) order: the exact case
    // where Ordering.String would break the agg ≡ window equivalence
    val bmp = "\uffff"
    val supp = new String(Character.toChars(0x10000))
    assert(Ordering.String.compare(supp, bmp) < 0, "fixture must hit the divergence")
    val ds = Seq((0.9, supp), (0.9, bmp)).toDF("sim", "id")
    val topk = udaf(Aggregators.TopKBySim.ofString(1))
    val got = ds.repartition(2).agg(topk(col("sim"), col("id")))
      .head().getSeq[org.apache.spark.sql.Row](0).map(_.getString(1))
    val want = ds.orderBy(col("sim").desc, col("id").asc).limit(1)
      .collect().map(_.getString(1)).toSeq // the window form's ranking
    assert(got == want && got == Seq(bmp))
  }

  test("TopKBySim ignores null candidate ids instead of NPE-ing in the ordering") {
    val ds = Seq((0.9, null: String), (0.5, "doc-a")).toDF("sim", "id")
    val topk = udaf(Aggregators.TopKBySim.ofString(2))
    val got = ds.repartition(2).agg(topk(col("sim"), col("id")))
      .head().getSeq[org.apache.spark.sql.Row](0).map(_.getString(1))
    assert(got == Seq("doc-a"))
  }

  test("MinHashSketch yields NULL for a doc whose chunks were all empty") {
    // parity with the batch MinHashSignature (NULL on an empty token
    // array): the untouched sentinel must not band like a real signature —
    // it would collide every empty doc with every other empty doc
    val chunks = Seq((1L, Seq[String]()), (1L, Seq[String]()), (2L, Seq("x")))
      .toDF("id", "chunk")
    val sk = udaf(new Aggregators.MinHashSketch(16))
    val out = chunks.repartition(3).groupBy("id").agg(sk(col("chunk")).as("sig"))
    val byId = out.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(byId(1L), "all-empty doc must have a NULL signature")
    assert(!byId(2L))
  }

  test("MinHashSketch over arbitrary chunk splits equals the one-shot signature") {
    // mergeability is the whole point: chunked/partitioned accumulation
    // must be bit-identical to the fused expression over the full doc
    val chunks = Seq(
      (1L, Seq("a", "b")), (1L, Seq("c")),
      (2L, Seq("x", "y")), (2L, Seq("z")), (2L, Seq[String]())
    ).toDF("id", "chunk")
    val sk = udaf(new Aggregators.MinHashSketch(32))
    val got = chunks.repartition(4).groupBy("id").agg(sk(col("chunk")).as("sig"))
    val want = Seq((1L, "a b c"), (2L, "x y z")).toDF("id", "text")
      .select(col("id"), graft.llm.Dedup.minHash(
        graft.llm.Dedup.tokens(col("text")), 32).as("sig"))
    assert(got.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      == want.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap)
  }

  test("TopKMin keeps bounded state across partitions") {
    val ds = spark.range(1000).map(i => (i % 7, (1000 - i))).toDF("g", "v")
    val topk = udaf(new Aggregators.TopKMin(3))
    val got = ds.repartition(8).groupBy("g").agg(topk(col("v")).as("top"))
      .filter(col("g") === 0).head().getSeq[Long](1)
    // group 0: v = 1000-i for i % 7 == 0 → min three are 6, 13, 20
    assert(got == Seq(6L, 13L, 20L))
  }
}
