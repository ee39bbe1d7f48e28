package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Byte-BPE token counting against the pinned fixture vocabulary
  * (`src/test/resources/bpe/merges.txt`, GPT-2 merges format). Every
  * expected count below is hand-derived from the merge table: rank order
  * is line order, the lowest-rank adjacent pair merges first across all
  * its occurrences, unknown pairs never merge.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vocab: BpeVocab = {
    val in = getClass.getResourceAsStream("/bpe/merges.txt")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try BpeVocab.parseMerges(src.getLines()) finally src.close()
  }

  test("byte-to-unicode map matches the published GPT-2 alphabet") {
    assert(BpeVocab.byteToChar(' '.toInt) == 'Ġ') // space -> 'Ġ'
    assert(BpeVocab.byteToChar('a'.toInt) == 'a') // printable kept
    assert(BpeVocab.byteToChar(0) == 'Ā') // first shifted byte
  }

  test("merge loop follows rank order across occurrences (hand-pinned)") {
    // "hello": (h,e) r0 -> (l,l) r1 -> (he,ll) r2 -> (hell,o) r3 -> 1 sym
    assert(vocab.countTokens("hello") == 1)
    // "Ġhello" ends [Ġ, hello]: (Ġ,hello) is not a merge
    assert(vocab.countTokens("hello hello") == 3)
    // (h,e) outranks (t,h), so "the" -> [t, he], NOT [th, e]
    assert(vocab.mergeWord("the") == Seq("t", "he"))
    assert(vocab.countTokens("the the") == 5) // [t,he] + [Ġ,t,he]
    assert(vocab.countTokens("hell") == 1)
    assert(vocab.countTokens("he") == 1)
  }

  test("pre-tokenizer splits contractions, punctuation and space prefixes") {
    assert(vocab.countTokens("don't") == 5) // [d,o,n] + [',t]
    assert(vocab.countTokens("hello, world!") == 9) // 1 + [,] + [Ġ,w,o,r,l,d] + [!]
  }

  test("multi-byte UTF-8 counts bytes, whitespace runs count per byte") {
    assert(vocab.countTokens("é") == 2) // é = 2 UTF-8 bytes, no merges
    assert(vocab.countTokens("   ") == 3) // ĠĠĠ, (Ġ,Ġ) not a merge
    assert(vocab.countTokens("") == 0)
  }

  test("merges file loader skips ONLY the version header and round-trips through a file") {
    val f = java.io.File.createTempFile("merges", ".txt")
    try {
      val w = new java.io.PrintWriter(f, "UTF-8")
      w.println("#version: 0.2"); w.println(""); w.println("h e")
      // real GPT-2 merges contain '#'-led merge lines ('##' tokens) —
      // they are MERGES, not comments
      w.println("# #"); w.println("## #")
      w.close()
      val v = BpeVocab.fromFile(f.getPath)
      assert(v.ranks == Map(("h", "e") -> 0, ("#", "#") -> 1, ("##", "#") -> 2))
      assert(v.countTokens("he") == 1 && v.countTokens("eh") == 2)
      assert(v.countTokens("###") == 1) // # # -> ##, ## # -> ###
    } finally f.delete()
  }

  test("the Column face rides the scan and agrees with the driver-side count") {
    val texts = Seq("hello hello", "the the", "don't", "", "hello, world!")
    val got = texts.toDF("text")
      .select(Native.bpeTokenCount(col("text"), vocab).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == texts.map(vocab.countTokens))
    // null in -> null out
    val nullRow = Seq(Option.empty[String]).toDF("text")
      .select(Native.bpeTokenCount(col("text"), vocab)).head()
    assert(nullRow.isNullAt(0))
  }

  test("count is bounded by pre-token and byte counts on arbitrary text (property)") {
    val rnd = new scala.util.Random(7)
    val alphabet = "ab th helo ,.!'éΩ \n\t0123"
    (1 to 200).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val n = vocab.countTokens(s)
      val bytes = s.getBytes("UTF-8").length
      assert(n >= 0 && n <= bytes, s"count $n out of [0, $bytes] for '$s'")
      if (s.exists(!_.isWhitespace)) assert(n >= 1)
    }
  }

  private lazy val encoder: BpeEncoder = {
    val url = getClass.getResource("/bpe/vocab.json")
    BpeEncoder(vocab, BpeEncoder.idsFromJson(url.getPath))
  }

  test("encode emits the hand-pinned id sequences under the fixture vocab") {
    // ids: h=0 e=1 l=2 o=3 t=4 Ġ=5 he=6 ll=7 hell=8 hello=9 ... Ġhe=13
    assert(encoder.encode("hello").toSeq == Seq(9))
    assert(encoder.encode("the").toSeq == Seq(4, 6)) // [t, he] — (h,e) outranks (t,h)
    assert(encoder.encode("hello hello").toSeq == Seq(9, 5, 9)) // [hello] + [Ġ, hello]
    assert(encoder.encode("the the").toSeq == Seq(4, 6, 5, 4, 6))
    assert(encoder.encode("he").toSeq == Seq(6))
    assert(encoder.encode("").toSeq == Seq.empty)
    // id count must agree with the counting path on every input
    Seq("hello hello", "the the", "he", "hello, world!").foreach { s =>
      assert(encoder.encode(s).length == vocab.countTokens(s), s"'$s'")
    }
  }

  test("symbols missing from the id vocabulary encode as -1, not silently dropped") {
    assert(encoder.encodeWord("x").toSeq == Seq(-1))
    assert(encoder.encode("hello x").toSeq == Seq(9, 5, -1)) // Ġ=5 then unknown x
  }

  test("vocab.json loader reads the flat GPT-2 object and rejects junk") {
    val ids = BpeEncoder.idsFromJson(getClass.getResource("/bpe/vocab.json").getPath)
    assert(ids("hello") == 9 && ids("Ġhe") == 13 && ids.size == 14)
    val bad = java.io.File.createTempFile("vocab_bad", ".json")
    try {
      val w = new java.io.PrintWriter(bad, "UTF-8"); w.println("[1,2]"); w.close()
      intercept[IllegalArgumentException](BpeEncoder.idsFromJson(bad.getPath))
    } finally bad.delete()
  }

  test("the encode Column face rides the scan and agrees with the driver-side encode") {
    val texts = Seq("hello hello", "the the", "", "hello, world!")
    val got = texts.toDF("text")
      .select(Native.bpeEncode(col("text"), encoder).as("ids"))
      .collect().map(_.getSeq[Int](0).toSeq).toSeq
    assert(got == texts.map(encoder.encode(_).toSeq))
    val nullRow = Seq(Option.empty[String]).toDF("text")
      .select(Native.bpeEncode(col("text"), encoder)).head()
    assert(nullRow.isNullAt(0))
  }

  test("decode inverts encode exactly; unknown ids surface as U+FFFD") {
    // roundtrip over vocab-covered texts — pre-tokens partition the
    // input and carry their leading space as Ġ, so identity is exact
    Seq("hello hello", "the the", "he", "hello the he", "").foreach { s =>
      assert(encoder.decode(encoder.encode(s)) == s, s"roundtrip '$s'")
    }
    assert(encoder.decode(Array(9, 5, 9)) == "hello hello")
    assert(encoder.decode(Array.emptyIntArray) == "")
    // an id with no token (77) and encode's own -1 marker both decode
    // loud, not dropped
    assert(encoder.decode(Array(9, 77)) == "hello�")
    assert(encoder.decode(encoder.encode("hello x")) == "hello �")
    // degenerate duplicate-id vocab: lexicographically smallest token
    // wins, deterministically
    val dup = BpeEncoder(vocab, Map("b" -> 0, "a" -> 0))
    assert(dup.decode(Array(0)) == "a")
  }

  test("decode round-trips multi-byte UTF-8 through a complete base alphabet") {
    // every byte has an id => every text round-trips, merges or not
    val ids = BpeVocab.byteToChar.map(String.valueOf(_)).zipWithIndex.toMap
    val full = BpeEncoder(BpeVocab.parseMerges(Seq("h e").iterator),
      ids + ("he" -> 256))
    Seq("héllo wörld", "日本語 text", "café ✓ naïve", "a\nb\tc").foreach { s =>
      assert(full.decode(full.encode(s)) == s, s"utf8 roundtrip '$s'")
    }
  }

  test("the decode Column face rides the scan and agrees with the driver side") {
    val texts = Seq("hello hello", "the the", "", "hello the he")
    val rt = texts.toDF("text")
      .select(Native.bpeDecode(
        Native.bpeEncode(col("text"), encoder), encoder).as("rt"))
      .collect().map(_.getString(0)).toSeq
    assert(rt == texts)
    val nullRow = Seq(Option.empty[String]).toDF("text")
      .select(Native.bpeDecode(Native.bpeEncode(col("text"), encoder), encoder))
      .head()
    assert(nullRow.isNullAt(0))
    // null ELEMENTS decode as unknown, not as a crash
    val withNullElem = Seq(Seq(Some(9), None)).toDF("ids")
      .select(Native.bpeDecode(col("ids"), encoder)).head().getString(0)
    assert(withNullElem == "hello�")
  }

  test("SQL facade exposes bpe_decode and the encode/decode SQL chain round-trips") {
    Native.register(spark)
    val url = getClass.getResource("/bpe/merges.txt").getPath
    val vurl = getClass.getResource("/bpe/vocab.json").getPath
    Seq("hello the he").toDF("text").createOrReplaceTempView("bpe_dec_docs")
    val rt = spark.sql(
      s"SELECT bpe_decode(bpe_encode(text, '$url', '$vurl'), '$url', '$vurl') " +
        "FROM bpe_dec_docs").head().getString(0)
    assert(rt == "hello the he")
    val e = intercept[Exception](spark.sql(
      "SELECT bpe_decode(bpe_encode(text, text, text), text, text) FROM bpe_dec_docs")
      .collect())
    assert(e.getMessage.contains("STRING literal"))
  }

  test("SQL facade exposes bpe_encode with literal merges + vocab paths") {
    Native.register(spark)
    val url = getClass.getResource("/bpe/merges.txt").getPath
    val vurl = getClass.getResource("/bpe/vocab.json").getPath
    Seq("hello the").toDF("text").createOrReplaceTempView("bpe_enc_docs")
    val ids = spark.sql(
      s"SELECT bpe_encode(text, '$url', '$vurl') FROM bpe_enc_docs")
      .head().getSeq[Int](0).toSeq
    assert(ids == Seq(9, 5, 4, 6)) // [hello] + [Ġ, t, he]
    val e = intercept[Exception](spark.sql(
      "SELECT bpe_encode(text, text, text) FROM bpe_enc_docs").collect())
    assert(e.getMessage.contains("STRING literal"))
  }

  test("SQL facade exposes bpe_token_count with a literal merges path") {
    val f = java.io.File.createTempFile("merges_sql", ".txt")
    try {
      val w = new java.io.PrintWriter(f, "UTF-8")
      w.println("h e"); w.println("l l"); w.println("he ll"); w.println("hell o")
      w.close()
      Native.register(spark)
      Seq("hello hello").toDF("text").createOrReplaceTempView("bpe_docs")
      val n = spark.sql(
        s"SELECT bpe_token_count(text, '${f.getPath}') FROM bpe_docs")
        .head().getInt(0)
      assert(n == 3) // [hello] + [Ġ, hello] under this 4-merge vocab
      // non-literal path fails fast instead of silently misloading
      val e = intercept[Exception](spark.sql(
        "SELECT bpe_token_count(text, text) FROM bpe_docs").collect())
      assert(e.getMessage.contains("STRING literal"))
    } finally f.delete()
  }

  test("budget operators meter in BPE units through the Tokenizer parameter") {
    import graft.llm.{Sampling, TextAnalysis}
    val docs = Seq((1L, "hello hello"), (2L, "the the"), (3L, "hello"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text"),
        TextAnalysis.BpeTok(vocab)).cast("long").as("n_tokens"))
    // BPE counts: doc1=3, doc2=5, doc3=1 -> prefix cuts at budget 8 tokens:
    // doc1 (prefix 0) + doc2 (prefix 3) fit, doc3 (prefix 8) does not
    val kept = Sampling.takeByTokenBudget(docs, groupCol = "n_tokens", idCol = "doc_id",
      tokensCol = "n_tokens", budgets = Map.empty, defaultBudget = 8L, buckets = 1)
    // group by a constant instead: use shardByTokenBudget for the clean pin
    val shards = Sampling.shardByTokenBudget(docs, "doc_id", "n_tokens", budgetTokens = 8L)
      .select(col("doc_id"), col("shard")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shards == Map(1L -> 0L, 2L -> 0L, 3L -> 1L), s"got $shards")
    kept.count() // smoke: the BPE column also flows through takeByTokenBudget
  }

  test("BpeTrain learns hand-computed merges in weighted-count order") {
    val docs = Seq("aa aa aa b").toDF("text")
    // pre-tokens: "aa" x1, " aa" x2, " b" x1; pairs (a,a):3 > (Ġ,a):2 >
    // (Ġ,b):1; after (a,a)->aa the next is (Ġ,aa):2, then (Ġ,b):1
    val v = BpeTrain.train(docs, "text", numMerges = 3)
    assert(v.ranks == Map(
      ("a", "a") -> 0, ("Ġ", "aa") -> 1, ("Ġ", "b") -> 2))
    // round-trip into counting: every pre-token fully merges -> 4 tokens
    assert(v.countTokens("aa aa aa b") == 4)
    // fewer merges leave more symbols: 1 + 2 + 2 + 2
    val v1 = BpeTrain.train(docs, "text", numMerges = 1)
    assert(v1.countTokens("aa aa aa b") == 7)
    // the loop stops when no pair remains (asking for more is safe)
    assert(BpeTrain.train(docs, "text", numMerges = 100).ranks.size == 3)
  }

  test("BpeTrain ties break to the lexicographically smallest pair") {
    val docs = Seq("ab cd ab cd").toDF("text")
    // (a,b):2, (Ġ,c):2, (c,d):2 all tie; 'a' < 'c' < 'Ġ' (U+0120)
    val v = BpeTrain.train(docs, "text", numMerges = 1)
    assert(v.ranks.keySet == Set(("a", "b")))
  }

  test("BpeTrain is partitioning-independent and round-trips merges.txt") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select("text")
    val a = BpeTrain.train(docs, "text", numMerges = 40)
    val b = BpeTrain.train(docs.repartition(13), "text", numMerges = 40)
    assert(a.ranks == b.ranks)
    // serialization parity: lines -> parseMerges -> identical table
    val reparsed = BpeVocab.parseMerges(BpeTrain.mergesLines(a).iterator)
    assert(reparsed.ranks == a.ranks)
    // the trained vocabulary compresses its own corpus vs untrained bytes
    val sample = docs.limit(5).as[String].collect().mkString(" ")
    val untrained = BpeTrain.trainFromCounts(Seq((" stub", 1L)), 1)
    assert(a.countTokens(sample) < untrained.countTokens(sample))
  }

  test("BpeTrain minWordCount and maxWords prune the collected vocabulary") {
    val docs = Seq("hot hot hot hot cold").toDF("text")
    // " hot" x3 + "hot" x1 + " cold" x1; minWordCount=2 keeps only " hot"
    val v = BpeTrain.train(docs, "text", numMerges = 10, minWordCount = 2)
    // merges only ever involve " hot"'s symbols: Ġ,h,o,t
    assert(v.ranks.keys.forall { case (l, r) =>
      (l + r).forall("Ġhot".contains(_)) })
    val capped = BpeTrain.train(docs, "text", numMerges = 10, maxWords = 1)
    assert(capped.ranks.keys.forall { case (l, r) =>
      (l + r).forall("Ġhot".contains(_)) })
  }
}
