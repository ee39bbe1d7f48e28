package graft.llm

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hash sampling is deterministic and partitioning-independent") {
    val docs = Tables.load(spark, sf, "documents")
    val a = Sampling.hashSample(docs, "doc_id", 250).select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.hashSample(docs.repartition(13), "doc_id", 250)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b) // identical rows regardless of partitioning
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.15 && frac < 0.35, s"~25% expected, got $frac")
  }

  test("hash sample rate scales with the keep threshold") {
    val docs = Tables.load(spark, sf, "documents")
    val small = Sampling.hashSample(docs, "doc_id", 100).count()
    val large = Sampling.hashSample(docs, "doc_id", 500).count()
    assert(small < large)
    // monotone containment: the 10% sample is a subset of the 50% one
    val smallIds = Sampling.hashSample(docs, "doc_id", 100).select("doc_id").as[Long].collect().toSet
    val largeIds = Sampling.hashSample(docs, "doc_id", 500).select("doc_id").as[Long].collect().toSet
    assert(smallIds.subsetOf(largeIds))
  }

  test("sampleByRates: integer rates replicate, fractional rates draw by hash, unlisted groups drop") {
    val docs = (1L to 1000L).map(i => (i, if (i % 2 == 0) "a" else if (i % 3 == 0) "b" else "c"))
      .toDF("id", "src")
    val rates = Seq(("a", 2.0), ("b", 0.5)).toDF("src", "rate")
    val out = Sampling.sampleByRates(docs, "src", "id", rates)
    // rate 2.0: every 'a' row exactly twice with copies {0, 1}
    val aCopies = out.filter($"src" === "a").groupBy("id")
      .agg(collect_set("copy").as("cs"), count(lit(1)).as("n"))
    assert(aCopies.filter($"n" =!= 2).count() == 0)
    assert(out.filter($"src" === "a").count() == docs.filter($"src" === "a").count() * 2)
    // rate 0.5: exactly the rows whose hash draw lands under 500000, once
    val expectedB = docs.filter($"src" === "b")
      .filter(pmod(xxhash64($"id"), lit(1000000L)) < 500000L)
      .select("id").as[Long].collect().toSet
    val gotB = out.filter($"src" === "b").select("id").as[Long].collect()
    assert(gotB.toSet == expectedB && gotB.length == expectedB.size)
    val fracB = gotB.length.toDouble / docs.filter($"src" === "b").count()
    assert(fracB > 0.35 && fracB < 0.65, s"~50% expected, got $fracB")
    // unlisted group 'c' contributes nothing
    assert(out.filter($"src" === "c").count() == 0)
  }

  test("sampleByRates: mixed-rate copies are deterministic and partitioning-independent") {
    val docs = (1L to 600L).map(i => (i, "g")).toDF("id", "src")
    val rates = Seq(("g", 2.25)).toDF("src", "rate")
    val out = Sampling.sampleByRates(docs, "src", "id", rates)
    val perRow = out.groupBy("id").agg(count(lit(1)).as("n"),
      max("copy").as("mx"), min("copy").as("mn"))
    // every row 2 or 3 copies, contiguous from 0
    assert(perRow.filter($"n" < 2 || $"n" > 3).count() == 0)
    assert(perRow.filter($"mn" =!= 0 || $"mx" =!= $"n" - 1).count() == 0)
    val total = out.count().toDouble / 600
    assert(total > 2.1 && total < 2.4, s"~2.25 copies/row expected, got $total")
    val again = Sampling.sampleByRates(docs.repartition(17), "src", "id", rates)
      .select("id", "copy").as[(Long, Long)].collect().sorted.toSeq
    assert(again == out.select("id", "copy").as[(Long, Long)].collect().sorted.toSeq)
  }

  test("hashSplit: disjoint, complete, proportional, and growth-stable") {
    val docs = (1L to 4000L).toDF("id")
    val split = Sampling.hashSplit(docs, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // complete + disjoint: a pure projection can't drop or duplicate rows
    assert(counts.values.sum == 4000L)
    assert(math.abs(counts("train") - 3200.0) / 3200.0 < 0.1)
    assert(counts("val") > 200 && counts("test") > 200)
    // growth stability: adding rows never moves an existing row's bucket
    val grown = Sampling.hashSplit((1L to 8000L).toDF("id"), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val before = split.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    grown.filter(col("id") <= 4000).collect()
      .foreach(r => assert(before(r.getLong(0)) == r.getString(1)))
    // a different seed decorrelates the assignment
    val reseeded = Sampling.hashSplit(docs, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 7L)
    val moved = reseeded.collect().count(r => before(r.getLong(0)) != r.getString(1))
    assert(moved > 500)
  }

  test("shardByTokenBudget equals the sequential prefix-sum, any partition count") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), graft.llm.TextAnalysis.tokenCountWs(col("text")).as("nt"))
    // driver reference: exclusive prefix sum in id order, integer-div
    val rows = docs.collect().map(r => (r.getLong(0), r.getInt(1).toLong)).sortBy(_._1)
    val want = rows.scanLeft((0L, 0L, 0L)) { case ((_, _, acc), (id, nt)) =>
      (id, acc / 300L, acc + nt)
    }.tail.map { case (id, shard, _) => id -> shard }.toMap
    for (parts <- Seq(1, 3, 11)) {
      val got = Sampling.shardByTokenBudget(docs, "doc_id", "nt", 300L, partitions = parts)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == want, s"shards diverged from the sequential reference at parts=$parts")
    }
    assert(want.values.toSet.size > 3, "fixture should span several shards at budget 300")
  }

  test("shardByTokenBudget: null token counts contribute 0 (all-null buckets included)") {
    // ids 0–49 have NULL token counts: they must behave as 0-token docs —
    // in both the per-bucket prefix window AND the bucket totals (an
    // all-null bucket's sum() is NULL; an unguarded getLong NPE'd there)
    val df = spark.range(100).select(col("id"),
      when(col("id") < 50, lit(null).cast("long")).otherwise(lit(10L)).as("nt"))
    val got = Sampling.shardByTokenBudget(df, "id", "nt", budgetTokens = 100L, partitions = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want = (0L until 100L).map { id =>
      val prefix = if (id <= 50) 0L else (id - 50) * 10L
      id -> prefix / 100L
    }.toMap
    assert(got == want)
  }

  test("shardByTokenBudget validateIds fails fast on duplicate or null ids") {
    val dup = spark.range(10).select((col("id") % 5).as("id"), lit(1L).as("nt"))
    val e1 = intercept[IllegalArgumentException] {
      Sampling.shardByTokenBudget(dup, "id", "nt", 100L, validateIds = true)
    }
    assert(e1.getMessage.contains("duplicate"))
    val withNull = spark.range(10).select(
      when(col("id") === 3, lit(null).cast("long")).otherwise(col("id")).as("id"),
      lit(1L).as("nt"))
    val e2 = intercept[IllegalArgumentException] {
      Sampling.shardByTokenBudget(withNull, "id", "nt", 100L, validateIds = true)
    }
    assert(e2.getMessage.contains("null"))
    val clean = spark.range(10).select(col("id"), lit(1L).as("nt"))
    assert(Sampling.shardByTokenBudget(clean, "id", "nt", 5L, validateIds = true)
      .count() == 10)
  }

  test("takeByTokenBudget caps each group's tokens, deterministically, any partitioning") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"),
        graft.llm.TextAnalysis.tokenCountWs(col("text")).cast("long").as("nt"))
    val budgets = Map("en" -> 400L, "de" -> 150L)
    val out = Sampling.takeByTokenBudget(docs, "lang", "doc_id", "nt", budgets, defaultBudget = 100L)
    val got = out.select("doc_id").as[Long].collect().sorted.toSeq
    // driver reference: per-group exclusive prefix over the same hash order
    val hashed = docs.select(col("doc_id"), col("lang"), col("nt"),
      xxhash64(col("doc_id")).as("h")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val want = hashed.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      val budget = budgets.getOrElse(lang, 100L)
      var acc = 0L
      rows.sortBy(r => (r._4, r._1)).flatMap { case (id, _, nt, _) =>
        val keep = acc < budget; acc += nt; if (keep) Some(id) else None
      }
    }.sorted
    assert(got == want && got.nonEmpty)
    // partitioning-independence: identical survivors after a reshuffle
    val re = Sampling.takeByTokenBudget(docs.repartition(13), "lang", "doc_id", "nt",
      budgets, defaultBudget = 100L).select("doc_id").as[Long].collect().sorted.toSeq
    assert(re == got)
    // two-phase ≡ degenerate single-bucket window (one partition per
    // group): the parallel form must change the plan, not the answer
    val one = Sampling.takeByTokenBudget(docs, "lang", "doc_id", "nt", budgets,
      defaultBudget = 100L, buckets = 1).select("doc_id").as[Long].collect().sorted.toSeq
    assert(one == got)
    // and the corpus-side window must partition by (group, bucket) — a
    // group-only window serializes each source through one partition
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("_mix_b"), "expected the hash-bucket column in the executed plan")
    // a group never exceeds budget by more than its boundary document
    val sums = out.groupBy("lang").agg(sum("nt").as("s"), max("nt").as("m")).collect()
    sums.foreach { r =>
      val budget = budgets.getOrElse(r.getString(0), 100L)
      assert(r.getLong(1) - r.getLong(2) < budget,
        s"${r.getString(0)}: all-but-boundary tokens must stay under budget")
    }
  }

  test("perGroup draws exactly n per group, deterministically") {
    val docs = Tables.load(spark, sf, "documents")
    val s1 = Sampling.perGroup(docs, Seq(col("lang")), "doc_id", 3)
    val counts = s1.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(counts.forall(_ <= 3) && counts.exists(_ == 3))
    val s2 = Sampling.perGroup(docs.repartition(7), Seq(col("lang")), "doc_id", 3)
    assert(rowsOf(s1.select("doc_id")) == rowsOf(s2.select("doc_id")))
  }

  test("percentileBuckets cuts exact thirds per group with deterministic ties") {
    // group a: 9 rows, scores 1..9 → head {1,2,3}, middle {4,5,6}, tail {7,8,9}
    // group b: 4 rows all TIED → rank by id: head {1}, middle {2}, tail {3,4}
    val df = ((1 to 9).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 4).map(i => ("b", 100L + i, 5.0))).toDF("lang", "doc_id", "score")
    val out = Sampling.percentileBuckets(df, "lang", "score", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    assert((1 to 3).forall(i => out(i.toLong) == "head"))
    assert((4 to 6).forall(i => out(i.toLong) == "middle"))
    assert((7 to 9).forall(i => out(i.toLong) == "tail"))
    assert(out(101L) == "head" && out(102L) == "middle")
    assert(out(103L) == "tail" && out(104L) == "tail")
    // partitioning independence (the window is keyed, not positional)
    val out2 = Sampling.percentileBuckets(df.repartition(7), "lang", "score", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    assert(out == out2)
    // NULL scores (lmScore of an empty doc) rank LAST → tail, never head
    val withNull = ((1 to 8).map(i => ("a", i.toLong, Some(i.toDouble))) :+
      (("a", 9L, Option.empty[Double]))).toDF("lang", "doc_id", "score")
    val nb = Sampling.percentileBuckets(withNull, "lang", "score", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    assert(nb(9L) == "tail" && nb(1L) == "head")
  }

  test("packTokenSequences splits docs across dense fixed-length sequences") {
    val df = Seq((1L, 300L), (2L, 300L), (3L, 500L), (4L, 0L), (5L, 100L))
      .toDF("doc_id", "n")
    val out = Sampling.packTokenSequences(df, "doc_id", "n", 256L)
      .select("seq_id", "doc_id", "doc_from", "doc_to", "seq_off")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(out == Set(
      (0L, 1L, 0L, 256L, 0L), (1L, 1L, 256L, 300L, 0L),
      (1L, 2L, 0L, 212L, 44L), (2L, 2L, 212L, 300L, 0L),
      (2L, 3L, 0L, 168L, 88L), (3L, 3L, 168L, 424L, 0L), (4L, 3L, 424L, 500L, 0L),
      (4L, 5L, 0L, 100L, 76L))) // the 0-token doc 4 emits no span
    // every sequence except the ragged last is exactly full, and the
    // result is partitioning-independent
    val full = Sampling.packTokenSequences(df.repartition(5), "doc_id", "n", 256L)
      .groupBy("seq_id").agg(sum(col("doc_to") - col("doc_from")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full == Map(0L -> 256L, 1L -> 256L, 2L -> 256L, 3L -> 256L, 4L -> 176L))
  }

  test("percentileBucketsApprox agrees with the exact form on continuous scores") {
    // continuous (hash-derived) scores: ties are absent, so value cuts
    // and rank thirds coincide up to t-digest boundary wobble
    val docs = Tables.load(spark, sf, "documents")
      .withColumn("score", pmod(xxhash64(col("doc_id")), lit(1000000L)).cast("double"))
    val exact = Sampling.percentileBuckets(docs, "lang", "score", "doc_id")
      .select(col("doc_id"), col("bucket").as("eb"))
    val approx = Sampling.percentileBucketsApprox(docs, "lang", "score")
      .select(col("doc_id"), col("bucket").as("ab"))
    val joined = exact.join(approx, "doc_id")
    val n = joined.count()
    val agree = joined.filter(col("eb") === col("ab")).count()
    assert(agree.toDouble / n > 0.95, s"approx/exact agreement $agree/$n")

    // tied bands are the DOCUMENTED divergence: value cuts sweep a whole
    // tied band into one bucket where rank order splits it — pin the
    // behavior so the scaladoc claim stays true
    import spark.implicits._
    val tied = (1 to 90).map(i => ("a", i.toLong, 5.0)).toDF("lang", "doc_id", "score")
    val ta = Sampling.percentileBucketsApprox(tied, "lang", "score")
      .select(col("bucket")).as[String].collect()
    assert(ta.forall(_ == "head"))
  }
  test("sampleByRates fails loudly on reserved columns and a missing rate column") {
    val docs = Seq((1L, "a")).toDF("id", "src")
    val rates = Seq(("a", 2.0)).toDF("src", "rate")
    val e1 = intercept[IllegalArgumentException] {
      Sampling.sampleByRates(docs.withColumn("copy", lit(0)), "src", "id", rates)
    }
    assert(e1.getMessage.contains("copy"))
    val e2 = intercept[IllegalArgumentException] {
      Sampling.sampleByRates(docs.withColumn("_mix_g", lit(0)), "src", "id", rates)
    }
    assert(e2.getMessage.contains("_mix_g"))
    val e3 = intercept[IllegalArgumentException] {
      Sampling.sampleByRates(docs, "src", "id", Seq(("a", 2.0)).toDF("src", "r"))
    }
    assert(e3.getMessage.contains("rate"))
  }

  test("mixtureRatesByTemperature: natural proportions at alpha=1, hand-computed alpha=0.5, zero-size raises") {
    val sizes = Seq(("en", 900L), ("de", 100L)).toDF("lang", "n")
    // alpha = 1: weight_i = n_i/Σn -> rate = budget/Σn for EVERY group
    val nat = Sampling.mixtureRatesByTemperature(sizes, "lang", "n", 500.0, 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(nat("en") - 0.5) < 1e-12 && math.abs(nat("de") - 0.5) < 1e-12)
    // alpha = 0.5: w = (30, 10), wsum = 40 -> rate_en = B*0.75/900,
    // rate_de = B*0.25/100; B = 1200 gives exactly (1.0, 3.0) — the
    // low-resource group upsampled 3x, the published temperature effect
    val t = Sampling.mixtureRatesByTemperature(sizes, "lang", "n", 1200.0, 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(t("en") - 1.0) < 1e-12 && math.abs(t("de") - 3.0) < 1e-12)
    // zero-size group: loud, not a silent 0/NaN rate
    val bad = Seq(("en", 900L), ("xx", 0L)).toDF("lang", "n")
    val e = intercept[Exception] {
      Sampling.mixtureRatesByTemperature(bad, "lang", "n", 100.0, 0.5).collect()
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("must be positive")))
  }

  test("temperature rates compose with sampleByRates to hit the budget exactly on integer rates") {
    val docs = ((1 to 900).map(i => (i.toLong, "en")) ++
      (1001 to 1100).map(i => (i.toLong, "de"))).toDF("doc_id", "lang")
    val sizes = docs.groupBy("lang").count()
    val rates = Sampling.mixtureRatesByTemperature(sizes, "lang", "count", 1200.0, 0.5)
    val out = Sampling.sampleByRates(docs, "lang", "doc_id", rates)
    val byLang = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // rates are exactly (en 1.0, de 3.0): no fractional draw, so the
    // emitted mixture is exact — 900 + 300 = the 1200 budget
    assert(byLang == Map("en" -> 900L, "de" -> 300L))
  }

  test("weightedSamplePerGroup caps each group, dominant weights always win") {
    // one 1e12-weight row per group: its log10 edge (12) exceeds the
    // whole hash-Gumbel range (~[-0.81, 6.3] over u in [5e-7, 1)), so it
    // must be selected in EVERY group regardless of the draw
    val rows = (1 to 40).map(i => (i.toLong, s"g${i % 4}", 10.0)) ++
      (41 to 44).map(i => (i.toLong, s"g${i % 4}", 1e13))
    val df = rows.toDF("doc_id", "grp", "w")
    val out = Sampling.weightedSamplePerGroup(df, Seq(col("grp")), "doc_id", "w", 3)
      .collect().map(r => (r.getString(1), r.getLong(0))).groupBy(_._1)
    assert(out.keySet == Set("g0", "g1", "g2", "g3"))
    out.foreach { case (g, picked) =>
      assert(picked.length == 3, s"group $g: expected 3, got ${picked.length}")
      val heavy = (41 to 44).find(i => s"g${i % 4}" == g).get.toLong
      assert(picked.map(_._2).contains(heavy), s"group $g dropped its 1e13 row")
    }
    // a group smaller than nPerGroup survives whole
    val tiny = Seq((1L, "solo", 2.0)).toDF("doc_id", "grp", "w")
    assert(Sampling.weightedSamplePerGroup(tiny, Seq(col("grp")), "doc_id", "w", 5)
      .count() == 1)
  }

  test("weightedSample global form: size cap, determinism, key parity with per-group") {
    val df = (1 to 50).map(i => (i.toLong, i.toDouble)).toDF("doc_id", "w")
    val a = Sampling.weightedSample(df, "doc_id", "w", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq.sortBy(_._1)
    assert(a.size == 10)
    val b = Sampling.weightedSample(df.repartition(7), "doc_id", "w", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq.sortBy(_._1)
    assert(a == b, "selection must be partition-layout independent")
    // the global and per-group forms compute the SAME key for a row
    val keysGlobal = Sampling.weightedSample(df, "doc_id", "w", 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val keysGrouped = Sampling.weightedSamplePerGroup(
      df.withColumn("g", lit("x")), Seq(col("g")), "doc_id", "w", 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(keysGlobal == keysGrouped)
  }

  test("weightedSample raises loudly on null and non-positive weights") {
    val bad0 = Seq((1L, 0.0), (2L, 1.0)).toDF("doc_id", "w")
    val e0 = intercept[Exception] {
      Sampling.weightedSample(bad0, "doc_id", "w", 1).collect()
    }
    assert(e0.getMessage.contains("weight must be positive"))
    val badNull = Seq((1L, Some(1.0)), (2L, None))
      .toDF("doc_id", "w")
    val eN = intercept[Exception] {
      Sampling.weightedSample(badNull, "doc_id", "w", 1).collect()
    }
    assert(eN.getMessage.contains("weight must be positive"))
  }

}
