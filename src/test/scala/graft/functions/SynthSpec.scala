package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bit-equality pins for the native fixture-synthesis expressions
  * (optimization round 21): [[SynthGrayBytes]]/[[SynthPcm16]] replace
  * the interpreted HOF closed forms
  * (`unhex(array_join(transform(sequence(...), p -> lpad(hex(...), 2,
  * '0')), ''))`) inside 13 oracle-hashed media queries, so the ONLY
  * acceptable behavior is byte-for-byte equality with the SQL forms the
  * DuckDB oracle replays. Each test evaluates BOTH forms over a spread
  * of seeds (including negative-hash territory — pmod vs % is exactly
  * where a drift would hide) and asserts binary equality.
  */
class SynthSpec extends SparkSpec {
  import spark.implicits._

  private val seeds = (0L until 40L).map(i => i * 7919L + 3L) ++ Seq(0L, 1L)

  private def df = seeds.toDF("k")

  test("grid form matches the SQL closed form: (p%w)*64 + (p div w) + y0, value 1+pmod") {
    for ((w, h, y0) <- Seq((36, 32, 0), (36, 16, 16), (36, 16, 8), (18, 16, 0))) {
      val n = w * h
      val sql = expr(
        s"""unhex(array_join(transform(sequence(0, ${n - 1}), p ->
          lpad(hex(1 + pmod(xxhash64(k * 4096 + (p % $w) * 64 + ((p div $w) + $y0)), 100)),
          2, '0')), ''))""")
      val native = Synth.grayBytes(col("k") * 4096, lit(n), w = w, y0 = y0)
      val bad = df.select(sql.as("a"), native.as("b"))
        .filter(not(col("a") === col("b"))).count()
      assert(bad == 0, s"grid $w x $h y0=$y0 drifted from the SQL closed form")
    }
  }

  test("scaled + brightness grid matches qm3's form: ((p%w) div s)*64 + ((p div w) div s), value (1+br)+pmod") {
    for ((w, h, s, br) <- Seq((18, 16, 1, 0), (36, 32, 2, 0), (18, 16, 1, 10))) {
      val n = w * h
      val sql = expr(
        s"""unhex(array_join(transform(sequence(0, ${n - 1}), p ->
          lpad(hex(${1 + br} + pmod(xxhash64(k * 4096 +
            ((p % $w) div $s) * 64 + ((p div $w) div $s)), 100)),
          2, '0')), ''))""")
      val native = Synth.grayBytes(col("k") * 4096, lit(n),
        w = w, sx = s, sy = s, valueBase = 1 + br)
      val bad = df.select(sql.as("a"), native.as("b"))
        .filter(not(col("a") === col("b"))).count()
      assert(bad == 0, s"scaled grid $w x $h scale=$s br=$br drifted")
    }
  }

  test("linear form (w = 1) matches the per-byte container payload form") {
    val sql = expr(
      """unhex(array_join(transform(sequence(0, 287), j ->
        lpad(hex(1 + pmod(xxhash64(k * 65536 + j), 100)), 2, '0')), ''))""")
    val native = Synth.grayBytes(col("k") * 65536, lit(288))
    val bad = df.select(sql.as("a"), native.as("b"))
      .filter(not(col("a") === col("b"))).count()
    assert(bad == 0, "linear payload drifted from the SQL closed form")
  }

  test("variable per-row count matches (the qm4 ragged-length shape)") {
    val sql = expr(
      """unhex(array_join(transform(sequence(bigint(0), (2 + pmod(k, 4)) * 64 - 1), g ->
        lpad(hex(1 + pmod(xxhash64(k * 65536 + g), 100)), 2, '0')), ''))""")
    val native = Synth.grayBytes(col("k") * 65536,
      ((lit(2) + pmod(col("k"), lit(4))) * 64).cast("int"))
    val bad = df.select(sql.as("a"), native.as("b"))
      .filter(not(col("a") === col("b"))).count()
    assert(bad == 0, "variable-count linear payload drifted")
  }

  test("pcm16 matches the hex-pair-swap LE16 SQL form, offsets included") {
    for (off <- Seq(0, 130, 200)) {
      val sql = expr(
        s"""unhex(array_join(transform(sequence(0, 129), i ->
          concat(substring(lpad(hex(pmod(pmod(xxhash64(k * 524288 + i + $off), 16384) - 8192, 65536)), 4, '0'), 3, 2),
                 substring(lpad(hex(pmod(pmod(xxhash64(k * 524288 + i + $off), 16384) - 8192, 65536)), 4, '0'), 1, 2))), ''))""")
      val native = Synth.pcm16(col("k") * 524288, lit(130), offset = off)
      val bad = df.select(sql.as("a"), native.as("b"))
        .filter(not(col("a") === col("b"))).count()
      assert(bad == 0, s"pcm16 offset=$off drifted from the SQL closed form")
    }
  }

  test("pcm16 down = true matches qm14's shiftright 2:1 box-filter re-render") {
    def sVal(g: String) = s"(pmod(xxhash64(k * 1048576 + ($g)), 16384) - 8192)"
    def le16Hex(v: String) =
      s"concat(substring(lpad(hex(pmod($v, 65536)), 4, '0'), 3, 2), " +
        s"substring(lpad(hex(pmod($v, 65536)), 4, '0'), 1, 2))"
    val sql = expr(s"unhex(array_join(transform(sequence(0, 389), g -> " +
      s"${le16Hex(s"shiftright(${sVal("2 * g")} + ${sVal("2 * g + 1")} + 1, 1)")}), ''))")
    val native = Synth.pcm16(col("k") * 1048576, lit(390), down = true)
    val bad = df.select(sql.as("a"), native.as("b"))
      .filter(not(col("a") === col("b"))).count()
    assert(bad == 0, "down-rendered pcm16 drifted from the shiftright closed form")
  }

  test("NULL contract: null seed or count yields NULL, negative count yields NULL") {
    val out = Seq((java.lang.Long.valueOf(3L), Integer.valueOf(-1)),
        (null.asInstanceOf[java.lang.Long], Integer.valueOf(4)),
        (java.lang.Long.valueOf(3L), null.asInstanceOf[Integer]))
      .toDF("k", "n")
      .select(Synth.grayBytes(col("k"), col("n")).as("g"),
        Synth.pcm16(col("k"), col("n")).as("p"))
      .collect()
    assert(out.forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }
}
