package graft.functions

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Invariant properties for the PSL registrable-domain matcher over
  * RANDOM hosts drawn from a label alphabet that deliberately collides
  * with the embedded rule set (exact, wildcard, and exception families
  * all reachable) — the complement to `DomainSpec`'s fixture battery
  * and ql44b's oracle replay.
  */
object PslProps extends Properties("Psl") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  private val rules = Psl.Default

  // labels chosen so random hosts regularly hit exact (co.uk, com.au),
  // wildcard (*.ck, *.kobe.jp) and exception (!city.kobe.jp) rules
  private val label: Gen[String] = Gen.oneOf(
    "co", "uk", "com", "au", "ck", "bd", "jp", "kobe", "kawasaki",
    "city", "www", "example", "foo", "bar", "a1", "b2", "blog")

  private val hostGen: Gen[String] = for {
    n <- Gen.choose(1, 6)
    ls <- Gen.listOfN(n, label)
  } yield ls.mkString(".")

  /** Independent re-derivation of the PSL spec (all slices materialized,
    * prevailing rule chosen by explicit max/priority instead of the
    * production matcher's first-hit scan order) — guards any future
    * optimization of the scan loop against semantic drift.
    */
  private def reference(host: String): String = {
    if (host.isEmpty) return ""
    val ls = host.split('.')
    val n = ls.length
    if (n == 4 && ls.forall(l => l.nonEmpty && l.forall(c => c >= '0' && c <= '9'))) return ""
    val slices = (0 until n).map(i => i -> ls.drop(i).mkString("."))
    val exc = slices.collect { case (i, s) if rules.exception(s) => n - i - 1 }
    val rule = slices.collect { case (i, s)
        if rules.exact(s) || (i + 1 < n && rules.wildcard(ls.drop(i + 1).mkString("."))) =>
      n - i }
    val suffixLen = exc.maxOption.getOrElse(rule.maxOption.getOrElse(1))
    if (suffixLen >= n) "" else ls.drop(n - suffixLen - 1).mkString(".")
  }

  property("matches the all-slices reference derivation") =
    Prop.forAll(hostGen) { h => rules.registrable(h) == reference(h) }

  property("output is '' or a whole-label suffix of the host with >= 2 labels") =
    Prop.forAll(hostGen) { h =>
      val out = rules.registrable(h)
      out.isEmpty ||
        ((out == h || h.endsWith("." + out)) && out.split('.').length >= 2)
    }

  property("idempotent: the registrable domain is its own registrable domain") =
    Prop.forAll(hostGen) { h =>
      val out = rules.registrable(h)
      out.isEmpty || rules.registrable(out) == out
    }

  property("IPv4 literals never have a registrable domain") =
    Prop.forAll(Gen.listOfN(4, Gen.choose(0, 255))) { parts =>
      rules.registrable(parts.mkString(".")) == ""
    }
}
