package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Public-Suffix-List registrable-domain extraction.
  *
  * The PSL algorithm (publicsuffix.org/list, the published matching
  * spec): split the host into labels, find every rule whose labels equal
  * a trailing slice of the host — a `*.`-prefixed rule matches any label
  * in the starred position, a `!`-prefixed exception rule, when it
  * matches, shortens the suffix by one label and PREVAILS over every
  * other match — otherwise the longest match wins, and a host matching
  * no rule falls to the implicit `*` (suffix = last label). The
  * registrable domain is the suffix plus one preceding label; a host
  * that IS a public suffix (or an IPv4 literal) has none.
  *
  * Relational alternative considered and rejected: exploding each host's
  * label-suffixes into a broadcast join against the rule dim works, but
  * re-assembling the longest match per doc is a corpus-wide groupBy — a
  * full shuffle to evaluate what is semantically a scalar column. The
  * rule set is a bounded dim (~10k entries published), so it rides the
  * task binary like any broadcast variable and the column stays inside
  * the scan's codegen stage ([[PslDomain]], the [[Md5TokenIds64]]
  * reference-object pattern).
  *
  * [[Psl.Default]] is an EMBEDDED SUBSET of the published list (major
  * ccTLD registries + the wildcard/exception families) — enough for
  * crawl-stats correctness on co.uk/com.au-class hosts; at fleet scale
  * load the full published file with [[PslRules.fromRules]] and pass it
  * explicitly. Unknown TLDs degrade to the implicit-`*` rule, which is
  * exactly the PSL's own fallback (reference behavior analog:
  * `reference/README.md` pipelines degrade per-item, never fail the
  * batch).
  */
final case class PslRules(exact: Set[String], wildcard: Set[String],
                          exception: Set[String]) extends Serializable {
  /** Registrable domain of an already-canonical host ('' when none). */
  def registrable(host: String): String = {
    if (host.isEmpty) return ""
    val labels = host.split('.')
    val n = labels.length
    // ASCII digits only — Character.isDigit accepts Unicode digit classes
    // (fullwidth, Arabic-Indic, ...) that the oracle's [0-9] regex and the
    // dotted-quad grammar do not
    if (n == 4 && labels.forall(l => l.nonEmpty && l.forall(c => c >= '0' && c <= '9')))
      return "" // IPv4 literal: no registrable domain (PSL convention)
    var suffixLen = -1
    // exception rules prevail over everything (PSL spec step 3)
    var i = 0
    while (i < n && suffixLen < 0) {
      if (exception.contains(joinFrom(labels, i))) suffixLen = n - i - 1
      i += 1
    }
    if (suffixLen < 0) {
      // longest exact/wildcard match; scanning the longest candidate
      // first makes the first hit the prevailing rule
      i = 0
      while (i < n && suffixLen < 0) {
        val s = joinFrom(labels, i)
        if (exact.contains(s)) suffixLen = n - i
        else if (i + 1 < n && wildcard.contains(joinFrom(labels, i + 1)))
          suffixLen = n - i
        i += 1
      }
    }
    if (suffixLen < 0) suffixLen = 1 // implicit `*`
    if (suffixLen >= n) "" // the host IS a public suffix
    else joinFrom(labels, n - suffixLen - 1)
  }

  private def joinFrom(labels: Array[String], i: Int): String = {
    val sb = new java.lang.StringBuilder
    var j = i
    while (j < labels.length) {
      if (j > i) sb.append('.')
      sb.append(labels(j))
      j += 1
    }
    sb.toString
  }
}

object PslRules {
  /** Parse published-PSL-format lines: `// comments` and blanks skipped,
    * `!rule` → exception, `*.rule` → wildcard base, else exact. Use with
    * the full published file read via `spark.read.textFile(...).collect()`
    * (a bounded ~10k-row dim — the documented driver-side exception).
    */
  def fromRules(lines: Seq[String]): PslRules = {
    val rules = lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//"))
    PslRules(
      exact = rules.filter(r => !r.startsWith("!") && !r.startsWith("*.")).toSet,
      wildcard = rules.filter(_.startsWith("*.")).map(_.stripPrefix("*.")).toSet,
      exception = rules.filter(_.startsWith("!")).map(_.stripPrefix("!")).toSet)
  }
}

object Psl {
  /** Embedded subset of the published list — the multi-label registry
    * suffixes a crawl-stats pass actually hits, plus the `*.`/`!`
    * families that exercise every branch of the matcher. Single-label
    * TLDs are intentionally absent: the implicit-`*` fallback IS the
    * PSL rule for them.
    */
  val DefaultRuleLines: Seq[String] = Seq(
    // United Kingdom
    "co.uk", "org.uk", "net.uk", "ac.uk", "gov.uk", "sch.uk", "nhs.uk",
    "police.uk", "ltd.uk", "plc.uk", "me.uk",
    // Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    // Japan (incl. the city wildcard/exception families)
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
    "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp",
    "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
    "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp", "!city.yokohama.jp",
    // New Zealand / South Africa
    "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz", "school.nz",
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    // Americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar",
    // Asia
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in", "edu.in", "gov.in", "res.in",
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "ac.kr",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "co.id", "net.id", "or.id", "ac.id", "go.id", "web.id", "sch.id",
    "co.th", "net.th", "or.th", "ac.th", "go.th", "in.th",
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "web.tr",
    // Europe
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    // all-wildcard registries
    "*.ck", "!www.ck", "*.bd", "*.np")

  lazy val Default: PslRules = PslRules.fromRules(DefaultRuleLines)

  /** PSL registrable domain of a host column ('' when none). */
  def registrableDomain(host: Column, rules: PslRules = Default): Column =
    Bridge.column(PslDomain(Bridge.expression(host), rules))

  /** SQL facade: `psl_domain(host)` with the embedded default rules. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "psl_domain", exprs => PslDomain(exprs.head, Default), "scala_udf")
}

/** Scalar PSL matcher as a native expression: the rule sets ride the
  * plan as a reference object (broadcast once per stage with the task
  * binary), each row is a label-walk over ≤ a handful of candidates —
  * no explode, no join, no shuffle; stays inside whole-stage codegen.
  */
case class PslDomain(child: Expression, rules: PslRules)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "psl_domain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"psl_domain expects STRING, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    route(input.asInstanceOf[UTF8String])

  def route(host: UTF8String): UTF8String =
    UTF8String.fromString(rules.registrable(host.toString))

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("psl", this, classOf[PslDomain].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $ref.route($h);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
