package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.SqlShims.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt crawl screening (RFC 9309) — the admission step between
  * URL canonicalization (q149) and fetch in any real crawl pipeline:
  * parse each host's robots.txt into its applicable rule group, then
  * decide every candidate URL by LONGEST-MATCH precedence (most
  * pattern octets wins; on a tie Allow wins; no matching rule means
  * allowed). Patterns support the de-facto grammar: literal octets,
  * `*` (any sequence, including empty), and a trailing `$` end
  * anchor. (The reference pipeline fetches a fixed API host —
  * reference `src/ingestion.py:32-54` — and needs no robots
  * handling; this is brief-driven crawl-scale work.)
  *
  * Group selection: rules are taken from the group whose
  * `User-agent:` token equals the caller's agent (case-insensitive,
  * exact token), falling back to the `*` group — RFC 9309 §2.2.1's
  * most-specific-group rule restricted to exact/wildcard, which is
  * what major crawlers implement. `#` comments strip anywhere;
  * blank `Disallow:` values are no-ops (RFC: an empty pattern
  * matches nothing).
  *
  * Scale shape: parsing runs once per HOST row (host-bounded, never
  * URL-bounded) via [[RobotsIngest.robotsRules]]; the per-URL
  * decision ([[RobotsIngest.robotsDecide]]) is a native expression
  * over (path, rules-array) — a bounded backtracking glob walk, no
  * regex compilation, no shuffle: screening 100 TB of frontier URLs
  * is the host-rules join plus one scan.
  */
object RobotsIngest {

  /** One parsed rule: allow/disallow + its raw pattern. */
  final case class Rule(allow: Boolean, pattern: String)

  /** Parse a robots.txt body into the rule list applicable to
    * `agent`: the exact-token group if present, else the `*` group.
    * Group order and within-group rule order are preserved (only
    * precedence, not order, decides matches — but a stable order
    * keeps the emitted rule column deterministic).
    */
  def parseRules(body: String, agent: String = "*"): Seq[Rule] = {
    val wantAgent = agent.toLowerCase
    val starRules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    val agentRules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var agentSeen = false
    // group state: which user-agent tokens the CURRENT group names
    var groupHasStar = false
    var groupHasAgent = false
    var inGroupHeader = false // consecutive User-agent lines share a group
    body.split("\r?\n", -1).foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h < 0) raw else raw.substring(0, h)
      }
      val line = noComment.trim
      if (line.nonEmpty) {
        val ci = line.indexOf(':')
        if (ci > 0) {
          val key = line.substring(0, ci).trim.toLowerCase
          val value = line.substring(ci + 1).trim
          key match {
            case "user-agent" =>
              if (!inGroupHeader) { // a NEW group starts
                groupHasStar = false; groupHasAgent = false
                inGroupHeader = true
              }
              val tok = value.toLowerCase
              if (tok == "*") groupHasStar = true
              if (tok == wantAgent) { groupHasAgent = true; agentSeen = true }
            case "allow" | "disallow" =>
              inGroupHeader = false
              if (value.nonEmpty) { // empty pattern matches nothing
                val r = Rule(key == "allow", value)
                if (groupHasAgent) agentRules += r
                else if (groupHasStar) starRules += r
              }
            case _ => () // crawl-delay, sitemap, unknown: not a rule.
            // Deliberately does NOT touch inGroupHeader: the de-facto
            // REP parsers ignore unrecognized lines without ending the
            // user-agent header block, so "User-agent: a\n
            // Crawl-delay: 1\nUser-agent: b\nDisallow: /x" keeps a
            // and b in ONE shared group (a would otherwise end up
            // with no rules at all).
          }
        }
      }
    }
    (if (agentSeen) agentRules else starRules).toSeq
  }

  /** Non-rule robots.txt metadata (r10: the lines [[parseRules]]
    * deliberately skips): the applicable group's `Crawl-delay` (the
    * de-facto politeness knob most crawlers honor even though RFC
    * 9309 omits it — agent group wins over `*`, like rule groups)
    * and every `Sitemap:` URL (per the sitemaps.org protocol these
    * are GLOBAL, not group-scoped). Feeds the recrawl planner's
    * per-host fetch-slot budget ([[Recrawl]]).
    */
  def parseMeta(body: String, agent: String = "*")
      : (Option[Double], Seq[String]) = {
    val wantAgent = agent.toLowerCase
    var starDelay: Option[Double] = None
    var agentDelay: Option[Double] = None
    var agentSeen = false
    val sitemaps = scala.collection.mutable.ArrayBuffer.empty[String]
    var groupHasStar = false
    var groupHasAgent = false
    var inGroupHeader = false
    body.split("\r?\n", -1).foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h < 0) raw else raw.substring(0, h)
      }
      val line = noComment.trim
      if (line.nonEmpty) {
        val ci = line.indexOf(':')
        if (ci > 0) {
          val key = line.substring(0, ci).trim.toLowerCase
          val value = line.substring(ci + 1).trim
          key match {
            case "user-agent" =>
              if (!inGroupHeader) {
                groupHasStar = false; groupHasAgent = false
                inGroupHeader = true
              }
              val tok = value.toLowerCase
              if (tok == "*") groupHasStar = true
              if (tok == wantAgent) { groupHasAgent = true; agentSeen = true }
            case "allow" | "disallow" =>
              inGroupHeader = false
            case "crawl-delay" =>
              // a group-scoped directive, but NOT a rule: it must not
              // terminate a header block (same de-facto-REP reasoning
              // as parseRules' non-rule handling)
              val d = try Some(value.toDouble).filter(_ > 0)
                catch { case _: NumberFormatException => None }
              if (d.isDefined) {
                if (groupHasAgent) agentDelay = d
                else if (groupHasStar) starDelay = d
              }
            case "sitemap" =>
              if (value.nonEmpty) sitemaps += value
            case _ => ()
          }
        }
      }
    }
    (if (agentSeen && agentDelay.isDefined) agentDelay else
      if (agentSeen) None else starDelay, sitemaps.toSeq)
  }

  /** Glob match of `pattern` against `path` — literal octets, `*`
    * wildcard, trailing `$` end anchor. Robots patterns are PREFIX
    * matches: an un-anchored pattern matches when it consumes any
    * prefix of the path (equivalently, `pattern + "*"` full-matches
    * the path — how it's evaluated here); `$` requires consuming the
    * path exactly. Returns the pattern's octet length (the RFC
    * precedence measure, `$`/`*` counted as written) on match, -1
    * otherwise. The walk is the classic single-last-star iterative
    * matcher — O(|path|·|pattern|) worst case, NO recursion: a
    * hostile robots.txt full of multi-star rules cannot blow the
    * screening pass up exponentially (robots.txt is untrusted
    * third-party input), and no regex ever compiles.
    */
  def matchLen(path: String, pattern: String): Int = {
    val anchored =
      pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val core = if (anchored) pattern.substring(0, pattern.length - 1)
      else pattern
    val p = if (anchored) core else core + "*"
    if (fullGlob(path, p)) pattern.length else -1
  }

  /** Full-string `*`-glob match, iterative greedy with single
    * last-star backtracking (provably complete for `*`-only globs).
    */
  private def fullGlob(s: String, p: String): Boolean = {
    var si = 0
    var pi = 0
    var star = -1 // index of the last '*' seen in p
    var mark = 0  // s-position that star is currently bound to
    while (si < s.length) {
      if (pi < p.length && p.charAt(pi) == '*') {
        star = pi; mark = si; pi += 1
      } else if (pi < p.length && p.charAt(pi) == s.charAt(si)) {
        si += 1; pi += 1
      } else if (star >= 0) {
        mark += 1; si = mark; pi = star + 1
      } else {
        return false
      }
    }
    while (pi < p.length && p.charAt(pi) == '*') pi += 1
    pi == p.length
  }

  /** The decision over a parsed rule list: longest pattern wins,
    * Allow wins ties, no match ⇒ allowed. Returns (allowed,
    * matchedPattern|null, matchedLen).
    */
  def decide(path: String, rules: Seq[Rule]): (Boolean, String, Int) = {
    var bestLen = -1
    var bestAllow = true
    var bestPattern: String = null
    rules.foreach { r =>
      val len = matchLen(path, r.pattern)
      if (len > bestLen ||
          (len == bestLen && len >= 0 && r.allow && !bestAllow)) {
        bestLen = len; bestAllow = r.allow; bestPattern = r.pattern
      }
    }
    if (bestLen < 0) (true, null, 0) else (bestAllow, bestPattern, bestLen)
  }

  private val ruleType = StructType(Seq(
    StructField("allow", BooleanType, nullable = false),
    StructField("pattern", StringType, nullable = false)))

  /** Native expression: robots.txt text → array<struct<allow,pattern>>
    * (the group applicable to `agent`). Runs once per HOST row.
    */
  case class RobotsRules(child: Expression, agent: String)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(ruleType, containsNull = false)
    override def nullable: Boolean = child.nullable

    def rulesOf(u: UTF8String): ArrayData = {
      val rs = parseRules(u.toString, agent)
      new GenericArrayData(rs.map(r => InternalRow(
        r.allow, UTF8String.fromString(r.pattern))).toArray[Any])
    }

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) null else rulesOf(v.asInstanceOf[UTF8String])
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("robotsRules", this)
      defineCodeGen(ctx, ev, c =>
        s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.rulesOf($c)")
    }

    override protected def withNewChildInternal(n: Expression)
        : Expression = copy(child = n)
  }

  /** Native expression: (path, rules) → struct<allowed,rule,match_len>
    * — the longest-match decision, one bounded glob walk per rule.
    */
  case class RobotsDecision(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("allowed", BooleanType, nullable = false),
      StructField("rule", StringType, nullable = true),
      StructField("match_len", IntegerType, nullable = false)))
    override def nullable: Boolean = left.nullable || right.nullable

    def decideRow(path: UTF8String, rules: ArrayData): InternalRow = {
      val n = rules.numElements()
      var bestLen = -1
      var bestAllow = true
      var bestPattern: UTF8String = null
      val p = path.toString
      var i = 0
      while (i < n) {
        val row = rules.getStruct(i, 2)
        val allow = row.getBoolean(0)
        val pat = row.getUTF8String(1)
        val len = matchLen(p, pat.toString)
        if (len > bestLen ||
            (len == bestLen && len >= 0 && allow && !bestAllow)) {
          bestLen = len; bestAllow = allow; bestPattern = pat
        }
        i += 1
      }
      if (bestLen < 0) InternalRow(true, null, 0)
      else InternalRow(bestAllow, bestPattern, bestLen)
    }

    override def eval(input: InternalRow): Any = {
      val l = left.eval(input)
      if (l == null) return null
      val r = right.eval(input)
      if (r == null) return null
      decideRow(l.asInstanceOf[UTF8String], r.asInstanceOf[ArrayData])
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("robotsDecision", this)
      defineCodeGen(ctx, ev, (l, r) =>
        s"(org.apache.spark.sql.catalyst.InternalRow) $ref.decideRow($l, $r)")
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  private val metaType = StructType(Seq(
    StructField("crawl_delay", DoubleType, nullable = true),
    StructField("sitemaps", ArrayType(StringType, containsNull = false),
      nullable = false)))

  /** Native expression: robots.txt text →
    * struct<crawl_delay, sitemaps> for `agent`. One row per HOST.
    */
  case class RobotsMeta(child: Expression, agent: String)
      extends UnaryExpression {
    override def dataType: DataType = metaType
    override def nullable: Boolean = child.nullable

    def metaOf(u: UTF8String): InternalRow = {
      val (delay, sitemaps) = parseMeta(u.toString, agent)
      InternalRow(
        delay.map(Double.box).orNull,
        new GenericArrayData(
          sitemaps.map(UTF8String.fromString).toArray[Any]))
    }

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) null else metaOf(v.asInstanceOf[UTF8String])
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("robotsMeta", this)
      defineCodeGen(ctx, ev, c =>
        s"(org.apache.spark.sql.catalyst.InternalRow) $ref.metaOf($c)")
    }

    override protected def withNewChildInternal(n: Expression)
        : Expression = copy(child = n)
  }

  def robotsRules(robotsTxt: Column, agent: String = "*"): Column =
    toColumn(RobotsRules(toExpression(robotsTxt), agent))

  def robotsMeta(robotsTxt: Column, agent: String = "*"): Column =
    toColumn(RobotsMeta(toExpression(robotsTxt), agent))

  def robotsDecide(path: Column, rules: Column): Column =
    toColumn(RobotsDecision(toExpression(path), toExpression(rules)))
}
