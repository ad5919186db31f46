package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt evaluation (RFC 9309) — the crawl-politeness gate a WARC
  * ingestion pipeline applies before a page may enter the corpus.
  * Implemented subset, stated as the contract:
  *
  *  - groups: one or more consecutive `user-agent:` lines followed by
  *    `allow:`/`disallow:` rules, ending at the next `user-agent:` line
  *    (blank lines do NOT end a group — RFC 9309 §2.2);
  *  - agent match: case-insensitive product-token equality, or `*`;
  *    when any group names the agent exactly, every `*` group is
  *    ignored (§2.2.1 — the most specific group wins);
  *  - rule paths support the two REQUIRED special characters: `*`
  *    (any character run) and a trailing `$` (end anchor) (§2.2.3);
  *  - precedence: the matching rule with the MOST OCTETS in its
  *    pattern wins; an allow/disallow tie resolves to allow (§2.2.2);
  *  - an empty `disallow:` value is no restriction; no matching rule
  *    means allowed; `#` starts a comment.
  *
  * Percent-decoding normalization is NOT applied — patterns and paths
  * compare as the octets the caller supplies (normalize upstream with
  * `Web.urlNormalize` if crawl URLs mix encodings).
  *
  * One robots.txt serves every page of its host, so the parsed rule
  * table caches per JVM keyed by (content digest, agent) in a bounded
  * LRU ([[KernelCache]] — the PSL device); each row then pays one
  * digest + O(rules) pattern probes inside codegen, never a re-parse.
  */
object RobotsKernel {

  /** Parsed, agent-resolved rule list: (allow, pattern) pairs. */
  final class RuleTable(text: String, agent: String) {
    private val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    private val exact = Vector.newBuilder[(Boolean, String)]
    private val star = Vector.newBuilder[(Boolean, String)]
    private var sawExact = false
    private var exactDelay: Option[Double] = None
    private var starDelay: Option[Double] = None
    // parse state: which tier the current group binds to (0 none,
    // 1 star, 2 exact) and whether we are still stacking UA lines
    private var tier = 0
    private var inUa = false
    text.linesIterator.foreach { raw =>
      val line = {
        val noComment = raw.indexOf('#') match {
          case -1 => raw
          case i  => raw.substring(0, i)
        }
        noComment.trim
      }
      val colon = line.indexOf(':')
      if (line.nonEmpty && colon > 0) {
        val key = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            val m =
              if (value == "*") 1
              else if (value.toLowerCase(java.util.Locale.ROOT) == agentLc) 2
              else 0
            tier = if (inUa) math.max(tier, m) else m
            inUa = true
            if (tier == 2) sawExact = true
          case "allow" | "disallow" =>
            inUa = false
            if (value.nonEmpty && tier > 0) {
              val rule = (key == "allow", value)
              if (tier == 2) exact += rule else star += rule
            }
          case "crawl-delay" =>
            // non-standard but ubiquitous; first value per tier wins
            inUa = false
            value.toDoubleOption.filter(_ >= 0).foreach { d =>
              if (tier == 2 && exactDelay.isEmpty) exactDelay = Some(d)
              else if (tier == 1 && starDelay.isEmpty) starDelay = Some(d)
            }
          case _ => inUa = false // sitemap, unknown keys
        }
      }
    }
    /** The rules that bind this agent: its own groups if any named it,
      * else the `*` groups. */
    val rules: Array[(Boolean, String)] =
      (if (sawExact) exact else star).result().toArray

    /** Crawl-delay that binds this agent (seconds), group-resolved the
      * same way; None when no group states one. */
    val crawlDelay: Option[Double] =
      if (sawExact) exactDelay else starDelay
  }

  /** `pattern` match against `path`: segments between `*` must appear
    * in order (first anchored at the start); a trailing `$` anchors the
    * last segment at the end. Greedy left-to-right — the standard glob
    * argument: taking the EARLIEST occurrence of each middle segment
    * never loses a match.
    */
  private[functions] def patternMatches(path: String, pattern: String): Boolean = {
    val (pat, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true)
      else (pattern, false)
    val segs = pat.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < segs.length) {
      val s = segs(i)
      if (i == 0) {
        if (!path.startsWith(s)) return false
        pos = s.length
      } else if (i == segs.length - 1 && anchored) {
        // last segment with $: must sit at the very end, at/after pos
        if (!(path.endsWith(s) && path.length - s.length >= pos))
          return false
        pos = path.length
      } else {
        val at = path.indexOf(s, pos)
        if (at < 0) return false
        pos = at + s.length
      }
      i += 1
    }
    if (anchored && segs.length == 1) pos == path.length else true
  }

  /** Serialization-friendly handle (ships only agent; tables rebuild
    * through the JVM-wide cache on each executor). */
  final class Agent(val agent: String) extends Serializable

  private val cache = new KernelCache[(String, String), RuleTable](1024)

  private def tableFor(text: String, agent: String): RuleTable = {
    val digest = java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    cache.getOrCompute((digest, agent), _ => new RuleTable(text, agent))
  }

  /** Group-resolved crawl-delay in seconds; null when absent. */
  def crawlDelay(robots: UTF8String, a: Agent): Any = {
    val t = tableFor(robots.toString, a.agent)
    t.crawlDelay match {
      case Some(d) => java.lang.Double.valueOf(d)
      case None    => null
    }
  }

  /** Longest-pattern-wins verdict; allow wins ties; default allow. */
  def allowed(robots: UTF8String, path: UTF8String, a: Agent): Boolean = {
    val t = tableFor(robots.toString, a.agent)
    val p = path.toString
    var bestLen = -1
    var bestAllow = true
    t.rules.foreach { case (allow, pattern) =>
      if (patternMatches(p, pattern)) {
        val len = pattern.length
        if (len > bestLen || (len == bestLen && allow && !bestAllow)) {
          bestLen = len; bestAllow = allow
        }
      }
    }
    bestAllow
  }
}

/** robots_allowed(robotsText, path) -> boolean under a fixed crawler
  * user-agent: RFC 9309 group resolution, `*`/`$` patterns,
  * longest-match precedence ([[RobotsKernel]]).
  */
case class RobotsAllowed(left: Expression, right: Expression,
    userAgent: String) extends BinaryExpression {
  require(userAgent != null && userAgent.nonEmpty && userAgent != "*",
    "robots_allowed: userAgent must be a concrete product token")
  @transient private lazy val agent = new RobotsKernel.Agent(userAgent)

  override def dataType: DataType = BooleanType
  override def prettyName: String = "robots_allowed"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"robots_allowed needs (string, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(robots: Any, path: Any): Any =
    RobotsKernel.allowed(robots.asInstanceOf[UTF8String],
      path.asInstanceOf[UTF8String], agent)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("robotsAgent", agent,
      classOf[RobotsKernel.Agent].getName)
    defineCodeGen(ctx, ev, (r, p) =>
      s"graft.functions.RobotsKernel.allowed($r, $p, $ref)")
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** robots_crawl_delay(robotsText) -> double seconds for a fixed crawler
  * user-agent (group-resolved like [[RobotsAllowed]]; null when no
  * binding group states one). The politeness scheduler's input.
  */
case class RobotsCrawlDelay(child: Expression, userAgent: String)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(userAgent != null && userAgent.nonEmpty && userAgent != "*",
    "robots_crawl_delay: userAgent must be a concrete product token")
  @transient private lazy val agent = new RobotsKernel.Agent(userAgent)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "robots_crawl_delay"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"robots_crawl_delay needs a string input, got ${t.simpleString}")
  }

  // nullSafeEval may itself return null (no delay stated) — the
  // UnaryExpression scaffolding handles a null child; a null RESULT is
  // legal for a nullable expression in interpreted mode
  override protected def nullSafeEval(robots: Any): Any =
    RobotsKernel.crawlDelay(robots.asInstanceOf[UTF8String], agent)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("robotsAgent", agent,
      classOf[RobotsKernel.Agent].getName)
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("delayObj")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = -1.0;
        if (!${childGen.isNull}) {
          Object $boxed = graft.functions.RobotsKernel.crawlDelay(
            ${childGen.value}, $ref);
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = ((java.lang.Double) $boxed).doubleValue();
          }
        }""")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
