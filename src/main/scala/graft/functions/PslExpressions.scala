package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Public Suffix List evaluation — the real eTLD+1 for crawl dedup
  * keys. The published `public_suffix_list.dat` grammar
  * (publicsuffix.org/list/): one rule per line, `//` comments, rules
  * are label sequences, a leading `*.` wildcard label matches exactly
  * one label, and a leading `!` marks an exception rule that beats
  * every other match. Prevailing rule = the exception if any matches,
  * else the longest matching rule, else the implicit default `*`
  * (every TLD is a public suffix).
  *
  * The rule table parses ONCE per JVM per distinct list (bounded LRU,
  * keyed by content hash — a full PSL is ~250 KB / ~9k rules; the
  * expression carries the raw text by reference in the task closure,
  * the Aho-Corasick device) and each host evaluates in
  * O(labels) hash probes, no per-rule scan.
  */
object PslKernel {

  /** The three parsed rule sets. Wildcards are supported in the
    * leftmost label position (`*.ck`) — the only position the published
    * list uses.
    */
  final class RuleTables(text: String) {
    val normal = new java.util.HashSet[String]()
    val wild = new java.util.HashSet[String]()   // the part after "*."
    val exc = new java.util.HashSet[String]()    // the part after "!"
    text.linesIterator.foreach { raw =>
      // rule = text up to first whitespace; comments and blanks skipped
      val line = raw.trim.takeWhile(!_.isWhitespace)
      if (line.nonEmpty && !line.startsWith("//")) {
        val rule = line.toLowerCase(java.util.Locale.ROOT)
        if (rule.startsWith("!")) exc.add(rule.substring(1))
        else if (rule.startsWith("*.")) wild.add(rule.substring(2))
        else if (rule != "*") normal.add(rule)
      }
    }
  }

  /** Serialization-friendly handle: ships only the raw TEXT with the
    * plan (codegen references included); the parsed hash sets rebuild
    * lazily through the JVM-wide content-keyed cache, so every task
    * copy on an executor shares ONE table set — the Aho-Corasick
    * Automaton/builtFor device.
    */
  final class Rules(val text: String) extends Serializable {
    @transient lazy val tables: RuleTables = PslKernel.tablesFor(text)
  }

  private val cache = new KernelCache[String, RuleTables](4)

  /** Key by a content digest, not the 250 KB text, so the LRU's key set
    * stays tiny however many list versions cycle through.
    */
  private[functions] def tablesFor(text: String): RuleTables = {
    val key = java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    cache.getOrCompute(key, _ => new RuleTables(text))
  }

  def cached(text: String): Rules = new Rules(text)

  /** Registrable domain (eTLD+1) of `host` under `rules`. Returns the
    * (normalized: lowercased, outer dots stripped) host itself when the
    * host IS a public suffix or a bare label — nothing to register
    * below it (the repo's registrableDomain convention; the PSL
    * algorithm proper says "undefined" there). Every return path is
    * normalized, so equal domains always produce equal dedup keys
    * regardless of input casing or a trailing dot.
    */
  def registrable(host: UTF8String, rules: Rules): UTF8String = {
    val h = host.toString.toLowerCase(java.util.Locale.ROOT)
      .stripPrefix(".").stripSuffix(".")
    if (h.isEmpty) return UTF8String.fromString(h)
    val t = rules.tables
    val labels = h.split('.')
    val n = labels.length
    // suffix of length L = labels[n-L..n-1]; build longest-first probes
    // from one backward pass so each candidate string allocates once
    val sufs = new Array[String](n + 1) // sufs(L) = suffix of length L
    var l = 1
    sufs(1) = labels(n - 1)
    while (l < n) { sufs(l + 1) = labels(n - l - 1) + "." + sufs(l); l += 1 }
    var psLen = 1 // implicit default rule `*`
    var excLen = -1
    l = 1
    while (l <= n) {
      val s = sufs(l)
      if (excLen < 0 && t.exc.contains(s)) excLen = l - 1
      if (t.normal.contains(s)) psLen = math.max(psLen, l)
      if (l >= 2 && t.wild.contains(sufs(l - 1)))
        psLen = math.max(psLen, l)
      l += 1
    }
    if (excLen >= 0) psLen = excLen // exception rules beat everything
    if (n <= psLen) UTF8String.fromString(h)
    else UTF8String.fromString(sufs(psLen + 1))
  }
}

/** registrable_domain_psl(host) -> string: eTLD+1 under a carried
  * Public Suffix List text ([[PslKernel]]) — wildcard and exception
  * rules included, unlike the compact-subset
  * [[graft.ops.Web.registrableDomain]].
  */
case class RegistrableDomainPsl(child: Expression, pslText: String)
  extends UnaryExpression {
  require(pslText != null && pslText.nonEmpty, "empty public suffix list")
  @transient private lazy val rules = PslKernel.cached(pslText)

  override def dataType: DataType = StringType
  override def prettyName: String = "registrable_domain_psl"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"registrable_domain_psl needs a string input, got ${t.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    PslKernel.registrable(v.asInstanceOf[UTF8String], rules)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pslRules", rules,
      classOf[PslKernel.Rules].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PslKernel.registrable($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
