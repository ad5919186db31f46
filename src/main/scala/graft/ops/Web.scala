package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-payload processing — the step between a crawl archive and a text
  * corpus: split HTTP responses out of WARC `response` payloads and
  * strip HTML down to text (the boilerplate-removal pass every
  * published web-corpus pipeline runs before quality filtering).
  *
  * Everything here is COMPOSED from built-in codegen'd expressions
  * (regexp/substring/replace) — no UDF, no custom kernel — so the whole
  * extraction rides whole-stage codegen inside the scan span, and an
  * external SQL engine can replay it operator for operator (the oracle
  * device: the same regex chain in the same order).
  *
  * The HTML strip is the deliberately simple tag-grammar pass (drop
  * script/style/comment blocks, drop tags, decode the common entities,
  * collapse whitespace) — the published C4/CCNet-class cleanup, not a
  * browser-grade DOM parse.
  */
object Web {

  /** HTTP head (status line + headers): everything before the first
    * CRLFCRLF. `substring_index` returns the whole string when the
    * separator is absent — a headerless payload yields itself as head
    * and an empty body, never an error.
    */
  def httpHead(payload: Column): Column =
    substring_index(payload, "\r\n\r\n", 1)

  /** Status code off the status line (null when not an HTTP response). */
  def httpStatus(payload: Column): Column =
    nullif(regexp_extract(payload, "^HTTP/[0-9.]+ (\\d{3})", 1), lit(""))
      .cast("int")

  /** Case-insensitive header value from the head block (first match),
    * parameters stripped (`text/html; charset=utf-8` -> `text/html`).
    */
  def httpHeader(payload: Column, name: String): Column =
    nullif(trim(regexp_extract(httpHead(payload),
      "(?im)^" + java.util.regex.Pattern.quote(name) + ":\\s*([^\\r\\n;]+)",
      1)), lit(""))

  /** Body: everything after the first CRLFCRLF (empty if none). */
  def httpBody(payload: Column): Column = {
    val head = httpHead(payload)
    when(length(payload) > length(head),
      payload.substr(length(head) + 5, length(payload)))
      .otherwise(lit(""))
  }

  /** HTML → text: script/style/comment blocks out, tags out, common
    * entities decoded, whitespace collapsed. Order matters (blocks
    * before tags — a tag-stripped script body would leak as text) and
    * is part of the contract the oracle replays.
    */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    // the frequent entities; &amp; LAST so "&amp;lt;" decodes to "&lt;"
    // (text), not "<" (double decode)
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
