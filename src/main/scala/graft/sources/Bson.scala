package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Minimal BSON codec (public BSON spec, bsonspec.org) — the document
  * subset MongoDB commands and change-stream events use: double, string,
  * document, array, binary, ObjectId, bool, UTC datetime, null, int32,
  * timestamp, int64, decimal128 (passed through opaquely). Little-endian
  * throughout; documents preserve field order (the first key of a command
  * document IS the command name).
  *
  * This is the Mongo sibling of [[PgOutput]]: the reference delegates the
  * wire format to the official driver ([`pkg/mongo/source.go`]); here it
  * is implemented from the published spec so the change-stream source has
  * no driver dependency.
  */
object Bson {

  /** Ordered document. */
  final case class BDoc(fields: Vector[(String, Any)]) {
    def get(name: String): Option[Any] = fields.collectFirst {
      case (k, v) if k == name => v
    }
    def doc(name: String): Option[BDoc] = get(name).collect { case d: BDoc => d }
    def arr(name: String): Option[Vector[Any]] = get(name).collect { case BArr(a) => a }
    def str(name: String): Option[String] = get(name).collect { case s: String => s }
    def int(name: String): Option[Int] = get(name).collect {
      case i: Int => i
      case l: Long => l.toInt
      case d: Double => d.toInt
    }
    def long(name: String): Option[Long] = get(name).collect {
      case i: Int => i.toLong
      case l: Long => l
      case d: Double => d.toLong
    }
  }
  object BDoc {
    def apply(fields: (String, Any)*): BDoc = BDoc(fields.toVector)
  }
  final case class BArr(items: Vector[Any])
  object BArr {
    def apply(items: Any*): BArr = BArr(items.toVector)
  }
  final case class BBin(subtype: Byte, bytes: Array[Byte])
  final case class BOid(hex: String) {
    require(hex.length == 24, s"ObjectId must be 24 hex chars, got '$hex'")
  }
  final case class BDate(millis: Long)
  final case class BTs(t: Int, i: Int)
  final case class BDec128(bits: Array[Byte]) // opaque pass-through

  // --------------------------------------------------------------- encode

  def encode(doc: BDoc): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeDoc(out, doc)
    out.toByteArray
  }

  private def writeDoc(out: java.io.ByteArrayOutputStream, doc: BDoc): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    doc.fields.foreach { case (name, value) => writeElement(body, name, value) }
    val b = body.toByteArray
    writeInt(out, b.length + 5)
    out.write(b, 0, b.length)
    out.write(0)
  }

  private def writeElement(out: java.io.ByteArrayOutputStream, name: String,
      value: Any): Unit = {
    def header(tpe: Int): Unit = {
      out.write(tpe)
      val n = name.getBytes(StandardCharsets.UTF_8)
      out.write(n, 0, n.length)
      out.write(0)
    }
    value match {
      case d: Double => header(0x01); writeLong(out, java.lang.Double.doubleToLongBits(d))
      case s: String =>
        header(0x02)
        val b = s.getBytes(StandardCharsets.UTF_8)
        writeInt(out, b.length + 1); out.write(b, 0, b.length); out.write(0)
      case d: BDoc => header(0x03); writeDoc(out, d)
      case BArr(items) =>
        header(0x04)
        writeDoc(out, BDoc(items.zipWithIndex.map { case (v, i) => i.toString -> v }))
      case BBin(sub, bytes) =>
        header(0x05); writeInt(out, bytes.length); out.write(sub); out.write(bytes, 0, bytes.length)
      case BOid(hex) =>
        header(0x07)
        hex.grouped(2).foreach(h => out.write(Integer.parseInt(h, 16)))
      case b: Boolean => header(0x08); out.write(if (b) 1 else 0)
      case BDate(ms) => header(0x09); writeLong(out, ms)
      case null => header(0x0A)
      case i: Int => header(0x10); writeInt(out, i)
      case BTs(t, i) => header(0x11); writeInt(out, i); writeInt(out, t)
      case l: Long => header(0x12); writeLong(out, l)
      case BDec128(bits) => header(0x13); out.write(bits, 0, 16)
      case other => throw new IllegalArgumentException(
        s"cannot BSON-encode ${other.getClass.getName} at '$name'")
    }
  }

  private def writeInt(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
    out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
  }
  private def writeLong(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    writeInt(out, v.toInt); writeInt(out, (v >>> 32).toInt)
  }

  // --------------------------------------------------------------- decode

  /** Decode the document starting at `offset`; returns (doc, bytesRead). */
  def decode(bytes: Array[Byte], offset: Int = 0): (BDoc, Int) = {
    val buf = ByteBuffer.wrap(bytes, offset, bytes.length - offset)
      .order(ByteOrder.LITTLE_ENDIAN)
    val doc = readDoc(buf)
    (doc, buf.position() - offset)
  }

  private def readDoc(buf: ByteBuffer): BDoc = {
    val start = buf.position()
    val len = buf.getInt()
    // overflow-safe: `start + len` wraps negative for len near Int.MaxValue
    // and would pass a `start + len <= limit` guard
    require(len >= 5 && len <= buf.limit() - start,
      s"bad BSON document length $len at $start (limit ${buf.limit()})")
    val fields = Vector.newBuilder[(String, Any)]
    var tpe = buf.get()
    while (tpe != 0) {
      val name = readCString(buf)
      fields += name -> readValue(buf, tpe)
      tpe = buf.get()
    }
    require(buf.position() - start == len,
      s"BSON document length mismatch: declared $len, read ${buf.position() - start}")
    readDocResult(fields.result())
  }

  // split out so readDoc stays tail-compact
  private def readDocResult(fields: Vector[(String, Any)]): BDoc = BDoc(fields)

  private def readValue(buf: ByteBuffer, tpe: Byte): Any = (tpe: @annotation.switch) match {
    case 0x01 => java.lang.Double.longBitsToDouble(buf.getLong())
    case 0x02 => readString(buf)
    case 0x03 => readDoc(buf)
    case 0x04 =>
      val d = readDoc(buf)
      BArr(d.fields.map(_._2))
    case 0x05 =>
      val len = buf.getInt()
      val sub = buf.get()
      val b = new Array[Byte](len); buf.get(b)
      BBin(sub, b)
    case 0x06 => null // undefined (deprecated) -> null
    case 0x07 =>
      val b = new Array[Byte](12); buf.get(b)
      BOid(b.map(x => f"${x & 0xFF}%02x").mkString)
    case 0x08 => buf.get() != 0
    case 0x09 => BDate(buf.getLong())
    case 0x0A => null
    case 0x10 => buf.getInt()
    case 0x11 =>
      val i = buf.getInt(); val t = buf.getInt()
      BTs(t, i)
    case 0x12 => buf.getLong()
    case 0x13 =>
      val b = new Array[Byte](16); buf.get(b)
      BDec128(b)
    case other => throw new IllegalArgumentException(
      f"unsupported BSON type 0x$other%02x")
  }

  private def readString(buf: ByteBuffer): String = {
    val len = buf.getInt()
    require(len >= 1, s"bad BSON string length $len")
    val b = new Array[Byte](len - 1)
    buf.get(b)
    require(buf.get() == 0, "BSON string missing NUL")
    new String(b, StandardCharsets.UTF_8)
  }

  private def readCString(buf: ByteBuffer): String = {
    val start = buf.position()
    while (buf.get() != 0) {}
    val len = buf.position() - start - 1
    new String(buf.array(), buf.arrayOffset() + start, len, StandardCharsets.UTF_8)
  }

  // ------------------------------------------------------------ to JSON —

  /** Render a decoded document as JSON in the extended-JSON-ish shape
    * [[ChangeStreamDecoder]] consumes: scalars plain, ObjectId as
    * `{"$oid": ...}`, timestamp as `{"$timestamp": {"t":..,"i":..}}`,
    * datetime as `{"$date": millis}`, binary as base64 `{"$binary":
    * {"base64":..,"subType":..}}`.
    */
  def toJson(doc: BDoc): String = {
    val sb = new StringBuilder
    renderDoc(sb, doc)
    sb.toString
  }

  private def renderDoc(sb: StringBuilder, doc: BDoc): Unit = {
    sb.append('{')
    var first = true
    doc.fields.foreach { case (k, v) =>
      if (!first) sb.append(',')
      first = false
      renderString(sb, k); sb.append(':')
      renderValue(sb, v)
    }
    sb.append('}')
  }

  private def renderValue(sb: StringBuilder, v: Any): Unit = v match {
    case null => sb.append("null")
    case s: String => renderString(sb, s)
    case i: Int => sb.append(i)
    case l: Long => sb.append(l)
    case d: Double =>
      if (d.isNaN || d.isInfinite) renderString(sb, d.toString) else sb.append(d)
    case b: Boolean => sb.append(b)
    case d: BDoc => renderDoc(sb, d)
    case BArr(items) =>
      sb.append('[')
      var first = true
      items.foreach { it =>
        if (!first) sb.append(','); first = false
        renderValue(sb, it)
      }
      sb.append(']')
    case BOid(hex) => sb.append("{\"$oid\":"); renderString(sb, hex); sb.append('}')
    case BTs(t, i) => sb.append(s"""{"$$timestamp":{"t":$t,"i":$i}}""")
    case BDate(ms) => sb.append(s"""{"$$date":$ms}""")
    case BBin(sub, bytes) =>
      sb.append("{\"$binary\":{\"base64\":")
      renderString(sb, java.util.Base64.getEncoder.encodeToString(bytes))
      sb.append(f""","subType":"$sub%02x"}}""")
    case BDec128(bits) =>
      sb.append("{\"$decimal128\":")
      renderString(sb, java.util.Base64.getEncoder.encodeToString(bits))
      sb.append('}')
    case other => renderString(sb, other.toString)
  }

  private def renderString(sb: StringBuilder, s: String): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }
}
