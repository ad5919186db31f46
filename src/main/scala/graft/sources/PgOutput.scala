package graft.sources

import java.nio.charset.StandardCharsets

/** Pure byte-level decoder for PostgreSQL's logical-replication wire
  * traffic: the outer streaming-replication frames (XLogData / primary
  * keepalive, PG docs "Streaming Replication Protocol") and the inner
  * `pgoutput` logical messages (PG docs "Logical Replication Message
  * Formats", protocol version 1 + the 'b' binary tuple kind of v2).
  *
  * This is the offline-testable half of the reference's WAL source: the
  * reference delegates byte decode to the pglogrepl library and keeps the
  * dispatch semantics (`pkg/postgres/source.go:181-221` relation caching,
  * `:223-377` insert/update/delete handling, `:379-401` commit/LSN
  * advance); here BOTH halves are implemented and unit-tested against
  * synthesized frames — only the socket transport (`ReplicationTransport`)
  * needs a live server.
  *
  * All integers are big-endian; strings are NUL-terminated; timestamps are
  * microseconds since the PostgreSQL epoch 2000-01-01T00:00:00Z.
  */
object PgOutput {

  /** Microseconds between the Unix and PostgreSQL epochs. */
  val PgEpochMicros: Long = 946684800000000L

  def pgMicrosToEpochMillis(pgMicros: Long): Long =
    (pgMicros + PgEpochMicros) / 1000L

  def epochMillisToPgMicros(ms: Long): Long =
    ms * 1000L - PgEpochMicros

  /** LSN rendered the way PostgreSQL (and the reference's checkpoints,
    * `pkg/postgres/source.go:241` `s.currentLSN.String()`) print it:
    * `XXXXXXXX/XXXXXXXX` — upper/lower 32 bits in uppercase hex.
    */
  def formatLsn(lsn: Long): String =
    f"${(lsn >>> 32).toInt & 0xFFFFFFFFL}%X/${lsn.toInt & 0xFFFFFFFFL}%X"

  def parseLsn(s: String): Long = s.split('/') match {
    case Array(hi, lo) => (java.lang.Long.parseLong(hi, 16) << 32) |
      java.lang.Long.parseLong(lo, 16)
    case _ => throw new IllegalArgumentException(s"bad LSN: $s")
  }

  // ------------------------------------------------------------------ ADTs

  /** Outer replication frames (first byte of each CopyData payload). */
  sealed trait ReplicationFrame
  /** 'k' — serverWalEnd, serverClock, replyRequested
    * (reference handling: `pkg/postgres/source.go:131-152`).
    */
  case class PrimaryKeepalive(serverWalEnd: Long, serverTimeMicros: Long,
      replyRequested: Boolean) extends ReplicationFrame
  /** 'w' — WAL section carrying one logical message
    * (reference handling: `pkg/postgres/source.go:153-161`).
    */
  case class XLogData(walStart: Long, serverWalEnd: Long,
      serverTimeMicros: Long, data: Array[Byte]) extends ReplicationFrame

  /** Inner pgoutput logical messages. */
  sealed trait LogicalMessage
  case class BeginMessage(finalLsn: Long, commitTimeMicros: Long, xid: Long)
      extends LogicalMessage
  case class CommitMessage(flags: Int, commitLsn: Long, endLsn: Long,
      commitTimeMicros: Long) extends LogicalMessage
  case class OriginMessage(originLsn: Long, name: String) extends LogicalMessage
  case class RelationColumn(flags: Int, name: String, typeOid: Int, typeMod: Int)
  case class RelationMessage(relationId: Int, namespace: String,
      relationName: String, replicaIdentity: Byte,
      columns: IndexedSeq[RelationColumn]) extends LogicalMessage
  case class TypeMessage(typeOid: Int, namespace: String, name: String)
      extends LogicalMessage
  case class InsertMessage(relationId: Int, tuple: TupleData) extends LogicalMessage
  /** oldKind: 'K' (replica-identity key) | 'O' (full old row) | 0 (absent). */
  case class UpdateMessage(relationId: Int, oldKind: Byte,
      oldTuple: Option[TupleData], newTuple: TupleData) extends LogicalMessage
  case class DeleteMessage(relationId: Int, oldKind: Byte, oldTuple: TupleData)
      extends LogicalMessage
  case class TruncateMessage(options: Int, relationIds: IndexedSeq[Int])
      extends LogicalMessage

  /** One tuple column: kind 'n' (null), 'u' (unchanged TOAST, value
    * absent), 't' (text, length-prefixed), 'b' (binary, length-prefixed).
    */
  case class TupleColumn(kind: Byte, data: Array[Byte])
  case class TupleData(columns: IndexedSeq[TupleColumn])

  // --------------------------------------------------------------- decode

  /** Strict-bounds reader: every read checks the buffer first. Without
    * this, `Arrays.copyOfRange` would ZERO-PAD past the end of a
    * truncated frame and a cut-off tuple value would decode silently
    * with fabricated bytes — truncation must be an error, not data.
    */
  private final class Reader(buf: Array[Byte]) {
    private var pos = 0
    // overflow-safe form: `pos + n > buf.length` wraps negative for n near
    // Int.MaxValue and would bypass the guard (surfacing later as a
    // confusing copyOfRange error instead of the truncation message)
    private def need(n: Int): Unit =
      if (n < 0 || n > buf.length - pos)
        throw new IllegalArgumentException(
          s"truncated pgoutput message: need $n bytes at offset $pos of ${buf.length}")
    def u8(): Int = { need(1); val v = buf(pos) & 0xFF; pos += 1; v }
    def i16(): Int = (u8() << 8) | u8()
    def i32(): Int = (i16() << 16) | i16()
    def i64(): Long = ((i32().toLong & 0xFFFFFFFFL) << 32) | (i32().toLong & 0xFFFFFFFFL)
    def byte(): Byte = { need(1); val v = buf(pos); pos += 1; v }
    def bytes(n: Int): Array[Byte] = {
      need(n)
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
    }
    def cstring(): String = {
      val start = pos
      while (pos < buf.length && buf(pos) != 0) pos += 1
      if (pos >= buf.length)
        throw new IllegalArgumentException(
          s"truncated pgoutput message: unterminated string at offset $start")
      val s = new String(buf, start, pos - start, StandardCharsets.UTF_8)
      pos += 1 // NUL
      s
    }
    def remaining(): Array[Byte] =
      java.util.Arrays.copyOfRange(buf, pos, buf.length)
    def hasMore: Boolean = pos < buf.length
  }

  /** Decode one outer CopyData payload ('w' XLogData or 'k' keepalive).
    * Unknown frame types raise — callers that want the reference's
    * ignore-unknown behavior (`pkg/postgres/source.go:164-168`) catch at
    * the session layer.
    */
  def decodeFrame(payload: Array[Byte]): ReplicationFrame = {
    require(payload.nonEmpty, "empty replication frame")
    val r = new Reader(payload)
    r.byte() match {
      case 'k' =>
        PrimaryKeepalive(r.i64(), r.i64(), r.u8() != 0)
      case 'w' =>
        XLogData(r.i64(), r.i64(), r.i64(), r.remaining())
      case other =>
        throw new IllegalArgumentException(
          s"unknown replication frame type '${other.toChar}'")
    }
  }

  /** Decode one pgoutput logical message (the XLogData body). */
  def decodeLogical(data: Array[Byte]): LogicalMessage = {
    require(data.nonEmpty, "empty logical message")
    val r = new Reader(data)
    (r.byte(): @annotation.switch) match {
      case 'B' => BeginMessage(r.i64(), r.i64(), r.i32().toLong & 0xFFFFFFFFL)
      case 'C' => CommitMessage(r.u8(), r.i64(), r.i64(), r.i64())
      case 'O' => OriginMessage(r.i64(), r.cstring())
      case 'R' =>
        val id = r.i32()
        val ns = r.cstring()
        val name = r.cstring()
        val replident = r.byte()
        val ncols = r.i16()
        val cols = (0 until ncols).map { _ =>
          RelationColumn(r.u8(), r.cstring(), r.i32(), r.i32())
        }
        RelationMessage(id, ns, name, replident, cols)
      case 'Y' => TypeMessage(r.i32(), r.cstring(), r.cstring())
      case 'I' =>
        val id = r.i32()
        val n = r.byte()
        require(n == 'N', s"INSERT expects 'N' tuple, got '${n.toChar}'")
        InsertMessage(id, tupleData(r))
      case 'U' =>
        val id = r.i32()
        val kind = r.byte()
        if (kind == 'K' || kind == 'O') {
          val old = tupleData(r)
          val n = r.byte()
          require(n == 'N', s"UPDATE expects 'N' new tuple, got '${n.toChar}'")
          UpdateMessage(id, kind, Some(old), tupleData(r))
        } else {
          require(kind == 'N', s"UPDATE expects 'K'|'O'|'N', got '${kind.toChar}'")
          UpdateMessage(id, 0, None, tupleData(r))
        }
      case 'D' =>
        val id = r.i32()
        val kind = r.byte()
        require(kind == 'K' || kind == 'O',
          s"DELETE expects 'K'|'O' tuple, got '${kind.toChar}'")
        DeleteMessage(id, kind, tupleData(r))
      case 'T' =>
        val nrel = r.i32()
        val options = r.u8()
        TruncateMessage(options, (0 until nrel).map(_ => r.i32()))
      case other =>
        throw new IllegalArgumentException(
          s"unknown pgoutput message type '${other.toChar}'")
    }
  }

  private def tupleData(r: Reader): TupleData = {
    val ncols = r.i16()
    TupleData((0 until ncols).map { _ =>
      r.byte() match {
        case k @ ('n' | 'u') => TupleColumn(k, null)
        case k @ ('t' | 'b') => TupleColumn(k, r.bytes(r.i32()))
        case other =>
          throw new IllegalArgumentException(
            s"unknown tuple column kind '${other.toChar}'")
      }
    })
  }

  // -------------------------------------------------- tuple -> value maps

  private val OidInt4 = 23
  private val OidInt8 = 20

  /** Reference-parity typed map (`tupleToMap`,
    * `pkg/postgres/source.go:403-445`): text values for int4/int8 columns
    * are coerced to Int/Long when they parse (kept as the raw string when
    * they don't), `'n'` -> null, `'u'` (unchanged TOAST) -> absent, `'b'`
    * -> raw bytes, everything else stays a string.
    */
  def tupleToMap(rel: RelationMessage, tuple: TupleData): Map[String, Any] = {
    val b = Map.newBuilder[String, Any]
    var i = 0
    val n = math.min(rel.columns.length, tuple.columns.length)
    while (i < n) {
      val col = rel.columns(i)
      val tc = tuple.columns(i)
      tc.kind match {
        case 'n' => b += col.name -> null
        case 'u' => // unchanged TOAST: value not transmitted, omit
        case 'b' => b += col.name -> tc.data
        case _ =>
          val s = new String(tc.data, StandardCharsets.UTF_8)
          val v: Any = col.typeOid match {
            case OidInt4 => s.toIntOption.getOrElse(s)
            case OidInt8 => s.toLongOption.getOrElse(s)
            case _ => s
          }
          b += col.name -> v
      }
      i += 1
    }
    b.result()
  }

  /** String-valued map for the engine's raw-change rows
    * (ChangeSource.rawSchema uses map<string,string> — PG's text protocol
    * keeps every value a string anyway). `'b'` binary becomes base64.
    */
  def tupleToStringMap(rel: RelationMessage, tuple: TupleData): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    var i = 0
    val n = math.min(rel.columns.length, tuple.columns.length)
    while (i < n) {
      val col = rel.columns(i)
      val tc = tuple.columns(i)
      tc.kind match {
        case 'n' => b += col.name -> null
        case 'u' => // unchanged TOAST: omit
        case 'b' => b += col.name ->
          java.util.Base64.getEncoder.encodeToString(tc.data)
        case _ => b += col.name -> new String(tc.data, StandardCharsets.UTF_8)
      }
      i += 1
    }
    b.result()
  }

  // --------------------------------------------------------------- encode

  /** Standby status update ('r') — the one frame the CLIENT sends: written
    * on keepalive reply-requests and as the 30 s proactive heartbeat.
    * Positions are passed through raw, matching the reference, which
    * reports write=flush=apply at the server's WAL end (keepalive reply,
    * `pkg/postgres/source.go:140-152`) or the just-committed LSN
    * (heartbeat, `:384-398`).
    */
  def encodeStandbyStatusUpdate(walPosition: Long, clientTimeMicros: Long,
      replyRequested: Boolean = false): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(1 + 8 * 4 + 1)
    buf.put('r'.toByte)
    buf.putLong(walPosition) // write
    buf.putLong(walPosition) // flush
    buf.putLong(walPosition) // apply
    buf.putLong(clientTimeMicros)
    buf.put(if (replyRequested) 1.toByte else 0.toByte)
    buf.array()
  }
}
