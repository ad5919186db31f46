package graft.sources

import graft.SparkTestSession
import graft.sources.PgOutput._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Synthesized pgoutput wire frames (formats per the public PostgreSQL
  * docs, "Logical Replication Message Formats" — encoders live in test
  * code only; the engine ships the decoder).
  */
object Frames {
  private def buf(n: Int) = ByteBuffer.allocate(n)
  private def cstr(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    java.util.Arrays.copyOf(b, b.length + 1) // NUL
  }
  private def concat(parts: Array[Byte]*): Array[Byte] = {
    val out = buf(parts.map(_.length).sum)
    parts.foreach(out.put)
    out.array()
  }

  def keepalive(walEnd: Long, timeMicros: Long, reply: Boolean): Array[Byte] =
    buf(26).put('k'.toByte).putLong(walEnd).putLong(timeMicros)
      .put(if (reply) 1.toByte else 0.toByte).array()

  def xlog(walStart: Long, body: Array[Byte]): Array[Byte] =
    concat(buf(25).put('w'.toByte).putLong(walStart).putLong(walStart)
      .putLong(0L).array(), body)

  def begin(finalLsn: Long, commitTimeMicros: Long, xid: Int): Array[Byte] =
    buf(21).put('B'.toByte).putLong(finalLsn).putLong(commitTimeMicros)
      .putInt(xid).array()

  def commit(commitLsn: Long, endLsn: Long, timeMicros: Long): Array[Byte] =
    buf(26).put('C'.toByte).put(0.toByte).putLong(commitLsn).putLong(endLsn)
      .putLong(timeMicros).array()

  def origin(lsn: Long, name: String): Array[Byte] =
    concat(buf(9).put('O'.toByte).putLong(lsn).array(), cstr(name))

  def typeMsg(oid: Int, ns: String, name: String): Array[Byte] =
    concat(buf(5).put('Y'.toByte).putInt(oid).array(), cstr(ns), cstr(name))

  def relation(id: Int, ns: String, name: String,
      cols: Seq[(String, Int)]): Array[Byte] = {
    val head = concat(buf(5).put('R'.toByte).putInt(id).array(),
      cstr(ns), cstr(name),
      buf(3).put('d'.toByte).putShort(cols.size.toShort).array())
    val colBytes = cols.map { case (cname, oid) =>
      concat(buf(1).put(1.toByte).array(), cstr(cname),
        buf(8).putInt(oid).putInt(-1).array())
    }
    concat(head +: colBytes: _*)
  }

  /** kind 't' with the given string, or 'n'/'u' (null data). */
  def tuple(cols: Seq[(Char, String)]): Array[Byte] = {
    val head = buf(2).putShort(cols.size.toShort).array()
    val parts = cols.map {
      case ('t', v) =>
        val d = v.getBytes(StandardCharsets.UTF_8)
        concat(buf(5).put('t'.toByte).putInt(d.length).array(), d)
      case ('b', v) =>
        val d = v.getBytes(StandardCharsets.UTF_8)
        concat(buf(5).put('b'.toByte).putInt(d.length).array(), d)
      case (k, _) => Array(k.toByte)
    }
    concat(head +: parts: _*)
  }

  def insert(relId: Int, cols: Seq[(Char, String)]): Array[Byte] =
    concat(buf(6).put('I'.toByte).putInt(relId).put('N'.toByte).array(),
      tuple(cols))

  def update(relId: Int, oldKind: Option[Char], oldCols: Seq[(Char, String)],
      newCols: Seq[(Char, String)]): Array[Byte] = oldKind match {
    case Some(k) => concat(
      buf(6).put('U'.toByte).putInt(relId).put(k.toByte).array(),
      tuple(oldCols), Array('N'.toByte), tuple(newCols))
    case None => concat(
      buf(6).put('U'.toByte).putInt(relId).put('N'.toByte).array(),
      tuple(newCols))
  }

  def delete(relId: Int, kind: Char, oldCols: Seq[(Char, String)]): Array[Byte] =
    concat(buf(6).put('D'.toByte).putInt(relId).put(kind.toByte).array(),
      tuple(oldCols))

  def truncate(options: Int, relIds: Seq[Int]): Array[Byte] = {
    val b = buf(5 + 1 + 4 * relIds.size)
    b.put('T'.toByte).putInt(relIds.size).put(options.toByte)
    relIds.foreach(b.putInt)
    b.array()
  }

  /** users(id int4, big int8, name text) */
  val usersRel: Array[Byte] =
    relation(16384, "public", "users", Seq(("id", 23), ("big", 20), ("name", 25)))
}

class PgOutputDecoderSpec extends AnyFunSuite {
  import Frames._

  test("LSN formats and parses in PG's X/X hex form") {
    assert(formatLsn(0x16B374D848L) == "16/B374D848")
    assert(formatLsn(1L) == "0/1")
    assert(parseLsn("16/B374D848") == 0x16B374D848L)
    assert(parseLsn(formatLsn(Long.MaxValue)) == Long.MaxValue)
  }

  test("keepalive frame decodes (reply flag both ways)") {
    assert(decodeFrame(keepalive(77L, 123L, reply = true)) ==
      PrimaryKeepalive(77L, 123L, replyRequested = true))
    assert(decodeFrame(keepalive(0L, 0L, reply = false)) ==
      PrimaryKeepalive(0L, 0L, replyRequested = false))
  }

  test("XLogData frame carries the logical payload through") {
    val f = decodeFrame(xlog(9L, begin(10L, 0L, 5))).asInstanceOf[XLogData]
    assert(f.walStart == 9L)
    assert(decodeLogical(f.data) == BeginMessage(10L, 0L, 5L))
  }

  test("unknown frame and message types raise") {
    intercept[IllegalArgumentException](decodeFrame(Array('z'.toByte)))
    intercept[IllegalArgumentException](decodeLogical(Array('z'.toByte)))
  }

  test("Begin / Commit / Origin / Type / Truncate decode") {
    assert(decodeLogical(begin(0x10L, 99L, 42)) == BeginMessage(0x10L, 99L, 42L))
    assert(decodeLogical(commit(0x10L, 0x11L, 99L)) ==
      CommitMessage(0, 0x10L, 0x11L, 99L))
    assert(decodeLogical(origin(7L, "origin1")) == OriginMessage(7L, "origin1"))
    assert(decodeLogical(typeMsg(3802, "pg_catalog", "jsonb")) ==
      TypeMessage(3802, "pg_catalog", "jsonb"))
    assert(decodeLogical(truncate(1, Seq(16384, 16390))) ==
      TruncateMessage(1, IndexedSeq(16384, 16390)))
  }

  test("Relation decodes id, namespace, name, replica identity and columns") {
    val rel = decodeLogical(usersRel).asInstanceOf[RelationMessage]
    assert(rel.relationId == 16384)
    assert(rel.namespace == "public" && rel.relationName == "users")
    assert(rel.replicaIdentity == 'd')
    assert(rel.columns.map(c => (c.name, c.typeOid)) ==
      IndexedSeq(("id", 23), ("big", 20), ("name", 25)))
    assert(rel.columns.forall(c => c.flags == 1 && c.typeMod == -1))
  }

  test("Insert / Update / Delete decode with all tuple kinds") {
    val ins = decodeLogical(insert(16384,
      Seq(('t', "1"), ('n', null), ('u', null)))).asInstanceOf[InsertMessage]
    assert(ins.relationId == 16384)
    assert(ins.tuple.columns.map(_.kind.toChar) == IndexedSeq('t', 'n', 'u'))
    assert(new String(ins.tuple.columns(0).data) == "1")

    val updFull = decodeLogical(update(16384, Some('O'),
      Seq(('t', "1"), ('t', "2"), ('t', "old")),
      Seq(('t', "1"), ('t', "2"), ('t', "new")))).asInstanceOf[UpdateMessage]
    assert(updFull.oldKind == 'O' && updFull.oldTuple.isDefined)
    assert(new String(updFull.newTuple.columns(2).data) == "new")

    val updNoOld = decodeLogical(update(16384, None, Nil,
      Seq(('t', "1"), ('t', "2"), ('t', "x")))).asInstanceOf[UpdateMessage]
    assert(updNoOld.oldTuple.isEmpty && updNoOld.oldKind == 0)

    val del = decodeLogical(delete(16384, 'K',
      Seq(('t', "1"), ('n', null), ('n', null)))).asInstanceOf[DeleteMessage]
    assert(del.oldKind == 'K')
    assert(new String(del.oldTuple.columns(0).data) == "1")

    val bin = decodeLogical(insert(16384, Seq(('b', ""))))
      .asInstanceOf[InsertMessage]
    assert(bin.tuple.columns(0).kind == 'b')
  }

  test("tupleToMap applies the reference's int4/int8 text coercions") {
    val rel = decodeLogical(usersRel).asInstanceOf[RelationMessage]
    val m = tupleToMap(rel, decodeLogical(insert(16384,
      Seq(('t', "42"), ('t', "9999999999"), ('t', "bob"))))
      .asInstanceOf[InsertMessage].tuple)
    assert(m("id") == 42 && m("id").isInstanceOf[Int])
    assert(m("big") == 9999999999L && m("big").isInstanceOf[Long])
    assert(m("name") == "bob")

    // non-parsing int columns fall back to the raw string (source.go:417-431)
    val bad = tupleToMap(rel, decodeLogical(insert(16384,
      Seq(('t', "not-a-number"), ('t', "x"), ('n', null))))
      .asInstanceOf[InsertMessage].tuple)
    assert(bad("id") == "not-a-number" && bad("big") == "x")
    assert(bad("name") == null)

    // unchanged-TOAST columns are omitted, binary stays bytes
    val mixed = tupleToMap(rel, decodeLogical(insert(16384,
      Seq(('t', "1"), ('u', null), ('b', "zz"))))
      .asInstanceOf[InsertMessage].tuple)
    assert(!mixed.contains("big"))
    assert(mixed("name").asInstanceOf[Array[Byte]].sameElements("zz".getBytes))
  }

  test("session: changes carry their OWN transaction's commit LSN") {
    val t = new ScriptedTransport(Seq(
      xlog(1, usersRel),
      // commit time = 5 s after the PG epoch (2000-01-01T00:00:05Z)
      xlog(2, begin(finalLsn = 100, commitTimeMicros = 5000000L, xid = 7)),
      xlog(3, insert(16384, Seq(('t', "1"), ('t', "10"), ('t', "a")))),
      xlog(4, insert(16384, Seq(('t', "2"), ('t', "20"), ('t', "b")))),
      xlog(5, commit(100, 101, 0)),
      xlog(6, begin(finalLsn = 200, commitTimeMicros = 0L, xid = 8)),
      xlog(7, update(16384, Some('O'),
        Seq(('t', "1"), ('t', "10"), ('t', "a")),
        Seq(('t', "1"), ('t', "10"), ('t', "a2")))),
      xlog(8, delete(16384, 'K', Seq(('t', "2"), ('n', null), ('n', null)))),
      xlog(9, commit(200, 201, 0))))
    val s = new PgOutputSession(t)

    val c1 = s.poll().get
    assert(c1.op == "c" && c1.commitLsn == 100 && c1.xid == 7)
    assert(c1.namespace == "public" && c1.table == "users")
    assert(c1.before == null)
    assert(c1.after == Map("id" -> "1", "big" -> "10", "name" -> "a"))
    // PG epoch + 5 s => unix epoch ms
    assert(c1.commitTimeMillis == 946684800000L + 5000L)
    assert(s.poll().get.commitLsn == 100)
    assert(s.currentLsn == 0L, "LSN advances only on Commit")

    val u = s.poll().get
    assert(s.currentLsn == 100L)
    assert(u.op == "u" && u.commitLsn == 200 && u.xid == 8)
    assert(u.before("name") == "a" && u.after("name") == "a2")

    val d = s.poll().get
    assert(d.op == "d" && d.after == null)
    assert(d.before == Map("id" -> "2", "big" -> null, "name" -> null))

    assert(s.poll().isEmpty)
    assert(s.currentLsn == 200L)
    assert(s.relationCount == 1)
  }

  test("session replies to keepalives only when requested") {
    val t = new ScriptedTransport(Seq(
      keepalive(500L, 1L, reply = false),
      keepalive(600L, 2L, reply = true)))
    val s = new PgOutputSession(t, clock = () => 946684800000L + 1000L)
    assert(s.poll().isEmpty)
    assert(t.sent.size == 1, "reply only to the requested keepalive")
    val r = ByteBuffer.wrap(t.sent.head)
    assert(r.get() == 'r'.toByte)
    assert(r.getLong == 600L && r.getLong == 600L && r.getLong == 600L)
    assert(r.getLong == 1000000L) // client clock in PG micros
    assert(r.get() == 0.toByte)
  }

  test("session sends the 30s proactive heartbeat on commit") {
    var now = 0L
    val t = new ScriptedTransport(Seq(
      xlog(1, usersRel),
      xlog(2, begin(10, 0, 1)), xlog(3, commit(10, 11, 0)),
      xlog(4, begin(20, 0, 2)), xlog(5, commit(20, 21, 0)),
      xlog(6, begin(30, 0, 3)), xlog(7, commit(30, 31, 0))))
    val s = new PgOutputSession(t, heartbeatMillis = 30000L, clock = () => now)
    now = 10000L
    assert(s.poll().isEmpty) // drains everything; commits at t=10s, 10s, 10s
    assert(t.sent.isEmpty, "no heartbeat within the 30s window")

    val t2 = new ScriptedTransport(Seq(
      xlog(1, usersRel),
      xlog(2, begin(10, 0, 1)), xlog(3, commit(10, 11, 0))))
    var now2 = 0L
    val s2 = new PgOutputSession(t2, heartbeatMillis = 30000L, clock = () => now2)
    now2 = 31000L
    assert(s2.poll().isEmpty)
    assert(t2.sent.size == 1)
    val r = ByteBuffer.wrap(t2.sent.head)
    assert(r.get() == 'r'.toByte && r.getLong == 10L)
  }

  test("insert for an uncached relation raises (source.go:225-227 parity)") {
    val t = new ScriptedTransport(Seq(
      xlog(1, begin(10, 0, 1)),
      xlog(2, insert(999, Seq(('t', "1"))))))
    val s = new PgOutputSession(t)
    val ex = intercept[IllegalStateException](s.poll())
    assert(ex.getMessage.contains("999"))
  }

  test("end-to-end: synthesized WAL bytes -> DSv2 stream -> raw change rows") {
    val spark = SparkTestSession.spark
    val tid = "pgdec-e2e"
    PgTransports.clear(tid)
    PgTransports.register(tid, new ScriptedTransport(Seq(
      xlog(1, usersRel),
      xlog(2, begin(100, 946684800000000L, 7)),
      xlog(3, insert(16384, Seq(('t', "1"), ('t', "10"), ('t', "alice")))),
      xlog(4, insert(16384, Seq(('t', "2"), ('t', "20"), ('t', "bob")))),
      xlog(5, commit(100, 101, 0)),
      xlog(6, begin(200, 946684800000000L, 8)),
      xlog(7, delete(16384, 'K', Seq(('t', "1"), ('n', null), ('n', null)))),
      xlog(8, commit(200, 201, 0)))))

    val out = Files.createTempDirectory("pgdec-out").toString
    val ckpt = Files.createTempDirectory("pgdec-ckpt").toString
    val q = spark.readStream
      .format("graft.sources.CdcSourceProvider")
      .option("wal.client", "graft.sources.PgOutputWalClient")
      .option("pg.transport.id", tid)
      .option("pg.database", "appdb")
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.read.parquet(out).orderBy("lsn", "op").collect()
      assert(rows.length == 3)
      val ins = rows.filter(_.getAs[String]("op") == "c")
      assert(ins.map(_.getAs[Map[String, String]]("after")("name")).toSet ==
        Set("alice", "bob"))
      assert(ins.forall(_.getAs[Long]("lsn") == 100L))
      assert(ins.forall(_.getAs[String]("db") == "appdb"))
      assert(ins.forall(_.getAs[String]("table") == "users"))
      val del = rows.filter(_.getAs[String]("op") == "d").head
      assert(del.getAs[Long]("lsn") == 200L && del.getAs[Long]("txId") == 8L)
      assert(del.getAs[Map[String, String]]("after") == null)
    } finally q.stop()
    // commit trims the decode buffer (Spark may defer the final commit
    // callback past processAllAvailable, so exercise the contract
    // directly: committed LSNs are never re-read and must be dropped)
    val client = new PgOutputWalClient
    client.configure(Map("pg.transport.id" -> tid, "pg.database" -> "appdb"))
    client.commit(100L)
    assert(!PgStreams.state(tid).buffer.containsKey(100L), "lsn 100 trimmed")
    client.commit(200L)
    assert(PgStreams.state(tid).buffer.isEmpty,
      "buffer bounded by the uncommitted window")
  }
}
