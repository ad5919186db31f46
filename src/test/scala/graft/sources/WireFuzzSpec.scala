package graft.sources

import graft.sources.Bson._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzzing for the wire codecs: arbitrary nested documents must
  * round-trip exactly, and arbitrary truncation/corruption must raise —
  * never silently fabricate data (the invariant the strict-bounds readers
  * exist for).
  */
class WireFuzzSpec extends AnyFunSuite {

  private val scalarGen: Gen[Any] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(20)),
    Gen.chooseNum(Int.MinValue, Int.MaxValue),
    Gen.chooseNum(Long.MinValue, Long.MaxValue),
    // doubles: exclude NaN (NaN != NaN breaks equality round-trip checks)
    Gen.chooseNum(-1e12, 1e12).map(_.toDouble),
    Gen.oneOf(true, false),
    Gen.const(null),
    Gen.listOfN(24, Gen.oneOf("0123456789abcdef".toSeq)).map(h => BOid(h.mkString)),
    Gen.chooseNum(0L, 4102444800000L).map(BDate(_)),
    for { t <- Gen.chooseNum(0, Int.MaxValue); i <- Gen.chooseNum(0, 100) } yield BTs(t, i),
    Gen.listOfN(8, Gen.chooseNum(-128, 127).map(_.toByte)).map(b => BBin(0, b.toArray)))

  private def valueGen(depth: Int): Gen[Any] =
    if (depth <= 0) scalarGen
    else Gen.frequency(
      6 -> scalarGen,
      1 -> Gen.lzy(docGen(depth - 1)),
      1 -> Gen.lzy(Gen.listOf(valueGen(depth - 1)).map(vs => BArr(vs.take(5).toVector))))

  private def docGen(depth: Int): Gen[BDoc] = for {
    n <- Gen.chooseNum(0, 6)
    names <- Gen.listOfN(n, Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty))
    values <- Gen.sequence[List[Any], Any](names.map(_ => valueGen(depth)))
  } yield BDoc(names.distinct.zip(values).toVector)

  /** Structural equality that treats BBin's Array[Byte] by content. */
  private def same(a: Any, b: Any): Boolean = (a, b) match {
    case (BDoc(fa), BDoc(fb)) =>
      fa.size == fb.size && fa.zip(fb).forall {
        case ((ka, va), (kb, vb)) => ka == kb && same(va, vb)
      }
    case (BArr(ia), BArr(ib)) =>
      ia.size == ib.size && ia.zip(ib).forall { case (x, y) => same(x, y) }
    case (BBin(sa, ba), BBin(sb, bb)) => sa == sb && ba.sameElements(bb)
    case (x, y) => x == y
  }

  test("property: BSON round-trips arbitrary nested documents exactly") {
    val prop = Prop.forAll(docGen(3)) { doc =>
      val bytes = Bson.encode(doc)
      val (back, read) = Bson.decode(bytes)
      read == bytes.length && same(back, doc)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: truncated BSON raises, never fabricates") {
    val doc = BDoc("a" -> "hello", "b" -> 42, "c" -> BDoc("d" -> BArr(1, 2, 3)),
      "e" -> BOid("507f1f77bcf86cd799439011"), "f" -> 3.5)
    val bytes = Bson.encode(doc)
    (1 until bytes.length).foreach { cut =>
      val t = bytes.take(cut)
      val ok =
        try { Bson.decode(t); false }
        catch { case _: Exception => true }
      assert(ok, s"truncation at $cut decoded silently")
    }
  }

  test("property: Kafka record batches round-trip arbitrary records exactly") {
    import graft.cdc.KafkaWire
    val recordGen: Gen[KafkaWire.Record] = for {
      key <- Gen.option(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
        .map(_.toArray))
      value <- Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)
      ts <- Gen.chooseNum(0L, 4102444800000L)
    } yield KafkaWire.Record(key, value, ts)
    val prop = Prop.forAll(Gen.nonEmptyListOf(recordGen).map(_.take(20))) { rs =>
      val decoded = KafkaWire.decodeRecordBatch(KafkaWire.recordBatch(rs))
      decoded.size == rs.size && decoded.zip(rs).forall { case (d, o) =>
        d.timestampMs == o.timestampMs &&
          d.key.map(_.toSeq) == o.key.map(_.toSeq) &&
          d.value.sameElements(o.value)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: fetch record sets decode whole batches with absolute " +
      "offsets; any cut point yields exactly the complete prefix batches") {
    import graft.cdc.KafkaWire
    import java.nio.ByteBuffer
    val recordGen: Gen[KafkaWire.Record] = for {
      key <- Gen.option(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
        .map(_.toArray))
      value <- Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)
      ts <- Gen.chooseNum(0L, 4102444800000L)
    } yield KafkaWire.Record(key, value, ts)
    val batchGen: Gen[(Long, Seq[KafkaWire.Record])] = for {
      base <- Gen.chooseNum(0L, 1L << 40)
      rs <- Gen.nonEmptyListOf(recordGen).map(_.take(8))
    } yield (base, rs)
    val prop = Prop.forAll(Gen.nonEmptyListOf(batchGen).map(_.take(4))) { batches =>
      val encoded = batches.map { case (base, rs) =>
        val b = KafkaWire.recordBatch(rs)
        ByteBuffer.wrap(b).putLong(0, base) // broker-assigned base offset
        b
      }
      val set = encoded.flatten.toArray
      val expected = batches.flatMap { case (base, rs) =>
        rs.zipWithIndex.map { case (r, i) => (base + i, r) }
      }
      // every cut yields exactly the batches wholly inside the prefix —
      // no fabricated records, no lost complete batch
      val prefixSizes = encoded.scanLeft(0)(_ + _.length)
      (0 to set.length).forall { cut =>
        val nWhole = prefixSizes.count(_ <= cut) - 1
        val want = batches.take(nWhole).map(_._2.size).sum
        val got = KafkaWire.decodeRecordSet(set.take(cut))
        got.size == want && got.zip(expected).forall { case (g, (off, r)) =>
          g.offset == off && g.record.timestampMs == r.timestampMs &&
            g.record.key.map(_.toSeq) == r.key.map(_.toSeq) &&
            g.record.value.sameElements(r.value)
        }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("truncated or corrupted Kafka record batches raise, never fabricate") {
    import graft.cdc.KafkaWire
    val batch = KafkaWire.recordBatch(Seq(
      KafkaWire.Record(Some("key-1".getBytes), "value-payload-1".getBytes, 1000L),
      KafkaWire.Record(None, "value-2".getBytes, 1001L)))
    assert(KafkaWire.decodeRecordBatch(batch).size == 2, "full batch must decode")
    (1 until batch.length).foreach { cut =>
      val raised =
        try { KafkaWire.decodeRecordBatch(batch.take(cut)); false }
        catch { case _: Exception => true }
      assert(raised, s"truncation at $cut/${batch.length} decoded silently")
    }
    // any single-byte flip inside the CRC'd region must fail the checksum
    (21 until batch.length).foreach { i =>
      val c = batch.clone(); c(i) = (c(i) ^ 0x40).toByte
      val raised =
        try { KafkaWire.decodeRecordBatch(c); false }
        catch { case _: Exception => true }
      assert(raised, s"bit flip at $i decoded silently")
    }
  }

  test("every strict prefix of a pgoutput logical message raises, never fabricates") {
    // counts/lengths are declared up front in every message shape, so NO
    // strict prefix can be a complete message — a prefix that decodes
    // means the reader zero-padded or skipped a bounds check
    val bodies = Seq(
      Frames.begin(100L, 946684800000000L, 5),
      Frames.usersRel,
      Frames.insert(16384, Seq(('t', "1"), ('t', "9999999999"), ('t', "ada"))),
      Frames.update(16384, Some('O'),
        Seq(('t', "1"), ('n', null), ('t', "old")),
        Seq(('t', "1"), ('n', null), ('t', "new"))),
      Frames.delete(16384, 'K', Seq(('t', "1"), ('n', null), ('n', null))),
      Frames.commit(100L, 101L, 0L),
      Frames.truncate(1, Seq(16384, 16385)),
      Frames.typeMsg(600, "public", "mytype"),
      Frames.origin(9L, "origin1"))
    bodies.foreach { body =>
      assert(PgOutput.decodeLogical(body) != null, "full message must decode")
      (1 until body.length).foreach { cut =>
        val raised =
          try { PgOutput.decodeLogical(body.take(cut)); false }
          catch { case _: Exception => true }
        assert(raised,
          s"prefix $cut/${body.length} of '${body(0).toChar}' decoded silently")
      }
    }
    // same property for the outer frames, up to each type's fixed-header
    // size ('w': 1+24 header before the body remainder; 'k': 1+17 total)
    val frames = Seq(
      (Frames.xlog(7L, Frames.begin(100L, 946684800000000L, 5)), 25),
      (Frames.keepalive(55L, 66L, reply = true), 18))
    frames.foreach { case (f, complete) =>
      assert(PgOutput.decodeFrame(f) != null)
      (1 until complete).foreach { cut =>
        val raised =
          try { PgOutput.decodeFrame(f.take(cut)); false }
          catch { case _: Exception => true }
        assert(raised, s"frame prefix $cut decoded silently")
      }
    }
  }
}
