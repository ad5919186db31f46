package graft.sources

import graft.sources.PgOutput._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests over the pgoutput byte decoder: encode (test-side
  * builders) -> decode is the identity on arbitrary messages, and every
  * strict truncation of a message raises rather than decoding fabricated
  * data (the zero-padding hazard the strict-bounds reader exists for).
  */
class PgOutputPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val name: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))

  private val colGen: Gen[(String, Int)] = for {
    n <- name
    oid <- Gen.oneOf(20, 23, 25, 1043, 3802)
  } yield (n, oid)

  private val tupleColGen: Gen[(Char, String)] = Gen.oneOf(
    Gen.const(('n', null: String)),
    Gen.const(('u', null: String)),
    Gen.oneOf(Gen.const(""), Gen.alphaNumStr, Gen.const("héllo wörld 漢字"))
      .map(v => ('t', v)),
    Gen.alphaNumStr.map(v => ('b', v)))

  test("Relation messages round-trip for arbitrary schemas") {
    check(Prop.forAll(Gen.chooseNum(1, 2000000000), name, name,
      Gen.nonEmptyListOf(colGen)) { (id, ns, rel, cols) =>
      val decoded = decodeLogical(Frames.relation(id, ns, rel, cols))
        .asInstanceOf[RelationMessage]
      decoded.relationId == id && decoded.namespace == ns &&
        decoded.relationName == rel &&
        decoded.columns.map(c => (c.name, c.typeOid)) == cols.toIndexedSeq
    })
  }

  test("Insert tuples round-trip for arbitrary kinds and values") {
    check(Prop.forAll(Gen.nonEmptyListOf(tupleColGen)) { cols =>
      val decoded = decodeLogical(Frames.insert(16384, cols))
        .asInstanceOf[InsertMessage]
      decoded.tuple.columns.length == cols.length &&
        decoded.tuple.columns.zip(cols).forall { case (got, (kind, value)) =>
          got.kind == kind.toByte && (
            if (kind == 't' || kind == 'b')
              new String(got.data, java.nio.charset.StandardCharsets.UTF_8) == value
            else got.data == null)
        }
    })
  }

  test("Begin/Commit/LSN round-trip across the full value ranges") {
    check(Prop.forAll(Gen.chooseNum(0L, Long.MaxValue - 1),
      Gen.chooseNum(0L, Long.MaxValue), Gen.chooseNum(0, Int.MaxValue)) {
      (lsn, t, xid) =>
        decodeLogical(Frames.begin(lsn, t, xid)) == BeginMessage(lsn, t, xid.toLong) &&
          decodeLogical(Frames.commit(lsn, lsn + 1, t)) ==
            CommitMessage(0, lsn, lsn + 1, t) &&
          parseLsn(formatLsn(lsn)) == lsn
    })
  }

  test("every strict truncation raises, never decodes fabricated data") {
    val messages: Gen[Array[Byte]] = Gen.oneOf(
      Gen.nonEmptyListOf(colGen).map(cs => Frames.relation(16384, "public", "t", cs)),
      Gen.nonEmptyListOf(tupleColGen).map(cs => Frames.insert(16384, cs)),
      Gen.nonEmptyListOf(tupleColGen).map(cs => Frames.delete(16384, 'K', cs)),
      Gen.const(Frames.begin(100, 5, 7)),
      Gen.const(Frames.truncate(1, Seq(1, 2, 3))))
    check(Prop.forAll(messages, Gen.chooseNum(1, 1000000)) { (msg, cutSeed) =>
      // strict non-empty prefix: the builders emit no trailing slack, so
      // the decoder must always run out of bytes -> the strict-bounds
      // error, never a silently zero-padded value
      val cut = 1 + cutSeed % (msg.length - 1)
      val prefix = java.util.Arrays.copyOf(msg, cut)
      Prop.throws(classOf[IllegalArgumentException])(decodeLogical(prefix))
    }, n = 500)
  }
}
