package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests over the round-6 kernels, checked against
  * straightforward Scala models at the ArrayData level (no Spark
  * session — these are pure JVM functions).
  */
class KernelPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 300): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private def strArray(ts: Seq[String]): GenericArrayData =
    new GenericArrayData(ts.map(t => UTF8String.fromString(t)).toArray[Any])

  private def longArray(ls: Seq[Long]): GenericArrayData =
    new GenericArrayData(ls.toArray[Any])

  private val tokens: Gen[List[String]] =
    Gen.listOfN(20, Gen.stringOfN(2, Gen.alphaChar)).flatMap(l =>
      Gen.chooseNum(0, 20).map(l.take))

  test("removeRanges matches the naive per-index model on random ranges") {
    val ranges = Gen.listOf(for {
      s <- Gen.chooseNum(-3L, 25L)
      len <- Gen.chooseNum(0L, 6L)
    } yield (s, s + len))
    check(Prop.forAll(tokens, ranges) { (toks, rs) =>
      val got = TokenRanges.removeRanges(strArray(toks),
        longArray(rs.map(_._1)), longArray(rs.map(_._2))).toString
      val kept = toks.indices
        .filterNot(i => rs.exists { case (s, e) => i >= s && i <= e })
        .map(toks)
      got == kept.mkString(" ")
    })
  }

  test("removeRanges with null/empty range arrays keeps every token") {
    check(Prop.forAll(tokens) { toks =>
      val all = toks.mkString(" ")
      TokenRanges.removeRanges(strArray(toks), null, null).toString == all &&
        TokenRanges.removeRanges(strArray(toks),
          longArray(Nil), longArray(Nil)).toString == all
    })
  }

  test("positional shingle hashes: count, order, and distinct-set parity") {
    val n = 3
    check(Prop.forAll(tokens) { toks =>
      val all = ShingleHash.shingleHashesAll(strArray(toks), n)
      val expectedCount = math.max(0, toks.length - n + 1)
      val countOk = all.length == expectedCount
      // the distinct kernel sees exactly the same hash SET (when grams
      // exist; the distinct kernel's short-input fallback differs by
      // design)
      val setOk = toks.length < n ||
        all.toSet == ShingleHash.shingleHashes(strArray(toks), n).toSet
      // positions index the same grams: equal windows hash equal
      val posOk = (0 until expectedCount).forall { i =>
        (0 until expectedCount).forall { j =>
          (toks.slice(i, i + n) == toks.slice(j, j + n)) ==
            (all(i) == all(j))
        }
      }
      countOk && setOk && posOk
    })
  }
}
