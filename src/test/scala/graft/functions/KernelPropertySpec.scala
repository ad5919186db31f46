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

  test("PslKernel.registrable matches a naive per-rule reference on random rule sets") {
    // naive model: enumerate every suffix, apply the published
    // prevailing-rule algorithm directly over the rule LISTS (no hash
    // sets, no shared code with the kernel)
    val label: Gen[String] = Gen.oneOf("a", "b", "co", "uk", "ck", "x9")
    val ruleGen: Gen[String] = for {
      n <- Gen.chooseNum(1, 3)
      ls <- Gen.listOfN(n, label)
      kind <- Gen.chooseNum(0, 9)
    } yield kind match {
      case 0 => "*." + ls.mkString(".")
      case 1 => "!" + ls.mkString(".")
      case _ => ls.mkString(".")
    }
    val hostGen: Gen[String] = for {
      n <- Gen.chooseNum(1, 5)
      ls <- Gen.listOfN(n, label)
    } yield ls.mkString(".")
    def model(host: String, rules: List[String]): String = {
      val labels = host.split('.')
      val n = labels.length
      def sufx(l: Int) = labels.drop(n - l).mkString(".")
      val normal = rules.filter(r => !r.startsWith("!") && !r.startsWith("*.") && r != "*")
      val wild = rules.collect { case r if r.startsWith("*.") => r.substring(2) }
      val exc = rules.collect { case r if r.startsWith("!") => r.substring(1) }
      val excLen = (1 to n).find(l => exc.contains(sufx(l))).map(_ - 1)
      val psLen = excLen.getOrElse {
        val cands = (1 to n).filter(l => normal.contains(sufx(l))) ++
          (2 to n).filter(l => wild.contains(sufx(l - 1)))
        (1 +: cands).max
      }
      if (n <= psLen) host else sufx(psLen + 1)
    }
    val prop = Prop.forAll(Gen.listOfN(8, ruleGen), hostGen) { (rules, host) =>
      val text = rules.mkString("\n")
      val parsed = PslKernel.cached(if (text.isEmpty) "com" else text)
      val effective = if (text.isEmpty) List("com") else rules
      val got = PslKernel.registrable(
        UTF8String.fromString(host), parsed).toString
      got == model(host, effective)
    }
    check(prop)
  }
}
