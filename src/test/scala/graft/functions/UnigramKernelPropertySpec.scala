package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the three unigram-lattice kernels (Viterbi encode,
  * forward–backward E-step, posterior sampling) on arbitrary generated
  * (word, vocab) pairs. The kernels share one lattice, so their outputs
  * obey exact cross-kernel invariants that hold for EVERY input — no
  * Spark session needed, the kernels are plain JVM statics.
  */
class UnigramKernelPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  // words over a 3-letter alphabet so vocab pieces actually hit
  private val wordGen: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  // vocab: all single chars (totality without UNK) + random multi pieces
  private val vocabGen: Gen[Seq[(String, Double)]] = for {
    nMulti <- Gen.chooseNum(0, 6)
    multis <- Gen.listOfN(nMulti, Gen.chooseNum(2, 3).flatMap(l =>
      Gen.listOfN(l, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
    all = (Seq("a", "b", "c") ++ multis.distinct).distinct
    scores <- Gen.listOfN(all.length, Gen.chooseNum(-6.0, -0.5))
  } yield all.zip(scores)

  private def table(v: Seq[(String, Double)]) =
    new UnigramKernel.Table(v.map(_._1).toArray, v.map(_._2).toArray)

  private def viterbiScore(w: String, v: Seq[(String, Double)]): Double = {
    val ids = UnigramKernel.tokenIds(UTF8String.fromString(w), table(v), -1)
    // reconstruct the path score; UNK cannot occur (all chars in vocab)
    ids.map(id => v(id)._2).sum
  }

  test("property: Viterbi path score never exceeds the forward logZ") {
    check(Prop.forAll(wordGen, vocabGen) { (w, v) =>
      val row = UnigramEMKernel.expectedCounts(UTF8String.fromString(w), table(v))
      val logZ = row.getDouble(0)
      val vit = viterbiScore(w, v)
      // logZ = logsumexp over ALL paths >= any single path's score
      vit <= logZ + 1e-9
    }, 300)
  }

  test("property: expected piece counts sum to the expected path length") {
    // sum over pieces of E[count] = E[#pieces in a sampled segmentation]
    // which must sit in [ceil(n/maxLen), n] — between the fewest and the
    // most pieces any segmentation of an n-char word can have
    check(Prop.forAll(wordGen, vocabGen) { (w, v) =>
      val t = table(v)
      val row = UnigramEMKernel.expectedCounts(UTF8String.fromString(w), t)
      val cs = row.getArray(2).toDoubleArray()
      val n = w.length
      val total = cs.sum
      val lo = math.ceil(n.toDouble / t.maxLen) - 1e-9
      total >= lo && total <= n + 1e-9 && cs.forall(c => c >= -1e-12)
    }, 300)
  }

  test("property: samples are valid segmentations and respect support") {
    // every sampled id sequence must concatenate back to the word, and
    // every piece it uses must have nonzero posterior (it appears in the
    // E-step's support)
    check(Prop.forAll(wordGen, vocabGen, Gen.chooseNum(0L, 1000L)) {
      (w, v, seed) =>
        val t = table(v)
        val ids = UnigramSampleKernel
          .sampleIds(UTF8String.fromString(w), t, 1.0, seed, -1)
          .toIntArray()
        val support = UnigramEMKernel
          .expectedCounts(UTF8String.fromString(w), t)
          .getArray(1).toIntArray().toSet
        val joined = ids.map(id => v(id)._1).mkString
        joined == w && ids.forall(support.contains)
    }, 300)
  }
}
