package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClassifySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- word_bucket kernel ------------------------------------------------

  test("word_bucket: per-step poly-31 mod matches the hand-computed fold") {
    val rows = Seq("a", "ab", "über", "", "中文").toDF("w")
      .select(col("w"), graft.functions.word_bucket(col("w"), 64).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    def fold(s: String, m: Int): Int = {
      var h = 0L
      s.codePoints().forEach(cp => h = (h * 31 + cp) % m)
      h.toInt
    }
    assert(rows("a") === fold("a", 64))
    assert(rows("ab") === fold("ab", 64))
    assert(rows("über") === fold("über", 64))
    assert(rows("中文") === fold("中文", 64))
    assert(rows("") === 0)
  }

  test("word_bucket: per-step mod equals end mod (modular identity)") {
    // for a word short enough that the raw polynomial fits a long, the
    // per-step reduction must equal reducing once at the end
    val w = "hello"
    val raw = w.codePoints().toArray.foldLeft(0L)((h, c) => h * 31 + c)
    val viaKernel = Seq(w).toDF("w")
      .select(graft.functions.word_bucket(col("w"), 4096)).head().getInt(0)
    assert(viaKernel === (raw % 4096).toInt)
  }

  // --- trainer: hand-computed first iteration ----------------------------

  test("trainLogReg: one iteration matches the hand-derived update") {
    // doc1 "a a b" y=1: x_a=2/3, x_b=1/3; doc2 "b" y=0: x_b=1.
    // From w=0: p=0.5, r1=-0.5, r2=+0.5, lr=2, n=2:
    //   w_a = round6(-2 * ((2/3)(-0.5)) / 2)        =  0.333333
    //   w_b = round6(-2 * ((1/3)(-0.5) + 0.5) / 2)  = -0.333333
    //   bias: r sums to 0 -> stays 0
    val docs = Seq((1L, "a a b", 1), (2L, "b", 0)).toDF("doc_id", "text", "y")
    val m = Classify.trainLogReg(docs, "doc_id", col("y") === 1, "text",
      numBuckets = 16, iters = 1, learningRate = 2.0)
    val bA = graft.functions.WordBucketKernel
      .bucket(org.apache.spark.unsafe.types.UTF8String.fromString("a"), 16)
    val bB = graft.functions.WordBucketKernel
      .bucket(org.apache.spark.unsafe.types.UTF8String.fromString("b"), 16)
    assert(m.weights(bA) === 0.333333)
    assert(m.weights(bB) === -0.333333)
    assert(m.bias === 0.0)
    assert(m.lossTrace === Seq(-math.log(0.5)))
  }

  test("scores/classify: sigmoid of the trained logit, rounded") {
    val docs = Seq((1L, "a a b", 1), (2L, "b", 0)).toDF("doc_id", "text", "y")
    val m = Classify.trainLogReg(docs, "doc_id", col("y") === 1, "text",
      numBuckets = 16, iters = 1, learningRate = 2.0)
    def sig(z: Double) = 1.0 / (1.0 + math.exp(-z))
    val z1 = (2.0 / 3) * 0.333333 + (1.0 / 3) * -0.333333
    val z2 = -0.333333
    val got = Classify.classify(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
    assert(got(1L)._1 === BigDecimal(sig(z1)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(2L)._1 === BigDecimal(sig(z2)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(1L)._2 === 1 && got(2L)._2 === 0)
  }

  // --- trainer: learning behavior on a separable corpus ------------------

  private def corpus(n: Int) = {
    val pos = Seq("good", "great", "clear", "useful", "precise", "sound")
    val neg = Seq("spam", "junk", "noise", "garbled", "random", "broken")
    (0 until n).map { i =>
      val positive = i % 2 == 0
      val words = if (positive) pos else neg
      val text = (0 until 12 + i % 5)
        .map(j => words((i * 7 + j * 3) % words.size)).mkString(" ")
      (i.toLong, text, positive)
    }.toDF("doc_id", "text", "y")
  }

  test("trainLogReg: loss decreases and the gate separates a separable corpus") {
    val docs = corpus(200)
    val m = Classify.trainLogReg(docs, "doc_id", col("y"), "text",
      numBuckets = 1024, iters = 8, learningRate = 2.0)
    // full-batch GD on a separable problem: strictly decreasing loss
    m.lossTrace.sliding(2).foreach { case Seq(a, b) => assert(b < a) }
    val conf = Classify.confusion(docs, "doc_id", col("y"), "text", m)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val correct = conf.getOrElse((0, 0), 0L) + conf.getOrElse((1, 1), 0L)
    assert(correct >= 190, s"accuracy too low: $conf")
  }

  test("trainLogReg: identical model at 1 and 8 input partitions") {
    val docs = corpus(120)
    val m1 = Classify.trainLogReg(docs.coalesce(1), "doc_id", col("y"),
      "text", numBuckets = 256, iters = 4, learningRate = 2.0)
    val m8 = Classify.trainLogReg(docs.repartition(8), "doc_id", col("y"),
      "text", numBuckets = 256, iters = 4, learningRate = 2.0)
    assert(m1.weights === m8.weights)
  }

  test("trainLogReg: zero-token docs still train and score via the bias slot") {
    val docs = Seq((1L, "good good", 1), (2L, "", 0), (3L, "   ", 0))
      .toDF("doc_id", "text", "y")
    val m = Classify.trainLogReg(docs, "doc_id", col("y") === 1, "text",
      numBuckets = 32, iters = 2, learningRate = 1.0)
    val scored = Classify.scores(docs, "doc_id", "text", m).collect()
    assert(scored.length === 3)
    // empty docs carry only the bias feature -> identical scores
    val byId = scored.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byId(2L) === byId(3L))
  }

  test("trainLogReg: guards") {
    val docs = Seq((1L, "a", 1)).toDF("doc_id", "text", "y")
    intercept[IllegalArgumentException] {
      Classify.trainLogReg(docs, "doc_id", col("y") === 1, "text",
        numBuckets = 0)
    }
    intercept[IllegalArgumentException] {
      Classify.trainLogReg(docs, "doc_id", col("y") === 1, "text",
        iters = 0)
    }
    intercept[IllegalArgumentException] {
      Classify.trainLogReg(docs, "doc_id", col("y") === 1, "text",
        learningRate = 0.0)
    }
    // the driver-memory rail: 2^22 is the ceiling, above it points at
    // the mini-batch face
    intercept[IllegalArgumentException] {
      Classify.trainLogReg(docs, "doc_id", col("y") === 1, "text",
        numBuckets = (1 << 22) + 1)
    }
  }

  test("trainLogRegMiniBatch: identical model across partition counts and reruns") {
    val docs = corpus(200)
    def train(df: org.apache.spark.sql.DataFrame) =
      Classify.trainLogRegMiniBatch(df, "doc_id", col("y"), "text",
        numBuckets = 256, iters = 6, learningRate = 2.0,
        batchFraction = 0.4, seed = 7L)
    val m1 = train(docs.coalesce(1))
    val m8 = train(docs.repartition(8))
    assert(m1.weights === m8.weights) // hash batches, not RNG: bit-equal
    // the MODEL is partition-invariant (6 dp weight rounding); the loss
    // trace is a raw-double diagnostic whose summation order may differ
    // in the last ulp — compare it rounded
    assert(m1.lossTrace.map(l => math.rint(l * 1e9)) ===
      m8.lossTrace.map(l => math.rint(l * 1e9)))
    assert(train(docs.repartition(3)).weights === m1.weights) // rerun too
  }

  test("trainLogRegMiniBatch: learns the separable corpus; new seed = new schedule") {
    val docs = corpus(200)
    val m = Classify.trainLogRegMiniBatch(docs, "doc_id", col("y"), "text",
      numBuckets = 1024, iters = 10, learningRate = 2.0,
      batchFraction = 0.5, seed = 1L)
    val conf = Classify.confusion(docs, "doc_id", col("y"), "text", m)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val correct = conf.getOrElse((0, 0), 0L) + conf.getOrElse((1, 1), 0L)
    assert(correct >= 185, s"mini-batch accuracy too low: $conf")
    val m2 = Classify.trainLogRegMiniBatch(docs, "doc_id", col("y"), "text",
      numBuckets = 1024, iters = 10, learningRate = 2.0,
      batchFraction = 0.5, seed = 2L)
    assert(m.weights !== m2.weights) // different batch schedule
  }

  test("trainLogRegMiniBatch: empty batches skip the step, never NaN the model") {
    // 2 docs at fraction 0.01: most iterations see an empty batch
    val docs = corpus(2)
    val m = Classify.trainLogRegMiniBatch(docs, "doc_id", col("y"), "text",
      numBuckets = 64, iters = 5, learningRate = 1.0,
      batchFraction = 0.01, seed = 3L)
    assert(m.weights.values.forall(v => !v.isNaN))
    assert(m.lossTrace.length == 5) // NaN marks skipped steps in the trace
  }

  test("naiveBayes: smoothed scores, argmax, and unseen-term fallback") {
    val train = Seq((1L, "a", "x x y"), (2L, "b", "z z"))
      .toDF("doc_id", "lab", "text")
    val test = Seq((10L, "x x"), (11L, "z"), (12L, "q"), (13L, ""))
      .toDF("doc_id", "text")
    val out = Classify.naiveBayes(train, test, "lab", "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    assert(out(10L)._1 == "a" && out(11L)._1 == "b")
    // hand-check doc 10 under class a: prior ln(1/2), tf(x|a)=2,
    // tot_a=3, V=3 -> 2*ln(3) - 2*ln(6) + ln(.5)
    val expA = math.floor((math.log(0.5) + 2 * math.log(3.0) -
      2.0 * math.log(6.0)) * 1e6 + 0.5) / 1e6
    assert(math.abs(out(10L)._2 - expA) < 1e-9)
    // unseen term: no (doc,class) join rows; the smaller smoothed
    // denominator (class b: tot 2 + V 3) wins over a's (3 + 3)
    assert(out(12L)._1 == "b")
    // empty text: scores reduce to the priors (tied) -> label tiebreak
    assert(out(13L)._1 == "a")
  }

  test("naiveBayes: language ID on a separable corpus is accurate") {
    val train = (1 to 30).map { i =>
      if (i % 2 == 0) (i.toLong, "en", "the quick brown fox and the dog")
      else (i.toLong, "fr", "le renard brun et le chien vite")
    }.toDF("doc_id", "lab", "text")
    val test = Seq((100L, "en", "the dog and the fox"),
      (101L, "fr", "le chien et le renard"))
      .toDF("doc_id", "lab", "text")
    val out = Classify.naiveBayes(train, test, "lab", "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(100L) == "en" && out(101L) == "fr")
  }
}
