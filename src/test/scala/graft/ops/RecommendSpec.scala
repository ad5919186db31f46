package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RecommendSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def basket(rows: Seq[(Long, String)], minPair: Long = 1,
      topK: Int = 100, maxBasket: Int = 1000) =
    Recommend.marketBasket(rows.toDF("basket", "item"), "basket", "item",
        minPairCount = minPair, topK = topK, maxBasketSize = maxBasket)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8)))
      .toMap

  test("hand-computed support/confidence/lift on three baskets") {
    // b1: {a,b}  b2: {a,b,c}  b3: {a,c}   N=3
    // n_a=3 n_b=2 n_c=2; n_ab=2 n_ac=2 n_bc=1
    val out = basket(Seq(
      (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "a"), (3L, "c")))
    val (na, nb, nab, sup, cab, cba, lift) = out(("a", "b"))
    assert((na, nb, nab) == ((3L, 2L, 2L)))
    assert(math.abs(sup - 2.0 / 3) < 1e-6)
    assert(math.abs(cab - 2.0 / 3) < 1e-6)
    assert(math.abs(cba - 1.0) < 1e-6)
    assert(math.abs(lift - 2.0 * 3 / (3 * 2)) < 1e-6)
    // bc co-occurs once: lift 1*3/(2*2) = 0.75 < 1 (anti-correlated)
    assert(math.abs(out(("b", "c"))._7 - 0.75) < 1e-6)
  }

  test("duplicate item rows in one basket count once") {
    val out = basket(Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b")))
    assert(out(("a", "b"))._3 == 2L) // n_ab
    assert(out(("a", "b"))._1 == 2L) // n_a, not 3
  }

  test("minPairCount prunes and maxBasketSize drops degenerate baskets") {
    // basket 9 has 4 items > cap 3 — contributes nothing, even to N
    val rows = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "c")) ++
      Seq("a", "b", "c", "d").map(i => (9L, i))
    val out = basket(rows, minPair = 2, maxBasket = 3)
    assert(out.keySet == Set(("a", "b")))
    // N = 3 (baskets 1,2,3), not 4
    assert(math.abs(out(("a", "b"))._4 - 2.0 / 3) < 1e-6)
  }

  test("itemSimilarity: hand-computed cosine/lift neighbor lists, " +
    "both directions, topK cut") {
    // b1: {a,b}  b2: {a,b,c}  b3: {a,c}   N=3
    // n_a=3 n_b=2 n_c=2; n_ab=2 n_ac=2 n_bc=1
    // cos(a,b) = cos(a,c) = 2/sqrt(6); cos(b,c) = 1/2
    val txns = Seq(
      (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "a"), (3L, "c")).toDF("basket", "item")
    val out = Recommend.itemSimilarity(txns, "basket", "item",
        minPairCount = 1, topKPerItem = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getInt(7)))
      .toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val c26 = r6(2.0 / math.sqrt(6.0))
    // both directions present; a's ties (b, c at 2/sqrt 6) rank by name
    assert(out(("a", "b")) == ((3L, 2L, 2L, c26, 1.0, 1)))
    assert(out(("a", "c")) == ((3L, 2L, 2L, c26, 1.0, 2)))
    assert(out(("b", "a")) == ((2L, 3L, 2L, c26, 1.0, 1)))
    assert(out(("b", "c")) == ((2L, 2L, 1L, 0.5, 0.75, 2)))
    assert(out(("c", "a")) == ((2L, 3L, 2L, c26, 1.0, 1)))
    assert(out(("c", "b")) == ((2L, 2L, 1L, 0.5, 0.75, 2)))
    // topKPerItem = 1 keeps exactly each item's rank-1 row
    val top1 = Recommend.itemSimilarity(txns, "basket", "item",
        minPairCount = 1, topKPerItem = 1).collect()
    assert(top1.length == 3 && top1.forall(_.getInt(7) == 1))
  }

  test("recommendItems: weighted-sum scores, seen exclusion, tie order") {
    val txns = Seq(
      (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "a"), (3L, "c")).toDF("basket", "item")
    val sims = Recommend.itemSimilarity(txns, "basket", "item",
      minPairCount = 1, topKPerItem = 10)
    // u1 owns {a}: candidates b and c tie at cos(a,b) = cos(a,c) —
    // rank breaks on item name; u2 owns {a,b}: only c survives the
    // seen-exclusion, score = cos(a,c) + cos(b,c)
    val hist = Seq(("u1", "a"), ("u2", "a"), ("u2", "b"))
      .toDF("user_id", "item_id")
    val recs = Recommend.recommendItems(hist, "user_id", "item_id",
        sims, topN = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getInt(3)))
      .toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val c26 = r6(2.0 / math.sqrt(6.0))
    assert(recs(("u1", "b")) == ((c26, 1)))
    assert(recs(("u1", "c")) == ((c26, 2)))
    assert(recs(("u2", "c")) == ((r6(c26 + 0.5), 1)))
    assert(recs.size == 3) // nothing else recommended
    // topN cut: u1 keeps only its rank-1 candidate
    val top1 = Recommend.recommendItems(hist, "user_id", "item_id",
      sims, topN = 1).collect()
    assert(top1.count(_.getString(0) == "u1") == 1)
  }

  test("rfm: quantile-threshold scores on a hand-checked population") {
    import java.sql.Timestamp
    def d(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    // 5 customers, one order each except cust 5 (heavy): recency spread
    // 0..8 days back, spend spread 10..1000
    val rows = Seq(
      (1L, d(1), 10.0), (2L, d(3), 50.0), (3L, d(5), 100.0),
      (4L, d(7), 500.0),
      (5L, d(9), 400.0), (5L, d(9), 600.0))
      .toDF("cust", "ts", "amount")
    val out = Recommend.rfmSegments(rows, "cust", "ts", "amount", 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getInt(4), r.getInt(5), r.getInt(6)))
      .toMap
    // recencies: c1=8, c2=6, c3=4, c4=2, c5=0; median 4
    // frequencies: 1,1,1,1,2; median 1. monetary: 10,50,100,500,1000; median 100
    assert(out(1L) == ((8, 1L, 10.0, 1, 1, 1)))   // old, light
    assert(out(5L) == ((0, 2L, 1000.0, 2, 2, 2))) // recent, heavy
    assert(out(3L) == ((4, 1L, 100.0, 1, 1, 1)))  // ties score LOW bucket
    assert(out(4L) == ((2, 1L, 500.0, 2, 1, 2)))
  }

  test("topK keeps the highest-lift pairs with deterministic ties") {
    // (c,d) exclusive pair in 1 of 4 baskets: lift 4; (a,b) in all 4: lift 1
    val rows = (1L to 3L).flatMap(b => Seq((b, "a"), (b, "b"))) ++
      Seq((4L, "a"), (4L, "b"), (4L, "c"), (4L, "d"))
    val all = basket(rows)
    assert(all(("c", "d"))._7 > all(("a", "b"))._7)
    val top = Recommend.marketBasket(rows.toDF("basket", "item"),
        "basket", "item", minPairCount = 1, topK = 1).collect()
    assert(top.length == 1 &&
      (top(0).getString(0), top(0).getString(1)) == (("c", "d")))
  }
}
