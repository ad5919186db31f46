package graft.ops

import graft.SparkTestSession
import graft.functions.ZOrderKernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("kernel interleaves bits: value 0 in even lanes, value 1 in odd") {
    // x=0b11, y=0b01 -> z = y1 x1 y0 x0 = 0 1 1 1 = 7
    assert(ZOrderKernel.zValue(Array(3L, 1L), 8) == 7L)
    assert(ZOrderKernel.zValue(Array(1L, 3L), 8) == 11L)
    // single dimension is the identity (within bits)
    assert(ZOrderKernel.zValue(Array(173L), 8) == 173L)
    // clamping: negative -> 0, >= 2^bits -> max
    assert(ZOrderKernel.zValue(Array(-5L, 300L), 8) ==
      ZOrderKernel.zValue(Array(0L, 255L), 8))
  }

  test("morton locality: adjacent cells differ in few low bits") {
    // the defining property vs lexicographic order: both (x+1, y) and
    // (x, y+1) stay numerically close to (x, y) for most cells
    val base = ZOrderKernel.zValue(Array(10L, 10L), 8)
    assert(math.abs(ZOrderKernel.zValue(Array(11L, 10L), 8) - base) <= 3)
    assert(math.abs(ZOrderKernel.zValue(Array(10L, 11L), 8) - base) <= 3)
  }

  test("z_value expression matches the kernel under codegen") {
    val rows = Seq((3L, 1L), (255L, 0L), (17L, 99L), (128L, 128L))
    val got = rows.toDF("x", "y")
      .select(graft.functions.z_value(Seq(col("x"), col("y")), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == rows.map(r => ZOrderKernel.zValue(Array(r._1, r._2), 8)))
  }

  test("null input yields null, not a bogus code") {
    val got = Seq((Some(3L), Option.empty[Long]))
      .toDF("x", "y")
      .select(graft.functions.z_value(Seq(col("x"), col("y")), 8).as("z"))
      .head
    assert(got.isNullAt(0))
  }

  test("withZValue scales dimensions to the bit range via min/max") {
    val df = Seq((0L, 0L), (100L, 50L), (50L, 25L)).toDF("a", "b")
    val out = Layout.withZValue(df, Seq("a", "b"), bits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // extremes land on the corner codes
    assert(out((0L, 0L)) == 0L)
    assert(out((100L, 50L)) == ZOrderKernel.zValue(Array(255L, 255L), 8))
    // no stats columns leak
    val cols = Layout.withZValue(df, Seq("a", "b"), 8).columns.toSeq
    assert(cols == Seq("a", "b", "zval"))
  }

  test("z-ordered files prune a 2-dim box query a linear sort cannot") {
    val n = 40000
    val rnd = new scala.util.Random(13)
    val df = (0 until n).map(_ =>
      (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    Layout.writeZOrdered(df, Seq("x", "y"), bits = 10,
      s"$dir/z", numFiles = 16)
    df.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions(col("x"), col("y"))
      .write.parquet(s"$dir/lex")
    // box query selective on the SECOND dim only: y in [0,128). The
    // lexicographic (x-leading) layout cannot prune it at all — every
    // file spans the full y range; the z layout fixes y's high bits in
    // the code, so most files' y ranges miss the box.
    def touched(path: String): Long =
      Layout.fileStats(spark.read.parquet(path), Seq("x", "y"))
        .filter(col("min_y") < 128)
        .count()
    val zTouched = touched(s"$dir/z")
    val lexTouched = touched(s"$dir/lex")
    assert(lexTouched == 16L, s"lex layout should touch all files: $lexTouched")
    assert(zTouched * 2 <= lexTouched,
      s"z-order touched $zTouched files vs lex $lexTouched — no pruning win")
    // correctness: both layouts hold the same rows
    assert(spark.read.parquet(s"$dir/z").count() == n)
  }

  test("compact: small files merge to the byte-derived target, rows exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("layout_compact").toString
    // 48 fragment files of ~2k rows
    spark.range(100000L).select(col("id"), (col("id") % 97).as("v"))
      .repartition(48).write.parquet(s"$dir/frag")
    val fragFiles = new java.io.File(s"$dir/frag").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(fragFiles == 48)
    val report = graft.ops.Layout.compact(spark, s"$dir/frag",
        s"$dir/out", targetBytes = 512L << 20) // everything fits one file
      .head()
    assert(report.getAs[Long]("files_in") == 48L)
    assert(report.getAs[Long]("files_out") == 1L)
    assert(report.getAs[Long]("rows_in") == 100000L)
    assert(report.getAs[Long]("rows_out") == 100000L)
    // content identical (order-independent checksum)
    def sum(p: String) = spark.read.parquet(p)
      .select(expr("bit_xor(xxhash64(id, v))")).head.getLong(0)
    assert(sum(s"$dir/frag") == sum(s"$dir/out"))
    // sorted variant clusters: per-file min/max ranges must not overlap
    graft.ops.Layout.compact(spark, s"$dir/frag", s"$dir/sorted",
      targetBytes = (new java.io.File(s"$dir/frag").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length).sum / 4),
      sortCols = Seq("id"))
    val stats = graft.ops.Layout.fileStats(
        spark.read.parquet(s"$dir/sorted"), Seq("id"))
      .orderBy(col("min_id")).collect()
    assert(stats.length >= 2)
    stats.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_id") < b.getAs[Long]("min_id"),
        "sorted compaction produced overlapping file ranges")
    }
  }
}
