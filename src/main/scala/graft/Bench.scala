package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Methodology (TimeQuery's, applied PER QUERY): one untimed warm run
  * (JIT/codegen/parquet-footer warmup is session cost, not query cost —
  * a long-running engine at 100 TB runs warm), then two timed runs
  * back-to-back, min. Keeping each query's three executions ADJACENT is
  * the point: the previous shape (whole-suite warmup pass, then two
  * whole-suite timed passes) put ~minutes of other queries' cache churn
  * and garbage between a query's two timings, and heavy neighbors'
  * spillover read as phantom 30-70% regressions on untouched queries
  * (the r11 q76-q80 cluster — refuted by adjacent re-timing). Each run
  * executes via count() (forces the full plan, discards row transfer).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)

    // Per query: warm once (untimed), time twice, min. A query that
    // THROWS is recorded as an error, never as a timing — a failed
    // query's elapsed-to-exception is not a measurement and must not
    // make the bench artifact look healthier than the correctness
    // artifact. Min of the runs that succeeded; error only if both
    // timed runs failed.
    val all: Seq[(String, Either[String, Double])] =
      sorted.zipWithIndex.map { case ((name, fn), i) =>
        def run(): Either[String, Double] = {
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).count()
            Right((System.nanoTime() - t0) / 1e9)
          } catch { case e: Throwable =>
            Left(Option(e.getMessage).getOrElse(e.getClass.getName)
              .takeWhile(_ != '\n').take(120))
          }
        }
        run() // warm: JIT/codegen/footers, discarded
        val r = (run(), run()) match {
          case (Right(a), Right(b)) => Right(math.min(a, b))
          case (Right(a), Left(_))  => Right(a)
          case (Left(_), Right(b))  => Right(b)
          case (Left(m), Left(_))   => Left(m)
        }
        // Queries that persist() internally (e.g. the embedding-LSH
        // path) create a fresh cache entry per invocation — drop them
        // after each trio or orphaned blocks pile up on the heap and
        // later shuffle-heavy queries pay for them in GC. A full
        // System.gc() per query would itself distort timings on a
        // 100 GiB heap, so collect on a stride instead.
        spark.catalog.clearCache()
        if (i % 16 == 15) System.gc()
        name -> r
      }
    val errors = all.collect { case (k, Left(m)) => (k, m) }
    val results = all.collect { case (k, Right(v)) => (k, v) }
    val qs = all.map {
      case (k, Right(v)) => "\"" + k + "\":" + v
      case (k, Left(_))  => "\"" + k + "\":\"err\""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Output ordering is deliberate: the driver captures a bounded TAIL
    // (last ~2000 BYTES) of stdout, so anything printed early can be
    // truncated from the front. The whole per-query surface must fit in
    // that byte budget alongside the headline:
    //  1. the full contract line (full names, ns-resolution timings,
    //     metric "total_full" so no consumer confuses it with the
    //     headline) — bonus if it survives;
    //  2. grouped per-query lines, ~13 queries each: short unique "qNN"
    //     keys + 3-decimal seconds keep the full timing set under
    //     ~1.5 KB total, so EVERY query's number survives any plausible
    //     tail window (one line per query never fit: ~55 B each > 2 KB);
    //  3. the short final headline (metric "total" — the key the driver
    //     parses) with the earliest 7 full-name timings as a cross-check.
    println(s"""{"metric":"total_full","value":$total,"unit":"sec","queries":$qs,"errors":${errors.size},"sf":"$sfDir"}""")
    val shortKey = "^(q[0-9]+).*$".r
    val grouped = all.map { case (k, ev) =>
      val sk = k match { case shortKey(p) => p; case _ => k }
      ev match {
        // Locale.ROOT: the f-interpolator uses the JVM default locale, and
        // a comma-decimal locale (de_DE etc.) would corrupt the JSON
        case Right(v) => String.format(java.util.Locale.ROOT,
          "\"%s\":%.3f", sk, Double.box(v))
        case Left(_) => "\"" + sk + "\":\"err\""
      }
    }.grouped(13).toSeq
    grouped.zipWithIndex.foreach { case (g, i) =>
      println(s"""{"metric":"qtimes","part":${i + 1},"parts":${grouped.size},"queries":${g.mkString("{", ",", "}")}}""")
    }
    errors.foreach { case (k, m) =>
      println(s"""{"metric":"qerror","query":"$k","err":"${m.replace("\\", "\\\\").replace("\"", "\\\"")}"}""")
    }
    val head = results.take(7).map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_errors":${errors.size},"sf":"$sfDir","head_queries":$head}""")
    spark.stop()
  }
}
