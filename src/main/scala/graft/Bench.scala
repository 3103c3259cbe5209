package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall seconds.
  *
  * A query that throws is EXCLUDED from `queries` and the total and lands
  * in an `"errors"` map instead — its time-to-failure must never masquerade
  * as a measurement.
  */
object Bench {

  /** Time `repeat` runs of one query; Left(errorMsg) if any run throws. */
  def measure(spark: SparkSession, sfDir: String, repeat: Int,
      fn: (SparkSession, String) => DataFrame): Either[String, Seq[Double]] =
    try Right((1 to repeat).map { _ =>
      val t0 = System.nanoTime()
      // Full materialization via the noop sink — count() would let column
      // pruning skip most of the work for projection-only queries.
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    })
    catch { case e: Throwable =>
      Left(Option(e.getMessage).getOrElse(e.toString))
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    GraftSession.init(spark)
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen path once so per-query numbers measure the
    // engine, not classloading.
    SparkEntry.queries.get("q1_agg").foreach { fn =>
      measure(spark, sfDir, 1, fn)
    }
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter(q => only(q._1))
    // repeat>1: report BOTH the cold first run and the steady-state min
    // in one artifact, so cold-vs-warm numbers are never cross-compared
    // from different experiments (driver runs with the default 1, where
    // cold == min and the output shape is unchanged)
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "1").toInt
    val outcomes = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> measure(spark, sfDir, repeat, fn)
    }
    val results = outcomes.collect {
      case (name, Right(times)) => (name, times.head, times.min)
    }
    val errors = outcomes.collect { case (name, Left(msg)) => (name, msg) }
    errors.foreach { case (n, m) => System.err.println(s"[bench] $n FAILED: $m") }
    // 3 decimals (ms resolution): keeps the full per-query line compact
    // enough for log-tail windows without losing measurement precision
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def dict(f: ((String, Double, Double)) => Double) = results
      .map(t => Verify.jsonQuote(t._1) + ":" + r3(f(t))).mkString("{", ",", "}")
    val qs = dict(_._3)
    val total = results.map(_._3).sum
    val cold = if (repeat > 1) s""","queries_cold":${dict(_._2)}""" else ""
    val errs = errors
      .map { case (k, v) => Verify.jsonQuote(k) + ":" + Verify.jsonQuote(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs$cold,"errors":$errs,"sf":"$sfDir"}""")
    // compact summary LAST so any bounded tail of the output still
    // contains one complete, parseable record (the full line above can
    // overflow a log-tail window)
    val top = results.sortBy(-_._3).take(10)
      .map(t => Verify.jsonQuote(t._1) + ":" + r3(t._3)).mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","n":${results.size},"error_count":${errors.size},"truncated":true,"queries":$top,"sf":"$sfDir"}""")
    spark.stop()
  }
}
