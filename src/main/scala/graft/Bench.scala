package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall seconds.
  */
object Bench {
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
    // Full materialization via the noop sink — count() would let column
    // pruning skip most of the work for projection-only queries.
    def run(fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // Warm the JVM/codegen path once so per-query numbers measure the
    // engine, not classloading.
    SparkEntry.queries.get("q1_agg").foreach { fn =>
      try run(fn) catch { case _: Throwable => () }
    }
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    val selected =
      if (only.isEmpty) SparkEntry.queries else SparkEntry.queries.filter(q => only(q._1))
    // repeat>1: report BOTH the cold first run and the steady-state min
    // in one artifact, so cold-vs-warm numbers are never cross-compared
    // from different experiments (driver runs with the default 1, where
    // cold == min and the output shape is unchanged)
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "1").toInt
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        try run(fn) catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      (name, times.head, times.min)
    }
    def dict(f: ((String, Double, Double)) => Double) = results
      .map(t => "\"" + t._1 + "\":" + f(t)).mkString("{", ",", "}")
    val qs = dict(_._3)
    val total = results.map(_._3).sum
    val cold = if (repeat > 1) s""","queries_cold":${dict(_._2)}""" else ""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$cold,"sf":"$sfDir"}""")
    spark.stop()
  }
}
