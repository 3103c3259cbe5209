package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** Dev utility: time + explain pipeline stages for a named probe.
  * Usage: runMain graft.tools.PlanDump <probe> <sfDir>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val probe = args.headOption.getOrElse("minhash")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]")).getOrCreate()
    GraftSession.init(spark)
    spark.sparkContext.setLogLevel("WARN")
    Tables.register(spark, sfDir)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[plandump] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    probe match {
      case "minhash" =>
        val d = spark.table("documents").select("doc_id", "text")
        val sig = Dedup.withMinhashSignature(d, "text", "sig", 12, 3)
        time("tokens-only") {
          d.select(graft.functions.TextFunctions.tokens(col("text")).as("t"))
            .select(sum(size(col("t")))).collect()
        }
        time("signature") { sig.select(sum(size(col("sig")))).collect() }
        time("signature-again") { sig.select(sum(size(col("sig")))).collect() }
        val pairs = Dedup.minhashCandidatePairs(d, "doc_id", "text")
        time("pairs") { println("npairs=" + pairs.count()) }
      case other =>
        println(s"unknown probe $other")
    }
    spark.stop()
  }
}
