package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Dump `.explain("formatted")` for declared queries to files — the
  * round-10 optimization evidence trail (plans/r10/<query>_{before,after}.txt).
  *
  * Usage: ExplainAll <outDir> <suffix> [sfDir] [q1,q2,...]
  * Lifecycle queries (Engine bootstrap inside the query fn) are skipped:
  * their cost is epoch machinery, not a single plan.
  */
object ExplainAll {
  /** Queries whose fn spins up an Engine/warehouse: a plan dump would
    * execute DML side effects; their evidence lives in EpochProfile.
    */
  val lifecycle: Set[String] = Set(
    "q_dml_chain", "q_dml_features", "q_time_travel", "q_changelog_diff",
    "q_temporal_filter")

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r10")
    val suffix = if (args.length > 1) args(1) else "before"
    val sfDir = if (args.length > 2) args(2) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only = if (args.length > 3) args(3).split(",").toSet else Set.empty[String]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    GraftSession.init(spark)
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => lifecycle(q._1))
      .filter(q => only.isEmpty || only(q._1))
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
          txt.getBytes(StandardCharsets.UTF_8))
        println(s"[explain] $name ok")
      } catch { case e: Throwable =>
        println(s"[explain] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
