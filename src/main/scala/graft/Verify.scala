package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failure is LOUD: a query that throws gets (a) its output dir emptied and
  * an `_error.txt` marker written inside it — so any consumer keyed on the
  * dir sees a red, unreadable result instead of a silently missing one —
  * and (b) an entry in a top-level `errors.json` (always written, `{}` when
  * clean). A thrown query can never again vanish from the artifact.
  */
object Verify {

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    */
  def jsonQuote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally s.close()
    }

  /** Run ONE query and dump it; on failure, empty the query dir, write the
    * `_error.txt` marker, and return the error message. Package-visible so
    * VerifyHarnessSpec can prove the failure path.
    */
  def runOne(spark: SparkSession, outDir: String, name: String,
      fn: (SparkSession, String) => DataFrame, sfDir: String): Option[String] =
    try {
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      None
    } catch { case e: Throwable =>
      val msg = Option(e.getMessage).getOrElse(e.toString)
      System.err.println(s"[verify] $name failed: $msg")
      // A mid-write task failure can leave partial part-files that a
      // globbing reader would happily pick up — empty the dir so the only
      // thing in it is the marker.
      val d = Paths.get(outDir, name)
      deleteRecursively(d)
      Files.createDirectories(d)
      Files.writeString(d.resolve("_error.txt"), msg)
      Some(msg)
    }

  /** Write the top-level errors map (always — `{}` when clean). */
  def writeErrors(outDir: String, errors: Seq[(String, String)]): Unit =
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      errors.map { case (k, v) => s"${jsonQuote(k)}: ${jsonQuote(v)}" }
        .mkString("{", ",", "}"))

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    GraftSession.init(spark)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev-only subset knob (driver leaves it unset → all queries).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val errors = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .flatMap { case (name, fn) =>
        runOne(spark, outDir, name, fn, sfDir).map(name -> _)
      }
    writeErrors(outDir, errors)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${jsonQuote(k)}: ${jsonQuote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // Exit 0 even with failures — the per-query markers + errors.json are
    // the red signal; a nonzero exit would make the driver discard the 160
    // good results along with the one bad one.
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: " +
        errors.map(_._1).mkString(", "))
  }
}
