package graft

import org.apache.spark.sql.types._

/** Pins the gate-surface output-type envelope (round-7 regression class).
  *
  * The driver's correctness gate hashes each query's parquet output against
  * DuckDB's result via a pandas bridge; that hash is TYPE-sensitive in ways
  * only observable once per round. Round 7 proved DECIMAL is not
  * hash-stable (DuckDB renders DECIMAL as float64 while Spark parquet
  * keeps Decimal128 — values exactly equal, hash red). This spec walks
  * every `SparkEntry.queries` result schema and rejects any type outside
  * the set the gate has proven stable across seven rounds:
  * DOUBLE / FLOAT / BIGINT / INT / SMALLINT / VARCHAR / BOOLEAN / DATE /
  * TIMESTAMP and ARRAYs thereof. No DECIMAL, BINARY, STRUCT or MAP may
  * appear at the output surface — use them freely inside plans, cast at
  * the edge.
  */
class OutputTypeEnvelopeSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def stableLeaf(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType | LongType | IntegerType | ShortType |
        StringType | BooleanType | DateType | TimestampType |
        TimestampNTZType => true
    case _ => false
  }

  private def stable(dt: DataType): Boolean = dt match {
    case ArrayType(e, _) => stable(e)
    case other           => stableLeaf(other)
  }

  test("every gate query emits only hash-stable output types") {
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    // Group side-effect-free construction: schema is plan-time, but some
    // queries (DML chains, MV lifecycles) execute while building — same
    // contract Verify relies on, so running them here is faithful.
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val schema =
        try fn(spark, sfDir).schema
        catch {
          case e: Throwable =>
            fail(s"$name failed to build at sf0.001: ${e.getMessage}")
        }
      schema.fields.foreach { f =>
        if (!stable(f.dataType))
          bad += s"$name.${f.name}: ${f.dataType.sql}"
      }
    }
    assert(bad.isEmpty,
      s"gate-unstable output types (cast to DOUBLE/BIGINT/... at the edge):\n  " +
        bad.mkString("\n  "))
  }
}
