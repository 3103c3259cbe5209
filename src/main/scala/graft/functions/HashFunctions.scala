package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic, engine-portable hashing primitives.
  *
  * Everything is built on md5 rather than Spark's xxhash64/murmur so results
  * are reproducible by any other engine (the correctness oracle, a Python
  * pipeline, …) — important for fingerprints that get persisted at 100 TB
  * scale and joined against later by other systems.
  */
object HashFunctions {

  /** Stable 60-bit non-negative hash: first 15 hex chars of md5(s).
    * Pure Catalyst expressions — stays inside whole-stage codegen.
    */
  def md5Long(c: Column): Column =
    conv(substring(md5(c.cast(BinaryType)), 1, 15), 16, 10).cast(LongType)

  /** Seeded family of independent hash functions (seed folded into the
    * input) — the basis for MinHash signatures.
    */
  def md5LongSeeded(c: Column, seed: Column): Column =
    md5Long(concat(seed.cast(StringType), lit(":"), c))

  /** Full md5 hex digest of a string column (content fingerprint). */
  def md5Hex(c: Column): Column = md5(c.cast(BinaryType))

  /** Driver-side evaluation of [[md5Long]] for plan-time constants (e.g.
    * LSH hyperplane components) — identical value to the column version.
    */
  def md5LongLocal(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
}
