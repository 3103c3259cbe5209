package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IPv4 / CIDR primitives (reference: src/expr/impl/src/scalar/inet.rs
  * registers `inet_aton` / `inet_ntoa`; the CIDR helpers mirror PG's
  * inet operators that curation pipelines use for IP-range filtering).
  *
  * All pure Column arithmetic — codegen'd, shuffle-free, and expressed
  * with the same integer formulas the DuckDB oracles evaluate, so the
  * cross-engine gate checks the semantics rather than a shared library.
  * The 2^(32-m) netmask is computed via pow in double space: every
  * power of two up to 2^32 is exactly representable, so the cast back
  * to BIGINT is exact in both engines.
  */
object NetFunctions {

  /** inet_aton: dotted-quad text → numeric address (BIGINT). */
  def inetAton(ip: Column): Column = {
    val o = split(ip, "\\.")
    (o.getItem(0).cast(LongType) * 16777216L +
      o.getItem(1).cast(LongType) * 65536L +
      o.getItem(2).cast(LongType) * 256L +
      o.getItem(3).cast(LongType))
  }

  /** inet_ntoa: numeric address → dotted-quad text. */
  def inetNtoa(n: Column): Column = concat_ws(".",
    floor(n / 16777216L).cast(LongType) % 256L,
    floor(n / 65536L).cast(LongType) % 256L,
    floor(n / 256L).cast(LongType) % 256L,
    n.cast(LongType) % 256L)

  /** masklen('a.b.c.d/m') → m. */
  def cidrMasklen(cidr: Column): Column =
    substring_index(cidr, "/", -1).cast(IntegerType)

  private def netmask(masklen: Column): Column =
    lit(4294967295L) -
      (pow(lit(2.0), lit(32) - masklen).cast(LongType) - 1L)

  /** network('a.b.c.d/m') → the zeroed-host network address as text. */
  def cidrNetwork(cidr: Column): Column = {
    val base = inetAton(substring_index(cidr, "/", 1))
    val m = netmask(cidrMasklen(cidr))
    inetNtoa(base.bitwiseAND(m))
  }

  /** broadcast('a.b.c.d/m') → the all-ones-host address as text. */
  def cidrBroadcast(cidr: Column): Column = {
    val base = inetAton(substring_index(cidr, "/", 1))
    val m = netmask(cidrMasklen(cidr))
    inetNtoa(base.bitwiseAND(m) + (lit(4294967295L) - m))
  }

  /** `cidr >> ip`: does the range contain the address? */
  def cidrContains(cidr: Column, ip: Column): Column = {
    val m = netmask(cidrMasklen(cidr))
    inetAton(substring_index(cidr, "/", 1)).bitwiseAND(m) ===
      inetAton(ip).bitwiseAND(m)
  }
}
