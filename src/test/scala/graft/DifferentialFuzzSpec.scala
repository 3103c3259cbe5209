package graft

import java.nio.file.{Files, Paths}

import scala.util.Random

import org.apache.spark.sql.Row

/** Differential fuzzing — the sqlsmith analog (reference:
  * src/tests/sqlsmith/): a SEEDED generator composes random SELECTs
  * from a small grammar (scan/filter/join/agg/window over the fixture
  * tables) restricted to the Spark∩DuckDB dialect subset, runs every
  * query through `Engine.execute` AND DuckDB, and diffs canonical row
  * renderings. Catches dialect-shim and expression-semantics
  * divergences no hand-written pack covers.
  *
  * Determinism rules (same as the oracle corpus): doubles only ever
  * reach the output as DECIMAL(18,2) casts, timestamps as DATE casts,
  * sums over decimals/integers — so canonical rendering is exact on
  * both engines and row sets compare byte-identically after sorting.
  */
class DifferentialFuzzSpec extends SparkSpecBase {

  private val SfDir = "/root/testdata/sf0.001"
  private val NQueries = 500
  private val Seed = 20260813L

  // (name, columns as (colName, kind)): I integral, D double, S string,
  // T timestamp; first column doubles as the unique/order key
  private val tables: Seq[(String, Seq[(String, Char)])] = Seq(
    "region" -> Seq("r_regionkey" -> 'I', "r_name" -> 'S'),
    "nation" -> Seq("n_nationkey" -> 'I', "n_name" -> 'S',
      "n_regionkey" -> 'I'),
    "customer" -> Seq("c_custkey" -> 'I', "c_name" -> 'S',
      "c_nationkey" -> 'I', "c_acctbal" -> 'D', "c_mktsegment" -> 'S'),
    "supplier" -> Seq("s_suppkey" -> 'I', "s_name" -> 'S',
      "s_nationkey" -> 'I', "s_acctbal" -> 'D'),
    "part" -> Seq("p_partkey" -> 'I', "p_name" -> 'S', "p_brand" -> 'S',
      "p_type" -> 'S', "p_size" -> 'I', "p_retailprice" -> 'D'),
    "orders" -> Seq("o_orderkey" -> 'I', "o_custkey" -> 'I',
      "o_orderstatus" -> 'S', "o_totalprice" -> 'D', "o_orderdate" -> 'T',
      "o_orderpriority" -> 'S'),
    "lineitem" -> Seq("l_orderkey" -> 'I', "l_partkey" -> 'I',
      "l_suppkey" -> 'I', "l_linenumber" -> 'I', "l_quantity" -> 'D',
      "l_extendedprice" -> 'D', "l_discount" -> 'D', "l_tax" -> 'D',
      "l_returnflag" -> 'S', "l_linestatus" -> 'S', "l_shipdate" -> 'T'))

  // FK join pairs: (left, right, leftKey, rightKey)
  private val joins = Seq(
    ("nation", "region", "n_regionkey", "r_regionkey"),
    ("customer", "nation", "c_nationkey", "n_nationkey"),
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("supplier", "nation", "s_nationkey", "n_nationkey"),
    ("lineitem", "part", "l_partkey", "p_partkey"))

  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.size))

  /** Output-safe select expression for a column (exact rendering on
    * both engines; doubles → DECIMAL, timestamps → DATE).
    */
  private def selExpr(r: Random, c: String, kind: Char): String = kind match {
    case 'I' => pick(r, Seq(c, s"$c + 3", s"$c % 7", s"abs($c - 10)",
      s"CASE WHEN $c % 2 = 0 THEN $c ELSE -$c END",
      s"greatest($c, 50)", s"least($c, 50)"))
    case 'D' => s"CAST($c AS DECIMAL(18,2))"
    case 'S' => pick(r, Seq(c, s"upper($c)", s"lower($c)",
      s"substr($c, 1, 4)", s"length($c)", s"$c || '_z'",
      s"replace($c, 'a', '#')"))
    case 'T' => pick(r, Seq(s"CAST($c AS DATE)",
      s"EXTRACT(YEAR FROM $c)", s"EXTRACT(MONTH FROM $c)"))
  }

  private def predicate(r: Random, c: String, kind: Char): String = kind match {
    case 'I' => pick(r, Seq(s"$c > ${r.nextInt(200)}",
      s"$c <= ${r.nextInt(2000)}", s"$c % ${2 + r.nextInt(5)} = 1",
      s"$c IN (${Seq.fill(3)(r.nextInt(100)).mkString(", ")})"))
    case 'D' => pick(r, Seq(s"$c > ${100 + r.nextInt(5000)}",
      s"$c BETWEEN ${r.nextInt(500)} AND ${1000 + r.nextInt(9000)}"))
    case 'S' => pick(r, Seq(s"$c LIKE '${('A' + r.nextInt(26)).toChar}%'",
      s"$c > '${('A' + r.nextInt(26)).toChar}'", s"$c IS NOT NULL",
      s"length($c) > ${3 + r.nextInt(12)}"))
    case 'T' =>
      s"$c >= TIMESTAMP '199${2 + r.nextInt(6)}-0${1 + r.nextInt(9)}-01 00:00:00'"
  }

  /** Conjunction or PARENTHESIZED disjunction. The parens are load-
    * bearing where callers conjoin this with a correlation predicate
    * (`corr = key AND <pred>`): an unparenthesized OR lets the
    * correlation escape its conjunct, a shape Catalyst's decorrelation
    * cannot rewrite — Spark itself dies with None.get inside
    * RewritePredicateSubquery.rewriteDomainJoinsIfPresent (found by
    * this fuzzer's seed stream; correlated-EXISTS-under-disjunction is
    * a pinned engine limitation inherited from Spark, matching the
    * reference's own unsupported-subquery envelope).
    */
  private def wherePred(r: Random, cols: Seq[(String, Char)]): String = {
    val n = 1 + r.nextInt(2)
    val ps = Seq.fill(n) { val (c, k) = pick(r, cols); predicate(r, c, k) }
    if (r.nextBoolean() || ps.length == 1) ps.mkString(" AND ")
    else ps.mkString("(", " OR ", ")")
  }

  private def genScan(r: Random): String = {
    val (t, cols) = pick(r, tables)
    val sel = (0 until 1 + r.nextInt(4)).map { i =>
      val (c, k) = pick(r, cols); s"${selExpr(r, c, k)} AS c$i"
    }
    s"SELECT ${sel.mkString(", ")} FROM $t WHERE ${wherePred(r, cols)}"
  }

  private def genJoin(r: Random): String = {
    val (lt, rt, lk, rk) = pick(r, joins)
    val lcols = tables.toMap.apply(lt)
    val rcols = tables.toMap.apply(rt)
    val jt = pick(r, Seq("JOIN", "LEFT JOIN"))
    val sel = (0 until 2 + r.nextInt(3)).map { i =>
      val side = if (r.nextBoolean()) (lt, lcols) else (rt, rcols)
      val (c, k) = pick(r, side._2)
      s"${selExpr(r, s"${side._1}.$c", k)} AS c$i"
    }
    // predicate on the LEFT side only: a right-side filter under a LEFT
    // JOIN is dialect-identical too, but left keeps null rows in play
    s"SELECT ${sel.mkString(", ")} FROM $lt $jt $rt ON $lt.$lk = $rt.$rk " +
      s"WHERE ${wherePred(r, lcols.map { case (c, k) => (s"$lt.$c", k) })}"
  }

  private def genAgg(r: Random): String = {
    val (t, cols) = pick(r, tables)
    val (g, _) = pick(r, cols.filter(c => c._2 == 'S' || c._2 == 'I'))
    val aggs = (0 until 1 + r.nextInt(3)).map { i =>
      val (c, k) = pick(r, cols)
      val a = k match {
        case 'D' => pick(r, Seq(s"sum(CAST($c AS DECIMAL(18,2)))",
          s"min(CAST($c AS DECIMAL(18,2)))", s"max(CAST($c AS DECIMAL(18,2)))"))
        case 'I' => pick(r, Seq(s"CAST(sum($c) AS BIGINT)", s"min($c)",
          s"max($c)", s"count($c)"))
        case 'S' => pick(r, Seq(s"min($c)", s"max($c)", s"count($c)"))
        case 'T' => s"count($c)"
      }
      s"$a AS a$i"
    }
    val having = if (r.nextBoolean()) s" HAVING count(*) > ${r.nextInt(3)}" else ""
    s"SELECT $g, count(*) AS cnt, ${aggs.mkString(", ")} FROM $t " +
      s"WHERE ${wherePred(r, cols)} GROUP BY $g$having"
  }

  private def genJoinAgg(r: Random): String = {
    val (lt, rt, lk, rk) = pick(r, joins)
    val rcols = tables.toMap.apply(rt)
    val lcols = tables.toMap.apply(lt)
    val (g, _) = pick(r, rcols.filter(c => c._2 == 'S' || c._2 == 'I'))
    val (m, mk) = pick(r, lcols)
    val agg = mk match {
      case 'D' => s"sum(CAST($lt.$m AS DECIMAL(18,2)))"
      case 'T' => s"count($lt.$m)"
      case _ => s"min($lt.$m)"
    }
    s"SELECT $rt.$g AS g, count(*) AS cnt, $agg AS a0 FROM $lt " +
      s"JOIN $rt ON $lt.$lk = $rt.$rk " +
      s"WHERE ${wherePred(r, lcols.map { case (c, k) => (s"$lt.$c", k) })} " +
      s"GROUP BY $rt.$g"
  }

  // tie-FREE window order keys (engine tie-breaks differ — memory rule).
  // The synthetic lineitem does NOT have a unique (l_orderkey,
  // l_linenumber): order by the full row — identical rows contribute
  // identically under any tie-break, so prefixes stay deterministic.
  private val uniqueKey: Map[String, String] = Map(
    "lineitem" -> ("l_orderkey, l_linenumber, l_partkey, l_suppkey, " +
      "l_quantity, l_extendedprice")).withDefault(t =>
    tables.toMap.apply(t).head._1)

  private def genWindow(r: Random): String = {
    val (t, cols) = pick(r, tables)
    val pkCol = uniqueKey(t)
    val (p, _) = pick(r, cols.filter(c => c._2 == 'S' || c._2 == 'I'))
    val fn = pick(r, Seq("row_number()", "rank()", "dense_rank()",
      s"ntile(${2 + r.nextInt(4)})"))
    val (d, dk) = pick(r, cols)
    val runSum = if (dk == 'D')
      s", CAST(sum(CAST($d AS DECIMAL(18,2))) OVER (PARTITION BY $p " +
        s"ORDER BY $pkCol ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "AS DECIMAL(28,2)) AS rs"
    else ""
    s"SELECT ${cols.head._1}, $fn OVER (PARTITION BY $p ORDER BY $pkCol) AS rn$runSum " +
      s"FROM $t WHERE ${wherePred(r, cols)}"
  }

  /** Two branches with IDENTICAL select lists, different predicates. */
  private def genSetOp(r: Random): String = {
    val (t, cols) = pick(r, tables)
    val op = pick(r, Seq("UNION ALL", "UNION", "INTERSECT", "EXCEPT",
      "INTERSECT ALL", "EXCEPT ALL"))
    val sel = (0 until 1 + r.nextInt(3)).map { i =>
      val (c, k) = pick(r, cols); s"${selExpr(r, c, k)} AS c$i"
    }.mkString(", ")
    s"SELECT $sel FROM $t WHERE ${wherePred(r, cols)} " +
      s"$op SELECT $sel FROM $t WHERE ${wherePred(r, cols)}"
  }

  private def genRollup(r: Random): String = {
    val (t, cols) = pick(r, tables)
    val gcands = r.shuffle(cols.filter(c => c._2 == 'S' || c._2 == 'I'))
    val (g1, g2) = (gcands(0)._1, gcands(1)._1)
    val form = pick(r, Seq(s"ROLLUP($g1, $g2)", s"CUBE($g1, $g2)",
      s"GROUPING SETS (($g1), ($g1, $g2), ())"))
    // no WHERE: over EMPTY input Spark emits zero rows for the ()
    // grouping set where DuckDB/Postgres emit the standard 1-row global
    // aggregate — a pinned dialect divergence, not a bug to chase
    s"SELECT $g1, $g2, count(*) AS cnt FROM $t GROUP BY $form"
  }

  private def genInSub(r: Random): String = {
    val (lt, rt, lk, rk) = pick(r, joins)
    val lcols = tables.toMap.apply(lt)
    val rcols = tables.toMap.apply(rt)
    val neg = if (r.nextBoolean()) "NOT " else ""
    val sel = (0 until 1 + r.nextInt(3)).map { i =>
      val (c, k) = pick(r, lcols); s"${selExpr(r, c, k)} AS c$i"
    }
    s"SELECT ${sel.mkString(", ")} FROM $lt WHERE $lk ${neg}IN " +
      s"(SELECT $rk FROM $rt WHERE ${wherePred(r, rcols)})"
  }

  private def genExists(r: Random): String = {
    val (lt, rt, lk, rk) = pick(r, joins)
    val lcols = tables.toMap.apply(lt)
    val rcols = tables.toMap.apply(rt)
    val neg = if (r.nextBoolean()) "NOT " else ""
    val sel = (0 until 1 + r.nextInt(3)).map { i =>
      val (c, k) = pick(r, lcols); s"${selExpr(r, s"$lt.$c", k)} AS c$i"
    }
    s"SELECT ${sel.mkString(", ")} FROM $lt WHERE ${neg}EXISTS " +
      s"(SELECT 1 FROM $rt WHERE $rt.$rk = $lt.$lk AND " +
      s"${wherePred(r, rcols.map { case (c, k) => (s"$rt.$c", k) })})"
  }

  /** min/max (exact on both engines) scalar subquery in a predicate. */
  private def genScalarSub(r: Random): String = {
    val (t, cols) = pick(r, tables)
    val (c, _) = pick(r, cols.filter(_._2 == 'I'))
    val (t2, cols2) = pick(r, tables)
    val i2 = pick(r, cols2.filter(_._2 == 'I'))._1
    val agg = pick(r, Seq("min", "max"))
    val cmp = pick(r, Seq("<=", ">", "="))
    val sel = (0 until 1 + r.nextInt(3)).map { i =>
      val (sc, k) = pick(r, cols); s"${selExpr(r, sc, k)} AS c$i"
    }
    s"SELECT ${sel.mkString(", ")} FROM $t WHERE $c $cmp " +
      s"(SELECT $agg($i2) FROM $t2 WHERE ${wherePred(r, cols2)}) " +
      s"AND ${wherePred(r, cols)}"
  }

  /** Offset/navigation window functions over a tie-free order. */
  private def genLagWindow(r: Random): String = {
    val (t, cols) = pick(r, tables)
    val pkCol = uniqueKey(t)
    val (p, _) = pick(r, cols.filter(c => c._2 == 'S' || c._2 == 'I'))
    val (v, _) = pick(r, cols.filter(_._2 == 'I'))
    val fn = pick(r, Seq(s"lag($v, 1)", s"lead($v, 1)",
      s"first_value($v)", s"last_value($v)"))
    s"SELECT ${cols.head._1}, $fn OVER (PARTITION BY $p ORDER BY $pkCol) " +
      s"AS w FROM $t WHERE ${wherePred(r, cols)}"
  }

  /** Deterministic top-N: full ORDER BY a unique key. */
  private def genTopN(r: Random): String = {
    val (t, cols) = pick(r, tables)
    val sel = (0 until 1 + r.nextInt(3)).map { i =>
      val (c, k) = pick(r, cols); s"${selExpr(r, c, k)} AS c$i"
    }
    s"SELECT ${sel.mkString(", ")} FROM $t WHERE ${wherePred(r, cols)} " +
      s"ORDER BY ${uniqueKey(t)} LIMIT ${1 + r.nextInt(50)}"
  }

  private def genDistinct(r: Random): String = {
    val (t, cols) = pick(r, tables)
    val sel = (0 until 1 + r.nextInt(2)).map { i =>
      val (c, k) = pick(r, cols); s"${selExpr(r, c, k)} AS c$i"
    }
    s"SELECT DISTINCT ${sel.mkString(", ")} FROM $t " +
      s"WHERE ${wherePred(r, cols)}"
  }

  // two-hop FK chains for three-way joins
  private val triples = Seq(
    ("lineitem", "orders", "customer",
      "l_orderkey", "o_orderkey", "o_custkey", "c_custkey"),
    ("customer", "nation", "region",
      "c_nationkey", "n_nationkey", "n_regionkey", "r_regionkey"),
    ("supplier", "nation", "region",
      "s_nationkey", "n_nationkey", "n_regionkey", "r_regionkey"))

  private def genJoin3(r: Random): String = {
    val (t1, t2, t3, k1, k2a, k2b, k3) = pick(r, triples)
    val all = Seq(t1, t2, t3)
    val sel = (0 until 2 + r.nextInt(3)).map { i =>
      val t = pick(r, all)
      val (c, k) = pick(r, tables.toMap.apply(t))
      s"${selExpr(r, s"$t.$c", k)} AS c$i"
    }
    val cols1 = tables.toMap.apply(t1).map { case (c, k) => (s"$t1.$c", k) }
    s"SELECT ${sel.mkString(", ")} FROM $t1 " +
      s"JOIN $t2 ON $t1.$k1 = $t2.$k2a JOIN $t3 ON $t2.$k2b = $t3.$k3 " +
      s"WHERE ${wherePred(r, cols1)}"
  }

  /** FULL OUTER join of two aggregates over disjointly-filtered slices
    * of one table — real null-extensions on both sides.
    */
  private def genFullJoin(r: Random): String = {
    val (t, cols) = pick(r, tables)
    val (g, _) = pick(r, cols.filter(_._2 == 'I'))
    s"SELECT COALESCE(a.g, b.g) AS g, a.cnt AS ac, b.cnt AS bc " +
      s"FROM (SELECT $g AS g, count(*) AS cnt FROM $t " +
      s"WHERE ${wherePred(r, cols)} GROUP BY 1) a " +
      s"FULL JOIN (SELECT $g AS g, count(*) AS cnt FROM $t " +
      s"WHERE ${wherePred(r, cols)} GROUP BY 1) b ON a.g = b.g"
  }

  /** Aggregate over a deterministic (totally-ordered LIMIT) derived
    * table.
    */
  private def genFromSub(r: Random): String = {
    val (t, cols) = pick(r, tables)
    val (x, _) = pick(r, cols.filter(_._2 == 'I'))
    s"SELECT count(*) AS cnt, CAST(sum(x) AS BIGINT) AS s, " +
      s"min(x) AS mn, max(x) AS mx FROM " +
      s"(SELECT $x AS x FROM $t WHERE ${wherePred(r, cols)} " +
      s"ORDER BY ${uniqueKey(t)} LIMIT ${5 + r.nextInt(100)}) q"
  }

  /** COALESCE/NULLIF three-valued logic + IS [NOT] DISTINCT FROM. */
  private def genNullLogic(r: Random): String = {
    val (t, cols) = pick(r, tables)
    val (i, _) = pick(r, cols.filter(_._2 == 'I'))
    val (sC, _) = pick(r, cols.filter(_._2 == 'S'))
    val m = 2 + r.nextInt(5)
    val dist = if (r.nextBoolean()) "IS DISTINCT FROM" else "IS NOT DISTINCT FROM"
    s"SELECT COALESCE(NULLIF($i % $m, ${r.nextInt(3)}), -1) AS c0, " +
      s"NULLIF(substr($sC, 1, 1), '${('A' + r.nextInt(26)).toChar}') AS c1, " +
      s"CASE WHEN NULLIF($i % $m, 1) IS NULL THEN 'n' ELSE 'v' END AS c2 " +
      s"FROM $t WHERE ${wherePred(r, cols)} " +
      s"AND NULLIF($i % $m, ${r.nextInt(m)}) $dist ${r.nextInt(m)}"
  }

  /** Calendar rollup: date_trunc (coarse units return DATE in DuckDB —
    * cast both sides) + EXTRACT grouping.
    */
  private def genDateTrunc(r: Random): String = {
    val (t, cols) = pick(r, Seq("orders", "lineitem")
      .map(n => n -> tables.toMap.apply(n)))
    val (tc, _) = pick(r, cols.filter(_._2 == 'T'))
    val unit = pick(r, Seq("year", "quarter", "month", "week"))
    s"SELECT CAST(date_trunc('$unit', $tc) AS DATE) AS p, " +
      s"count(*) AS cnt FROM $t WHERE ${wherePred(r, cols)} GROUP BY 1"
  }

  /** Conditional aggregation — CASE inside aggregates, global (1 row). */
  private def genCaseAgg(r: Random): String = {
    val (t, cols) = pick(r, tables)
    val (i, _) = pick(r, cols.filter(_._2 == 'I'))
    s"SELECT CAST(sum(CASE WHEN ${predicate(r, i, 'I')} THEN 1 ELSE 0 END) " +
      s"AS BIGINT) AS c0, " +
      s"count(CASE WHEN ${wherePred(r, cols)} THEN 1 END) AS c1, " +
      s"CAST(sum(CASE WHEN $i % ${2 + r.nextInt(4)} = 0 THEN $i END) " +
      s"AS BIGINT) AS c2 FROM $t"
  }

  /** ASOF JOIN — DuckDB runs its native ASOF operator, the engine the
    * LATERAL extremal-pick rewrite. Self-joins with a per-key-unique
    * ordering column make the pick deterministic on both engines;
    * backward forms only (`>`/`>=`, the common case and the one every
    * DuckDB version supports).
    */
  private def genAsofJoin(r: Random): String = {
    val (t, key, ord) = pick(r, Seq(
      ("orders", "o_custkey", "o_orderkey"),
      ("lineitem", "l_orderkey", "l_linenumber")))
    val op = pick(r, Seq(">", ">="))
    val left = if (r.nextBoolean()) "LEFT " else ""
    val m = 2 + r.nextInt(9)
    s"SELECT a.$key AS c0, a.$ord AS c1, b.$ord AS c2 " +
      s"FROM $t a ASOF ${left}JOIN $t b " +
      s"ON a.$key = b.$key AND a.$ord $op b.$ord " +
      s"WHERE a.$ord % $m = ${r.nextInt(2)}"
  }

  /** DISTINCT ON — DuckDB's native form vs the engine's row_number
    * rewrite; the ORDER BY ends on a per-key-unique column, so the PG
    * survivor rule picks one deterministic row on both engines.
    */
  private def genDistinctOn(r: Random): String = {
    val (t, key, ord) = pick(r, Seq(
      ("orders", "o_custkey", "o_orderkey"),
      ("lineitem", "l_orderkey", "l_linenumber"),
      ("customer", "c_nationkey", "c_custkey")))
    val dir = pick(r, Seq("ASC", "DESC"))
    val m = 2 + r.nextInt(9)
    s"SELECT DISTINCT ON ($key) $key AS c0, $ord AS c1 FROM $t " +
      s"WHERE $ord % $m = ${r.nextInt(2)} ORDER BY $key, $ord $dir"
  }

  /** FILTER-clause aggregates — both engines implement the standard
    * form; sums cast to BIGINT (DuckDB sums ints to HUGEINT).
    */
  private def genFilterAgg(r: Random): String = {
    val (t, cols) = pick(r, tables)
    val (g, _) = pick(r, cols.filter(c => c._2 == 'S' || c._2 == 'I'))
    val (i, _) = pick(r, cols.filter(_._2 == 'I'))
    s"SELECT $g, count(*) AS cnt, " +
      s"count(*) FILTER (WHERE ${predicate(r, i, 'I')}) AS f0, " +
      s"CAST(sum($i) FILTER (WHERE ${predicate(r, i, 'I')}) AS BIGINT) AS f1, " +
      s"count(DISTINCT $i) FILTER (WHERE ${predicate(r, i, 'I')}) AS f2 " +
      s"FROM $t WHERE ${wherePred(r, cols)} GROUP BY $g"
  }

  /** Correlated scalar subquery in the SELECT list (count — always
    * exactly one deterministic value per outer row).
    */
  private def genCorrScalar(r: Random): String = {
    val (lt, rt, lk, rk) = pick(r, joins)
    val lcols = tables.toMap.apply(lt)
    val rcols = tables.toMap.apply(rt)
    s"SELECT ${uniqueKey(lt).split(",").head.trim} AS c0, " +
      s"(SELECT count(*) FROM $rt WHERE $rt.$rk = $lt.$lk AND " +
      s"${wherePred(r, rcols.map { case (c, k) => (s"$rt.$c", k) })}) AS c1 " +
      s"FROM $lt WHERE ${wherePred(r, lcols.map { case (c, k) => (s"$lt.$c", k) })}"
  }

  /** One CTE consumed twice — plan-reuse paths on both engines. */
  private def genCte(r: Random): String = {
    val (t, cols) = pick(r, tables)
    val (g, _) = pick(r, cols.filter(_._2 == 'I'))
    s"WITH q AS (SELECT $g AS g, count(*) AS cnt FROM $t " +
      s"WHERE ${wherePred(r, cols)} GROUP BY 1) " +
      s"SELECT a.g AS c0, a.cnt AS c1, b.cnt AS c2 FROM q a " +
      s"JOIN q b ON a.g = b.g WHERE a.cnt > ${r.nextInt(3)}"
  }

  private def gen(r: Random): String = r.nextInt(29) match {
    case 0 | 1 | 2 => genScan(r)
    case 3 | 4 => genJoin(r)
    case 5 | 6 => genAgg(r)
    case 7 => genJoinAgg(r)
    case 8 => genWindow(r)
    case 9 => genSetOp(r)
    case 10 => genRollup(r)
    case 11 => genInSub(r)
    case 12 => genExists(r)
    case 13 => genScalarSub(r)
    case 14 => genLagWindow(r)
    case 15 => genTopN(r)
    case 16 => genDistinct(r)
    case 17 => genJoin3(r)
    case 18 => genFullJoin(r)
    case 19 => genFromSub(r)
    case 20 => genNullLogic(r)
    case 21 => genDateTrunc(r)
    case 22 => genCaseAgg(r)
    case 23 | 24 => genAsofJoin(r)
    case 25 => genDistinctOn(r)
    case 26 => genFilterAgg(r)
    case 27 => genCorrScalar(r)
    case _ => genCte(r)
  }

  /** Canonical row rendering — must match tools/fuzz_oracle.py. */
  private def canon(rows: Array[Row]): Seq[String] =
    rows.toSeq.map { row =>
      (0 until row.length).map { i =>
        row.get(i) match {
          case null => "∅"
          case b: Boolean => if (b) "true" else "false"
          case d: java.math.BigDecimal => d.toPlainString
          case other => other.toString
        }
      }.mkString("\u0001")
    }.sorted

  test(s"$NQueries seeded random queries match DuckDB") {
    assume(Files.exists(Paths.get(SfDir)), s"fixture dir $SfDir missing")
    val e = new Engine(spark, tmpDir("fuzz-wh"))
    e.attachTables(SfDir)

    val r = new Random(Seed)
    val queries = (0 until NQueries).map(i => f"fz$i%03d" -> gen(r))

    // engine side
    val sparkResults: Map[String, Either[String, Seq[String]]] =
      queries.map { case (name, sql) =>
        name -> (try Right(canon(e.execute(sql).collect()))
        catch { case ex: Throwable =>
          Left(Option(ex.getMessage).getOrElse("?").linesIterator.next())
        })
      }.toMap

    // oracle side (driver-side python + duckdb)
    val dir = tmpDir("fuzz")
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    Files.writeString(Paths.get(s"$dir/queries.json"),
      queries.map { case (n, q) => s"${jstr(n)}: ${jstr(q)}" }
        .mkString("{", ",", "}"))
    val pb = new ProcessBuilder("python3",
      Paths.get("tools/fuzz_oracle.py").toAbsolutePath.toString,
      SfDir, s"$dir/queries.json", s"$dir/oracle.json")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val procOut = new String(proc.getInputStream.readAllBytes())
    assert(proc.waitFor() == 0, s"fuzz_oracle.py failed: $procOut")

    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val oracle = JsonMethods.parse(Files.readString(Paths.get(s"$dir/oracle.json")))
      .asInstanceOf[JObject].obj.toMap

    val failures = queries.flatMap { case (name, sql) =>
      val ours = sparkResults(name)
      val theirs = oracle(name) match {
        case JObject(fields) =>
          fields.toMap.get("rows") match {
            case Some(JArray(vs)) => Right(vs.map(_.asInstanceOf[JString].s))
            case _ => Left(fields.toMap.get("error")
              .collect { case JString(s) => s }.getOrElse("?"))
          }
        case _ => Left("bad oracle entry")
      }
      (ours, theirs) match {
        // both engines rejecting a query is not a divergence
        case (Left(_), Left(_)) => None
        case (Right(a), Right(b)) if a == b => None
        case (Right(a), Right(b)) =>
          val firstDiff = a.zipAll(b, "<missing>", "<missing>")
            .find { case (x, y) => x != y }
          Some(s"$name: ${a.size} vs ${b.size} rows; first diff $firstDiff\n  $sql")
        case (Left(err), Right(_)) => Some(s"$name: engine error [$err]\n  $sql")
        case (Right(_), Left(err)) => Some(s"$name: duckdb error [$err]\n  $sql")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size}/${queries.size} divergences:\n" +
        failures.take(8).mkString("\n"))
    // keep the test honest: "both engines errored" counts as
    // non-divergent above, so a grammar regression could silently turn
    // the whole corpus into agreed-upon failures
    val ran = queries.count { case (n, _) => sparkResults(n).isRight }
    assert(ran >= (NQueries * 95) / 100,
      s"only $ran/$NQueries generated queries executed on the engine")
  }
}
