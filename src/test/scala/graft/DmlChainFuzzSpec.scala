package graft

import org.apache.spark.sql.DataFrame
import scala.util.Random

/** Differential fuzzing of SQL DML against incrementally-chained MVs —
  * the missing dimension between DifferentialFuzzSpec (batch SQL vs
  * DuckDB) and StreamingChainFuzzSpec (source-fed chains vs batch
  * recompute): here the statements are the reference's actual write
  * path (INSERT / UPDATE ... SET / DELETE, including PK-changing
  * updates whose U-/U+ image pair must relocate rows), the upstreams
  * are user TABLES, and the chains are MVs created over them — every
  * third seed is a TWO-TABLE scenario (delta join, agg-over-UNION-ALL,
  * or UNION DISTINCT) with DML bursts on both sides.
  *
  * Two independent oracles per scenario, checked after every FLUSH:
  *   1. each TABLE vs an in-memory model that re-implements each
  *      statement's semantics from scratch (catches DML application
  *      bugs — the same check DuckDB would make running the statements);
  *   2. every chained MV vs a batch recompute of its defining query
  *      over its upstreams' actual storage (catches retraction bugs in
  *      the chain maintenance).
  *
  * Scenarios are grouped several-per-engine with interleaved DML and a
  * SHARED FLUSH — concurrent chains over different tables in one
  * session is itself an adversarial shape (cross-chain temp-view or
  * state leaks fail the other scenario's check).
  */
class DmlChainFuzzSpec extends SparkSpecBase {
  import spark.implicits._

  private val Words = Vector("ash", "bay", "cod", "dew", "elm", "fog", "gum", "hay")

  private case class Row3(g: Long, v: Long, text: String)
  private case class Row2(k2: Long, w: Long)

  /** One fuzz scenario: one or two tables, their models, an MV stack. */
  private final class Scenario(val seed: Int, e: Engine) {
    val r = new Random(seed)
    val t = s"dft_$seed"
    val t2 = s"dft2_$seed"
    val twoTable = seed % 3 == 0
    // single-table variants: a generated column (recomputed on every
    // INSERT/UPDATE) or ON CONFLICT IGNORE (duplicate-PK inserts keep
    // the stored row) ride under the same DML bursts and chain oracles
    val genCol = !twoTable && seed % 5 == 2
    val ocIgnore = !twoTable && seed % 5 == 4
    val model = scala.collection.mutable.Map[Long, Row3]()
    val model2 = scala.collection.mutable.Map[Long, Row2]()
    private var nextId = 0L
    // (mvName, upstreamNames, definingSql)
    val defs = scala.collection.mutable.ArrayBuffer[(String, Seq[String], String)]()

    // oracle-3 state: the model image recorded at every published epoch
    // of each table — time travel must reproduce these exactly
    val snaps = scala.collection.mutable.Map[Long, Seq[(Long, Row3)]]()
    val snaps2 = scala.collection.mutable.Map[Long, Seq[(Long, Row2)]]()
    private def snapT(): Unit =
      e.mvs.get(t).flatMap(_.epochCommitTimes.lastOption).foreach {
        case (ep, _) => snaps(ep) = model.toSeq.sortBy(_._1)
      }
    private def snapT2(): Unit =
      e.mvs.get(t2).flatMap(_.epochCommitTimes.lastOption).foreach {
        case (ep, _) => snaps2(ep) = model2.toSeq.sortBy(_._1)
      }

    private def freshId(): Long = { nextId += 1; nextId }
    private def randRow(): Row3 = Row3(r.nextInt(3).toLong, r.nextInt(20).toLong,
      Seq.fill(1 + r.nextInt(3))(Words(r.nextInt(Words.length))).mkString(" "))

    private def createOneTableStack(): Unit = {
      val first = r.nextInt(4) match {
        case 0 => ("perrow", "(id)", s"SELECT id, g, v, text FROM $t WHERE v % 3 <> 0")
        case 1 => ("agg", "(g)", s"SELECT g, count(*) AS n, sum(v) AS sv FROM $t GROUP BY g")
        case 2 => ("aggexpl", "(tok)", s"SELECT tok, count(*) AS n FROM $t " +
          "LATERAL VIEW explode(split(text, ' ')) x AS tok GROUP BY tok")
        case 3 => ("hagg", "(g)", s"SELECT g, count(*) AS n, sum(v) AS sv FROM $t " +
          "GROUP BY g HAVING max(v) >= 8")
      }
      val n1 = s"dfm_${seed}_0"
      e.execute(s"CREATE MATERIALIZED VIEW $n1 (PRIMARY KEY ${first._2}) AS ${first._3}")
      defs += ((n1, Seq(t), first._3))
      // stack a second layer where columns allow
      val second = first._1 match {
        case "perrow" => r.nextInt(3) match {
          case 0 => Some(("(g)", s"SELECT g, count(*) AS n, sum(v) AS sv FROM $n1 GROUP BY g"))
          case 1 => Some(("(id)", s"SELECT id, g, v * 2 AS v2 FROM $n1"))
          case _ => Some(("(tok)", s"SELECT tok, count(*) AS n FROM $n1 " +
            "LATERAL VIEW explode(split(text, ' ')) x AS tok GROUP BY tok"))
        }
        case "agg" | "hagg" if r.nextBoolean() =>
          Some(("(n)", s"SELECT n, count(*) AS c, sum(sv) AS ssv FROM ${n1} GROUP BY n"))
        case _ => None
      }
      second.foreach { case (pk, sql) =>
        val n2 = s"dfm_${seed}_1"
        e.execute(s"CREATE MATERIALIZED VIEW $n2 (PRIMARY KEY $pk) AS $sql")
        defs += ((n2, Seq(n1), sql))
      }
    }

    private def createTwoTableStack(): Unit = {
      e.execute(s"CREATE TABLE $t2 (oid BIGINT PRIMARY KEY, k2 BIGINT, w BIGINT)")
      val n1 = s"dfm_${seed}_0"
      val (pk, sql, outCols) = r.nextInt(6) match {
        case 0 | 1 => // delta join, random type — g/k2 share a tiny domain
          val jt = Seq("", "LEFT ", "FULL ")(r.nextInt(3))
          (s"(id, oid)",
            s"SELECT $t.id, $t2.oid, coalesce($t.g, $t2.k2) AS jk, " +
              s"coalesce($t.v, 0) + coalesce($t2.w, 0) AS s " +
              s"FROM $t ${jt}JOIN $t2 ON $t.g = $t2.k2",
            Set("id", "oid", "jk", "s"))
        case 2 => // grouped aggregate over UNION ALL (IncrementalUnionAgg)
          ("(k)",
            s"SELECT k, count(*) AS n, sum(x) AS sx FROM " +
              s"(SELECT g AS k, v AS x FROM $t UNION ALL " +
              s"SELECT k2 AS k, w AS x FROM $t2) z GROUP BY k",
            Set("k", "n", "sx"))
        case 3 => // UNION DISTINCT
          ("(g)", s"SELECT g FROM $t UNION SELECT k2 AS g FROM $t2",
            Set("g"))
        case 4 => // INTERSECT (distinct) — set-op chain
          ("(g)", s"SELECT g FROM $t INTERSECT SELECT k2 AS g FROM $t2",
            Set("g"))
        case 5 => // EXCEPT (distinct) — right-side DML retracts left rows
          ("(g)", s"SELECT g FROM $t EXCEPT SELECT k2 AS g FROM $t2",
            Set("g"))
      }
      e.execute(s"CREATE MATERIALIZED VIEW $n1 (PRIMARY KEY $pk) AS $sql")
      defs += ((n1, Seq(t, t2), sql))
      // one aggregate stacked on top where the columns allow
      if (outCols == Set("id", "oid", "jk", "s")) {
        val n2 = s"dfm_${seed}_1"
        val sql2 = s"SELECT jk, count(*) AS n, sum(coalesce(s, 0)) AS sv " +
          s"FROM $n1 GROUP BY jk"
        e.execute(s"CREATE MATERIALIZED VIEW $n2 (PRIMARY KEY (jk)) AS $sql2")
        defs += ((n2, Seq(n1), sql2))
      }
    }

    def create(): Unit = {
      val genDdl = if (genCol) ", gen BIGINT AS v * 2 + g" else ""
      val ocDdl = if (ocIgnore) " ON CONFLICT IGNORE" else ""
      e.execute(s"CREATE TABLE $t (id BIGINT PRIMARY KEY, g BIGINT, " +
        s"v BIGINT, text STRING$genDdl)$ocDdl")
      if (twoTable) createTwoTableStack() else createOneTableStack()
      defs.foreach { case (n, _, _) =>
        assert(e.streamingJob(n).nonEmpty,
          s"seed $seed: $n did not chain continuously over the DML table(s)")
      }
    }

    /** One random DML statement against table 2, mirrored into model2. */
    private def burst2(): Unit = { burst2Inner(); snapT2() }
    private def burst2Inner(): Unit = r.nextInt(5) match {
      case 0 | 1 =>
        val rows = Seq.fill(1 + r.nextInt(2)) {
          (freshId(), Row2(r.nextInt(3).toLong, r.nextInt(20).toLong))
        }
        rows.foreach { case (oid, row) => model2(oid) = row }
        e.execute(s"INSERT INTO $t2 VALUES " +
          rows.map { case (oid, Row2(k2, w)) => s"($oid, $k2, $w)" }.mkString(", "))
      case 2 =>
        val c = r.nextInt(3)
        e.execute(s"UPDATE $t2 SET w = w + 3 WHERE k2 = $c")
        model2.mapValuesInPlace { case (_, row) =>
          if (row.k2 == c) row.copy(w = row.w + 3) else row
        }
      case 3 => // group-moving update: rows change join/union key
        e.execute(s"UPDATE $t2 SET k2 = (k2 + 1) % 3 WHERE w % 4 = 1")
        model2.mapValuesInPlace { case (_, row) =>
          if (row.w % 4 == 1) row.copy(k2 = (row.k2 + 1) % 3) else row
        }
      case 4 =>
        val m = 2 + r.nextInt(3)
        val c = r.nextInt(m)
        e.execute(s"DELETE FROM $t2 WHERE w % $m = $c")
        model2.filterInPlace { case (_, row) => row.w % m != c }
    }

    /** Issue one random burst of 1-3 DML statements, mirroring each into
      * the model with independently re-implemented semantics.
      */
    def burst(): Unit = {
      for (_ <- 0 until 1 + r.nextInt(3)) { burstOne(); snapT() }
      if (twoTable) for (_ <- 0 until 1 + r.nextInt(2)) burst2()
    }

    private def burstOne(): Unit = r.nextInt(7) match {
        case 0 | 1 => // multi-row INSERT (sometimes duplicate-PK under IGNORE)
          val used = scala.collection.mutable.Set[Long]()
          val rows = Seq.fill(1 + r.nextInt(3)) {
            val id =
              if (ocIgnore && model.nonEmpty && r.nextBoolean()) {
                val cand = model.keys.toSeq.sorted.apply(r.nextInt(model.size))
                if (used.contains(cand)) freshId() else cand
              } else freshId()
            used += id
            (id, randRow())
          }
          rows.foreach { case (id, row) =>
            if (!ocIgnore || !model.contains(id)) model(id) = row
          }
          e.execute(s"INSERT INTO $t VALUES " + rows.map { case (id, Row3(g, v, tx)) =>
            s"($id, $g, $v, '$tx')" }.mkString(", "))
        case 2 => // value update keyed on a group predicate
          val c = r.nextInt(3)
          e.execute(s"UPDATE $t SET v = v + 7 WHERE g = $c")
          model.mapValuesInPlace { case (_, row) =>
            if (row.g == c) row.copy(v = row.v + 7) else row
          }
        case 3 => // group-moving update keyed on a value predicate
          e.execute(s"UPDATE $t SET g = (g + 1) % 3 WHERE v % 5 = 0")
          model.mapValuesInPlace { case (_, row) =>
            if (row.v % 5 == 0) row.copy(g = (row.g + 1) % 3) else row
          }
        case 4 if model.nonEmpty => // PK-CHANGING update of one row
          val id = model.keys.toSeq.sorted.apply(r.nextInt(model.size))
          e.execute(s"UPDATE $t SET id = id + 1000 WHERE id = $id")
          model.remove(id).foreach(row => model(id + 1000) = row)
        case 5 => // text rewrite (changes downstream explode cardinality)
          val tx = Seq.fill(1 + r.nextInt(2))(Words(r.nextInt(Words.length))).mkString(" ")
          e.execute(s"UPDATE $t SET text = '$tx' WHERE id % 4 = 1")
          model.mapValuesInPlace { case (id, row) =>
            if (id % 4 == 1) row.copy(text = tx) else row
          }
        case 6 => // predicate delete
          val m = 2 + r.nextInt(3)
          val c = r.nextInt(m)
          e.execute(s"DELETE FROM $t WHERE v % $m = $c")
          model.filterInPlace { case (_, row) => row.v % m != c }
        case _ => // model empty for case 4: fall back to a single insert
          val id = freshId(); val row = randRow()
          model(id) = row
          e.execute(s"INSERT INTO $t VALUES ($id, ${row.g}, ${row.v}, '${row.text}')")
    }

    private def sortedRows(df: DataFrame): Seq[String] = {
      val cols = df.columns.sorted.toSeq
      df.select(cols.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toString).toSeq.sorted
    }

    def check(tag: String): Unit = {
      // oracle 1: table contents vs the independent statement model
      // (generated-column scenarios also verify gen = v * 2 + g per row)
      if (genCol) {
        val got = e.table(t).as[(Long, Long, Long, String, Long)]
          .collect().toSeq.sorted
        val want = model.toSeq.map { case (id, Row3(g, v, tx)) =>
          (id, g, v, tx, v * 2 + g) }.sorted
        assert(got == want, s"seed $seed $tag: table diverged from DML model\n" +
          s"got:  $got\nwant: $want")
      } else {
        val got = e.table(t).as[(Long, Long, Long, String)].collect().toSeq.sorted
        val want = model.toSeq.map { case (id, Row3(g, v, tx)) => (id, g, v, tx) }.sorted
        assert(got == want, s"seed $seed $tag: table diverged from DML model\n" +
          s"got:  $got\nwant: $want")
      }
      if (twoTable) {
        val got2 = e.table(t2).as[(Long, Long, Long)].collect().toSeq.sorted
        val want2 = model2.toSeq.map { case (oid, Row2(k2, w)) => (oid, k2, w) }.sorted
        assert(got2 == want2, s"seed $seed $tag: table 2 diverged from DML model")
      }
      // oracle 3: time travel — a sample of recorded epochs must
      // reproduce the model image that was live when each was published
      // (attacks imageAt + changelog completeness under every DML shape,
      // incl. PK-changing updates and ON CONFLICT no-ops)
      r.shuffle(snaps.keys.toSeq).take(2).foreach { ep =>
        val got = e.execute(
          s"SELECT id, g, v, text FROM $t FOR SYSTEM_TIME AS OF $ep")
          .as[(Long, Long, Long, String)].collect().toSeq.sorted
        val want = snaps(ep).map { case (id, Row3(g, v, tx)) => (id, g, v, tx) }
        assert(got == want,
          s"seed $seed $tag: AS OF $ep diverged from the recorded image\n" +
            s"got:  $got\nwant: $want")
      }
      if (twoTable) r.shuffle(snaps2.keys.toSeq).take(1).foreach { ep =>
        val got = e.execute(
          s"SELECT oid, k2, w FROM $t2 FOR SYSTEM_TIME AS OF $ep")
          .as[(Long, Long, Long)].collect().toSeq.sorted
        val want = snaps2(ep).map { case (oid, Row2(k2, w)) => (oid, k2, w) }
        assert(got == want,
          s"seed $seed $tag: $t2 AS OF $ep diverged from the recorded image")
      }
      // oracle 2: each chained MV vs batch recompute over its upstreams
      defs.foreach { case (name, ups, sql) =>
        var oracleSql = sql
        ups.zipWithIndex.foreach { case (up, i) =>
          val view = s"__dfz_${seed}_$i"
          e.table(up).createOrReplaceTempView(view)
          oracleSql = oracleSql.replaceAll(
            "(?i)\\b" + java.util.regex.Pattern.quote(up) + "\\b", view)
        }
        val expect = spark.sql(oracleSql)
        assert(sortedRows(e.table(name)) == sortedRows(expect),
          s"seed $seed $tag: $name diverged from batch recompute")
      }
    }

    def stop(): Unit = defs.foreach { case (n, _, _) =>
      e.streamingJob(n).foreach(_.stop())
    }
  }

  // 100 seeded scenarios (~1/3 two-table), 5 per engine with interleaved
  // bursts and a shared FLUSH — override count with SPARK_GRAFT_DMLFUZZ_N
  private val totalSeeds = sys.env.getOrElse("SPARK_GRAFT_DMLFUZZ_N", "100").toInt
  private val PerGroup = 5

  for (group <- 0 until (totalSeeds + PerGroup - 1) / PerGroup) {
    val seeds = (0 until PerGroup).map(i => 1000 + group * PerGroup + i)
      .take(totalSeeds - group * PerGroup)
    test(s"DML chain fuzz seeds ${seeds.head}..${seeds.last}") {
      val e = new Engine(spark, tmpDir(s"dmlfuzz$group"))
      val scens = seeds.map(new Scenario(_, e))
      scens.foreach(_.create())
      for (round <- 0 until 2) {
        scens.foreach(_.burst())
        e.execute("FLUSH")
        scens.foreach(_.check(s"round $round"))
      }
      scens.foreach(_.stop())
    }
  }
}
