package graft

import org.apache.spark.sql.DataFrame
import scala.util.Random

/** Differential fuzzing of the streaming MV-on-MV machinery — the
  * streaming analog of DifferentialFuzzSpec (reference:
  * src/tests/sqlsmith fuzzes batch AND stream plans).
  *
  * Each scenario builds a random chain stack over a Debezium file
  * source, drives random insert / update (delete+reinsert) / delete
  * batches through it, and after every FLUSH checks EVERY chained MV
  * against a batch recompute of its own defining query over its
  * upstream's ACTUAL storage. Per-level checks compose into whole-chain
  * correctness: if level k drifts, level k's own check fails first.
  *
  * This is the harness that would have caught the `_seq`-tie bug (a
  * delete+reinsert of one PK in one batch resolving nondeterministically)
  * and the cross-session temp-view leak in generate-mode touched-group
  * derivation — both found by hand in round 4.
  */
class StreamingChainFuzzSpec extends SparkSpecBase {
  import spark.implicits._

  private val Words = Vector("a", "b", "c", "d", "e", "f", "g", "h")

  private def randText(r: Random): String =
    Seq.fill(1 + r.nextInt(4))(Words(r.nextInt(Words.length))).mkString(" ")

  private def ins(id: Long, g: Long, v: Long, text: String): String =
    s"""{"before": null, "after": {"id": $id, "g": $g, "v": $v, "text": "$text"}, "op": "c"}"""

  private def del(id: Long, g: Long, v: Long, text: String): String =
    s"""{"before": {"id": $id, "g": $g, "v": $v, "text": "$text"}, "after": null, "op": "d"}"""

  /** One chainable layer: DDL over the upstream name + the same SELECT
    * re-runnable as batch SQL for the oracle recompute.
    */
  private case class Layer(name: String, pk: String, select: String => String)

  private def layerPool(r: Random): Vector[Layer] = Vector(
    Layer("perrow", "(id)",
      up => s"SELECT id, g, v, text FROM $up WHERE v % 3 <> 0"),
    Layer("proj", "(id)",
      up => s"SELECT id, g, v * 2 AS v2 FROM $up"),
    Layer("agg", "(g)",
      up => s"SELECT g, count(*) AS n, sum(v) AS sv FROM $up GROUP BY g"),
    Layer("explode", "(id, pos)",
      up => s"SELECT id, g, pos, tok FROM $up " +
        "LATERAL VIEW posexplode(split(text, ' ')) t AS pos, tok"),
    Layer("aggexplode", "(tok)",
      up => s"SELECT tok, count(*) AS n FROM $up " +
        "LATERAL VIEW explode(split(text, ' ')) t AS tok GROUP BY tok"),
    Layer("aggtok", "(tok)", // direct agg stacked ON an exploded MV
      up => s"SELECT tok, count(*) AS n FROM $up GROUP BY tok"),
    // HAVING variants: groups constantly cross the count threshold in
    // both directions as rows churn — the touched-key replay must see
    // groups whose delta-local aggregate FAILS the predicate
    Layer("hagg", "(g)", // direct mode; HAVING references an aggregate
      // NOT in the output list (plans Project(Filter(Aggregate)))
      up => s"SELECT g, count(*) AS n, sum(v) AS sv FROM $up " +
        "GROUP BY g HAVING max(v) >= 10"),
    Layer("haggexpl", "(tok)", // generate mode (group key born in explode)
      up => s"SELECT tok, count(*) AS n FROM $up " +
        "LATERAL VIEW explode(split(text, ' ')) t AS tok " +
        "GROUP BY tok HAVING count(*) >= 2"))

  /** Layers stackable on a given upstream's column set. */
  private def eligible(pool: Vector[Layer], upCols: Set[String]): Vector[Layer] =
    pool.filter {
      case l if l.name == "perrow" || l.name == "explode" ||
          l.name == "aggexplode" || l.name == "haggexpl" =>
        Set("id", "g", "v", "text").subsetOf(upCols)
      case l if l.name == "proj" || l.name == "agg" || l.name == "hagg" =>
        Set("id", "g", "v").subsetOf(upCols)
      case l if l.name == "aggtok" => upCols.contains("tok")
      case _ => false
    }

  private def colsOf(l: Layer): Set[String] = l.name match {
    case "perrow" => Set("id", "g", "v", "text")
    case "proj" => Set("id", "g", "v2")
    case "agg" => Set("g", "n", "sv")
    case "explode" => Set("id", "g", "pos", "tok")
    case "aggexplode" => Set("tok", "n")
    case "aggtok" => Set("tok", "n")
    case "hagg" => Set("g", "n", "sv")
    case "haggexpl" => Set("tok", "n")
  }

  private def sortedRows(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toString).toSeq.sorted
  }

  private def runScenario(seed: Int): Unit = {
    val r = new Random(seed)
    val wh = tmpDir(s"chainfuzz$seed")
    val srcDir = tmpDir(s"chainfuzz$seed-src")
    val e = new Engine(spark, wh)
    val live = scala.collection.mutable.Map[Long, (Long, Long, String)]()
    var nextId = 0L

    def writeBatch(lines: Seq[String]): Unit =
      lines.toDF("value").coalesce(1).write.mode("append").text(srcDir)

    // seed rows, then DDL
    val seedLines = (0 until 4 + r.nextInt(4)).map { _ =>
      val id = { nextId += 1; nextId }
      val row = (r.nextInt(3).toLong, r.nextInt(20).toLong, randText(r))
      live(id) = row
      ins(id, row._1, row._2, row._3)
    }
    writeBatch(seedLines)
    e.execute(s"""CREATE SOURCE fz_src_$seed (id BIGINT, g BIGINT, v BIGINT, text STRING)
                 |WITH (path = '$srcDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute(s"CREATE MATERIALIZED VIEW fz_d_$seed (PRIMARY KEY (id)) AS " +
      s"SELECT id, g, v, text FROM fz_src_$seed")
    e.execute("FLUSH")

    // random stack of 2-3 layers
    var upName = s"fz_d_$seed"
    var upCols = Set("id", "g", "v", "text")
    val defs = scala.collection.mutable.ArrayBuffer[(String, String, String)]()
    val depth = 2 + r.nextInt(2)
    for (i <- 0 until depth) {
      val pool = eligible(layerPool(r), upCols)
      if (pool.nonEmpty) {
        val l = pool(r.nextInt(pool.size))
        val name = s"fz_${l.name}_${seed}_$i"
        val sql = l.select(upName)
        e.execute(s"CREATE MATERIALIZED VIEW $name (PRIMARY KEY ${l.pk}) AS $sql")
        defs += ((name, upName, sql))
        upName = name
        upCols = colsOf(l)
      }
    }
    e.execute("FLUSH")
    assert(defs.nonEmpty, s"seed $seed built no layers")
    info(s"seed $seed stack: ${defs.map(_._1).mkString(" -> ")}")
    defs.foreach { case (n, _, _) =>
      assert(e.streamingJob(n).nonEmpty,
        s"seed $seed: $n did not chain continuously (fell back to batch refresh)")
    }

    def checkAll(tag: String): Unit = defs.foreach { case (name, up, sql) =>
      // oracle: the defining query replayed as BATCH SQL over the
      // upstream MV's actual storage
      val upDf = e.table(up)
      upDf.createOrReplaceTempView(s"__fz_oracle_$seed")
      val expect = spark.sql(sql.replaceAll(
        "(?i)\\b" + java.util.regex.Pattern.quote(up) + "\\b",
        s"__fz_oracle_$seed"))
      val got = e.table(name)
      assert(sortedRows(got) == sortedRows(expect),
        s"seed $seed $tag: $name diverged from batch recompute of its query")
    }
    checkAll("backfill")

    // random op batches
    for (b <- 0 until 3) {
      val lines = scala.collection.mutable.ArrayBuffer[String]()
      for (_ <- 0 until 2 + r.nextInt(4)) r.nextInt(3) match {
        case 0 => // insert
          val id = { nextId += 1; nextId }
          val row = (r.nextInt(3).toLong, r.nextInt(20).toLong, randText(r))
          live(id) = row
          lines += ins(id, row._1, row._2, row._3)
        case 1 if live.nonEmpty => // update = delete + reinsert, SAME batch
          val id = live.keys.toSeq(r.nextInt(live.size))
          val old = live(id)
          val nu = (r.nextInt(3).toLong, r.nextInt(20).toLong, randText(r))
          live(id) = nu
          lines += del(id, old._1, old._2, old._3)
          lines += ins(id, nu._1, nu._2, nu._3)
        case 2 if live.nonEmpty => // delete
          val id = live.keys.toSeq(r.nextInt(live.size))
          val old = live.remove(id).get
          lines += del(id, old._1, old._2, old._3)
        case _ =>
          val id = { nextId += 1; nextId }
          val row = (r.nextInt(3).toLong, r.nextInt(20).toLong, randText(r))
          live(id) = row
          lines += ins(id, row._1, row._2, row._3)
      }
      writeBatch(lines.toSeq)
      e.execute("FLUSH")
      // the base MV itself must mirror the live map exactly
      val base = e.table(s"fz_d_$seed").orderBy("id")
        .as[(Long, Long, Long, String)].collect().toSeq
      val want = live.toSeq.map { case (id, (g, v, t)) => (id, g, v, t) }
        .sortBy(_._1)
      assert(base == want, s"seed $seed batch $b: base MV diverged from op log")
      checkAll(s"batch $b")
    }
    (Seq(s"fz_d_$seed") ++ defs.map(_._1))
      .foreach(n => e.streamingJob(n).foreach(_.stop()))
  }

  // 6 seeded scenarios: deterministic, covers per-row / projection /
  // agg / explode / agg-over-explode stacked 2-3 deep in random orders
  // with update-in-one-batch and delete ops throughout
  for (seed <- Seq(11, 23, 37, 41, 59, 73, 79, 83, 89)) {
    test(s"random streaming chain matches batch recompute (seed $seed)") {
      runScenario(seed)
    }
  }

  // ------------------------------------------------------------------
  // Two-input topologies: delta joins (all four types) and UNION ALL,
  // with random layers stacked on the two-input MV — the maintenance
  // code with the most intricate retraction logic (downstream-storage
  // retraction for concurrent both-side deletes, null-extension
  // repair, per-branch linear replay).
  // ------------------------------------------------------------------

  /** A two-input definition: name, BOTH upstreams, its defining SQL. */
  private def checkDefs(e: Engine, seed: Int,
      defs: Seq[(String, Seq[String], String)], tag: String): Unit =
    defs.foreach { case (name, ups, sql) =>
      var oracleSql = sql
      ups.zipWithIndex.foreach { case (up, i) =>
        val v = s"__fzo_${seed}_$i"
        e.table(up).createOrReplaceTempView(v)
        oracleSql = oracleSql.replaceAll(
          "(?i)\\b" + java.util.regex.Pattern.quote(up) + "\\b", v)
      }
      val expect = spark.sql(oracleSql)
      val got = e.table(name)
      assert(sortedRows(got) == sortedRows(expect),
        s"seed $seed $tag: $name diverged from batch recompute of its query")
    }

  private def runTwoInputScenario(seed: Int, topo: String): Unit = {
    val r = new Random(seed)
    val wh = tmpDir(s"fz2$seed")
    val (aDir, bDir) = (tmpDir(s"fz2$seed-a"), tmpDir(s"fz2$seed-b"))
    val e = new Engine(spark, wh)
    // side a: (id, k, v); side b: (oid, bk, w). k/bk in a tiny domain so
    // joins hit and un-hit constantly as rows come and go.
    def insA(id: Long, k: Long, v: Long) =
      s"""{"before": null, "after": {"id": $id, "k": $k, "v": $v}, "op": "c"}"""
    def delA(id: Long, k: Long, v: Long) =
      s"""{"before": {"id": $id, "k": $k, "v": $v}, "after": null, "op": "d"}"""
    def insB(oid: Long, k: Long, w: Long) =
      s"""{"before": null, "after": {"oid": $oid, "k": $k, "w": $w}, "op": "c"}"""
    def delB(oid: Long, k: Long, w: Long) =
      s"""{"before": {"oid": $oid, "k": $k, "w": $w}, "after": null, "op": "d"}"""
    val liveA = scala.collection.mutable.Map[Long, (Long, Long)]()
    val liveB = scala.collection.mutable.Map[Long, (Long, Long)]()
    var nextId = 0L

    def seedSide(live: scala.collection.mutable.Map[Long, (Long, Long)],
        mk: (Long, Long, Long) => String): Seq[String] =
      (0 until 3 + r.nextInt(3)).map { _ =>
        val id = { nextId += 1; nextId }
        val row = (r.nextInt(3).toLong, r.nextInt(10).toLong)
        live(id) = row
        mk(id, row._1, row._2)
      }
    seedSide(liveA, insA).toDF("value").coalesce(1).write.mode("append").text(aDir)
    seedSide(liveB, insB).toDF("value").coalesce(1).write.mode("append").text(bDir)
    e.execute(s"""CREATE SOURCE fz2_asrc_$seed (id BIGINT, k BIGINT, v BIGINT)
                 |WITH (path = '$aDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute(s"""CREATE SOURCE fz2_bsrc_$seed (oid BIGINT, k BIGINT, w BIGINT)
                 |WITH (path = '$bDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    val (an, bn) = (s"fz2_a_$seed", s"fz2_b_$seed")
    e.execute(s"CREATE MATERIALIZED VIEW $an (PRIMARY KEY (id)) AS " +
      s"SELECT id, k, v FROM fz2_asrc_$seed")
    e.execute(s"CREATE MATERIALIZED VIEW $bn (PRIMARY KEY (oid)) AS " +
      s"SELECT oid, k AS bk, w FROM fz2_bsrc_$seed")
    e.execute("FLUSH")

    val defs = scala.collection.mutable.ArrayBuffer[(String, Seq[String], String)]()
    var (upName, upCols) = topo match {
      case "union" =>
        val n = s"fz2_u_$seed"
        val sql = s"SELECT 'a' AS src, id, k, v AS x FROM $an WHERE v % 7 <> 0 " +
          s"UNION ALL SELECT 'b' AS src, oid AS id, bk AS k, w * 2 AS x FROM $bn"
        e.execute(s"CREATE MATERIALIZED VIEW $n (PRIMARY KEY (src, id)) AS $sql")
        defs += ((n, Seq(an, bn), sql))
        (n, Set("src", "id", "k", "x"))
      case "uniondistinct" => // UNION DISTINCT ≡ group-by-all (IncrementalUnionAgg)
        val n = s"fz2_udist_$seed"
        val sql = s"SELECT k, v FROM $an UNION SELECT bk AS k, w AS v FROM $bn"
        e.execute(s"CREATE MATERIALIZED VIEW $n (PRIMARY KEY (k, v)) AS $sql")
        defs += ((n, Seq(an, bn), sql))
        (n, Set("k", "v"))
      case "unionagg" => // grouped aggregate over UNION ALL in one MV
        val n = s"fz2_uagg2_$seed"
        val sql = s"SELECT k, count(*) AS n, sum(x) AS sx FROM " +
          s"(SELECT k, v AS x FROM $an UNION ALL " +
          s"SELECT bk AS k, w * 2 AS x FROM $bn) z GROUP BY k"
        e.execute(s"CREATE MATERIALIZED VIEW $n (PRIMARY KEY (k)) AS $sql")
        defs += ((n, Seq(an, bn), sql))
        (n, Set("k", "n", "sx"))
      case jt0 => // INNER | LEFT | RIGHT | FULL delta join, optionally _BAND
        val banded = jt0.endsWith("_BAND")
        val jt = jt0.stripSuffix("_BAND")
        val n = s"fz2_j_$seed"
        // _BAND: theta conjunct rides on the equi prefix — w∈0..9 and
        // v∈0..9 with a ±4 band means membership flips constantly as
        // rows churn, exercising the post-filtered delta probe and the
        // outer-join band repair
        val cond = s"$an.k = $bn.bk" +
          (if (banded) s" AND $bn.w BETWEEN $an.v AND $an.v + 4" else "")
        // jk = coalesce over both key columns: never NULL (some side is
        // always present), so aggregates can group on it
        val sql = s"SELECT $an.id, $bn.oid, coalesce($an.k, $bn.bk) AS jk, " +
          s"$an.v + $bn.w AS s FROM $an $jt JOIN $bn ON $cond"
        e.execute(s"CREATE MATERIALIZED VIEW $n (PRIMARY KEY (id, oid)) AS $sql")
        defs += ((n, Seq(an, bn), sql))
        (n, Set("id", "oid", "jk", "s"))
    }
    // 1-2 random single-input layers on top of the two-input MV
    for (i <- 0 until 1 + r.nextInt(2)) {
      val options: Seq[(String, String, String)] =
        if (upCols == Set("id", "oid", "jk", "s")) Seq(
          ("jagg", "(jk)",
            s"SELECT jk, count(*) AS n, sum(coalesce(s, 0)) AS sv FROM $upName GROUP BY jk"),
          ("jrow", "(id, oid)",
            s"SELECT id, oid, jk, s FROM $upName WHERE coalesce(s, 0) % 2 = 0"))
        else if (upCols == Set("src", "id", "k", "x")) Seq(
          ("uagg", "(k)",
            s"SELECT k, count(*) AS n, sum(x) AS sx FROM $upName GROUP BY k"),
          ("urow", "(src, id)",
            s"SELECT src, id, k, x FROM $upName WHERE x % 3 <> 0"))
        else if (upCols == Set("k", "v")) Seq(
          ("kvagg", "(k)",
            s"SELECT k, count(*) AS nk, sum(v) AS sv FROM $upName GROUP BY k"))
        else if (upCols.contains("n")) Seq(
          ("nagg", "(n)", s"SELECT n, count(*) AS c FROM $upName GROUP BY n"))
        else Seq.empty
      if (options.nonEmpty) {
        val (kind, pk, sql) = options(r.nextInt(options.size))
        val name = s"fz2_${kind}_${seed}_$i"
        e.execute(s"CREATE MATERIALIZED VIEW $name (PRIMARY KEY $pk) AS $sql")
        defs += ((name, Seq(upName), sql))
        upName = name
        upCols = kind match {
          case "jagg" => Set("jk", "n", "sv")
          case "jrow" => Set("id", "oid", "jk", "s")
          case "uagg" => Set("k", "n", "sx")
          case "urow" => Set("src", "id", "k", "x")
          case "kvagg" => Set("k", "nk", "sv")
          case "nagg" => Set("n", "c")
        }
      }
    }
    e.execute("FLUSH")
    defs.foreach { case (n, _, _) =>
      assert(e.streamingJob(n).nonEmpty,
        s"seed $seed ($topo): $n did not chain continuously")
    }
    checkDefs(e, seed, defs.toSeq, "backfill")

    // random op batches on BOTH sides per round (same-batch update =
    // delete+reinsert; concurrent both-side deletes happen naturally)
    for (b <- 0 until 3) {
      def sideOps(live: scala.collection.mutable.Map[Long, (Long, Long)],
          mkI: (Long, Long, Long) => String,
          mkD: (Long, Long, Long) => String): Seq[String] = {
        val lines = scala.collection.mutable.ArrayBuffer[String]()
        for (_ <- 0 until 1 + r.nextInt(3)) r.nextInt(3) match {
          case 1 if live.nonEmpty =>
            val id = live.keys.toSeq(r.nextInt(live.size))
            val old = live(id)
            val nu = (r.nextInt(3).toLong, r.nextInt(10).toLong)
            live(id) = nu
            lines += mkD(id, old._1, old._2)
            lines += mkI(id, nu._1, nu._2)
          case 2 if live.nonEmpty =>
            val id = live.keys.toSeq(r.nextInt(live.size))
            val old = live.remove(id).get
            lines += mkD(id, old._1, old._2)
          case _ =>
            val id = { nextId += 1; nextId }
            val row = (r.nextInt(3).toLong, r.nextInt(10).toLong)
            live(id) = row
            lines += mkI(id, row._1, row._2)
        }
        lines.toSeq
      }
      val (la, lb) = (sideOps(liveA, insA, delA), sideOps(liveB, insB, delB))
      if (la.nonEmpty) la.toDF("value").coalesce(1).write.mode("append").text(aDir)
      if (lb.nonEmpty) lb.toDF("value").coalesce(1).write.mode("append").text(bDir)
      e.execute("FLUSH")
      checkDefs(e, seed, defs.toSeq, s"batch $b ($topo)")
    }
    (Seq(an, bn) ++ defs.map(_._1))
      .foreach(n => e.streamingJob(n).foreach(_.stop()))
  }

  for ((topo, seed) <- Seq("INNER" -> 101, "LEFT" -> 103, "RIGHT" -> 107,
      "FULL" -> 109, "union" -> 113, "union" -> 127,
      "INNER_BAND" -> 131, "LEFT_BAND" -> 137, "FULL_BAND" -> 139,
      "uniondistinct" -> 149, "unionagg" -> 151)) {
    test(s"random $topo two-input chain matches batch recompute (seed $seed)") {
      runTwoInputScenario(seed, topo)
    }
  }
}
