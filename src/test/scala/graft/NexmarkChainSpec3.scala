package graft

import scala.collection.mutable.ArrayBuffer
import scala.util.Random

import org.apache.spark.sql.functions.col

/** Nexmark breadth, part 3 — the VARIANT AXES of the reference CI folder
  * (ci/scripts/sql/nexmark/): the `-temporal-filter` axis (every query
  * re-run over `bid_filtered` = bids inside a now()-anchored horizon),
  * the `-no-distinct` / `-simple` / `-two-phase` aggregate axes of
  * q15/q16, q3-no-condition, and q105-without-limit. Same harness as
  * NexmarkChainSpec/Spec2 — chained streaming MVs over DML tables
  * diffed against batch recomputes — in its own engine (each engine
  * carries ~10-20 continuous streams; see Spec2's thrash note).
  */
class NexmarkChainSpec3 extends SparkSpecBase {

  private val defs = ArrayBuffer[(String, String, String, Boolean)]()
  private val A = "nx3a"
  private val B = "nx3b"
  private val P = "nx3p"
  private val F = "nx3f" // now()-relative bids for the temporal-filter axis

  private def mv(name: String, pk: String, sql: String,
      chained: Boolean = true): Unit = defs += ((name, pk, sql, chained))

  // ------------------------------------------------------------ shapes
  // q3-no-condition: the plain seller join with NO category/state
  // filter — the reference benches the unfiltered delta join as its own
  // shape (filter selectivity changes the arrangement sizes, not the
  // plan class).
  mv("m3_q3nc", "(id, pid)",
    s"""SELECT $P.name, $P.city, $P.state, $A.id, $P.pid
       |FROM $A JOIN $P ON $A.seller = $P.pid""".stripMargin)

  // day/minute projection hop feeding the q15/q16 variant aggregates
  // (group keys must be plain attributes for the touched-group chain —
  // same two-hop rendering as Spec1's q15/q16).
  mv("m3_q15w", "(bid_id)",
    s"""SELECT bid_id, bidder, auction, price, channel,
       |  date_format(dt, 'yyyy-MM-dd') AS day,
       |  date_format(dt, 'HH:mm') AS minute FROM $B""".stripMargin)

  // q15-simple: the single-count degenerate of q15 (reference
  // q15-simple.sql) — the cheapest grouped chain.
  mv("m3_q15s", "(day)",
    "SELECT day, count(*) AS total_bids FROM m3_q15w GROUP BY day")

  // q15-no-distinct: every count(DISTINCT x) of q15 degraded to
  // count(x) — the axis the reference uses to isolate distinct-agg cost.
  mv("m3_q15nd", "(day)",
    """SELECT day,
      |  count(*) AS total_bids,
      |  count(*) FILTER (WHERE price < 100) AS rank1_bids,
      |  count(*) FILTER (WHERE price >= 100) AS rank2_bids,
      |  count(bidder) AS total_bidders,
      |  count(bidder) FILTER (WHERE price < 100) AS rank1_bidders,
      |  count(auction) AS total_auctions,
      |  count(auction) FILTER (WHERE price >= 100) AS rank2_auctions
      |FROM m3_q15w GROUP BY day""".stripMargin)

  // q16-no-distinct: the per-(channel, day) spread with a max over the
  // projected minute, distinct-free.
  mv("m3_q16nd", "(channel, day)",
    """SELECT channel, day, max(minute) AS max_minute,
      |  count(*) AS total_bids,
      |  count(*) FILTER (WHERE price < 100) AS rank1_bids,
      |  count(bidder) AS total_bidders,
      |  count(auction) AS total_auctions
      |FROM m3_q15w GROUP BY channel, day""".stripMargin)

  // q105-without-limit: the grouped join count WITHOUT the top-1000 cut
  // (reference q105-without-limit.sql), fused join + aggregate in ONE
  // statement. Two streaming relations under one aggregate is outside
  // the incremental chain envelope → the loud batch-refresh fence
  // (Spec1's two-hop m_q102_join + count rendering is the chained form).
  mv("m3_q105nl", "(id)",
    s"""SELECT $A.id, $A.item_name, count($B.auction) AS bid_count
       |FROM $A JOIN $B ON $A.id = $B.auction
       |GROUP BY $A.id, $A.item_name""".stripMargin,
    chained = false)

  // q102's literal HAVING spelling — the aggregate filtered against a
  // scalar subquery over the SAME stream: outside the incremental
  // envelope, must take the loud fence (Spec1's m_q102 covers the
  // WHERE-over-join-MV rendering; this is the CI file's exact shape).
  mv("m3_q102h", "(id)",
    s"""SELECT $A.id, $A.item_name, count($B.auction) AS bid_count
       |FROM $A JOIN $B ON $A.id = $B.auction
       |GROUP BY $A.id, $A.item_name
       |HAVING count($B.auction) >= (
       |  SELECT count(*) / count(DISTINCT auction) FROM $B)""".stripMargin,
    chained = false)

  // ---- the temporal-filter axis: bid_filtered = now()-horizon bids.
  // q0-temporal-filter: the passthrough over the filtered stream — a
  // temporal-filter MV whose rows AGE OUT as now() advances (reads
  // horizon-exact; FLUSH evicts as real delete epochs).
  mv("m3_q0tf", "(bid_id)",
    s"""SELECT bid_id, auction, bidder, price, dt FROM $F
       |WHERE dt > now() - INTERVAL '1' HOUR""".stripMargin)

  // q1-temporal-filter: the currency mapper CHAINED ON the filtered
  // stream — eviction deltas must retract through a per-row child.
  mv("m3_q1tf", "(bid_id)",
    """SELECT bid_id, auction, bidder,
      |  CAST(0.908 * price AS DECIMAL(23, 3)) AS price_dol, dt
      |FROM m3_q0tf""".stripMargin)

  // q4-temporal-filter (shape): grouped aggregate over the filtered
  // stream — eviction retracts counts/maxes, not just rows.
  mv("m3_q4tf", "(auction)",
    """SELECT auction, count(*) AS n, max(price) AS max_price
      |FROM m3_q0tf GROUP BY auction""".stripMargin)

  // q18-temporal-filter (shape): group top-1 over the filtered stream —
  // eviction must PROMOTE the runner-up when the leader ages out.
  mv("m3_q18tf", "(bidder, auction)",
    """SELECT bidder, auction, price, dt FROM (
      |  SELECT bidder, auction, price, dt,
      |         row_number() OVER (PARTITION BY bidder, auction
      |                            ORDER BY dt DESC, bid_id DESC) AS rn
      |  FROM m3_q0tf) WHERE rn <= 1""".stripMargin)

  // ----------------------------------------------------- data + epochs
  private var nextBid = 0

  private def bidRow(r: Random): String = {
    nextBid += 1
    val auction = 1 + r.nextInt(10)
    val bidder = 1 + r.nextInt(6)
    val price = 20 + r.nextInt(180)
    val channel = s"ch${1 + r.nextInt(4)}"
    val dt = f"2024-03-${1 + r.nextInt(3)}%02d ${r.nextInt(24)}%02d:${15 * r.nextInt(4)}%02d:00"
    s"($nextBid, $auction, $bidder, $price, '$channel', TIMESTAMP '$dt')"
  }

  private def insertBids(e: Engine, r: Random, n: Int): Unit =
    e.execute(s"INSERT INTO $B VALUES " + Seq.fill(n)(bidRow(r)).mkString(", "))

  private var nextFid = 0

  /** now()-relative bids: `agesMin` minutes ago each (inside/outside
    * the 1 h horizon) — built through a temp view because the engine's
    * INSERT VALUES path wants literals, not now() arithmetic.
    */
  private def insertFiltered(e: Engine, agesMin: Seq[Int]): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val rows = agesMin.map { age =>
      nextFid += 1
      (nextFid.toLong, (1L + nextFid % 5), (1L + nextFid % 4),
        (30L + (nextFid * 17) % 150), age)
    }
    rows.toDF("bid_id", "auction", "bidder", "price", "age_min")
      .withColumn("dt", expr("timestampadd(MINUTE, -age_min, now())"))
      .drop("age_min")
      .createOrReplaceTempView("nx3f_seed")
    e.execute(s"INSERT INTO $F SELECT bid_id, auction, bidder, price, dt " +
      "FROM nx3f_seed")
  }

  private lazy val engine: Engine = {
    val e = new Engine(spark, tmpDir("nexchain3"))
    val r = new Random(20260816)
    e.execute("SET streaming_parallelism = 4")
    e.execute(s"CREATE TABLE $A (id BIGINT PRIMARY KEY, item_name STRING, " +
      "seller BIGINT, category BIGINT)")
    // pid, not id: the delta-join chain needs DISJOINT upstream PK
    // column names in the output (both sides named `id` cannot chain)
    e.execute(s"CREATE TABLE $P (pid BIGINT PRIMARY KEY, name STRING, " +
      "city STRING, state STRING)")
    e.execute(s"CREATE TABLE $B (bid_id BIGINT PRIMARY KEY, auction BIGINT, " +
      "bidder BIGINT, price BIGINT, channel STRING, dt TIMESTAMP)")
    e.execute(s"CREATE TABLE $F (bid_id BIGINT PRIMARY KEY, auction BIGINT, " +
      "bidder BIGINT, price BIGINT, dt TIMESTAMP)")
    e.execute(s"INSERT INTO $A VALUES " + (1 to 10).map(id =>
      s"($id, 'item_$id', ${id % 4}, ${id % 3})").mkString(", "))
    e.execute(s"INSERT INTO $P VALUES " + (0 to 3).map(id =>
      s"($id, 'person_$id', 'city_${id % 2}', 'st_${id % 3}')").mkString(", "))
    // q15tp's feeder must exist before the GUC block below creates it
    e.execute(s"CREATE MATERIALIZED VIEW m3_q15w (PRIMARY KEY (bid_id)) AS " +
      s"SELECT bid_id, bidder, auction, price, channel, " +
      s"date_format(dt, 'yyyy-MM-dd') AS day, " +
      s"date_format(dt, 'HH:mm') AS minute FROM $B")
    insertBids(e, r, 30)
    insertFiltered(e, Seq(0, 10, 20, 40, 90, 150))
    e.execute("FLUSH")
    // the reference's q15-two-phase prelude: both planner GUCs are
    // accepted so its scripts run unchanged (round-7 surface)
    e.execute("SET rw_force_split_distinct_agg = true")
    e.execute("SET rw_force_two_phase_agg = true")
    e.execute(s"CREATE MATERIALIZED VIEW m3_q15tp (PRIMARY KEY (day)) AS " +
      q15tpSql)
    e.execute("SET rw_force_split_distinct_agg = false")
    e.execute("SET rw_force_two_phase_agg = false")
    defs.foreach { case (name, pk, sql, _) =>
      if (name != "m3_q15w") // pre-created above as the q15tp feeder
        e.execute(s"CREATE MATERIALIZED VIEW $name (PRIMARY KEY $pk) AS $sql")
    }
    defs.foreach { case (name, _, _, chained) =>
      assert(e.streamingJob(name).nonEmpty == chained,
        s"$name: expected ${if (chained) "a streaming chain" else "the batch-refresh fence"}")
    }
    insertBids(e, r, 25)
    insertFiltered(e, Seq(5, 30, 120)) // merge-time horizon filters the 120
    e.execute("FLUSH")
    verifyAll(e, "after growth epoch")
    e.execute(s"UPDATE $B SET price = price - 60 WHERE price >= 150")
    e.execute(s"DELETE FROM $B WHERE bid_id % 6 = 0")
    e.execute(s"UPDATE $P SET city = 'moved' WHERE pid = 1")
    e.execute(s"DELETE FROM $F WHERE bid_id % 5 = 3")
    e.execute("FLUSH")
    verifyAll(e, "after retraction epoch")
    insertBids(e, r, 15)
    e.execute(s"UPDATE $B SET channel = 'ch1' WHERE bid_id % 7 = 2")
    e.execute("FLUSH")
    e
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().map(_.toString).toSeq.sorted
  }

  private def verifyOne(e: Engine, name: String, sql: String,
      chained: Boolean, when: String): Unit = {
    if (!chained) e.execute(s"REFRESH MATERIALIZED VIEW $name")
    val got = sortedRows(e.table(name))
    val want = sortedRows(e.execute(sql))
    assert(got == want,
      s"$name diverged from batch recompute $when\ngot:  $got\nwant: $want")
  }

  private def verifyAll(e: Engine, when: String): Unit = {
    defs.foreach { case (name, _, sql, chained) =>
      verifyOne(e, name, sql, chained, when)
    }
    verifyOne(e, "m3_q15tp", q15tpSql, chained = true, when)
  }

  private val q15tpSql =
    """SELECT day,
      |  count(*) AS total_bids,
      |  count(DISTINCT bidder) AS total_bidders,
      |  count(DISTINCT bidder) FILTER (WHERE price < 100) AS rank1_bidders,
      |  count(DISTINCT auction) AS total_auctions,
      |  count(DISTINCT auction) FILTER (WHERE price >= 100) AS rank2_auctions
      |FROM m3_q15w GROUP BY day""".stripMargin

  private def verifyShape(names: String*): Unit = {
    val e = engine
    names.foreach { n =>
      val (name, _, sql, chained) = defs.find(_._1 == n).get
      verifyOne(e, name, sql, chained, "at final state")
      assert(sortedRows(e.execute(sql)).nonEmpty || name == "m3_q102h",
        s"$name: oracle empty — shape unexercised")
    }
  }

  test("q3-no-condition shape: unfiltered seller delta join")(
    verifyShape("m3_q3nc"))
  test("q15-simple shape: single-count grouped chain")(
    verifyShape("m3_q15s"))
  test("q15-no-distinct shape: FILTER counts, distinct-free")(
    verifyShape("m3_q15nd"))
  test("q15-two-phase shape: distinct FILTER matrix under forced two-phase GUCs") {
    verifyOne(engine, "m3_q15tp", q15tpSql, chained = true, "at final state")
  }
  test("q16-no-distinct shape: per-channel spread, distinct-free")(
    verifyShape("m3_q16nd"))
  test("q105-without-limit shape: fused join + grouped count")(
    verifyShape("m3_q105nl"))
  test("q102 HAVING-scalar-subquery spelling: loud fence")(
    verifyShape("m3_q102h"))
  test("q0-temporal-filter shape: horizon passthrough ages out")(
    verifyShape("m3_q0tf"))
  test("q1-temporal-filter shape: mapper chained on the filtered stream")(
    verifyShape("m3_q1tf"))
  test("q4-temporal-filter shape: aggregate retracts on eviction")(
    verifyShape("m3_q4tf"))
  test("q18-temporal-filter shape: group top-1 promotes on eviction")(
    verifyShape("m3_q18tf"))
}
