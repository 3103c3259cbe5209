package graft

import scala.collection.mutable.ArrayBuffer
import scala.util.Random

import org.apache.spark.sql.functions.col

/** Nexmark breadth, part 2 — the interval-join half the round-6 review
  * flagged as untested (reference ci/scripts/sql/nexmark/: q0/q1/q2/q10
  * state-machine trio + formatter, q7's BETWEEN-banded interval join,
  * the q5/q7 rank()-with-ties rewrites, q6's framed running aggregate
  * over group top-1, q106's global min, q13's PROCTIME lookup join, and
  * a session-window fence probe). Same harness as NexmarkChainSpec —
  * chained streaming MVs over DML tables diffed against batch
  * recomputes after growth/retraction/mixed epoch bursts — but a
  * SEPARATE engine: ~20 concurrent continuous-trigger streams per
  * local[4] engine is the thrash knee; one engine with both halves'
  * ~45 streams spends more time polling than progressing.
  */
class NexmarkChainSpec2 extends SparkSpecBase {

  private val defs = ArrayBuffer[(String, String, String, Boolean)]()
  private val A = "nx2a"
  private val B = "nx2b"
  private val S = "nx2side"
  private val C = "nx2c"

  private def mv(name: String, pk: String, sql: String,
      chained: Boolean = true): Unit = defs += ((name, pk, sql, chained))

  // ------------------------------------------------------------ shapes
  // q0 / q1 / q2: the passthrough / mapper / filter trio — the simplest
  // per-row chains, benched by the reference as distinct shapes.
  mv("m2_q0", "(bid_id)",
    s"SELECT bid_id, auction, bidder, price, dt FROM $B")
  mv("m2_q1", "(bid_id)",
    s"SELECT bid_id, auction, bidder, " +
      s"CAST(0.908 * price AS DECIMAL(23, 3)) AS price, dt FROM $B")
  mv("m2_q2", "(bid_id)",
    s"SELECT bid_id, auction, price FROM $B " +
      "WHERE auction = 1 OR auction = 2 OR auction = 5 OR auction = 7 OR auction = 11")

  // q10: log-to-file projection — TO_CHAR date/time splits.
  mv("m2_q10", "(bid_id)",
    s"""SELECT bid_id, auction, bidder, price, dt,
       |  date_format(dt, 'yyyy-MM-dd') AS date_col,
       |  date_format(dt, 'HH:mm') AS time_col FROM $B""".stripMargin)

  // q7 INTERVAL-JOIN form (q7.sql): per-window max joined back to the
  // achieving bids by price equality PLUS the reference's
  // `date_time BETWEEN window_end - INTERVAL AND window_end` band —
  // the delta join's equi-prefix + theta-band envelope.
  mv("m2_q7_w", "(bid_id)",
    s"SELECT bid_id, bidder, price, dt, " +
      s"date_trunc('hour', dt) + INTERVAL '1' HOUR AS we FROM $B")
  mv("m2_q7_max", "(we)",
    "SELECT we, max(price) AS maxprice FROM m2_q7_w GROUP BY we")
  mv("m2_q7_maxr", "(wex)",
    "SELECT we AS wex, maxprice FROM m2_q7_max")
  mv("m2_q7i", "(bid_id, wex)",
    """SELECT m2_q7_w.bid_id, m2_q7_maxr.wex, m2_q7_w.bidder, m2_q7_w.price, m2_q7_w.dt
      |FROM m2_q7_w JOIN m2_q7_maxr
      |  ON m2_q7_w.price = m2_q7_maxr.maxprice
      |  AND m2_q7_w.dt BETWEEN m2_q7_maxr.wex - INTERVAL '1' HOUR
      |                     AND m2_q7_maxr.wex""".stripMargin)

  // q7-rewrite: the same winner set via rank() over the window — top-1
  // WITH TIES, the GroupTopN mode row_number shapes never exercise.
  mv("m2_q7r", "(we, bid_id)",
    """SELECT we, bid_id, bidder, price, dt FROM (
      |  SELECT we, bid_id, bidder, price, dt,
      |         rank() OVER (PARTITION BY we ORDER BY price DESC) AS price_rank
      |  FROM m2_q7_w) WHERE price_rank <= 1""".stripMargin)

  // q5-rewrite: hot items as rank()-with-ties over per-window counts
  // instead of the diamond max-join.
  mv("m2_q5_counts", "(we, auction)",
    "SELECT we, auction, count(*) AS num FROM m2_q5_w0 GROUP BY we, auction")
  mv("m2_q5r", "(we, auction)",
    """SELECT we, auction, num FROM (
      |  SELECT we, auction, num,
      |         rank() OVER (PARTITION BY we ORDER BY num DESC) AS num_rank
      |  FROM m2_q5_counts) WHERE num_rank <= 1""".stripMargin)

  // q6 (q6-group-top1.sql): winning bid per (auction, seller) via group
  // top-1 over the interval join, then a ROWS-framed running aggregate
  // per seller over the winners (sum/count split keeps the compare
  // float-free and exact).
  mv("m2_q6_join", "(bid_id, id)",
    s"""SELECT $B.bid_id, $A.id, $A.seller, $B.price, $B.dt
       |FROM $B JOIN $A ON $B.auction = $A.id
       |  AND $B.dt >= $A.dt AND $B.dt <= $A.expires""".stripMargin)
  mv("m2_q6_top1", "(id, seller)",
    """SELECT id, seller, final, dtf FROM (
      |  SELECT id, seller, price AS final, dt AS dtf,
      |         row_number() OVER (PARTITION BY id, seller
      |                            ORDER BY price DESC, bid_id) AS rn
      |  FROM m2_q6_join) WHERE rn <= 1""".stripMargin)
  // the reference's actual q6 SHAPE: both windows fused in ONE
  // statement — maintainable because the specs share the seller
  // attribute (Engine.commonOverPartitionCols keys the recompute on the
  // intersection; the round-7 fuzz caught the old union key
  // under-recomputing exactly this statement)
  mv("m2_q6", "(id, seller)",
    """SELECT id, seller, final, dtf,
      |  sum(final) OVER (PARTITION BY seller ORDER BY dtf, id
      |                   ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) AS sum10,
      |  count(*) OVER (PARTITION BY seller ORDER BY dtf, id
      |                 ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) AS n10
      |FROM (SELECT id, seller, final, dtf FROM (
      |  SELECT id, seller, price AS final, dt AS dtf,
      |         row_number() OVER (PARTITION BY id, seller
      |                            ORDER BY price DESC, bid_id) AS rn
      |  FROM m2_q6_join) WHERE rn <= 1)""".stripMargin)

  // q106: global MIN over the per-auction winning bids — a group-less
  // aggregate stacked on a retractable-max chain. CHAINED since round 9
  // through IncrementalAgg's single-group materialized-input path (the
  // reference's simple_agg): the upstream rows are state, every epoch
  // re-derives the one output row and publishes U-/U+.
  mv("m2_q106_max", "(id)",
    "SELECT id, max(price) AS final FROM m2_q6_join GROUP BY id")
  mv("m2_q106", "(min_final)",
    "SELECT min(final) AS min_final FROM m2_q106_max")

  // q13 / q13-non-lookup-cond: bids enriched through a
  // `FOR SYSTEM_TIME AS OF PROCTIME()` lookup against a static side
  // table keyed by a mod() expression; the variant adds a non-lookup
  // conjunct on the side row.
  mv("m2_q13", "(bid_id, key)",
    s"""SELECT $B.bid_id, $B.auction, $B.price, $S.key, $S.value
       |FROM $B JOIN $S FOR SYSTEM_TIME AS OF PROCTIME()
       |  ON mod($B.auction, 8) = $S.key""".stripMargin)
  mv("m2_q13nl", "(bid_id, key)",
    s"""SELECT $B.bid_id, $B.auction, $B.price, $S.key, $S.value
       |FROM $B JOIN $S FOR SYSTEM_TIME AS OF PROCTIME()
       |  ON mod($B.auction, 8) = $S.key AND $S.key % 4 != 1""".stripMargin)

  // session-window variant — CHAINED since round 9: gap merging is not
  // per-(group,window) incremental (one delta row can merge/split its
  // key's whole session chain), so the recompute partitions on the
  // PLAIN attr group key only: a touched bidder's sessions recompute
  // whole, old session rows retract, merged/split boundaries re-emit
  // (the reference's SESSION window over its materialized state).
  mv("m2_qsess", "(bidder, sess_start)",
    s"""SELECT bidder, session_window(dt, '1 hour').start AS sess_start,
       |  count(*) AS n, sum(price) AS sum_price
       |FROM $B GROUP BY bidder, session_window(dt, '1 hour')""".stripMargin)

  // q12: per-bidder bid counts over the TUMBLE TVF — the window TVF
  // inside a chained MV (group keys born inside the window assignment →
  // the generate-mode keysOf replay). The reference tumbles on
  // PROCTIME; the chain's event-time rendering keeps the shape
  // batch-verifiable (proctime can never be recomputed).
  mv("m2_q12", "(bidder, window_start, window_end)",
    s"""SELECT bidder, count(*) AS bid_count, window_start, window_end
       |FROM TUMBLE($B, dt, INTERVAL '10' MINUTE)
       |GROUP BY bidder, window_start, window_end""".stripMargin)

  // q5-many-windows: the HOP TVF at a high window/slide ratio (1 h /
  // 5 min = 12 windows per row — the reference's RANGE/SLIDE = 60 shape
  // scaled to test time): per-row window explosion feeding a touched-
  // group recompute.
  mv("m2_q5mw", "(auction, window_start)",
    s"""SELECT auction, count(*) AS num, window_start
       |FROM HOP($B, dt, INTERVAL '5' MINUTE, INTERVAL '1' HOUR)
       |GROUP BY auction, window_start""".stripMargin)

  // q107: GLOBAL approx percentiles in the reference's ordered-set
  // spelling — CHAINED since round 9: a group-less aggregate routes
  // through the single-group materialized-input path (the input rows
  // are the state; the sketch re-derives over them per epoch, exactly
  // like the reference's materialized-input agg state).
  mv("m2_q107", "(p50)",
    s"""SELECT approx_percentile(0.5, 0.01) WITHIN GROUP (ORDER BY price) AS p50,
       |  approx_percentile(0.9, 0.01) WITHIN GROUP (ORDER BY price) AS p90,
       |  approx_percentile(0.99, 0.01) WITHIN GROUP (ORDER BY price) AS p99
       |FROM $B""".stripMargin)

  // q108: the same sketch PER AUCTION — grouped, so the touched-group
  // recompute chains it (group sizes sit far under the sketch's
  // compression threshold, so the recompute is exact and the
  // batch-recompute diff is deterministic).
  mv("m2_q108", "(auction)",
    s"""SELECT auction,
       |  approx_percentile(0.5, 0.01) WITHIN GROUP (ORDER BY price) AS p50,
       |  approx_percentile(0.9, 0.01) WITHIN GROUP (ORDER BY price) AS p90
       |FROM $B GROUP BY auction""".stripMargin)

  // q13-by-row-id: the PROCTIME lookup join keyed on the generated
  // hidden `_row_id` of a PK-less (append-only) table — the reference's
  // q13-by-row-id.sql joins on mod(B._row_id, side_rows).
  mv("m2_q13rid", "(_row_id, key)",
    s"""SELECT $C._row_id, $C.auction, $C.price, $S.key, $S.value
       |FROM $C JOIN $S FOR SYSTEM_TIME AS OF PROCTIME()
       |  ON mod($C._row_id, 8) = $S.key""".stripMargin)

  // ----------------------------------------------------- data + epochs
  private var nextBid = 0

  private def bidRow(r: Random): String = {
    nextBid += 1
    val auction = 1 + r.nextInt(14)
    val bidder = 1 + r.nextInt(8)
    val price = 20 + r.nextInt(180)
    val dt = f"2024-03-${1 + r.nextInt(3)}%02d ${r.nextInt(24)}%02d:${15 * r.nextInt(4)}%02d:00"
    s"($nextBid, $auction, $bidder, $price, TIMESTAMP '$dt')"
  }

  private def insertBids(e: Engine, r: Random, n: Int): Unit =
    e.execute(s"INSERT INTO $B VALUES " + Seq.fill(n)(bidRow(r)).mkString(", "))

  private lazy val engine: Engine = {
    val e = new Engine(spark, tmpDir("nexchain2"))
    val r = new Random(20260815)
    e.execute("SET streaming_parallelism = 4")
    e.execute(s"CREATE TABLE $A (id BIGINT PRIMARY KEY, item_name STRING, " +
      "seller BIGINT, category BIGINT, dt TIMESTAMP, expires TIMESTAMP)")
    e.execute(s"CREATE TABLE $B (bid_id BIGINT PRIMARY KEY, auction BIGINT, " +
      "bidder BIGINT, price BIGINT, dt TIMESTAMP)")
    e.execute(s"CREATE TABLE $S (key BIGINT PRIMARY KEY, value STRING)")
    e.execute(s"INSERT INTO $S VALUES " +
      (0 until 8).map(k => s"($k, 'side_$k')").mkString(", "))
    // PK-less table → generated hidden _row_id PK (reference:
    // bind_pk_and_row_id_on_relation, handler/create_table.rs:476)
    e.execute(s"CREATE TABLE $C (auction BIGINT, bidder BIGINT, " +
      "price BIGINT, dt TIMESTAMP)")
    e.execute(s"INSERT INTO $C VALUES " + (1 to 25).map(i =>
      s"(${1 + i % 14}, ${1 + i % 8}, ${30 + (i * 13) % 170}, " +
        f"TIMESTAMP '2024-03-${1 + i % 3}%02d ${i % 24}%02d:00:00')")
      .mkString(", "))
    val auctions = (1 to 12).map { id =>
      val day = 1 + id % 3
      val expDay = day + 1 + id % 2
      s"($id, 'item_$id', ${id % 5}, ${id % 3}, " +
        f"TIMESTAMP '2024-03-$day%02d 00:00:00', TIMESTAMP '2024-03-$expDay%02d 12:00:00')"
    }
    e.execute(s"INSERT INTO $A VALUES " + auctions.mkString(", "))
    insertBids(e, r, 30)
    e.execute("FLUSH")
    // q5-rewrite's count feeder (window-projected bid hop), declared
    // here so `defs` order stays shape-grouped above
    e.execute(s"CREATE MATERIALIZED VIEW m2_q5_w0 (PRIMARY KEY (bid_id)) AS " +
      s"SELECT bid_id, auction, date_trunc('hour', dt) + INTERVAL '1' HOUR AS we FROM $B")
    defs.foreach { case (name, pk, sql, _) =>
      e.execute(s"CREATE MATERIALIZED VIEW $name (PRIMARY KEY $pk) AS $sql")
    }
    defs.foreach { case (name, _, _, chained) =>
      assert(e.streamingJob(name).nonEmpty == chained,
        s"$name: expected ${if (chained) "a streaming chain" else "the batch-refresh fence"}")
    }
    insertBids(e, r, 30)
    e.execute(s"INSERT INTO $C VALUES " + (26 to 40).map(i =>
      s"(${1 + i % 14}, ${1 + i % 8}, ${30 + (i * 13) % 170}, " +
        f"TIMESTAMP '2024-03-${1 + i % 3}%02d ${i % 24}%02d:00:00')")
      .mkString(", "))
    e.execute("FLUSH")
    verifyAll(e, "after growth epoch")
    e.execute(s"UPDATE $B SET price = price - 60 WHERE price >= 150")
    e.execute(s"DELETE FROM $B WHERE bid_id % 7 = 0")
    e.execute(s"UPDATE $A SET category = (category + 1) % 3 WHERE id % 4 = 1")
    // DML against the PK-less table: the hidden _row_id keys the merge
    e.execute(s"UPDATE $C SET price = price + 11 WHERE auction % 5 = 2")
    e.execute(s"DELETE FROM $C WHERE bidder = 3")
    e.execute("FLUSH")
    verifyAll(e, "after retraction epoch")
    insertBids(e, r, 20)
    e.execute(s"UPDATE $B SET bidder = bidder + 1 WHERE bid_id % 9 = 4")
    e.execute("FLUSH")
    e
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().map(_.toString).toSeq.sorted
  }

  private def verifyAll(e: Engine, when: String): Unit =
    defs.foreach { case (name, _, sql, chained) =>
      if (!chained) e.execute(s"REFRESH MATERIALIZED VIEW $name")
      val got = sortedRows(e.table(name))
      val want = sortedRows(e.execute(sql))
      assert(got == want,
        s"$name diverged from batch recompute $when\ngot:  $got\nwant: $want")
    }

  private def verifyShape(names: String*): Unit = {
    val e = engine
    names.foreach { n =>
      val (name, _, sql, chained) = defs.find(_._1 == n).get
      if (!chained) e.execute(s"REFRESH MATERIALIZED VIEW $name")
      val got = sortedRows(e.table(name))
      val want = sortedRows(e.execute(sql))
      assert(got == want,
        s"$name diverged from batch recompute at final state\n" +
          s"got:  $got\nwant: $want")
      assert(want.nonEmpty || got.isEmpty, s"$name: oracle empty")
    }
  }

  test("q0/q1/q2/q10 shapes: passthrough, mapper, filter, formatter chains")(
    verifyShape("m2_q0", "m2_q1", "m2_q2", "m2_q10"))
  test("q7 interval-join shape: equi prefix + BETWEEN time band")(
    verifyShape("m2_q7i"))
  test("q7-rewrite shape: rank()-with-ties top-1 per window")(
    verifyShape("m2_q7r"))
  test("q5-rewrite shape: hot items via rank()-with-ties")(
    verifyShape("m2_q5r"))
  test("q6 shape: fused group top-1 + ROWS-framed running aggregate")(
    verifyShape("m2_q6_join", "m2_q6_top1", "m2_q6"))
  test("q106 shape: global min over chained max — single-group chain")(
    verifyShape("m2_q106_max", "m2_q106"))
  test("q13 shape: PROCTIME lookup join on a mod() key")(
    verifyShape("m2_q13"))
  test("q13-non-lookup-cond shape: extra side conjunct")(
    verifyShape("m2_q13nl"))
  test("session-window shape: touched-key gap-merge recompute chains")(
    verifyShape("m2_qsess"))
  test("q12 shape: TUMBLE TVF inside a chained aggregate")(
    verifyShape("m2_q12"))
  test("q5-many-windows shape: HOP TVF at 12 windows per row")(
    verifyShape("m2_q5mw"))
  test("q107 shape: global approx_percentile — single-group chain")(
    verifyShape("m2_q107"))
  test("q108 shape: grouped approx_percentile chains")(
    verifyShape("m2_q108"))
  test("q13-by-row-id shape: lookup join on the hidden _row_id")(
    verifyShape("m2_q13rid"))
}
