package graft

import scala.collection.mutable.ArrayBuffer
import scala.util.Random

import org.apache.spark.sql.functions.col

/** Nexmark breadth over the ENGINE's SQL surface — the reference's
  * primary streaming workload (ci/scripts/sql/nexmark/q*.sql,
  * e2e_test/streaming/nexmark/) rendered as chained streaming MVs over
  * DML tables, each diffed against a batch recompute of its own
  * defining query after every epoch burst (insert/update/delete,
  * including max-retracting price drops and group-moving category
  * flips).
  *
  * Where a reference query is one statement the chain planner cannot
  * take whole (multi-way join + agg, LIMIT), it is decomposed into an
  * MV-on-MV stack the way a reference user layers mv-on-mv
  * (docs/dev/src/design/mv-on-mv.md). Scalar-subquery comparisons and
  * IN/NOT-IN subqueries chain as dynamic (set) filters since round 8;
  * shapes still outside the incremental envelope (streaming LIMIT) pin
  * the LOUD batch-refresh fence instead — `expectChained = false`
  * asserts the planner's decision stays explicit either way.
  *
  * Batch twins with DuckDB oracles for the SQL-expressible shapes live
  * in queries/NexmarkLike.scala; the five source-fed window shapes are
  * NexmarkMvSpec. Together: 25+ distinct Nexmark shapes.
  */
class NexmarkChainSpec extends SparkSpecBase {

  /** (mv name, pk clause, defining sql, expectChained). Order =
    * creation order; verification runs bottom-up so a lower MV's
    * divergence is never masked by its consumer's oracle.
    */
  private val defs = ArrayBuffer[(String, String, String, Boolean)]()
  private val A = "nxa"
  private val B = "nxb"

  private def mv(name: String, pk: String, sql: String,
      chained: Boolean = true): Unit = defs += ((name, pk, sql, chained))

  // ------------------------------------------------------------ shapes
  // q3: filtered two-table join (person stands in: the auction side).
  mv("m_q3", "(bid_id, id)",
    s"""SELECT $B.bid_id, $A.id, $A.item_name, $A.category, $B.price
       |FROM $B JOIN $A ON $B.auction = $A.id
       |WHERE $A.category = 1 AND $B.channel IN ('apple', 'google')""".stripMargin)

  // q4: join with date-bound theta conjuncts, then max per auction,
  // then per-category rollup — a three-deep chain ending in avg
  // (sum/count split keeps the compare exact).
  mv("m_q4_join", "(bid_id, id)",
    s"""SELECT $B.bid_id, $A.id, $A.category, $B.price
       |FROM $B JOIN $A ON $B.auction = $A.id
       |  AND $B.dt >= $A.dt AND $B.dt <= $A.expires""".stripMargin)
  mv("m_q4_max", "(id, category)",
    "SELECT id, category, max(price) AS final FROM m_q4_join GROUP BY id, category")
  mv("m_q4_avg", "(category)",
    "SELECT category, count(*) AS n, sum(final) AS sum_final " +
      "FROM m_q4_max GROUP BY category")

  // q5: hot items — per-(window, auction) counts, per-window max, and
  // the DIAMOND join of the two (both derive from the same counts MV;
  // the rename hop keeps the join sides' PKs disjoint).
  mv("m_q5_w", "(bid_id)",
    s"SELECT bid_id, auction, date_trunc('hour', dt) AS ws FROM $B")
  mv("m_q5_counts", "(ws, auction)",
    "SELECT ws, auction, count(*) AS num FROM m_q5_w GROUP BY ws, auction")
  mv("m_q5_max", "(ws)",
    "SELECT ws, max(num) AS maxn FROM m_q5_counts GROUP BY ws")
  mv("m_q5_maxr", "(ws2)",
    "SELECT ws AS ws2, maxn FROM m_q5_max")
  mv("m_q5_hot", "(ws, auction, ws2)",
    """SELECT m_q5_counts.ws, m_q5_counts.auction, m_q5_maxr.ws2, m_q5_counts.num
      |FROM m_q5_counts JOIN m_q5_maxr
      |  ON m_q5_counts.ws = m_q5_maxr.ws2
      |  AND m_q5_counts.num >= m_q5_maxr.maxn""".stripMargin)

  // q7: highest bid — per-window max joined back to the bid rows that
  // achieved it (two-column equi join).
  mv("m_q7_w", "(bid_id)",
    s"SELECT bid_id, bidder, price, date_trunc('hour', dt) AS ws FROM $B")
  mv("m_q7_max", "(ws)",
    "SELECT ws, max(price) AS maxprice FROM m_q7_w GROUP BY ws")
  mv("m_q7_maxr", "(wsx)",
    "SELECT ws AS wsx, maxprice FROM m_q7_max")
  mv("m_q7_top", "(bid_id, wsx)",
    """SELECT m_q7_w.bid_id, m_q7_maxr.wsx, m_q7_w.bidder, m_q7_w.price
      |FROM m_q7_w JOIN m_q7_maxr
      |  ON m_q7_w.ws = m_q7_maxr.wsx AND m_q7_w.price = m_q7_maxr.maxprice""".stripMargin)

  // q9: winning bid — group top-1 (row_number ≤ 1) over the chained
  // date-bounded join.
  mv("m_q9", "(id)",
    """SELECT id, bid_id, price FROM (
      |  SELECT id, bid_id, price,
      |         row_number() OVER (PARTITION BY id
      |                            ORDER BY price DESC, bid_id) AS rn
      |  FROM m_q4_join) WHERE rn <= 1""".stripMargin)

  // q15: per-day stats — FILTERed counts + count(DISTINCT …) in one
  // streaming aggregate over a day-projecting per-row hop.
  mv("m_q15_day", "(bid_id)",
    s"SELECT bid_id, bidder, auction, price, date_format(dt, 'yyyy-MM-dd') AS day FROM $B")
  mv("m_q15", "(day)",
    """SELECT day,
      |       count(*) AS total_bids,
      |       count(*) FILTER (WHERE price < 100) AS rank1_bids,
      |       count(*) FILTER (WHERE price >= 100) AS rank2_bids,
      |       count(DISTINCT bidder) AS total_bidders,
      |       count(DISTINCT auction) AS total_auctions
      |FROM m_q15_day GROUP BY day""".stripMargin)

  // q17: per-(auction, day) stats with retractable min/max.
  mv("m_q17", "(auction, day)",
    """SELECT auction, day, count(*) AS total_bids,
      |       count(*) FILTER (WHERE price < 100) AS rank1_bids,
      |       min(price) AS min_price, max(price) AS max_price,
      |       sum(price) AS sum_price
      |FROM m_q15_day GROUP BY auction, day""".stripMargin)

  // q18: latest bid per (bidder, auction) — streaming dedup as a
  // row_number ≤ 1 chain directly over the DML table.
  mv("m_q18", "(bidder, auction)",
    s"""SELECT auction, bidder, price, channel, dt FROM (
       |  SELECT auction, bidder, price, channel, dt,
       |         row_number() OVER (PARTITION BY bidder, auction
       |                            ORDER BY dt DESC, bid_id DESC) AS rn
       |  FROM $B) WHERE rn <= 1""".stripMargin)

  // q101: auctions LEFT JOIN their current highest bid (outer delta
  // join whose right side is an aggregate MV).
  mv("m_q101_max", "(auction)",
    s"SELECT auction, max(price) AS max_price FROM $B GROUP BY auction")
  mv("m_q101", "(id, auction)",
    s"""SELECT $A.id, $A.item_name, m_q101_max.auction, m_q101_max.max_price
       |FROM $A LEFT JOIN m_q101_max ON $A.id = m_q101_max.auction""".stripMargin)

  // q102: auctions with at-least-average bid count — decomposed into a
  // counts hop, a delta join, and the final scalar-subquery comparison.
  mv("m_q102_counts", "(auction)",
    s"SELECT auction, count(*) AS bid_count FROM $B GROUP BY auction")
  mv("m_q102_join", "(id, auction)",
    s"""SELECT $A.id, $A.item_name, m_q102_counts.auction, m_q102_counts.bid_count
       |FROM $A JOIN m_q102_counts ON $A.id = m_q102_counts.auction""".stripMargin)
  // CHAINED since round 8: the comparison-against-scalar-subquery shape
  // maintains as a streaming dynamic filter (the reference's
  // DynamicFilter executor) — the per-auction counts are left state,
  // the scalar re-reads when $B publishes, threshold moves re-scan only
  // the swept band. PK = the upstream join MV's PK, passed through.
  mv("m_q102", "(id, auction)",
    s"""SELECT id, auction, item_name, bid_count FROM m_q102_join
       |WHERE bid_count >= (SELECT count(*) / count(DISTINCT auction) FROM $B)""".stripMargin)

  // q103 / q104: IN / NOT IN grouped-HAVING subqueries — CHAINED since
  // round 8 as streaming dynamic-SET filters (the reference's semi/anti
  // join against the subquery arrangement): the key set is state, each
  // right-side epoch re-evaluates it, and the entering/leaving key diff
  // flips exactly the auctions whose membership changed.
  mv("m_q103", "(id)",
    s"""SELECT id, item_name FROM $A WHERE id IN (
       |  SELECT auction FROM $B GROUP BY auction HAVING count(*) >= 4)""".stripMargin)
  mv("m_q104", "(id)",
    s"""SELECT id, item_name FROM $A WHERE id NOT IN (
       |  SELECT auction FROM $B GROUP BY auction HAVING count(*) < 4)""".stripMargin)

  // q105: top bid counts with LIMIT — CHAINED since round 9: a global
  // ORDER BY … LIMIT k maintains as a streaming TopN (the reference's
  // top_n_plain executor): the upstream rows are state, the current
  // top-k re-derives from the boundary-pruned region per touching epoch.
  mv("m_q105", "(id, auction)",
    """SELECT id, auction, item_name, bid_count FROM m_q102_join
      |ORDER BY bid_count DESC, id LIMIT 5""".stripMargin)

  // q21: channel_id extraction (CASE + regexp over url).
  mv("m_q21", "(bid_id)",
    s"""SELECT bid_id, auction, bidder, price, channel,
       |  CASE WHEN lower(channel) = 'apple' THEN '0'
       |       WHEN lower(channel) = 'google' THEN '1'
       |       WHEN lower(channel) = 'baidu' THEN '3'
       |       ELSE regexp_extract(url, 'channel_id=([^&]*)', 1) END AS channel_id
       |FROM $B
       |WHERE regexp_extract(url, 'channel_id=([^&]*)', 1) <> ''
       |   OR lower(channel) IN ('apple', 'google', 'baidu')""".stripMargin)

  // q22: url directory split (split_part projection).
  mv("m_q22", "(bid_id)",
    s"""SELECT bid_id, auction, price, split_part(url, '/', 4) AS dir1,
       |       split_part(url, '/', 5) AS dir2
       |FROM $B""".stripMargin)

  // q8: monitor new users — two windowed DISTINCT aggregates joined on
  // (key, window): bidders active in a day joined to sellers who
  // started an auction the same day.
  mv("m_q8_pw", "(bid_id)",
    s"SELECT bid_id, bidder, date_trunc('day', dt) AS ws FROM $B")
  mv("m_q8_p", "(bidder, ws)",
    "SELECT bidder, ws FROM m_q8_pw GROUP BY bidder, ws")
  mv("m_q8_aw", "(id)",
    s"SELECT id, seller, date_trunc('day', dt) AS wsx FROM $A")
  mv("m_q8_a", "(seller, wsx)",
    "SELECT seller, wsx FROM m_q8_aw GROUP BY seller, wsx")
  mv("m_q8", "(bidder, ws, seller, wsx)",
    """SELECT m_q8_p.bidder, m_q8_p.ws, m_q8_a.seller, m_q8_a.wsx
      |FROM m_q8_p JOIN m_q8_a
      |  ON m_q8_p.bidder = m_q8_a.seller AND m_q8_p.ws = m_q8_a.wsx""".stripMargin)

  // q14: calc fields — currency conversion, CASE over extract(hour)
  // (day-part classification), and a post-calc filter, all per-row.
  mv("m_q14", "(bid_id)",
    s"""SELECT bid_id, auction, bidder, price * 0.908 AS dollar_price,
       |  CASE WHEN extract(hour FROM dt) >= 8 AND extract(hour FROM dt) <= 18
       |         THEN 'dayTime'
       |       WHEN extract(hour FROM dt) <= 6 OR extract(hour FROM dt) >= 20
       |         THEN 'nightTime'
       |       ELSE 'otherTime' END AS bid_time_type, dt
       |FROM $B WHERE price * 0.908 > 50""".stripMargin)

  // q16: per-(channel, day) stats — the widest FILTER + multi-DISTINCT
  // aggregate in the workload, plus a max over a projected minute.
  mv("m_q16_w", "(bid_id)",
    s"""SELECT bid_id, channel, auction, bidder, price,
       |  date_format(dt, 'yyyy-MM-dd') AS day,
       |  date_format(dt, 'HH:mm') AS minute FROM $B""".stripMargin)
  mv("m_q16", "(channel, day)",
    """SELECT channel, day, max(minute) AS max_minute,
      |  count(*) AS total_bids,
      |  count(*) FILTER (WHERE price < 100) AS rank1_bids,
      |  count(*) FILTER (WHERE price >= 100) AS rank2_bids,
      |  count(DISTINCT bidder) AS total_bidders,
      |  count(DISTINCT bidder) FILTER (WHERE price < 100) AS rank1_bidders,
      |  count(DISTINCT auction) AS total_auctions
      |FROM m_q16_w GROUP BY channel, day""".stripMargin)

  // q19: per-auction top bids — group top-N with N > 1 (multiplicity in
  // the retraction path that top-1 shapes never exercise).
  mv("m_q19", "(auction, bid_id)",
    s"""SELECT auction, bid_id, bidder, price FROM (
       |  SELECT auction, bid_id, bidder, price,
       |         row_number() OVER (PARTITION BY auction
       |                            ORDER BY price DESC, bid_id) AS rn
       |  FROM $B) WHERE rn <= 3""".stripMargin)

  // q20: bids expanded with their auction's metadata, filtered by
  // category on the BUILD side (filter-flipping UPDATEs on nxa move
  // whole auctions in and out of the view).
  mv("m_q20", "(bid_id, id)",
    s"""SELECT $B.bid_id, $B.auction, $B.bidder, $B.price, $B.channel, $B.dt,
       |  $A.id, $A.item_name, $A.seller, $A.category, $A.expires
       |FROM $B JOIN $A ON $B.auction = $A.id
       |WHERE $A.category = 2""".stripMargin)

  // ----------------------------------------------------- data + epochs
  private val channels = Vector("apple", "google", "baidu", "facebook", "mail")
  private var nextBid = 0

  private def bidRow(r: Random): String = {
    nextBid += 1
    val auction = 1 + r.nextInt(14) // 13/14 dangle: no such auction
    val bidder = 1 + r.nextInt(8)
    val price = 20 + r.nextInt(180)
    val channel = channels(r.nextInt(channels.length))
    val url =
      if (r.nextInt(3) == 0) s"https://site.com/p${r.nextInt(4)}/q${r.nextInt(4)}/item"
      else s"https://site.com/p${r.nextInt(4)}/q${r.nextInt(4)}/item?channel_id=c${r.nextInt(4)}"
    val dt = f"2024-03-${1 + r.nextInt(3)}%02d ${r.nextInt(24)}%02d:${15 * r.nextInt(4)}%02d:00"
    s"($nextBid, $auction, $bidder, $price, '$channel', '$url', TIMESTAMP '$dt')"
  }

  private def insertBids(e: Engine, r: Random, n: Int): Unit =
    e.execute(s"INSERT INTO $B VALUES " + Seq.fill(n)(bidRow(r)).mkString(", "))

  /** Engine + tables + all stacks + three DML epoch bursts, verified
    * after each burst. Built once; individual tests re-verify slices so
    * a shape failure is reported against its own name.
    */
  private lazy val engine: Engine = {
    val e = new Engine(spark, tmpDir("nexchain"))
    val r = new Random(20240815)
    // ~30 MV stores over ≤120 rows: 32-way bucketing would be pure fixed
    // overhead per epoch — the session knob a reference user sets for a
    // small streaming job (streaming_parallelism)
    e.execute("SET streaming_parallelism = 4")
    e.execute(s"CREATE TABLE $A (id BIGINT PRIMARY KEY, item_name STRING, " +
      "seller BIGINT, category BIGINT, dt TIMESTAMP, expires TIMESTAMP)")
    e.execute(s"CREATE TABLE $B (bid_id BIGINT PRIMARY KEY, auction BIGINT, " +
      "bidder BIGINT, price BIGINT, channel STRING, url STRING, dt TIMESTAMP)")
    val auctions = (1 to 12).map { id =>
      val day = 1 + id % 3
      val expDay = day + 1 + id % 2
      s"($id, 'item_$id', ${id % 5}, ${id % 3}, " +
        f"TIMESTAMP '2024-03-$day%02d 00:00:00', TIMESTAMP '2024-03-$expDay%02d 12:00:00')"
    }
    e.execute(s"INSERT INTO $A VALUES " + auctions.mkString(", "))
    insertBids(e, r, 30)
    e.execute("FLUSH")
    defs.foreach { case (name, pk, sql, _) =>
      e.execute(s"CREATE MATERIALIZED VIEW $name (PRIMARY KEY $pk) AS $sql")
    }
    defs.foreach { case (name, _, _, chained) =>
      assert(e.streamingJob(name).nonEmpty == chained,
        s"$name: expected ${if (chained) "a streaming chain" else "the batch-refresh fence"}")
    }
    // epoch burst 2: growth
    insertBids(e, r, 30)
    e.execute("FLUSH")
    verifyAll(e, "after growth epoch")
    // epoch burst 3: retractions — max-killing price drops, bid
    // deletions, group-moving category flips, filter-flipping channels
    e.execute(s"UPDATE $B SET price = price - 60 WHERE price >= 150")
    e.execute(s"DELETE FROM $B WHERE bid_id % 7 = 0")
    e.execute(s"UPDATE $A SET category = (category + 1) % 3 WHERE id % 4 = 1")
    e.execute(s"UPDATE $B SET channel = 'apple' WHERE bid_id % 5 = 2")
    e.execute("FLUSH")
    verifyAll(e, "after retraction epoch")
    // epoch burst 4: mixed growth + dedup-partition moves
    insertBids(e, r, 20)
    e.execute(s"UPDATE $B SET bidder = bidder + 1 WHERE bid_id % 9 = 4")
    e.execute("FLUSH")
    e
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().map(_.toString).toSeq.sorted
  }

  /** Bottom-up: refresh fenced MVs, then diff each against the batch
    * recompute of its own defining SQL over current storage.
    */
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

  test("q3 shape: filtered two-table join chain")(
    verifyShape("m_q3"))
  test("q4 shape: date-bounded join → max per auction → category rollup")(
    verifyShape("m_q4_join", "m_q4_max", "m_q4_avg"))
  test("q5 shape: hot items diamond (counts joined to per-window max)")(
    verifyShape("m_q5_w", "m_q5_counts", "m_q5_max", "m_q5_maxr", "m_q5_hot"))
  test("q7 shape: highest bid joined back to achieving rows")(
    verifyShape("m_q7_w", "m_q7_max", "m_q7_maxr", "m_q7_top"))
  test("q9 shape: winning bid — group top-1 over chained join")(
    verifyShape("m_q9"))
  test("q15 shape: day stats with FILTER and DISTINCT aggregates")(
    verifyShape("m_q15_day", "m_q15"))
  test("q17 shape: per-auction-day stats with retractable min/max")(
    verifyShape("m_q17"))
  test("q18 shape: latest bid per (bidder, auction) dedup")(
    verifyShape("m_q18"))
  test("q101 shape: left join to aggregate MV (current highest bid)")(
    verifyShape("m_q101_max", "m_q101"))
  test("q102 shape: scalar-subquery threshold — streaming dynamic filter")(
    verifyShape("m_q102_counts", "m_q102_join", "m_q102"))
  test("q103 shape: IN grouped-HAVING subquery — streaming dynamic-set filter")(
    verifyShape("m_q103"))
  test("q104 shape: NOT IN grouped-HAVING subquery — streaming dynamic anti-set filter")(
    verifyShape("m_q104"))
  test("q105 shape: bid-count top-N with LIMIT — streaming TopN chain")(
    verifyShape("m_q105"))
  test("q21 shape: channel_id extraction projection chain")(
    verifyShape("m_q21"))
  test("q22 shape: split_part projection chain")(
    verifyShape("m_q22"))
  test("q8 shape: windowed distinct aggregates joined on (key, window)")(
    verifyShape("m_q8_pw", "m_q8_p", "m_q8_aw", "m_q8_a", "m_q8"))
  test("q14 shape: calc fields with CASE over extract(hour)")(
    verifyShape("m_q14"))
  test("q16 shape: channel-day stats with FILTERed DISTINCT aggregates")(
    verifyShape("m_q16_w", "m_q16"))
  test("q19 shape: per-auction top-3 bids (group top-N, N > 1)")(
    verifyShape("m_q19"))
  test("q20 shape: bid-auction enrichment filtered on the build side")(
    verifyShape("m_q20"))
}
