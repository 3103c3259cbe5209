package graft

/** Row-limited `FETCH <n>` on subscription cursors (reference:
  * session/cursor_manager.rs fetch-with-count): bounded pages over the
  * pending changelog, an intra-epoch offset that survives restart, and
  * no row lost or duplicated across page boundaries.
  */
class CursorFetchSpec extends SparkSpecBase {
  import spark.implicits._

  test("FETCH n pages through pending epochs exactly once, offset durable") {
    val dir = tmpDir("curfetch")
    val e = new Engine(spark, dir)
    e.execute("CREATE TABLE ct (k BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("CREATE SUBSCRIPTION csub FROM ct")
    e.execute("DECLARE cc SUBSCRIPTION CURSOR FOR csub")

    // two epochs: 3 rows then 2 rows
    e.execute("INSERT INTO ct VALUES (1, 10), (2, 20), (3, 30)")
    e.execute("INSERT INTO ct VALUES (4, 40), (5, 50)")

    // a drained cursor returns the zero-column empty frame (same
    // contract as FETCH ALL on an up-to-date cursor)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      if (df.columns.isEmpty) Seq.empty
      else df.select("k").as[Long].collect().toSeq
    def page(n: Int): Seq[Long] = rows(e.execute(s"FETCH $n FROM cc"))

    val p1 = page(2)
    assert(p1.size == 2)
    // intra-epoch offset survives an engine restart mid-epoch
    val e2 = new Engine(spark, dir)
    def page2(n: Int): Seq[Long] = rows(e2.execute(s"FETCH $n FROM cc"))
    val p2 = page2(2)
    val p3 = page2(2)
    val p4 = page2(2)
    assert((p1 ++ p2 ++ p3).sorted == Seq(1L, 2L, 3L, 4L, 5L),
      s"pages must cover all rows exactly once: $p1 $p2 $p3")
    assert(p4.isEmpty, s"drained cursor must return an empty frame: $p4")

    // new DML after draining flows through FETCH ALL
    e2.execute("INSERT INTO ct VALUES (6, 60)")
    val rest = e2.execute("FETCH ALL FROM cc").select("k").as[Long].collect().toSeq
    assert(rest == Seq(6L))
  }

  test("DECLARE ... SINCE begin()/now()/<unix_ms> sets the start frontier") {
    // reference: e2e_test/subscription/main.py test_cursor_since_*
    val e = new Engine(spark, tmpDir("cursince"))
    e.execute("CREATE TABLE st2 (k BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("CREATE SUBSCRIPTION ssub FROM st2")
    e.execute("INSERT INTO st2 VALUES (4, 4)")
    Thread.sleep(1100)
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(1100)
    e.execute("INSERT INTO st2 VALUES (5, 5)")

    def drain(cur: String): Seq[Long] = {
      val df = e.execute(s"FETCH ALL FROM $cur")
      if (df.columns.isEmpty) Seq.empty
      else df.select("k").as[Long].collect().toSeq.sorted
    }
    // begin(): the whole retained log
    e.execute("DECLARE cb SUBSCRIPTION CURSOR FOR ssub SINCE begin()")
    assert(drain("cb") == Seq(4L, 5L))
    // now(): only what comes after the declaration
    e.execute("DECLARE cn SUBSCRIPTION CURSOR FOR ssub SINCE now()")
    assert(drain("cn").isEmpty)
    // unix-ms between the two epochs: only the second
    e.execute(s"DECLARE ct SUBSCRIPTION CURSOR FOR ssub SINCE $betweenMs")
    assert(drain("ct") == Seq(5L))
    // all three track new changes from their frontier on
    e.execute("INSERT INTO st2 VALUES (6, 6)")
    Seq("cb", "cn", "ct").foreach(c => assert(drain(c) == Seq(6L), c))

    // SHOW SUBSCRIPTION CURSORS lists them with subscription + frontier;
    // SHOW CURSORS lists batch query cursors (reference show.rs
    // ShowObject::Cursor / ::SubscriptionCursor)
    val shown = e.execute("SHOW SUBSCRIPTION CURSORS").collect()
      .map(r => (r.getString(2), r.getString(3))).toSet
    assert(shown == Set(("cb", "ssub"), ("cn", "ssub"), ("ct", "ssub")))
    e.execute("DECLARE qq CURSOR FOR SELECT k FROM st2 ORDER BY k")
    assert(e.execute("SHOW CURSORS").collect()
      .map(_.getString(2)).toSeq == Seq("qq"))
    e.execute("CLOSE qq")
    assert(e.execute("SHOW CURSORS").collect().isEmpty)
  }
}
