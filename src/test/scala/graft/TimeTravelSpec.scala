package graft

import org.apache.spark.sql.functions.col

/** Batch time travel — `SELECT … FROM t FOR SYSTEM_TIME AS OF
  * <epoch | 'timestamp' | now() - interval>` reconstructs the table
  * image at that commit from the epoch-complete changelog (reference:
  * src/frontend/src/binder/relation/mod.rs:353-425 binds the same three
  * argument forms on batch scans).
  */
class TimeTravelSpec extends SparkSpecBase {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("k"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("AS OF epoch returns exactly each epoch's image across a DML history") {
    val e = new Engine(spark, tmpDir("timetravel"))
    e.execute("CREATE TABLE tt (k BIGINT PRIMARY KEY, v BIGINT)")
    // epoch 0..4: five statements, each ONE epoch on the table
    e.execute("INSERT INTO tt VALUES (1, 10), (2, 20), (3, 30)") // 0
    e.execute("INSERT INTO tt VALUES (4, 40)")                   // 1
    e.execute("UPDATE tt SET v = v + 5 WHERE k % 2 = 0")         // 2
    e.execute("DELETE FROM tt WHERE k = 1")                      // 3
    e.execute("UPDATE tt SET k = k + 100 WHERE k = 3")           // 4 (PK move)
    e.execute("FLUSH")
    val images = Seq(
      Set(1L -> 10L, 2L -> 20L, 3L -> 30L),
      Set(1L -> 10L, 2L -> 20L, 3L -> 30L, 4L -> 40L),
      Set(1L -> 10L, 2L -> 25L, 3L -> 30L, 4L -> 45L),
      Set(2L -> 25L, 3L -> 30L, 4L -> 45L),
      Set(2L -> 25L, 103L -> 30L, 4L -> 45L))
    images.zipWithIndex.foreach { case (want, ep) =>
      assert(rows(e.execute(s"SELECT * FROM tt FOR SYSTEM_TIME AS OF $ep")) == want,
        s"epoch $ep image mismatch")
    }
    // current read == newest epoch's image
    assert(rows(e.table("tt")) == images.last)
    // rw_epochs lists the timeline AS OF binds against (reference:
    // meta snapshots through rw_catalog)
    assert(e.execute(
      "SELECT epoch FROM rw_catalog.rw_epochs WHERE relation_name = 'tt' " +
        "ORDER BY epoch")
      .collect().map(_.getLong(0)).toSeq == (0L to 4L))
    // an AS OF beyond the frontier clamps to the newest committed state
    assert(rows(e.execute("SELECT * FROM tt FOR SYSTEM_TIME AS OF 99")) ==
      images.last)
    // qualified references resolve through the implicit alias
    assert(e.execute(
      "SELECT tt.k FROM tt FOR SYSTEM_TIME AS OF 0 WHERE tt.v >= 20")
      .collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    // historical scans join against the live relation: k=2 is the only
    // key present in both the epoch-0 image and the final state
    val joined = e.execute(
      """SELECT cur.k, cur.v AS v_now, old.v AS v_then
        |FROM tt cur JOIN (SELECT * FROM tt FOR SYSTEM_TIME AS OF 0) old
        |  ON cur.k = old.k""".stripMargin)
    assert(joined.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      Set((2L, 25L, 20L)))
    // an explicit alias after the AS OF clause binds the historical scan
    val aliased = e.execute(
      """SELECT cur.k, cur.v AS v_now, old.v AS v_then
        |FROM tt cur JOIN tt FOR SYSTEM_TIME AS OF 0 AS old
        |  ON cur.k = old.k""".stripMargin)
    assert(aliased.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      Set((2L, 25L, 20L)))
  }

  test("AS OF timestamp and now()-interval bind onto the commit timeline") {
    val e = new Engine(spark, tmpDir("timetravelts"))
    e.execute("CREATE TABLE tts (k BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("INSERT INTO tts VALUES (1, 1)")  // epoch 0
    Thread.sleep(1200)
    val between = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    Thread.sleep(1200)
    e.execute("INSERT INTO tts VALUES (2, 2)")  // epoch 1
    e.execute("FLUSH")
    assert(rows(e.execute(
      s"SELECT * FROM tts FOR SYSTEM_TIME AS OF '$between'")) == Set(1L -> 1L))
    // now() - tiny interval lands near the last commit: evaluate ONCE
    // (the target instant moves between evaluations) and accept either
    // adjacent image
    val nearNow = rows(e.execute(
      "SELECT * FROM tts FOR SYSTEM_TIME AS OF now() - interval '1' second"))
    assert(nearNow == Set(1L -> 1L, 2L -> 2L) || nearNow == Set(1L -> 1L))
    // a timestamp before the table had any commit errors loudly
    val ex = intercept[IllegalArgumentException](
      e.execute("SELECT * FROM tts FOR SYSTEM_TIME AS OF '2000-01-01'"))
    assert(ex.getMessage.contains("no committed state"))
    // an alias directly after an interval operand must not be eaten as
    // the interval's unit word
    assert(e.execute(
      s"SELECT h.k FROM tts FOR SYSTEM_TIME AS OF '$between' AS h")
      .collect().map(_.getLong(0)).toSet == Set(1L))
    assert(e.execute(
      "SELECT h.k FROM tts FOR SYSTEM_TIME AS OF now() - interval '1' second AS h")
      .collect().map(_.getLong(0)).toSet.subsetOf(Set(1L, 2L)))
  }

  test("CTAS birth image is addressable; expired history errors loudly") {
    val e = new Engine(spark, tmpDir("timetravelexp"))
    e.execute("CREATE TABLE ttc (PRIMARY KEY (k)) AS " +
      "SELECT CAST(id AS BIGINT) AS k, CAST(id * 10 AS BIGINT) AS v " +
      "FROM range(3)")
    e.execute("INSERT INTO ttc VALUES (100, 1000)") // epoch 0
    e.execute("DELETE FROM ttc WHERE k = 0")        // epoch 1
    e.execute("FLUSH")
    // epoch 0 = birth rows + the insert
    assert(rows(e.execute("SELECT * FROM ttc FOR SYSTEM_TIME AS OF 0")) ==
      Set(0L -> 0L, 1L -> 10L, 2L -> 20L, 100L -> 1000L))
    // compact epoch 0 away, then travel to it → loud error
    e.mvs.get("ttc").get.expireChangelog(0L)
    val ex = intercept[Exception](
      e.execute("SELECT * FROM ttc FOR SYSTEM_TIME AS OF 0"))
    assert(ex.getMessage.contains("history expired"))
    // unknown relation errors loudly
    val ex2 = intercept[IllegalArgumentException](
      e.execute("SELECT * FROM nosuch FOR SYSTEM_TIME AS OF 1"))
    assert(ex2.getMessage.contains("not an engine-managed"))
  }

  test("AS OF pattern inside a string literal is data, not syntax") {
    val e = new Engine(spark, tmpDir("timetravellit"))
    e.execute("CREATE TABLE ttl (k BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("INSERT INTO ttl VALUES (1, 1)") // epoch 0
    e.execute("FLUSH")
    // the clause text living inside a literal must pass through verbatim
    // — it is neither rewritten nor resolved against the catalog
    val lit = e.execute(
      "SELECT 'x FOR SYSTEM_TIME AS OF 3' AS s FROM ttl")
    assert(lit.collect().map(_.getString(0)).toSeq ==
      Seq("x FOR SYSTEM_TIME AS OF 3"))
    // and a literal mention of the REAL clause text elsewhere in the
    // statement must not be clobbered by the rewrite of the real one
    val mixed = e.execute(
      "SELECT k, 'ttl FOR SYSTEM_TIME AS OF 0' AS note " +
        "FROM ttl FOR SYSTEM_TIME AS OF 0")
    assert(mixed.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "ttl FOR SYSTEM_TIME AS OF 0")))
  }
}
