package graft

import org.apache.spark.sql.functions._

/** Streaming temporal filter (reference: `WHERE ts > now() - interval`,
  * src/stream/src/executor/now.rs + dynamic_filter.rs and the planner's
  * "Push down filter with now" rule, logical_optimization.rs:275-285):
  * a continuously maintained MV whose rows AGE OUT as the Now bound
  * advances — reads are horizon-exact at any instant, and barrier
  * drains (FLUSH) evict aged rows as real delete epochs that retract
  * through downstream chained MVs.
  */
class TemporalFilterMvSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(msAgo: Long): java.sql.Timestamp =
    new java.sql.Timestamp(System.currentTimeMillis() - msAgo)

  test("temporal-filter MV hides aged rows at read time and filters inserts") {
    val e = new Engine(spark, tmpDir("tmpf"))
    e.execute("CREATE TABLE tev (k BIGINT PRIMARY KEY, tag VARCHAR, ts TIMESTAMP)")
    // one row far beyond the horizon, one fresh
    Seq((1L, "old"), (2L, "new")).toDF("k", "tag")
      .withColumn("ts", when(col("tag") === "old",
        lit(ts(2 * 3600 * 1000L))).otherwise(lit(ts(0L))))
      .createOrReplaceTempView("tev_seed")
    e.execute("INSERT INTO tev SELECT k, tag, ts FROM tev_seed")
    e.execute("FLUSH")

    e.execute("""CREATE MATERIALIZED VIEW recent (PRIMARY KEY (k)) AS
      |SELECT k, tag, ts FROM tev WHERE ts > now() - INTERVAL '1' HOUR""".stripMargin)
    e.execute("FLUSH")

    // backfill applied the horizon: only the fresh row is visible
    assert(e.table("recent").select("tag").as[String].collect().toSeq ==
      Seq("new"))

    // an insert beyond the horizon is filtered at merge time
    Seq((3L, "stale")).toDF("k", "tag")
      .withColumn("ts", lit(ts(3 * 3600 * 1000L)))
      .createOrReplaceTempView("tev_seed2")
    e.execute("INSERT INTO tev SELECT k, tag, ts FROM tev_seed2")
    e.execute("FLUSH")
    assert(e.table("recent").select("tag").as[String].collect().toSeq ==
      Seq("new"))
  }

  test("aging rows evict as delete epochs and retract through a chained aggregate") {
    val e = new Engine(spark, tmpDir("tmpf-chain"))
    e.execute("CREATE TABLE cev (k BIGINT PRIMARY KEY, tag VARCHAR, ts TIMESTAMP)")
    Seq((1L, "a", 0L), (2L, "a", 50L * 60 * 1000), (3L, "b", 10L))
      .toDF("k", "tag", "ago_ms")
      .withColumn("ts", expr("timestampadd(MILLISECOND, -ago_ms, now())"))
      .drop("ago_ms")
      .createOrReplaceTempView("cev_seed")
    e.execute("INSERT INTO cev SELECT k, tag, ts FROM cev_seed")
    e.execute("FLUSH")

    e.execute("""CREATE MATERIALIZED VIEW crecent (PRIMARY KEY (k)) AS
      |SELECT k, tag, ts FROM cev WHERE ts > now() - INTERVAL '1' HOUR""".stripMargin)
    e.execute("""CREATE MATERIALIZED VIEW ccnt (PRIMARY KEY (tag)) AS
      |SELECT tag, count(*) AS n FROM crecent GROUP BY tag""".stripMargin)
    e.execute("FLUSH")
    assert(e.table("ccnt").orderBy("tag").as[(String, Long)].collect().toSeq ==
      Seq(("a", 2L), ("b", 1L)))

    // advance the temporal clock 30 minutes: row 2 (50 min old) crosses
    // the 1h horizon; FLUSH evicts it as a delete epoch and the chained
    // aggregate retracts its count
    e.temporalNowOverrideMs = Some(System.currentTimeMillis() + 30L * 60 * 1000)
    e.execute("FLUSH")
    assert(e.table("crecent").select("k").as[Long].collect().toSet == Set(1L, 3L))
    assert(e.table("ccnt").orderBy("tag").as[(String, Long)].collect().toSeq ==
      Seq(("a", 1L), ("b", 1L)))

    // advancing past everything empties the MV and the aggregate
    e.temporalNowOverrideMs = Some(System.currentTimeMillis() + 2L * 3600 * 1000)
    e.execute("FLUSH")
    assert(e.table("crecent").count() == 0)
    assert(e.table("ccnt").count() == 0)
  }

  test("source-fed streaming MV with a now()-horizon evicts like the chained form") {
    val e = new Engine(spark, tmpDir("tmpf-src"))
    val srcDir = tmpDir("tmpf-src-data")
    Seq((1L, 0L), (2L, 50L * 60 * 1000)).toDF("k", "ago_ms")
      .withColumn("ts", expr("timestampadd(MILLISECOND, -ago_ms, now())"))
      .drop("ago_ms")
      .write.mode("append").parquet(srcDir)
    e.execute(s"CREATE SOURCE tsrc WITH (path = '$srcDir', format = 'parquet')")
    e.execute("""CREATE MATERIALIZED VIEW srecent (PRIMARY KEY (k)) AS
      |SELECT k, ts FROM tsrc WHERE ts > now() - INTERVAL '1' HOUR""".stripMargin)
    e.execute("FLUSH")
    assert(e.table("srecent").select("k").as[Long].collect().toSet == Set(1L, 2L))

    // the 50-min-old row crosses the horizon as the clock advances
    e.temporalNowOverrideMs = Some(System.currentTimeMillis() + 30L * 60 * 1000)
    e.execute("FLUSH")
    assert(e.table("srecent").select("k").as[Long].collect().toSet == Set(1L))
    e.streamingJob("srecent").foreach(_.stop())
  }

  test("fuzz: random DML + clock advances keep the temporal chain consistent") {
    val rnd = new scala.util.Random(4242)
    val e = new Engine(spark, tmpDir("tmpf-fuzz"))
    e.execute("CREATE TABLE ft (k BIGINT PRIMARY KEY, tag VARCHAR, ts TIMESTAMP)")
    e.execute("""CREATE MATERIALIZED VIEW frec (PRIMARY KEY (k)) AS
      |SELECT k, tag, ts FROM ft WHERE ts > now() - INTERVAL '1' HOUR""".stripMargin)
    e.execute("""CREATE MATERIALIZED VIEW fcnt (PRIMARY KEY (tag)) AS
      |SELECT tag, count(*) AS n FROM frec GROUP BY tag""".stripMargin)

    val hourMs = 3600L * 1000
    var clock = System.currentTimeMillis() + 10 * hourMs // own the timeline
    e.temporalNowOverrideMs = Some(clock)
    var nextK = 1L
    val live = scala.collection.mutable.Map[Long, (String, Long)]() // k -> (tag, tsMs)
    def tsLit(ms: Long) = s"CAST('${new java.sql.Timestamp(ms)}' AS TIMESTAMP)"

    for (step <- 1 to 22) {
      rnd.nextInt(4) match {
        case 0 => // insert, sometimes already beyond the horizon
          val tag = s"t${rnd.nextInt(3)}"
          val ts = clock - rnd.nextInt((1.5 * hourMs).toInt)
          e.execute(s"INSERT INTO ft VALUES ($nextK, '$tag', ${tsLit(ts)})")
          live(nextK) = (tag, ts); nextK += 1
        case 1 if live.nonEmpty => // delete a random key
          val k = live.keys.toSeq(rnd.nextInt(live.size))
          e.execute(s"DELETE FROM ft WHERE k = $k")
          live.remove(k)
        case 2 if live.nonEmpty => // move a row's event time (in OR out)
          val k = live.keys.toSeq(rnd.nextInt(live.size))
          val ts = clock - rnd.nextInt((1.5 * hourMs).toInt)
          e.execute(s"UPDATE ft SET ts = ${tsLit(ts)} WHERE k = $k")
          live(k) = (live(k)._1, ts)
        case _ => // time passes: rows age across the horizon
          clock += rnd.nextInt((0.6 * hourMs).toInt)
          e.temporalNowOverrideMs = Some(clock)
      }
      e.execute("FLUSH")
      val horizon = clock - hourMs
      val expected = live.toSeq.collect {
        case (k, (tag, ts)) if ts > horizon => (k, tag)
      }.sortBy(_._1)
      val got = e.table("frec").select("k", "tag")
        .as[(Long, String)].collect().toSeq.sortBy(_._1)
      assert(got == expected, s"step $step: frec mismatch")
      val expCnt = expected.groupBy(_._2).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val gotCnt = e.table("fcnt").as[(String, Long)].collect().toSeq.sortBy(_._1)
      assert(gotCnt == expCnt, s"step $step: fcnt mismatch")
    }
    Seq("fcnt", "frec").foreach(n => e.streamingJob(n).foreach(_.stop()))
  }

  test("temporal horizon survives restart (re-derived from the defining query)") {
    val dir = tmpDir("tmpf-restart")
    val e1 = new Engine(spark, dir)
    e1.execute("CREATE TABLE rev (k BIGINT PRIMARY KEY, ts TIMESTAMP)")
    Seq(1L).toDF("k").withColumn("ts", lit(ts(0L)))
      .createOrReplaceTempView("rev_seed")
    e1.execute("INSERT INTO rev SELECT k, ts FROM rev_seed")
    e1.execute("FLUSH")
    e1.execute("""CREATE MATERIALIZED VIEW rrecent (PRIMARY KEY (k)) AS
      |SELECT k, ts FROM rev WHERE ts > now() - INTERVAL '1' HOUR""".stripMargin)
    e1.execute("FLUSH")
    assert(e1.table("rrecent").count() == 1)
    e1.streamingJob("rrecent").foreach(_.stop())

    val e2 = new Engine(spark, dir)
    // recovered engine still evicts on the recovered horizon
    e2.temporalNowOverrideMs = Some(System.currentTimeMillis() + 2L * 3600 * 1000)
    e2.execute("FLUSH")
    assert(e2.table("rrecent").count() == 0)
    e2.streamingJob("rrecent").foreach(_.stop())
  }
}
