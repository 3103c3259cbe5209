package graft

import org.apache.spark.sql.functions._

/** The SQL entry-point surface: a reference user's first statements —
  * CREATE SOURCE, streaming CREATE MATERIALIZED VIEW, WITH RECURSIVE —
  * executed as SQL text through [[Engine.execute]].
  */
class SqlFrontendSpec extends SparkSpecBase {
  import spark.implicits._

  test("CREATE SOURCE + streaming CREATE MATERIALIZED VIEW from SQL text") {
    val e = new Engine(spark, tmpDir("sqlmv"))
    val srcDir = tmpDir("sqlmv-src")
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "tag", "v")
      .write.mode("append").parquet(srcDir)

    e.execute(s"CREATE SOURCE evsrc WITH (path = '$srcDir', format = 'parquet')")
    val out = e.execute(
      """CREATE MATERIALIZED VIEW ev_mv (PRIMARY KEY (id)) AS
        |SELECT id, tag, v * 10 AS v10 FROM evsrc""".stripMargin)
    assert(out.head().getString(0).contains("streaming"))

    val job = e.streamingJob("ev_mv").get
    job.processAllAvailable()
    assert(e.table("ev_mv").orderBy("id").as[(Long, String, Double)]
      .collect().toSeq == Seq((1L, "a", 100.0), (2L, "b", 200.0)))

    // new files arriving at the source flow through: incremental upkeep
    Seq((2L, "b2", 25.0), (3L, "c", 30.0)).toDF("id", "tag", "v")
      .write.mode("append").parquet(srcDir)
    job.processAllAvailable()
    assert(e.table("ev_mv").orderBy("id").as[(Long, String, Double)]
      .collect().toSeq ==
      Seq((1L, "a", 100.0), (2L, "b2", 250.0), (3L, "c", 300.0)))

    e.execute("DROP MATERIALIZED VIEW ev_mv")
    assert(e.streamingJob("ev_mv").isEmpty || !job.isActive)
  }

  test("CREATE CONNECTION objects splice into sources and survive restart") {
    val wh = tmpDir("connobj")
    val e = new Engine(spark, wh)
    val srcDir = tmpDir("connobj-src")
    Seq((1L, 5.0), (2L, 7.0)).toDF("id", "v")
      .write.mode("append").parquet(srcDir)

    e.execute(s"CREATE CONNECTION filestore WITH " +
      s"(type = 'file', path = '$srcDir', format = 'parquet')")
    // duplicate create errors; IF NOT EXISTS is idempotent
    intercept[Exception] {
      e.execute("CREATE CONNECTION filestore WITH (type = 'file')")
    }
    e.execute("CREATE CONNECTION IF NOT EXISTS filestore WITH (type = 'x')")
    // listing shows name/type/key names, never property values
    val listed = e.execute("SHOW CONNECTIONS").collect()
    assert(listed.map(_.getString(0)).toSeq == Seq("filestore"))
    assert(listed.head.getString(1) == "file")
    assert(!listed.head.getString(2).contains(srcDir))

    // the source's WITH clause pulls path/format from the connection;
    // type validates against the connector
    e.execute("CREATE SOURCE conn_src WITH " +
      "(connector = 'file', connection = filestore)")
    val mv = e.execute(
      """CREATE MATERIALIZED VIEW conn_mv (PRIMARY KEY (id)) AS
        |SELECT id, v * 2 AS v2 FROM conn_src""".stripMargin)
    assert(mv.head().getString(0).contains("streaming"))
    e.streamingJob("conn_mv").get.processAllAvailable()
    assert(e.table("conn_mv").orderBy("id").as[(Long, Double)]
      .collect().toSeq == Seq((1L, 10.0), (2L, 14.0)))
    intercept[Exception] {
      e.execute("CREATE SOURCE bad_src WITH " +
        "(connector = 'kafka', connection = filestore)")
    }
    // rw_catalog surfaces the object
    assert(e.execute(
      "SELECT name, type FROM rw_catalog.rw_connections").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("filestore", "file")))

    // a fresh engine over the same warehouse recovers the object
    e.streamingJob("conn_mv").foreach(_.stop())
    val e2 = new Engine(spark.newSession(), wh)
    assert(e2.execute("SHOW CONNECTIONS").collect()
      .map(_.getString(0)).toSeq == Seq("filestore"))
    e2.execute("DROP CONNECTION filestore")
    intercept[Exception] { e2.execute("DROP CONNECTION filestore") }
    e2.execute("DROP CONNECTION IF EXISTS filestore")
    assert(e2.execute("SHOW CONNECTIONS").isEmpty)
  }

  test("ALTER SOURCE SET SOURCE_RATE_LIMIT meters admission per micro-batch") {
    val e = new Engine(spark, tmpDir("ratelim"))
    val srcDir = tmpDir("ratelim-src")
    // three one-file appends — the metering unit is files/trigger
    (1 to 3).foreach { i =>
      Seq((i.toLong, i * 1.0)).toDF("id", "v").coalesce(1)
        .write.mode("append").parquet(srcDir)
    }
    e.execute(s"CREATE SOURCE rl_src WITH (path = '$srcDir', format = 'parquet')")
    e.execute("ALTER SOURCE rl_src SET SOURCE_RATE_LIMIT TO 1")
    e.execute(
      """CREATE MATERIALIZED VIEW rl_mv (PRIMARY KEY (id)) AS
        |SELECT id, v FROM rl_src""".stripMargin)
    val job = e.streamingJob("rl_mv").get
    job.processAllAvailable()
    // all rows arrive, but across >=3 micro-batches (1 file/trigger)
    assert(e.table("rl_mv").count() == 3)
    assert(job.recentProgress.count(_.numInputRows > 0) >= 3,
      s"expected >=3 metered batches, got " +
        s"${job.recentProgress.map(_.numInputRows).mkString(",")}")
    // the limit survives in the re-issuable DDL and DEFAULT removes it
    assert(e.execute("SHOW CREATE SOURCE rl_src").head().getString(1)
      .toLowerCase.contains("source_rate_limit"))
    e.execute("ALTER SOURCE rl_src SET SOURCE_RATE_LIMIT TO DEFAULT")
    assert(!e.execute("SHOW CREATE SOURCE rl_src").head().getString(1)
      .toLowerCase.contains("source_rate_limit"))
    // table/MV forms fence loudly — batch-atomic DML has no admission
    intercept[Exception] {
      e.execute("ALTER TABLE rl_x SET STREAMING_RATE_LIMIT TO 5")
    }
    job.stop()
  }

  test("ALTER SOURCE ADD COLUMN evolves a declared-column source") {
    val e = new Engine(spark, tmpDir("srcevolve"))
    val srcDir = tmpDir("srcevolve-src")
    Seq((1L, 2.0)).toDF("a", "b").coalesce(1)
      .write.mode("append").parquet(srcDir)
    e.execute(s"CREATE SOURCE ev_src (a BIGINT, b DOUBLE) " +
      s"WITH (path = '$srcDir', format = 'parquet')")
    e.execute("ALTER SOURCE ev_src ADD COLUMN c VARCHAR")
    assert(e.execute("SHOW CREATE SOURCE ev_src").head().getString(1)
      .contains("c VARCHAR"))
    // a fresh MV over the evolved source sees the new (absent → null)
    // column without touching the files
    e.execute(
      """CREATE MATERIALIZED VIEW ev_mv2 (PRIMARY KEY (a)) AS
        |SELECT a, b, c FROM ev_src""".stripMargin)
    e.streamingJob("ev_mv2").get.processAllAvailable()
    val r = e.table("ev_mv2").head()
    assert(r.getLong(0) == 1L && r.getDouble(1) == 2.0 && r.isNullAt(2))
    intercept[Exception] {
      e.execute("ALTER SOURCE ev_src ADD COLUMN c VARCHAR") // duplicate
    }
    // inferred-schema sources have nothing to evolve engine-side
    e.execute(s"CREATE SOURCE inf_src WITH (path = '$srcDir', format = 'parquet')")
    intercept[Exception] {
      e.execute("ALTER SOURCE inf_src ADD COLUMN x INT")
    }
    e.streamingJob("ev_mv2").foreach(_.stop())
  }

  test("CREATE SOURCE parses WATERMARK FOR ... AS ... - INTERVAL DDL") {
    val e = new Engine(spark, tmpDir("sqlwm"))
    val srcDir = tmpDir("sqlwm-src")
    Seq(("2024-01-01 00:00:00", 1L)).toDF("ts_s", "n")
      .select(col("ts_s").cast("timestamp").as("ts"), col("n"))
      .write.mode("append").parquet(srcDir)

    e.execute(
      s"""CREATE SOURCE wmsrc (
         |  WATERMARK FOR ts AS ts - INTERVAL '5' MINUTE
         |) WITH (path = '$srcDir')""".stripMargin)
    val df = spark.table("wmsrc")
    assert(df.isStreaming)
    // the watermark node must be in the analyzed plan
    assert(df.queryExecution.analyzed.toString.contains("EventTimeWatermark"),
      df.queryExecution.analyzed.toString)
  }

  test("CREATE MATERIALIZED VIEW over a batch table stays batch") {
    val e = new Engine(spark, tmpDir("sqlbatch"))
    e.attachTables("/root/testdata/sf0.001")
    val out = e.execute(
      """CREATE MATERIALIZED VIEW reg_cnt (PRIMARY KEY (r_regionkey)) AS
        |SELECT r_regionkey, count(*) AS n FROM region GROUP BY r_regionkey""".stripMargin)
    assert(out.count() == 5)
    assert(e.streamingJob("reg_cnt").isEmpty)
  }

  test("CREATE MATERIALIZED VIEW without PRIMARY KEY is rejected") {
    val e = new Engine(spark, tmpDir("sqlnopk"))
    e.attachTables("/root/testdata/sf0.001")
    val ex = intercept[IllegalArgumentException] {
      e.execute("CREATE MATERIALIZED VIEW no_pk AS SELECT * FROM region")
    }
    assert(ex.getMessage.contains("PRIMARY KEY"))
  }

  test("WITH RECURSIVE executes through the fixpoint operator") {
    val e = new Engine(spark, tmpDir("sqlrec"))
    val got = e.execute(
      """WITH RECURSIVE t(n) AS (
        |  SELECT 1 AS n
        |  UNION
        |  SELECT n + 1 FROM t WHERE n < 5
        |) SELECT n FROM t ORDER BY n""".stripMargin)
      .as[Int].collect().toSeq
    assert(got == Seq(1, 2, 3, 4, 5))
  }

  test("WITH RECURSIVE mixes plain and recursive CTEs") {
    val e = new Engine(spark, tmpDir("sqlrec2"))
    e.attachTables("/root/testdata/sf0.001")
    val got = e.execute(
      """WITH RECURSIVE seed AS (
        |  SELECT min(r_regionkey) AS k FROM region
        |), walk(k) AS (
        |  SELECT k FROM seed
        |  UNION
        |  SELECT k + 2 FROM walk WHERE k < 4
        |) SELECT k FROM walk ORDER BY k""".stripMargin)
      .as[Int].collect().toSeq
    assert(got == Seq(0, 2, 4))
  }

  test("CREATE SINK streams the MV changelog as encoded payloads") {
    val e = new Engine(spark, tmpDir("sqlsink"))
    val srcDir = tmpDir("sqlsink-src")
    val outDir = tmpDir("sqlsink-out")
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.mode("append").parquet(srcDir)

    e.execute(s"CREATE SOURCE snksrc WITH (path = '$srcDir')")
    e.execute(
      """CREATE MATERIALIZED VIEW snk_mv (PRIMARY KEY (id)) AS
        |SELECT id, v * 2 AS v2 FROM snksrc""".stripMargin)
    e.streamingJob("snk_mv").get.processAllAvailable()

    e.execute(
      s"CREATE SINK snk FROM snk_mv WITH (path = '$outDir', format = 'debezium')")
    e.streamingJob("snk").get.processAllAvailable()

    val lines = spark.read.text(outDir).as[String].collect().toSeq
    assert(lines.size == 2)
    assert(lines.forall(l => l.contains(""""op":"c"""") && l.contains(""""after":""")))
    assert(lines.exists(_.contains(""""v2":20.0""")))

    // new upstream data flows source → MV → sink
    Seq((3L, 30.0)).toDF("id", "v").write.mode("append").parquet(srcDir)
    e.streamingJob("snk_mv").get.processAllAvailable()
    e.streamingJob("snk").get.processAllAvailable()
    assert(spark.read.text(outDir).as[String].collect()
      .exists(_.contains(""""v2":60.0""")))

    e.execute("DROP SINK snk")
    assert(e.streamingJob("snk").isEmpty)
  }

  test("CREATE SOURCE parses the kafka connector WITH clause") {
    val d = SqlFrontend.parseCreateSource(
      """CREATE SOURCE bids (
        |  WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
        |) WITH (
        |  connector = 'kafka',
        |  topic = 'bids_topic',
        |  properties.bootstrap.server = 'broker:9092',
        |  scan.startup.mode = 'earliest')""".stripMargin).get
    assert(d.connector == "kafka" && d.path == "bids_topic" &&
      d.options("properties.bootstrap.server") == "broker:9092" &&
      d.watermarkCol.contains("ts"))
    // planSource builds the kafka reader (no broker → load() would fail
    // at resolution; the parse→plan wiring is what this checks)
    intercept[Throwable] {
      SqlFrontend.planSource(spark, d).collect()
    }
  }

  test("SHOW MATERIALIZED VIEWS lists registered MVs") {
    val e = new Engine(spark, tmpDir("sqlshow"))
    e.attachTables("/root/testdata/sf0.001")
    e.execute(
      """CREATE MATERIALIZED VIEW show_me (PRIMARY KEY (r_regionkey)) AS
        |SELECT r_regionkey FROM region""".stripMargin)
    val names = e.execute("SHOW MATERIALIZED VIEWS").as[String].collect()
    assert(names.contains("show_me"))
  }

  test("EMIT ON WINDOW CLOSE: MV holds only watermark-finalized windows") {
    val e = new Engine(spark, tmpDir("sqleowc"))
    val srcDir = tmpDir("sqleowc-src")
    // two files → two micro-batches: batch 1 sets the watermark that
    // finalizes its windows when batch 2 is processed; batch 2's own
    // windows stay open (nothing ever advances the watermark past them)
    Seq(("2024-01-01 00:10:00", 1L), ("2024-01-01 00:40:00", 2L))
      .toDF("ts_s", "n")
      .select(col("ts_s").cast("timestamp").as("ts"), col("n"))
      .write.parquet(s"$srcDir/f1")
    e.execute(
      s"""CREATE SOURCE eowc_src (
         |  WATERMARK FOR ts AS ts - INTERVAL '1' MINUTE
         |) WITH (path = '$srcDir/f1')""".stripMargin)
    e.execute(
      """CREATE MATERIALIZED VIEW eowc_mv (PRIMARY KEY (w_start)) AS
        |SELECT window.start AS w_start, count(*) AS n
        |FROM eowc_src GROUP BY window(ts, '30 minutes')
        |EMIT ON WINDOW CLOSE""".stripMargin)
    val job = e.streamingJob("eowc_mv").get
    job.processAllAvailable()
    // watermark ≈ 00:39 → only the 00:00–00:30 window is closed
    Seq(("2024-01-01 02:00:00", 3L)).toDF("ts_s", "n")
      .select(col("ts_s").cast("timestamp").as("ts"), col("n"))
      .write.mode("append").parquet(s"$srcDir/f1")
    job.processAllAvailable()
    job.stop()
    val got = e.table("eowc_mv").orderBy("w_start")
      .select(col("w_start").cast("string"), col("n"))
      .as[(String, Long)].collect().toSeq
    // finalized: the 00:00 window (n=1) and, once 02:00 advanced the
    // watermark, the 00:30 window (n=1); the 02:00 window never closes
    assert(got == Seq(("2024-01-01 00:00:00", 1L), ("2024-01-01 00:30:00", 1L)))
  }

  test("EMIT ON WINDOW CLOSE over the TUMBLE TVF (reference windowed-MV syntax)") {
    val e = new Engine(spark, tmpDir("eowctvf"))
    val srcDir = tmpDir("eowctvf-src")
    Seq(("2024-01-01 00:10:00", 1L), ("2024-01-01 00:40:00", 2L))
      .toDF("ts_s", "n")
      .select(col("ts_s").cast("timestamp").as("ts"), col("n"))
      .write.parquet(s"$srcDir/f1")
    e.execute(
      s"""CREATE SOURCE eowct_src (
         |  WATERMARK FOR ts AS ts - INTERVAL '1' MINUTE
         |) WITH (path = '$srcDir/f1')""".stripMargin)
    e.execute(
      """CREATE MATERIALIZED VIEW eowct_mv (PRIMARY KEY (window_start)) AS
        |SELECT window_start, count(*) AS n
        |FROM TUMBLE(eowct_src, ts, INTERVAL '30 minutes')
        |GROUP BY window_start
        |EMIT ON WINDOW CLOSE""".stripMargin)
    val job = e.streamingJob("eowct_mv").get
    job.processAllAvailable()
    Seq(("2024-01-01 02:00:00", 3L)).toDF("ts_s", "n")
      .select(col("ts_s").cast("timestamp").as("ts"), col("n"))
      .write.mode("append").parquet(s"$srcDir/f1")
    job.processAllAvailable()
    job.stop()
    val got = e.table("eowct_mv").orderBy("window_start")
      .select(col("window_start").cast("string"), col("n"))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("2024-01-01 00:00:00", 1L), ("2024-01-01 00:30:00", 1L)))
  }

  test("DML statements route to changelog-publishing operators on MVs") {
    val e = new Engine(spark, tmpDir("sqldml"))
    e.attachTables("/root/testdata/sf0.001")
    e.execute(
      """CREATE MATERIALIZED VIEW dml_t (PRIMARY KEY (r_regionkey)) AS
        |SELECT r_regionkey, r_name FROM region""".stripMargin)
    e.execute("INSERT INTO dml_t VALUES (77, 'NEW_REGION'), (78, 'OTHER')")
    e.execute("UPDATE dml_t SET r_name = upper(r_name) WHERE r_regionkey = 77")
    e.execute("DELETE FROM dml_t WHERE r_regionkey = 78")
    val got = e.table("dml_t").where(col("r_regionkey") >= 77)
      .orderBy("r_regionkey").as[(Int, String)].collect().toSeq
    assert(got == Seq((77, "NEW_REGION")))
    assert(e.table("dml_t").count() == 6) // 5 regions + 1 inserted

    // INSERT INTO ... SELECT
    e.execute(
      "INSERT INTO dml_t SELECT r_regionkey + 100, r_name FROM region WHERE r_regionkey < 2")
    assert(e.table("dml_t").count() == 8)
    // explicit column list: unnamed columns null-pad
    e.execute("INSERT INTO dml_t (r_regionkey) VALUES (200)")
    assert(e.table("dml_t").where(col("r_regionkey") === 200)
      .select("r_name").head().isNullAt(0))
    // DML naming a non-MV table falls through to Spark SQL (and fails
    // there for a read-only view — proving the route, not swallowing it)
    intercept[Exception] { e.execute("DELETE FROM region WHERE r_regionkey = 0") }
  }

  test("MVs over DML tables maintain incrementally (reference create-MV-over-table)") {
    // the reference's core behavior: CREATE TABLE → CREATE MV over it →
    // every INSERT/UPDATE/DELETE advances the MV without REFRESH.
    // Tables publish DML as changelog epochs (Dml.mergeEpoch), so the
    // MV-on-MV chain machinery subscribes to them like any upstream MV.
    val wh = tmpDir("tblchain")
    val e = new Engine(spark, wh)
    e.execute("CREATE TABLE inv (id BIGINT PRIMARY KEY, cat STRING, qty BIGINT)")
    // per-row chain + aggregate chain, both over the FRESH (never
    // written) table — subscription must work before the first DML
    e.execute(
      """CREATE MATERIALIZED VIEW inv_big (PRIMARY KEY (id)) AS
        |SELECT id, cat, qty FROM inv WHERE qty >= 10""".stripMargin)
    e.execute(
      """CREATE MATERIALIZED VIEW inv_by_cat (PRIMARY KEY (cat)) AS
        |SELECT cat, count(*) AS n, sum(qty) AS total FROM inv GROUP BY cat""".stripMargin)
    assert(e.streamingJob("inv_big").nonEmpty, "per-row MV over a table must chain")
    assert(e.streamingJob("inv_by_cat").nonEmpty, "agg MV over a table must chain")

    e.execute("INSERT INTO inv VALUES (1, 'a', 5), (2, 'a', 20), (3, 'b', 30)")
    e.execute("FLUSH")
    assert(e.table("inv_big").orderBy("id").as[(Long, String, Long)]
      .collect().toSeq == Seq((2L, "a", 20L), (3L, "b", 30L)))
    assert(e.table("inv_by_cat").orderBy("cat").as[(String, Long, Long)]
      .collect().toSeq == Seq(("a", 2L, 25L), ("b", 1L, 30L)))

    // UPDATE moving a row across BOTH the filter and the group — the
    // U- before-image must retract id 1 from group 'a'
    e.execute("UPDATE inv SET cat = 'b', qty = 50 WHERE id = 1")
    e.execute("FLUSH")
    assert(e.table("inv_big").orderBy("id").as[(Long, String, Long)]
      .collect().toSeq == Seq((1L, "b", 50L), (2L, "a", 20L), (3L, "b", 30L)))
    assert(e.table("inv_by_cat").orderBy("cat").as[(String, Long, Long)]
      .collect().toSeq == Seq(("a", 1L, 20L), ("b", 2L, 80L)))

    e.execute("DELETE FROM inv WHERE id = 3")
    e.execute("FLUSH")
    assert(e.table("inv_by_cat").orderBy("cat").as[(String, Long, Long)]
      .collect().toSeq == Seq(("a", 1L, 20L), ("b", 1L, 50L)))

    // restart: chains over tables must recover and keep absorbing DML
    Seq("inv_big", "inv_by_cat").foreach(n => e.streamingJob(n).foreach(_.stop()))
    val e2 = new Engine(spark.newSession(), wh)
    assert(e2.recoveryPending.isEmpty, s"pending: ${e2.recoveryPending}")
    e2.execute("INSERT INTO inv VALUES (4, 'c', 12)")
    e2.execute("FLUSH")
    assert(e2.table("inv_big").count() == 3)
    assert(e2.table("inv_by_cat").orderBy("cat").as[(String, Long, Long)]
      .collect().toSeq == Seq(("a", 1L, 20L), ("b", 1L, 50L), ("c", 1L, 12L)))
    Seq("inv_big", "inv_by_cat").foreach(n => e2.streamingJob(n).foreach(_.stop()))
  }

  test("delta-join MV over two DML tables maintains incrementally") {
    val e = new Engine(spark, tmpDir("tbljoin"))
    e.execute("CREATE TABLE ordr (oid BIGINT PRIMARY KEY, ocid BIGINT, amt BIGINT)")
    e.execute("CREATE TABLE cust (cid BIGINT PRIMARY KEY, nm STRING)")
    e.execute(
      """CREATE MATERIALIZED VIEW ord_cust (PRIMARY KEY (oid, cid)) AS
        |SELECT oid, cid, amt, nm FROM ordr JOIN cust ON ordr.ocid = cust.cid""".stripMargin)
    assert(e.streamingJob("ord_cust").nonEmpty, "join MV over tables must chain")
    e.execute("INSERT INTO cust VALUES (10, 'ann'), (20, 'bob')")
    e.execute("INSERT INTO ordr VALUES (1, 10, 100), (2, 20, 200), (3, 30, 300)")
    e.execute("FLUSH")
    assert(e.table("ord_cust").orderBy("oid").as[(Long, Long, Long, String)]
      .collect().toSeq == Seq((1L, 10L, 100L, "ann"), (2L, 20L, 200L, "bob")))
    // late-arriving dimension row joins order 3; customer rename flows
    e.execute("INSERT INTO cust VALUES (30, 'cyd')")
    e.execute("UPDATE cust SET nm = 'ANN' WHERE cid = 10")
    e.execute("FLUSH")
    assert(e.table("ord_cust").orderBy("oid").as[(Long, Long, Long, String)]
      .collect().toSeq == Seq(
        (1L, 10L, 100L, "ANN"), (2L, 20L, 200L, "bob"), (3L, 30L, 300L, "cyd")))
    e.execute("DELETE FROM ordr WHERE oid = 2")
    e.execute("FLUSH")
    assert(e.table("ord_cust").as[(Long, Long, Long, String)].collect().toSeq
      .sortBy(_._1) == Seq((1L, 10L, 100L, "ANN"), (3L, 30L, 300L, "cyd")))
    e.streamingJob("ord_cust").foreach(_.stop())
  }

  test("FLUSH blocks until streaming MVs absorb all available input") {
    val e = new Engine(spark, tmpDir("sqlflush"))
    val srcDir = tmpDir("sqlflush-src")
    Seq((1L, 1.0)).toDF("id", "v").write.mode("append").parquet(srcDir)
    e.execute(s"CREATE SOURCE fsrc WITH (path = '$srcDir')")
    e.execute(
      """CREATE MATERIALIZED VIEW fmv (PRIMARY KEY (id)) AS
        |SELECT id, v FROM fsrc""".stripMargin)
    Seq((2L, 2.0)).toDF("id", "v").write.mode("append").parquet(srcDir)
    e.execute("FLUSH")
    assert(e.table("fmv").count() == 2)
  }

  test("CREATE SOURCE ... FORMAT DEBEZIUM ENCODE JSON decodes payload lines") {
    val e = new Engine(spark, tmpDir("sqlfmt"))
    val srcDir = tmpDir("sqlfmt-src")
    // two files → two ordered micro-batches (within one batch, payload
    // lines carry no transport sequence — Kafka supplies one via offset)
    Seq(
      """{"before": null, "after": {"id": 1, "v": "a"}, "op": "c"}""",
      """{"before": null, "after": {"id": 2, "v": "b"}, "op": "c"}""")
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute(
      s"""CREATE SOURCE dbz_src (id BIGINT, v VARCHAR)
         |WITH (path = '$srcDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute(
      """CREATE MATERIALIZED VIEW dbz_mv (PRIMARY KEY (id)) AS
        |SELECT * FROM dbz_src""".stripMargin)
    e.execute("FLUSH")
    Seq("""{"before": {"id": 2, "v": "b"}, "after": null, "op": "d"}""")
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute("FLUSH")
    assert(e.table("dbz_mv").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a")))
  }

  test("SHOW SOURCES / SHOW SINKS list registered objects") {
    val e = new Engine(spark, tmpDir("sqlshow2"))
    val srcDir = tmpDir("sqlshow2-src")
    Seq((1L, 1.0)).toDF("id", "v").write.mode("append").parquet(srcDir)
    e.execute(s"CREATE SOURCE listed_src WITH (path = '$srcDir')")
    assert(e.execute("SHOW SOURCES").as[String].collect().toSeq ==
      Seq("listed_src"))
    e.execute(
      """CREATE MATERIALIZED VIEW listed_mv (PRIMARY KEY (id)) AS
        |SELECT id, v FROM listed_src""".stripMargin)
    e.streamingJob("listed_mv").get.processAllAvailable()
    val outDir = tmpDir("sqlshow2-out")
    e.execute(s"CREATE SINK listed_snk FROM listed_mv WITH (path = '$outDir')")
    assert(e.execute("SHOW SINKS").as[String].collect().toSeq ==
      Seq("listed_snk"))
    e.execute("DROP SINK listed_snk")
    assert(e.execute("SHOW SINKS").isEmpty)
  }

  test("CREATE TABLE + INSERT + SELECT + UPDATE/DELETE lifecycle from SQL") {
    val e = new Engine(spark, tmpDir("sqltable"))
    e.execute(
      """CREATE TABLE users (
        |  id BIGINT PRIMARY KEY,
        |  name VARCHAR,
        |  score DOUBLE)""".stripMargin)

    // fresh table: empty but described with the declared schema
    assert(e.table("users").isEmpty)
    // DESCRIBE = column rows + the reference's summary rows
    val desc = e.execute("DESCRIBE users").as[(String, String)]
      .collect().take(3).toMap
    assert(desc == Map("id" -> "bigint", "name" -> "string", "score" -> "double"))
    assert(e.execute("DESCRIBE users").as[(String, String)].collect()
      .contains(("primary key", "id")))
    assert(e.execute("SHOW COLUMNS FROM users").as[(String, String)]
      .collect().take(3).toMap == desc)
    assert(e.execute("SHOW TABLES").as[String].collect().toSeq == Seq("users"))

    // INT literals align to the declared BIGINT column
    e.execute("INSERT INTO users VALUES (1, 'ann', 3.5), (2, 'bob', 1.0)")
    e.execute("INSERT INTO users (id, name) VALUES (3, 'cid')")
    assert(e.table("users").orderBy("id")
      .as[(Long, String, Option[Double])].collect().toSeq ==
      Seq((1L, "ann", Some(3.5)), (2L, "bob", Some(1.0)), (3L, "cid", None)))

    // PK upsert: re-inserting id=2 replaces the row
    e.execute("INSERT INTO users VALUES (2, 'bob2', 2.0)")
    e.execute("UPDATE users SET score = score + 1 WHERE id = 1")
    e.execute("DELETE FROM users WHERE id = 3")
    assert(e.table("users").orderBy("id")
      .as[(Long, String, Option[Double])].collect().toSeq ==
      Seq((1L, "ann", Some(4.5)), (2L, "bob2", Some(2.0))))

    // constraint-table PK form also parses
    e.execute(
      "CREATE TABLE kv (k VARCHAR, v BIGINT, PRIMARY KEY (k))")
    e.execute("INSERT INTO kv VALUES ('a', 1)")
    assert(e.table("kv").as[(String, Long)].collect().toSeq == Seq(("a", 1L)))

    // SELECT binds kv as a temp view; DROP must unbind it too, or the
    // dropped table stays silently queryable with stale data
    assert(e.execute("SELECT count(*) AS n FROM kv").head().getLong(0) == 1L)
    e.execute("DROP TABLE kv")
    assert(e.execute("SHOW TABLES").as[String].collect().toSeq == Seq("users"))
    intercept[Exception] { e.execute("SELECT * FROM kv").collect() }

    // missing PK is not guessed from the declared columns: the table
    // keys on a generated hidden _row_id instead (reference:
    // bind_pk_and_row_id_on_relation, handler/create_table.rs:476) —
    // duplicates of every declared column stay distinct rows
    e.execute("CREATE TABLE nokey (id BIGINT, v DOUBLE)")
    e.execute("INSERT INTO nokey VALUES (1, 0.5), (1, 0.5)")
    assert(e.execute("SELECT count(*) AS n FROM nokey").head().getLong(0) == 2L)
    assert(e.execute("SELECT * FROM nokey").columns.toSeq == Seq("id", "v"))
  }

  test("temporal join SQL: FOR SYSTEM_TIME AS OF PROCTIME() in a streaming MV") {
    val e = new Engine(spark, tmpDir("sqltj"))
    val srcDir = tmpDir("sqltj-src")
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
      .write.mode("append").parquet(srcDir)
    Seq((1L, "gold"), (2L, "silver")).toDF("k", "tier")
      .createOrReplaceTempView("tiers")

    e.execute(s"CREATE SOURCE tj_src WITH (path = '$srcDir', format = 'parquet')")
    e.execute(
      """CREATE MATERIALIZED VIEW tj_mv (PRIMARY KEY (k)) AS
        |SELECT s.k, s.v, t.tier
        |FROM tj_src s
        |JOIN tiers FOR SYSTEM_TIME AS OF PROCTIME() t ON s.k = t.k""".stripMargin)
    e.execute("FLUSH")
    // k=3 has no dim row → lookup-join drop, like the reference
    assert(e.table("tj_mv").orderBy("k").as[(Long, Double, String)]
      .collect().toSeq == Seq((1L, 10.0, "gold"), (2L, 20.0, "silver")))
    e.execute("DROP MATERIALIZED VIEW tj_mv")
  }

  test("DESCRIBE returns MV column names/types; EXPLAIN returns plan rows") {
    val e = new Engine(spark, tmpDir("sqldesc"))
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "tag", "v")
      .createOrReplaceTempView("desc_base")
    e.execute(
      """CREATE MATERIALIZED VIEW desc_mv (PRIMARY KEY (id)) AS
        |SELECT id, tag, v * 2 AS v2 FROM desc_base""".stripMargin)

    val desc = e.execute("DESCRIBE desc_mv").as[(String, String)].collect().toMap
    assert(desc("id") == "bigint" && desc("tag") == "string"
      && desc("v2") == "double")

    // plain DESCRIBE of a catalog table still goes through Spark SQL
    assert(e.execute("DESCRIBE desc_base").count() == 3)

    val plan = e.execute(
      "EXPLAIN SELECT tag, sum(v) FROM desc_base GROUP BY tag")
      .as[String].collect().mkString("\n")
    assert(plan.contains("HashAggregate"), s"unexpected plan:\n$plan")

    // EXPLAIN CREATE MATERIALIZED VIEW plans the inner SELECT without
    // creating anything
    val mvPlan = e.execute(
      """EXPLAIN CREATE MATERIALIZED VIEW nope (PRIMARY KEY (tag)) AS
        |SELECT tag, count(*) AS n FROM desc_base GROUP BY tag""".stripMargin)
      .as[String].collect().mkString("\n")
    assert(mvPlan.contains("HashAggregate"))
    assert(e.execute("SHOW MATERIALIZED VIEWS").as[String].collect()
      .toSeq == Seq("desc_mv"))
  }

  test("CREATE FUNCTION: SQL UDFs (scalar + table) run through Engine.execute") {
    // reference: SQL UDFs are inlined at bind time
    // (src/frontend/src/handler/create_sql_function.rs); Spark 4 SQL UDFs
    // are the native equivalent — declarative body, optimized by Catalyst
    // like any expression (no black-box boxing).
    val e = new Engine(spark, tmpDir("sqludf"))
    Seq((1L, 2.0), (2L, 5.0), (3L, 9.0)).toDF("id", "v")
      .createOrReplaceTempView("udf_base")

    e.execute(
      "CREATE TEMPORARY FUNCTION with_tax(x DOUBLE) RETURNS DOUBLE RETURN x * 1.1")
    val out = e.execute(
      "SELECT id, with_tax(v) AS t FROM udf_base ORDER BY id")
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2.2), (2L, 5.5), (3L, 9.9)))

    // SQL UDFs compose with aggregation and stay in the optimized plan
    val agg = e.execute(
      "SELECT CAST(sum(with_tax(v)) AS DECIMAL(10,2)) AS s FROM udf_base")
      .collect().head.getDecimal(0)
    assert(agg == new java.math.BigDecimal("17.60"))

    // table-valued SQL UDF (UDTF surface: reference CREATE FUNCTION
    // RETURNS TABLE, table_function/mod.rs)
    e.execute(
      """CREATE TEMPORARY FUNCTION v_above(thresh DOUBLE)
        |RETURNS TABLE(id BIGINT, v DOUBLE)
        |RETURN SELECT id, v FROM udf_base WHERE v > thresh""".stripMargin)
    val tv = e.execute("SELECT * FROM v_above(4.0) ORDER BY id")
      .as[(Long, Double)].collect().toSeq
    assert(tv == Seq((2L, 5.0), (3L, 9.0)))
  }

  test("CREATE SUBSCRIPTION + cursor FETCH pulls MV changes as SQL") {
    // reference: CREATE SUBSCRIPTION (handler/create_subscription.rs) +
    // DECLARE … SUBSCRIPTION CURSOR + FETCH (session/cursor_manager.rs):
    // the pull-based consumption of an MV's changelog.
    val e = new Engine(spark, tmpDir("sqlsub"))
    val srcDir = tmpDir("sqlsub-src")
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.mode("append").parquet(srcDir)
    e.execute(s"CREATE SOURCE subsrc WITH (path = '$srcDir', format = 'parquet')")
    e.execute(
      """CREATE MATERIALIZED VIEW sub_mv (PRIMARY KEY (id)) AS
        |SELECT id, v * 2 AS v2 FROM subsrc""".stripMargin)
    e.execute("FLUSH")

    e.execute("CREATE SUBSCRIPTION sub1 FROM sub_mv")
    assert(e.execute("SHOW SUBSCRIPTIONS").as[String].collect().toSeq == Seq("sub1"))

    // default cursor: sees only changes after declaration
    e.execute("DECLARE cur1 SUBSCRIPTION CURSOR FOR sub1")
    assert(e.execute("FETCH NEXT FROM cur1").isEmpty)

    Seq((2L, 25.0), (3L, 30.0)).toDF("id", "v")
      .write.mode("append").parquet(srcDir)
    e.execute("FLUSH")
    val batch = e.execute("FETCH NEXT FROM cur1")
      .select("id", "v2").as[(Long, Double)].collect().toSeq.sorted
    assert(batch == Seq((2L, 50.0), (3L, 60.0)))
    // cursor advanced: nothing new
    assert(e.execute("FETCH NEXT FROM cur1").isEmpty)

    // FULL cursor replays the entire retained history
    e.execute("DECLARE cur2 SUBSCRIPTION CURSOR FOR sub1 FULL")
    val all = e.execute("FETCH NEXT FROM cur2")
      .select("id", "v2").as[(Long, Double)].collect().toSeq.sorted
    assert(all == Seq((1L, 20.0), (2L, 40.0), (2L, 50.0), (3L, 60.0)))

    e.execute("CLOSE cur1")
    e.execute("DROP SUBSCRIPTION sub1")
    assert(e.execute("SHOW SUBSCRIPTIONS").isEmpty)
    e.execute("DROP MATERIALIZED VIEW sub_mv")
  }

  test("subscription cursor on a CHAINED aggregate MV delivers U-/U+ deltas") {
    // the reference's subscription-on-MV pattern where the MV is itself
    // incrementally maintained off a table: FETCH must deliver the
    // retraction-complete aggregate deltas (op 3 = old image, 4 = new)
    val e = new Engine(spark, tmpDir("sqlsubchain"))
    e.execute("CREATE TABLE sc_acct (id BIGINT PRIMARY KEY, grp BIGINT, bal BIGINT)")
    e.execute(
      """CREATE MATERIALIZED VIEW sc_tot (PRIMARY KEY (grp)) AS
        |SELECT grp, sum(bal) AS total FROM sc_acct GROUP BY grp""".stripMargin)
    assert(e.streamingJob("sc_tot").nonEmpty)
    e.execute("CREATE SUBSCRIPTION sc_sub FROM sc_tot")
    e.execute("DECLARE sc_cur SUBSCRIPTION CURSOR FOR sc_sub")
    assert(e.execute("FETCH NEXT FROM sc_cur").isEmpty)

    e.execute("INSERT INTO sc_acct VALUES (1, 1, 10), (2, 1, 20), (3, 2, 5)")
    e.execute("FLUSH")
    val b1 = e.execute("FETCH NEXT FROM sc_cur").select("grp", "total", "_op")
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(b1 == Seq((1L, 30L, 3), (2L, 5L, 3)), s"fresh groups emit U+ only: $b1")

    // account 2 moves group 1 → 2: BOTH groups re-emit as U-/U+ pairs
    // (reference op numbering: UPDATE_INSERT=3 new image, UPDATE_DELETE=4 old)
    e.execute("UPDATE sc_acct SET grp = 2 WHERE id = 2")
    e.execute("FLUSH")
    val b2 = e.execute("FETCH NEXT FROM sc_cur").select("grp", "total", "_op")
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(b2 == Seq((1L, 10L, 3), (1L, 30L, 4), (2L, 5L, 4), (2L, 25L, 3)),
      s"group-moving update must deliver both groups' image pairs: $b2")

    // emptying a group delivers only its retraction
    e.execute("DELETE FROM sc_acct WHERE grp = 2")
    e.execute("FLUSH")
    val b3 = e.execute("FETCH NEXT FROM sc_cur").select("grp", "total", "_op")
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(b3 == Seq((2L, 25L, 4)), s"emptied group must retract: $b3")
    assert(e.table("sc_tot").as[(Long, Long)].collect().toSeq == Seq((1L, 10L)))
    e.streamingJob("sc_tot").foreach(_.stop())
  }

  test("CHANGELOG materialized view: append-only change events (reference changelog.slt)") {
    // reference: `WITH sub AS CHANGELOG FROM t SELECT … FROM sub`
    // (e2e_test/streaming/changelog.slt, changelog.rs) — every change
    // lands as a permanent row with changelog_op in the reference's
    // proto numbering (1 insert, 2 delete, 3 update-new, 4 update-old)
    val wh = tmpDir("chlog")
    val e = new Engine(spark, wh)
    e.execute("CREATE TABLE cl_t (v1 BIGINT PRIMARY KEY, v2 BIGINT)")
    e.execute("CREATE MATERIALIZED VIEW cl_mv AS WITH sub AS CHANGELOG FROM cl_t " +
      "SELECT * FROM sub")
    e.execute("CREATE MATERIALIZED VIEW cl_proj AS WITH sub AS CHANGELOG FROM cl_t " +
      "SELECT v1, v2 FROM sub")
    e.execute("CREATE MATERIALIZED VIEW cl_rid AS WITH sub AS CHANGELOG FROM cl_t " +
      "SELECT v1, _changelog_row_id AS row_id FROM sub")
    assert(e.streamingJob("cl_mv").nonEmpty, "changelog MV must maintain continuously")

    e.execute("INSERT INTO cl_t VALUES (1, 1), (2, 2)")
    e.execute("UPDATE cl_t SET v2 = 100 WHERE v1 = 1")
    e.execute("DELETE FROM cl_t WHERE v1 = 2")
    e.execute("FLUSH")
    // the reference slt's exact mv1 expectation for this DML sequence
    val got = e.table("cl_mv").select("v1", "v2", "changelog_op")
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(got == Seq((1L, 1L, 1), (1L, 1L, 4), (1L, 100L, 3),
      (2L, 2L, 1), (2L, 2L, 2)), s"got $got")
    assert(e.table("cl_proj").as[(Long, Long)].collect().toSeq.sorted ==
      Seq((1L, 1L), (1L, 1L), (1L, 100L), (2L, 2L), (2L, 2L)))
    val rids = e.table("cl_rid").select("row_id").as[Long].collect().toSeq
    assert(rids.distinct.size == rids.size, "changelog row ids must be unique")

    // restart: history survives, new changes keep appending
    Seq("cl_mv", "cl_proj", "cl_rid").foreach(n => e.streamingJob(n).foreach(_.stop()))
    val e2 = new Engine(spark.newSession(), wh)
    assert(e2.recoveryPending.isEmpty, s"pending: ${e2.recoveryPending}")
    e2.execute("INSERT INTO cl_t VALUES (9, 9)")
    e2.execute("FLUSH")
    assert(e2.table("cl_mv").count() == 6)
    assert(e2.table("cl_mv").where("v1 = 9").select("changelog_op")
      .as[Int].collect().toSeq == Seq(1))
    Seq("cl_mv", "cl_proj", "cl_rid").foreach(n => e2.streamingJob(n).foreach(_.stop()))
  }

  test("DML RETURNING and DEFAULT columns (dml_returning/table_with_default_columns)") {
    val e = new Engine(spark, tmpDir("sqlret"))
    e.execute(
      "CREATE TABLE ret_t (id BIGINT PRIMARY KEY, v DOUBLE, tag VARCHAR DEFAULT 'fresh', n INT DEFAULT 7)")

    // positional insert narrower than the table: defaults fill the tail
    val ins = e.execute("INSERT INTO ret_t VALUES (1, 1.5), (2, 2.5) RETURNING *")
    assert(ins.orderBy("id").as[(Long, Double, String, Int)].collect().toSeq ==
      Seq((1L, 1.5, "fresh", 7), (2L, 2.5, "fresh", 7)))

    // named-column insert: unnamed columns fill from defaults
    e.execute("INSERT INTO ret_t (id, n) VALUES (3, 9)")
    assert(e.table("ret_t").where(col("id") === 3)
      .as[(Long, Option[Double], String, Int)].collect().toSeq ==
      Seq((3L, None, "fresh", 9)))

    // UPDATE RETURNING reports the post-update image of matched rows
    val upd = e.execute("UPDATE ret_t SET v = v + 10 WHERE id <= 2 RETURNING *")
    assert(upd.orderBy("id").as[(Long, Double, String, Int)].collect().toSeq ==
      Seq((1L, 11.5, "fresh", 7), (2L, 12.5, "fresh", 7)))

    // DELETE RETURNING reports the deleted rows
    val del = e.execute("DELETE FROM ret_t WHERE id = 3 RETURNING *")
    assert(del.as[(Long, Option[Double], String, Int)].collect().toSeq ==
      Seq((3L, None, "fresh", 9)))
    assert(e.table("ret_t").count() == 2)
  }

  test("CREATE VIEW / transactions / SET: the psql-session statement surface") {
    val e = new Engine(spark, tmpDir("sqlsess"))
    Seq((1L, 5.0), (2L, 9.0)).toDF("id", "v").createOrReplaceTempView("sess_base")

    // non-materialized view: bound query replayed at read
    e.execute("CREATE VIEW sess_v AS SELECT id, v * 2 AS v2 FROM sess_base")
    assert(e.execute("SELECT * FROM sess_v ORDER BY id")
      .as[(Long, Double)].collect().toSeq == Seq((1L, 10.0), (2L, 18.0)))

    // read-only transaction bracket acknowledged as no-ops
    assert(e.execute("BEGIN READ ONLY").head().getString(0) == "BEGIN")
    assert(e.execute("SELECT count(*) AS n FROM sess_v").head().getLong(0) == 2L)
    assert(e.execute("COMMIT").head().getString(0) == "COMMIT")

    // SET/SHOW session variables fall through to Spark's SET surface
    e.execute("SET spark.sql.session.timeZone=UTC")
    assert(e.execute("SET spark.sql.session.timeZone").collect()
      .head.getString(1) == "UTC")

    e.execute("DROP VIEW sess_v")
    intercept[Exception] { e.execute("SELECT * FROM sess_v") }
  }

  test("CREATE INDEX: point lookup prunes to one bucket partition") {
    val e = new Engine(spark, tmpDir("sqlidx"))
    e.attachTables("/root/testdata/sf0.001")
    e.execute("CREATE INDEX cust_by_nation ON customer (c_nationkey)")
    assert(e.execute("SHOW INDEXES").as[(String, String, String)]
      .collect().toSeq == Seq(("cust_by_nation", "customer", "c_nationkey")))

    val viaIndex = e.indexLookup("cust_by_nation", 7)
    val direct = e.table("customer").where(col("c_nationkey") === 7)
    assert(viaIndex.orderBy("c_custkey").collect().toSeq ==
      direct.orderBy("c_custkey").collect().toSeq)
    assert(viaIndex.count() > 0)

    // the lookup is partition-pruned: the scan carries a partition
    // filter on the bucket column and reads 1 of 16 partitions
    val scan = viaIndex.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("__idx_bucket"),
      s"no partition pruning in:\n$scan")

    // mistyped-but-convertible probes are cast to the stored key type:
    // an int64 column probed with an Int literal used to hash into the
    // wrong bucket and silently return 0 rows
    e.execute("CREATE INDEX cust_by_key ON customer (c_custkey)")
    assert(e.indexLookup("cust_by_key", 5).count() == 1)  // Int probe, int64 key
    assert(e.indexLookup("cust_by_key", 5L).count() == 1)
    assert(e.indexLookup("cust_by_nation", 7L).count() == viaIndex.count()) // Long probe, int32 key
    // a probe that does not convert to the stored type fails loudly
    intercept[IllegalArgumentException] {
      e.indexLookup("cust_by_key", "not-a-number")
    }
    e.execute("DROP INDEX cust_by_key")

    e.execute("DROP INDEX cust_by_nation")
    assert(e.execute("SHOW INDEXES").isEmpty)

    // reference clauses (handler/create_index.rs): INCLUDE validates
    // and accepts (full-row covering superset), DISTRIBUTED BY must be
    // a key prefix, sort directions on keys parse and drop, and
    // IF NOT EXISTS is idempotent
    e.execute("CREATE INDEX idx_full ON customer (c_nationkey ASC, c_custkey)" +
      " INCLUDE (c_name, c_acctbal) DISTRIBUTED BY (c_nationkey)")
    assert(e.indexLookup("idx_full", 7, 5L).count() <= 1)
    e.execute("CREATE INDEX IF NOT EXISTS idx_full ON customer (c_nationkey)")
    // unchanged: still the two-key index
    assert(e.execute("SHOW INDEXES").as[(String, String, String)]
      .collect().toSeq.exists(_._3.contains("c_custkey")))
    intercept[Exception] {
      e.execute("CREATE INDEX idx_bad ON customer (c_custkey)" +
        " DISTRIBUTED BY (c_nationkey)")
    }
    intercept[Exception] {
      e.execute("CREATE INDEX idx_bad2 ON customer (c_custkey)" +
        " INCLUDE (no_such_col)")
    }
    e.execute("DROP INDEX idx_full")
  }

  test("SHOW JOBS lists streaming maintenance jobs with live status") {
    val e = new Engine(spark, tmpDir("sqljobs"))
    val srcDir = tmpDir("sqljobs-src")
    Seq((1L, 1.0)).toDF("id", "v").write.mode("append").parquet(srcDir)
    e.execute(s"CREATE SOURCE jsrc WITH (path = '$srcDir', format = 'parquet')")
    e.execute(
      "CREATE MATERIALIZED VIEW job_mv (PRIMARY KEY (id)) AS SELECT id, v FROM jsrc")
    e.execute("FLUSH")
    val rows = e.execute("SHOW JOBS")
      .select("name", "active").as[(String, Boolean)].collect().toSeq
    assert(rows == Seq(("job_mv", true)))
    e.execute("DROP MATERIALIZED VIEW job_mv")
    assert(e.execute("SHOW JOBS").isEmpty)
  }

  test("ALTER TABLE ADD/DROP COLUMN evolves a PK-merged table") {
    val e = new Engine(spark, tmpDir("sqlalter"))
    e.execute("CREATE TABLE alt_t (id BIGINT PRIMARY KEY, v DOUBLE)")
    e.execute("INSERT INTO alt_t VALUES (1, 10.0), (2, 20.0)")

    e.execute("ALTER TABLE alt_t ADD COLUMN tag VARCHAR")
    // existing rows read back null-padded; DESCRIBE shows the new column
    assert(e.execute("DESCRIBE alt_t").as[(String, String)].collect().take(3)
      .toSeq == Seq(("id", "bigint"), ("v", "double"), ("tag", "string")))
    assert(e.table("alt_t").orderBy("id").as[(Long, Double, Option[String])]
      .collect().toSeq == Seq((1L, 10.0, None), (2L, 20.0, None)))

    // the evolved schema is writable: full-row insert + update of the
    // new column on an old row
    e.execute("INSERT INTO alt_t VALUES (3, 30.0, 'c')")
    e.execute("UPDATE alt_t SET tag = 'a' WHERE id = 1")
    assert(e.table("alt_t").orderBy("id").as[(Long, Double, Option[String])]
      .collect().toSeq ==
      Seq((1L, 10.0, Some("a")), (2L, 20.0, None), (3L, 30.0, Some("c"))))

    // DROP COLUMN projects it away everywhere; PK columns are protected
    e.execute("ALTER TABLE alt_t DROP COLUMN v")
    assert(e.table("alt_t").orderBy("id").as[(Long, Option[String])]
      .collect().toSeq ==
      Seq((1L, Some("a")), (2L, None), (3L, Some("c"))))
    intercept[IllegalArgumentException] {
      e.execute("ALTER TABLE alt_t DROP COLUMN id")
    }
  }

  test("streaming CREATE MATERIALIZED VIEW with OVER windows (StreamOverWindow)") {
    val e = new Engine(spark, tmpDir("overmv"))
    val srcDir = tmpDir("overmv-src")
    Seq((1L, "a", 10L, 1.0), (2L, "a", 20L, 2.0), (3L, "b", 10L, 5.0))
      .toDF("id", "usr", "ts", "v")
      .write.mode("append").parquet(srcDir)

    e.execute(s"CREATE SOURCE ovsrc WITH (path = '$srcDir', format = 'parquet')")
    val out = e.execute(
      """CREATE MATERIALIZED VIEW ov_mv (PRIMARY KEY (id)) AS
        |SELECT id, usr, ts, v,
        |  sum(v) OVER (PARTITION BY usr ORDER BY ts) AS run_sum,
        |  row_number() OVER (PARTITION BY usr ORDER BY ts) AS rn
        |FROM ovsrc""".stripMargin)
    assert(out.head().getString(0).contains("over-window"))
    e.streamingJob("ov_mv").get.processAllAvailable()
    def rows(en: Engine) = en.table("ov_mv").orderBy("id")
      .select("id", "run_sum", "rn")
      .as[(Long, Double, Int)].collect().toSeq
    assert(rows(e) == Seq((1L, 1.0, 1), (2L, 3.0, 2), (3L, 5.0, 1)))

    // a mid-stream insert shifts downstream frames of ONLY its partition
    Seq((4L, "a", 15L, 0.5)).toDF("id", "usr", "ts", "v")
      .write.mode("append").parquet(srcDir)
    e.streamingJob("ov_mv").get.processAllAvailable()
    assert(rows(e) ==
      Seq((1L, 1.0, 1), (2L, 3.5, 3), (3L, 5.0, 1), (4L, 1.5, 2)))

    // restart: a fresh engine over the same warehouse resumes the
    // over-window maintenance loop from the checkpoint
    e.streamingJob("ov_mv").get.stop()
    val s2 = spark.newSession()
    val e2 = new Engine(s2, e.mvs.checkpointDir("ov_mv")
      .stripSuffix("/ov_mv/checkpoint")) // same warehouse root
    assert(e2.recoveryPending.isEmpty,
      s"unrecovered: ${e2.recoveryPending.mkString(", ")}")
    Seq((5L, "b", 20L, 1.0)).toDF("id", "usr", "ts", "v")
      .write.mode("append").parquet(srcDir)
    val job2 = e2.streamingJob("ov_mv")
    assert(job2.isDefined, "over-window maintenance not resumed")
    job2.get.processAllAvailable()
    assert(rows(e2) ==
      Seq((1L, 1.0, 1), (2L, 3.5, 3), (3L, 5.0, 1), (4L, 1.5, 2), (5L, 6.0, 2)))
    job2.get.stop()

    // base table is internal: not listed, dropped with the MV
    import s2.implicits._
    assert(!e2.execute("SHOW MATERIALIZED VIEWS").as[String]
      .collect().contains("ov_mv__base"))
    e2.execute("DROP MATERIALIZED VIEW ov_mv")
    assert(e2.mvs.get("ov_mv").isEmpty && e2.mvs.get("ov_mv__base").isEmpty)
  }

  test("ALTER ... RENAME TO moves storage, catalog, bindings, and survives restart") {
    val wh = tmpDir("rename")
    val e = new Engine(spark, wh)
    e.execute("CREATE TABLE rn_t (id BIGINT PRIMARY KEY, v DOUBLE DEFAULT 2.0)")
    e.execute("INSERT INTO rn_t (id) VALUES (1), (2)")
    e.execute("ALTER TABLE rn_t RENAME TO rn_u")
    assert(e.execute("SELECT count(*) AS n FROM rn_u").head().getLong(0) == 2)
    // DML and DEFAULT fill follow the rename; the old name is gone
    e.execute("INSERT INTO rn_u (id) VALUES (3)")
    assert(e.table("rn_u").where("id = 3").select("v").head().getDouble(0) == 2.0)
    intercept[Exception] { e.execute("SELECT * FROM rn_t").collect() }

    e.execute("CREATE MATERIALIZED VIEW rn_m (PRIMARY KEY (id)) AS " +
      "SELECT id, v * 10 AS v10 FROM rn_u")
    e.execute("ALTER MATERIALIZED VIEW rn_m RENAME TO rn_m2")
    assert(e.execute("SELECT count(*) AS n FROM rn_m2").head().getLong(0) == 3)

    // bucket layout travels with the rename: non-default nBuckets keeps
    // driving the new binding (a silent 32 would break bucket-pruned
    // reads and scatter merges across a mismatched on-disk layout)
    e.refreshMaterializedView("rn_b", Seq("id"),
      e.table("rn_u").select("id"), nBuckets = 7)
    e.execute("ALTER MATERIALIZED VIEW rn_b RENAME TO rn_b2")
    assert(e.mvs.get("rn_b2").get.nBuckets == 7)
    e.refreshMaterializedView("rn_b2", Seq("id"),
      e.table("rn_u").select("id"), nBuckets = 7)
    assert(e.table("rn_b2").count() == 3)

    // a renamed STREAMING MV restarts maintenance under the new name
    // (the moved checkpoint resumes source offsets — no re-backfill)
    val srcDir = tmpDir("rename-src")
    Seq((10L, 1.0)).toDF("id", "v").write.mode("append").parquet(srcDir)
    e.execute(s"CREATE SOURCE rn_src WITH (path = '$srcDir')")
    e.execute("CREATE MATERIALIZED VIEW rn_sm (PRIMARY KEY (id)) AS " +
      "SELECT id, v FROM rn_src")
    e.execute("FLUSH")
    assert(e.table("rn_sm").count() == 1)
    e.streamingJob("rn_sm").foreach(_.stop())
    e.execute("ALTER MATERIALIZED VIEW rn_sm RENAME TO rn_sm2")
    Seq((20L, 2.0)).toDF("id", "v").write.mode("append").parquet(srcDir)
    e.execute("FLUSH")
    assert(e.table("rn_sm2").count() == 2,
      "renamed streaming MV did not resume maintenance")

    // the renamed definitions persist: a fresh engine sees only new names
    val e2 = new Engine(spark.newSession(), wh)
    assert(e2.table("rn_u").count() == 3)
    assert(e2.table("rn_m2").count() == 3)
    assert(e2.mvs.get("rn_t").isEmpty && e2.mvs.get("rn_m").isEmpty)
  }

  test("SQL MV-on-MV: downstream chains continuously, deletes propagate, restart re-wires") {
    val wh = tmpDir("mvchainsql")
    val e = new Engine(spark, wh)
    val srcDir = tmpDir("mvchainsql-src")
    // Debezium file source → streaming MV a → chained MV b (SQL only)
    Seq("""{"before": null, "after": {"id": 1, "v": 5.0}, "op": "c"}""",
        """{"before": null, "after": {"id": 2, "v": 50.0}, "op": "c"}""")
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute(
      s"""CREATE SOURCE ch_src (id BIGINT, v DOUBLE)
         |WITH (path = '$srcDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute(
      """CREATE MATERIALIZED VIEW ch_a (PRIMARY KEY (id)) AS
        |SELECT id, v FROM ch_src""".stripMargin)
    e.execute(
      """CREATE MATERIALIZED VIEW ch_b (PRIMARY KEY (id)) AS
        |SELECT id, v * 10 AS v10 FROM ch_a WHERE v < 40""".stripMargin)
    e.execute("FLUSH")
    // b backfilled from a's snapshot, filtered + transformed
    assert(e.table("ch_b").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 50.0)))

    // new input advances BOTH a and b with one FLUSH — no manual refresh
    Seq("""{"before": null, "after": {"id": 3, "v": 7.0}, "op": "c"}""")
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute("FLUSH")
    assert(e.table("ch_a").count() == 3)
    assert(e.table("ch_b").orderBy("id").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 50.0), (3L, 70.0)))

    // a delete at the SOURCE propagates through a INTO b
    Seq("""{"before": {"id": 1, "v": 5.0}, "after": null, "op": "d"}""")
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute("FLUSH")
    assert(e.table("ch_a").count() == 2)
    assert(e.table("ch_b").as[(Long, Double)].collect().toSeq ==
      Seq((3L, 70.0)))

    // restart: recovery re-wires source → a → b; the chain keeps moving
    e.streamingJob("ch_a").foreach(_.stop())
    e.streamingJob("ch_b").foreach(_.stop())
    val e2 = new Engine(spark.newSession(), wh)
    Seq("""{"before": null, "after": {"id": 4, "v": 9.0}, "op": "c"}""")
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e2.execute("FLUSH")
    assert(e2.table("ch_b").orderBy("id")
      .as[(Long, Double)].collect().toSeq == Seq((3L, 70.0), (4L, 90.0)),
      "restarted chain did not advance")
    e2.streamingJob("ch_a").foreach(_.stop())
    e2.streamingJob("ch_b").foreach(_.stop())

    // a GLOBAL aggregate over a streaming MV chains since round 9
    // (IncrementalAgg's single-group materialized-input path — the
    // reference's simple_agg) and advances with its upstream
    val e3 = new Engine(spark, tmpDir("mvchainsql3"))
    val src3 = tmpDir("mvchainsql3-src")
    Seq((1L, 2.0)).toDF("id", "v").write.mode("append").parquet(src3)
    e3.execute(s"CREATE SOURCE agg_src WITH (path = '$src3')")
    e3.execute("CREATE MATERIALIZED VIEW agg_a (PRIMARY KEY (id)) AS " +
      "SELECT id, v FROM agg_src")
    e3.execute("FLUSH")
    e3.execute("CREATE MATERIALIZED VIEW agg_b (PRIMARY KEY (n)) AS " +
      "SELECT count(*) AS n, sum(v) AS sv FROM agg_a")
    assert(e3.streamingJob("agg_b").nonEmpty,
      "global aggregate MV-on-MV must chain (single-group path)")
    assert(e3.table("agg_b").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 2.0)))
    Seq((2L, 3.0)).toDF("id", "v").write.mode("append").parquet(src3)
    e3.execute("FLUSH")
    assert(e3.table("agg_b").as[(Long, Double)].collect().toSeq ==
      Seq((2L, 5.0)), "global aggregate did not advance with its upstream")
    Seq("agg_a", "agg_b").foreach(n => e3.streamingJob(n).foreach(_.stop()))
  }

  test("SQL aggregate MV-on-MV: grouped agg chains, emptied groups delete, restart re-wires") {
    val wh = tmpDir("aggchain")
    val e = new Engine(spark, wh)
    val srcDir = tmpDir("aggchain-src")
    def ins(id: Int, g: Int, v: Double) =
      s"""{"before": null, "after": {"id": $id, "g": $g, "v": $v}, "op": "c"}"""
    def del(id: Int, g: Int, v: Double) =
      s"""{"before": {"id": $id, "g": $g, "v": $v}, "after": null, "op": "d"}"""
    Seq(ins(1, 10, 5.0), ins(2, 10, 7.0), ins(3, 20, 1.0))
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute(
      s"""CREATE SOURCE ag_src (id BIGINT, g BIGINT, v DOUBLE)
         |WITH (path = '$srcDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute(
      """CREATE MATERIALIZED VIEW ag_a (PRIMARY KEY (id)) AS
        |SELECT id, g, v FROM ag_src""".stripMargin)
    e.execute(
      """CREATE MATERIALIZED VIEW ag_sum (PRIMARY KEY (g)) AS
        |SELECT g, count(*) AS n, sum(v) AS sv FROM ag_a GROUP BY g""".stripMargin)
    e.execute("FLUSH")
    assert(e.streamingJob("ag_sum").nonEmpty,
      "grouped agg over a streaming MV must chain continuously")
    assert(e.table("ag_sum").orderBy("g").as[(Long, Long, Double)]
      .collect().toSeq == Seq((10L, 2L, 12.0), (20L, 1L, 1.0)))

    // new input advances the whole chain with one FLUSH
    Seq(ins(4, 20, 3.0))
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute("FLUSH")
    assert(e.table("ag_sum").orderBy("g").as[(Long, Long, Double)]
      .collect().toSeq == Seq((10L, 2L, 12.0), (20L, 2L, 4.0)))

    // chains STACK: a second grouped aggregate over the first — and its
    // group key (n) is NOT ag_sum's PK, so correctness depends on
    // ag_sum's changelog being retraction-complete (U-/U+ pairs)
    e.execute(
      """CREATE MATERIALIZED VIEW ag_cnt (PRIMARY KEY (n)) AS
        |SELECT n, count(*) AS c FROM ag_sum GROUP BY n""".stripMargin)
    e.execute("FLUSH")
    assert(e.streamingJob("ag_cnt").nonEmpty,
      "agg-on-agg must chain continuously")
    assert(e.table("ag_cnt").orderBy("n").as[(Long, Long)]
      .collect().toSeq == Seq((2L, 2L)))

    // deleting a group's LAST rows retracts the aggregate row entirely;
    // the U- before-image carries old n=2 down to ag_cnt
    Seq(del(1, 10, 5.0), del(2, 10, 7.0))
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute("FLUSH")
    assert(e.table("ag_sum").orderBy("g").as[(Long, Long, Double)]
      .collect().toSeq == Seq((20L, 2L, 4.0)),
      "emptied group must be deleted from the aggregate MV")
    assert(e.table("ag_cnt").orderBy("n").as[(Long, Long)]
      .collect().toSeq == Seq((2L, 1L)),
      "level-2 aggregate must see the retracted group")

    // restart: recovery re-wires source → ag_a → ag_sum → ag_cnt
    Seq("ag_a", "ag_sum", "ag_cnt")
      .foreach(n => e.streamingJob(n).foreach(_.stop()))
    val e2 = new Engine(spark.newSession(), wh)
    Seq(ins(5, 30, 9.0))
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e2.execute("FLUSH")
    assert(e2.table("ag_sum").orderBy("g").as[(Long, Long, Double)]
      .collect().toSeq == Seq((20L, 2L, 4.0), (30L, 1L, 9.0)),
      "restarted aggregate chain did not advance")
    assert(e2.table("ag_cnt").orderBy("n").as[(Long, Long)]
      .collect().toSeq == Seq((1L, 1L), (2L, 1L)),
      "restarted level-2 aggregate chain did not advance")
    Seq("ag_a", "ag_sum", "ag_cnt")
      .foreach(n => e2.streamingJob(n).foreach(_.stop()))
  }

  test("SQL join MV-on-MV: delta join chains, both-side deletes retract, restart re-wires") {
    val wh = tmpDir("joinchain")
    val e = new Engine(spark, wh)
    val (aDir, bDir) = (tmpDir("joinchain-a"), tmpDir("joinchain-b"))
    def ev(id: Int, k: Int, v: Double) =
      s"""{"before": null, "after": {"id": $id, "k": $k, "v": $v}, "op": "c"}"""
    def evd(id: Int, k: Int, v: Double) =
      s"""{"before": {"id": $id, "k": $k, "v": $v}, "after": null, "op": "d"}"""
    def od(oid: Int, k: Int, w: Double) =
      s"""{"before": null, "after": {"oid": $oid, "k": $k, "w": $w}, "op": "c"}"""
    def odd(oid: Int, k: Int, w: Double) =
      s"""{"before": {"oid": $oid, "k": $k, "w": $w}, "after": null, "op": "d"}"""
    Seq(ev(1, 7, 1.0), ev(2, 8, 2.0))
      .toDF("value").coalesce(1).write.mode("append").text(aDir)
    Seq(od(10, 7, 5.0), od(11, 7, 6.0), od(12, 9, 7.0))
      .toDF("value").coalesce(1).write.mode("append").text(bDir)
    e.execute(s"""CREATE SOURCE jc_asrc (id BIGINT, k BIGINT, v DOUBLE)
                 |WITH (path = '$aDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute(s"""CREATE SOURCE jc_bsrc (oid BIGINT, k BIGINT, w DOUBLE)
                 |WITH (path = '$bDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute("CREATE MATERIALIZED VIEW jc_a (PRIMARY KEY (id)) AS " +
      "SELECT id, k, v FROM jc_asrc")
    e.execute("CREATE MATERIALIZED VIEW jc_b (PRIMARY KEY (oid)) AS " +
      "SELECT oid, k AS bk, w FROM jc_bsrc")
    e.execute("FLUSH")
    // the join MV: PK = both sides' PKs; arbitrary per-row projection
    e.execute(
      """CREATE MATERIALIZED VIEW jc_j (PRIMARY KEY (id, oid)) AS
        |SELECT jc_a.id, jc_b.oid, jc_a.v + jc_b.w AS s
        |FROM jc_a JOIN jc_b ON jc_a.k = jc_b.bk""".stripMargin)
    e.execute("FLUSH")
    assert(e.streamingJob("jc_j").nonEmpty,
      "join over two streaming MVs must chain continuously")
    assert(e.table("jc_j").orderBy("id", "oid").as[(Long, Long, Double)]
      .collect().toSeq == Seq((1L, 10L, 6.0), (1L, 11L, 7.0)))

    // inserts on BOTH sides advance through both tails with one FLUSH
    Seq(ev(3, 9, 3.0)).toDF("value").coalesce(1).write.mode("append").text(aDir)
    Seq(od(13, 8, 8.0)).toDF("value").coalesce(1).write.mode("append").text(bDir)
    e.execute("FLUSH")
    assert(e.table("jc_j").orderBy("id", "oid").as[(Long, Long, Double)]
      .collect().toSeq == Seq((1L, 10L, 6.0), (1L, 11L, 7.0),
        (2L, 13L, 10.0), (3L, 12L, 10.0)))

    // the join publishes ONE epoch sequence → an aggregate chains on top
    e.execute(
      """CREATE MATERIALIZED VIEW jc_cnt (PRIMARY KEY (id)) AS
        |SELECT id, count(*) AS n FROM jc_j GROUP BY id""".stripMargin)
    e.execute("FLUSH")
    assert(e.streamingJob("jc_cnt").nonEmpty, "agg-on-join must chain")
    assert(e.table("jc_cnt").orderBy("id").as[(Long, Long)]
      .collect().toSeq == Seq((1L, 2L), (2L, 1L), (3L, 1L)))

    // CONCURRENT deletes of both halves of the pair (3,12) in one round:
    // joining deletes against the other side's storage would orphan the
    // pair — the downstream-storage retraction must remove it; also
    // delete one b row of a surviving a row
    Seq(evd(3, 9, 3.0)).toDF("value").coalesce(1).write.mode("append").text(aDir)
    Seq(odd(12, 9, 7.0), odd(11, 7, 6.0))
      .toDF("value").coalesce(1).write.mode("append").text(bDir)
    e.execute("FLUSH")
    assert(e.table("jc_j").orderBy("id", "oid").as[(Long, Long, Double)]
      .collect().toSeq == Seq((1L, 10L, 6.0), (2L, 13L, 10.0)),
      "concurrent both-side deletes must not orphan joined rows")
    assert(e.table("jc_cnt").orderBy("id").as[(Long, Long)]
      .collect().toSeq == Seq((1L, 1L), (2L, 1L)),
      "join deletes must retract through the stacked aggregate")

    // restart: recovery re-wires sources → a,b → join tail → agg tail
    Seq("jc_a", "jc_b", "jc_j", "jc_cnt")
      .foreach(n => e.streamingJob(n).foreach(_.stop()))
    val e2 = new Engine(spark.newSession(), wh)
    Seq(ev(4, 7, 4.0)).toDF("value").coalesce(1).write.mode("append").text(aDir)
    e2.execute("FLUSH")
    assert(e2.table("jc_j").orderBy("id", "oid").as[(Long, Long, Double)]
      .collect().toSeq == Seq((1L, 10L, 6.0), (2L, 13L, 10.0), (4L, 10L, 9.0)),
      "restarted join chain did not advance")
    assert(e2.table("jc_cnt").orderBy("id").as[(Long, Long)]
      .collect().toSeq == Seq((1L, 1L), (2L, 1L), (4L, 1L)),
      "restarted agg-on-join chain did not advance")
    Seq("jc_a", "jc_b", "jc_j", "jc_cnt")
      .foreach(n => e2.streamingJob(n).foreach(_.stop()))
  }

  test("SELECT DISTINCT over a streaming MV chains via the aggregate path") {
    val wh = tmpDir("distchain")
    val e = new Engine(spark, wh)
    val srcDir = tmpDir("distchain-src")
    def ins(id: Int, g: Int) =
      s"""{"before": null, "after": {"id": $id, "g": $g}, "op": "c"}"""
    def del(id: Int, g: Int) =
      s"""{"before": {"id": $id, "g": $g}, "after": null, "op": "d"}"""
    Seq(ins(1, 5), ins(2, 5), ins(3, 6))
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute(s"""CREATE SOURCE dk_src (id BIGINT, g BIGINT)
                 |WITH (path = '$srcDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute("CREATE MATERIALIZED VIEW dk_a (PRIMARY KEY (id)) AS " +
      "SELECT id, g FROM dk_src")
    // DISTINCT = grouped aggregate on all columns, PK = those columns
    e.execute("CREATE MATERIALIZED VIEW dk_d (PRIMARY KEY (g)) AS " +
      "SELECT DISTINCT g FROM dk_a")
    e.execute("FLUSH")
    assert(e.streamingJob("dk_d").nonEmpty,
      "DISTINCT over a streaming MV must chain continuously")
    assert(e.table("dk_d").orderBy("g").as[Long].collect().toSeq == Seq(5L, 6L))
    // deleting the last row of a distinct value retracts it
    Seq(del(3, 6)).toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute("FLUSH")
    assert(e.table("dk_d").orderBy("g").as[Long].collect().toSeq == Seq(5L))
    // deleting ONE of two rows sharing a value keeps it
    Seq(del(1, 5)).toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute("FLUSH")
    assert(e.table("dk_d").orderBy("g").as[Long].collect().toSeq == Seq(5L))
    Seq("dk_a", "dk_d").foreach(n => e.streamingJob(n).foreach(_.stop()))
  }

  test("banded join MV: equi prefix + theta band chains incrementally; pure theta fences to batch refresh") {
    val wh = tmpDir("bandchain")
    val e = new Engine(spark, wh)
    val (aDir, bDir) = (tmpDir("band-a"), tmpDir("band-b"))
    def ev(id: Int, k: Int, v: Double) =
      s"""{"before": null, "after": {"id": $id, "k": $k, "v": $v}, "op": "c"}"""
    def evd(id: Int, k: Int, v: Double) =
      s"""{"before": {"id": $id, "k": $k, "v": $v}, "after": null, "op": "d"}"""
    def od(oid: Int, k: Int, w: Double) =
      s"""{"before": null, "after": {"oid": $oid, "k": $k, "w": $w}, "op": "c"}"""
    def odd(oid: Int, k: Int, w: Double) =
      s"""{"before": {"oid": $oid, "k": $k, "w": $w}, "after": null, "op": "d"}"""
    Seq(ev(1, 7, 10.0), ev(2, 7, 50.0))
      .toDF("value").coalesce(1).write.mode("append").text(aDir)
    // 12.0 is inside row 1's band [10,20], 55.0 inside row 2's [50,60],
    // 95.0 inside neither; all share the equi key k=7
    Seq(od(10, 7, 12.0), od(11, 7, 55.0), od(12, 7, 95.0))
      .toDF("value").coalesce(1).write.mode("append").text(bDir)
    e.execute(s"""CREATE SOURCE bd_asrc (id BIGINT, k BIGINT, v DOUBLE)
                 |WITH (path = '$aDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute(s"""CREATE SOURCE bd_bsrc (oid BIGINT, k BIGINT, w DOUBLE)
                 |WITH (path = '$bDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute("CREATE MATERIALIZED VIEW bd_a (PRIMARY KEY (id)) AS " +
      "SELECT id, k, v FROM bd_asrc")
    e.execute("CREATE MATERIALIZED VIEW bd_b (PRIMARY KEY (oid)) AS " +
      "SELECT oid, k AS bk, w FROM bd_bsrc")
    e.execute("FLUSH")
    // the banded join: equi prefix (k = bk) + theta band on the value —
    // the reference's non-equi-condition-as-post-filter on the hash probe
    e.execute(
      """CREATE MATERIALIZED VIEW bd_j (PRIMARY KEY (id, oid)) AS
        |SELECT bd_a.id, bd_b.oid, bd_b.w - bd_a.v AS d
        |FROM bd_a JOIN bd_b
        |ON bd_a.k = bd_b.bk AND bd_b.w BETWEEN bd_a.v AND bd_a.v + 10""".stripMargin)
    e.execute("FLUSH")
    assert(e.streamingJob("bd_j").nonEmpty,
      "banded join over two streaming MVs must chain continuously")
    assert(e.table("bd_j").orderBy("id", "oid").as[(Long, Long, Double)]
      .collect().toSeq == Seq((1L, 10L, 2.0), (2L, 11L, 5.0)))

    // a new b row lands in ONE band only despite matching both equi keys;
    // a new a row picks up only the in-band b rows
    Seq(ev(3, 7, 90.0)).toDF("value").coalesce(1).write.mode("append").text(aDir)
    Seq(od(13, 7, 18.0)).toDF("value").coalesce(1).write.mode("append").text(bDir)
    e.execute("FLUSH")
    assert(e.table("bd_j").orderBy("id", "oid").as[(Long, Long, Double)]
      .collect().toSeq == Seq((1L, 10L, 2.0), (1L, 13L, 8.0),
        (2L, 11L, 5.0), (3L, 12L, 5.0)))

    // deletes retract only the pairs the deleted rows were part of
    Seq(evd(1, 7, 10.0)).toDF("value").coalesce(1).write.mode("append").text(aDir)
    Seq(odd(12, 7, 95.0)).toDF("value").coalesce(1).write.mode("append").text(bDir)
    e.execute("FLUSH")
    assert(e.table("bd_j").orderBy("id", "oid").as[(Long, Long, Double)]
      .collect().toSeq == Seq((2L, 11L, 5.0)),
      "band-join deletes must retract through downstream storage")

    // LEFT OUTER with a band: unmatched preserved rows null-extend and
    // repair as the other side's band membership changes
    e.execute(
      """CREATE MATERIALIZED VIEW bd_lj (PRIMARY KEY (id, oid)) AS
        |SELECT bd_a.id, bd_b.oid, bd_a.v
        |FROM bd_a LEFT JOIN bd_b
        |ON bd_a.k = bd_b.bk AND bd_b.w BETWEEN bd_a.v AND bd_a.v + 10""".stripMargin)
    e.execute("FLUSH")
    assert(e.streamingJob("bd_lj").nonEmpty, "banded left join must chain")
    assert(e.table("bd_lj").orderBy("id", "oid").as[(Long, Option[Long], Double)]
      .collect().toSeq == Seq((2L, Some(11L), 50.0), (3L, None, 90.0)))
    // a b row entering row 3's band retracts its null-extension
    Seq(od(14, 7, 93.0)).toDF("value").coalesce(1).write.mode("append").text(bDir)
    e.execute("FLUSH")
    assert(e.table("bd_lj").orderBy("id", "oid").as[(Long, Option[Long], Double)]
      .collect().toSeq == Seq((2L, Some(11L), 50.0), (3L, Some(14L), 90.0)),
      "gaining a first in-band match must retract the null-extension")
    assert(e.table("bd_j").orderBy("id", "oid").as[(Long, Long, Double)]
      .collect().toSeq == Seq((2L, 11L, 5.0), (3L, 14L, 3.0)))

    // PURE theta (no equality conjunct): fences to batch refresh with an
    // explicit notice — never a silent degradation
    e.notices.clear()
    e.execute(
      """CREATE MATERIALIZED VIEW bd_theta (PRIMARY KEY (id, oid)) AS
        |SELECT bd_a.id, bd_b.oid FROM bd_a JOIN bd_b
        |ON bd_b.w < bd_a.v""".stripMargin)
    assert(e.streamingJob("bd_theta").isEmpty,
      "a pure-theta join must not claim streaming maintenance")
    assert(e.notices.exists(n => n.contains("bd_theta") &&
      n.contains("BATCH REFRESH")),
      s"pure-theta degradation must be announced; got ${e.notices}")
    assert(e.table("bd_theta").count() > 0)

    Seq("bd_a", "bd_b", "bd_j", "bd_lj")
      .foreach(n => e.streamingJob(n).foreach(_.stop()))
  }

  test("UNION DISTINCT and aggregate-over-UNION-ALL chain as one MV") {
    // UNION DISTINCT ≡ GROUP BY every output column (the reference's
    // union_to_distinct rewrite) — maintained by IncrementalUnionAgg's
    // touched-group recompute over both upstream stores; the general
    // form (any grouped aggregate over a 2-input UNION ALL) chains the
    // same way. Upstreams here are DML TABLES, so this also covers the
    // two-input chain-over-table path.
    val wh = tmpDir("uniagg")
    val e = new Engine(spark, wh)
    e.execute("CREATE TABLE ua (id BIGINT PRIMARY KEY, k BIGINT, x BIGINT)")
    e.execute("CREATE TABLE ub (id BIGINT PRIMARY KEY, k BIGINT, x BIGINT)")
    e.execute(
      """CREATE MATERIALIZED VIEW ud (PRIMARY KEY (k)) AS
        |SELECT k FROM ua UNION SELECT k FROM ub""".stripMargin)
    e.execute(
      """CREATE MATERIALIZED VIEW usum (PRIMARY KEY (k)) AS
        |SELECT k, count(*) AS n, sum(x) AS sx FROM
        |(SELECT k, x FROM ua UNION ALL SELECT k, x * 10 AS x FROM ub) u
        |GROUP BY k""".stripMargin)
    assert(e.streamingJob("ud").nonEmpty, "UNION DISTINCT must chain")
    assert(e.streamingJob("usum").nonEmpty, "agg over UNION ALL must chain")

    e.execute("INSERT INTO ua VALUES (1, 1, 5), (2, 2, 7)")
    e.execute("INSERT INTO ub VALUES (1, 2, 3), (2, 3, 4)")
    e.execute("FLUSH")
    assert(e.table("ud").orderBy("k").as[Long].collect().toSeq == Seq(1L, 2L, 3L))
    assert(e.table("usum").orderBy("k").as[(Long, Long, Long)].collect().toSeq ==
      Seq((1L, 1L, 5L), (2L, 2L, 37L), (3L, 1L, 40L)))

    // group-moving update on one side: k 3 retracts, k 9 appears
    e.execute("UPDATE ub SET k = 9 WHERE id = 2")
    e.execute("FLUSH")
    assert(e.table("ud").orderBy("k").as[Long].collect().toSeq == Seq(1L, 2L, 9L))
    assert(e.table("usum").orderBy("k").as[(Long, Long, Long)].collect().toSeq ==
      Seq((1L, 1L, 5L), (2L, 2L, 37L), (9L, 1L, 40L)))

    // delete empties group 1 entirely — its aggregate row must retract
    e.execute("DELETE FROM ua WHERE id = 1")
    e.execute("FLUSH")
    assert(e.table("ud").orderBy("k").as[Long].collect().toSeq == Seq(2L, 9L))
    assert(e.table("usum").orderBy("k").as[(Long, Long, Long)].collect().toSeq ==
      Seq((2L, 2L, 37L), (9L, 1L, 40L)))

    // restart, then delete a PRE-restart row: the recovered chain must
    // retract it (also proves the recovered bucket layout matches the
    // creation-time layout — a left-PK binding would silently duplicate)
    Seq("ud", "usum").foreach(n => e.streamingJob(n).foreach(_.stop()))
    val e2 = new Engine(spark.newSession(), wh)
    assert(e2.recoveryPending.isEmpty, s"pending: ${e2.recoveryPending}")
    e2.execute("DELETE FROM ub WHERE id = 1")
    e2.execute("FLUSH")
    assert(e2.table("ud").orderBy("k").as[Long].collect().toSeq == Seq(2L, 9L))
    assert(e2.table("usum").orderBy("k").as[(Long, Long, Long)].collect().toSeq ==
      Seq((2L, 1L, 7L), (9L, 1L, 40L)))
    Seq("ud", "usum").foreach(n => e2.streamingJob(n).foreach(_.stop()))
  }

  test("INTERSECT and EXCEPT (distinct) chain as incrementally-maintained MVs") {
    // distinct set ops ride the agg-over-union machinery: group = the
    // full output row, touched keys derived by replaying the query with
    // the set-op node swapped for UNION ALL (a right-side EXCEPT insert
    // must name — and retract — the left row it newly cancels). ALL
    // variants carry multiplicities a PK-keyed store cannot hold and
    // take the loud batch-refresh fence, as in the reference.
    val wh = tmpDir("setopchain")
    val e = new Engine(spark, wh)
    e.execute("CREATE TABLE sa (id BIGINT PRIMARY KEY, k BIGINT)")
    e.execute("CREATE TABLE sb (id BIGINT PRIMARY KEY, k BIGINT)")
    e.execute(
      """CREATE MATERIALIZED VIEW si (PRIMARY KEY (k)) AS
        |SELECT k FROM sa INTERSECT SELECT k FROM sb""".stripMargin)
    e.execute(
      """CREATE MATERIALIZED VIEW sx (PRIMARY KEY (k)) AS
        |SELECT k FROM sa EXCEPT SELECT k FROM sb""".stripMargin)
    assert(e.streamingJob("si").nonEmpty, "INTERSECT must chain")
    assert(e.streamingJob("sx").nonEmpty, "EXCEPT must chain")

    e.execute("INSERT INTO sa VALUES (1, 1), (2, 2), (3, 3)")
    e.execute("INSERT INTO sb VALUES (1, 2), (2, 4)")
    e.execute("FLUSH")
    def si(en: Engine) = en.table("si").orderBy("k").as[Long].collect().toSeq
    def sx(en: Engine) = en.table("sx").orderBy("k").as[Long].collect().toSeq
    assert(si(e) == Seq(2L))
    assert(sx(e) == Seq(1L, 3L))

    // right-side INSERT retracts from EXCEPT and enters INTERSECT
    e.execute("INSERT INTO sb VALUES (3, 1)")
    e.execute("FLUSH")
    assert(si(e) == Seq(1L, 2L))
    assert(sx(e) == Seq(3L))

    // right-side DELETE restores the EXCEPT row / retracts the intersect
    e.execute("DELETE FROM sb WHERE id = 1")
    e.execute("FLUSH")
    assert(si(e) == Seq(1L))
    assert(sx(e) == Seq(2L, 3L))

    // a left-side duplicate stays distinct in both outputs
    e.execute("INSERT INTO sa VALUES (4, 3)")
    e.execute("FLUSH")
    assert(si(e) == Seq(1L))
    assert(sx(e) == Seq(2L, 3L))

    // restart: the recovered chain retracts a PRE-restart row (si empties
    // completely — the store must stay schema-correct for further epochs)
    Seq("si", "sx").foreach(n => e.streamingJob(n).foreach(_.stop()))
    val e2 = new Engine(spark.newSession(), wh)
    assert(e2.recoveryPending.isEmpty, s"pending: ${e2.recoveryPending}")
    e2.execute("DELETE FROM sa WHERE id = 1")
    e2.execute("FLUSH")
    assert(si(e2) == Seq())
    assert(sx(e2) == Seq(2L, 3L))

    // INTERSECT ALL: fenced, announced, batch-refreshed
    e2.execute(
      """CREATE MATERIALIZED VIEW sall (PRIMARY KEY (k)) AS
        |SELECT k FROM sa INTERSECT ALL SELECT k FROM sb""".stripMargin)
    assert(e2.streamingJob("sall").isEmpty,
      "INTERSECT ALL must not claim streaming maintenance")
    assert(e2.notices.exists(n => n.contains("sall") &&
      n.contains("BATCH REFRESH")),
      s"ALL-variant degradation must be announced; got ${e2.notices}")
    Seq("si", "sx").foreach(n => e2.streamingJob(n).foreach(_.stop()))
  }

  test("N-way inner join MV decomposes into cascaded binary delta joins") {
    // the reference plans multi-way streaming joins as a tree of BINARY
    // StreamHashJoins; here a 3-way join in ONE statement decomposes
    // into an internal binary chain step (__casc1) plus the visible MV,
    // each maintained by the ordinary delta-join machinery.
    val wh = tmpDir("casc")
    val e = new Engine(spark, wh)
    e.execute("CREATE TABLE c_ord (oid BIGINT PRIMARY KEY, ocid BIGINT, opid BIGINT, amt BIGINT)")
    e.execute("CREATE TABLE c_cust (cid BIGINT PRIMARY KEY, cname STRING)")
    e.execute("CREATE TABLE c_part (pid BIGINT PRIMARY KEY, pname STRING)")
    e.execute(
      """CREATE MATERIALIZED VIEW c_wide (PRIMARY KEY (oid, cid, pid)) AS
        |SELECT oid, cid, pid, amt * 2 AS amt2, cname, pname
        |FROM c_ord JOIN c_cust ON c_ord.ocid = c_cust.cid
        |           JOIN c_part ON c_ord.opid = c_part.pid
        |WHERE amt > 0""".stripMargin)
    assert(e.streamingJob("c_wide").nonEmpty, "3-way join MV must chain")
    assert(e.streamingJob("c_wide__casc1").nonEmpty, "internal step must chain")
    assert(!e.execute("SHOW MATERIALIZED VIEWS").as[String].collect()
      .exists(_.contains("__casc")), "internal steps must not be listed")

    e.execute("INSERT INTO c_cust VALUES (10, 'a'), (20, 'b')")
    e.execute("INSERT INTO c_part VALUES (100, 'x'), (200, 'y')")
    e.execute("INSERT INTO c_ord VALUES (1, 10, 100, 5), (2, 20, 200, 7), (3, 10, 200, 0)")
    e.execute("FLUSH")
    def rows(en: Engine) = en.table("c_wide").orderBy("oid")
      .as[(Long, Long, Long, Long, String, String)].collect().toSeq
    assert(rows(e) == Seq(
      (1L, 10L, 100L, 10L, "a", "x"), (2L, 20L, 200L, 14L, "b", "y")))

    // dimension update flows through the cascade; fact delete retracts
    e.execute("UPDATE c_cust SET cname = 'A' WHERE cid = 10")
    e.execute("DELETE FROM c_ord WHERE oid = 2")
    e.execute("INSERT INTO c_ord VALUES (4, 20, 100, 1)")
    e.execute("FLUSH")
    assert(rows(e) == Seq(
      (1L, 10L, 100L, 10L, "A", "x"), (4L, 20L, 100L, 2L, "b", "x")))

    // restart re-wires the whole cascade
    Seq("c_wide", "c_wide__casc1").foreach(n => e.streamingJob(n).foreach(_.stop()))
    val e2 = new Engine(spark.newSession(), wh)
    assert(e2.recoveryPending.isEmpty, s"pending: ${e2.recoveryPending}")
    e2.execute("INSERT INTO c_part VALUES (300, 'z')")
    e2.execute("INSERT INTO c_ord VALUES (5, 10, 300, 3)")
    e2.execute("FLUSH")
    assert(rows(e2) == Seq(
      (1L, 10L, 100L, 10L, "A", "x"), (4L, 20L, 100L, 2L, "b", "x"),
      (5L, 10L, 300L, 6L, "A", "z")))

    // DROP removes the internal steps with the visible MV
    e2.execute("DROP MATERIALIZED VIEW c_wide")
    assert(e2.mvs.get("c_wide").isEmpty && e2.mvs.get("c_wide__casc1").isEmpty)

    // 4-way: two internal steps, last join keyed on the FIRST table's PK
    // (carried through both cascade levels)
    e2.execute("CREATE TABLE c_shp (sid BIGINT PRIMARY KEY, soid BIGINT, carrier STRING)")
    e2.execute(
      """CREATE MATERIALIZED VIEW c_wide4 (PRIMARY KEY (oid, cid, pid, sid)) AS
        |SELECT oid, cid, pid, sid, carrier, cname
        |FROM c_ord JOIN c_cust ON c_ord.ocid = c_cust.cid
        |           JOIN c_part ON c_ord.opid = c_part.pid
        |           JOIN c_shp ON c_shp.soid = c_ord.oid""".stripMargin)
    assert(e2.streamingJob("c_wide4__casc1").nonEmpty &&
      e2.streamingJob("c_wide4__casc2").nonEmpty &&
      e2.streamingJob("c_wide4").nonEmpty, "4-way cascade must chain")
    e2.execute("INSERT INTO c_shp VALUES (7, 1, 'UPS'), (8, 5, 'DHL')")
    e2.execute("FLUSH")
    def rows4 = e2.table("c_wide4").orderBy("oid")
      .as[(Long, Long, Long, Long, String, String)].collect().toSeq
    assert(rows4 == Seq(
      (1L, 10L, 100L, 7L, "UPS", "A"), (5L, 10L, 300L, 8L, "DHL", "A")))
    e2.execute("DELETE FROM c_shp WHERE sid = 7")
    e2.execute("FLUSH")
    assert(rows4 == Seq((5L, 10L, 300L, 8L, "DHL", "A")))
    e2.execute("DROP MATERIALIZED VIEW c_wide4")
    assert(e2.mvs.get("c_wide4__casc2").isEmpty)

    // mixed OUTER spine: LEFT then INNER — the null-extension repair
    // flows through the cascade when the dimension row arrives late
    e2.execute(
      """CREATE MATERIALIZED VIEW c_mix (PRIMARY KEY (oid, cid, pid)) AS
        |SELECT oid, cid, pid, cname, pname
        |FROM c_ord LEFT JOIN c_cust ON c_ord.ocid = c_cust.cid
        |           JOIN c_part ON c_ord.opid = c_part.pid""".stripMargin)
    assert(e2.streamingJob("c_mix").nonEmpty &&
      e2.streamingJob("c_mix__casc1").nonEmpty, "mixed outer cascade must chain")
    e2.execute("INSERT INTO c_ord VALUES (6, 99, 100, 2)")
    e2.execute("FLUSH")
    def rowsMix = e2.table("c_mix").orderBy("oid")
      .as[(Long, Option[Long], Long, Option[String], String)].collect().toSeq
    assert(rowsMix == Seq(
      (1L, Some(10L), 100L, Some("A"), "x"),
      (3L, Some(10L), 200L, Some("A"), "y"),
      (4L, Some(20L), 100L, Some("b"), "x"),
      (5L, Some(10L), 300L, Some("A"), "z"),
      (6L, None, 100L, None, "x")))
    e2.execute("INSERT INTO c_cust VALUES (99, 'n')")
    e2.execute("FLUSH")
    assert(rowsMix == Seq(
      (1L, Some(10L), 100L, Some("A"), "x"),
      (3L, Some(10L), 200L, Some("A"), "y"),
      (4L, Some(20L), 100L, Some("b"), "x"),
      (5L, Some(10L), 300L, Some("A"), "z"),
      (6L, Some(99L), 100L, Some("n"), "x")),
      "late dimension row must repair the null-extension through the cascade")
    Seq("c_mix", "c_mix__casc1").foreach(n => e2.streamingJob(n).foreach(_.stop()))
  }

  test("tumbling-window aggregate MV over a DML table chains") {
    val e = new Engine(spark, tmpDir("twtbl"))
    e.execute("CREATE TABLE tw_ev (id BIGINT PRIMARY KEY, ts TIMESTAMP, v BIGINT)")
    e.execute(
      """CREATE MATERIALIZED VIEW tw_sum (PRIMARY KEY (window_start)) AS
        |SELECT window_start, sum(v) AS sv
        |FROM TUMBLE(tw_ev, ts, INTERVAL '1 hour') GROUP BY window_start""".stripMargin)
    assert(e.streamingJob("tw_sum").nonEmpty, "tumble agg over a table must chain")
    e.execute("INSERT INTO tw_ev VALUES " +
      "(1, TIMESTAMP '2024-01-01 10:05:00', 2), " +
      "(2, TIMESTAMP '2024-01-01 10:40:00', 3), " +
      "(3, TIMESTAMP '2024-01-01 11:10:00', 5)")
    e.execute("FLUSH")
    def wins = e.table("tw_sum").orderBy("window_start")
      .select(col("window_start").cast("string"), col("sv"))
      .as[(String, Long)].collect().toSeq
    assert(wins == Seq(("2024-01-01 10:00:00", 5L), ("2024-01-01 11:00:00", 5L)))
    // UPDATE moves a row ACROSS windows: U- retracts from the old one
    e.execute("UPDATE tw_ev SET ts = TIMESTAMP '2024-01-01 11:20:00' WHERE id = 2")
    e.execute("FLUSH")
    assert(wins == Seq(("2024-01-01 10:00:00", 2L), ("2024-01-01 11:00:00", 8L)))
    // deleting the last row of a window retracts the window row entirely
    e.execute("DELETE FROM tw_ev WHERE id = 1")
    e.execute("FLUSH")
    assert(wins == Seq(("2024-01-01 11:00:00", 8L)))
    e.streamingJob("tw_sum").foreach(_.stop())
  }

  test("three-way streaming join: a join MV joins a third MV (join-on-join)") {
    val wh = tmpDir("join3")
    val e = new Engine(spark, wh)
    val (aDir, bDir, cDir) =
      (tmpDir("join3-a"), tmpDir("join3-b"), tmpDir("join3-c"))
    def row(fields: String) = s"""{"before": null, "after": {$fields}, "op": "c"}"""
    def drow(fields: String) = s"""{"before": {$fields}, "after": null, "op": "d"}"""
    Seq(row("\"aid\": 1, \"k\": 7"), row("\"aid\": 2, \"k\": 8"))
      .toDF("value").coalesce(1).write.mode("append").text(aDir)
    Seq(row("\"bid\": 10, \"k\": 7, \"m\": 3"))
      .toDF("value").coalesce(1).write.mode("append").text(bDir)
    Seq(row("\"cid\": 100, \"m\": 3"), row("\"cid\": 101, \"m\": 4"))
      .toDF("value").coalesce(1).write.mode("append").text(cDir)
    e.execute(s"""CREATE SOURCE j3_asrc (aid BIGINT, k BIGINT)
                 |WITH (path = '$aDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute(s"""CREATE SOURCE j3_bsrc (bid BIGINT, k BIGINT, m BIGINT)
                 |WITH (path = '$bDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute(s"""CREATE SOURCE j3_csrc (cid BIGINT, m BIGINT)
                 |WITH (path = '$cDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute("CREATE MATERIALIZED VIEW j3_a (PRIMARY KEY (aid)) AS " +
      "SELECT aid, k FROM j3_asrc")
    e.execute("CREATE MATERIALIZED VIEW j3_b (PRIMARY KEY (bid)) AS " +
      "SELECT bid, k AS bk, m FROM j3_bsrc")
    e.execute("CREATE MATERIALIZED VIEW j3_c (PRIMARY KEY (cid)) AS " +
      "SELECT cid, m AS cm FROM j3_csrc")
    e.execute("FLUSH")
    e.execute(
      """CREATE MATERIALIZED VIEW j3_ab (PRIMARY KEY (aid, bid)) AS
        |SELECT j3_a.aid, j3_b.bid, j3_b.m
        |FROM j3_a JOIN j3_b ON j3_a.k = j3_b.bk""".stripMargin)
    e.execute("FLUSH")
    // the second join consumes the FIRST join MV's changelog
    e.execute(
      """CREATE MATERIALIZED VIEW j3_abc (PRIMARY KEY (aid, bid, cid)) AS
        |SELECT j3_ab.aid, j3_ab.bid, j3_c.cid
        |FROM j3_ab JOIN j3_c ON j3_ab.m = j3_c.cm""".stripMargin)
    e.execute("FLUSH")
    assert(e.streamingJob("j3_abc").nonEmpty, "join-on-join must chain")
    assert(e.table("j3_abc").orderBy("aid", "bid", "cid")
      .as[(Long, Long, Long)].collect().toSeq == Seq((1L, 10L, 100L)))

    // an insert at the FAR side (c) flows through the stacked join;
    // an insert at a flows through both joins
    Seq(row("\"cid\": 102, \"m\": 3"))
      .toDF("value").coalesce(1).write.mode("append").text(cDir)
    Seq(row("\"aid\": 3, \"k\": 7"))
      .toDF("value").coalesce(1).write.mode("append").text(aDir)
    e.execute("FLUSH")
    assert(e.table("j3_abc").orderBy("aid", "bid", "cid")
      .as[(Long, Long, Long)].collect().toSeq ==
      Seq((1L, 10L, 100L), (1L, 10L, 102L), (3L, 10L, 100L), (3L, 10L, 102L)))

    // a delete at b empties the whole pipeline
    Seq(drow("\"bid\": 10, \"k\": 7, \"m\": 3"))
      .toDF("value").coalesce(1).write.mode("append").text(bDir)
    e.execute("FLUSH")
    assert(e.table("j3_abc").count() == 0,
      "mid-pipeline delete must cascade through both joins")
    Seq("j3_a", "j3_b", "j3_c", "j3_ab", "j3_abc")
      .foreach(n => e.streamingJob(n).foreach(_.stop()))
  }

  test("LEFT OUTER delta join: null-extensions retract on first match, restore on last unmatch") {
    val wh = tmpDir("lojoin")
    val e = new Engine(spark, wh)
    val (aDir, bDir) = (tmpDir("lojoin-a"), tmpDir("lojoin-b"))
    def a(id: Int, k: Int) =
      s"""{"before": null, "after": {"id": $id, "k": $k}, "op": "c"}"""
    def da(id: Int, k: Int) =
      s"""{"before": {"id": $id, "k": $k}, "after": null, "op": "d"}"""
    def b(oid: Int, k: Int, w: Double) =
      s"""{"before": null, "after": {"oid": $oid, "k": $k, "w": $w}, "op": "c"}"""
    def db(oid: Int, k: Int, w: Double) =
      s"""{"before": {"oid": $oid, "k": $k, "w": $w}, "after": null, "op": "d"}"""
    Seq(a(1, 7), a(2, 8)).toDF("value").coalesce(1).write.mode("append").text(aDir)
    Seq(b(10, 7, 5.0)).toDF("value").coalesce(1).write.mode("append").text(bDir)
    e.execute(s"""CREATE SOURCE lo_asrc (id BIGINT, k BIGINT)
                 |WITH (path = '$aDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute(s"""CREATE SOURCE lo_bsrc (oid BIGINT, k BIGINT, w DOUBLE)
                 |WITH (path = '$bDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute("CREATE MATERIALIZED VIEW lo_a (PRIMARY KEY (id)) AS " +
      "SELECT id, k FROM lo_asrc")
    e.execute("CREATE MATERIALIZED VIEW lo_b (PRIMARY KEY (oid)) AS " +
      "SELECT oid, k AS bk, w FROM lo_bsrc")
    e.execute("FLUSH")
    e.execute(
      """CREATE MATERIALIZED VIEW lo_j (PRIMARY KEY (id, oid)) AS
        |SELECT lo_a.id, lo_b.oid, lo_b.w
        |FROM lo_a LEFT JOIN lo_b ON lo_a.k = lo_b.bk""".stripMargin)
    e.execute("FLUSH")
    assert(e.streamingJob("lo_j").nonEmpty, "LEFT OUTER join must chain")
    def state() = e.table("lo_j").orderBy("id", "oid")
      .as[(Long, Option[Long], Option[Double])].collect().toSeq
    // backfill: id=1 matched, id=2 null-extended
    assert(state() == Seq((1L, Some(10L), Some(5.0)), (2L, None, None)))

    // first match for id=2 retracts its null-extension
    Seq(b(11, 8, 6.0)).toDF("value").coalesce(1).write.mode("append").text(bDir)
    e.execute("FLUSH")
    assert(state() == Seq((1L, Some(10L), Some(5.0)), (2L, Some(11L), Some(6.0))),
      "first match must retract the null-extension row")

    // deleting id=2's LAST match restores the null-extension
    Seq(db(11, 8, 6.0)).toDF("value").coalesce(1).write.mode("append").text(bDir)
    e.execute("FLUSH")
    assert(state() == Seq((1L, Some(10L), Some(5.0)), (2L, None, None)),
      "losing the last match must restore the null-extension row")

    // an unmatched LEFT insert null-extends immediately; deleting a left
    // row removes its null-extension
    Seq(a(3, 9), da(2, 8)).toDF("value").coalesce(1).write.mode("append").text(aDir)
    e.execute("FLUSH")
    assert(state() == Seq((1L, Some(10L), Some(5.0)), (3L, None, None)))

    // restart: recovery keeps the outer semantics (repair path included)
    Seq("lo_a", "lo_b", "lo_j").foreach(n => e.streamingJob(n).foreach(_.stop()))
    val e2 = new Engine(spark.newSession(), wh)
    Seq(b(12, 9, 7.0)).toDF("value").coalesce(1).write.mode("append").text(bDir)
    e2.execute("FLUSH")
    assert(e2.table("lo_j").orderBy("id", "oid")
      .as[(Long, Option[Long], Option[Double])].collect().toSeq ==
      Seq((1L, Some(10L), Some(5.0)), (3L, Some(12L), Some(7.0))),
      "restarted outer chain must retract the null-extension on new match")
    Seq("lo_a", "lo_b", "lo_j").foreach(n => e2.streamingJob(n).foreach(_.stop()))

    // RIGHT OUTER mirrors: preserved side is the right MV
    val e3 = new Engine(spark, tmpDir("rojoin"))
    val (a3, b3) = (tmpDir("rojoin-a"), tmpDir("rojoin-b"))
    Seq(a(1, 7)).toDF("value").coalesce(1).write.mode("append").text(a3)
    Seq(b(10, 7, 5.0), b(11, 8, 6.0))
      .toDF("value").coalesce(1).write.mode("append").text(b3)
    e3.execute(s"""CREATE SOURCE ro_asrc (id BIGINT, k BIGINT)
                  |WITH (path = '$a3') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e3.execute(s"""CREATE SOURCE ro_bsrc (oid BIGINT, k BIGINT, w DOUBLE)
                  |WITH (path = '$b3') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e3.execute("CREATE MATERIALIZED VIEW ro_a (PRIMARY KEY (id)) AS " +
      "SELECT id, k FROM ro_asrc")
    e3.execute("CREATE MATERIALIZED VIEW ro_b (PRIMARY KEY (oid)) AS " +
      "SELECT oid, k AS bk, w FROM ro_bsrc")
    e3.execute("FLUSH")
    e3.execute(
      """CREATE MATERIALIZED VIEW ro_j (PRIMARY KEY (id, oid)) AS
        |SELECT ro_a.id, ro_b.oid, ro_b.w
        |FROM ro_a RIGHT JOIN ro_b ON ro_a.k = ro_b.bk""".stripMargin)
    e3.execute("FLUSH")
    assert(e3.streamingJob("ro_j").nonEmpty, "RIGHT OUTER join must chain")
    def st3() = e3.table("ro_j").orderBy("oid")
      .as[(Option[Long], Long, Double)].collect().toSeq
    assert(st3() == Seq((Some(1L), 10L, 5.0), (None, 11L, 6.0)))
    // a new LEFT row matches oid=11 → its null-extension retracts
    Seq(a(2, 8)).toDF("value").coalesce(1).write.mode("append").text(a3)
    e3.execute("FLUSH")
    assert(st3() == Seq((Some(1L), 10L, 5.0), (Some(2L), 11L, 6.0)),
      "right-preserved null-extension must retract on first left match")
    // deleting that left row restores it
    Seq(da(2, 8)).toDF("value").coalesce(1).write.mode("append").text(a3)
    e3.execute("FLUSH")
    assert(st3() == Seq((Some(1L), 10L, 5.0), (None, 11L, 6.0)),
      "right-preserved null-extension must restore on last left unmatch")
    Seq("ro_a", "ro_b", "ro_j").foreach(n => e3.streamingJob(n).foreach(_.stop()))
  }

  test("FULL OUTER delta join: null-extensions maintained on BOTH sides") {
    val wh = tmpDir("fojoin")
    val e = new Engine(spark, wh)
    val (aDir, bDir) = (tmpDir("fojoin-a"), tmpDir("fojoin-b"))
    def a(id: Int, k: Int) =
      s"""{"before": null, "after": {"id": $id, "k": $k}, "op": "c"}"""
    def da(id: Int, k: Int) =
      s"""{"before": {"id": $id, "k": $k}, "after": null, "op": "d"}"""
    def b(oid: Int, k: Int, w: Double) =
      s"""{"before": null, "after": {"oid": $oid, "k": $k, "w": $w}, "op": "c"}"""
    def db(oid: Int, k: Int, w: Double) =
      s"""{"before": {"oid": $oid, "k": $k, "w": $w}, "after": null, "op": "d"}"""
    Seq(a(1, 7), a(2, 8)).toDF("value").coalesce(1).write.mode("append").text(aDir)
    Seq(b(10, 7, 5.0), b(11, 9, 6.0))
      .toDF("value").coalesce(1).write.mode("append").text(bDir)
    e.execute(s"""CREATE SOURCE fo_asrc (id BIGINT, k BIGINT)
                 |WITH (path = '$aDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute(s"""CREATE SOURCE fo_bsrc (oid BIGINT, k BIGINT, w DOUBLE)
                 |WITH (path = '$bDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute("CREATE MATERIALIZED VIEW fo_a (PRIMARY KEY (id)) AS " +
      "SELECT id, k FROM fo_asrc")
    e.execute("CREATE MATERIALIZED VIEW fo_b (PRIMARY KEY (oid)) AS " +
      "SELECT oid, k AS bk, w FROM fo_bsrc")
    e.execute("FLUSH")
    e.execute(
      """CREATE MATERIALIZED VIEW fo_j (PRIMARY KEY (id, oid)) AS
        |SELECT fo_a.id, fo_b.oid, fo_b.w
        |FROM fo_a FULL JOIN fo_b ON fo_a.k = fo_b.bk""".stripMargin)
    e.execute("FLUSH")
    assert(e.streamingJob("fo_j").nonEmpty, "FULL OUTER join must chain")
    def state() = e.table("fo_j").orderBy("id", "oid")
      .as[(Option[Long], Option[Long], Option[Double])].collect().toSeq
    assert(state() == Seq((None, Some(11L), Some(6.0)),
      (Some(1L), Some(10L), Some(5.0)), (Some(2L), None, None)))

    // a new LEFT row matches the right-side orphan → ITS null row goes
    Seq(a(3, 9)).toDF("value").coalesce(1).write.mode("append").text(aDir)
    e.execute("FLUSH")
    assert(state() == Seq((Some(1L), Some(10L), Some(5.0)),
      (Some(2L), None, None), (Some(3L), Some(11L), Some(6.0))),
      "right-side null-extension must retract when a left match arrives")

    // deleting the left half of a pair restores the RIGHT null-extension
    Seq(da(1, 7)).toDF("value").coalesce(1).write.mode("append").text(aDir)
    e.execute("FLUSH")
    assert(state() == Seq((None, Some(10L), Some(5.0)),
      (Some(2L), None, None), (Some(3L), Some(11L), Some(6.0))),
      "deleting the left half must null-extend the surviving right row")

    // deleting the right half restores the LEFT null-extension
    Seq(db(11, 9, 6.0)).toDF("value").coalesce(1).write.mode("append").text(bDir)
    e.execute("FLUSH")
    assert(state() == Seq((None, Some(10L), Some(5.0)),
      (Some(2L), None, None), (Some(3L), None, None)),
      "deleting the right half must null-extend the surviving left row")
    Seq("fo_a", "fo_b", "fo_j").foreach(n => e.streamingJob(n).foreach(_.stop()))
  }

  test("OVER-window MV chains off a streaming MV (frame-granular maintenance)") {
    val wh = tmpDir("ovchain")
    val e = new Engine(spark, wh)
    val srcDir = tmpDir("ovchain-src")
    def ins(id: Int, g: Int, k: Int, v: Double) =
      s"""{"before": null, "after": {"id": $id, "g": $g, "k": $k, "v": $v}, "op": "c"}"""
    def del(id: Int, g: Int, k: Int, v: Double) =
      s"""{"before": {"id": $id, "g": $g, "k": $k, "v": $v}, "after": null, "op": "d"}"""
    Seq(ins(1, 1, 10, 1.0), ins(2, 1, 11, 2.0), ins(3, 1, 13, 4.0))
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute(s"""CREATE SOURCE ov_src (id BIGINT, g BIGINT, k BIGINT, v DOUBLE)
                 |WITH (path = '$srcDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute("CREATE MATERIALIZED VIEW ov_a (PRIMARY KEY (id)) AS " +
      "SELECT id, g, k, v FROM ov_src")
    e.execute("FLUSH")
    e.execute(
      """CREATE MATERIALIZED VIEW ov_w (PRIMARY KEY (id)) AS
        |SELECT id, g, sum(v) OVER (PARTITION BY g ORDER BY k
        |  RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS rs
        |FROM ov_a""".stripMargin)
    e.execute("FLUSH")
    assert(e.streamingJob("ov_w").nonEmpty,
      "OVER window over a streaming MV must chain continuously")
    def state() = e.table("ov_w").orderBy("id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(state() == Seq((1L, 1L, 1.0), (2L, 1L, 3.0), (3L, 1L, 4.0)))

    // an insert INSIDE the frame reach recomputes only affected rows
    Seq(ins(4, 1, 12, 8.0))
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute("FLUSH")
    assert(state() == Seq((1L, 1L, 1.0), (2L, 1L, 3.0), (3L, 1L, 12.0),
      (4L, 1L, 10.0)))

    // a delete retracts its row and repairs frames that contained it
    Seq(del(2, 1, 11, 2.0))
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute("FLUSH")
    assert(state() == Seq((1L, 1L, 1.0), (3L, 1L, 12.0), (4L, 1L, 8.0)))

    // restart: recovery re-wires source → ov_a → ov_w
    Seq("ov_a", "ov_w").foreach(n => e.streamingJob(n).foreach(_.stop()))
    val e2 = new Engine(spark.newSession(), wh)
    Seq(ins(5, 2, 1, 5.0))
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e2.execute("FLUSH")
    assert(e2.table("ov_w").orderBy("id").as[(Long, Long, Double)]
      .collect().toSeq == Seq((1L, 1L, 1.0), (3L, 1L, 12.0), (4L, 1L, 8.0),
        (5L, 2L, 5.0)),
      "restarted OVER chain did not advance")
    Seq("ov_a", "ov_w").foreach(n => e2.streamingJob(n).foreach(_.stop()))
  }

  test("UNION ALL MV-on-MV: both branches chain, deletes retract, restart re-wires") {
    val wh = tmpDir("unchain")
    val e = new Engine(spark, wh)
    val (aDir, bDir) = (tmpDir("unchain-a"), tmpDir("unchain-b"))
    def av(id: Int, v: Double) =
      s"""{"before": null, "after": {"id": $id, "v": $v}, "op": "c"}"""
    def avd(id: Int, v: Double) =
      s"""{"before": {"id": $id, "v": $v}, "after": null, "op": "d"}"""
    def bv(id: Int, w: Double) =
      s"""{"before": null, "after": {"id": $id, "w": $w}, "op": "c"}"""
    def bvd(id: Int, w: Double) =
      s"""{"before": {"id": $id, "w": $w}, "after": null, "op": "d"}"""
    Seq(av(1, 1.0), av(2, -5.0))
      .toDF("value").coalesce(1).write.mode("append").text(aDir)
    Seq(bv(7, 3.0)).toDF("value").coalesce(1).write.mode("append").text(bDir)
    e.execute(s"""CREATE SOURCE un_asrc (id BIGINT, v DOUBLE)
                 |WITH (path = '$aDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute(s"""CREATE SOURCE un_bsrc (id BIGINT, w DOUBLE)
                 |WITH (path = '$bDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute("CREATE MATERIALIZED VIEW un_a (PRIMARY KEY (id)) AS " +
      "SELECT id, v FROM un_asrc")
    e.execute("CREATE MATERIALIZED VIEW un_b (PRIMARY KEY (id)) AS " +
      "SELECT id, w FROM un_bsrc")
    e.execute("FLUSH")
    // branches carry their own projections/filters; PK disambiguates
    // provenance with a literal side tag
    e.execute(
      """CREATE MATERIALIZED VIEW un_u (PRIMARY KEY (src, id)) AS
        |SELECT 'a' AS src, id, v AS x FROM un_a WHERE v > 0
        |UNION ALL
        |SELECT 'b' AS src, id, w * 10 AS x FROM un_b""".stripMargin)
    e.execute("FLUSH")
    assert(e.streamingJob("un_u").nonEmpty,
      "UNION ALL of two streaming MVs must chain continuously")
    def state(en: Engine) = en.table("un_u").orderBy("src", "id")
      .as[(String, Long, Double)].collect().toSeq
    assert(state(e) == Seq(("a", 1L, 1.0), ("b", 7L, 30.0)))

    // inserts on BOTH sides advance through both tails with one FLUSH;
    // the union publishes ONE epoch sequence → an aggregate chains on top
    e.execute(
      """CREATE MATERIALIZED VIEW un_cnt (PRIMARY KEY (src)) AS
        |SELECT src, count(*) AS n FROM un_u GROUP BY src""".stripMargin)
    Seq(av(3, 2.0)).toDF("value").coalesce(1).write.mode("append").text(aDir)
    Seq(bv(8, 4.0)).toDF("value").coalesce(1).write.mode("append").text(bDir)
    e.execute("FLUSH")
    assert(state(e) == Seq(("a", 1L, 1.0), ("a", 3L, 2.0),
      ("b", 7L, 30.0), ("b", 8L, 40.0)))
    assert(e.streamingJob("un_cnt").nonEmpty, "agg-on-union must chain")
    assert(e.table("un_cnt").orderBy("src").as[(String, Long)]
      .collect().toSeq == Seq(("a", 2L), ("b", 2L)))

    // deletes on both sides retract; a row the branch's WHERE never
    // admitted deletes as a no-op
    Seq(avd(1, 1.0), avd(2, -5.0))
      .toDF("value").coalesce(1).write.mode("append").text(aDir)
    Seq(bvd(7, 3.0)).toDF("value").coalesce(1).write.mode("append").text(bDir)
    e.execute("FLUSH")
    assert(state(e) == Seq(("a", 3L, 2.0), ("b", 8L, 40.0)),
      "deletes must retract through both union branches")
    assert(e.table("un_cnt").orderBy("src").as[(String, Long)]
      .collect().toSeq == Seq(("a", 1L), ("b", 1L)),
      "union deletes must retract through the stacked aggregate")

    // restart: recovery re-wires sources → a,b → union tail → agg tail
    Seq("un_a", "un_b", "un_u", "un_cnt")
      .foreach(n => e.streamingJob(n).foreach(_.stop()))
    val e2 = new Engine(spark.newSession(), wh)
    Seq(av(4, 9.0)).toDF("value").coalesce(1).write.mode("append").text(aDir)
    e2.execute("FLUSH")
    assert(state(e2) == Seq(("a", 3L, 2.0), ("a", 4L, 9.0), ("b", 8L, 40.0)),
      "restarted union chain did not advance")
    assert(e2.table("un_cnt").orderBy("src").as[(String, Long)]
      .collect().toSeq == Seq(("a", 2L), ("b", 1L)),
      "restarted agg-on-union chain did not advance")
    Seq("un_a", "un_b", "un_u", "un_cnt")
      .foreach(n => e2.streamingJob(n).foreach(_.stop()))
  }

  test("group TOP-N (row_number + filter) over a streaming MV chains incrementally") {
    val wh = tmpDir("tnchain")
    val e = new Engine(spark, wh)
    val srcDir = tmpDir("tnchain-src")
    def ins(id: Int, g: Int, v: Int) =
      s"""{"before": null, "after": {"id": $id, "g": $g, "v": $v}, "op": "c"}"""
    def del(id: Int, g: Int, v: Int) =
      s"""{"before": {"id": $id, "g": $g, "v": $v}, "after": null, "op": "d"}"""
    Seq(ins(1, 1, 10), ins(2, 1, 20), ins(3, 1, 30), ins(6, 2, 5))
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute(s"""CREATE SOURCE tn_src (id BIGINT, g BIGINT, v BIGINT)
                 |WITH (path = '$srcDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute("CREATE MATERIALIZED VIEW tn_a (PRIMARY KEY (id)) AS " +
      "SELECT id, g, v FROM tn_src")
    e.execute("FLUSH")
    // StreamGroupTopN: per-group top-2 by v — maintained via the OVER
    // chain (row_number forces the partition-granular recompute; the
    // old-vs-new diff evicts rows that fall out of the top k)
    e.execute(
      """CREATE MATERIALIZED VIEW tn_top (PRIMARY KEY (id)) AS
        |SELECT id, g, v FROM (
        |  SELECT id, g, v,
        |         row_number() OVER (PARTITION BY g ORDER BY v DESC, id) AS rn
        |  FROM tn_a) t
        |WHERE rn <= 2""".stripMargin)
    e.execute("FLUSH")
    assert(e.streamingJob("tn_top").nonEmpty,
      "group top-n over a streaming MV must chain continuously")
    def state(en: Engine) = en.table("tn_top").orderBy("id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(state(e) == Seq((2L, 1L, 20L), (3L, 1L, 30L), (6L, 2L, 5L)))

    // a new group-1 max EVICTS the old #2 (delete must propagate)
    Seq(ins(4, 1, 40)).toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute("FLUSH")
    assert(state(e) == Seq((3L, 1L, 30L), (4L, 1L, 40L), (6L, 2L, 5L)),
      "a new top row must evict the displaced rank-3 row")

    // deleting the max RESTORES the previously-evicted row
    Seq(del(4, 1, 40)).toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute("FLUSH")
    assert(state(e) == Seq((2L, 1L, 20L), (3L, 1L, 30L), (6L, 2L, 5L)),
      "deleting a top row must restore the next-ranked row")

    // restart: recovery re-wires source → tn_a → tn_top
    Seq("tn_a", "tn_top").foreach(n => e.streamingJob(n).foreach(_.stop()))
    val e2 = new Engine(spark.newSession(), wh)
    Seq(ins(5, 2, 50)).toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e2.execute("FLUSH")
    assert(e2.table("tn_top").orderBy("id").as[(Long, Long, Long)]
      .collect().toSeq == Seq((2L, 1L, 20L), (3L, 1L, 30L), (5L, 2L, 50L),
        (6L, 2L, 5L)),
      "restarted top-n chain did not advance")
    Seq("tn_a", "tn_top").foreach(n => e2.streamingJob(n).foreach(_.stop()))
  }

  test("explode MV chains (StreamProjectSet); vocabulary agg stacks on top") {
    val wh = tmpDir("pschain")
    val e = new Engine(spark, wh)
    val srcDir = tmpDir("pschain-src")
    def ins(id: Int, text: String) =
      s"""{"before": null, "after": {"id": $id, "text": "$text"}, "op": "c"}"""
    def del(id: Int, text: String) =
      s"""{"before": {"id": $id, "text": "$text"}, "after": null, "op": "d"}"""
    Seq(ins(1, "a b a"), ins(2, "b c"))
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute(s"""CREATE SOURCE ps_src (id BIGINT, text STRING)
                 |WITH (path = '$srcDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute("CREATE MATERIALIZED VIEW ps_d (PRIMARY KEY (id)) AS " +
      "SELECT id, text FROM ps_src")
    e.execute("FLUSH")
    // per-row ProjectSet chain: Δ(explode) = explode(Δ); PK carries the
    // ordinality so duplicate tokens of one doc stay distinct rows
    e.execute(
      """CREATE MATERIALIZED VIEW ps_tok (PRIMARY KEY (id, pos)) AS
        |SELECT id, pos, tok FROM ps_d
        |LATERAL VIEW posexplode(split(text, ' ')) t AS pos, tok""".stripMargin)
    e.execute("FLUSH")
    assert(e.streamingJob("ps_tok").nonEmpty,
      "explode over a streaming MV must chain continuously")
    // STREAMING VOCABULARY: a plain agg chain stacks on the exploded MV
    e.execute(
      """CREATE MATERIALIZED VIEW ps_vocab (PRIMARY KEY (tok)) AS
        |SELECT tok, count(*) AS n FROM ps_tok GROUP BY tok""".stripMargin)
    e.execute("FLUSH")
    assert(e.streamingJob("ps_vocab").nonEmpty, "vocab agg must chain")
    def vocab(en: Engine) = en.table("ps_vocab").orderBy("tok")
      .as[(String, Long)].collect().toSeq
    assert(vocab(e) == Seq(("a", 2L), ("b", 2L), ("c", 1L)))

    // an UPDATE whose new text explodes to a DIFFERENT element count:
    // before-image retracts 3 tokens, after-image inserts 2
    Seq(del(1, "a b a"), ins(1, "c d"))
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute("FLUSH")
    assert(e.table("ps_tok").orderBy("id", "pos")
      .as[(Long, Int, String)].collect().toSeq ==
      Seq((1L, 0, "c"), (1L, 1, "d"), (2L, 0, "b"), (2L, 1, "c")),
      "update with shrinking explode must retract the stale exploded rows")
    assert(vocab(e) == Seq(("b", 1L), ("c", 2L), ("d", 1L)),
      "vocabulary counts must follow through the stacked agg")

    // restart: recovery re-wires source → docs → explode → vocab
    Seq("ps_d", "ps_tok", "ps_vocab")
      .foreach(n => e.streamingJob(n).foreach(_.stop()))
    val e2 = new Engine(spark.newSession(), wh)
    Seq(ins(3, "d d")).toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e2.execute("FLUSH")
    assert(vocab(e2) == Seq(("b", 1L), ("c", 2L), ("d", 3L)),
      "restarted explode chain did not advance")
    Seq("ps_d", "ps_tok", "ps_vocab")
      .foreach(n => e2.streamingJob(n).foreach(_.stop()))
  }

  test("aggregate over explode chains as ONE MV (StreamProjectSet→HashAgg)") {
    val wh = tmpDir("aggexpl")
    val e = new Engine(spark, wh)
    val srcDir = tmpDir("aggexpl-src")
    def ins(id: Int, text: String) =
      s"""{"before": null, "after": {"id": $id, "text": "$text"}, "op": "c"}"""
    def del(id: Int, text: String) =
      s"""{"before": {"id": $id, "text": "$text"}, "after": null, "op": "d"}"""
    Seq(ins(1, "a b a"), ins(2, "b c"))
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute(s"""CREATE SOURCE ae_src (id BIGINT, text STRING)
                 |WITH (path = '$srcDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute("CREATE MATERIALIZED VIEW ae_d (PRIMARY KEY (id)) AS " +
      "SELECT id, text FROM ae_src")
    e.execute("FLUSH")
    // group key `tok` exists only AFTER the explode: the agg chain must
    // derive touched groups by replaying the query over each delta
    e.execute(
      """CREATE MATERIALIZED VIEW ae_vocab (PRIMARY KEY (tok)) AS
        |SELECT tok, count(*) AS n FROM ae_d
        |LATERAL VIEW explode(split(text, ' ')) t AS tok
        |GROUP BY tok""".stripMargin)
    e.execute("FLUSH")
    assert(e.streamingJob("ae_vocab").nonEmpty,
      "agg-over-explode must chain continuously as a single MV")
    def vocab(en: Engine) = en.table("ae_vocab").orderBy("tok")
      .as[(String, Long)].collect().toSeq
    assert(vocab(e) == Seq(("a", 2L), ("b", 2L), ("c", 1L)))

    // update shrinking the token multiset: group `a` disappears
    // entirely, `b` decrements, `c`/`d` appear
    Seq(del(1, "a b a"), ins(1, "c d"))
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute("FLUSH")
    assert(vocab(e) == Seq(("b", 1L), ("c", 2L), ("d", 1L)),
      "vanished group must be retracted, touched groups recomputed")

    // restart: recovery re-wires the generate-mode agg chain
    Seq("ae_d", "ae_vocab").foreach(n => e.streamingJob(n).foreach(_.stop()))
    val e2 = new Engine(spark.newSession(), wh)
    Seq(ins(3, "d d")).toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e2.execute("FLUSH")
    assert(vocab(e2) == Seq(("b", 1L), ("c", 2L), ("d", 3L)),
      "restarted agg-over-explode chain did not advance")
    Seq("ae_d", "ae_vocab").foreach(n => e2.streamingJob(n).foreach(_.stop()))
  }

  test("HAVING on a chained aggregate: threshold-crossing groups enter and leave") {
    val wh = tmpDir("havchain")
    val e = new Engine(spark, wh)
    val srcDir = tmpDir("havchain-src")
    def ins(id: Int, text: String) =
      s"""{"before": null, "after": {"id": $id, "text": "$text"}, "op": "c"}"""
    def del(id: Int, text: String) =
      s"""{"before": {"id": $id, "text": "$text"}, "after": null, "op": "d"}"""
    Seq(ins(1, "a b a"), ins(2, "b c"))
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute(s"""CREATE SOURCE hv_src (id BIGINT, text STRING)
                 |WITH (path = '$srcDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute("CREATE MATERIALIZED VIEW hv_d (PRIMARY KEY (id)) AS " +
      "SELECT id, text FROM hv_src")
    e.execute("FLUSH")
    // generate mode (group key born in the explode) + HAVING: the
    // touched-key replay must NOT apply the HAVING, or groups whose
    // delta slice fails it are silently skipped
    e.execute(
      """CREATE MATERIALIZED VIEW hv_vocab (PRIMARY KEY (tok)) AS
        |SELECT tok, count(*) AS n FROM hv_d
        |LATERAL VIEW explode(split(text, ' ')) t AS tok
        |GROUP BY tok HAVING count(*) >= 2""".stripMargin)
    e.execute("FLUSH")
    assert(e.streamingJob("hv_vocab").nonEmpty,
      "HAVING aggregate over a streaming MV must chain continuously")
    def vocab(en: Engine) = en.table("hv_vocab").orderBy("tok")
      .as[(String, Long)].collect().toSeq
    assert(vocab(e) == Seq(("a", 2L), ("b", 2L)))

    // one new doc: `c` ENTERS (1→2 crosses the threshold) even though
    // the delta alone contributes only 1 `c`; `d` stays out
    Seq(ins(3, "c d")).toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute("FLUSH")
    assert(vocab(e) == Seq(("a", 2L), ("b", 2L), ("c", 2L)),
      "group entering the HAVING threshold via a delta must appear")

    // delete doc 1: `a` vanishes entirely, `b` drops 2→1 and LEAVES the
    // threshold — its stored row must be retracted even though the
    // delta-local count for `b` (1) fails the HAVING
    Seq(del(1, "a b a")).toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute("FLUSH")
    assert(vocab(e) == Seq(("c", 2L)),
      "group leaving the HAVING threshold must be retracted")

    // restart: recovery re-wires the HAVING chain
    Seq("hv_d", "hv_vocab").foreach(n => e.streamingJob(n).foreach(_.stop()))
    val e2 = new Engine(spark.newSession(), wh)
    Seq(ins(4, "b d")).toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e2.execute("FLUSH")
    assert(vocab(e2) == Seq(("b", 2L), ("c", 2L), ("d", 2L)),
      "restarted HAVING chain did not advance")
    Seq("hv_d", "hv_vocab").foreach(n => e2.streamingJob(n).foreach(_.stop()))
  }

  test("TUMBLE/HOP time-window TVFs: batch SELECT and chained windowed aggregate MVs") {
    val e = new Engine(spark, tmpDir("twtvf"))
    e.execute("CREATE TABLE tw_t (id BIGINT PRIMARY KEY, ts TIMESTAMP, v BIGINT)")
    e.execute("INSERT INTO tw_t VALUES " +
      "(1, TIMESTAMP '2024-01-01 10:05:00', 2), " +
      "(2, TIMESTAMP '2024-01-01 10:40:00', 3), " +
      "(3, TIMESTAMP '2024-01-01 11:10:00', 5)")
    // TUMBLE in FROM position (reference table_function.rs syntax):
    // every source column plus window_start/window_end
    val t = e.execute(
      """SELECT window_start, sum(v) AS sv
        |FROM TUMBLE(tw_t, ts, INTERVAL '1 hour')
        |GROUP BY window_start ORDER BY window_start""".stripMargin)
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSeq
    assert(t == Seq(("2024-01-01 10:00:00.0", 5L), ("2024-01-01 11:00:00.0", 5L)))
    // HOP(rel, col, slide, size): each row lands in size/slide windows
    val h = e.execute(
      """SELECT window_start, count(*) AS n
        |FROM HOP(tw_t, ts, INTERVAL '30 minutes', INTERVAL '1 hour')
        |GROUP BY window_start ORDER BY window_start""".stripMargin)
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSeq
    assert(h == Seq(
      ("2024-01-01 09:30:00.0", 1L), ("2024-01-01 10:00:00.0", 2L),
      ("2024-01-01 10:30:00.0", 2L), ("2024-01-01 11:00:00.0", 1L)))

    // streaming: a TUMBLE aggregate over a streaming MV chains as ONE MV
    // (window_start is born inside the window assignment → generate mode)
    val srcDir = tmpDir("twtvf-src")
    def ins(id: Int, ts: String, v: Int) =
      s"""{"before": null, "after": {"id": $id, "ts": "$ts", "v": $v}, "op": "c"}"""
    def del(id: Int, ts: String, v: Int) =
      s"""{"before": {"id": $id, "ts": "$ts", "v": $v}, "after": null, "op": "d"}"""
    Seq(ins(1, "2024-01-01 10:05:00", 2), ins(2, "2024-01-01 10:40:00", 3))
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute(s"""CREATE SOURCE tw_src (id BIGINT, ts TIMESTAMP, v BIGINT)
                 |WITH (path = '$srcDir') FORMAT DEBEZIUM ENCODE JSON""".stripMargin)
    e.execute("CREATE MATERIALIZED VIEW tw_d (PRIMARY KEY (id)) AS " +
      "SELECT id, ts, v FROM tw_src")
    e.execute("FLUSH")
    e.execute(
      """CREATE MATERIALIZED VIEW tw_hourly (PRIMARY KEY (window_start)) AS
        |SELECT window_start, count(*) AS n, sum(v) AS sv
        |FROM TUMBLE(tw_d, ts, INTERVAL '1 hour') GROUP BY window_start""".stripMargin)
    e.execute("FLUSH")
    assert(e.streamingJob("tw_hourly").nonEmpty,
      "TUMBLE aggregate over a streaming MV must chain continuously")
    def hourly = e.table("tw_hourly").orderBy("window_start")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(hourly == Seq(("2024-01-01 10:00:00.0", 2L, 5L)))
    // update moves a row ACROSS windows: old window decrements, new
    // window appears; a delete empties a window entirely
    Seq(del(2, "2024-01-01 10:40:00", 3), ins(2, "2024-01-01 11:20:00", 7),
        ins(3, "2024-01-01 12:30:00", 1))
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute("FLUSH")
    assert(hourly == Seq(("2024-01-01 10:00:00.0", 1L, 2L),
      ("2024-01-01 11:00:00.0", 1L, 7L), ("2024-01-01 12:00:00.0", 1L, 1L)),
      "row moving across tumble windows must repair both windows")
    Seq(del(3, "2024-01-01 12:30:00", 1))
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute("FLUSH")
    assert(hourly == Seq(("2024-01-01 10:00:00.0", 1L, 2L),
      ("2024-01-01 11:00:00.0", 1L, 7L)),
      "a tumble window whose last row left must be retracted")

    // HOP aggregate chains too (Expand assignment is row-linear)
    e.execute(
      """CREATE MATERIALIZED VIEW tw_sliding (PRIMARY KEY (window_start)) AS
        |SELECT window_start, sum(v) AS sv
        |FROM HOP(tw_d, ts, INTERVAL '30 minutes', INTERVAL '1 hour')
        |GROUP BY window_start""".stripMargin)
    e.execute("FLUSH")
    assert(e.streamingJob("tw_sliding").nonEmpty,
      "HOP aggregate over a streaming MV must chain continuously")
    def sliding = e.table("tw_sliding").orderBy("window_start")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSeq
    assert(sliding == Seq(
      ("2024-01-01 09:30:00.0", 2L), ("2024-01-01 10:00:00.0", 2L),
      ("2024-01-01 10:30:00.0", 7L), ("2024-01-01 11:00:00.0", 7L)))
    Seq(ins(4, "2024-01-01 10:50:00", 10))
      .toDF("value").coalesce(1).write.mode("append").text(srcDir)
    e.execute("FLUSH")
    assert(sliding == Seq(
      ("2024-01-01 09:30:00.0", 2L), ("2024-01-01 10:00:00.0", 12L),
      ("2024-01-01 10:30:00.0", 17L), ("2024-01-01 11:00:00.0", 7L)),
      "a new row must enter BOTH sliding windows it belongs to")
    Seq("tw_d", "tw_hourly", "tw_sliding")
      .foreach(n => e.streamingJob(n).foreach(_.stop()))
  }

  test("CREATE TABLE AS: explicit PK and hidden generated _row_id; DML; restart") {
    val wh = tmpDir("ctas")
    val e = new Engine(spark, wh)
    e.attachTables("/root/testdata/sf0.001")
    // explicit PK: plain materialization keyed by the declared columns
    e.execute("CREATE TABLE ctas_r (PRIMARY KEY (r_regionkey)) AS " +
      "SELECT r_regionkey, r_name FROM region")
    assert(e.table("ctas_r").count() == 5)
    e.execute("UPDATE ctas_r SET r_name = 'X' WHERE r_regionkey = 0")
    assert(e.table("ctas_r").where("r_regionkey = 0").select("r_name")
      .head().getString(0) == "X")
    // no PK: generated _row_id, hidden from star expansion
    e.execute("CREATE TABLE ctas_n AS SELECT n_name FROM nation WHERE n_regionkey = 1")
    assert(e.table("ctas_n").columns.toSeq == Seq("n_name"),
      "generated _row_id must not appear in star expansion")
    assert(e.table("ctas_n").count() == 5)
    // INSERT without the hidden column: ids generate, no collision with
    // stored rows (duplicate VALUES stay distinct rows — append table)
    e.execute("INSERT INTO ctas_n VALUES ('ZZZ'), ('ZZZ')")
    assert(e.table("ctas_n").count() == 7)
    assert(e.table("ctas_n").where("n_name = 'ZZZ'").count() == 2)
    e.execute("DELETE FROM ctas_n WHERE n_name = 'ZZZ'")
    assert(e.table("ctas_n").count() == 5)
    // restart: entries recover, hidden row id stays hidden, DML resumes
    val e2 = new Engine(spark.newSession(), wh)
    assert(e2.table("ctas_n").columns.toSeq == Seq("n_name"))
    e2.execute("INSERT INTO ctas_n VALUES ('AFTER')")
    assert(e2.table("ctas_n").count() == 6)
    assert(e2.table("ctas_r").count() == 5)
  }

  test("batch query cursor: DECLARE/FETCH n/FETCH ALL/CLOSE pagination") {
    val e = new Engine(spark, tmpDir("qcursor"))
    e.attachTables("/root/testdata/sf0.001")
    e.execute("DECLARE qc CURSOR FOR SELECT n_nationkey, n_name FROM nation " +
      "ORDER BY n_nationkey")
    // NEXT (default) = 1 row; FETCH n pages forward; ALL drains; then empty
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getAs[Number](0).longValue).toSeq
    assert(ids(e.execute("FETCH qc")) == Seq(0L))
    assert(ids(e.execute("FETCH NEXT FROM qc")) == Seq(1L))
    assert(ids(e.execute("FETCH 10 FROM qc")) == (2L to 11L))
    val rest = e.execute("FETCH FORWARD ALL qc")
    assert(rest.collect().map(_.getAs[Number](0).longValue).toSeq == (12L to 24L))
    assert(rest.columns.toSeq == Seq("n_nationkey", "n_name"))
    val empty = e.execute("FETCH 5 FROM qc")
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("n_nationkey", "n_name"))
    assert(e.execute("CLOSE qc").head().getString(0) == "CLOSE")
    // closed: FETCH now errors as unknown
    intercept[Exception] { e.execute("FETCH qc").collect() }
    // a cursor over an engine-managed MV table resolves through bindMvTables
    e.execute("CREATE TABLE qct (id BIGINT PRIMARY KEY, v STRING)")
    e.execute("INSERT INTO qct VALUES (1, 'a'), (2, 'b')")
    e.execute("DECLARE qc2 CURSOR FOR SELECT id FROM qct ORDER BY id")
    assert(ids(e.execute("FETCH ALL qc2")) == Seq(1L, 2L))
  }

  test("COMMENT ON and DISCARD: durable comments reach pg_description") {
    val wh = tmpDir("comments")
    val e = new Engine(spark, wh)
    e.execute("CREATE TABLE cm_t (id BIGINT PRIMARY KEY, v STRING)")
    e.execute("COMMENT ON TABLE cm_t IS 'it''s the table'")
    e.execute("COMMENT ON COLUMN cm_t.v IS 'the value'")
    // psql \d+ shape: description via pg_description joined on oid
    def descs(en: Engine) = en.execute(
      """SELECT d.objsubid, d.description
        |FROM pg_catalog.pg_class c
        |JOIN pg_catalog.pg_description d ON d.objoid = c.oid
        |WHERE c.relname = 'cm_t' ORDER BY d.objsubid""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(descs(e) == Seq((0, "it's the table"), (2, "the value")))
    // NULL removes; comments survive restart
    e.execute("COMMENT ON TABLE cm_t IS NULL")
    assert(descs(e) == Seq((2, "the value")))
    val e2 = new Engine(spark.newSession(), wh)
    assert(descs(e2) == Seq((2, "the value")))
    // DISCARD ALL (psql/pooler session reset) succeeds as a no-op
    assert(e.execute("DISCARD ALL").head().getString(0) == "DISCARD")
  }

  test("SHOW CREATE reconstructs re-issuable DDL from the catalog") {
    val e = new Engine(spark, tmpDir("showcreate"))
    e.execute("CREATE TABLE sc_t (id BIGINT PRIMARY KEY, v DOUBLE DEFAULT 1.5)")
    val ddl = e.execute("SHOW CREATE TABLE sc_t").head().getString(1)
    assert(ddl.contains("PRIMARY KEY (id)") && ddl.contains("DEFAULT 1.5"), ddl)
    // the shown DDL is re-issuable verbatim on a fresh engine
    val e2 = new Engine(spark.newSession(), tmpDir("showcreate2"))
    e2.execute(ddl)
    assert(e2.execute("DESCRIBE sc_t").as[(String, String)].collect().take(2)
      .toSeq == Seq(("id", "bigint"), ("v", "double")))

    e.execute("CREATE VIEW sc_v AS SELECT 1 AS one")
    assert(e.execute("SHOW CREATE VIEW sc_v").head().getString(1) ==
      "CREATE VIEW sc_v AS SELECT 1 AS one")
    e.execute("INSERT INTO sc_t VALUES (1, 2.0)")
    e.execute("CREATE MATERIALIZED VIEW sc_m (PRIMARY KEY (id)) AS " +
      "SELECT id, v * 2 AS v2 FROM sc_t")
    assert(e.execute("SHOW CREATE MATERIALIZED VIEW sc_m").head().getString(1)
      .startsWith("CREATE MATERIALIZED VIEW sc_m (PRIMARY KEY (id)) AS"))
    e.execute("CREATE INDEX sc_i ON sc_t (v)")
    assert(e.execute("SHOW CREATE INDEX sc_i").head().getString(1) ==
      "CREATE INDEX sc_i ON sc_t (v)")
    intercept[IllegalArgumentException] {
      e.execute("SHOW CREATE TABLE nope")
    }
  }

  test("CREATE AGGREGATE: native UDAFs callable from SQL text, retraction-correct") {
    val e = new Engine(spark, tmpDir("sqlagg"))
    e.execute("CREATE AGGREGATE agg_cd(varchar) RETURNS bigint " +
      "LANGUAGE native AS 'retractable_hll'")
    e.execute("CREATE AGGREGATE agg_p90(double precision) RETURNS double " +
      "LANGUAGE native AS 'retractable_percentile' WITH (quantile = 0.9)")

    // changelog input: group 'a' holds 300 live values; group 'x' has all
    // 300 inserts retracted — its registers must decrement back to empty
    val rows = (1 to 300).map(i => ("a", i.toString, 1)) ++
      (1 to 300).map(i => ("x", i.toString, 1)) ++
      (1 to 300).map(i => ("x", i.toString, -1))
    rows.toDF("g", "v", "op").createOrReplaceTempView("agg_in")
    val cd = spark.sql(
      "SELECT g, agg_cd(v, op) AS cd FROM agg_in GROUP BY g ORDER BY g")
      .as[(String, Long)].collect().toSeq
    assert(cd.map(_._1) == Seq("a", "x"))
    assert(math.abs(cd(0)._2 - 300) <= 45, s"estimate ${cd(0)._2} off >15%")
    assert(cd(1)._2 == 0L, "fully-retracted group must estimate exactly 0")

    // percentile under retraction: 1..100 inserted, 91..100 retracted →
    // p90 of the live multiset 1..90 ≈ 81 (1% bucket error)
    val p = spark.sql(
      """SELECT agg_p90(v, op) AS p FROM (
        |  SELECT CAST(id AS DOUBLE) AS v, 1 AS op FROM range(1, 101)
        |  UNION ALL
        |  SELECT CAST(id AS DOUBLE) AS v, -1 AS op FROM range(91, 101))""".stripMargin)
      .collect().head.getDouble(0)
    assert(p > 75 && p < 95, s"retracted p90 $p outside (75, 95)")

    // surface: SHOW lists both; DROP unbinds; bad DDL fails loudly
    assert(e.execute("SHOW AGGREGATES").select("name").as[String]
      .collect().toSeq == Seq("agg_cd", "agg_p90"))
    e.execute("DROP AGGREGATE agg_p90")
    assert(e.execute("SHOW AGGREGATES").count() == 1)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT agg_p90(1.0, 1)").collect()
    }
    intercept[IllegalArgumentException] { // external runtimes are out of scope
      e.execute("CREATE AGGREGATE b1(v INT) RETURNS INT LANGUAGE python AS 'x'")
    }
    intercept[IllegalArgumentException] { // unknown implementation key
      e.execute("CREATE AGGREGATE b2(v INT) RETURNS INT LANGUAGE native AS 'nope'")
    }
    intercept[IllegalArgumentException] { // percentile requires quantile
      e.execute("CREATE AGGREGATE b3(v DOUBLE) RETURNS DOUBLE " +
        "LANGUAGE native AS 'retractable_percentile'")
    }
  }

  test("ASOF JOIN and DISTINCT ON SQL forms rewrite and execute") {
    // reference SQL surface (binder-level in the reference): ASOF JOIN
    // picks the extremal admissible right row per left row; DISTINCT ON
    // keeps the first row per key under the query's ORDER BY
    val wh = tmpDir("pgforms")
    val e = new Engine(spark, wh)
    e.execute("CREATE TABLE trades (tid BIGINT PRIMARY KEY, sym STRING, t BIGINT, px BIGINT)")
    e.execute("CREATE TABLE quotes (qid BIGINT PRIMARY KEY, sym STRING, t BIGINT, bid BIGINT)")
    e.execute("INSERT INTO trades VALUES (1,'a',10,100),(2,'a',20,101),(3,'b',15,200)")
    e.execute("INSERT INTO quotes VALUES " +
      "(1,'a',5,99),(2,'a',9,98),(3,'a',25,97),(4,'b',15,199),(5,'c',1,1)")
    e.execute("FLUSH")

    // backward ASOF: latest quote at-or-before the trade
    val asof = e.execute(
      """SELECT trades.tid, q.t AS qt, q.bid FROM trades
        |ASOF JOIN quotes q ON trades.sym = q.sym AND q.t <= trades.t
        |ORDER BY trades.tid""".stripMargin)
      .as[(Long, Long, Long)].collect().toSeq
    assert(asof == Seq((1L, 9L, 98L), (2L, 9L, 98L), (3L, 15L, 199L)))

    // forward ASOF LEFT: earliest quote strictly after; unmatched null
    val fwd = e.execute(
      """SELECT trades.tid, q.t AS qt FROM trades
        |ASOF LEFT JOIN quotes q ON trades.sym = q.sym AND q.t > trades.t
        |ORDER BY trades.tid""".stripMargin)
      .as[(Long, Option[Long])].collect().toSeq
    assert(fwd == Seq((1L, Some(25L)), (2L, Some(25L)), (3L, None)))

    // DISTINCT ON with the PG survivor rule (ORDER BY decides)
    val don = e.execute(
      """SELECT DISTINCT ON (sym) sym, t, bid FROM quotes
        |ORDER BY sym, t DESC""".stripMargin)
      .as[(String, Long, Long)].collect().toSeq
    assert(don == Seq(("a", 25L, 97L), ("b", 15L, 199L), ("c", 1L, 1L)))
    // star form excludes the helper column
    val star = e.execute(
      "SELECT DISTINCT ON (sym) * FROM quotes ORDER BY sym, t DESC")
    assert(star.columns.toSeq == Seq("qid", "sym", "t", "bid"))
    assert(star.count() == 3)
  }

  test("REFRESH MATERIALIZED VIEW re-runs a fenced MV incl. deletions") {
    val wh = tmpDir("refreshmv")
    val e = new Engine(spark, wh)
    e.execute("CREATE TABLE rf_a (id BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("CREATE TABLE rf_b (id BIGINT PRIMARY KEY, w BIGINT)")
    e.execute("INSERT INTO rf_a VALUES (1, 10), (2, 20)")
    e.execute("INSERT INTO rf_b VALUES (1, 5), (2, 25)")
    e.execute("FLUSH")
    // pure-theta join: takes the loud batch-refresh fence
    e.execute(
      """CREATE MATERIALIZED VIEW rf_m (PRIMARY KEY (id, bid)) AS
        |SELECT rf_a.id, rf_b.id AS bid FROM rf_a JOIN rf_b
        |ON rf_b.w < rf_a.v""".stripMargin)
    assert(e.streamingJob("rf_m").isEmpty)
    def rows(en: Engine) = en.table("rf_m").orderBy("id", "bid")
      .as[(Long, Long)].collect().toSeq
    assert(rows(e) == Seq((1L, 1L), (2L, 1L)))

    // DML shifts the theta relation: row (1,1) must VANISH on refresh
    e.execute("UPDATE rf_b SET w = 50 WHERE id = 1")
    e.execute("INSERT INTO rf_a VALUES (3, 100)")
    e.execute("FLUSH")
    assert(rows(e) == Seq((1L, 1L), (2L, 1L)), "stale before refresh")
    e.execute("REFRESH MATERIALIZED VIEW rf_m")
    assert(rows(e) == Seq((3L, 1L), (3L, 2L)))

    // streaming MVs refuse (they are continuously maintained)
    e.execute(
      """CREATE MATERIALIZED VIEW rf_s (PRIMARY KEY (id)) AS
        |SELECT id, v * 2 AS v2 FROM rf_a""".stripMargin)
    intercept[IllegalArgumentException] {
      e.execute("REFRESH MATERIALIZED VIEW rf_s")
    }
    intercept[IllegalArgumentException] {
      e.execute("REFRESH MATERIALIZED VIEW rf_missing")
    }
    e.streamingJob("rf_s").foreach(_.stop())
  }
}
