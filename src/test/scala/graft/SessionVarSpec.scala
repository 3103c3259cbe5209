package graft

/** SET / SHOW / RESET session variables (reference: handler/variable.rs
  * over src/common/src/session_config/) — the Postgres-compatible
  * session-config surface psql, pgjdbc and ORMs drive on connect, plus
  * the reference's own `rw_implicit_flush` behavior knob.
  */
class SessionVarSpec extends SparkSpecBase {
  import spark.implicits._

  test("SET / SHOW / RESET round-trip, aliases, SHOW ALL") {
    val e = new Engine(spark, tmpDir("vars"))

    // defaults visible before any SET
    assert(e.execute("SHOW application_name").head().getString(0) == "")
    assert(e.execute("SHOW timezone").head().getString(0) == "UTC")

    // psql's spaced aliases
    assert(e.execute("SHOW TIME ZONE").head().getString(0) == "UTC")
    assert(e.execute("SHOW TRANSACTION ISOLATION LEVEL")
      .head().getString(0) == "read committed")

    // SET = and SET TO, quoted and bare values
    e.execute("SET application_name = 'my app'")
    assert(e.execute("SHOW application_name").head().getString(0) == "my app")
    e.execute("SET extra_float_digits TO 3")
    assert(e.execute("SHOW extra_float_digits").head().getString(0) == "3")

    // column name of a SHOW is the parameter name (PG convention)
    assert(e.execute("SHOW extra_float_digits").columns.toSeq ==
      Seq("extra_float_digits"))

    // RESET restores the default; SET ... DEFAULT too
    e.execute("RESET extra_float_digits")
    assert(e.execute("SHOW extra_float_digits").head().getString(0) == "1")
    e.execute("SET application_name = DEFAULT")
    assert(e.execute("SHOW application_name").head().getString(0) == "")

    // SHOW ALL: (name, setting, description), includes rw knobs
    val all = e.execute("SHOW ALL")
    assert(all.columns.toSeq == Seq("name", "setting", "description"))
    val names = all.select("name").as[String].collect().toSet
    assert(names.contains("rw_implicit_flush"))
    assert(names.contains("streaming_parallelism"))
    assert(e.execute("SHOW PARAMETERS").count() == all.count())

    // unknown / read-only parameters: PG's exact error surface
    val unk = intercept[IllegalArgumentException](e.execute("SHOW no_such_var"))
    assert(unk.getMessage.contains("unrecognized configuration parameter"))
    val ro = intercept[IllegalArgumentException](
      e.execute("SET server_version = '99'"))
    assert(ro.getMessage.contains("cannot be changed"))

    // SET TRANSACTION form acknowledges as a no-op (single-snapshot reads)
    assert(e.execute("SET TRANSACTION ISOLATION LEVEL SERIALIZABLE")
      .head().getString(0) == "SET")

    // RESET ALL clears every override
    e.execute("SET application_name = 'x'")
    e.execute("RESET ALL")
    assert(e.execute("SHOW application_name").head().getString(0) == "")
  }

  test("reference planner GUCs accept the nexmark suite's SET statements") {
    val e = new Engine(spark, tmpDir("plannerguc"))
    // the reference's own benchmark scripts issue these before queries
    // (ci/scripts/sql/nexmark/q15-two-phase.sql) — they must not error
    e.execute("SET rw_force_split_distinct_agg = true")
    e.execute("SET rw_force_two_phase_agg = true")
    e.execute("SET rw_streaming_enable_delta_join = false")
    assert(e.execute("SHOW rw_force_two_phase_agg").head().getString(0) == "true")
    e.execute("RESET rw_force_two_phase_agg")
    assert(e.execute("SHOW rw_force_two_phase_agg").head().getString(0) == "false")
    // still an error for genuinely unknown names (PG semantics)
    intercept[Exception] { e.execute("SET rw_no_such_knob = 1") }
  }

  test("SET TIME ZONE applies to the Spark session and validates the zone") {
    val e = new Engine(spark, tmpDir("vars-tz"))
    val before = spark.conf.get("spark.sql.session.timeZone")
    try {
      e.execute("SET TIME ZONE 'America/New_York'")
      assert(spark.conf.get("spark.sql.session.timeZone") == "America/New_York")
      assert(e.execute("SHOW timezone").head().getString(0) == "America/New_York")
      intercept[Exception](e.execute("SET TIME ZONE 'No/Such_Zone'"))
      // failed SET leaves the previous value in place
      assert(e.execute("SHOW timezone").head().getString(0) == "America/New_York")
      e.execute("RESET timezone")
      assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    } finally spark.conf.set("spark.sql.session.timeZone", before)
  }

  test("rw_implicit_flush drains chained MVs after each DML") {
    val e = new Engine(spark, tmpDir("vars-flush"))
    e.execute("CREATE TABLE vt (k BIGINT PRIMARY KEY, v DOUBLE)")
    e.execute("INSERT INTO vt VALUES (1, 10.0)")
    e.execute("FLUSH")
    e.execute("""CREATE MATERIALIZED VIEW vmv (PRIMARY KEY (k)) AS
      |SELECT k, v * 2 AS v2 FROM vt""".stripMargin)
    e.execute("FLUSH")

    e.execute("SET rw_implicit_flush = true")
    // no FLUSH issued — the implicit drain must propagate the write
    e.execute("INSERT INTO vt VALUES (2, 20.0)")
    assert(e.table("vmv").orderBy("k").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 20.0), (2L, 40.0)))

    e.execute("SET rw_implicit_flush = off")
    assert(e.execute("SHOW rw_implicit_flush").head().getString(0) == "false")
  }

  test("pg_settings reflects the live variable store") {
    val e = new Engine(spark, tmpDir("vars-pgset"))
    e.execute("SET application_name = 'psettings'")
    assert(e.execute(
      "SELECT setting FROM pg_settings WHERE name = 'application_name'")
      .head().getString(0) == "psettings")
    assert(e.execute("SELECT count(*) AS n FROM pg_settings")
      .head().getLong(0) >= 15L)
  }

  test("streaming_parallelism sets new stores' bucket counts; layout survives restart") {
    val dir = tmpDir("vars-par")
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val e = new Engine(spark, dir)
      e.execute("SET streaming_parallelism = 4")
      e.execute("CREATE TABLE pt (k BIGINT PRIMARY KEY, v DOUBLE)")
      e.execute("INSERT INTO pt VALUES (1, 1.0), (2, 2.0)")
      e.execute("FLUSH")
      val buckets = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$dir/pt/data")).iterator()
      val bucketDirs = scala.jdk.CollectionConverters
        .IteratorHasAsScala(buckets).asScala
        .count(_.getFileName.toString.startsWith("__bucket="))
      assert(bucketDirs <= 4 && bucketDirs > 0)

      // restart under the DEFAULT parallelism: the persisted per-table
      // layout must win, or bucket-pruned merges would mis-route
      val e2 = new Engine(spark, dir)
      e2.execute("INSERT INTO pt VALUES (3, 3.0)")
      assert(e2.execute("SELECT count(*) AS n FROM pt").head().getLong(0) == 3L)
      assert(e2.execute("SELECT sum(v) AS s FROM pt").head().getDouble(0) == 6.0)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("current_setting('name') splices the live variable value") {
    val e = new Engine(spark, tmpDir("vars-cs"))
    e.execute("SET application_name = 'cs test'")
    assert(e.execute("SELECT current_setting('application_name') AS v")
      .head().getString(0) == "cs test")
    assert(e.execute("SELECT current_setting('timezone') AS tz")
      .head().getString(0) == "UTC")
  }

  test("DESCRIBE appends primary/distribution key and description rows") {
    val e = new Engine(spark, tmpDir("vars-desc"))
    e.execute("CREATE TABLE dt (k BIGINT PRIMARY KEY, v DOUBLE)")
    val rows = e.execute("DESCRIBE dt").as[(String, String)].collect().toSeq
    assert(rows.take(2) == Seq(("k", "bigint"), ("v", "double")))
    assert(rows.contains(("primary key", "k")))
    assert(rows.contains(("distribution key", "k")))
    assert(rows.contains(("table description", "dt")))
  }

  test("SHOW TABLES and other SHOW statements keep precedence over variables") {
    val e = new Engine(spark, tmpDir("vars-prec"))
    e.execute("CREATE TABLE st (k BIGINT PRIMARY KEY)")
    val t = e.execute("SHOW TABLES")
    assert(t.select("name").as[String].collect().contains("st"))
    assert(e.execute("SHOW MATERIALIZED VIEWS").columns.nonEmpty)
    assert(e.execute("SHOW DATABASES").as[String].collect().toSeq == Seq("dev"))
    assert(e.execute("SHOW SCHEMAS").as[String].collect()
      .contains("pg_catalog"))
  }

  test("DISCARD ALL resets session variables to defaults") {
    val e = new Engine(spark, tmpDir("discard"))
    e.execute("SET application_name = 'x'")
    e.execute("SET extra_float_digits TO 3")
    e.execute("DISCARD ALL")
    assert(e.execute("SHOW application_name").head().getString(0) == "")
    assert(e.execute("SHOW extra_float_digits").head().getString(0) == "1")
    // narrower forms ack without touching state
    e.execute("SET application_name = 'y'")
    e.execute("DISCARD PLANS")
    assert(e.execute("SHOW application_name").head().getString(0) == "y")
  }

  test("ALTER SYSTEM SET: durable instance default under session SETs") {
    // reference handler/alter_system.rs / PG's postgresql.auto.conf layer
    val wh = tmpDir("altersystem")
    val e = new Engine(spark, wh)
    def shown(en: Engine) =
      en.execute("SHOW extra_float_digits").head().getString(0)
    assert(shown(e) == "1")
    e.execute("ALTER SYSTEM SET extra_float_digits = 3")
    assert(shown(e) == "3")
    // a session SET overrides; RESET falls back to the SYSTEM default,
    // not the boot default
    e.execute("SET extra_float_digits = 5")
    assert(shown(e) == "5")
    e.execute("RESET extra_float_digits")
    assert(shown(e) == "3")
    // pg_settings reads the layered value
    assert(e.execute("SELECT setting FROM pg_settings " +
      "WHERE name = 'extra_float_digits'").head().getString(0) == "3")
    // durable across restart
    val e2 = new Engine(spark, wh)
    assert(shown(e2) == "3")
    // superuser-only
    e2.execute("CREATE USER sysbob")
    e2.sessionUser = "sysbob"
    val ex = intercept[Exception](
      e2.execute("ALTER SYSTEM SET extra_float_digits = 7"))
    assert(ex.getMessage.contains("superuser"))
    e2.sessionUser = "graft"
    // ALTER SYSTEM RESET returns to the boot default
    e2.execute("ALTER SYSTEM RESET extra_float_digits")
    assert(shown(e2) == "1")
    // unknown / read-only parameters are refused
    intercept[Exception](e2.execute("ALTER SYSTEM SET nope = 1"))
    intercept[Exception](e2.execute("ALTER SYSTEM SET server_version = 9"))
  }
}
