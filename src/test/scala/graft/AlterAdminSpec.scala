package graft

/** ALTER … OWNER TO / SET SCHEMA / SWAP WITH plus the operational
  * statements CANCEL JOBS, WAIT, RECOVER (reference: handler/
  * alter_owner.rs, alter_set_schema.rs, alter_swap_rename.rs,
  * cancel_job.rs, wait.rs, recover.rs).
  */
class AlterAdminSpec extends SparkSpecBase {
  import spark.implicits._

  test("ALTER OWNER TO moves ownership; enforcement follows") {
    val e = new Engine(spark, tmpDir("alteradmin"))
    e.execute("CREATE TABLE aa_t (k BIGINT PRIMARY KEY)")
    e.execute("INSERT INTO aa_t VALUES (1)")
    e.execute("CREATE USER owen")
    e.execute("ALTER TABLE aa_t OWNER TO owen")

    // the new owner has full rights without any grant
    e.execute("SET ROLE owen")
    assert(e.execute("SELECT k FROM aa_t").head().getLong(0) == 1L)
    e.execute("INSERT INTO aa_t VALUES (2)")
    // and can pass ownership on
    e.execute("ALTER TABLE aa_t OWNER TO graft")
    intercept[Exception](e.execute("DROP TABLE aa_t"))
    e.execute("RESET ROLE")
    e.execute("DROP TABLE aa_t")
  }

  test("ALTER SET SCHEMA moves the object; RENAME stays in-schema") {
    val e = new Engine(spark, tmpDir("alteradmin"))
    e.execute("CREATE SCHEMA vault")
    e.execute("CREATE TABLE aa_m (k BIGINT PRIMARY KEY, v STRING)")
    e.execute("INSERT INTO aa_m VALUES (1, 'x')")

    e.execute("ALTER TABLE aa_m SET SCHEMA vault")
    intercept[Exception](e.execute("SELECT * FROM aa_m").collect())
    assert(e.execute("SELECT v FROM vault.aa_m").head().getString(0) == "x")
    // introspection follows the move
    assert(e.execute("SELECT table_schema FROM information_schema.tables " +
      "WHERE table_name = 'aa_m'").as[String].collect().toSeq == Seq("vault"))

    // RENAME of a schema-qualified object keeps the schema (PG)
    e.execute("ALTER TABLE vault.aa_m RENAME TO aa_m2")
    assert(e.execute("SELECT v FROM vault.aa_m2").head().getString(0) == "x")
    // move back to public
    e.execute("ALTER TABLE vault.aa_m2 SET SCHEMA public")
    assert(e.execute("SELECT v FROM aa_m2").head().getString(0) == "x")
    e.execute("DROP TABLE aa_m2")
    e.execute("DROP SCHEMA vault")
  }

  test("ALTER SWAP WITH exchanges two tables' names") {
    val e = new Engine(spark, tmpDir("alteradmin"))
    e.execute("CREATE TABLE aa_live (k BIGINT PRIMARY KEY, v STRING)")
    e.execute("CREATE TABLE aa_staged (k BIGINT PRIMARY KEY, v STRING)")
    e.execute("INSERT INTO aa_live VALUES (1, 'old')")
    e.execute("INSERT INTO aa_staged VALUES (1, 'new')")

    e.execute("ALTER TABLE aa_live SWAP WITH aa_staged")
    assert(e.execute("SELECT v FROM aa_live").head().getString(0) == "new")
    assert(e.execute("SELECT v FROM aa_staged").head().getString(0) == "old")
  }

  test("EXPLAIN ANALYZE renders the executed plan with runtime metrics") {
    val e = new Engine(spark, tmpDir("alteradmin"))
    e.execute("CREATE TABLE ea_t (k BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("INSERT INTO ea_t SELECT id, id * 2 FROM range(100)")

    val plan = e.execute(
      "EXPLAIN ANALYZE SELECT v, count(*) AS n FROM ea_t GROUP BY v")
      .as[String].collect()
    assert(plan.nonEmpty)
    // post-execution metrics are present (actual row counts)
    assert(plan.exists(_.contains("numOutputRows=")), plan.mkString("\n"))
    assert(plan.exists(_.toLowerCase.contains("aggregate")),
      plan.mkString("\n"))
  }

  test("CANCEL JOBS stops a streaming job; WAIT and RECOVER acknowledge") {
    val e = new Engine(spark, tmpDir("alteradmin"))
    e.execute("CREATE TABLE aa_src (k BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("INSERT INTO aa_src VALUES (1, 10)")
    e.execute("CREATE MATERIALIZED VIEW aa_mv (PRIMARY KEY (k)) AS " +
      "SELECT k, v FROM aa_src")
    e.execute("FLUSH")

    val active = e.execute("SHOW JOBS")
      .where("active").select("name").as[String].collect().toSet
    assert(active.contains("aa_mv"), active.toString)

    e.execute("CANCEL JOB aa_mv")
    val after = e.execute("SHOW JOBS")
      .where("name = 'aa_mv'").select("active").as[Boolean].collect()
    assert(after.isEmpty || !after.head)
    intercept[Exception](e.execute("CANCEL JOB nope"))

    assert(e.execute("WAIT").columns.nonEmpty)
    assert(e.execute("RECOVER").columns.nonEmpty)
  }

  test("ALTER SET PARALLELISM re-buckets the store; layout persists") {
    val dir = tmpDir("alteradmin")
    val e = new Engine(spark, dir)
    e.execute("CREATE TABLE ap_t (k BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("INSERT INTO ap_t SELECT id, id * 3 FROM range(200)")

    e.execute("ALTER TABLE ap_t SET PARALLELISM = 4")
    // content identical under the new layout
    assert(e.execute("SELECT count(*) c FROM ap_t").head().getLong(0) == 200)
    assert(e.execute("SELECT v FROM ap_t WHERE k = 7").head().getLong(0) == 21)
    // exactly 4 bucket dirs on disk (stale 32-way layout cleared)
    val buckets = new java.io.File(s"$dir/ap_t/data").listFiles()
      .count(_.getName.startsWith("__bucket="))
    assert(buckets == 4, s"expected 4 bucket dirs, found $buckets")

    // merges keep working under the new layout; shrink → grow round-trip
    e.execute("INSERT INTO ap_t VALUES (500, 1500)")
    e.execute("ALTER TABLE ap_t SET PARALLELISM = 8")
    assert(e.execute("SELECT count(*) c FROM ap_t").head().getLong(0) == 201)

    // the new layout survives restart (bucket-pruned reads depend on it)
    val e2 = new Engine(spark.newSession(), dir)
    assert(e2.execute("SELECT v FROM ap_t WHERE k = 500").head().getLong(0)
      == 1500)
    e2.execute("INSERT INTO ap_t VALUES (501, 1503)")
    assert(e2.execute("SELECT count(*) c FROM ap_t").head().getLong(0) == 202)
  }

  test("rw_catalog runtime relations: description, subscriptions, " +
      "parallelism, fragments, workers, types") {
    val e = new Engine(spark, tmpDir("rwcat"))
    e.execute("SET streaming_parallelism = 4")
    e.execute("CREATE TABLE rc_t (k BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("INSERT INTO rc_t VALUES (1, 10), (2, 20)")
    e.execute("CREATE MATERIALIZED VIEW rc_mv (PRIMARY KEY (k)) AS " +
      "SELECT k, v * 2 AS v2 FROM rc_t")
    e.execute("COMMENT ON TABLE rc_t IS 'base table'")
    e.execute("COMMENT ON COLUMN rc_t.v IS 'the value'")
    e.execute("CREATE SUBSCRIPTION rc_sub FROM rc_mv WITH (retention = '1D')")

    // rw_description: object row (objsubid NULL) + column row (position)
    val desc = e.execute(
      "SELECT objsubid, description FROM rw_catalog.rw_description " +
        "ORDER BY description").collect()
    assert(desc.map(r => (if (r.isNullAt(0)) -1 else r.getInt(0),
      r.getString(1))).toSeq == Seq((-1, "base table"), (2, "the value")))

    // rw_subscriptions lists the open subscription with its definition
    val sub = e.execute(
      "SELECT name, definition FROM rw_catalog.rw_subscriptions").collect()
    assert(sub.length == 1 && sub.head.getString(0) == "rc_sub" &&
      sub.head.getString(1).contains("FROM rc_mv"))

    // rw_streaming_parallelism reports the store's bucket count
    val par = e.execute(
      "SELECT name, parallelism FROM rw_catalog.rw_streaming_parallelism " +
        "WHERE name = 'rc_mv'").collect()
    assert(par.length == 1 && par.head.getString(1) == "FIXED(4)")

    // rw_fragments: one fragment per streaming job, HASH-distributed
    val frag = e.execute(
      "SELECT distribution_type, parallelism FROM rw_catalog.rw_fragments " +
        "WHERE table_id IN (SELECT id FROM rw_catalog.rw_materialized_views " +
        "WHERE name = 'rc_mv')").collect()
    assert(frag.length == 1 && frag.head.getString(0) == "HASH" &&
      frag.head.getInt(1) == 4)

    // rw_worker_nodes: the single local compute worker
    val w = e.execute("SELECT type, state FROM rw_catalog.rw_worker_nodes")
      .collect()
    assert(w.length == 1 && w.head.getString(0) == "COMPUTE" &&
      w.head.getString(1) == "RUNNING")

    // rw_types: the supported type table answers (int8 is present)
    assert(e.execute(
      "SELECT count(*) c FROM rw_catalog.rw_types WHERE name = 'int8'")
      .head().getLong(0) == 1L)
  }
}
