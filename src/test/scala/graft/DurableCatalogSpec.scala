package graft

/** Durable catalog (reference: meta-store recovery,
  * docs/dev/src/design/meta-service.md): every definition created through
  * Engine.execute survives a full engine + session teardown — a fresh
  * Engine over the same warehouse recovers tables (declared schema +
  * defaults), re-plans and RESUMES streaming MV maintenance from the
  * surviving checkpoint, and resumes subscription cursors at their
  * committed frontiers.
  */
class DurableCatalogSpec extends SparkSpecBase {

  test("fresh Engine over the same warehouse recovers every definition " +
      "and resumes maintenance") {
    val wh = tmpDir("durcat")
    val srcDir = tmpDir("durcat-src")

    // ----- session 1: define everything
    val s1 = spark.newSession()
    val e1 = new Engine(s1, wh)

    e1.execute("CREATE TABLE items (id BIGINT PRIMARY KEY, name VARCHAR, " +
      "qty INT DEFAULT 1)")
    e1.execute("INSERT INTO items (id, name) VALUES (1, 'a'), (2, 'b')")
    e1.execute("ALTER TABLE items ADD COLUMN note VARCHAR")

    {
      import s1.implicits._
      Seq((1L, 10.0), (2L, 5.0)).toDF("id", "v")
        .write.mode("append").parquet(srcDir)
    }
    e1.execute(s"CREATE SOURCE ds WITH (path = '$srcDir', format = 'parquet')")
    e1.execute("CREATE MATERIALIZED VIEW totals (PRIMARY KEY (id)) AS " +
      "SELECT id, sum(v) AS sv FROM ds GROUP BY id")
    e1.streamingJob("totals").get.processAllAvailable()

    e1.execute("CREATE SUBSCRIPTION sub_t FROM totals")
    e1.execute("DECLARE cur_t SUBSCRIPTION CURSOR FOR sub_t FULL")
    val fetched1 = e1.execute("FETCH cur_t")
    assert(fetched1.count() > 0) // FULL cursor drains history

    e1.execute("CREATE INDEX items_by_name ON items (name)")
    e1.execute("CREATE VIEW vconst AS SELECT 41 + 1 AS answer")
    e1.execute("CREATE AGGREGATE dc_acd(varchar) RETURNS bigint " +
      "LANGUAGE native AS 'retractable_hll'")
    // a view over an ENGINE-managed table (recovery must bind it before
    // re-planning — Tables.register never registers CREATE TABLE tables)
    e1.execute("CREATE VIEW v_items AS SELECT name FROM items")

    // ----- shutdown: stop maintenance, drop the session (temp views die)
    e1.streamingJob("totals").get.stop()

    // ----- session 2: fresh SparkSession + fresh Engine, same warehouse
    val s2 = spark.newSession()
    val e2 = new Engine(s2, wh)
    assert(e2.recoveryPending.isEmpty,
      s"unrecovered: ${e2.recoveryPending.mkString(", ")}")

    // table: data, declared schema (incl. ALTERed column), DEFAULT fill
    assert(e2.table("items").columns.toSeq ==
      Seq("id", "name", "qty", "note"))
    e2.execute("INSERT INTO items (id, name) VALUES (3, 'c')")
    val qty3 = e2.table("items").where("id = 3")
      .select("qty").collect().head.getInt(0)
    assert(qty3 == 1) // DEFAULT survived recovery

    // streaming MV: maintenance RESUMED from the checkpoint — new source
    // data flows through without re-issuing any DDL
    {
      import s2.implicits._
      Seq((1L, 2.0), (3L, 7.0)).toDF("id", "v")
        .write.mode("append").parquet(srcDir)
    }
    val job = e2.streamingJob("totals")
    assert(job.isDefined, "streaming MV maintenance was not resumed")
    job.get.processAllAvailable()
    val totals = e2.table("totals").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(totals == Seq((1L, 12.0), (2L, 5.0), (3L, 7.0)))

    // cursor: resumes at the committed frontier — only epochs published
    // AFTER the pre-restart fetch come back
    val fetched2 = e2.execute("FETCH cur_t")
    assert(fetched2.count() > 0)
    val minEpoch = fetched2.agg(org.apache.spark.sql.functions
      .min("_epoch")).collect().head.getLong(0)
    val maxEpochBefore = fetched1.agg(org.apache.spark.sql.functions
      .max("_epoch")).collect().head.getLong(0)
    assert(minEpoch > maxEpochBefore,
      s"cursor replayed already-fetched epochs ($minEpoch <= $maxEpochBefore)")

    // index: definition + stored key types recovered (typed probe works)
    assert(e2.indexLookup("items_by_name", "a").count() == 1)

    // view: re-registered in the new session
    assert(e2.execute("SELECT * FROM vconst").collect().head.getInt(0) == 42)
    // view over the engine table recovered without any attachTables
    assert(e2.execute("SELECT * FROM v_items").count() >= 2)

    // aggregate: re-bound in the new session's function registry
    val acd = e2.execute("SELECT dc_acd(CAST(id AS STRING), 1) AS n FROM " +
      "(SELECT 1 AS id UNION ALL SELECT 2 UNION ALL SELECT 1)")
      .collect().head.getLong(0)
    assert(acd == 2L)

    // subscription is listed; a new cursor over it works
    import s2.implicits._
    assert(e2.execute("SHOW SUBSCRIPTIONS").as[String].collect().toSeq ==
      Seq("sub_t"))

    e2.streamingJob("totals").get.stop()

    // ----- drops delete the persisted definitions: a third engine sees none
    e2.execute("DROP MATERIALIZED VIEW totals")
    e2.execute("DROP TABLE items")
    e2.execute("DROP INDEX items_by_name")
    e2.execute("DROP SUBSCRIPTION sub_t")
    e2.execute("DROP AGGREGATE dc_acd")
    val s3 = spark.newSession()
    val e3 = new Engine(s3, wh)
    assert(e3.mvs.get("totals").isEmpty)
    assert(e3.mvs.get("items").isEmpty)
    assert(e3.execute("SHOW SUBSCRIPTIONS").isEmpty)
    assert(e3.execute("SHOW AGGREGATES").isEmpty)
  }

  test("MV over not-yet-attached tables parks and recovers after attachTables") {
    val wh = tmpDir("durcat2")
    val s1 = spark.newSession()
    val e1 = new Engine(s1, wh)
    e1.attachTables("/root/testdata/sf0.001")
    // batch MV over driver tables: only the handle needs recovery (no
    // re-run), but a VIEW over them re-plans its SQL and must wait for
    // attachTables in the next session
    e1.execute("CREATE MATERIALIZED VIEW nation_cnt (PRIMARY KEY (n_regionkey)) " +
      "AS SELECT n_regionkey, count(*) AS cnt FROM nation GROUP BY n_regionkey")
    e1.execute("CREATE VIEW v_nation AS SELECT n_name FROM nation")

    val s2 = spark.newSession()
    val e2 = new Engine(s2, wh)
    // the view can't re-plan before the tables exist in this session
    assert(e2.recoveryPending.contains("view:v_nation"))
    // the batch MV's storage is immediately readable
    assert(e2.table("nation_cnt").count() == 5)
    e2.attachTables("/root/testdata/sf0.001")
    assert(e2.recoveryPending.isEmpty)
    assert(e2.execute("SELECT * FROM v_nation").count() == 25)
  }
}
