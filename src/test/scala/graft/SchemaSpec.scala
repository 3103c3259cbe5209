package graft

/** CREATE/DROP SCHEMA + schema-qualified names + search_path resolution
  * (reference: handler/create_schema.rs, handler/drop_schema.rs, and the
  * frontend catalog's schema-aware name binding). Objects of schema `s`
  * store internally as `s__name`; the statement-entry rewrite makes the
  * whole SQL surface see qualified names.
  */
class SchemaSpec extends SparkSpecBase {
  import spark.implicits._

  test("create/drop schema, duplicates, reserved names") {
    val e = new Engine(spark, tmpDir("schemas"))
    e.execute("CREATE SCHEMA analytics")
    val names = e.execute("SHOW SCHEMAS").as[String].collect().toSet
    assert(names.contains("analytics") && names.contains("public"))

    // duplicate → error; IF NOT EXISTS → ack
    intercept[Exception](e.execute("CREATE SCHEMA analytics"))
    e.execute("CREATE SCHEMA IF NOT EXISTS analytics")
    intercept[Exception](e.execute("CREATE SCHEMA pg_catalog"))
    intercept[Exception](e.execute("CREATE SCHEMA public"))

    e.execute("DROP SCHEMA analytics")
    assert(!e.execute("SHOW SCHEMAS").as[String].collect().contains("analytics"))
    intercept[Exception](e.execute("DROP SCHEMA analytics"))
    e.execute("DROP SCHEMA IF EXISTS analytics")
  }

  test("qualified DDL/DML/queries and cross-schema joins") {
    val e = new Engine(spark, tmpDir("schemas"))
    e.execute("CREATE SCHEMA sales")
    e.execute("CREATE TABLE sales.sorders (id BIGINT PRIMARY KEY, cust STRING)")
    e.execute("INSERT INTO sales.sorders VALUES (1, 'ann'), (2, 'bob')")
    // public table with the same bare name is a DIFFERENT object
    e.execute("CREATE TABLE sorders (id BIGINT PRIMARY KEY, cust STRING)")
    e.execute("INSERT INTO sorders VALUES (9, 'zed')")

    assert(e.execute("SELECT count(*) c FROM sales.sorders").head().getLong(0) == 2)
    assert(e.execute("SELECT count(*) c FROM sorders").head().getLong(0) == 1)
    assert(e.execute("SELECT count(*) c FROM public.sorders").head().getLong(0) == 1)

    // cross-schema join; string literals must never be rewritten
    val j = e.execute(
      "SELECT a.cust FROM sales.sorders a JOIN public.sorders b ON a.id < b.id " +
        "WHERE a.cust <> 'sales.sorders' ORDER BY a.cust")
    assert(j.as[String].collect().toSeq == Seq("ann", "bob"))

    // qualified UPDATE/DELETE
    e.execute("UPDATE sales.sorders SET cust = 'ann2' WHERE id = 1")
    e.execute("DELETE FROM sales.sorders WHERE id = 2")
    assert(e.execute("SELECT cust FROM sales.sorders").as[String].collect()
      .toSeq == Seq("ann2"))

    // DESCRIBE + SHOW CREATE round-trip through the qualified form
    assert(e.execute("DESCRIBE sales.sorders").count() >= 2)
    val ddl = e.execute("SHOW CREATE TABLE sales.sorders").head().getString(1)
    assert(ddl.contains("sales.sorders"), ddl)

    // MV over a qualified table, itself in a schema
    e.execute("CREATE SCHEMA rpt")
    e.execute("CREATE MATERIALIZED VIEW rpt.cnt (PRIMARY KEY (cust)) AS " +
      "SELECT cust, count(*) AS n FROM sales.sorders GROUP BY cust")
    assert(e.execute("SELECT n FROM rpt.cnt").head().getLong(0) == 1L)
  }

  test("search_path resolves unqualified reads and creations in order") {
    val e = new Engine(spark, tmpDir("schemas"))
    e.execute("CREATE SCHEMA app")
    e.execute("CREATE TABLE app.spt (k BIGINT PRIMARY KEY, v STRING)")
    e.execute("INSERT INTO app.spt VALUES (1, 'in-app')")

    // not on the path → unqualified read fails
    intercept[Exception](e.execute("SELECT * FROM spt").collect())

    e.execute("SET search_path TO app, public")
    assert(e.execute("SELECT v FROM spt").head().getString(0) == "in-app")

    // unqualified CREATE lands in the first schema on the path
    e.execute("CREATE TABLE spu (k BIGINT PRIMARY KEY)")
    e.execute("INSERT INTO spu VALUES (7)")
    assert(e.execute("SELECT k FROM app.spu").head().getLong(0) == 7L)

    // public object with the same name: PATH ORDER decides
    e.execute("CREATE TABLE public.spt (k BIGINT PRIMARY KEY, v STRING)")
    e.execute("INSERT INTO public.spt VALUES (2, 'in-public')")
    assert(e.execute("SELECT v FROM spt").head().getString(0) == "in-app")
    e.execute("SET search_path TO public, app")
    assert(e.execute("SELECT v FROM spt").head().getString(0) == "in-public")

    e.execute("RESET search_path")
    intercept[Exception](e.execute("SELECT * FROM spu").collect())
  }

  test("drop schema: RESTRICT refuses, CASCADE drops contained objects") {
    val e = new Engine(spark, tmpDir("schemas"))
    e.execute("CREATE SCHEMA tmp")
    e.execute("CREATE TABLE tmp.a (k BIGINT PRIMARY KEY)")
    e.execute("INSERT INTO tmp.a VALUES (1)")
    e.execute("CREATE MATERIALIZED VIEW tmp.b (PRIMARY KEY (k)) AS " +
      "SELECT k FROM tmp.a")

    val err = intercept[Exception](e.execute("DROP SCHEMA tmp"))
    assert(err.getMessage.contains("tmp.a"), err.getMessage)

    e.execute("DROP SCHEMA tmp CASCADE")
    assert(!e.execute("SHOW SCHEMAS").as[String].collect().contains("tmp"))
    intercept[Exception](e.execute("SELECT * FROM tmp.a").collect())
  }

  test("pg_catalog / information_schema / rw_catalog see schemas") {
    val e = new Engine(spark, tmpDir("schemas"))
    e.execute("CREATE SCHEMA mart")
    e.execute("CREATE TABLE mart.facts (k BIGINT PRIMARY KEY, v DOUBLE)")
    e.execute("CREATE TABLE plain (k BIGINT PRIMARY KEY)")

    // pg_namespace lists the schema; pg_class shows the BARE name there
    val ns = e.execute(
      "SELECT nspname FROM pg_namespace ORDER BY nspname")
      .as[String].collect().toSet
    assert(ns.contains("mart") && ns.contains("public"))
    val rel = e.execute(
      "SELECT n.nspname, c.relname FROM pg_class c " +
        "JOIN pg_namespace n ON n.oid = c.relnamespace " +
        "WHERE c.relname = 'facts'").collect()
    assert(rel.length == 1 && rel(0).getString(0) == "mart")

    // information_schema: the psql/ORM introspection path
    val ist = e.execute(
      "SELECT table_schema FROM information_schema.tables " +
        "WHERE table_name = 'facts'").as[String].collect()
    assert(ist.toSeq == Seq("mart"))
    assert(e.execute(
      "SELECT schema_name FROM information_schema.schemata")
      .as[String].collect().contains("mart"))
    assert(e.execute(
      "SELECT column_name FROM information_schema.columns " +
        "WHERE table_schema = 'mart' AND table_name = 'facts'")
      .count() == 2)

    // rw_catalog operational surface
    val rw = e.execute(
      "SELECT s.name FROM rw_catalog.rw_tables t " +
        "JOIN rw_catalog.rw_schemas s ON s.id = t.schema_id " +
        "WHERE t.name = 'facts'").as[String].collect()
    assert(rw.toSeq == Seq("mart"))
    e.execute("DROP SCHEMA mart CASCADE")
  }

  test("schemas and their objects survive restart") {
    val wh = tmpDir("schemas")
    val e1 = new Engine(spark, wh)
    e1.execute("CREATE SCHEMA persisted")
    e1.execute("CREATE TABLE persisted.t (k BIGINT PRIMARY KEY, v STRING)")
    e1.execute("INSERT INTO persisted.t VALUES (5, 'x')")

    val e2 = new Engine(spark.newSession(), wh)
    assert(e2.execute("SHOW SCHEMAS").as[String].collect().contains("persisted"))
    assert(e2.execute("SELECT v FROM persisted.t WHERE k = 5")
      .head().getString(0) == "x")
    // the schema namespace is still creatable-into after recovery
    e2.execute("CREATE TABLE persisted.t2 (k BIGINT PRIMARY KEY)")
    e2.execute("DROP SCHEMA persisted CASCADE")
  }
}
