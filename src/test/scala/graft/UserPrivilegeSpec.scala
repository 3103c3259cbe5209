package graft

/** Users, roles and privileges (reference: handler/create_user.rs,
  * alter_user.rs, drop_user.rs, handle_privilege.rs) — durable user
  * catalog, GRANT/REVOKE ACLs, owner semantics, SET ROLE identity, and
  * enforcement at the statement entry.
  */
class UserPrivilegeSpec extends SparkSpecBase {
  import spark.implicits._

  test("create/alter/drop user; catalogs expose them") {
    val e = new Engine(spark, tmpDir("users"))
    e.execute("CREATE USER alice WITH PASSWORD 'secret' CREATEDB")
    e.execute("CREATE USER bob NOLOGIN")
    intercept[Exception](e.execute("CREATE USER alice"))
    e.execute("CREATE USER IF NOT EXISTS alice")

    val roles = e.execute(
      "SELECT rolname, rolsuper, rolcreatedb, rolcanlogin FROM pg_roles " +
        "ORDER BY rolname").collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3))).toSeq
    assert(roles.contains(("alice", false, true, true)))
    assert(roles.contains(("bob", false, false, false)))
    assert(roles.contains(("graft", true, true, true)))
    assert(e.execute("SELECT usename FROM pg_user").as[String]
      .collect().toSet == Set("graft", "alice", "bob"))
    assert(e.execute(
      "SELECT name FROM rw_catalog.rw_users WHERE is_super = false")
      .as[String].collect().toSet == Set("alice", "bob"))

    e.execute("ALTER USER bob LOGIN SUPERUSER")
    assert(e.execute(
      "SELECT rolsuper FROM pg_roles WHERE rolname = 'bob'")
      .head().getBoolean(0))
    e.execute("ALTER USER bob RENAME TO bobby")
    assert(e.execute("SELECT usename FROM pg_user").as[String]
      .collect().toSet == Set("graft", "alice", "bobby"))

    e.execute("DROP USER bobby")
    intercept[Exception](e.execute("DROP USER bobby"))
    e.execute("DROP USER IF EXISTS bobby")
  }

  test("GRANT/REVOKE enforce SELECT and DML; owners and superusers bypass") {
    val e = new Engine(spark, tmpDir("users"))
    e.execute("CREATE TABLE t (k BIGINT PRIMARY KEY, v STRING)")
    e.execute("INSERT INTO t VALUES (1, 'x')")
    e.execute("CREATE USER carol")

    e.execute("SET ROLE carol")
    val denied = intercept[Exception](e.execute("SELECT * FROM t").collect())
    assert(denied.getMessage.contains("permission denied"), denied.getMessage)
    intercept[Exception](e.execute("INSERT INTO t VALUES (2, 'y')"))

    e.execute("RESET ROLE")
    e.execute("GRANT SELECT ON t TO carol")
    e.execute("SET ROLE carol")
    assert(e.execute("SELECT v FROM t").as[String].collect().toSeq == Seq("x"))
    // SELECT granted, INSERT still denied
    intercept[Exception](e.execute("INSERT INTO t VALUES (2, 'y')"))
    // carol cannot grant on an object she does not own
    intercept[Exception](e.execute("GRANT SELECT ON t TO carol"))

    e.execute("RESET ROLE")
    e.execute("GRANT INSERT, UPDATE, DELETE ON t TO carol")
    e.execute("SET ROLE carol")
    e.execute("INSERT INTO t VALUES (2, 'y')")
    e.execute("UPDATE t SET v = 'y2' WHERE k = 2")
    e.execute("DELETE FROM t WHERE k = 1")
    // DROP stays owner-only
    intercept[Exception](e.execute("DROP TABLE t"))

    e.execute("RESET ROLE")
    e.execute("REVOKE ALL ON t FROM carol")
    e.execute("SET ROLE carol")
    intercept[Exception](e.execute("SELECT * FROM t").collect())
    e.execute("RESET ROLE")
  }

  test("schema CREATE privilege and ALL TABLES IN SCHEMA grants") {
    val e = new Engine(spark, tmpDir("users"))
    e.execute("CREATE SCHEMA lab")
    e.execute("CREATE TABLE lab.a (k BIGINT PRIMARY KEY)")
    e.execute("CREATE TABLE lab.b (k BIGINT PRIMARY KEY)")
    e.execute("INSERT INTO lab.a VALUES (1)")
    e.execute("CREATE USER dave")

    e.execute("SET ROLE dave")
    // no CREATE privilege on the schema
    intercept[Exception](
      e.execute("CREATE TABLE lab.c (k BIGINT PRIMARY KEY)"))
    e.execute("RESET ROLE")

    e.execute("GRANT CREATE ON SCHEMA lab TO dave")
    e.execute("GRANT SELECT ON ALL TABLES IN SCHEMA lab TO dave")
    e.execute("SET ROLE dave")
    e.execute("CREATE TABLE lab.c (k BIGINT PRIMARY KEY)")
    assert(e.execute("SELECT k FROM lab.a").head().getLong(0) == 1L)
    // dave owns lab.c → full rights incl. DROP
    e.execute("INSERT INTO lab.c VALUES (9)")
    e.execute("DROP TABLE lab.c")
    e.execute("RESET ROLE")

    // ownership shows in GRANT enforcement after restart too
    val e2 = new Engine(spark.newSession(), tmpDir("ignored")) // fresh wh
    e2.execute("SELECT 1").collect() // smoke: engines are independent
  }

  test("SET ROLE cannot escalate past the startup identity") {
    val e = new Engine(spark, tmpDir("users"))
    e.execute("CREATE USER mallory")
    e.execute("CREATE USER victim")

    // simulate a pgwire connection authenticated as mallory (pgwire
    // installs both vars per statement; startupUser never moves)
    e.startupUser = "mallory"
    e.sessionUser = "mallory"
    // a non-superuser startup identity may assume only itself
    val denied = intercept[Exception](e.execute("SET ROLE victim"))
    assert(denied.getMessage.contains("permission denied"), denied.getMessage)
    intercept[Exception](e.execute("SET ROLE graft"))
    intercept[Exception](e.execute("SET SESSION AUTHORIZATION graft"))
    e.execute("SET ROLE mallory") // self is fine
    // RESET ROLE restores the startup identity, NOT the bootstrap superuser
    e.execute("RESET ROLE")
    assert(e.execute("SELECT current_user").head().getString(0) == "mallory")

    // a superuser startup identity may assume anyone (psql admin flow)
    e.startupUser = "graft"
    e.sessionUser = "graft"
    e.execute("SET ROLE victim")
    assert(e.execute("SELECT current_user").head().getString(0) == "victim")
    e.execute("RESET ROLE")
  }

  test("failed or IF NOT EXISTS CREATE cannot hijack ownership") {
    val e = new Engine(spark, tmpDir("users"))
    e.execute("CREATE USER alice")
    e.execute("CREATE USER eve")
    e.execute("GRANT CREATE ON SCHEMA public TO alice")
    e.execute("GRANT CREATE ON SCHEMA public TO eve")

    e.execute("SET ROLE alice")
    e.execute("CREATE TABLE owned (k BIGINT PRIMARY KEY)")
    e.execute("RESET ROLE")

    e.execute("SET ROLE eve")
    // duplicate CREATE fails — and must not reassign the owner entry
    intercept[Exception](
      e.execute("CREATE TABLE owned (k BIGINT PRIMARY KEY)"))
    // IF NOT EXISTS no-op on an existing name must not either
    e.execute("CREATE TABLE IF NOT EXISTS owned (k BIGINT PRIMARY KEY)")
    // if eve had become owner, DROP would succeed; it must not
    intercept[Exception](e.execute("DROP TABLE owned"))
    e.execute("RESET ROLE")

    // the real owner still can
    e.execute("SET ROLE alice")
    e.execute("DROP TABLE owned")
    e.execute("RESET ROLE")
  }

  test("processlist hides other users' query text and credentials") {
    val e = new Engine(spark, tmpDir("users"))
    e.execute("CREATE USER watcher")
    val pidA = e.registerWireSession("graft", "127.0.0.1:1", "dev", () => ())
    val pidB = e.registerWireSession("watcher", "127.0.0.1:2", "dev", () => ())
    e.wireSessionQuery(pidA, "CREATE USER hidden PASSWORD 'hunter2'")
    e.wireSessionQuery(pidB, "SELECT 42")

    // credentials never enter the registry at all
    val self = e.execute("SHOW PROCESSLIST").collect()
      .map(r => r.getInt(0) -> r.getString(5)).toMap
    assert(self(pidA).contains("'***'") && !self(pidA).contains("hunter2"))
    assert(self(pidB) == "SELECT 42") // superuser sees everyone

    // a non-superuser sees only their own backend's text
    e.startupUser = "watcher"; e.sessionUser = "watcher"
    val other = e.execute(
      "SELECT pid, query FROM pg_stat_activity ORDER BY pid").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(other(pidB) == "SELECT 42")
    assert(other(pidA) == "<insufficient privilege>", other(pidA))
    e.startupUser = "graft"; e.sessionUser = "graft"
    e.unregisterWireSession(pidA); e.unregisterWireSession(pidB)
  }

  test("users, acls and owners survive restart; current_user splices") {
    val wh = tmpDir("users")
    val e1 = new Engine(spark, wh)
    e1.execute("CREATE TABLE t (k BIGINT PRIMARY KEY)")
    e1.execute("INSERT INTO t VALUES (1)")
    e1.execute("CREATE USER erin")
    e1.execute("GRANT SELECT ON t TO erin")

    val e2 = new Engine(spark.newSession(), wh)
    assert(e2.execute("SELECT usename FROM pg_user").as[String]
      .collect().toSet.contains("erin"))
    e2.execute("SET ROLE erin")
    assert(e2.execute("SELECT current_user").head().getString(0) == "erin")
    assert(e2.execute("SELECT count(*) c FROM t").head().getLong(0) == 1)
    intercept[Exception](e2.execute("INSERT INTO t VALUES (2)"))
    e2.execute("RESET ROLE")
    assert(e2.execute("SELECT session_user").head().getString(0) == "graft")
  }
}
