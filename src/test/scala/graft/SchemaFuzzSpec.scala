package graft

import scala.util.Random

/** Model-based fuzz of the namespace layer: random interleavings of
  * CREATE/DROP SCHEMA, qualified/search_path CREATE TABLE, DML, RENAME,
  * SET SCHEMA and restarts, diffed against an in-memory model after
  * every mutation batch. Catches resolution bugs (a qualified name
  * captured by the wrong phase) that single-shot specs cannot.
  */
class SchemaFuzzSpec extends SparkSpecBase {

  private val Seeds = 12
  private val OpsPerSeed = 22

  test(s"schema-layer fuzz: $Seeds seeds × $OpsPerSeed ops vs model") {
    (1 to Seeds).foreach { seed =>
      val rnd = new Random(7000 + seed)
      val wh = tmpDir(s"schemafuzz$seed")
      var e = new Engine(spark, wh)
      // model: internal table name -> pk -> v
      val model = scala.collection.mutable.Map[
        String, scala.collection.mutable.Map[Long, Long]]()
      val schemas = scala.collection.mutable.Set[String]()
      var searchPath: Option[String] = None
      var nextId = 0

      def internal(schema: String, bare: String): String =
        if (schema == "public") bare else s"${schema}__$bare"
      def display(n: String): String = {
        val i = n.indexOf("__")
        if (i > 0 && schemas.contains(n.substring(0, i)))
          n.substring(0, i) + "." + n.substring(i + 2)
        else n
      }

      def verify(name: String): Unit = {
        val got = e.execute(s"SELECT k, v FROM ${display(name)} ORDER BY k")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
        val want = model(name).toSeq.sortBy(_._1)
        assert(got == want,
          s"seed $seed: ${display(name)} engine=$got model=$want")
      }

      (1 to OpsPerSeed).foreach { _ =>
        rnd.nextInt(10) match {
          case 0 if schemas.size < 3 =>
            val s = s"fz${seed}s${schemas.size}"
            e.execute(s"CREATE SCHEMA $s")
            schemas += s
          case 1 =>
            val schema =
              if (schemas.isEmpty || rnd.nextBoolean()) "public"
              else schemas.toSeq(rnd.nextInt(schemas.size))
            nextId += 1
            val bare = s"fzt${seed}_$nextId"
            e.execute(s"CREATE TABLE ${if (schema == "public") bare
              else s"$schema.$bare"} (k BIGINT PRIMARY KEY, v BIGINT)")
            model(internal(schema, bare)) =
              scala.collection.mutable.Map.empty
          case 2 | 3 if model.nonEmpty => // insert burst
            val n = model.keys.toSeq(rnd.nextInt(model.size))
            val rows = (1 to 1 + rnd.nextInt(4))
              .map(_ => (rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong))
            val distinct = rows.groupBy(_._1).map(_._2.head).toSeq
            // engine upserts by PK; feed PK-unique batches like a client
            e.execute(s"INSERT INTO ${display(n)} VALUES " +
              distinct.map { case (k, v) => s"($k, $v)" }.mkString(", "))
            distinct.foreach { case (k, v) => model(n)(k) = v }
            verify(n)
          case 4 if model.nonEmpty =>
            val n = model.keys.toSeq(rnd.nextInt(model.size))
            val cut = rnd.nextInt(50)
            e.execute(s"DELETE FROM ${display(n)} WHERE k < $cut")
            model(n).keys.toSeq.filter(_ < cut).foreach(model(n).remove)
            verify(n)
          case 5 if model.nonEmpty =>
            val n = model.keys.toSeq(rnd.nextInt(model.size))
            val bump = rnd.nextInt(100)
            e.execute(s"UPDATE ${display(n)} SET v = v + $bump WHERE k % 2 = 0")
            model(n).foreach { case (k, v) =>
              if (k % 2 == 0) model(n)(k) = v + bump
            }
            verify(n)
          case 6 if model.nonEmpty => // rename (stays in its schema)
            val n = model.keys.toSeq(rnd.nextInt(model.size))
            nextId += 1
            val i = n.indexOf("__")
            val schema =
              if (i > 0 && schemas.contains(n.substring(0, i)))
                n.substring(0, i) else "public"
            val newBare = s"fzt${seed}_$nextId"
            e.execute(s"ALTER TABLE ${display(n)} RENAME TO $newBare")
            model(internal(schema, newBare)) = model.remove(n).get
            verify(internal(schema, newBare))
          case 7 if model.nonEmpty && schemas.nonEmpty => // SET SCHEMA
            val n = model.keys.toSeq(rnd.nextInt(model.size))
            val target = (schemas.toSeq :+ "public")(
              rnd.nextInt(schemas.size + 1))
            val bare = display(n).split("\\.").last
            val dest = internal(target, bare)
            if (dest != n && !model.contains(dest)) {
              e.execute(s"ALTER TABLE ${display(n)} SET SCHEMA $target")
              model(dest) = model.remove(n).get
              verify(dest)
            }
          case 8 if schemas.nonEmpty => // flip search_path
            searchPath = if (rnd.nextBoolean())
              Some(schemas.toSeq(rnd.nextInt(schemas.size))) else None
            searchPath match {
              case Some(s) => e.execute(s"SET search_path TO $s, public")
              case None => e.execute("RESET search_path")
            }
          case 9 => // restart: everything must recover
            e = new Engine(spark.newSession(), wh)
            searchPath.foreach(s =>
              e.execute(s"SET search_path TO $s, public"))
            model.keys.foreach(verify)
          case _ =>
        }
      }
      model.keys.foreach(verify)
      // teardown: cascade-drop the schemas, then the public leftovers
      schemas.foreach(s => e.execute(s"DROP SCHEMA $s CASCADE"))
      model.keys.filter(!_.contains("__"))
        .foreach(n => e.execute(s"DROP TABLE $n"))
    }
  }

  // --- the r5 audit's bare-token capture envelope, now closed: name
  // resolution consults the PARSED statement, so only identifiers in
  // RELATION position rewrite (Engine.queryRelationScope). These seeds
  // are exactly the collisions the old global token replace corrupted.

  test("a column sharing a path-resolved table's name is not captured") {
    val e = new Engine(spark, tmpDir("schemacollide"))
    e.execute("CREATE SCHEMA sc")
    // the collision: schema sc owns table ORDERS; a public table has a
    // COLUMN named orders
    e.execute("CREATE TABLE sc.orders (k BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("INSERT INTO sc.orders VALUES (1, 100)")
    e.execute("CREATE TABLE items (id BIGINT PRIMARY KEY, orders BIGINT)")
    e.execute("INSERT INTO items VALUES (7, 3)")
    e.execute("SET search_path TO sc, public")
    // the regex path rewrote the COLUMN token into sc__orders and broke
    // the query; the AST scope must leave it alone
    assert(e.execute("SELECT orders FROM items")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    // UPDATE's SET/WHERE column references must also stay untouched
    e.execute("UPDATE items SET orders = orders + 1 WHERE orders = 3")
    assert(e.execute("SELECT orders FROM items")
      .collect().map(_.getLong(0)).toSeq == Seq(4L))
    // while genuine READS of the bare name still path-resolve to sc.orders
    assert(e.execute("SELECT v FROM orders")
      .collect().map(_.getLong(0)).toSeq == Seq(100L))
    // both roles across one statement: relation position rewrites,
    // qualified column references don't
    assert(e.execute(
      "SELECT i.orders AS n, o.v FROM items i JOIN orders o ON o.k = 1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((4L, 100L)))
    e.execute("DROP SCHEMA sc CASCADE")
    e.execute("DROP TABLE items")
  }

  test("one token as BOTH relation and column rewrites only at relation spans") {
    val e = new Engine(spark, tmpDir("schemaboth"))
    e.execute("CREATE SCHEMA sb")
    // the degenerate collision: table t whose COLUMN is also named t
    e.execute("CREATE TABLE sb.t (t BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("INSERT INTO sb.t VALUES (5, 50)")
    e.execute("SET search_path TO sb, public")
    // the old token rewrite turned EVERY t into sb__t and corrupted the
    // column reference; the span rewrite touches only the FROM position
    assert(e.execute("SELECT t AS c FROM t")
      .collect().map(_.getLong(0)).toSeq == Seq(5L))
    assert(e.execute("SELECT t FROM t WHERE t = 5")
      .collect().map(_.getLong(0)).toSeq == Seq(5L))
    // an explicit alias spelled differently still resolves the column
    assert(e.execute("SELECT x.t FROM t AS x")
      .collect().map(_.getLong(0)).toSeq == Seq(5L))
    // DML: UPDATE's target rewrites, its SET/WHERE column refs don't
    e.execute("UPDATE t SET t = t + 1 WHERE t = 5")
    assert(e.execute("SELECT t FROM t")
      .collect().map(_.getLong(0)).toSeq == Seq(6L))
    // a CTE named like the path-resolved table SHADOWS it (PG scoping):
    // the CTE body's alias, not sb.t's rows, must come back
    assert(e.execute("WITH t AS (SELECT 1 AS one) SELECT one FROM t")
      .collect().map(_.getInt(0)).toSeq == Seq(1))
    e.execute("DROP SCHEMA sb CASCADE")
  }

  // --- the database dimension: the reference isolates catalogs per
  // database; here two sessions on different databases must see fully
  // disjoint catalogs (names, schemas, listings) over one engine.

  test("USE re-homes the session to another database (use_db.rs)") {
    val e = new Engine(spark, tmpDir("usedb"))
    e.execute("CREATE DATABASE appdb")
    e.execute("CREATE TABLE u_dev (k BIGINT PRIMARY KEY)")
    e.execute("INSERT INTO u_dev VALUES (1)")
    e.execute("USE appdb")
    assert(e.sessionDatabase == "appdb")
    e.execute("CREATE TABLE u_app (k BIGINT PRIMARY KEY)")
    e.execute("INSERT INTO u_app VALUES (7)")
    assert(e.execute("SELECT k FROM u_app").head().getLong(0) == 7L)
    // dev is the flat root namespace: its bare names stay reachable
    // from a named database (documented envelope — the reverse is
    // prefix-hidden)
    assert(e.execute("SELECT k FROM u_dev").head().getLong(0) == 1L)
    e.execute("USE dev")
    assert(e.execute("SELECT k FROM u_dev").head().getLong(0) == 1L)
    intercept[Exception] { e.execute("SELECT * FROM u_app") }
    intercept[Exception] { e.execute("USE no_such_db") }
  }

  test("databases isolate catalogs: same names coexist, listings disjoint") {
    val wh = tmpDir("dbisolate")
    val e = new Engine(spark, wh)
    def in[T](db: String)(f: => T): T = {
      val prev = e.sessionDatabase
      e.sessionDatabase = db
      try f finally e.sessionDatabase = prev
    }
    e.execute("CREATE DATABASE da")
    e.execute("CREATE DATABASE db2")
    // the same table name in dev, da and db2 — three distinct objects
    e.execute("CREATE TABLE iso (k BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("INSERT INTO iso VALUES (1, 100)")
    in("da") {
      e.execute("CREATE TABLE iso (k BIGINT PRIMARY KEY, v BIGINT)")
      e.execute("INSERT INTO iso VALUES (1, 200), (2, 201)")
    }
    in("db2") {
      e.execute("CREATE TABLE iso (k BIGINT PRIMARY KEY, v BIGINT)")
      e.execute("INSERT INTO iso VALUES (9, 300)")
    }
    def vals(db: String): Set[Long] = in(db) {
      e.execute("SELECT v FROM iso").collect().map(_.getLong(0)).toSet
    }
    assert(vals("dev") == Set(100L))
    assert(vals("da") == Set(200L, 201L))
    assert(vals("db2") == Set(300L))
    // DML stays scoped
    in("da")(e.execute("UPDATE iso SET v = v + 1 WHERE k <= 2"))
    assert(vals("da") == Set(201L, 202L) && vals("dev") == Set(100L))
    // listings are disjoint; a named database lists user-facing names
    def shown(db: String): Set[String] = in(db) {
      e.execute("SHOW TABLES").collect().map(_.getString(0)).toSet
    }
    assert(shown("dev").contains("iso") && !shown("dev").exists(_.contains("0db")))
    assert(shown("da") == Set("iso") && shown("db2") == Set("iso"))
    // schemas are per-database: schema sc in da is invisible in db2
    in("da") {
      e.execute("CREATE SCHEMA sc")
      e.execute("CREATE TABLE sc.t2 (k BIGINT PRIMARY KEY, v BIGINT)")
      e.execute("INSERT INTO sc.t2 VALUES (5, 50)")
      assert(e.execute("SELECT v FROM sc.t2").collect().head.getLong(0) == 50L)
      e.execute("SET search_path TO sc, public")
      assert(e.execute("SELECT v FROM t2").collect().head.getLong(0) == 50L)
      e.execute("SET search_path TO DEFAULT")
    }
    in("db2") {
      intercept[Exception](e.execute("SELECT v FROM sc.t2"))
      intercept[Exception](e.execute("SELECT v FROM t2"))
    }
    // explicit public. qualifier binds to the session database's public
    assert(in("da")(
      e.execute("SELECT v FROM public.iso WHERE k = 2")
        .collect().head.getLong(0)) == 202L)
    // pg_database / SHOW DATABASES list all three
    val dbs = e.execute("SHOW DATABASES").collect().map(_.getString(0)).toSet
    assert(Set("dev", "da", "db2").subsetOf(dbs))
    // chained MVs maintain inside a named database
    in("da") {
      e.execute("CREATE MATERIALIZED VIEW agg (PRIMARY KEY (k)) AS " +
        "SELECT k, count(*) AS n FROM iso GROUP BY k")
      e.execute("INSERT INTO iso VALUES (3, 7)")
      e.execute("FLUSH")
      assert(e.execute("SELECT k, n FROM agg").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet ==
        Set((1L, 1L), (2L, 1L), (3L, 1L)))
    }
    intercept[Exception](in("dev")(e.execute("SELECT * FROM agg")))
    // a database survives restart with its namespace intact
    val e2 = new Engine(spark, wh)
    e2.sessionDatabase = "da"
    assert(e2.execute("SELECT v FROM iso").collect()
      .map(_.getLong(0)).toSet == Set(201L, 202L, 7L))
    assert(e2.execute("SELECT v FROM sc.t2").collect().head.getLong(0) == 50L)
    // DROP DATABASE cascades objects and schemas away
    e2.sessionDatabase = "dev"
    e2.execute("DROP DATABASE db2")
    assert(!e2.execute("SHOW DATABASES").collect()
      .map(_.getString(0)).contains("db2"))
    e2.sessionDatabase = "da"
    assert(e2.execute("SELECT v FROM iso").collect().nonEmpty)
  }

  test("chained MV over an upstream whose column shares its name maintains") {
    val e = new Engine(spark, tmpDir("chaincollide"))
    // column named like its own table — legal SQL, and the shape whose
    // defining-query rewrite the old \b-token replace corrupted
    e.execute("CREATE TABLE cbase (id BIGINT PRIMARY KEY, cbase BIGINT)")
    e.execute("CREATE MATERIALIZED VIEW mv_collide (PRIMARY KEY (id)) AS " +
      "SELECT id, cbase FROM cbase WHERE cbase % 2 = 0")
    e.execute("CREATE MATERIALIZED VIEW mv_collide_agg (PRIMARY KEY (cbase)) AS " +
      "SELECT cbase, count(*) AS n FROM mv_collide GROUP BY cbase")
    assert(e.streamingJob("mv_collide").nonEmpty &&
      e.streamingJob("mv_collide_agg").nonEmpty)
    e.execute("INSERT INTO cbase VALUES (1, 2), (2, 3), (3, 4), (4, 2)")
    e.execute("FLUSH")
    def rowsOf(n: String) = e.table(n).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rowsOf("mv_collide") == Set((1L, 2L), (3L, 4L), (4L, 2L)))
    assert(rowsOf("mv_collide_agg") == Set((2L, 2L), (4L, 1L)))
    // retraction through the collision-named chain
    e.execute("UPDATE cbase SET cbase = cbase + 1 WHERE id = 1") // leaves filter
    e.execute("DELETE FROM cbase WHERE id = 3")
    e.execute("FLUSH")
    assert(rowsOf("mv_collide") == Set((4L, 2L)))
    assert(rowsOf("mv_collide_agg") == Set((2L, 1L)))
  }
}
