package graft

/** CREATE TABLE surface beyond plain columns (reference:
  * handler/create_table.rs): generated columns (`col type AS expr`,
  * recomputed on INSERT/UPDATE, never directly writable) and
  * ON CONFLICT behaviors (OVERWRITE default / IGNORE / DO UPDATE IF
  * NOT NULL), both durable across restart and visible in SHOW CREATE.
  */
class TableFeaturesSpec extends SparkSpecBase {
  import spark.implicits._

  test("generated columns compute on INSERT and recompute on UPDATE") {
    val e = new Engine(spark, tmpDir("gen"))
    e.execute("CREATE TABLE gt (k BIGINT PRIMARY KEY, a BIGINT, b BIGINT, " +
      "s BIGINT AS a + b)")
    // positional insert skips the generated column
    e.execute("INSERT INTO gt VALUES (1, 10, 5), (2, 20, 2)")
    assert(e.execute("SELECT k, s FROM gt ORDER BY k")
      .as[(Long, Long)].collect().toSeq == Seq((1L, 15L), (2L, 22L)))

    // UPDATE recomputes from the post-assignment row
    e.execute("UPDATE gt SET a = 100 WHERE k = 1")
    assert(e.execute("SELECT s FROM gt WHERE k = 1").head().getLong(0) == 105L)

    // direct writes to a generated column are rejected
    intercept[Exception] { e.execute("INSERT INTO gt (k, a, b, s) VALUES (3, 1, 1, 9)") }
    intercept[Exception] { e.execute("UPDATE gt SET s = 0 WHERE k = 1") }

    // SHOW CREATE round-trips the generated clause
    val ddl = e.execute("SHOW CREATE TABLE gt").head().getString(1)
    assert(ddl.contains("AS a + b"))
  }

  test("PK-less CREATE TABLE: hidden _row_id keys DML, stays out of *") {
    val wh = tmpDir("rowid")
    val e = new Engine(spark, wh)
    // no PRIMARY KEY → generated hidden _row_id (reference:
    // bind_pk_and_row_id_on_relation, handler/create_table.rs:476-517)
    e.execute("CREATE TABLE rt (v BIGINT, s STRING)")
    e.execute("INSERT INTO rt VALUES (1, 'a'), (2, 'b'), (2, 'b')")
    // duplicates survive (append-only semantics: each row has its own id)
    assert(e.execute("SELECT count(*) AS n FROM rt").head().getLong(0) == 3L)
    // star expansion hides the id; explicit reference resolves it
    assert(e.execute("SELECT * FROM rt").columns.toSeq == Seq("v", "s"))
    assert(e.execute("SELECT _row_id, v FROM rt").count() == 3L)
    assert(e.execute("SELECT DISTINCT _row_id FROM rt").count() == 3L)
    // UPDATE / DELETE merge on the hidden key
    e.execute("UPDATE rt SET v = v + 10 WHERE s = 'b'")
    assert(e.execute("SELECT sum(v) AS s FROM rt").head().getLong(0) == 25L)
    e.execute("DELETE FROM rt WHERE v = 12")
    assert(e.execute("SELECT count(*) AS n FROM rt").head().getLong(0) == 1L)
    // catalog surface hides the column; restart keeps the hidden-id mode
    val cols = e.execute(
      "SELECT column_name FROM information_schema.columns " +
        "WHERE table_name = 'rt'").collect().map(_.getString(0)).toSet
    assert(!cols.contains("_row_id") && cols == Set("v", "s"))
    val e2 = new Engine(spark, wh)
    e2.execute("INSERT INTO rt VALUES (7, 'z')")
    assert(e2.execute("SELECT * FROM rt").columns.toSeq == Seq("v", "s"))
    assert(e2.execute("SELECT count(DISTINCT _row_id) AS n FROM rt")
      .head().getLong(0) == 2L)
  }

  test("ON CONFLICT IGNORE keeps the stored row") {
    val e = new Engine(spark, tmpDir("conf-ign"))
    e.execute("CREATE TABLE it (k BIGINT PRIMARY KEY, v VARCHAR) " +
      "ON CONFLICT IGNORE")
    e.execute("INSERT INTO it VALUES (1, 'first')")
    e.execute("INSERT INTO it VALUES (1, 'second'), (2, 'fresh')")
    assert(e.execute("SELECT k, v FROM it ORDER BY k")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "first"), (2L, "fresh")))
    assert(e.execute("SHOW CREATE TABLE it").head().getString(1)
      .contains("ON CONFLICT IGNORE"))
  }

  test("ON CONFLICT DO UPDATE IF NOT NULL keeps stored values under NULLs") {
    val e = new Engine(spark, tmpDir("conf-dun"))
    e.execute("CREATE TABLE dt (k BIGINT PRIMARY KEY, x VARCHAR, y VARCHAR) " +
      "ON CONFLICT DO UPDATE IF NOT NULL")
    e.execute("INSERT INTO dt VALUES (1, 'x1', 'y1')")
    // NULL x must not clobber the stored x; y updates
    e.execute("INSERT INTO dt VALUES (1, NULL, 'y2')")
    assert(e.execute("SELECT x, y FROM dt WHERE k = 1")
      .as[(String, String)].head() == (("x1", "y2")))
  }

  test("generated + on-conflict behaviors survive restart") {
    val dir = tmpDir("gen-restart")
    val e1 = new Engine(spark, dir)
    e1.execute("CREATE TABLE rt (k BIGINT PRIMARY KEY, a BIGINT, " +
      "d BIGINT AS a * 2) ON CONFLICT IGNORE")
    e1.execute("INSERT INTO rt VALUES (1, 3)")

    val e2 = new Engine(spark, dir)
    e2.execute("INSERT INTO rt VALUES (1, 999), (2, 5)")
    assert(e2.execute("SELECT k, a, d FROM rt ORDER BY k")
      .as[(Long, Long, Long)].collect().toSeq ==
      Seq((1L, 3L, 6L), (2L, 5L, 10L)))
  }

  test("complex DDL types: arrays, struct, map, jsonb, interval") {
    val dir = tmpDir("types")
    val e = new Engine(spark, dir)
    e.execute("CREATE TABLE ct (k BIGINT PRIMARY KEY, tags VARCHAR[], " +
      "pt STRUCT<x INT, y INT>, props MAP(VARCHAR, BIGINT), js JSONB, " +
      "dur INTERVAL)")
    e.execute("INSERT INTO ct SELECT 1, array('a', 'b'), " +
      "named_struct('x', 3, 'y', 4), map('n', CAST(7 AS BIGINT)), " +
      "'{\"deep\": true}', INTERVAL '2' HOUR")

    val row = e.execute("SELECT k, tags[0] AS t0, pt.x AS px, " +
      "props['n'] AS pn, get_json_object(js, '$.deep') AS jd FROM ct")
      .head()
    assert(row.getLong(0) == 1L && row.getString(1) == "a" &&
      row.getInt(2) == 3 && row.getLong(3) == 7L &&
      row.getString(4) == "true")

    // nested array type + struct field in DEFAULT position parses too
    e.execute("CREATE TABLE ct2 (k BIGINT PRIMARY KEY, " +
      "m BIGINT[][], s STRUCT<a STRUCT<b INT>, c VARCHAR>)")
    assert(e.execute("DESCRIBE ct2").count() >= 3)

    // the declared schema (with nested types) survives restart
    val e2 = new Engine(spark.newSession(), dir)
    assert(e2.execute("SELECT pt.y FROM ct").head().getInt(0) == 4)
  }

  test("ALTER TABLE ADD COLUMN DEFAULT backfills and fills future inserts") {
    val dir = tmpDir("addcol")
    val e = new Engine(spark, dir)
    e.execute("CREATE TABLE ac (k BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("INSERT INTO ac VALUES (1, 10), (2, 20)")
    e.execute("ALTER TABLE ac ADD COLUMN tag VARCHAR DEFAULT 'n/a'")

    // existing rows backfilled with the default
    assert(e.execute("SELECT tag FROM ac WHERE k = 1").head().getString(0)
      == "n/a")
    // narrow INSERT fills the default; explicit value wins
    e.execute("INSERT INTO ac (k, v) VALUES (3, 30)")
    e.execute("INSERT INTO ac VALUES (4, 40, 'set')")
    assert(e.execute("SELECT k, tag FROM ac ORDER BY k")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "n/a"), (2L, "n/a"), (3L, "n/a"), (4L, "set")))

    // survives restart (declared default persisted)
    val e2 = new Engine(spark.newSession(), dir)
    e2.execute("INSERT INTO ac (k, v) VALUES (5, 50)")
    assert(e2.execute("SELECT tag FROM ac WHERE k = 5").head().getString(0)
      == "n/a")
  }
}
