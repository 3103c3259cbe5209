package graft

import java.sql.DriverManager

import graft.sources.JdbcCdc
import graft.streaming.MaterializedView

/** Direct CDC capture (reference: src/connector/src/source/cdc/) against
  * an embedded Derby database: snapshot backfill, incremental polls that
  * move only changed rows, delete propagation via the soft-delete
  * marker, idempotent replay, and frontier recovery across a source
  * restart.
  */
class JdbcCdcSpec extends SparkSpecBase {

  test("backfill + incremental polls converge the replica to the remote table") {
    val dir = tmpDir("cdc")
    val url = s"jdbc:derby:$dir/db;create=true"
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE accounts (id BIGINT NOT NULL, name VARCHAR(32), " +
      "balance DOUBLE, ver BIGINT NOT NULL, dead BOOLEAN NOT NULL)")
    def upsertRow(id: Long, name: String, bal: Double, ver: Long, dead: Boolean = false): Unit = {
      st.execute(s"DELETE FROM accounts WHERE id = $id")
      st.execute(s"INSERT INTO accounts VALUES ($id, '$name', $bal, $ver, $dead)")
    }
    upsertRow(1, "ada", 10.0, 1)
    upsertRow(2, "bob", 20.0, 2)
    upsertRow(3, "cyd", 30.0, 3)

    val mv = new MaterializedView(spark, "acc", Seq("ID"), s"$dir/mv", 4)
    val cdc = new JdbcCdc(spark, url, "accounts", "VER", Some("DEAD"),
      mv, s"$dir/state")

    // snapshot backfill: full table, frontier at max version
    assert(cdc.backfill() == 3)
    assert(cdc.frontier == 3L)
    assert(cdc.replica().count() == 3)

    // nothing changed → empty poll, frontier stays
    assert(cdc.pollOnce() == 0)

    // remote mutations: update, insert, delete — each bumps the version
    upsertRow(2, "bob", 25.0, 4)          // update
    upsertRow(4, "dee", 40.0, 5)          // insert
    upsertRow(1, "ada", 10.0, 6, dead = true) // delete (soft marker)

    // one poll captures exactly the 3 changed rows
    assert(cdc.pollOnce() == 3)
    assert(cdc.frontier == 6L)
    val rows = cdc.replica().orderBy("ID")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows == Seq((2L, "bob", 25.0), (3L, "cyd", 30.0), (4L, "dee", 40.0)))

    // restart: a fresh source over the same state dir resumes the
    // committed frontier — no re-capture, no duplicates
    val cdc2 = new JdbcCdc(spark, url, "accounts", "VER", Some("DEAD"),
      mv, s"$dir/state")
    assert(cdc2.frontier == 6L)
    assert(cdc2.pollOnce() == 0)

    // and new changes after the restart flow through the recovered source
    upsertRow(3, "cyd", 33.0, 7)
    assert(cdc2.pollOnce() == 1)
    assert(cdc2.replica().where("ID = 3").collect().head.getDouble(2) == 33.0)

    st.close(); conn.close()
  }
}
