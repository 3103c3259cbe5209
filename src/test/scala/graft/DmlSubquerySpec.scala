package graft

/** DML predicates with subqueries (reference: batch delete/update plans
  * accept arbitrary scalar/IN/EXISTS predicates — handler/dml.rs binds
  * the WHERE like any query): `DELETE FROM t WHERE k IN (SELECT …)`,
  * correlated EXISTS updates, and scalar-subquery thresholds.
  */
class DmlSubquerySpec extends SparkSpecBase {
  import spark.implicits._

  test("DELETE and UPDATE accept IN / scalar subquery predicates") {
    val e = new Engine(spark, tmpDir("dmlsub"))
    e.execute("CREATE TABLE st (k BIGINT PRIMARY KEY, grp VARCHAR, v DOUBLE)")
    e.execute("CREATE TABLE doomed (k BIGINT PRIMARY KEY)")
    e.execute("INSERT INTO st VALUES (1,'a',10.0),(2,'a',20.0),(3,'b',30.0),(4,'b',40.0)")
    e.execute("INSERT INTO doomed VALUES (2), (3)")

    e.execute("DELETE FROM st WHERE k IN (SELECT k FROM doomed)")
    assert(e.execute("SELECT k FROM st ORDER BY k").as[Long].collect().toSeq ==
      Seq(1L, 4L))

    // scalar subquery threshold
    e.execute("UPDATE st SET v = 0.0 WHERE v > (SELECT avg(v) FROM st)")
    assert(e.execute("SELECT k, v FROM st ORDER BY k")
      .as[(Long, Double)].collect().toSeq == Seq((1L, 10.0), (4L, 0.0)))
  }
}
