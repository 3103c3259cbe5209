package graft

/** `EXPLAIN CREATE MATERIALIZED VIEW` — reports the maintenance
  * strategy the chain planner would pick (reference: handler/explain.rs
  * prints the stream plan for explain-create-mv) followed by the inner
  * SELECT's batch plan, creating NOTHING.
  */
class ExplainMvSpec extends SparkSpecBase {

  test("EXPLAIN CREATE MV reports each chain strategy and creates nothing") {
    val e = new Engine(spark, tmpDir("explainmv"))
    e.execute("CREATE TABLE exa (id BIGINT PRIMARY KEY, g BIGINT, v BIGINT)")
    e.execute("CREATE TABLE exb (oid BIGINT PRIMARY KEY, k2 BIGINT, w BIGINT)")
    e.execute("CREATE TABLE exc (cid BIGINT PRIMARY KEY, k3 BIGINT, u BIGINT)")
    def head(stmt: String): String =
      e.execute(stmt).collect().head.getString(0)

    assert(head("EXPLAIN CREATE MATERIALIZED VIEW m1 (PRIMARY KEY (id)) AS " +
      "SELECT id, v FROM exa WHERE v % 2 = 0")
      .startsWith("maintenance: incremental per-row chain over exa"))
    assert(head("EXPLAIN CREATE MATERIALIZED VIEW m2 (PRIMARY KEY (g)) AS " +
      "SELECT g, count(*) AS n FROM exa GROUP BY g")
      .contains("incremental grouped aggregate over exa"))
    assert(head("EXPLAIN CREATE MATERIALIZED VIEW m3 (PRIMARY KEY (id, oid)) " +
      "AS SELECT exa.id, exb.oid, exa.v + exb.w AS s " +
      "FROM exa JOIN exb ON exa.g = exb.k2")
      .contains("delta join of exa ⋈ exb"))
    assert(head("EXPLAIN CREATE MATERIALIZED VIEW m4 " +
      "(PRIMARY KEY (id, oid, cid)) AS " +
      "SELECT id, oid, cid, v + w + u AS s FROM exa " +
      "JOIN exb ON g = k2 JOIN exc ON k2 = k3")
      .contains("delta-join cascade"))
    // pure-theta join: no chain shape takes it — the fence is explicit
    assert(head("EXPLAIN CREATE MATERIALIZED VIEW m5 (PRIMARY KEY (id, oid)) " +
      "AS SELECT exa.id, exb.oid FROM exa JOIN exb ON exa.v < exb.w")
      .contains("BATCH REFRESH fence"))
    // no engine-managed upstream at all → one-shot batch
    assert(head("EXPLAIN CREATE MATERIALIZED VIEW m6 (PRIMARY KEY (x)) AS " +
      "SELECT 1 AS x").contains("one-shot batch materialization"))

    // the strategy line is followed by the batch plan of the SELECT
    val all = e.execute("EXPLAIN CREATE MATERIALIZED VIEW m7 (PRIMARY KEY (g)) " +
      "AS SELECT g, sum(v) AS sv FROM exa GROUP BY g")
      .collect().map(_.getString(0))
    assert(all.head.startsWith("maintenance:") &&
      all.exists(_.contains("HashAggregate")))

    // EXPLAIN created nothing — no MVs (tables list under SHOW TABLES
    // only), no cascade steps, no jobs
    assert(e.execute("SHOW MATERIALIZED VIEWS").collect().isEmpty)
    assert(e.execute("SHOW TABLES").collect().map(_.getString(0)).toSet ==
      Set("exa", "exb", "exc"))
    assert(Seq("m1", "m2", "m3", "m4", "m5", "m6", "m7")
      .forall(n => e.streamingJob(n).isEmpty))
  }
}
