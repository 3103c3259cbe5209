package graft

/** Driver-contract smoke: `SparkEntry.entry` must work on a session the
  * driver configures itself (no graft confs pre-applied).
  */
class SmokeSpec extends SparkSpecBase {

  test("entry runs on a session without graft confs and returns rows") {
    val vanilla = spark.newSession()
    // simulate a session that never saw our configuration
    vanilla.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    val df = SparkEntry.entry(vanilla)
    assert(df.count() > 0)
  }

  test("every declared oracle has a query and every query runs at sf0.001") {
    val qs = SparkEntry.queries
    SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k), s"orphan oracle $k"))
    // spot-run a sample across packs on the smallest SF
    Seq("q_scan_project", "q_join_star", "q_window_rank", "q_union_all",
      "q_fn_string", "q_tumble", "q_dedup_exact", "q_embed_norm")
      .foreach { name =>
        val n = qs(name)(spark, "/root/testdata/sf0.001").count()
        assert(n >= 0, name)
      }
  }
}
