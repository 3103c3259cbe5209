package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
object EpochProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", 8)).getOrCreate()
    graft.GraftSession.init(spark)
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val jobMs = new java.util.concurrent.atomic.AtomicLong
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val detail = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val cs = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
        val sq = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .map(d => if (d.contains("runId")) "[stream]" else d.take(40))
        val desc = (cs.getOrElse("?") + " " + sq.getOrElse("")).trim
        starts.put(j.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, desc) =>
          val ms = (System.nanoTime() - t0) / 1000000
          jobMs.addAndGet(ms)
          detail.add(f"$ms%5d ms  ${desc.take(110)}")
        }
      }
    })
    val e = new graft.Engine(spark, "/tmp/epochprof_wh_" + System.nanoTime())
    e.execute("SET streaming_parallelism = 4")
    e.execute("CREATE TABLE ep_t (k BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("CREATE MATERIALIZED VIEW ep_mv (PRIMARY KEY (k)) AS SELECT k, v * 2 AS v2 FROM ep_t")
    e.execute("CREATE MATERIALIZED VIEW ep_agg (PRIMARY KEY (g)) AS SELECT v2 % 3 AS g, count(*) AS n FROM ep_mv GROUP BY v2 % 3")
    def epoch(i: Int): Unit = {
      Thread.sleep(200) // let listener drain
      val (j0, m0) = (jobs.get(), jobMs.get())
      val t0 = System.nanoTime()
      e.execute(s"INSERT INTO ep_t VALUES (${i*10+1}, ${i*7}), (${i*10+2}, ${i*11})")
      val t1 = System.nanoTime()
      e.execute("FLUSH")
      val t2 = System.nanoTime()
      Thread.sleep(200)
      println(f"epoch $i: insert ${(t1-t0)/1e9}%.3f flush ${(t2-t1)/1e9}%.3f " +
        f"sparkJobs ${jobs.get()-j0} jobMs ${jobMs.get()-m0}")
    }
    (1 to 5).foreach(epoch)
    detail.clear()
    epoch(6)
    Thread.sleep(300)
    println("--- epoch 6 jobs ---")
    detail.forEach(println(_))
    spark.stop()
  }
}
