package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.streaming.{Changelog, StatefulOps}
import graft.operators.Dedup

/** Randomized algebraic properties over seeded inputs — the analog of the
  * reference's sqlsmith fuzzing (SURVEY.md §5): each property is checked
  * over many generated cases with fixed seeds (reproducible).
  */
class PropertySpec extends SparkSpecBase {
  import spark.implicits._

  test("property: diff ∘ apply = identity for random table pairs") {
    val rnd = new Random(42)
    (1 to 5).foreach { trial =>
      val keys = (1 to 30).map(_.toLong)
      val before = keys.filter(_ => rnd.nextBoolean())
        .map(k => (k, rnd.nextInt(5).toString)).toDF("id", "v")
      val after = keys.filter(_ => rnd.nextBoolean())
        .map(k => (k, rnd.nextInt(5).toString)).toDF("id", "v")
      val delta = Changelog.diff(before, after, Seq("id"))
      val rebuilt = Changelog.applyToSnapshot(before, delta, Seq("id"))
        .as[(Long, String)].collect().toSet
      val want = after.as[(Long, String)].collect().toSet
      assert(rebuilt == want, s"trial $trial")
    }
  }

  test("property: changelog apply is last-write-wins under any op mix") {
    val rnd = new Random(7)
    (1 to 5).foreach { trial =>
      val snap = (1L to 10L).map(k => (k, "s")).toDF("id", "v")
      val ops = (1 to 40).map { i =>
        val k = rnd.nextInt(12).toLong + 1
        val op = if (rnd.nextBoolean()) Changelog.Insert else Changelog.Delete
        (k, s"v$i", op, i.toLong)
      }
      val changes = ops.toDF("id", "v", Changelog.OpCol, Changelog.SeqCol)
      val got = Changelog.applyToSnapshot(snap, changes, Seq("id"))
        .as[(Long, String)].collect().toMap
      // reference model: replay ops in seq order on a mutable map
      val model = scala.collection.mutable.Map((1L to 10L).map(_ -> "s"): _*)
      ops.sortBy(_._4).foreach { case (k, v, op, _) =>
        if (op == Changelog.Insert) model(k) = v else model.remove(k)
      }
      assert(got == model.toMap, s"trial $trial")
    }
  }

  test("property: retractableTopK equals batch top-k after random ops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rnd = new Random(11)
    val live = scala.collection.mutable.Map[Long, Double]()
    val ops = (1 to 60).map { i =>
      val insert = live.isEmpty || rnd.nextBoolean()
      if (insert) {
        val id = rnd.nextInt(30).toLong
        val score = rnd.nextInt(1000) / 10.0
        live(id) = score
        StatefulOps.ScoredChange("g", id, score, 1)
      } else {
        val id = live.keys.toSeq(rnd.nextInt(live.size))
        val score = live.remove(id).get
        StatefulOps.ScoredChange("g", id, score, -1)
      }
    }
    val ms = MemoryStream[StatefulOps.ScoredChange]
    val q = StatefulOps.retractableTopK(ms.toDS(), k = 5)
      .writeStream.format("memory").queryName("prop_topk")
      .outputMode("update").start()
    ops.grouped(15).foreach { batch => ms.addData(batch); q.processAllAvailable() }
    q.stop()
    val last = spark.table("prop_topk")
      .as[StatefulOps.TopKUpdate].collect().last
    val want = live.toSeq.sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
    assert(last.ids == want)
  }

  test("property: exactByContent is idempotent and order-insensitive") {
    val rnd = new Random(3)
    val docs = (1 to 50).map(i => (i.toLong, s"text ${rnd.nextInt(10)}"))
      .toDF("doc_id", "text")
    val once = Dedup.exactByContent(docs, "doc_id", "text")
    val twice = Dedup.exactByContent(once, "doc_id", "text")
    assert(once.collect().toSet == twice.collect().toSet)
    val shuffled = Dedup.exactByContent(docs.orderBy(rand(99)), "doc_id", "text")
    assert(shuffled.select("doc_id").as[Long].collect().sorted.toSeq ==
      once.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("property: avro codec round-trips random rows incl. edge values") {
    import graft.sources.Avro
    val rnd = new Random(7)
    val edge = Seq(Long.MinValue, Long.MaxValue, 0L, -1L)
    val rows = (1 to 40).map { i =>
      val id = if (i <= edge.size) edge(i - 1) else rnd.nextLong()
      val s = rnd.nextInt(4) match {
        case 0 => None
        case 1 => Some("")
        case 2 => Some("héllo é世界" * rnd.nextInt(3))
        case _ => Some(rnd.alphanumeric.take(rnd.nextInt(12)).mkString)
      }
      val d = rnd.nextInt(4) match {
        case 0 => None
        case 1 => Some(Double.MaxValue)
        case 2 => Some(-0.0)
        case _ => Some(rnd.nextDouble() * 1e9 - 5e8)
      }
      (id, s, d)
    }
    val df = rows.toDF("id", "s", "d")
    val back = Avro.decodeAvro(Avro.encodeAvro(df), "value", df.schema)
    assert(back.orderBy("id", "s", "d").collect().toSeq ==
      df.orderBy("id", "s", "d").collect().toSeq)
  }

  test("property: protobuf codec round-trips random rows (proto3 presence)") {
    import graft.sources.Protobuf
    import graft.sources.Protobuf.Field
    import org.apache.spark.sql.types._
    val fields = Seq(
      Field(1, "id", LongType, nullable = false),
      Field(3, "s", StringType),
      Field(7, "d", DoubleType),
      Field(12, "b", BooleanType, nullable = false))
    val rnd = new Random(11)
    val rows = (1 to 40).map { i =>
      (if (i == 1) Long.MinValue else if (i == 2) -1L else rnd.nextLong(),
        if (rnd.nextBoolean())
          Some(rnd.alphanumeric.take(rnd.nextInt(10)).mkString + "é✓")
        else None,
        if (rnd.nextBoolean()) Some(rnd.nextDouble() * 1e6 - 5e5) else None,
        rnd.nextBoolean())
    }
    val df = rows.toDF("id", "s", "d", "b")
    val back = Protobuf.decodeProtobuf(
      Protobuf.encodeProtobuf(df, fields), "value", fields)
    // proto3 presence: "" / 0 / null all wire-absent → null (nullable) or
    // default (non-nullable); normalize the source the same way
    val norm = df
      .withColumn("s", when(col("s") === "", lit(null)).otherwise(col("s")))
      .withColumn("d", when(col("d") === 0.0, lit(null)).otherwise(col("d")))
    assert(back.orderBy("id").collect().toSeq ==
      norm.orderBy("id").collect().toSeq)
  }

  test("property: PPM codec roundtrips random rasters of any geometry") {
    val rnd = new Random(19)
    (1 to 20).foreach { trial =>
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(40)
      val pix = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val img = graft.operators.Multimodal.decodePpm(
        graft.operators.Multimodal.encodePpm(w, h, pix))
      assert(img.width == w && img.height == h, s"trial $trial")
      def sumCh(off: Int) =
        pix.indices.collect { case i if i % 3 == off => pix(i) & 0xff }.map(_.toLong).sum
      assert(img.sumR == sumCh(0) && img.sumG == sumCh(1) && img.sumB == sumCh(2),
        s"trial $trial ($w x $h)")
    }
  }

  test("property: WAV codec roundtrips random PCM16 streams, any rate") {
    val rnd = new Random(23)
    (1 to 20).foreach { trial =>
      val n = rnd.nextInt(2000)
      val rate = 1 + rnd.nextInt(192000)
      val samples = Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)
      val au = graft.operators.Multimodal.decodeWav(
        graft.operators.Multimodal.encodeWav(rate, samples))
      assert(au.sampleRate == rate && au.nSamples == n, s"trial $trial")
      assert(au.sumAmp == samples.map(_.toLong).sum, s"trial $trial")
      assert(au.peak == (if (n == 0) 0 else samples.map(s => math.abs(s.toInt)).max),
        s"trial $trial")
    }
  }
}
