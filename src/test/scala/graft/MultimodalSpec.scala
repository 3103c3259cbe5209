package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Golden-bytes conformance for the pure-JVM multimodal codecs: the
  * decoders are exercised against hand-assembled PPM/WAV files (not the
  * project's own encoders), then the encode→decode roundtrip and the
  * distributed decode pipeline.
  */
class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("decodePpm parses a hand-written P6 file with comments") {
    // 2x2 image, header with a comment line and mixed whitespace.
    val header = "P6\n# golden fixture\n2 2\n255\n".getBytes("US-ASCII")
    val raster = Array[Int](
      10, 20, 30, 40, 50, 60,
      70, 80, 90, 255, 0, 128).map(_.toByte)
    val img = Multimodal.decodePpm(header ++ raster)
    assert(img.width == 2 && img.height == 2)
    assert(img.sumR == 10 + 40 + 70 + 255)
    assert(img.sumG == 20 + 50 + 80 + 0)
    assert(img.sumB == 30 + 60 + 90 + 128)
  }

  test("decodePpm rejects bad magic, maxval, truncated raster") {
    val ok = Multimodal.encodePpm(2, 1, Array[Byte](1, 2, 3, 4, 5, 6))
    intercept[IllegalArgumentException](Multimodal.decodePpm("P5\n1 1\n255\n x".getBytes))
    intercept[IllegalArgumentException](Multimodal.decodePpm("P6\n1 1\n65535\n".getBytes ++ Array[Byte](1, 2)))
    intercept[IllegalArgumentException](Multimodal.decodePpm(ok.dropRight(1)))
  }

  test("decodeWav parses a hand-assembled RIFF with an unknown chunk") {
    // RIFF → WAVE → LIST (skipped) → fmt (PCM16 mono 8000Hz) → data
    // with samples [1000, -1000, 32767]. Assembled byte-by-byte, not via
    // encodeWav, so the parser is checked against the public layout.
    val bb = java.nio.ByteBuffer.allocate(128).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); val sizeAt = bb.position(); bb.putInt(0)
    bb.put("WAVE".getBytes)
    bb.put("LIST".getBytes).putInt(4).put("INFO".getBytes) // unknown chunk
    bb.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(6)
      .putShort(1000).putShort(-1000).putShort(32767)
    val end = bb.position()
    bb.putInt(sizeAt, end - 8)
    val au = Multimodal.decodeWav(java.util.Arrays.copyOf(bb.array(), end))
    assert(au.sampleRate == 8000 && au.channels == 1)
    assert(au.nSamples == 3)
    assert(au.sumAmp == 1000L - 1000L + 32767L)
    assert(au.peak == 32767)
  }

  test("wav roundtrip: encode then decode recovers rate and samples") {
    val samples = Array.tabulate(500)(i => ((i * 123) % 30000 - 15000).toShort)
    val au = Multimodal.decodeWav(Multimodal.encodeWav(44100, samples))
    assert(au.sampleRate == 44100)
    assert(au.nSamples == 500)
    assert(au.sumAmp == samples.map(_.toLong).sum)
    assert(au.peak == samples.map(s => math.abs(s.toInt)).max)
  }

  test("decodeFeature dispatches on magic: ppm, wav, digest fallback") {
    val ppm = Multimodal.encodePpm(2, 1, Array[Byte](10, 20, 30, 40, 50, 60))
    val fImg = Multimodal.decodeFeature(ppm)
    assert(fImg(0) == 2f && fImg(1) == 1f && fImg(2) == 25f) // mean R = (10+40)/2
    val wav = Multimodal.encodeWav(16000, Array[Short](5, -5, 10))
    val fAud = Multimodal.decodeFeature(wav)
    assert(fAud(0) == 16000f && fAud(1) == 3f && fAud(3) == 10f)
    val other = Multimodal.decodeFeature("not media".getBytes)
    assert(other.length == 8 && other.forall(v => v >= 0f && v <= 1f))
  }

  test("decodeBinaryAssets matches a local recompute of the formulas") {
    val ids = spark.range(0, 40).select(col("id").as("asset_id"))
    val got = Multimodal.decodeBinaryAssets(ids).orderBy("asset_id").collect()
    got.foreach { r =>
      val a = r.getLong(0)
      val (modality, bytes) = Multimodal.syntheticAsset(a)
      assert(r.getString(1) == modality)
      if (modality == "image") {
        val img = Multimodal.decodePpm(bytes)
        assert(r.getInt(2) == img.width && r.getInt(3) == img.height)
        assert(r.getLong(4) == img.sumR && r.getLong(5) == img.sumG && r.getLong(6) == img.sumB)
        // independent recompute from the generating formula
        val n = img.width * img.height
        assert(img.sumR == (0 until n).map(i => (a * 31 + 3L * i) % 256).sum)
      } else {
        val au = Multimodal.decodeWav(bytes)
        assert(r.getInt(7) == au.sampleRate && r.getLong(8) == au.nSamples)
        assert(r.getLong(9) == au.sumAmp && r.getInt(10) == au.peak)
        val exp = (0 until au.nSamples.toInt).map(i => (a * 131 + 37L * i) % 2001 - 1000)
        assert(au.sumAmp == exp.sum && au.peak == exp.map(math.abs).max)
      }
    }
  }
}
