package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MultimodalQueries
import graft.plans.MediaMath

/** Wave-68: real JDK media codec round-trips (q306 PNG via
  * javax.imageio, q307 WAV via javax.sound.sampled). The specs prove
  * the byte streams are REAL container formats (magic bytes, an
  * independent decode outside the engine) and that the decoded stats
  * equal a driver-side recompute of the closed-form pixel/sample
  * formulas.
  */
class W68MediaSpec extends GraftSpec {

  test("q306: engine PNG bytes are a real PNG that an independent decode recovers") {
    val rows = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        (lit(4) + pmod(col("doc_id"), lit(MultimodalQueries.PngWMod)))
          .cast("int").as("w"),
        (lit(4) + pmod(col("doc_id"), lit(MultimodalQueries.PngHMod)))
          .cast("int").as("h"))
      .withColumn("png", expr("graft_png_encode(doc_id, w, h)"))
      .limit(20).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, w, h) = (r.getLong(0), r.getInt(1), r.getInt(2))
      val png = r.getAs[Array[Byte]]("png")
      // PNG signature: 89 50 4E 47 0D 0A 1A 0A
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G',
        s"doc $id: not a PNG container")
      // independent decode, outside the engine expression
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == w && img.getHeight == h)
      for (x <- 0 until w; y <- 0 until h) {
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == MediaMath.pr(id, x, y), s"R($x,$y) doc $id")
        assert(((rgb >> 8) & 0xff) == MediaMath.pg(id, x, y), s"G($x,$y) doc $id")
        assert((rgb & 0xff) == MediaMath.pb(id, x, y), s"B($x,$y) doc $id")
      }
    }
  }

  test("q306: decoded sums replay the closed-form pixel arithmetic") {
    val out = MultimodalQueries.q306ImageRoundtrip(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      val w = 4 + (id % MultimodalQueries.PngWMod).toInt
      val h = 4 + (id % MultimodalQueries.PngHMod).toInt
      assert(r.getInt(1) == w && r.getInt(2) == h)
      var sr = 0L; var sg = 0L; var sb = 0L
      for (x <- 0 until w; y <- 0 until h) {
        sr += MediaMath.pr(id, x, y); sg += MediaMath.pg(id, x, y)
        sb += MediaMath.pb(id, x, y)
      }
      assert(r.getLong(3) == sr && r.getLong(4) == sg && r.getLong(5) == sb,
        s"doc $id sums")
      assert(math.abs(r.getDouble(6) -
        math.floor(sr.toDouble / (w * h) * 1e6 + 0.5) / 1e6) < 1e-9)
    }
  }

  test("q307: engine WAV bytes are a real RIFF/WAVE an independent parse recovers") {
    val rows = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        (lit(MultimodalQueries.WavNBase) +
          pmod(col("doc_id"), lit(MultimodalQueries.WavNMod)))
          .cast("int").as("n"))
      .withColumn("wav", expr("graft_wav_encode(doc_id, n)"))
      .limit(20).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, n) = (r.getLong(0), r.getInt(1))
      val wav = r.getAs[Array[Byte]]("wav")
      assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF" &&
        new String(wav.slice(8, 12), "US-ASCII") == "WAVE",
        s"doc $id: not a RIFF/WAVE container")
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      assert(ais.getFrameLength == n)
      val data = ais.readAllBytes()
      for (i <- 0 until n) {
        val s = ((data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff))
        assert(s == MediaMath.sample(id, i), s"sample $i doc $id")
      }
    }
  }

  test("q307: decoded sums replay the closed-form sample arithmetic") {
    val out = MultimodalQueries.q307AudioRoundtrip(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      val n = MultimodalQueries.WavNBase + (id % MultimodalQueries.WavNMod).toInt
      assert(r.getLong(1) == n)
      var sum = 0L; var sumAbs = 0L
      for (i <- 0 until n) {
        val s = MediaMath.sample(id, i); sum += s; sumAbs += math.abs(s)
      }
      assert(r.getLong(2) == sum && r.getLong(3) == sumAbs, s"doc $id sums")
    }
  }
}
