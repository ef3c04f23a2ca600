package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.model.Tables

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mapPartitions decode stub equals its expression twin row-for-row") {
    val bin = Multimodal.withBinaryContent(Tables.documents(spark, TestSpark.sf0001))
    val viaMp = Multimodal.decodeStub(bin).collect()
      .map(d => (d.doc_id, d.width, d.height, d.n_frames, d.n_bytes)).toSet
    val viaExpr = Multimodal.decodeStubExprs(bin)
      .as[(Long, Int, Int, Int, Long)].collect().toSet
    assert(viaMp == viaExpr)
    assert(viaMp.nonEmpty)
  }

  test("mapPartitions resize stub equals its expression twin row-for-row") {
    val bin = Multimodal.withBinaryContent(
      Tables.documents(spark, TestSpark.sf0001).filter(length(col("text")) > 0))
    val viaMp = Multimodal.resizeStub(bin).collect()
      .map(r => (r.doc_id, r.out_w, r.out_h, r.thumb_hex)).toSet
    val viaExpr = Multimodal.resizeStubExprs(bin)
      .as[(Long, Int, Int, String)].collect().toSet
    assert(viaMp == viaExpr)
    assert(viaMp.nonEmpty)
    // resized dims actually fit the 64-px box
    assert(viaMp.forall { case (_, w, h, _) => w <= 64 && h <= 64 && w >= 1 && h >= 1 })
  }

  test("binary payload length is utf-8 bytes, not chars (CJK differs)") {
    // (the testdata's lang column is a label only — its text is ASCII —
    // so assert on constructed CJK content)
    val docs = Seq((1L, "中文内容", "zh", "src0", 4L), (2L, "abcd", "en", "src0", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Multimodal.withBinaryContent(docs)
      .select(col("doc_id"), col("meta.n_bytes")).as[(Long, Long)]
      .collect().toMap
    assert(got(1L) == 12L) // 4 CJK chars x 3 bytes
    assert(got(2L) == 4L)
  }

  test("pngPayloads emits REAL PNG bytes; decodePngMeta round-trips dims and " +
      "a full decode recovers the deterministic pixels") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").limit(25)
    val rows = Multimodal.pngPayloads(docs)
      .as[(Long, Array[Byte], Long)].collect()
    assert(rows.nonEmpty)
    // PNG magic: 89 50 4E 47 0D 0A 1A 0A
    rows.foreach { case (_, bytes, _) =>
      assert(bytes.take(8).map(_ & 0xff).toSeq ==
        Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    }
    // header dims via the partitioned reader path match the formula
    val meta = Multimodal.decodePngMeta(Multimodal.pngPayloads(docs))
      .as[(Long, Int, Int, Long)].collect()
    meta.foreach { case (_, w, h, nb) =>
      assert(w == (1 + nb % 16).toInt && h == (1 + (nb * 7) % 16).toInt)
    }
    // full decode of one payload recovers the exact pixel formula —
    // proof the bytes are a faithful raster, not just a valid header
    val (id, bytes, _) = rows.head
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val expect = ((id * 2654435761L + x * 31 + y * 7) & 0xffffff).toInt
      assert((img.getRGB(x, y) & 0xffffff) == expect, s"pixel ($x,$y)")
    }
  }

  test("wavPayloads emits REAL RIFF/WAVE containers; the decoded sample " +
      "stream reproduces the generator sawtooth exactly") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .filter(col("doc_id") < 8)
    val wavs = Multimodal.wavPayloads(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(wavs.size == 8)
    wavs.values.foreach { b =>
      assert(new String(b.take(4), "US-ASCII") == "RIFF")
      assert(new String(b.slice(8, 12), "US-ASCII") == "WAVE")
    }
    val nb = docs.select(col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long"))
      .as[(Long, Long)].collect().toMap
    val got = Multimodal.audioEnergy(Multimodal.wavPayloads(docs)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    for ((id, n0) <- nb) {
      val n = (800 + n0 % 800).toInt
      var sumSq = 0L; var peak = 0L
      for (i <- 0 until n) {
        val v = ((i * 13L + id * 31L) % 2048L) - 1024L
        sumSq += v * v; peak = math.max(peak, math.abs(v))
      }
      assert(got(id) == ((n.toLong, sumSq, peak)),
        s"doc $id decoded energy != generator formula")
    }
  }

  test("poolPngAvg: engine-decoded 2x2 pooled checksums equal a driver-" +
      "side recompute from the pixel formula; degenerate dims pool to 0") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text")
    val out = Multimodal.poolPngAvg(Multimodal.pngPayloads(docs))
      .as[(Long, Int, Int, Long)].collect().map(r => r._1 -> r).toMap
    val nbs = docs.select(col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long"))
      .as[(Long, Long)].collect()
    nbs.foreach { case (id, nb) =>
      val w = (1 + nb % 16).toInt; val h = (1 + (nb * 7) % 16).toInt
      var sum = 0L
      for (py <- 0 until h / 2; px <- 0 until w / 2) {
        var r = 0; var g = 0; var b = 0
        for (dy <- 0 to 1; dx <- 0 to 1) {
          val v = ((id * 2654435761L + (2 * px + dx) * 31 +
            (2 * py + dy) * 7) & 0xffffff).toInt
          r += (v >> 16) & 255; g += (v >> 8) & 255; b += v & 255
        }
        sum += r / 4 + g / 4 + b / 4
      }
      val (_, ow, oh, cs) = out(id)
      assert((ow, oh, cs) == (w / 2, h / 2, sum), s"doc $id mismatch")
      if (w < 2 || h < 2) assert(cs == 0L)
    }
  }

  test("resizePng: the re-encoded output is a REAL 8x8 PNG that decodes " +
      "back to the nearest-neighbor sample of the source formula (dims " +
      "+ every pixel), and the emitted means match a driver recompute") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").limit(20)
    val rows = Multimodal.resizePng(Multimodal.pngPayloads(docs))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5),
        r.getAs[Array[Byte]](6)))
    assert(rows.nonEmpty)
    val nbs = docs.select(col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, ow, oh, mr, mg, mb, png) =>
      assert((ow, oh) == (8, 8))
      // the payload is a genuine PNG: magic bytes + a real decode
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte &&
        png(2) == 'N'.toByte && png(3) == 'G'.toByte)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == 8 && img.getHeight == 8, s"doc $id dims")
      val nb = nbs(id)
      val w = (1 + nb % 16).toInt; val h = (1 + (nb * 7) % 16).toInt
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        val v = ((id * 2654435761L + (x * w / 8) * 31 +
          (y * h / 8) * 7) & 0xffffff).toInt
        // every decoded output pixel IS the formula's sampled source
        // pixel — decode, rescale, and re-encode all bind here
        assert((img.getRGB(x, y) & 0xffffff) == v, s"doc $id px($x,$y)")
        sr += (v >> 16) & 255; sg += (v >> 8) & 255; sb += v & 255
      }
      assert((mr, mg, mb) == (sr / 64, sg / 64, sb / 64), s"doc $id means")
    }
  }

  test("resizePngBilinear: the re-encoded output is a REAL 8x8 PNG " +
      "whose every decoded pixel equals the hand-computed fixed-point " +
      "bilinear blend of the four source taps, and the means match") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").limit(20)
    val rows = Multimodal.resizePngBilinear(Multimodal.pngPayloads(docs))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5),
        r.getAs[Array[Byte]](6)))
    assert(rows.nonEmpty)
    val nbs = docs.select(col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long"))
      .as[(Long, Long)].collect().toMap
    def src(id: Long, sx: Int, sy: Int): Int =
      ((id * 2654435761L + sx * 31 + sy * 7) & 0xffffff).toInt
    rows.foreach { case (id, ow, oh, mr, mg, mb, png) =>
      assert((ow, oh) == (8, 8))
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == 8 && img.getHeight == 8, s"doc $id dims")
      val nb = nbs(id)
      val w = (1 + nb % 16).toInt; val h = (1 + (nb * 7) % 16).toInt
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        // hand-compute the fixed-point blend (align-corners, 8-bit
        // fractional weights, floor rounding)
        val fx = x * (w - 1) * 256 / 7; val fy = y * (h - 1) * 256 / 7
        val ix = fx >> 8; val dx = fx & 255
        val ix1 = math.min(ix + 1, w - 1)
        val iy = fy >> 8; val dy = fy & 255
        val iy1 = math.min(iy + 1, h - 1)
        def ch(sh: Int): Int = {
          val c00 = (src(id, ix, iy) >> sh) & 255
          val c10 = (src(id, ix1, iy) >> sh) & 255
          val c01 = (src(id, ix, iy1) >> sh) & 255
          val c11 = (src(id, ix1, iy1) >> sh) & 255
          ((256 - dy) * ((256 - dx) * c00 + dx * c10) +
            dy * ((256 - dx) * c01 + dx * c11)) >> 16
        }
        val want = (ch(16) << 16) | (ch(8) << 8) | ch(0)
        assert((img.getRGB(x, y) & 0xffffff) == want, s"doc $id px($x,$y)")
        sr += ch(16); sg += ch(8); sb += ch(0)
      }
      assert((mr, mg, mb) == (sr / 64, sg / 64, sb / 64), s"doc $id means")
      // an interpolating kernel on a 1x1 source degenerates to the
      // constant pixel; larger sources actually blend (dx/dy nonzero
      // somewhere unless w == 8k+1 alignments make every tap exact)
      if (w == 1 && h == 1)
        assert((img.getRGB(3, 3) & 0xffffff) == src(id, 0, 0))
    }
  }

  test("patchesPng: engine-decoded 4x4 patch means equal a driver-side " +
      "recompute from the pixel formula; the grid is exactly " +
      "(w/4)x(h/4); means stay in [0,255]") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text")
    val out = Multimodal.patchesPng(Multimodal.pngPayloads(docs))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    out.foreach(r => Seq(r._4, r._5, r._6).foreach(m =>
      assert(m >= 0 && m <= 255, r)))
    val byDoc = out.groupBy(_._1)
    val nbs = docs.select(col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long"))
      .as[(Long, Long)].collect()
    nbs.foreach { case (id, nb) =>
      val w = (1 + nb % 16).toInt; val h = (1 + (nb * 7) % 16).toInt
      val expect = (w / 4) * (h / 4)
      val got = byDoc.getOrElse(id, Array.empty)
      assert(got.length == expect, s"doc $id grid")
      got.foreach { case (_, py, px, mr, mg, mb) =>
        var r = 0L; var g = 0L; var b = 0L
        for (dy <- 0 until 4; dx <- 0 until 4) {
          val v = ((id * 2654435761L + (4 * px + dx) * 31 +
            (4 * py + dy) * 7) & 0xffffff).toInt
          r += (v >> 16) & 255; g += (v >> 8) & 255; b += v & 255
        }
        assert((mr, mg, mb) == (r / 16, g / 16, b / 16),
          s"doc $id patch ($py,$px)")
      }
    }
  }

  test("phash: planted same-asset images (including the single-pixel " +
      "variants) pair within hamming 1; distinct assets never pair") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val fps = Multimodal.phashFingerprints(Multimodal.phashPayloads(docs))
      .as[(Long, Long)].collect().toMap
    // byte-identical planted images share the fingerprint exactly; the
    // perturbed variants differ by at most one bit
    val planted = fps.keys.filter(_ % 7 == 0).toSeq
    planted.groupBy(_ % 3).foreach { case (_, ids) =>
      val ref = fps(ids.head)
      ids.foreach { id =>
        assert(java.lang.Long.bitCount(fps(id) ^ ref) <= 2,
          s"asset member $id drifted")
      }
    }
    val pairs = Multimodal.phashPairs(docs)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // every same-asset pair must be found (hamming <= 1+1 <= 3) …
    val byAsset = planted.groupBy(_ % 3).values
    byAsset.foreach { ids =>
      val sorted = ids.sorted
      for (i <- sorted.indices; j <- i + 1 until sorted.length)
        assert(pairs.contains((sorted(i), sorted(j))),
          s"missed planted pair ${sorted(i)},${sorted(j)}")
    }
    // … and no pair straddles two assets
    for ((a, b) <- pairs if a % 7 == 0 && b % 7 == 0)
      assert(a % 3 == b % 3, s"cross-asset pair $a,$b")
  }
}
