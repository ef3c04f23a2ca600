package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Multimodal column handling (SURVEY §2.13 `multimodal_binary`).
  *
  * Design: media (image/audio/video) are opaque `BinaryType` columns with
  * a typed metadata struct alongside — the payload never enters
  * expressions, only the decode/feature stage touches it, via
  * `mapPartitions` so a real decoder (JNI/subprocess) would amortize init
  * per partition exactly like the uploader's per-partition clients.
  *
  * The decode itself is STUBBED (no image/audio libs in this container):
  * [[FakeDecoded]] fields are a deterministic function of the bytes, so
  * the plumbing — schema, batch shape, partition-level init, column
  * pruning — is real and testable, and swapping in a true decoder changes
  * only the body of [[decodeStub]].
  */
object Multimodal {

  // ImageIO's default stream factories are DISK-cached: every
  // createImageInput/OutputStream call creates (and holds) a temp cache
  // file, so a per-frame encode pass over a corpus exhausts file
  // descriptors long before it exhausts CPU (measured: the framed-video
  // op at sf0.1 took the whole JVM down with "Too many open files",
  // failing unrelated shuffles). Payloads here are KBs — memory-cached
  // streams are strictly better. Runs in the object initializer, so it
  // executes on every JVM (driver or executor) before first use.
  javax.imageio.ImageIO.setUseCache(false)

  /** Dispose per-partition codec handles when the partition's iterator
    * is exhausted (VERDICT r13 "What's missing" #5): ImageIO
    * readers/writers hold native buffers that task-end GC collects
    * EVENTUALLY, but a long-lived executor streaming many partitions
    * accumulates that pressure between collections — `dispose()` at
    * iterator completion releases it deterministically. Wraps the
    * already-mapped iterator, so the per-row body is untouched. */
  private def disposing[B](it: Iterator[B])(
      dispose: => Unit): Iterator[B] = new Iterator[B] {
    private var done = false
    def hasNext: Boolean = {
      val h = it.hasNext
      if (!h && !done) { done = true; dispose }
      h
    }
    def next(): B = it.next()
  }

  /** documents → (doc_id, content: binary, meta struct). The binary column
    * stands in for an image/audio payload. */
  def withBinaryContent(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("content"),
      struct(lit("text/plain").as("mime"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        col("lang")).as("meta"))

  final case class FakeDecoded(doc_id: Long, width: Int, height: Int,
      n_frames: Int, n_bytes: Long)

  /** Deterministic stand-in for an image decode: width/height/frames
    * derived from payload size. A real implementation would decode
    * `content` here (per-partition decoder init). */
  def decodeStub(bin: DataFrame): Dataset[FakeDecoded] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "decoder" init would go here
        it.map { case (id, bytes) =>
          val n = bytes.length.toLong
          FakeDecoded(id,
            width = (64 + n % 576).toInt,
            height = (64 + (n * 7) % 416).toInt,
            n_frames = (1 + id % 10).toInt,
            n_bytes = n)
        }
      }
  }

  /** Same fake-decode as pure Column expressions — the oracle-checkable
    * twin of [[decodeStub]] (equality asserted in MultimodalSpec). */
  def decodeStubExprs(bin: DataFrame): DataFrame =
    bin.select(col("doc_id"),
      (lit(64) + pmod(col("meta.n_bytes"), lit(576))).cast("int").as("width"),
      (lit(64) + pmod(col("meta.n_bytes") * 7, lit(416))).cast("int").as("height"),
      (lit(1) + pmod(col("doc_id"), lit(10))).cast("int").as("n_frames"),
      col("meta.n_bytes").as("n_bytes"))

  final case class FakeResized(doc_id: Long, out_w: Int, out_h: Int,
      thumb_hex: String)

  /** Deterministic stand-in for an image resize: output dims scale the
    * fake-decoded (width, height) to fit `maxDim`, the "thumbnail" is the
    * payload's first 64 bytes (a crop — slicing is the one transform an
    * opaque payload supports honestly without a codec). Real plumbing:
    * per-partition init point, payload stays out of shuffles, swapping a
    * true resampler changes only this body. */
  def resizeStub(bin: DataFrame, maxDim: Int = 64): Dataset[FakeResized] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = bytes.length.toLong
          val w = (64 + n % 576).toInt
          val h = (64 + (n * 7) % 416).toInt
          val outW = math.max(1, math.floor(w * (maxDim.toDouble / math.max(w, h))).toInt)
          val outH = math.max(1, math.floor(h * (maxDim.toDouble / math.max(w, h))).toInt)
          val thumb = bytes.take(64)
          FakeResized(id, outW, outH,
            thumb.map(b => f"${b & 0xff}%02X").mkString)
        }
      }
  }

  /** Column-expression twin of [[resizeStub]] (equality asserted in
    * MultimodalSpec; identical floor-then-cast rounding on both engines). */
  def resizeStubExprs(bin: DataFrame, maxDim: Int = 64): DataFrame = {
    val w = (lit(64) + pmod(col("meta.n_bytes"), lit(576))).cast("int")
    val h = (lit(64) + pmod(col("meta.n_bytes") * 7, lit(416))).cast("int")
    val scale = lit(maxDim.toDouble) / greatest(w, h).cast("double")
    bin.select(col("doc_id"),
      greatest(lit(1), floor(w * scale).cast("int")).as("out_w"),
      greatest(lit(1), floor(h * scale).cast("int")).as("out_h"),
      hex(substring(col("content"), 1, 64)).as("thumb_hex"))
  }

  /** REAL image decode (VERDICT r3 "What's missing" #3): the JDK ships a
    * PNG codec (`javax.imageio`), so the decode stage needs no external
    * libs. [[pngPayloads]] renders a deterministic tiny raster per doc
    * (dims are a pure function of the text's UTF-8 byte count — which is
    * what the DuckDB oracle predicts) and encodes it to real PNG bytes;
    * [[decodePngMeta]] decodes those bytes back with an ImageReader
    * initialized once per partition. If the codec, the byte plumbing, or
    * the partition batching were wrong, the decoded dims would diverge
    * from the oracle's formula and the hash gate would fail — so the
    * registered `multimodal_decode_png` key checks an actual
    * encode→bytes→decode round-trip, not a synthetic byte-parser. */
  def pngPayloads(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("nb"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        // ONE encoder per partition (ImageIO.write would walk the plugin
        // registry per row) — the amortized-init shape a native codec needs
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
        disposing(it.map { case (id, nb) =>
          val w = (1 + nb % 16).toInt
          val h = (1 + (nb * 7) % 16).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y, ((id * 2654435761L + x * 31 + y * 7) & 0xffffff).toInt)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          writer.setOutput(ios)
          writer.write(img)
          ios.close()
          (id, bos.toByteArray, nb)
        })(writer.dispose())
      }
      .toDF("doc_id", "content", "src_bytes")
  }

  /** Decode real PNG bytes: one ImageReader per partition (the amortized-
    * init point a JNI/native codec needs), fed each row's payload via an
    * in-memory stream. Output dims come from the DECODED image. */
  def decodePngMeta(bin: DataFrame): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("content"), col("src_bytes"))
      .as[(Long, Array[Byte], Long)]
      .mapPartitions { it =>
        val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
        disposing(it.map { case (id, bytes, nb) =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          reader.setInput(iis)
          // header-only dim read — the codec parses the real PNG structure
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          iis.close()
          (id, w, h, nb)
        })(reader.dispose())
      }
      .toDF("doc_id", "width", "height", "src_bytes")
  }

  /** REAL pixel transform: decode each PNG payload fully and 2×2
    * average-pool it — the thumbnail/downsample stage an image-training
    * pipeline runs after decode (the first level of any image pyramid).
    * [[decodePngMeta]] proved the codec parses HEADERS; this op proves
    * the engine moves PIXELS: per pooled cell the four RGB triples are
    * summed and floor-divided per channel (exact integer arithmetic),
    * and the emitted per-doc checksum Σ(r̄+ḡ+b̄) over pooled cells is an
    * exact BIGINT the DuckDB oracle re-derives from the pixel formula —
    * a single wrong pixel anywhere in decode or pooling shifts the sum
    * and fails the hash gate. Odd edges truncate (out dims = ⌊w/2⌋ ×
    * ⌊h/2⌋); 1-wide/1-tall images pool to zero cells and checksum 0.
    *
    * Scale shape: map-only over the payload column — one reader init
    * per partition, O(w·h) integer work per image, nothing shuffles but
    * the (doc_id, dims, checksum) summary row. */
  def poolPngAvg(bin: DataFrame): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
        disposing(it.map { case (id, bytes) =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          reader.setInput(iis)
          val img = reader.read(0)
          iis.close()
          val pw = img.getWidth / 2
          val ph = img.getHeight / 2
          var sum = 0L
          var py = 0
          while (py < ph) {
            var px = 0
            while (px < pw) {
              var r = 0; var g = 0; var b = 0
              var dy = 0
              while (dy < 2) {
                var dx = 0
                while (dx < 2) {
                  val v = img.getRGB(2 * px + dx, 2 * py + dy)
                  r += (v >> 16) & 255; g += (v >> 8) & 255; b += v & 255
                  dx += 1
                }
                dy += 1
              }
              sum += r / 4 + g / 4 + b / 4
              px += 1
            }
            py += 1
          }
          (id, pw, ph, sum)
        })(reader.dispose())
      }
      .toDF("doc_id", "out_w", "out_h", "checksum")
  }

  /** REAL image RESIZE (VERDICT r11 "Next round" #4 — the last stubbed
    * multimodal stage made real): decode each PNG payload, rescale it
    * to a fixed `outW`×`outH` raster through a new `BufferedImage`
    * (NEAREST-NEIGHBOR sampling: output pixel (x, y) reads source
    * pixel (⌊x·w/outW⌋, ⌊y·h/outH⌋) — chosen over Graphics2D's
    * filtered resamplers because its pixel function is EXACTLY
    * specifiable, which is what upgrades this key from rows-only to
    * hash-gated: the DuckDB oracle re-derives every sampled pixel from
    * the generation formula while the Spark side reads it from DECODED
    * bytes; swapping in a bilinear kernel changes only the inner
    * loop), re-encode the resized raster to real PNG bytes, and emit
    * the decoded-output per-channel integer means. One reader + one
    * writer per partition; map-only — nothing shuffles but the
    * summary row.
    *
    * The gate binds end-to-end: a wrong decode, a wrong sample
    * coordinate, or a wrong re-encode (MultimodalSpec decodes an
    * output PNG back and checks dims and a known pixel) all shift the
    * means and fail the hash. */
  def resizePng(bin: DataFrame, outW: Int = 8, outH: Int = 8): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
        disposing(it.map { case (id, bytes) =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          reader.setInput(iis)
          val img = reader.read(0)
          iis.close()
          val w = img.getWidth
          val h = img.getHeight
          val out = new java.awt.image.BufferedImage(
            outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < outH) {
            var x = 0
            while (x < outW) {
              out.setRGB(x, y, img.getRGB(x * w / outW, y * h / outH))
              x += 1
            }
            y += 1
          }
          // means from the OUTPUT raster — the thing downstream consumes
          var sr = 0L; var sg = 0L; var sb = 0L
          y = 0
          while (y < outH) {
            var x = 0
            while (x < outW) {
              val v = out.getRGB(x, y)
              sr += (v >> 16) & 255; sg += (v >> 8) & 255; sb += v & 255
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          writer.setOutput(ios)
          writer.write(out)
          ios.close()
          val n = outW.toLong * outH
          (id, outW, outH, sr / n, sg / n, sb / n, bos.toByteArray)
        })({ reader.dispose(); writer.dispose() })
      }
      .toDF("doc_id", "out_w", "out_h", "mean_r", "mean_g", "mean_b",
        "content")
  }

  /** BILINEAR image resize (VERDICT r12 "Next round" #4 — the kernel
    * production image prep defaults to, beside [[resizePng]]'s
    * nearest-neighbor): INTEGER FIXED-POINT weights with 8 fractional
    * bits, so every output pixel is an exact integer function of the
    * source pixels and the DuckDB oracle re-derives it from the
    * generation formula — the same hash-gate technique as the NN key,
    * extended to an interpolating kernel.
    *
    * Mapping (align-corners): output x ∈ [0, outW) reads source
    * coordinate fx₂₅₆ = ⌊x·(w−1)·256 / (outW−1)⌋ (0 when outW = 1);
    * ix = fx₂₅₆ ≫ 8, dx = fx₂₅₆ mod 256, ix₁ = min(ix+1, w−1); same
    * for y. Per channel:
    *   out = ( (256−dy)·((256−dx)·p(ix,iy) + dx·p(ix₁,iy))
    *         +      dy ·((256−dx)·p(ix,iy₁) + dx·p(ix₁,iy₁)) ) ≫ 16
    * — all integer, floor rounding, max intermediate 255·256·256 < 2²⁴.
    * Same map-only shape as [[resizePng]]: one codec pair per
    * partition, re-encode to real PNG bytes, decoded-output channel
    * means; MultimodalSpec decodes an output PNG back and checks dims
    * plus a hand-computed interpolated pixel. */
  def resizePngBilinear(bin: DataFrame, outW: Int = 8,
      outH: Int = 8): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
        disposing(it.map { case (id, bytes) =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          reader.setInput(iis)
          val img = reader.read(0)
          iis.close()
          val w = img.getWidth
          val h = img.getHeight
          val out = new java.awt.image.BufferedImage(
            outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < outH) {
            val fy = if (outH > 1) y * (h - 1) * 256 / (outH - 1) else 0
            val iy = fy >> 8
            val dy = fy & 255
            val iy1 = math.min(iy + 1, h - 1)
            var x = 0
            while (x < outW) {
              val fx = if (outW > 1) x * (w - 1) * 256 / (outW - 1) else 0
              val ix = fx >> 8
              val dx = fx & 255
              val ix1 = math.min(ix + 1, w - 1)
              val v00 = img.getRGB(ix, iy); val v10 = img.getRGB(ix1, iy)
              val v01 = img.getRGB(ix, iy1); val v11 = img.getRGB(ix1, iy1)
              def ch(sh: Int): Int = {
                val c00 = (v00 >> sh) & 255; val c10 = (v10 >> sh) & 255
                val c01 = (v01 >> sh) & 255; val c11 = (v11 >> sh) & 255
                ((256 - dy) * ((256 - dx) * c00 + dx * c10) +
                  dy * ((256 - dx) * c01 + dx * c11)) >> 16
              }
              out.setRGB(x, y, (ch(16) << 16) | (ch(8) << 8) | ch(0))
              x += 1
            }
            y += 1
          }
          // means from the OUTPUT raster — the thing downstream consumes
          var sr = 0L; var sg = 0L; var sb = 0L
          y = 0
          while (y < outH) {
            var x = 0
            while (x < outW) {
              val v = out.getRGB(x, y)
              sr += (v >> 16) & 255; sg += (v >> 8) & 255; sb += v & 255
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          writer.setOutput(ios)
          writer.write(out)
          ios.close()
          val n = outW.toLong * outH
          (id, outW, outH, sr / n, sg / n, sb / n, bos.toByteArray)
        })({ reader.dispose(); writer.dispose() })
      }
      .toDF("doc_id", "out_w", "out_h", "mean_r", "mean_g", "mean_b",
        "content")
  }

  /** ViT-style PATCH EXTRACTION — the preprocessing every vision
    * transformer runs between decode and embedding: the raster splits
    * into non-overlapping p×p patches (row-major grid, partial edges
    * truncated like [[poolPngAvg]]) and each patch emits its per-channel
    * integer mean — the crude "patch embedding" downstream projection
    * layers consume. One decoded row fans out to ≤ (w/p)·(h/p) small
    * rows; payloads never shuffle, the patch frame does. Exact integer
    * arithmetic (sum then floor-divide by p²) so the DuckDB oracle
    * re-derives every patch mean from the generation pixel formula
    * while the Spark side computes it from DECODED bytes — one wrong
    * pixel in any patch fails the hash gate. */
  def patchesPng(bin: DataFrame, p: Int = 4): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
        disposing(it.flatMap { case (id, bytes) =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          reader.setInput(iis)
          val img = reader.read(0)
          iis.close()
          val pw = img.getWidth / p
          val ph = img.getHeight / p
          val n = (p * p).toLong
          for {
            py <- 0 until ph
            px <- 0 until pw
          } yield {
            var r = 0L; var g = 0L; var b = 0L
            var dy = 0
            while (dy < p) {
              var dx = 0
              while (dx < p) {
                val v = img.getRGB(p * px + dx, p * py + dy)
                r += (v >> 16) & 255; g += (v >> 8) & 255; b += v & 255
                dx += 1
              }
              dy += 1
            }
            (id, py.toLong, px.toLong, r / n, g / n, b / n)
          }
        })(reader.dispose())
      }
      .toDF("doc_id", "patch_row", "patch_col", "mean_r", "mean_g", "mean_b")
      .orderBy("doc_id", "patch_row", "patch_col")
  }

  /** Deterministic PNG payloads for the PERCEPTUAL dedup key: every 7th
    * doc renders one of 3 shared base images (13×11, pixels a pure
    * function of the asset id and position), half of them with a single
    * pixel perturbed (one bit-3 flip per channel at (0,0)) so the
    * planted duplicates are NEAR-identical, not byte-identical — byte
    * dedup misses them, perceptual dedup must not. All other docs render
    * unique images whose pixels mix doc_id into every position. The
    * pixel formulas are integer arithmetic both engines reproduce, which
    * is what upgrades this key from rows-only to hash-gated: the oracle
    * re-derives the pixels, the Spark side DECODES them. */
  def phashPayloads(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("nb"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
        disposing(it.map { case (id, nb) =>
          val planted = id % 7 == 0
          val w = if (planted) 13 else (1 + nb % 16).toInt
          val h = if (planted) 11 else (1 + (nb * 7) % 16).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var rgb =
                if (planted)
                  ((id % 3 + 1) * 7919L * (x + 1) * (y + 3) + x * 31 + y * 7) & 0xffffff
                else
                  ((id % 65536 + 1) * 2654435761L * (x + 1) * (y + 3) + x * 31 + y * 7) & 0xffffff
              if (planted && (id / 7) % 2 == 1 && x == 0 && y == 0)
                rgb ^= 0x080808L
              img.setRGB(x, y, rgb.toInt)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          writer.setOutput(ios)
          writer.write(img)
          ios.close()
          (id, bos.toByteArray)
        })(writer.dispose())
      }
      .toDF("doc_id", "content")
  }

  /** 30-bit average-hash (aHash) from REAL decoded pixels: decode the
    * PNG (one reader per partition), nearest-neighbor-sample a 6×5
    * grid, sum RGB per sample, threshold each sample against the image
    * mean (30·s > Σs — integer-exact), pack the bits. The classic
    * perceptual fingerprint: robust to single-pixel noise, discriminative
    * across distinct content. 30 bits so the fingerprint and its block
    * arithmetic stay comfortably inside BIGINT on both engines — the
    * same geometry as the gated SimHash family. */
  def phashFingerprints(bin: DataFrame): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
        disposing(it.map { case (id, bytes) =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          reader.setInput(iis)
          val img = reader.read(0)
          iis.close()
          val w = img.getWidth
          val h = img.getHeight
          val s = new Array[Long](30)
          var tot = 0L
          var gy = 0
          while (gy < 5) {
            var gx = 0
            while (gx < 6) {
              val rgb = img.getRGB(gx * w / 6, gy * h / 5) & 0xffffff
              val v = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              s(gy * 6 + gx) = v.toLong
              tot += v
              gx += 1
            }
            gy += 1
          }
          var fp = 0L
          var k = 0
          while (k < 30) {
            if (30L * s(k) > tot) fp |= 1L << k
            k += 1
          }
          (id, fp)
        })(reader.dispose())
      }
      .toDF("doc_id", "simhash")
  }

  /** Perceptual near-dup image pairs: real decode → aHash → the SAME
    * Manku bit-block candidate routing every hamming join here uses
    * ([[Dedup.simhashPairsFrom]]) — planted near-identical assets land
    * within hamming 1, distinct images scatter. */
  def phashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    Dedup.simhashPairsFrom(phashFingerprints(phashPayloads(docs)),
      maxHamming, bits = 30)

  /** Resolve the WAVE `AudioFileWriter` ONCE per partition:
    * `AudioSystem.write` walks a synchronized provider registry on
    * EVERY call, and at sf1 the audio keys measured 5× SLOWER on 32
    * threads than on one — a classic lock convoy (SCALE_r14 §6: 22.7 s
    * at local[32] vs 4.4 s at local[1] on the identical corpus). The
    * SPI resolution is the per-partition init, exactly like the
    * ImageIO readers. */
  private def waveWriter(): javax.sound.sampled.spi.AudioFileWriter = {
    val it = java.util.ServiceLoader.load(
      classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    while (it.hasNext) {
      val w = it.next()
      if (w.isFileTypeSupported(
        javax.sound.sampled.AudioFileFormat.Type.WAVE)) return w
    }
    throw new IllegalStateException("no WAVE AudioFileWriter in this JVM")
  }

  /** The matching read-side resolution (AudioSystem.getAudioInputStream
    * probes every provider per call — the same convoy): the first
    * provider that parses `probe`, AudioSystem's own selection rule,
    * cached by the caller for the partition. */
  private def waveReaderFor(
      probe: Array[Byte]): javax.sound.sampled.spi.AudioFileReader = {
    val it = java.util.ServiceLoader.load(
      classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    while (it.hasNext) {
      val r = it.next()
      try {
        r.getAudioInputStream(
          new java.io.ByteArrayInputStream(probe)).close()
        return r
      } catch { case _: Exception => }
    }
    throw new IllegalStateException(
      "no AudioFileReader in this JVM parses the WAV payload")
  }

  /** Real WAV payloads: deterministic 16-bit mono PCM (8 kHz) sawtooth
    * samples s_i = ((i·13 + doc_id·31) mod 2048) − 1024, containerized
    * through javax.sound.sampled's actual WAVE writer — like
    * [[pngPayloads]], the registered keys check a REAL encode→bytes→
    * decode round-trip through a production codec path, and the sample
    * formula is integer arithmetic the oracle replays exactly. One
    * AudioFormat per partition; payload sized by the doc's UTF-8 byte
    * count (n = 800 + nb mod 800 samples ≈ 0.1–0.2 s). */
  def wavPayloads(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("nb"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val writer = waveWriter()
        it.map { case (id, nb) =>
          val n = (800 + nb % 800).toInt
          val raw = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val v = (((i * 13L + id * 31L) % 2048L) - 1024L).toShort
            raw(2 * i) = (v & 0xff).toByte
            raw(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          writer.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (id, bos.toByteArray)
        }
      }.toDF("doc_id", "content")
  }

  /** Decode real WAV bytes — format header + frame count from the ACTUAL
    * AudioSystem parse (one decode per row, format objects per
    * partition), not from the generator's parameters. */
  def decodeWavMeta(bin: DataFrame): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        var rdr: javax.sound.sampled.spi.AudioFileReader = null
        it.map { case (id, bytes) =>
          if (rdr == null) rdr = waveReaderFor(bytes)
          val ais = rdr.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val f = ais.getFormat
          (id, f.getSampleRate.toInt, f.getChannels, f.getSampleSizeInBits,
            ais.getFrameLength)
        }
      }.toDF("doc_id", "sample_rate", "channels", "bits", "n_samples")
  }

  /** Per-clip energy from the DECODED samples: sum of squares is exact
    * BIGINT (so it hash-gates with no float-order risk); RMS is a
    * single sqrt of an exact integer ratio — deterministic on both
    * engines. The audio analogue of text_stats. */
  def audioEnergy(bin: DataFrame): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        var rdr: javax.sound.sampled.spi.AudioFileReader = null
        it.map { case (id, bytes) =>
          if (rdr == null) rdr = waveReaderFor(bytes)
          val ais = rdr.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val data = ais.readAllBytes()
          val n = data.length / 2
          var sumSq = 0L
          var peak = 0L
          var i = 0
          while (i < n) {
            val v = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toLong
            sumSq += v * v
            val a = math.abs(v)
            if (a > peak) peak = a
            i += 1
          }
          (id, n.toLong, sumSq, peak)
        }
      }.toDF("doc_id", "n_samples", "sum_sq", "peak")
      .withColumn("rms",
        round(sqrt(col("sum_sq").cast("double") / col("n_samples")), 4))
  }

  /** Channel histograms over DECODED pixels — the image
    * feature-extraction primitive (color statistics feed dedup,
    * quality, and domain classifiers): each RGB channel bucketed into
    * quartiles (value >> 6 → 4 buckets), 12 exact integer counts per
    * image the oracle re-derives from the planted pixel formula. Like
    * [[poolPngAvg]] this proves pixel MOVEMENT, not just header parse;
    * map-only with one reader per partition, 12-column summary row
    * out. */
  def channelHistogram(bin: DataFrame): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
        disposing(it.map { case (id, bytes) =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          reader.setInput(iis)
          val img = reader.read(0)
          iis.close()
          val c = new Array[Long](12)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val v = img.getRGB(x, y)
              c(((v >> 16) & 255) >> 6) += 1
              c(4 + (((v >> 8) & 255) >> 6)) += 1
              c(8 + ((v & 255) >> 6)) += 1
              x += 1
            }
            y += 1
          }
          (id, c(0), c(1), c(2), c(3), c(4), c(5), c(6), c(7), c(8), c(9),
            c(10), c(11))
        })(reader.dispose())
      }
      .toDF("doc_id", "r0", "r1", "r2", "r3", "g0", "g1", "g2", "g3",
        "b0", "b1", "b2", "b3")
  }

  /** Real audio DSP: decode the WAV payload and DECIMATE by 2
    * (8 kHz → 4 kHz, drop every other sample — the rate-normalization
    * pass an audio-training pipeline runs before featurization; proper
    * resampling adds an anti-alias filter, which for the synthetic
    * sawtooth would only blur the exactness this gate exists to prove).
    * Emits the decimated sample count and the EXACT integer energy
    * Σ v(2j)² of the kept samples, which the oracle re-derives from the
    * generator formula — a single mis-indexed or sign-flipped sample
    * anywhere in decode or decimation shifts the sum. Map-only; one
    * decode per row, summary row out. */
  def audioDownsample(bin: DataFrame): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        var rdr: javax.sound.sampled.spi.AudioFileReader = null
        it.map { case (id, bytes) =>
          if (rdr == null) rdr = waveReaderFor(bytes)
          val ais = rdr.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val data = ais.readAllBytes()
          val n = data.length / 2
          var energy = 0L
          var nOut = 0L
          var j = 0
          while (2 * j < n) {
            val i = 2 * j
            val v = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toLong
            energy += v * v
            nOut += 1
            j += 1
          }
          (id, nOut, energy)
        }
      }.toDF("doc_id", "n_out", "energy")
  }

  /** Real VIDEO stand-in: a length-prefixed container of K REAL PNG
    * frames (4-byte big-endian frame count, then [4-byte length][PNG
    * bytes] per frame) — the JVM has no video codec, but a video IS a
    * framed container of encoded images, and this keeps every hard part
    * real: container parsing, per-frame codec decode (ImageIO), one
    * encoder/reader per partition, frame fan-out to rows. K = 1 + id%4;
    * frame k of a doc with nb text bytes is (1 + (nb+k)%16) ×
    * (1 + ((nb+k)*7)%16) — integer formulas the oracle replays. */
  def videoPayloads(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("nb"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
        disposing(it.map { case (id, nb) =>
          val k = (1 + id % 4).toInt
          val bos = new java.io.ByteArrayOutputStream()
          val dos = new java.io.DataOutputStream(bos)
          dos.writeInt(k)
          var f = 0
          while (f < k) {
            val w = (1 + (nb + f) % 16).toInt
            val h = (1 + ((nb + f) * 7) % 16).toInt
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                img.setRGB(x, y,
                  ((id * 2654435761L + f * 97 + x * 31 + y * 7) & 0xffffff).toInt)
                x += 1
              }
              y += 1
            }
            val fb = new java.io.ByteArrayOutputStream()
            val ios = javax.imageio.ImageIO.createImageOutputStream(fb)
            writer.setOutput(ios)
            writer.write(img)
            ios.close()
            val bytes = fb.toByteArray
            dos.writeInt(bytes.length)
            dos.write(bytes)
            f += 1
          }
          (id, bos.toByteArray)
        })(writer.dispose())
      }.toDF("doc_id", "content")
  }

  /** Parse the container and REALLY decode every frame: one ImageReader
    * per partition; one output row per frame with the DECODED dims. */
  def decodeVideoFrames(bin: DataFrame): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
        disposing(it.flatMap { case (id, bytes) =>
          val dis = new java.io.DataInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val k = dis.readInt()
          (0 until k).map { f =>
            val len = dis.readInt()
            val fb = new Array[Byte](len)
            dis.readFully(fb)
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(fb))
            reader.setInput(iis)
            val w = reader.getWidth(0)
            val h = reader.getHeight(0)
            (id, f.toLong, w, h, len.toLong)
          }
        })(reader.dispose())
      }.toDF("doc_id", "frame_no", "width", "height", "frame_bytes")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary payload + typed metadata: byte counts differ from char counts
    // on non-ASCII (zh) docs — that difference is the point.
    "multimodal_meta" -> ((s, d) =>
      withBinaryContent(Tables.documents(s, d))
        .select(col("doc_id"), col("meta.mime").as("mime"),
          col("meta.n_bytes").as("n_bytes"), col("meta.lang").as("lang"),
          length(col("content")).cast("long").as("content_len"))
        .orderBy("doc_id")),
    // expression twin of the mapPartitions decode (decode itself is
    // rows-only-checked via MultimodalSpec equality).
    "multimodal_decode_meta" -> ((s, d) =>
      decodeStubExprs(withBinaryContent(Tables.documents(s, d)))
        .orderBy("doc_id")),
    // frame sampling: treat the payload as fixed-size frames (200 B) and
    // keep every 3rd — composes the byte-true segmenter with a map-side
    // filter; no shuffle, scales like segment_file_bytes.
    "multimodal_frame_sample" -> ((s, d) => {
      val bin = withBinaryContent(
        Tables.documents(s, d).filter(length(col("text")) > 0))
        .withColumn("path", concat(lit("doc_"), col("doc_id"), lit(".bin")))
      Segments.segmentBytes(bin, col("doc_id"), col("path"),
          col("content"), 200)
        .filter(col("seg_no") % 3 === 0)
        .select(col("doc_id"), col("seg_no").as("frame_no"),
          hex(col("seg_bytes")).as("frame_hex"),
          col("seg_len").as("frame_len"))
        .orderBy("doc_id", "frame_no")
    }),
    // REAL codec round-trip: render deterministic PNGs with javax.imageio,
    // decode them back, report the DECODED dims — hash-gated because the
    // dims are a pure function of the text byte count the oracle predicts.
    "multimodal_decode_png" -> ((s, d) =>
      decodePngMeta(pngPayloads(Tables.documents(s, d)))
        .orderBy("doc_id")),
    // REAL pixel pooling: full decode -> 2x2 integer average-pool ->
    // exact checksum the oracle re-derives from the pixel formula.
    "multimodal_pool_avg" -> ((s, d) =>
      poolPngAvg(pngPayloads(Tables.documents(s, d)))
        .orderBy("doc_id")),
    // ViT patch extraction: decode -> 4x4 patch grid -> per-channel
    // integer patch means (the patch-embedding prep).
    "multimodal_image_patches" -> ((s, d) =>
      patchesPng(pngPayloads(Tables.documents(s, d)))),
    // resize stage (expression twin; mapPartitions form equality-tested).
    "multimodal_resize_meta" -> ((s, d) =>
      resizeStubExprs(withBinaryContent(
          Tables.documents(s, d).filter(length(col("text")) > 0)))
        .orderBy("doc_id"))
,
    // REAL resize: decode -> nearest-neighbor rescale through a fresh
    // BufferedImage -> re-encode -> decoded-output channel means; the
    // oracle re-derives every sampled pixel from the generation formula.
    "multimodal_resize_real" -> ((s, d) =>
      resizePng(pngPayloads(Tables.documents(s, d)))
        .select(col("doc_id"), col("out_w"), col("out_h"),
          col("mean_r"), col("mean_g"), col("mean_b"))
        .orderBy("doc_id")),
    // BILINEAR resize (r13): integer fixed-point 8-bit-fraction
    // weights — the oracle re-derives every interpolated output pixel
    // exactly from the generation formula; the Spark side interpolates
    // DECODED bytes and means the re-encoded OUTPUT raster.
    "multimodal_resize_bilinear" -> ((s, d) =>
      resizePngBilinear(pngPayloads(Tables.documents(s, d)))
        .select(col("doc_id"), col("out_w"), col("out_h"),
          col("mean_r"), col("mean_g"), col("mean_b"))
        .orderBy("doc_id")),
    // exact binary-asset dedup: digest groupBy over the PAYLOAD bytes —
    // the first pass of any image/audio dedup (only the (digest, min-id,
    // count) triple shuffles; payloads stay put). The corpus' payloads
    // are unique per doc, so shared assets are PLANTED deterministically
    // (every 7th doc carries one of 3 shared blobs — same technique as
    // the PII enrichment), which both engines reproduce from doc_id.
    "multimodal_dedup_exact" -> ((s, d) => {
      val payloadStr = when(pmod(col("doc_id"), lit(7)) === 0,
        concat(lit("SHARED-ASSET-"), pmod(col("doc_id"), lit(3)).cast("string")))
        .otherwise(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), encode(payloadStr, "UTF-8").as("content"))
        .groupBy(md5(col("content")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"),
          count(lit(1)).as("n_copies"))
        .select("doc_id", "h", "n_copies")
        .orderBy("doc_id")
    }),
    // perceptual near-dup image dedup: render → REAL decode → aHash →
    // block-routed hamming pairs; the planted single-pixel variants are
    // invisible to byte dedup and land at hamming <= 1 here.
    "multimodal_dedup_phash" -> ((s, d) =>
      phashPairs(Tables.documents(s, d))),
    // REAL audio round-trip: WAVE-containerized PCM rendered and parsed
    // back through javax.sound — header fields + frame count from the
    // actual decode, predicted by the oracle from the byte count.
    "multimodal_audio_meta" -> ((s, d) =>
      decodeWavMeta(wavPayloads(Tables.documents(s, d)))
        .orderBy("doc_id")),
    // energy over DECODED samples: exact integer sum of squares + peak,
    // RMS as one sqrt of an exact ratio.
    "multimodal_audio_energy" -> ((s, d) =>
      audioEnergy(wavPayloads(Tables.documents(s, d)))
        .select(col("doc_id"), col("n_samples"), col("sum_sq"),
          col("peak"), col("rms"))
        .orderBy("doc_id")),
    // per-channel quartile histograms over DECODED pixels.
    "multimodal_channel_hist" -> ((s, d) =>
      channelHistogram(pngPayloads(Tables.documents(s, d)))
        .orderBy("doc_id")),
    // decimate-by-2 over DECODED samples: exact integer energy of the
    // kept samples, formula-gated like the energy key.
    "multimodal_audio_downsample" -> ((s, d) =>
      audioDownsample(wavPayloads(Tables.documents(s, d)))
        .orderBy("doc_id")),
    // REAL framed-video round-trip: container parse + per-frame PNG
    // decode, one row per frame with the DECODED dims (frame fan-out).
    "multimodal_video_meta" -> ((s, d) =>
      decodeVideoFrames(videoPayloads(Tables.documents(s, d)))
        .select(col("doc_id"), col("frame_no"), col("width"), col("height"))
        .orderBy("doc_id", "frame_no"))
  )

  def oracle: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id, 'text/plain' AS mime,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, lang,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS content_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_decode_meta" ->
      """SELECT doc_id,
        |       CAST(64 + octet_length(encode(text)) % 576 AS INT) AS width,
        |       CAST(64 + (octet_length(encode(text)) * 7) % 416 AS INT) AS height,
        |       CAST(1 + doc_id % 10 AS INT) AS n_frames,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_frame_sample" ->
      """WITH d AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS nb
        |  FROM documents WHERE length(text) > 0),
        |seg AS (
        |  SELECT doc_id, hx,
        |         unnest(range(0, CAST(ceil(nb / 200.0) AS BIGINT))) AS seg
        |  FROM d)
        |SELECT doc_id,
        |       CAST(seg AS BIGINT) AS frame_no,
        |       substr(hx, CAST(seg * 400 + 1 AS BIGINT), 400) AS frame_hex,
        |       CAST(length(substr(hx, CAST(seg * 400 + 1 AS BIGINT), 400)) / 2 AS BIGINT) AS frame_len
        |FROM seg WHERE seg % 3 = 0 ORDER BY doc_id, frame_no""".stripMargin,
    // Predicts the decoded dims from the byte count the raster was sized
    // by — a wrong codec/plumbing step on the Spark side breaks the hash.
    "multimodal_decode_png" ->
      """SELECT doc_id,
        |       CAST(1 + octet_length(encode(text)) % 16 AS INT) AS width,
        |       CAST(1 + (octet_length(encode(text)) * 7) % 16 AS INT) AS height,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS src_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    // re-derives every pooled cell from the planted pixel formula
    // v(x,y) = (doc_id*2654435761 + 31x + 7y) & 0xffffff: per-channel
    // 4-pixel sums floor-divided by 4, summed per cell, summed per doc.
    // 1-wide/1-tall images have no cells -> checksum 0 via the left join.
    "multimodal_pool_avg" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |         CAST(1 + octet_length(encode(text)) % 16 AS BIGINT) AS w,
        |         CAST(1 + (octet_length(encode(text)) * 7) % 16 AS BIGINT) AS h
        |  FROM documents),
        |cells AS (
        |  SELECT d.doc_id, d.w, d.h, px.px, py.py
        |  FROM dims d
        |  JOIN (SELECT unnest(range(0, 8)) AS px) px ON px.px < d.w // 2
        |  JOIN (SELECT unnest(range(0, 8)) AS py) py ON py.py < d.h // 2),
        |pix AS (
        |  SELECT doc_id, px, py,
        |         ((doc_id * 2654435761 + (2*px + dx.dx) * 31
        |           + (2*py + dy.dy) * 7) & 16777215) AS v
        |  FROM cells
        |  CROSS JOIN (SELECT unnest(range(0, 2)) AS dx) dx
        |  CROSS JOIN (SELECT unnest(range(0, 2)) AS dy) dy),
        |pool AS (
        |  SELECT doc_id, px, py,
        |         (sum((v >> 16) & 255) // 4) + (sum((v >> 8) & 255) // 4)
        |           + (sum(v & 255) // 4) AS cell
        |  FROM pix GROUP BY doc_id, px, py),
        |sums AS (SELECT doc_id, sum(cell) AS checksum FROM pool GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.w // 2 AS INT) AS out_w,
        |       CAST(d.h // 2 AS INT) AS out_h,
        |       CAST(COALESCE(s.checksum, 0) AS BIGINT) AS checksum
        |FROM dims d LEFT JOIN sums s USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // same pixel formula, 4x4 patch grid, integer floor means — the
    // Spark side computes them from DECODED bytes.
    "multimodal_image_patches" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |         CAST(1 + octet_length(encode(text)) % 16 AS BIGINT) AS w,
        |         CAST(1 + (octet_length(encode(text)) * 7) % 16 AS BIGINT) AS h
        |  FROM documents),
        |cells AS (
        |  SELECT d.doc_id, px.px, py.py
        |  FROM dims d
        |  JOIN (SELECT unnest(range(0, 4)) AS px) px ON px.px < d.w // 4
        |  JOIN (SELECT unnest(range(0, 4)) AS py) py ON py.py < d.h // 4),
        |pix AS (
        |  SELECT doc_id, px, py,
        |         ((doc_id * 2654435761 + (4*px + dx.dx) * 31
        |           + (4*py + dy.dy) * 7) & 16777215) AS v
        |  FROM cells
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS dx) dx
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS dy) dy)
        |SELECT doc_id, CAST(py AS BIGINT) AS patch_row,
        |       CAST(px AS BIGINT) AS patch_col,
        |       CAST(sum((v >> 16) & 255) // 16 AS BIGINT) AS mean_r,
        |       CAST(sum((v >> 8) & 255) // 16 AS BIGINT) AS mean_g,
        |       CAST(sum(v & 255) // 16 AS BIGINT) AS mean_b
        |FROM pix GROUP BY doc_id, px, py
        |ORDER BY doc_id, patch_row, patch_col""".stripMargin,
    // nearest-neighbor sample grid: output (x, y) reads source
    // (x*w // 8, y*h // 8); pixels from the generation formula
    // v = (doc_id*2654435761 + 31·sx + 7·sy) & 0xffffff — the Spark
    // side reads them from DECODED bytes and means the re-encoded
    // OUTPUT raster, so every stage of decode→rescale→encode gates.
    "multimodal_resize_real" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |         CAST(1 + octet_length(encode(text)) % 16 AS BIGINT) AS w,
        |         CAST(1 + (octet_length(encode(text)) * 7) % 16 AS BIGINT) AS h
        |  FROM documents),
        |pix AS (
        |  SELECT doc_id,
        |         ((doc_id * 2654435761 + ((x.x * w) // 8) * 31
        |           + ((y.y * h) // 8) * 7) & 16777215) AS v
        |  FROM dims
        |  CROSS JOIN (SELECT unnest(range(0, 8)) AS x) x
        |  CROSS JOIN (SELECT unnest(range(0, 8)) AS y) y)
        |SELECT doc_id, CAST(8 AS INT) AS out_w, CAST(8 AS INT) AS out_h,
        |       CAST(sum((v >> 16) & 255) // 64 AS BIGINT) AS mean_r,
        |       CAST(sum((v >> 8) & 255) // 64 AS BIGINT) AS mean_g,
        |       CAST(sum(v & 255) // 64 AS BIGINT) AS mean_b
        |FROM pix GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // bilinear fixed-point sample grid (align-corners, 8 fractional
    // bits): fx = x*(w-1)*256 // 7 over the 8-wide output; the four
    // taps come from the generation formula and the integer blend is
    // the exact kernel the Spark side runs on DECODED pixels.
    "multimodal_resize_bilinear" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |         CAST(1 + octet_length(encode(text)) % 16 AS BIGINT) AS w,
        |         CAST(1 + (octet_length(encode(text)) * 7) % 16 AS BIGINT) AS h
        |  FROM documents),
        |grid AS (
        |  SELECT doc_id, w, h,
        |         (x.x * (w - 1) * 256) // 7 AS fx,
        |         (y.y * (h - 1) * 256) // 7 AS fy
        |  FROM dims
        |  CROSS JOIN (SELECT unnest(range(0, 8)) AS x) x
        |  CROSS JOIN (SELECT unnest(range(0, 8)) AS y) y),
        |coords AS (
        |  SELECT doc_id, fx % 256 AS dx, fy % 256 AS dy,
        |         fx // 256 AS ix, least(fx // 256 + 1, w - 1) AS ix1,
        |         fy // 256 AS iy, least(fy // 256 + 1, h - 1) AS iy1
        |  FROM grid),
        |smp AS (
        |  SELECT doc_id, dx, dy,
        |         ((doc_id * 2654435761 + ix * 31 + iy * 7) & 16777215) AS v00,
        |         ((doc_id * 2654435761 + ix1 * 31 + iy * 7) & 16777215) AS v10,
        |         ((doc_id * 2654435761 + ix * 31 + iy1 * 7) & 16777215) AS v01,
        |         ((doc_id * 2654435761 + ix1 * 31 + iy1 * 7) & 16777215) AS v11
        |  FROM coords),
        |bl AS (
        |  SELECT doc_id,
        |         ((256 - dy) * ((256 - dx) * ((v00 >> 16) & 255) + dx * ((v10 >> 16) & 255))
        |          + dy * ((256 - dx) * ((v01 >> 16) & 255) + dx * ((v11 >> 16) & 255))) >> 16 AS r,
        |         ((256 - dy) * ((256 - dx) * ((v00 >> 8) & 255) + dx * ((v10 >> 8) & 255))
        |          + dy * ((256 - dx) * ((v01 >> 8) & 255) + dx * ((v11 >> 8) & 255))) >> 16 AS g,
        |         ((256 - dy) * ((256 - dx) * (v00 & 255) + dx * (v10 & 255))
        |          + dy * ((256 - dx) * (v01 & 255) + dx * (v11 & 255))) >> 16 AS b
        |  FROM smp)
        |SELECT doc_id, CAST(8 AS INT) AS out_w, CAST(8 AS INT) AS out_h,
        |       CAST(sum(r) // 64 AS BIGINT) AS mean_r,
        |       CAST(sum(g) // 64 AS BIGINT) AS mean_g,
        |       CAST(sum(b) // 64 AS BIGINT) AS mean_b
        |FROM bl GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "multimodal_resize_meta" ->
      """WITH m AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |         CAST(64 + octet_length(encode(text)) % 576 AS INT) AS w,
        |         CAST(64 + (octet_length(encode(text)) * 7) % 416 AS INT) AS h
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id,
        |       greatest(1, CAST(floor(w * (64.0 / greatest(w, h))) AS INT)) AS out_w,
        |       greatest(1, CAST(floor(h * (64.0 / greatest(w, h))) AS INT)) AS out_h,
        |       substr(hx, 1, 128) AS thumb_hex
        |FROM m ORDER BY doc_id""".stripMargin,
    // md5 over the same UTF-8 bytes Spark's encode() hashes.
    "multimodal_dedup_exact" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 7 = 0
        |              THEN 'SHARED-ASSET-' || CAST(doc_id % 3 AS VARCHAR)
        |              ELSE text END AS payload
        |  FROM documents)
        |SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, md5(payload) AS h,
        |       count(*) AS n_copies
        |FROM p GROUP BY md5(payload) ORDER BY doc_id""".stripMargin,
    // Re-derives the pixels from the generation formulas (the Spark side
    // DECODES them from real PNG bytes — that's the gate), samples the
    // same 6×5 grid, thresholds against the image mean, packs 30 bits,
    // and routes pairs through the same 4×8-bit block geometry as
    // Dedup.sqlSimhashPairs.
    "multimodal_dedup_phash" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS nb
        |  FROM documents),
        |dim AS (
        |  SELECT doc_id, nb,
        |         CASE WHEN doc_id % 7 = 0 THEN 13 ELSE 1 + nb % 16 END AS w,
        |         CASE WHEN doc_id % 7 = 0 THEN 11 ELSE 1 + (nb * 7) % 16 END AS h
        |  FROM d),
        |g AS (
        |  SELECT doc_id, gx, gy, (gx * w) // 6 AS sx, (gy * h) // 5 AS sy
        |  FROM dim
        |  CROSS JOIN (SELECT unnest(range(0, 6)) AS gx) gxs
        |  CROSS JOIN (SELECT unnest(range(0, 5)) AS gy) gys),
        |px AS (
        |  SELECT doc_id, gx, gy,
        |    xor(CASE WHEN doc_id % 7 = 0 THEN
        |          ((doc_id % 3 + 1) * 7919 * (sx + 1) * (sy + 3)
        |            + sx * 31 + sy * 7) & 16777215
        |        ELSE
        |          ((doc_id % 65536 + 1) * 2654435761 * (sx + 1) * (sy + 3)
        |            + sx * 31 + sy * 7) & 16777215
        |        END,
        |        CASE WHEN doc_id % 7 = 0 AND (doc_id // 7) % 2 = 1
        |              AND sx = 0 AND sy = 0
        |             THEN 526344 ELSE 0 END) AS p
        |  FROM g),
        |sm AS (
        |  SELECT doc_id, gy * 6 + gx AS k,
        |         (p // 65536) % 256 + (p // 256) % 256 + p % 256 AS s
        |  FROM px),
        |tot AS (SELECT doc_id, sum(s) AS tot FROM sm GROUP BY doc_id),
        |fp AS (
        |  SELECT sm.doc_id,
        |         CAST(sum(CASE WHEN 30 * s > tot
        |                       THEN CAST(1 AS BIGINT) << k ELSE 0 END)
        |           AS BIGINT) AS simhash
        |  FROM sm JOIN tot USING (doc_id) GROUP BY sm.doc_id),
        |blk AS (
        |  SELECT doc_id, simhash, t.blk, t.v FROM fp CROSS JOIN LATERAL (VALUES
        |    (0, (simhash // 1) % 256), (1, (simhash // 256) % 256),
        |    (2, (simhash // 65536) % 256), (3, (simhash // 16777216) % 256))
        |    t(blk, v)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        |         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        |  FROM blk a JOIN blk b ON a.blk = b.blk AND a.v = b.v
        |   AND a.doc_id < b.doc_id)
        |SELECT a_id, b_id, hamming FROM cand WHERE hamming <= 3
        |ORDER BY a_id, b_id""".stripMargin,
    // header constants are the written format's; the frame count is the
    // generator's sample count, predicted from the UTF-8 byte length.
    "multimodal_audio_meta" ->
      """SELECT doc_id,
        |       CAST(8000 AS INT) AS sample_rate,
        |       CAST(1 AS INT) AS channels,
        |       CAST(16 AS INT) AS bits,
        |       CAST(800 + octet_length(encode(text)) % 800 AS BIGINT)
        |         AS n_samples
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the exact sawtooth replay: sum of squares and peak are pure
    // integer folds over the same s_i = ((i*13 + id*31) % 2048) - 1024
    // the Spark side DECODES back out of the WAV container.
    "multimodal_audio_energy" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         800 + octet_length(encode(text)) % 800 AS n
        |  FROM documents),
        |s AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
        |v AS (SELECT doc_id, n,
        |        ((i * 13 + doc_id * 31) % 2048) - 1024 AS v
        |      FROM s)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
        |       CAST(sum(v * v) AS BIGINT) AS sum_sq,
        |       CAST(max(abs(v)) AS BIGINT) AS peak,
        |       round(sqrt(CAST(sum(v * v) AS DOUBLE) / n), 4) AS rms
        |FROM v GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,
    // quartile bucket = channel >> 6 (integer //64), counted per doc
    // over the same planted pixel grid as the pooling oracle.
    "multimodal_channel_hist" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |         CAST(1 + octet_length(encode(text)) % 16 AS BIGINT) AS w,
        |         CAST(1 + (octet_length(encode(text)) * 7) % 16 AS BIGINT) AS h
        |  FROM documents),
        |pix AS (
        |  SELECT d.doc_id,
        |         ((d.doc_id * 2654435761 + x.x * 31 + y.y * 7)
        |           & 16777215) AS v
        |  FROM dims d
        |  JOIN (SELECT unnest(range(0, 16)) AS x) x ON x.x < d.w
        |  JOIN (SELECT unnest(range(0, 16)) AS y) y ON y.y < d.h)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN ((v >> 16) & 255) // 64 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS r0,
        |  CAST(sum(CASE WHEN ((v >> 16) & 255) // 64 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r1,
        |  CAST(sum(CASE WHEN ((v >> 16) & 255) // 64 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS r2,
        |  CAST(sum(CASE WHEN ((v >> 16) & 255) // 64 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS r3,
        |  CAST(sum(CASE WHEN ((v >> 8) & 255) // 64 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS g0,
        |  CAST(sum(CASE WHEN ((v >> 8) & 255) // 64 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS g1,
        |  CAST(sum(CASE WHEN ((v >> 8) & 255) // 64 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS g2,
        |  CAST(sum(CASE WHEN ((v >> 8) & 255) // 64 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS g3,
        |  CAST(sum(CASE WHEN (v & 255) // 64 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b0,
        |  CAST(sum(CASE WHEN (v & 255) // 64 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
        |  CAST(sum(CASE WHEN (v & 255) // 64 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS b2,
        |  CAST(sum(CASE WHEN (v & 255) // 64 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS b3
        |FROM pix GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the decimated twin of the energy oracle: even-indexed samples
    // only (v(2j)), ceil(n/2) kept.
    "multimodal_audio_downsample" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         800 + octet_length(encode(text)) % 800 AS n
        |  FROM documents),
        |s AS (
        |  SELECT d.doc_id, d.n, j.j
        |  FROM d JOIN (SELECT unnest(range(0, 800)) AS j) j
        |    ON 2 * j.j < d.n),
        |v AS (SELECT doc_id, n,
        |        (((2 * j) * 13 + doc_id * 31) % 2048) - 1024 AS v
        |      FROM s)
        |SELECT doc_id, CAST((n + 1) // 2 AS BIGINT) AS n_out,
        |       CAST(sum(v * v) AS BIGINT) AS energy
        |FROM v GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,
    // one row per generator frame; dims from the same integer formulas
    // the Spark side decodes back out of the real PNG frames.
    "multimodal_video_meta" ->
      """WITH d AS (
        |  SELECT doc_id, octet_length(encode(text)) AS nb,
        |         1 + doc_id % 4 AS k
        |  FROM documents),
        |f AS (SELECT doc_id, nb, unnest(range(0, k)) AS f FROM d)
        |SELECT doc_id, CAST(f AS BIGINT) AS frame_no,
        |       CAST(1 + (nb + f) % 16 AS INT) AS width,
        |       CAST(1 + ((nb + f) * 7) % 16 AS INT) AS height
        |FROM f ORDER BY doc_id, frame_no""".stripMargin
  )
}
