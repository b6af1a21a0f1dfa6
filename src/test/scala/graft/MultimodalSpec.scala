package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Multimodal
import graft.engine.Multimodal.{MediaRecord, MediaFeatures}

/** The Dataset half of the multimodal path: binary payloads through the
  * per-partition decode contract (decodeStub is the documented
  * deterministic fake — the Spark-side plumbing is what's under test).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val recs = Seq(
    MediaRecord(1L, "jpeg-ish-bytes".getBytes("UTF-8"), "image"),
    MediaRecord(2L, Array[Byte](0, 1, 2, 3, 4, 5), "audio"),
    MediaRecord(3L, Array.emptyByteArray, "video"))

  test("extractFeatures is a map-only, deterministic, per-record transform") {
    val ds = spark.createDataset(recs).repartition(3)
    val out1 = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)
    val out2 = Multimodal.extractFeatures(ds.repartition(2)).collect().sortBy(_.media_id)
    assert(out1.toSeq == out2.toSeq) // partitioning must not change results
    assert(out1.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(out1.map(_.n_bytes).toSeq == recs.sortBy(_.media_id).map(_.payload.length.toLong))
    assert(out1.forall(f => f.width >= 64 && f.height >= 64 && f.n_frames >= 1))
  }

  test("sampleFrames fans out every Nth frame, deterministically across partitionings") {
    val ds = spark.createDataset(recs)
    val frames = Multimodal.sampleFrames(ds, 7).collect().sortBy(f => (f.media_id, f.frame_idx))
    val expectedCounts = recs.map(r => (r.media_id,
      (0 until Multimodal.decodeStub(r).n_frames by 7).size)).toMap
    assert(frames.groupBy(_.media_id).view.mapValues(_.length).toMap == expectedCounts)
    assert(frames.forall(f => f.frame_idx % 7 == 0))
    val again = Multimodal.sampleFrames(ds.repartition(3), 7).collect()
      .sortBy(f => (f.media_id, f.frame_idx))
    assert(frames.map(f => (f.media_id, f.frame_idx, f.payload.toSeq)).toSeq ==
      again.map(f => (f.media_id, f.frame_idx, f.payload.toSeq)).toSeq)
  }

  test("resizeFrames rewrites dimensions and keeps the frame identity") {
    val ds = spark.createDataset(recs)
    val resized = Multimodal.resizeFrames(Multimodal.sampleFrames(ds, 11), 224, 224).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(f => f.width == 224 && f.height == 224))
  }

  test("graded q_multimodal_decode: one row per doc, deterministic, all-scalar schema") {
    val df1 = Multimodal.queries("q_multimodal_decode")(spark, TestSpark.sfDir)
    val nDocs = graft.engine.Tables.documents(spark, TestSpark.sfDir).count()
    assert(df1.count() == nDocs)
    assert(df1.schema.fields.forall(f => !f.dataType.typeName.startsWith("array") &&
      f.dataType.typeName != "binary"), df1.schema.treeString)
    val r1 = df1.collect().map(_.toSeq).toSeq
    val r2 = Multimodal.queries("q_multimodal_decode")(spark, TestSpark.sfDir)
      .collect().map(_.toSeq).toSeq
    assert(r1 == r2)
  }

  test("graded q_multimodal_frames: fan-out count is sum of ceil(n_frames/30) over docs") {
    val frames = Multimodal.queries("q_multimodal_frames")(spark, TestSpark.sfDir)
    val docs = graft.engine.Tables.documents(spark, TestSpark.sfDir)
      .select("doc_id", "text", "lang").collect()
    val want = docs.map { r =>
      val f = Multimodal.decodeStub(MediaRecord(r.getLong(0),
        r.getString(1).getBytes("UTF-8"), r.getString(2)))
      (0 until f.n_frames by 30).size.toLong
    }.sum
    assert(frames.count() == want)
    assert(frames.schema.fields.forall(f => f.dataType.typeName != "binary"),
      frames.schema.treeString)
  }

  test("decodeStub checksum depends on payload bytes") {
    val a = Multimodal.decodeStub(MediaRecord(1L, "abc".getBytes, "image"))
    val b = Multimodal.decodeStub(MediaRecord(1L, "abd".getBytes, "image"))
    assert(a.checksum != b.checksum)
    assert(a == Multimodal.decodeStub(MediaRecord(1L, "abc".getBytes, "image")))
  }

  // ------------------------------- real parsers (r15 verdict item #4)

  test("BMP parser: golden header bytes, stride padding, and top-down negative height") {
    val bmp = Multimodal.makeBmp(2, 3, topDown = false, seed = 7L)
    // Golden checks against the spec layout, independent of the parser:
    // 'B','M', file size LE at 2, pixel offset 54 at 10, biSize 40 at 14.
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
    assert(bmp.length == 54 + 8 * 3) // width 2 -> 6 pixel bytes -> stride 8
    assert((bmp(2) & 0xff) == bmp.length && bmp(3) == 0 && bmp(10) == 54 && bmp(14) == 40)
    val p = Multimodal.parseBmp(bmp).get
    assert((p.format, p.width, p.height, p.n_channels) == (("bmp", 2, 3, 3)))
    val down = Multimodal.parseBmp(Multimodal.makeBmp(5, 4, topDown = true, seed = 1L)).get
    assert((down.width, down.height) == ((5, 4))) // |biHeight| reported
  }

  test("BMP parser: self-consistent header with undersized payload falls to None (r16 ADVICE)") {
    // A bare 54-byte header whose fileSize matches its own length but
    // declares huge dimensions: the old fileSize==length check passed it;
    // the pixel-coverage guard (Long stride · |h|) must reject it.
    def header54(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(54).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(54).putShort(0).putShort(0).putInt(54)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      b.putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
      b.array()
    }
    assert(Multimodal.parseBmp(header54(100000, 100000)).isEmpty)
    // Would overflow Int stride arithmetic; Long math must stay sound.
    assert(Multimodal.parseBmp(header54(Int.MaxValue / 2, 4)).isEmpty)
    // biHeight == Int.MinValue survives math.abs as negative — rejected.
    val minH = Multimodal.makeBmp(2, 3, topDown = false, seed = 7L)
    val patched = minH.clone()
    java.nio.ByteBuffer.wrap(patched).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, Int.MinValue)
    assert(Multimodal.parseBmp(patched).isEmpty)
    // Truncated pixel region with a patched-to-match fileSize: rejected.
    val trunc = minH.take(54 + 10)
    java.nio.ByteBuffer.wrap(trunc).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(2, trunc.length)
    assert(Multimodal.parseBmp(trunc).isEmpty)
    // The real generated payload still parses (guard is not over-strict).
    assert(Multimodal.parseBmp(minH).nonEmpty)
  }

  test("WAV parser: real chunk walk skips a LIST chunk before data; duration from sample rate") {
    val wav = Multimodal.makeWav(2, 16000, 250, seed = 3L)
    val p = Multimodal.parseWav(wav).get
    assert((p.format, p.n_channels, p.sample_rate, p.n_samples, p.duration_ms) ==
      (("wav", 2, 16000, 250L, 15L))) // 250/16000 s = 15.625 ms -> 15
    // Splice a 7-byte LIST chunk (odd size -> pad byte) between fmt and
    // data: a fixed-offset reader breaks, a real chunk walk doesn't.
    val head = wav.take(36) // RIFF header + fmt chunk
    val tail = wav.drop(36) // data chunk
    val list = "LIST".getBytes ++ Array[Byte](7, 0, 0, 0) ++ "INFOxyz".getBytes ++ Array[Byte](0)
    val spliced = head ++ list ++ tail
    // Patch the RIFF size for the extra bytes (LE32 at offset 4).
    val riffSize = spliced.length - 8
    spliced(4) = (riffSize & 0xff).toByte; spliced(5) = ((riffSize >> 8) & 0xff).toByte
    spliced(6) = ((riffSize >> 16) & 0xff).toByte; spliced(7) = ((riffSize >> 24) & 0xff).toByte
    assert(Multimodal.parseWav(spliced).get == p)
  }

  test("PPM parser: tokenizer handles comments; byte-count mismatch rejects") {
    val ppm = Multimodal.makePpm(4, 5, seed = 9L)
    val p = Multimodal.parsePpm(ppm).get
    assert((p.format, p.width, p.height) == (("ppm", 4, 5)))
    // Same pixels behind a commented header — a fixed-layout slice breaks.
    val commented = "P6\n# a comment\n4 5\n255\n".getBytes("US-ASCII") ++
      ppm.drop("P6\n4 5\n255\n".length)
    assert(Multimodal.parsePpm(commented).get == p)
    // Truncated pixel data must reject, not misreport.
    assert(Multimodal.parsePpm(ppm.dropRight(1)).isEmpty)
  }

  test("decode dispatches real formats and falls back to the stub on foreign or corrupt bytes") {
    val bmp = Multimodal.makeBmp(17, 9, topDown = false, seed = 2L)
    val real = Multimodal.decode(MediaRecord(1L, bmp, "image"))
    assert((real.width, real.height, real.n_frames) == ((17, 9, 1)))
    val wav = Multimodal.decode(MediaRecord(2L, Multimodal.makeWav(1, 8000, 400, 5L), "audio"))
    assert((wav.width, wav.height, wav.n_frames) == ((0, 0, 400)))
    // Magic matches but the structure is garbage -> stub, never a throw.
    val corrupt = "BM then definitely not a bitmap header".getBytes
    assert(Multimodal.decode(MediaRecord(3L, corrupt, "image")) ==
      Multimodal.decodeStub(MediaRecord(3L, corrupt, "image")))
    // Adversarial numeric edges (review findings): a P6 dimension token
    // past Int.MaxValue and a RIFF chunk whose declared size would wrap
    // Int arithmetic must both fall back, not throw.
    val hugePpm = "P6 99999999999 5 255 ".getBytes
    assert(Multimodal.decode(MediaRecord(5L, hugePpm, "image")) ==
      Multimodal.decodeStub(MediaRecord(5L, hugePpm, "image")))
    val wavBomb = {
      val b = Multimodal.makeWav(1, 8000, 4, 1L)
      // Declare a ~Int.MaxValue size on the fmt chunk (LE32 at offset 16).
      b(16) = 0xf0.toByte; b(17) = 0xff.toByte; b(18) = 0xff.toByte; b(19) = 0x7f.toByte
      b
    }
    assert(Multimodal.decode(MediaRecord(6L, wavBomb, "audio")) ==
      Multimodal.decodeStub(MediaRecord(6L, wavBomb, "audio")))
    // Text payloads (the documents corpus) stay on the stub path, so the
    // standing graded keys are unchanged by the real tier.
    val text = "an ordinary document".getBytes
    assert(Multimodal.decode(MediaRecord(4L, text, "en")) ==
      Multimodal.decodeStub(MediaRecord(4L, text, "en")))
  }

  test("generated-corpus closed loop: parse(make(id)) matches the doc_id formulas for 300 ids") {
    (0L until 300L).foreach { id =>
      val payload = (id % 3) match {
        case 0 => Multimodal.makeBmp((1 + id % 37).toInt, (1 + id % 29).toInt, id % 5 == 0, id)
        case 1 => Multimodal.makeWav((1 + id % 2).toInt, (8000 + (id % 4) * 4000).toInt,
          (100 + id % 400).toInt, id)
        case _ => Multimodal.makePpm((1 + id % 41).toInt, (1 + id % 31).toInt, id)
      }
      val p = Multimodal.parseMedia(payload).get
      (id % 3) match {
        case 0 =>
          assert((p.format, p.width, p.height) == (("bmp", (1 + id % 37).toInt, (1 + id % 29).toInt)), s"id=$id")
          assert(payload.length == 54 + ((3 * (1 + id % 37) + 3) / 4 * 4 * (1 + id % 29)), s"id=$id")
        case 1 =>
          val (ch, sr, ns) = ((1 + id % 2).toInt, (8000 + (id % 4) * 4000).toInt, (100 + id % 400).toInt)
          assert((p.format, p.n_channels, p.sample_rate, p.n_samples) == (("wav", ch, sr, ns.toLong)), s"id=$id")
          assert(p.duration_ms == ns * 1000L / sr && payload.length == 44 + ns * ch * 2, s"id=$id")
        case _ =>
          assert((p.format, p.width, p.height) == (("ppm", (1 + id % 41).toInt, (1 + id % 31).toInt)), s"id=$id")
      }
    }
  }

  // ------------------------------------------------------------- PNG tier

  /** Independent pixel sum: recompute (seed + i) mod 256 directly. */
  private def expectedPixelSum(w: Int, h: Int, seed: Long): Long =
    (0 until 3 * w * h).map(i => (seed + i) & 0xff).sum

  test("PNG closed loop: stored and REALLY-compressed multi-IDAT streams decode identically") {
    for (id <- 0L until 200L) {
      val (w, h) = ((1 + id % 21).toInt, (1 + id % 17).toInt)
      val stored = Multimodal.parsePngPixels(Multimodal.makePng(w, h, id)).get
      val compressed = Multimodal.parsePngPixels(Multimodal.makePngCompressed(w, h, id)).get
      assert(stored == compressed, s"id=$id")
      val (p, sum) = stored
      assert((p.format, p.width, p.height, p.n_channels) == (("png", w, h, 3)), s"id=$id")
      assert(sum == expectedPixelSum(w, h, id), s"id=$id")
      // n_bytes closed form the oracle uses: 57 + zlib(2 + raw + 5*blocks + 4).
      val raw = h * (1 + 3 * w)
      assert(Multimodal.makePng(w, h, id).length ==
        57 + 2 + raw + 5 * ((raw + 65534) / 65535) + 4, s"id=$id")
    }
  }

  test("PNG decoder vs an independent encoder: javax.imageio round-trip") {
    // ImageIO is the JDK's own, independently-written PNG encoder — if
    // our unfilter agreed with our forward filter but not with the spec,
    // this catches it. (Headless-safe: BufferedImage needs no display.)
    val (w, h, seed) = (23, 11, 42L)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val i = 3 * (y * w + x)
      def c(k: Int) = ((seed + i + k) & 0xff).toInt
      img.setRGB(x, y, (c(0) << 16) | (c(1) << 8) | c(2)) // RGB order
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val (p, sum) = Multimodal.parsePngPixels(bos.toByteArray).get
    assert((p.format, p.width, p.height, p.n_channels) == (("png", w, h, 3)))
    assert(sum == expectedPixelSum(w, h, seed))
  }

  test("PNG decoder: gray (1ch) and RGBA (4ch) profiles via independent ImageIO encodes") {
    // The graded closed loop exercises color type 2 (RGB) only; the
    // unfilter's bpp=1 and bpp=4 paths (left/up-left neighbor offsets
    // differ per bpp) get their own independent-encoder round-trips.
    val (w, h) = (19, 13)
    // Gray: TYPE_BYTE_GRAY encodes as PNG color type 0.
    val gray = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gray.getRaster.setSample(x, y, 0, (7 * (y * w + x) + 3) & 0xff)
    val gBos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(gray, "png", gBos))
    val (gp, gSum) = Multimodal.parsePngPixels(gBos.toByteArray).get
    assert((gp.format, gp.width, gp.height, gp.n_channels) == (("png", w, h, 1)))
    assert(gSum == (0 until w * h).map(i => (7 * i + 3) & 0xff).sum)
    // RGBA: TYPE_4BYTE_ABGR encodes as PNG color type 6 (R,G,B,A order).
    val rgba = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_4BYTE_ABGR)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 4)
      rgba.getRaster.setSample(x, y, c, (11 * (4 * (y * w + x) + c) + 5) & 0xff)
    val aBos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(rgba, "png", aBos))
    val (ap, aSum) = Multimodal.parsePngPixels(aBos.toByteArray).get
    assert((ap.format, ap.width, ap.height, ap.n_channels) == (("png", w, h, 4)))
    // Sum over all four channels is band-order independent.
    assert(aSum == (0 until 4 * w * h).map(i => (11 * i + 5) & 0xff).sum)
  }

  test("PNG palette and 16-bit profiles via independent ImageIO encodes; gray+alpha hand-framed") {
    // Palette (color type 3): TYPE_BYTE_INDEXED with a NON-gray palette
    // (a gray ramp would let ImageIO legally collapse to color type 0) —
    // the reported sum is the EXPANDED R+G+B per index.
    val (w, h) = (21, 14)
    val cmap = (0 until 256).map(i =>
      (0xff << 24) | (i << 16) | (((i * 3) & 0xff) << 8) | ((i * 7) & 0xff)).toArray
    val icm = new java.awt.image.IndexColorModel(8, 256, cmap, 0, false, -1,
      java.awt.image.DataBuffer.TYPE_BYTE)
    val idx = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      idx.getRaster.setSample(x, y, 0, (5 * (y * w + x) + 9) & 0xff)
    val pBos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(idx, "png", pBos))
    val (pp, pSum) = Multimodal.parsePngPixels(pBos.toByteArray).get
    assert((pp.format, pp.width, pp.height, pp.n_channels) == (("png", w, h, 3)))
    assert(pSum == (0 until w * h).map { i =>
      val v = (5 * i + 9) & 0xff
      (v + ((v * 3) & 0xff) + ((v * 7) & 0xff)).toLong
    }.sum)
    // 16-bit gray (color type 0, depth 16): TYPE_USHORT_GRAY; the sum is
    // over big-endian 16-bit samples.
    val g16 = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      g16.getRaster.setSample(x, y, 0, (1021 * (y * w + x) + 7) & 0xffff)
    val gBos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(g16, "png", gBos))
    val (gp, gSum) = Multimodal.parsePngPixels(gBos.toByteArray).get
    assert((gp.format, gp.width, gp.height, gp.n_channels) == (("png", w, h, 1)))
    assert(gSum == (0 until w * h).map(i => ((1021 * i + 7) & 0xffff).toLong).sum)
    // Gray+alpha (color type 4): hand-framed — filter type 1 (Sub) rows
    // so the bpp=2 predictor distance is actually exercised.
    val (aw, ah) = (9, 6)
    val px = (0 until aw * ah * 2).map(i => ((7 * i + 3) & 0xff).toByte).toArray
    val rows = new java.io.ByteArrayOutputStream()
    for (y <- 0 until ah) {
      rows.write(1) // Sub filter
      for (x <- 0 until 2 * aw) {
        val cur = px(y * 2 * aw + x) & 0xff
        val left = if (x >= 2) px(y * 2 * aw + x - 2) & 0xff else 0
        rows.write((cur - left) & 0xff)
      }
    }
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def be(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      out.write(be(data.length)); out.write(typ.getBytes("US-ASCII")); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      out.write(be(crc.getValue.toInt))
      out.toByteArray
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(rows.toByteArray); defl.finish()
    val zbuf = new Array[Byte](rows.size() * 2 + 64)
    val zlen = defl.deflate(zbuf); defl.end()
    val ga = new java.io.ByteArrayOutputStream()
    ga.write(Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte))
    ga.write(chunk("IHDR", java.nio.ByteBuffer.allocate(13)
      .putInt(aw).putInt(ah).put(8.toByte).put(4.toByte) // depth 8, gray+alpha
      .put(0.toByte).put(0.toByte).put(0.toByte).array()))
    ga.write(chunk("IDAT", java.util.Arrays.copyOf(zbuf, zlen)))
    ga.write(chunk("IEND", Array.emptyByteArray))
    val (ap, aSum) = Multimodal.parsePngPixels(ga.toByteArray).get
    assert((ap.format, ap.width, ap.height, ap.n_channels) == (("png", aw, ah, 2)))
    assert(aSum == px.map(_ & 0xff).sum.toLong)
  }

  test("PNG adversarial edges: truncation, bad filter, bad CRC, zip-bomb dims, unsupported profiles") {
    val good = Multimodal.makePng(9, 7, 5L)
    def stubbed(b: Array[Byte]): Boolean =
      Multimodal.decode(MediaRecord(9L, b, "image")) ==
        Multimodal.decodeStub(MediaRecord(9L, b, "image"))
    // Truncated IDAT (drop the tail): incomplete zlib stream -> stub.
    assert(stubbed(good.dropRight(20)))
    // Bad filter-type byte: patch the first raster byte inside the stored
    // block (offset: 8 sig + 25 IHDR + 8 IDAT hdr + 2 zlib + 5 stored = 48).
    val badFilter = good.clone(); badFilter(48) = 7.toByte
    assert(stubbed(badFilter)) // CRC now wrong too; also rebuild with valid CRC:
    val rebuilt = {
      val raw = java.util.Arrays.copyOfRange(good, 41, good.length - 12 - 4) // IDAT data incl zlib
      raw(2 + 5) = 7.toByte // filter byte inside stored block
      // adler over modified payload no longer matches -> still must stub, not throw
      val out = new java.io.ByteArrayOutputStream()
      out.write(good, 0, 33) // sig + IHDR
      out.write(raw.length >>> 24); out.write((raw.length >>> 16) & 0xff)
      out.write((raw.length >>> 8) & 0xff); out.write(raw.length & 0xff)
      out.write("IDAT".getBytes); out.write(raw)
      val crc = new java.util.zip.CRC32(); crc.update("IDAT".getBytes); crc.update(raw)
      out.write((crc.getValue >>> 24).toInt & 0xff); out.write((crc.getValue >>> 16).toInt & 0xff)
      out.write((crc.getValue >>> 8).toInt & 0xff); out.write(crc.getValue.toInt & 0xff)
      out.write(good, good.length - 12, 12) // IEND
      out.toByteArray
    }
    assert(stubbed(rebuilt))
    // Flipped CRC on a chunk -> stub.
    val badCrc = good.clone(); badCrc(29) = (badCrc(29) ^ 0x55).toByte
    assert(stubbed(badCrc))
    // Unsupported profiles fall back: 16-bit depth, palette, interlaced.
    // (IHDR CRC is recomputed, so the guard under test — not the CRC
    // check — is what rejects.)
    def patchIhdr(off: Int, v: Byte): Array[Byte] = {
      val b = good.clone(); b(off) = v
      val crc = new java.util.zip.CRC32(); crc.update(b, 12, 17)
      java.nio.ByteBuffer.wrap(b).putInt(29, crc.getValue.toInt); b
    }
    // Declared w*h past the raster cap (zip-bomb header) with a VALID
    // CRC -> stub, decided from the header BEFORE any inflate call.
    val bomb = good.clone()
    java.nio.ByteBuffer.wrap(bomb).putInt(16, Int.MaxValue / 2).putInt(20, Int.MaxValue / 2)
    val bombCrc = new java.util.zip.CRC32(); bombCrc.update(bomb, 12, 17)
    java.nio.ByteBuffer.wrap(bomb).putInt(29, bombCrc.getValue.toInt)
    assert(stubbed(bomb))
    assert(stubbed(patchIhdr(24, 4.toByte))) // packed 4-bit depth: out of profile
    assert(stubbed(patchIhdr(25, 3.toByte))) // palette type with NO PLTE chunk
    assert(stubbed(patchIhdr(28, 1.toByte))) // Adam7 interlace
    // And the untouched payload still decodes (guards are not over-strict).
    assert(!stubbed(good))
  }

  // ------------------------------------------------------------- GIF tier

  /** Sum of (seed + i) mod 256 over n indices, recomputed directly. */
  private def expectedIndexSum(n: Int, seed: Long): Long =
    (0 until n).map(i => (seed + i) & 0xff).sum

  test("GIF closed loop: parse(make(id)) matches the doc_id formulas for 200 ids") {
    for (id <- 0L until 200L) {
      val (w, h) = ((1 + id % 19).toInt, (1 + id % 23).toInt)
      val payload = Multimodal.makeGif(w, h, id)
      val (p, sum) = Multimodal.parseGifPixels(payload).get
      assert((p.format, p.width, p.height) == (("gif", w, h)), s"id=$id")
      assert(sum == expectedIndexSum(w * h, id), s"id=$id")
      // n_bytes closed form the oracle uses.
      val n = w * h
      val codes = (n + 253) / 254 + n + 1
      val d = (9 * codes + 7) / 8
      assert(payload.length == 794 + d + (d + 254) / 255, s"id=$id")
      // Magic dispatch routes it to the real parser.
      assert(Multimodal.parseMedia(payload).get.format == "gif", s"id=$id")
    }
  }

  test("GIF decoder vs an independent encoder: javax.imageio REALLY-compressed LZW round-trip") {
    // The closed loop's literal framing never grows the code width; the
    // JDK's own GIF encoder emits genuinely dictionary-compressed LZW
    // (growing 9→12-bit codes) — if our dictionary growth, cScSc case,
    // or width schedule disagreed with the spec, this catches it. The
    // reference decode is ImageIO's own reader over the same bytes: for
    // an indexed GIF its raster samples ARE the decoded LZW indices.
    val (w, h) = (97, 61) // big enough that the dictionary grows past 9 bits
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val i = y * w + x
      // Long runs + structured texture: drives real dictionary reuse.
      img.getRaster.setSample(x, y, 0, if ((i / 40) % 2 == 0) 17 else (i % 7) * 31)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val bytes = bos.toByteArray
    val (p, ourSum) = Multimodal.parseGifPixels(bytes).get
    assert((p.format, p.width, p.height) == (("gif", w, h)))
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var refSum = 0L
    for (y <- 0 until h; x <- 0 until w) refSum += back.getRaster.getSample(x, y, 0)
    assert(ourSum == refSum)
  }

  test("GIF decoder: multi-frame animation sums every frame exactly once") {
    val (w, h, seed) = (11, 9, 3L)
    val one = Multimodal.makeGif(w, h, seed)
    // Frame block = descriptor..sub-block terminator; in makeGif's fixed
    // layout it spans [781, len-1) (the last byte is the 0x3b trailer).
    val frame = java.util.Arrays.copyOfRange(one, 781, one.length - 1)
    val two = new java.io.ByteArrayOutputStream()
    two.write(one, 0, one.length - 1); two.write(frame); two.write(0x3b)
    val (p, sum) = Multimodal.parseGifPixels(two.toByteArray).get
    assert((p.width, p.height) == ((w, h)))
    assert(sum == 2 * expectedIndexSum(w * h, seed))
  }

  test("GIF adversarial edges: truncation, bad counts, interlace, bomb dims, bad codes") {
    val good = Multimodal.makeGif(9, 7, 5L)
    def stubbed(b: Array[Byte]): Boolean =
      Multimodal.decode(MediaRecord(9L, b, "image")) ==
        Multimodal.decodeStub(MediaRecord(9L, b, "image"))
    assert(!stubbed(good))
    // Truncated anywhere: mid-GCT, mid-sub-block, missing trailer.
    assert(stubbed(good.take(400)))
    assert(stubbed(good.dropRight(1)))
    assert(stubbed(good.dropRight(10)))
    // Descriptor height += 1: LZW decodes fewer than w*h indices.
    val short = good.clone(); short(788) = (short(788) + 1).toByte
    assert(stubbed(short))
    // Descriptor height -= 1: stream now over-emits.
    val long = good.clone(); long(788) = (long(788) - 1).toByte
    assert(stubbed(long))
    // Interlace flag: ACCEPTED — same LZW stream, row placement only,
    // and every reported output is row-order invariant.
    val inter = good.clone(); inter(790) = (inter(790) | 0x40).toByte
    assert(Multimodal.parseGifPixels(inter) == Multimodal.parseGifPixels(good))
    // Zip-bomb dims: 65535x65535 declared raster rejected BEFORE decode.
    val bomb = good.clone()
    bomb(786) = 0xff.toByte; bomb(787) = 0xff.toByte
    bomb(788) = 0xff.toByte; bomb(789) = 0xff.toByte
    assert(stubbed(bomb))
    // Invalid LZW min code size.
    val badMin = good.clone(); badMin(791) = 1.toByte
    assert(stubbed(badMin))
    // Unknown top-level block type.
    val badBlock = good.clone(); badBlock(781) = 0x42.toByte
    assert(stubbed(badBlock))
    // Hand-built code stream whose first post-clear code is not a root:
    // clear(256) then 300 — must be rejected, not dereferenced.
    val evil = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(good, 0, 792) // header..min-code-size byte
      val codes = Seq(256, 300, 257)
      val data = new Array[Byte]((9 * codes.length + 7) / 8)
      var bit = 0
      codes.foreach { c =>
        var acc = c
        for (_ <- 0 until 9) {
          data(bit >> 3) = (data(bit >> 3) | ((acc & 1) << (bit & 7))).toByte
          acc >>= 1; bit += 1
        }
      }
      out.write(data.length); out.write(data); out.write(0); out.write(0x3b)
      out.toByteArray
    }
    assert(stubbed(evil))
    // GIF87a magic is accepted (the guard is the version pair, not 89a-only).
    val v87 = good.clone(); v87(4) = '7'.toByte
    assert(!stubbed(v87))
  }

  // ------------------------------------------------------------ FLAC tier

  test("FLAC closed loop: parse(make(id)) matches the doc_id formulas for 200 ids") {
    for (id <- 0L until 200L) {
      val (c, sr, n) = ((1 + id % 2).toInt, (8000 + (id % 4) * 4000).toInt, (100 + id % 400).toInt)
      val payload = Multimodal.makeFlac(c, sr, n, id)
      val (p, sum) = Multimodal.parseFlacSamples(payload).get
      assert((p.format, p.n_channels, p.sample_rate, p.n_samples) == (("flac", c, sr, n.toLong)), s"id=$id")
      assert(p.duration_ms == n.toLong * 1000 / sr, s"id=$id")
      // Sample sum from the ramp design, recomputed directly.
      val want = (0 until c).map { ch =>
        val base = ((id + 37L * ch) % 200L) - 100L
        (0 until n).map(i => base + i).sum
      }.sum
      assert(sum == want, s"id=$id")
      // n_bytes closed form the oracle uses.
      assert(payload.length == 42 + (64 + c * (34 + 3 * (n - 1)) + 7) / 8 + 2, s"id=$id")
      assert(Multimodal.parseMedia(payload).get.format == "flac", s"id=$id")
    }
  }

  test("FLAC golden bytes: the tiny stream's header layout matches the spec, independent of the parser") {
    val b = Multimodal.makeFlac(1, 8000, 16, 0L)
    assert(new String(b, 0, 4, "US-ASCII") == "fLaC")
    assert((b(4) & 0xff) == 0x80 && b(5) == 0 && b(6) == 0 && b(7) == 34) // last-block STREAMINFO, len 34
    assert(((b(8) & 0xff) << 8 | (b(9) & 0xff)) == 16)  // min blocksize
    assert(((b(10) & 0xff) << 8 | (b(11) & 0xff)) == 16) // max blocksize
    // sample rate 8000 as 20 bits from byte 18: 0000_0001 1111_0100 0000,
    // then channels-1 = 000, then bps-1 = 01111 (16-bit), then the 36-bit
    // total = 16 whose last 32 bits fill bytes 22..25.
    assert((b(18) & 0xff) == 0x01 && (b(19) & 0xff) == 0xf4)
    assert((b(20) & 0xff) == 0x00) // rate low nibble 0, ch-1 000, bps bit 0
    assert((b(21) & 0xff) == 0xf0) // bps-1 low bits 1111, total high nibble
    assert((b(22), b(23), b(24)) == ((0.toByte, 0.toByte, 0.toByte)))
    assert((b(25) & 0xff) == 0x10) // total = 16
    // Frame starts at 42 with the 14-bit sync 0b11111111111110 + 0 + 0.
    assert((b(42) & 0xff) == 0xff && (b(43) & 0xff) == 0xf8)
    // blocksize code 7, sr code 0 -> byte 0x70; ch 0, bps code 4 -> 0x08.
    assert((b(44) & 0xff) == 0x70 && (b(45) & 0xff) == 0x08)
    assert((b(46) & 0xff) == 0x00) // frame number 0
    assert(((b(47) & 0xff) << 8 | (b(48) & 0xff)) == 15) // blocksize-1
    assert((b(49) & 0xff) == Multimodal.crc8(b, 42, 49))
    // Trailing 2 bytes are the frame CRC-16 over everything before them.
    val got = ((b(b.length - 2) & 0xff) << 8) | (b(b.length - 1) & 0xff)
    assert(got == Multimodal.crc16(b, 42, b.length - 2))
  }

  /** Independent MSB-first bit writer — a SECOND implementation, so the
    * multi-feature stream below is not encoded by the code under test.
    */
  private final class TestBits {
    private val out = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nbits = 0
    def put(v: Long, n: Int): Unit = (n - 1 to 0 by -1).foreach { k =>
      cur = (cur << 1) | ((v >> k) & 1L).toInt
      nbits += 1
      if (nbits == 8) { out += cur.toByte; cur = 0; nbits = 0 }
    }
    def rice(res: Long, param: Int): Unit = {
      val z = if (res >= 0) 2 * res else -2 * res - 1
      val q = (z >> param).toInt
      (0 until q).foreach(_ => put(0, 1)); put(1, 1)
      if (param > 0) put(z & ((1L << param) - 1), param)
    }
    def align(): Unit = while (nbits != 0) put(0, 1)
    def bytes: Array[Byte] = { require(nbits == 0); out.toArray }
  }

  test("FLAC decoder: constant/verbatim/order-2/partitions/escape/5-bit-rice/wasted-bits/multi-frame") {
    // Two frames, two channels, bps 16. Frame 0 (blocksize 192, code 1):
    // ch0 CONSTANT -7; ch1 FIXED order 2 over s_i = (i*i - 40i) mod 501
    // with partition order 1 and an ESCAPE second partition. Frame 1
    // (blocksize 32, code 6): ch0 VERBATIM s_i = 1000 - 63i; ch1 FIXED
    // order 0, rice METHOD 1 (5-bit params), WASTED BITS = 2 (samples
    // all multiples of 4).
    val f0ch1 = (0 until 192).map(i => ((i * i - 40 * i) % 501).toLong).toArray
    val f1ch0 = (0 until 32).map(i => (1000 - 63 * i).toLong).toArray
    val f1ch1 = (0 until 32).map(i => 4L * ((i * 7) % 100)).toArray
    val w = new TestBits
    w.put('f', 8); w.put('L', 8); w.put('a', 8); w.put('C', 8)
    w.put(0x80, 8); w.put(34, 24)
    w.put(32, 16); w.put(192, 16) // min/max blocksize
    w.put(0, 24); w.put(0, 24)
    w.put(16000, 20); w.put(1, 3); w.put(15, 5); w.put(224, 36)
    (0 until 16).foreach(_ => w.put(0, 8))
    val head = w.bytes
    def frame(num: Int, bsCode: Int, bsExtra: Option[Int], body: TestBits => Unit): Array[Byte] = {
      val f = new TestBits
      f.put(0x3ffe, 14); f.put(0, 1); f.put(0, 1)
      f.put(bsCode, 4); f.put(0, 4); f.put(1, 4); f.put(4, 3); f.put(0, 1)
      f.put(num, 8)
      bsExtra.foreach(v => f.put(v, 8))
      val hdr = f.bytes
      f.put(Multimodal.crc8(hdr, 0, hdr.length), 8)
      body(f)
      f.align()
      val all = f.bytes
      f.put(Multimodal.crc16(all, 0, all.length), 16)
      f.bytes
    }
    val frame0 = frame(0, 1, None, { f =>
      f.put(0, 1); f.put(0, 6); f.put(0, 1) // ch0: constant
      f.put((-7L) & 0xffff, 16)
      f.put(0, 1); f.put(10, 6); f.put(0, 1) // ch1: fixed order 2
      f.put(f0ch1(0) & 0xffff, 16); f.put(f0ch1(1) & 0xffff, 16)
      f.put(0, 2); f.put(1, 4) // method 0, partition order 1 (2 partitions)
      val res = (2 until 192).map(i => f0ch1(i) - 2 * f0ch1(i - 1) + f0ch1(i - 2))
      f.put(6, 4) // partition 0: param 6, holds 96-2 = 94 residuals
      res.take(94).foreach(r => f.rice(r, 6))
      f.put(15, 4); f.put(12, 5) // partition 1: ESCAPE, 12-bit raw
      res.drop(94).foreach(r => f.put(r & 0xfff, 12))
    })
    val frame1 = frame(1, 6, Some(31), { f =>
      f.put(0, 1); f.put(1, 6); f.put(0, 1) // ch0: verbatim
      f1ch0.foreach(s => f.put(s & 0xffff, 16))
      f.put(0, 1); f.put(8, 6); f.put(1, 1) // ch1: fixed order 0, wasted flag
      f.put(0, 1); f.put(1, 1) // wasted = unary 1 + 1 = 2
      f.put(1, 2); f.put(0, 4) // method 1 (5-bit), partition order 0
      f.put(3, 5) // rice param 3
      f1ch1.foreach(s => f.rice(s >> 2, 3)) // effBps=14 samples
    })
    val bytes = head ++ frame0 ++ frame1
    val (p, sum) = Multimodal.parseFlacSamples(bytes).get
    assert((p.format, p.n_channels, p.sample_rate, p.n_samples) == (("flac", 2, 16000, 224L)))
    val want = -7L * 192 + f0ch1.sum + f1ch0.sum + f1ch1.sum
    assert(sum == want)
    // Order-2 residuals in partition 1 must actually fit the 12-bit raw
    // window (sanity that the escape path was genuinely exercised).
    assert((2 until 192).map(i => f0ch1(i) - 2 * f0ch1(i - 1) + f0ch1(i - 2)).drop(94)
      .forall(r => r >= -2048 && r < 2048))
  }

  test("FLAC stereo decorrelation: left/side, right/side, and mid/side reconstruct Σ(L+R) exactly") {
    // Independent test-side encode: L/R are fixed arrays (negatives and
    // odd sums included — mid/side floors (L+R)>>1 and recovers the lost
    // bit from side's parity); each mode stores the derived channels
    // verbatim (side at 17 bits) and the decoder must undo the
    // decorrelation. Expected = Σ(L+R) computed directly from L and R.
    val bsz = 32
    val left = (0 until bsz).map(i => (i * 37 - 400 + (i % 3)).toLong).toArray
    val right = (0 until bsz).map(i => (251 - i * 29 + (i % 5)).toLong).toArray
    val want = left.sum + right.sum
    def stream(chAsgn: Int, ch0: Array[Long], ch0Bits: Int, ch1: Array[Long], ch1Bits: Int): Array[Byte] = {
      val w = new TestBits
      w.put('f', 8); w.put('L', 8); w.put('a', 8); w.put('C', 8)
      w.put(0x80, 8); w.put(34, 24)
      w.put(bsz, 16); w.put(bsz, 16)
      w.put(0, 24); w.put(0, 24)
      w.put(16000, 20); w.put(1, 3); w.put(15, 5); w.put(bsz, 36)
      (0 until 16).foreach(_ => w.put(0, 8))
      val head = w.bytes
      val f = new TestBits
      f.put(0x3ffe, 14); f.put(0, 1); f.put(0, 1)
      f.put(6, 4); f.put(0, 4); f.put(chAsgn, 4); f.put(4, 3); f.put(0, 1)
      f.put(0, 8); f.put(bsz - 1, 8)
      val hdr = f.bytes
      f.put(Multimodal.crc8(hdr, 0, hdr.length), 8)
      for ((ch, bits) <- Seq((ch0, ch0Bits), (ch1, ch1Bits))) {
        f.put(0, 1); f.put(1, 6); f.put(0, 1) // verbatim
        ch.foreach(s => f.put(s & ((1L << bits) - 1), bits))
      }
      f.align()
      val body = f.bytes
      f.put(Multimodal.crc16(body, 0, body.length), 16)
      head ++ f.bytes
    }
    val side = left.zip(right).map { case (l, r) => l - r }
    val mid = left.zip(right).map { case (l, r) => (l + r) >> 1 }
    for ((name, bytes) <- Seq(
      "left/side" -> stream(8, left, 16, side, 17),
      "right/side" -> stream(9, side, 17, right, 16),
      "mid/side" -> stream(10, mid, 16, side, 17))) {
      val (p, sum) = Multimodal.parseFlacSamples(bytes).getOrElse(fail(s"$name did not parse"))
      assert(p.n_channels == 2, name)
      assert(sum == want, s"$name: got $sum want $want")
    }
  }

  test("FLAC LPC subframes: quantized-coefficient recurrence reconstructs the exact sample sum") {
    // Order-2 LPC, coefficients [3, -1] at precision 4, shift 2:
    // s_i = r_i + ((3*s_{i-1} - s_{i-2}) >> 2). Residuals are computed
    // here (the independent encoder) and the decoder must reproduce the
    // direct sample sum through the same arithmetic-shift recurrence —
    // negatives included (floor semantics of >> on negative sums).
    val bsz = 48
    val samples = new Array[Long](bsz)
    samples(0) = 10; samples(1) = -25
    for (i <- 2 until bsz)
      samples(i) = ((i * 13) % 200) - 100
    val w = new TestBits
    w.put('f', 8); w.put('L', 8); w.put('a', 8); w.put('C', 8)
    w.put(0x80, 8); w.put(34, 24)
    w.put(bsz, 16); w.put(bsz, 16)
    w.put(0, 24); w.put(0, 24)
    w.put(8000, 20); w.put(0, 3); w.put(15, 5); w.put(bsz, 36)
    (0 until 16).foreach(_ => w.put(0, 8))
    val head = w.bytes
    val f = new TestBits
    f.put(0x3ffe, 14); f.put(0, 1); f.put(0, 1)
    f.put(6, 4); f.put(0, 4); f.put(0, 4); f.put(4, 3); f.put(0, 1)
    f.put(0, 8); f.put(bsz - 1, 8)
    val hdr = f.bytes
    f.put(Multimodal.crc8(hdr, 0, hdr.length), 8)
    f.put(0, 1); f.put(33, 6); f.put(0, 1) // LPC order 2 (0b100001)
    f.put(samples(0) & 0xffff, 16); f.put(samples(1) & 0xffff, 16) // warmup
    f.put(3, 4)  // precision-1 = 3 -> 4-bit coefficients
    f.put(2, 5)  // shift 2
    f.put(3 & 0xf, 4); f.put(-1 & 0xf, 4) // coefs 3, -1
    f.put(0, 2); f.put(0, 4) // rice method 0, partition order 0
    f.put(5, 4) // rice parameter 5
    for (i <- 2 until bsz) {
      val pred = (3 * samples(i - 1) - samples(i - 2)) >> 2
      f.rice(samples(i) - pred, 5)
    }
    f.align()
    val body = f.bytes
    f.put(Multimodal.crc16(body, 0, body.length), 16)
    val (p, sum) = Multimodal.parseFlacSamples(head ++ f.bytes).getOrElse(fail("LPC stream did not parse"))
    assert(p.n_samples == bsz.toLong)
    assert(sum == samples.sum, s"got $sum want ${samples.sum}")
  }

  test("FLAC adversarial edges: truncation, CRC flips, LPC, stereo decorrelation, count drift") {
    val good = Multimodal.makeFlac(2, 16000, 100, 11L)
    def stubbed(b: Array[Byte]): Boolean =
      Multimodal.decode(MediaRecord(9L, b, "audio")) ==
        Multimodal.decodeStub(MediaRecord(9L, b, "audio"))
    assert(!stubbed(good))
    assert(stubbed(good.take(30)))        // truncated inside STREAMINFO
    assert(stubbed(good.dropRight(1)))    // truncated CRC-16
    assert(stubbed(good.dropRight(40)))   // truncated mid-subframe
    val badCrc8 = good.clone(); badCrc8(49) = (badCrc8(49) ^ 0x5a).toByte
    assert(stubbed(badCrc8))
    val badCrc16 = good.clone()
    badCrc16(badCrc16.length - 1) = (badCrc16(badCrc16.length - 1) ^ 1).toByte
    assert(stubbed(badCrc16))
    // Subframe type 0b000010 (reserved 2-7 band): rejected, not a crash.
    // Subframe header is bits [0..7] of the byte after crc8 (byte 50).
    // (LPC types 32-63 are now DECODED - see the dedicated LPC spec.)
    val lpc = good.clone(); lpc(50) = 0x04.toByte
    assert(stubbed(lpc))
    // Channel assignment 11 (reserved): rejected by the profile check
    // before the CRC even runs. (8-10, stereo decorrelation, are now
    // DECODED - see the dedicated decorrelation spec.)
    val decor = good.clone(); decor(45) = ((11 << 4) | (decor(45) & 0x0f)).toByte
    assert(stubbed(decor))
    // STREAMINFO total samples != decoded count: byte 25 holds the low
    // bits of the 36-bit total in makeFlac's layout.
    val drift = good.clone(); drift(25) = (drift(25) ^ 1).toByte
    assert(stubbed(drift))
    // Bad sync on the frame.
    val sync = good.clone(); sync(42) = 0x7f.toByte
    assert(stubbed(sync))
  }

  // ------------------------------------------------------------ JPEG tier

  test("JPEG closed loop: parse(make(id)) matches the doc_id formulas for 200 ids") {
    for (id <- 0L until 200L) {
      val (w, h) = ((8 * (1 + id % 12)).toInt, (8 * (1 + id % 10)).toInt)
      val payload = Multimodal.makeJpeg(w, h, id)
      val (p, sum) = Multimodal.parseJpegPixels(payload).get
      assert((p.format, p.width, p.height, p.n_channels) == (("jpeg", w, h, 1)), s"id=$id")
      val nBlocks = (w / 8) * (h / 8)
      val want = 64L * (0 until nBlocks).map(b => (id + b) % 256).sum
      assert(sum == want, s"id=$id")
      assert(Multimodal.parseMedia(payload).get.format == "jpeg", s"id=$id")
    }
  }

  test("JPEG restart markers: RSTn + DC predictor reset decode to the identical pixel sum") {
    for (id <- Seq(0L, 7L, 200L, 255L)) {
      val (w, h) = (64, 56) // 56 blocks -> several restart intervals
      val plain = Multimodal.makeJpeg(w, h, id)
      val rst = Multimodal.makeJpeg(w, h, id, restartEvery = 5)
      // The restart stream genuinely contains RST markers and a DRI.
      assert(rst.length > plain.length)
      assert(rst.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xdd))
      assert(rst.sliding(2).count(p => (p(0) & 0xff) == 0xff && ((p(1) & 0xff) & 0xf8) == 0xd0) >= 10)
      assert(Multimodal.parseJpegPixels(rst).get == Multimodal.parseJpegPixels(plain).get, s"id=$id")
    }
  }

  test("JPEG decoder vs an independent encoder: ImageIO grayscale gradient (real AC coefficients)") {
    // The closed loop's flat blocks are DC-only; the JDK's JPEG encoder
    // (libjpeg under ImageIO) produces real quant tables and dense AC
    // runs. Reference = ImageIO's own decode of the same bytes; IDCT
    // implementations may legally differ by ~1/sample, so the sums are
    // compared within 1 per pixel.
    val (w, h) = (120, 88)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 2 + y * 3 + (x * y) % 31) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val (p, ourSum) = Multimodal.parseJpegPixels(bytes).get
    assert((p.format, p.width, p.height, p.n_channels) == (("jpeg", w, h, 1)))
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var refSum = 0L
    for (y <- 0 until h; x <- 0 until w) refSum += back.getRaster.getSample(x, y, 0)
    assert(math.abs(ourSum - refSum) <= w.toLong * h,
      s"ourSum=$ourSum refSum=$refSum diff=${ourSum - refSum}")
  }

  test("JPEG decoder: ImageIO color (YCbCr, subsampled MCU loop) lands on the predicted component sums") {
    // A flat RGB color: every Y/Cb/Cr sample should decode to the
    // rounded YCbCr transform of (200, 120, 40) within quantization
    // noise. This exercises the 3-component interleaved MCU walk with
    // the JDK encoder's default chroma subsampling.
    val (w, h) = (32, 32)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (200 << 16) | (120 << 8) | 40)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val (p, sum) = Multimodal.parseJpegPixels(bos.toByteArray).get
    assert((p.format, p.width, p.height, p.n_channels) == (("jpeg", w, h, 3)))
    // Component grids: Y at w*h; Cb/Cr at ceil(w/hs)*ceil(h/vs) for the
    // encoder's chosen subsampling - recover the grid size from the SOF
    // the encoder actually wrote rather than assuming 4:2:0.
    val (yN, cN) = {
      val b = bos.toByteArray
      var o = 2
      var dims: Option[(Int, Int)] = None
      while (dims.isEmpty) {
        val m = b(o + 1) & 0xff
        val len = ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
        if (m == 0xc0) {
          val hs = (b(o + 11) & 0xff) >> 4; val vs = b(o + 11) & 0x0f
          val hMax = (0 until 3).map(i => (b(o + 11 + 3 * i) & 0xff) >> 4).max
          val vMax = (0 until 3).map(i => b(o + 11 + 3 * i) & 0x0f).max
          val cW = (w * ((b(o + 14) & 0xff) >> 4) + hMax - 1) / hMax
          val cH = (h * (b(o + 14) & 0x0f) + vMax - 1) / vMax
          dims = Some((w * hs / hMax * (h * vs / vMax), cW * cH))
        }
        o += 2 + len
      }
      dims.get
    }
    val expY = math.round(0.299 * 200 + 0.587 * 120 + 0.114 * 40)
    val expCb = math.round(128 - 0.168736 * 200 - 0.331264 * 120 + 0.5 * 40)
    val expCr = math.round(128 + 0.5 * 200 - 0.418688 * 120 - 0.081312 * 40)
    val expected = yN.toLong * expY + cN.toLong * (expCb + expCr)
    val tol = 4L * (yN + 2L * cN)
    assert(math.abs(sum - expected) <= tol, s"sum=$sum expected=$expected tol=$tol")
  }

  test("JPEG padded-0xFF tail: a valid scan ending FF 00 FF D9 decodes (review finding r17)") {
    // When the final entropy byte is a padded 0xFF the encoder must
    // stuff 0x00 after it; aligning to the EOI then lands ON the 0x00.
    // The pre-fix decoder rejected exactly this class of valid JPEG.
    // Seed 402 deterministically makes ImageIO produce the tail
    // (searched offline; ImageIO encode is deterministic).
    val (w, h, seed) = (24, 16, 402)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 3 + y * 7 + seed * 13 + (x * y + seed) % 29) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val b = bos.toByteArray
    val n = b.length
    // The premise: the file really ends FF 00 FF D9 (else the test tests
    // nothing — fail loudly so the seed gets re-searched).
    assert((b(n - 4) & 0xff, b(n - 3) & 0xff, b(n - 2) & 0xff, b(n - 1) & 0xff) ==
      ((0xff, 0x00, 0xff, 0xd9)), "premise: scan must end FF 00 FF D9")
    val (p, ourSum) = Multimodal.parseJpegPixels(b).get
    assert((p.width, p.height) == ((w, h)))
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    var refSum = 0L
    for (y <- 0 until h; x <- 0 until w) refSum += back.getRaster.getSample(x, y, 0)
    assert(math.abs(ourSum - refSum) <= w.toLong * h)
  }

  test("progressive JPEG closed loop: three-scan successive approximation equals the baseline decode") {
    for (id <- 0L until 200L) {
      val (w, h) = ((8 * (1 + id % 11)).toInt, (8 * (1 + id % 8)).toInt)
      val prog = Multimodal.makeJpegProgressive(w, h, id)
      // Really SOF2.
      assert(prog.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2), s"id=$id")
      val (p, sum) = Multimodal.parseJpegPixels(prog).get
      assert((p.format, p.width, p.height, p.n_channels) == (("jpeg", w, h, 1)), s"id=$id")
      val nBlocks = (w / 8) * (h / 8)
      assert(sum == 64L * (0 until nBlocks).map(bl => (id + bl) % 256).sum, s"id=$id")
      // And identical to the baseline encoding of the same image.
      assert(sum == Multimodal.parseJpegPixels(Multimodal.makeJpeg(w, h, id)).get._2, s"id=$id")
    }
  }

  test("progressive JPEG vs an independent encoder: ImageIO MODE_DEFAULT gray and color round-trips") {
    // libjpeg's default progressive script uses spectral selection AND
    // successive approximation with EOBRUN-heavy AC scans - the full
    // refinement path. Reference = ImageIO's own decode of the bytes.
    def encodeProgressive(img: java.awt.image.BufferedImage): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.flush(); writer.dispose()
      bos.toByteArray
    }
    val (w, h) = (72, 56)
    val gray = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gray.getRaster.setSample(x, y, 0, (x * 5 + y * 2 + (x * y) % 23) % 256)
    val gb = encodeProgressive(gray)
    assert(gb.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
      "premise: encoder must emit SOF2")
    val (gp, gSum) = Multimodal.parseJpegPixels(gb).get
    assert((gp.width, gp.height, gp.n_channels) == ((w, h, 1)))
    val gBack = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gb))
    var gRef = 0L
    for (y <- 0 until h; x <- 0 until w) gRef += gBack.getRaster.getSample(x, y, 0)
    assert(math.abs(gSum - gRef) <= w.toLong * h, s"gray: $gSum vs $gRef")
    // Color: interleaved DC scans + per-component AC scans + subsampling.
    val rgb = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      rgb.setRGB(x, y, ((x * 7 % 256) << 16) | ((y * 11 % 256) << 8) | ((x + y) % 256))
    val cb = encodeProgressive(rgb)
    assert(cb.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2))
    val (cp, cSum) = Multimodal.parseJpegPixels(cb).get
    assert((cp.width, cp.height, cp.n_channels) == ((w, h, 3)))
    // No per-component reference decode without color-space inversion;
    // deterministic + bounded is the structural check here (the gray
    // case above pins the numeric path).
    val total = w.toLong * h + 2L * ((w + 1) / 2) * ((h + 1) / 2) * 4 // >= actual sample count
    assert(cSum > 0 && cSum < 255L * total)
    assert(Multimodal.parseJpegPixels(cb).get._2 == cSum)
  }

  test("JPEG adversarial edges: progressive, 12-bit, bomb dims, truncation, missing EOI") {
    val good = Multimodal.makeJpeg(24, 16, 3L)
    def stubbed(b: Array[Byte]): Boolean =
      Multimodal.decode(MediaRecord(9L, b, "image")) ==
        Multimodal.decodeStub(MediaRecord(9L, b, "image"))
    assert(!stubbed(good))
    // Fixed layout: SOI 2 + DQT 69 -> SOF0 marker at 71, payload at 75.
    assert((good(71) & 0xff) == 0xff && (good(72) & 0xff) == 0xc0)
    // SOF0 patched to SOF2: the baseline scan header (Ss=0, Se=63) is
    // invalid as a progressive scan (DC scans need Se=0) -> stub. (Real
    // progressive streams are DECODED - see the dedicated specs.)
    val prog = good.clone(); prog(72) = 0xc2.toByte
    assert(stubbed(prog))
    val deep = good.clone(); deep(75) = 12.toByte // 12-bit precision
    assert(stubbed(deep))
    val bomb = good.clone() // 65535x65535 declared: rejected before decode
    bomb(76) = 0xff.toByte; bomb(77) = 0xff.toByte
    bomb(78) = 0xff.toByte; bomb(79) = 0xff.toByte
    assert(stubbed(bomb))
    assert(stubbed(good.dropRight(2)))  // missing EOI
    assert(stubbed(good.dropRight(12))) // truncated scan
    assert(stubbed(good.take(80)))      // truncated headers
  }

  test("streaming decode parity: the codec seam under MemoryStream microbatches") {
    // The decode tiers are pure per-record maps, so they must compose
    // with Structured Streaming unchanged: generate+decode inside
    // mapPartitions over an unbounded source, results identical to the
    // batch path regardless of how ids split across microbatches.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ms = MemoryStream[Long](spark)
    val decoded = ms.toDS().mapPartitions(_.map { id =>
      val (gp, gSum) = Multimodal.parseGifPixels(
        Multimodal.makeGif((1 + id % 19).toInt, (1 + id % 23).toInt, id)).get
      val (jp, jSum) = Multimodal.parseJpegPixels(
        Multimodal.makeJpeg((8 * (1 + id % 12)).toInt, (8 * (1 + id % 10)).toInt, id)).get
      (id, gp.width, gp.height, gSum, jp.width, jSum)
    }).toDF("id", "gw", "gh", "gsum", "jw", "jsum")
    val q = decoded.writeStream.format("memory").queryName("codec_stream")
      .outputMode("append").start()
    ms.addData(0L until 37L: _*) // uneven microbatch split on purpose
    q.processAllAvailable()
    ms.addData(37L until 100L: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("codec_stream").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4), r.getLong(5)))
      .sortBy(_._1).toSeq
    val want = (0L until 100L).map { id =>
      val (gp, gSum) = Multimodal.parseGifPixels(
        Multimodal.makeGif((1 + id % 19).toInt, (1 + id % 23).toInt, id)).get
      val (jp, jSum) = Multimodal.parseJpegPixels(
        Multimodal.makeJpeg((8 * (1 + id % 12)).toInt, (8 * (1 + id % 10)).toInt, id)).get
      (id, gp.width, gp.height, gSum, jp.width, jSum)
    }
    assert(got == want)
  }

  // ------------------------------------------------------ AVI/MJPEG tier

  test("AVI closed loop: parse(make(id)) matches the doc_id formulas for 200 ids") {
    for (id <- 0L until 200L) {
      val (w, h) = ((8 * (1 + id % 9)).toInt, (8 * (1 + id % 7)).toInt)
      val nf = (1 + id % 3).toInt
      val payload = Multimodal.makeAvi(w, h, nf, id)
      val (p, sum) = Multimodal.parseAviPixels(payload).get
      assert((p.format, p.width, p.height, p.n_channels) == (("avi", w, h, 1)), s"id=$id")
      assert((p.n_samples, p.duration_ms) == ((nf.toLong, nf * 40L)), s"id=$id")
      val nb = (w / 8) * (h / 8)
      val want = 64L * nb * (0 until nf).map(f => (id + f) % 256).sum
      assert(sum == want, s"id=$id")
      // RIFF dispatch: AVI routes to the video parser, WAV still to audio.
      assert(Multimodal.parseMedia(payload).get.format == "avi", s"id=$id")
      assert(Multimodal.parseMedia(Multimodal.makeWav(1, 8000, 100, id)).get.format == "wav")
    }
  }

  test("AVI decoder: dropped, duplicated, and dim-drifted frames are all rejected") {
    val (w, h, nf, seed) = (32, 24, 3, 9L)
    val good = Multimodal.makeAvi(w, h, nf, seed)
    assert(Multimodal.parseAviPixels(good).isDefined)
    // Frame-count drift: splice avih's dwTotalFrames (avih body starts
    // at 32 in makeAvi's fixed layout — RIFF 12 + LIST header 12 + chunk
    // header 8; dwTotalFrames = body+16 = 48) to claim more/fewer frames
    // than movi holds.
    assert((good(48) & 0xff) == nf) // layout sanity before splicing
    val claim4 = good.clone(); claim4(48) = 4.toByte
    assert(Multimodal.parseAviPixels(claim4).isEmpty)
    val claim2 = good.clone(); claim2(48) = 2.toByte
    assert(Multimodal.parseAviPixels(claim2).isEmpty)
    // Dim drift: a movi whose frames disagree with avih (dwWidth at
    // body+32 = 64, dwHeight at body+36 = 68). Frames are 16x16; avih
    // is patched to claim 24x24.
    val drift = Multimodal.makeAvi(16, 16, 2, seed)
    assert((drift(64) & 0xff) == 16 && (drift(68) & 0xff) == 16)
    val patched = drift.clone()
    patched(64) = 24.toByte
    patched(68) = 24.toByte
    assert(Multimodal.parseAviPixels(patched).isEmpty)
  }

  test("AVI adversarial edges: truncation, envelope mismatch, non-JPEG frames, bomb headers") {
    val good = Multimodal.makeAvi(24, 16, 2, 5L)
    def stubbed(b: Array[Byte]): Boolean =
      Multimodal.decode(MediaRecord(9L, b, "video")) ==
        Multimodal.decodeStub(MediaRecord(9L, b, "video"))
    assert(!stubbed(good))
    assert(stubbed(good.take(100)))     // truncated inside hdrl/movi
    assert(stubbed(good.dropRight(7)))  // truncated final frame
    // RIFF size envelope mismatch.
    val env = good.clone(); env(4) = (env(4) ^ 1).toByte
    assert(stubbed(env))
    // Corrupt a frame's JPEG SOI (first 00dc payload) -> frame not a JPEG.
    val soi = good.indexOfSlice(Seq[Byte]('0', '0', 'd', 'c'))
    assert(soi > 0)
    val badFrame = good.clone(); badFrame(soi + 8) = 0.toByte
    assert(stubbed(badFrame))
    // avih declaring a raster-cap-busting frame volume with a valid
    // envelope: rejected before any frame decode (dwTotalFrames at 48).
    val bomb = good.clone()
    bomb(48) = 0xff.toByte; bomb(49) = 0xff.toByte; bomb(50) = 0xff.toByte
    assert(stubbed(bomb))
    // decode() maps video: n_frames carries the frame count.
    val f = Multimodal.decode(MediaRecord(1L, good, "video"))
    assert((f.width, f.height, f.n_frames) == ((24, 16, 2)))
  }
}
