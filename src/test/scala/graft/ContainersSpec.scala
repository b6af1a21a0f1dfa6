package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Containers
import graft.engine.Containers._

/** The container tier's parser contracts: strict walks that either parse
  * fully or return None (never throw), proven against the JDK's
  * INDEPENDENT gzip codec where one exists (GZIPOutputStream writes real
  * dynamic-Huffman deflate — a second implementation the stored-block
  * generator can't reach), plus golden byte layouts and adversarial
  * corruption for tar/WARC where the JDK ships no codec.
  */
class ContainersSpec extends AnyFunSuite {

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  // ------------------------------------------------------------- gzip

  test("oracle constants match the writers (drift breaks q_container_warc)") {
    assert(warcResponseOverhead == 268)
    assert(warcInfoRecordLen == 166)
  }

  test("JDK GZIPOutputStream (real deflate) parses through the member walk") {
    val data = Array.tabulate[Byte](10000)(i => ((i * 7 + 3) % 256).toByte)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(data); gz.close()
    val members = parseGzipMembers(bos.toByteArray).get
    assert(members.size == 1)
    assert(members.head.rawLen == data.length.toLong)
    assert(members.head.byteSum == data.map(_ & 0xff).map(_.toLong).sum)
  }

  test("concatenated JDK members parse as a multi-member stream") {
    val bos = new java.io.ByteArrayOutputStream()
    val parts = Seq("first member", "second, longer member body", "3")
    parts.foreach { p =>
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(ascii(p)); gz.close()
    }
    val members = parseGzipMembers(bos.toByteArray).get
    assert(members.map(_.rawLen) == parts.map(_.length.toLong))
  }

  test("gzipMember (stored framing) reads back through the JDK's GZIPInputStream") {
    val data = Array.tabulate[Byte](70000)(i => (i % 251).toByte) // 2 stored blocks
    val doc = gzipMember(data) ++ gzipMember(ascii("tail member"))
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(doc))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    // GZIPInputStream concatenates members natively — total must match.
    assert(out.toByteArray.toSeq == (data ++ ascii("tail member")).toSeq)
  }

  test("all four optional header fields honored, FHCRC verified") {
    val data = ascii("payload under a maximal header")
    val defl = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true)
    defl.setInput(data); defl.finish()
    val dbuf = new Array[Byte](data.length + 64)
    val dlen = defl.deflate(dbuf); defl.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x1f); out.write(0x8b); out.write(8)
    out.write(2 | 4 | 8 | 16) // FHCRC | FEXTRA | FNAME | FCOMMENT
    out.write(Array[Byte](0, 0, 0, 0), 0, 4); out.write(0); out.write(255)
    out.write(4); out.write(0) // XLEN = 4
    out.write(ascii("ABCD"), 0, 4)
    out.write(ascii("name.txt"), 0, 8); out.write(0)
    out.write(ascii("a comment"), 0, 9); out.write(0)
    val hdr = out.toByteArray
    val crc = new java.util.zip.CRC32(); crc.update(hdr)
    out.write((crc.getValue & 0xff).toInt); out.write(((crc.getValue >> 8) & 0xff).toInt)
    out.write(dbuf, 0, dlen)
    val dcrc = new java.util.zip.CRC32(); dcrc.update(data)
    val c = dcrc.getValue
    out.write((c & 0xff).toInt); out.write(((c >> 8) & 0xff).toInt)
    out.write(((c >> 16) & 0xff).toInt); out.write(((c >> 24) & 0xff).toInt)
    val n = data.length
    out.write(n & 0xff); out.write((n >> 8) & 0xff)
    out.write((n >> 16) & 0xff); out.write((n >> 24) & 0xff)
    val members = parseGzipMembers(out.toByteArray).get
    assert(members.head.fname.contains("name.txt"))
    assert(members.head.rawLen == data.length.toLong)
    // ...and a WRONG FHCRC is rejected
    val bad = out.toByteArray.clone()
    bad(hdr.length) = (bad(hdr.length) ^ 0x01).toByte
    assert(parseGzipMembers(bad).isEmpty)
  }

  test("gzip adversarial edges all fall to None, never throw") {
    val good = makeGzipDoc(42L)
    assert(parseGzipMembers(good).isDefined)
    assert(parseGzipMembers(Array.emptyByteArray).isEmpty)
    assert(parseGzipMembers(ascii("not gzip at all")).isEmpty)
    val badMagic = good.clone(); badMagic(0) = 0x1e
    assert(parseGzipMembers(badMagic).isEmpty)
    val badCm = good.clone(); badCm(2) = 9 // only deflate (8) is legal
    assert(parseGzipMembers(badCm).isEmpty)
    val badFlg = good.clone(); badFlg(3) = 0x40 // reserved bit
    assert(parseGzipMembers(badFlg).isEmpty)
    assert(parseGzipMembers(good.dropRight(1)).isEmpty) // truncated trailer
    assert(parseGzipMembers(good.dropRight(9)).isEmpty) // truncated deflate
    val badCrc = good.clone() // first member: 10 hdr + 5 stored + L, CRC next
    val l0 = 50 + (42 % 200)
    badCrc(10 + 5 + l0) = (badCrc(10 + 5 + l0) ^ 0x55).toByte
    assert(parseGzipMembers(badCrc).isEmpty)
    val badIsize = good.clone()
    badIsize(10 + 5 + l0 + 4) = (badIsize(10 + 5 + l0 + 4) ^ 0x55).toByte
    assert(parseGzipMembers(badIsize).isEmpty)
    val trailingGarbage = good ++ ascii("x")
    assert(parseGzipMembers(trailingGarbage).isEmpty)
    // corrupt a CONTENT byte: stored blocks carry it verbatim, so only
    // the CRC-32 check can catch it — this is what the trailer is FOR.
    val badByte = good.clone(); badByte(10 + 5) = (badByte(10 + 5) ^ 0x01).toByte
    assert(parseGzipMembers(badByte).isEmpty)
  }

  test("empty member is legal gzip") {
    val members = parseGzipMembers(gzipMember(Array.emptyByteArray)).get
    assert(members.head.rawLen == 0L && members.head.byteSum == 0L)
  }

  // -------------------------------------------------------------- tar

  test("tar round trip: sizes at the block edges, WebDataset grouping") {
    val members = Seq(
      "s/000.txt" -> Array.emptyByteArray, // 0 bytes → 0 data blocks
      "s/000.bin" -> Array.fill[Byte](512)(7), // exactly one block
      "s/001.txt" -> Array.fill[Byte](513)(8), // spills into a second
      "s/001.bin" -> ascii("x"))
    val arch = makeTar(members)
    assert(arch.length == 512 * (4 + 0 + 1 + 2 + 1) + 1024)
    val entries = parseTar(arch).get
    assert(entries.map(_.name) == members.map(_._1))
    assert(entries.map(_.size) == members.map(_._2.length.toLong))
    assert(entries.map(e => sampleKey(e.name)).distinct == Seq("s/000", "s/001"))
    // content round-trips at the reported offsets
    entries.zip(members).foreach { case (e, (_, data)) =>
      assert(arch.slice(e.dataOff, e.dataOff + e.size.toInt).toSeq == data.toSeq)
    }
  }

  test("golden ustar header layout") {
    val h = tarHeader("a.txt", 5L)
    assert(new String(h, 0, 5, "US-ASCII") == "a.txt")
    assert(h(5) == 0)
    assert(new String(h, 100, 7, "US-ASCII") == "0000644") // mode
    assert(new String(h, 124, 11, "US-ASCII") == "00000000005") // size octal
    assert(h(135) == 0)
    assert(h(156) == '0') // regular file
    assert(new String(h, 257, 5, "US-ASCII") == "ustar")
    assert(h(262) == 0 && h(263) == '0' && h(264) == '0')
    // checksum: 6 octal digits, NUL, space — and arithmetically right
    var sum = 0L
    (0 until 512).foreach(i => sum += (if (i >= 148 && i < 156) ' '.toInt else h(i) & 0xff))
    assert(new String(h, 148, 6, "US-ASCII") == f"$sum%06o")
    assert(h(154) == 0 && h(155) == ' ')
  }

  test("ustar prefix field joins onto the name") {
    val arch = makeTar(Seq("f.bin" -> ascii("abc")))
    // hand-patch a prefix and re-checksum
    val prefix = ascii("deep/dir")
    System.arraycopy(prefix, 0, arch, 345, prefix.length)
    java.util.Arrays.fill(arch, 148, 156, ' '.toByte)
    var sum = 0L
    (0 until 512).foreach(i => sum += arch(i) & 0xff)
    System.arraycopy(ascii(f"$sum%06o"), 0, arch, 148, 6)
    arch(154) = 0; arch(155) = ' '
    assert(parseTar(arch).get.head.name == "deep/dir/f.bin")
  }

  test("non-regular entries are walked but not returned") {
    val arch = makeTar(Seq("d/x.txt" -> ascii("hello")))
    // turn the entry into a directory typeflag and re-checksum
    arch(156) = '5'
    java.util.Arrays.fill(arch, 148, 156, ' '.toByte)
    var sum = 0L
    (0 until 512).foreach(i => sum += arch(i) & 0xff)
    System.arraycopy(ascii(f"$sum%06o"), 0, arch, 148, 6)
    arch(154) = 0; arch(155) = ' '
    assert(parseTar(arch).isEmpty) // no regular files left → None
  }

  test("tar adversarial edges all fall to None, never throw") {
    val good = makeTarDoc(9L)
    assert(parseTar(good).isDefined)
    assert(parseTar(Array.emptyByteArray).isEmpty)
    assert(parseTar(new Array[Byte](511)).isEmpty) // short of one block
    val badSum = good.clone(); badSum(0) = (badSum(0) ^ 0x7f).toByte
    assert(parseTar(badSum).isEmpty) // checksum now wrong
    val badSize = good.clone(); badSize(124) = '9' // non-octal digit
    assert(parseTar(badSize).isEmpty)
    val base256 = good.clone(); base256(124) = 0x80.toByte // GNU large-size
    assert(parseTar(base256).isEmpty)
    assert(parseTar(good.dropRight(1)).isEmpty) // ragged tail
    assert(parseTar(good.dropRight(1024)).isEmpty) // missing terminator
    assert(parseTar(good ++ ascii("junk")).isEmpty) // garbage after terminator
    assert(parseTar(good ++ new Array[Byte](512 * 3)).isDefined) // zero padding OK
    val onlyTerminator = new Array[Byte](1024)
    assert(parseTar(onlyTerminator).isEmpty) // empty archive → None
  }

  test("checksum-valid header declaring a ~2 GB size falls out, never overflows") {
    // Review finding (r17 third session, repro'd pre-fix as
    // ArrayIndexOutOfBoundsException): size 017777777777 (Int.MaxValue)
    // made dataBlocks*512 overflow Int and walk to a negative offset.
    val arch = makeTar(Seq("big.bin" -> ascii("tiny")))
    System.arraycopy(ascii("17777777777"), 0, arch, 124, 11)
    arch(135) = 0
    java.util.Arrays.fill(arch, 148, 156, ' '.toByte)
    var sum = 0L
    (0 until 512).foreach(i => sum += arch(i) & 0xff)
    System.arraycopy(ascii(f"$sum%06o"), 0, arch, 148, 6)
    arch(154) = 0; arch(155) = ' '
    assert(parseTar(arch).isEmpty) // None, not a thrown overflow
  }

  // ------------------------------------------------------------- warc

  private def warcRecord(wtype: String, content: Array[Byte]): Array[Byte] = {
    val hdr = s"WARC/1.0\r\nWARC-Type: $wtype\r\nWARC-Record-ID: <urn:test:1>\r\n" +
      s"Content-Length: ${content.length}\r\n\r\n"
    ascii(hdr) ++ content ++ ascii("\r\n\r\n")
  }

  private def httpBlock(body: Array[Byte], declared: Option[Int]): Array[Byte] = {
    val cl = declared.map(v => s"Content-Length: $v\r\n").getOrElse("")
    ascii(s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n$cl\r\n") ++ body
  }

  test("plain WARC walk: mixed record types, body strip, sums") {
    val body = Array.tabulate[Byte](100)(i => (i % 256).toByte)
    val doc = warcRecord("warcinfo", ascii("software: t\r\n")) ++
      warcRecord("response", httpBlock(body, Some(100))) ++
      warcRecord("request", ascii("GET / HTTP/1.1\r\n\r\n"))
    val recs = parseWarc(doc).get
    assert(recs.map(_.warcType) == Seq("warcinfo", "response", "request"))
    assert(recs(1).bodyLen == 100L)
    assert(recs(1).bodySum == body.map(_ & 0xff).map(_.toLong).sum)
    assert(recs(0).bodyLen == 0L) // only responses strip a body
  }

  test("HTTP Content-Length is cross-checked against the actual body") {
    val body = ascii("0123456789")
    val ok = warcRecord("response", httpBlock(body, Some(10)))
    assert(parseWarc(ok).isDefined)
    val lied = warcRecord("response", httpBlock(body, Some(9)))
    assert(parseWarc(lied).isEmpty)
    val undeclared = warcRecord("response", httpBlock(body, None))
    assert(parseWarc(undeclared).get.head.bodyLen == 10L) // CL optional
  }

  test("WARC adversarial edges all fall to None, never throw") {
    val body = ascii("abc")
    val good = warcRecord("response", httpBlock(body, Some(3)))
    assert(parseWarc(good).isDefined)
    assert(parseWarc(Array.emptyByteArray).isEmpty)
    assert(parseWarc(ascii("WARC/0.9\r\n\r\nxx")).isEmpty) // bad version
    assert(parseWarc(good.dropRight(1)).isEmpty) // missing separator byte
    assert(parseWarc(ascii(
      "WARC/1.0\r\nWARC-Type: response\r\n\r\n")).isEmpty) // no Content-Length
    assert(parseWarc(ascii(
      "WARC/1.0\r\nWARC-Type: x\r\nContent-Length: 999\r\n\r\nshort\r\n\r\n")).isEmpty)
    assert(parseWarc(ascii(
      "WARC/1.0\r\nnocolonline\r\nContent-Length: 0\r\n\r\n\r\n\r\n")).isEmpty)
    assert(parseWarc(ascii(
      "WARC/1.0\r\nContent-Length: -1\r\n\r\n\r\n\r\n")).isEmpty)
    // response whose block isn't HTTP at all
    assert(parseWarc(warcRecord("response", ascii("not http"))).isEmpty)
    // Review finding (r17 third session, repro'd pre-fix as
    // NumberFormatException): 20 digits pass the isDigit guard but
    // overflow toLong — must reject by digit count, not throw.
    assert(parseWarc(ascii(
      "WARC/1.0\r\nWARC-Type: x\r\nContent-Length: 99999999999999999999\r\n\r\nzz\r\n\r\n")).isEmpty)
    val lyingHttp = warcRecord("response",
      httpBlockRaw(ascii("abc"), "99999999999999999999"))
    assert(parseWarc(lyingHttp).isEmpty) // same cap on the HTTP header
  }

  private def httpBlockRaw(body: Array[Byte], declared: String): Array[Byte] =
    ascii(s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: $declared\r\n\r\n") ++ body

  test("warc.gz: one record per member enforced; non-gzip rejected") {
    val doc = makeWarcDoc(11L)
    assert(parseWarcGz(doc).isDefined)
    assert(parseWarcGz(warcRecord("warcinfo", ascii("x: y\r\n"))).isEmpty) // plain, not gz
    val two = warcRecord("warcinfo", ascii("a: b\r\n")) ++
      warcRecord("warcinfo", ascii("c: d\r\n"))
    assert(parseWarcGz(gzipMember(two)).isEmpty) // two records in one member
  }

  // -------------------------------------------------------------- zip

  test("zip closed loop: makeZipDoc parses, sizes and sums are the closed forms") {
    for (id <- Seq(0L, 1L, 7L, 103L, 9999L)) {
      val payload = makeZipDoc(id)
      val entries = parseZip(payload).get
      val e = (1 + id % 4).toInt
      assert(entries.size == e)
      val lens = (0 until e).map(m => 40 + (id + 23L * m) % 180)
      assert(entries.map(_.usize) == lens)
      val ndef = (0 until e).count(m => (id + m) % 2 == 0)
      assert(entries.count(_.method == 8) == ndef)
      assert(payload.length.toLong == lens.sum + 5 * ndef + 96L * e + 22)
      val total = lens.sum.toInt
      val expectSum = (0 until total).map(i => ((id + i) % 256)).sum
      assert(entries.map(_.byteSum).sum == expectSum)
    }
  }

  test("JDK ZipOutputStream (real deflate + data descriptors) parses through parseZip") {
    val bos = new java.io.ByteArrayOutputStream()
    val zo = new java.util.zip.ZipOutputStream(bos)
    val members = Seq(
      "a/first.txt" -> Array.tabulate[Byte](10000)(i => ((i * 7 + 3) % 256).toByte),
      "second.bin" -> Array.tabulate[Byte](333)(i => (i % 11).toByte),
      "empty.dat" -> Array.emptyByteArray)
    members.foreach { case (name, data) =>
      val ze = new java.util.zip.ZipEntry(name)
      ze.setTime(0L)
      zo.putNextEntry(ze); zo.write(data); zo.closeEntry()
    }
    zo.close()
    val entries = parseZip(bos.toByteArray).get
    assert(entries.map(_.name) == members.map(_._1))
    assert(entries.map(_.usize) == members.map(_._2.length.toLong))
    assert(entries.map(_.byteSum) ==
      members.map(_._2.map(b => (b & 0xff).toLong).sum))
    assert(entries.forall(_.method == 8)) // JDK default is DEFLATED
  }

  test("JDK ZipOutputStream STORED mode (no descriptor) parses through parseZip") {
    val data = ascii("stored member, exact local sizes")
    val bos = new java.io.ByteArrayOutputStream()
    val zo = new java.util.zip.ZipOutputStream(bos)
    val ze = new java.util.zip.ZipEntry("s.txt")
    ze.setMethod(java.util.zip.ZipEntry.STORED)
    ze.setSize(data.length); ze.setCompressedSize(data.length)
    val c = new java.util.zip.CRC32(); c.update(data); ze.setCrc(c.getValue)
    ze.setTime(0L)
    zo.putNextEntry(ze); zo.write(data); zo.closeEntry(); zo.close()
    val entries = parseZip(bos.toByteArray).get
    assert(entries == Seq(ZipEntryP("s.txt", 0, data.length.toLong,
      data.map(b => (b & 0xff).toLong).sum)))
  }

  test("makeZip reads back through the JDK's independent ZipInputStream") {
    val members = Seq(
      ("one.txt", ascii("first content"), false),
      ("two.txt", Array.tabulate[Byte](70000)(i => (i % 251).toByte), true)) // 2 stored blocks
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(makeZip(members)))
    members.foreach { case (name, data, _) =>
      val ze = zin.getNextEntry
      assert(ze.getName == name)
      assert(java.util.Arrays.equals(zin.readAllBytes(), data))
    }
    assert(zin.getNextEntry == null)
  }

  test("zip archive comment is honored; trailing garbage is not") {
    val z = makeZip(Seq(("a.txt", ascii("hello"), false)))
    // Append a comment: patch the EOCD comment-length field.
    val comment = ascii("graft archive comment")
    val withComment = z ++ comment
    withComment(z.length - 2) = (comment.length & 0xff).toByte
    withComment(z.length - 1) = ((comment.length >> 8) & 0xff).toByte
    assert(parseZip(withComment).isDefined)
    assert(parseZip(z ++ ascii("garbage")).isEmpty) // length doesn't match
  }

  test("zip adversarial edges all fall to None, never throw") {
    val z = makeZip(Seq(("a.txt", ascii("hello zip world"), false),
      ("b.txt", ascii("deflated here"), true)))
    assert(parseZip(Array.emptyByteArray).isEmpty)
    assert(parseZip(z.take(z.length - 3)).isEmpty) // truncated EOCD
    assert(parseZip(z.take(30)).isEmpty) // no EOCD at all
    // flip one content byte -> CRC mismatch (content of a.txt starts at 40)
    val crcBad = z.clone(); crcBad(41) = (crcBad(41) ^ 0x20).toByte
    assert(parseZip(crcBad).isEmpty)
    // encrypted flag in the CD entry
    val eocdAt = z.length - 22
    val cdOff = (z(eocdAt + 16) & 0xff) | ((z(eocdAt + 17) & 0xff) << 8) |
      ((z(eocdAt + 18) & 0xff) << 16) | ((z(eocdAt + 19) & 0xff) << 24)
    val enc = z.clone(); enc(cdOff + 8) = 1
    assert(parseZip(enc).isEmpty)
    // unsupported method 12 (bzip2) in CD
    val m12 = z.clone(); m12(cdOff + 10) = 12
    assert(parseZip(m12).isEmpty)
    // zip64 marker: usize = 0xFFFFFFFF in the CD
    val z64 = z.clone()
    (0 until 4).foreach(i => z64(cdOff + 24 + i) = 0xff.toByte)
    assert(parseZip(z64).isEmpty)
    // local-vs-CD name mismatch
    val ren = z.clone(); ren(30) = 'x'.toByte // first local name byte
    assert(parseZip(ren).isEmpty)
  }

  test("zip-bomb declared sizes are rejected BEFORE any inflate") {
    // A CD lying that one small member inflates to > cap: patch usize.
    val z = makeZip(Seq(("a.txt", ascii("tiny"), true)))
    val eocdAt = z.length - 22
    val cdOff = (z(eocdAt + 16) & 0xff) | ((z(eocdAt + 17) & 0xff) << 8) |
      ((z(eocdAt + 18) & 0xff) << 16) | ((z(eocdAt + 19) & 0xff) << 24)
    val cap = ZipUsizeCap + 1
    val bomb = z.clone()
    (0 until 4).foreach(i => bomb(cdOff + 24 + i) = ((cap >> (8 * i)) & 0xff).toByte)
    assert(parseZip(bomb).isEmpty)
  }

  // ------------------------------------------- compressed text shards

  test("codec seam round-trips zstd, lz4, and xz; foreign bytes fall to None") {
    val data = Array.tabulate[Byte](50000)(i => ((i * 13 + 5) % 256).toByte)
    Seq("zstd", "lz4", "xz").foreach { codec =>
      val comp = codecCompress(codec, data)
      assert(!java.util.Arrays.equals(comp, data))
      assert(java.util.Arrays.equals(codecDecompress(codec, comp).get, data))
      assert(codecDecompress(codec, ascii("not a frame of any codec")).isEmpty)
      assert(codecDecompress(codec, comp.take(comp.length / 2)).isEmpty) // truncated
    }
  }

  test("jsonl.zst golden: small id decompresses to the exact line text") {
    val raw = codecDecompress("zstd", makeJsonlZstDoc(1L)).get
    val text = new String(raw, java.nio.charset.StandardCharsets.UTF_8)
    // id 1: r = 2 lines; t_0 = 20 + 1%60 = 21 chars from 'a'+1; t_1 =
    // 20 + (1+13)%60 = 34 chars continuing the run at i = 21.
    val run = Iterator.from(0).map(i => ('a' + ((1 + i) % 26)).toChar)
    val t0 = run.take(21).mkString
    val run2 = Iterator.from(21).map(i => ('a' + ((1 + i) % 26)).toChar)
    val t1 = run2.take(34).mkString
    assert(text ==
      s"""{"id":1,"seq":0,"text":"$t0"}\n{"id":1,"seq":1,"text":"$t1"}\n""")
  }

  test("gzip decompression bomb is rejected at the cap, not inflated to completion") {
    // ~280 MiB of zeros deflates to ~280 KB; the walk must stop at
    // ZipUsizeCap instead of materializing the whole raster.
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    val chunk = new Array[Byte](1 << 20)
    (0 until 280).foreach(_ => gz.write(chunk))
    gz.close()
    val bomb = bos.toByteArray
    assert(bomb.length < (1 << 20)) // really a bomb, not a big file
    assert(parseGzipMembers(bomb).isEmpty)
    // The sniff stays bounded too: the capped first-member walk refuses,
    // so the blob classifies by magic alone as plain gzip — no OOM.
    assert(detectContainer(bomb).contains("gzip"))
  }

  test("detectContainer: magic dispatch across all seven formats; foreign bytes fall out") {
    assert(detectContainer(makeGzipDoc(4L)).contains("gzip"))
    assert(detectContainer(makeTarDoc(3L)).contains("tar"))
    assert(detectContainer(makeWarcDoc(2L)).contains("warc")) // two-stage sniff
    assert(detectContainer(makeZipDoc(1L)).contains("zip"))
    assert(detectContainer(codecCompress("zstd", ascii("abc"))).contains("zstd"))
    assert(detectContainer(codecCompress("xz", ascii("abc"))).contains("xz"))
    assert(detectContainer(codecCompress("lz4", ascii("abc"))).contains("lz4"))
    // A gzip whose member is NOT a WARC record stays "gzip".
    assert(detectContainer(gzipMember(ascii("WARC/0.9 nope"))).contains("gzip"))
    assert(detectContainer(Array.emptyByteArray).isEmpty)
    assert(detectContainer(ascii("plain text, no container")).isEmpty)
    assert(detectContainer(new Array[Byte](600)).isEmpty) // zeros: no ustar magic
  }

  test("makeWarcDoc inflates through the JDK and holds one WARC/1.0 per member") {
    val doc = makeWarcDoc(12L) // even id → warcinfo + 1 + 12%3 = 1 response... r = 1 + 12%3 = 1
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(doc))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    val text = new String(out.toByteArray, java.nio.charset.StandardCharsets.ISO_8859_1)
    val expected = parseWarcGz(doc).get.size
    assert(text.sliding(8).count(_ == "WARC/1.0") == expected)
  }
}
