package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Archive/container tier: the formats a 100-TB training corpus actually
  * ships in. Web text arrives as Common Crawl WARC — one gzip member per
  * record (`.warc.gz`); multimodal samples arrive as WebDataset tar
  * shards (sibling files `key.jpg` / `key.txt` / `key.json` grouped by
  * basename key); and everything else is `.jsonl.gz` / multi-member gzip.
  * This file implements REAL pure-JVM parsers for all three — gzip
  * member walk over `java.util.zip.Inflater` with per-member CRC-32 and
  * ISIZE verification, the POSIX ustar header walk with checksum
  * verification and WebDataset grouping, and the WARC/1.0 record grammar
  * with the embedded HTTP response parse — no external jar.
  *
  * Like the codec tier (Multimodal.scala), each format is graded by an
  * ORACLE-GRADED CLOSED LOOP: the engine generates payloads from doc_id
  * formulas (deflate framed as STORED blocks so compressed sizes are
  * closed-form; content bytes are `(doc_id + i) mod 256` so content sums
  * are the same cycle-split arithmetic DuckDB already predicts for the
  * PNG/GIF/JPEG keys), parses them back with the real byte parsers, and
  * DuckDB independently predicts every emitted column. A bit wrong in
  * either the writer's layout or the parser's offsets breaks the hash.
  * The REALLY-compressed path (dynamic-Huffman deflate) is proven in
  * specs against the JDK's independent GZIPOutputStream/GZIPInputStream.
  *
  * Parsers never throw on foreign bytes — every structural violation
  * (bad magic, reserved FLG bits, CRC/ISIZE mismatch, tar checksum or
  * non-octal size, short WARC block) returns None, mirroring the decode
  * seam's never-throws contract.
  *
  * Scale notes (100 TB): all three keys are map-only — generation and
  * parse happen inside mapPartitions, payloads never leave the executor,
  * no shuffle beyond the initial repartition. Real corpus files would
  * stream through `spark.sql.files.maxPartitionBytes`-bounded tasks the
  * same way; per-record gzip members (the WARC convention) are exactly
  * what makes a 100-TB `.warc.gz` corpus splittable at record granularity.
  */
object Containers {
  import Tables._
  type Q = (SparkSession, String) => DataFrame

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32u(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  // ================================================================ gzip

  /** One inflated gzip member: uncompressed length, sum of uncompressed
    * byte values, and the optional FNAME header field.
    */
  final case class GzipMember(rawLen: Long, byteSum: Long, fname: Option[String])

  /** REAL multi-member gzip walk (RFC 1952): per member a strict header
    * parse (magic, CM=8, reserved FLG bits zero, FEXTRA/FNAME/FCOMMENT/
    * FHCRC all honored — FHCRC verified against the low 16 bits of the
    * header CRC-32), raw-deflate inflation via `Inflater(nowrap)`, then
    * the 8-byte trailer verified: CRC-32 of the inflated bytes AND
    * ISIZE ≡ length mod 2^32. Members repeat to end-of-buffer — the
    * `.warc.gz` / concatenated-`.gz` convention. Any violation → None.
    */
  def parseGzipMembers(b: Array[Byte]): Option[Seq[GzipMember]] =
    walkGzipMembers(b).map(_.map { case (data, fname) =>
      var sum = 0L
      var i = 0
      while (i < data.length) { sum += data(i) & 0xff; i += 1 }
      GzipMember(data.length.toLong, sum, fname)
    })

  /** The ONE member walk both public faces derive from (review finding
    * r17 third session: two parallel copies of the strict RFC 1952 walk
    * would silently diverge under future fixes). Returns each member's
    * inflated bytes + FNAME, or None on any violation. Total inflated
    * output is capped at [[ZipUsizeCap]] (decompression-bomb discipline,
    * same as the ZIP walk — review finding r17 fourth session), and
    * `maxMembers` lets a sniffer stop after the first member instead of
    * inflating a whole archive to read 8 bytes.
    */
  private def walkGzipMembers(b: Array[Byte],
      maxMembers: Int = Int.MaxValue): Option[Seq[(Array[Byte], Option[String])]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Option[String])]
    var total = 0L
    var o = 0
    while (o < b.length && out.length < maxMembers) {
      if (o + 10 > b.length) return None
      if ((b(o) & 0xff) != 0x1f || (b(o + 1) & 0xff) != 0x8b ||
        (b(o + 2) & 0xff) != 8) return None
      val flg = b(o + 3) & 0xff
      if ((flg & 0xe0) != 0) return None // reserved bits
      var p = o + 10
      if ((flg & 4) != 0) { // FEXTRA
        if (p + 2 > b.length) return None
        val xlen = le16(b, p)
        p += 2 + xlen
        if (p > b.length) return None
      }
      var fname: Option[String] = None
      if ((flg & 8) != 0) { // FNAME (NUL-terminated ISO-8859-1)
        val start = p
        while (p < b.length && b(p) != 0) p += 1
        if (p >= b.length) return None
        fname = Some(new String(b, start, p - start,
          java.nio.charset.StandardCharsets.ISO_8859_1))
        p += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT
        while (p < b.length && b(p) != 0) p += 1
        if (p >= b.length) return None
        p += 1
      }
      if ((flg & 2) != 0) { // FHCRC = low 16 bits of CRC32(header so far)
        if (p + 2 > b.length) return None
        val hc = new java.util.zip.CRC32()
        hc.update(b, o, p - o)
        if ((hc.getValue & 0xffffL).toInt != le16(b, p)) return None
        p += 2
      }
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(b, p, b.length - p)
        val acc = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val n =
            try inf.inflate(buf)
            catch { case _: java.util.zip.DataFormatException => return None }
          if (n == 0) {
            // A raw-deflate stream that exhausts input without BFINAL is
            // truncated; needsDictionary cannot legally occur in gzip.
            if (inf.needsInput() || inf.needsDictionary()) return None
          } else {
            acc.write(buf, 0, n)
            if (total + acc.size() > ZipUsizeCap) return None // bomb cap
          }
        }
        val data = acc.toByteArray
        val trailerAt = p + inf.getBytesRead.toInt
        if (trailerAt + 8 > b.length) return None
        val crc = new java.util.zip.CRC32()
        crc.update(data)
        if (le32u(b, trailerAt) != crc.getValue) return None
        if (le32u(b, trailerAt + 4) != (data.length.toLong & 0xffffffffL)) return None
        out += ((data, fname))
        total += data.length
        o = trailerAt + 8
      } finally inf.end()
    }
    if (out.isEmpty) None else Some(out.toSeq)
  }

  /** Raw deflate framed as STORED blocks (RFC 1951 §3.2.4): per
    * ≤65535-byte block a 5-byte header + the data. Closed-form sized —
    * `data + 5·ceil(data/65535)` — which is what lets DuckDB predict
    * whole-archive byte sizes; readers still run the real Inflater
    * (stored blocks are real deflate). Same framing as the PNG tier's
    * zlibStored, minus the zlib wrapper gzip doesn't use.
    */
  def deflateStored(data: Array[Byte]): Array[Byte] = {
    val blocks = math.max(1, (data.length + 65534) / 65535)
    val out = new Array[Byte](data.length + 5 * blocks)
    var (src, dst) = (0, 0)
    var blk = 0
    while (blk < blocks) {
      val n = math.min(65535, data.length - src)
      out(dst) = (if (blk == blocks - 1) 1 else 0).toByte // BFINAL
      out(dst + 1) = (n & 0xff).toByte
      out(dst + 2) = ((n >> 8) & 0xff).toByte
      out(dst + 3) = (~n & 0xff).toByte
      out(dst + 4) = ((~n >> 8) & 0xff).toByte
      System.arraycopy(data, src, out, dst + 5, n)
      src += n; dst += 5 + n; blk += 1
    }
    out
  }

  /** One gzip member around `data`: 10-byte header (MTIME 0, XFL 0,
    * OS 255 "unknown"), optional FNAME, stored-deflate body, CRC-32 +
    * ISIZE trailer. Size without fname = 23 + data + 5·(ceil(data/65535)−1).
    */
  def gzipMember(data: Array[Byte], fname: Option[String] = None): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x1f); out.write(0x8b); out.write(8)
    out.write(if (fname.isDefined) 8 else 0)
    out.write(0); out.write(0); out.write(0); out.write(0) // MTIME
    out.write(0); out.write(255) // XFL, OS
    fname.foreach { n =>
      out.write(n.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)); out.write(0)
    }
    val body = deflateStored(data)
    out.write(body, 0, body.length)
    val crc = new java.util.zip.CRC32()
    crc.update(data)
    val c = crc.getValue
    out.write((c & 0xff).toInt); out.write(((c >> 8) & 0xff).toInt)
    out.write(((c >> 16) & 0xff).toInt); out.write(((c >> 24) & 0xff).toInt)
    val n = data.length.toLong
    out.write((n & 0xff).toInt); out.write(((n >> 8) & 0xff).toInt)
    out.write(((n >> 16) & 0xff).toInt); out.write(((n >> 24) & 0xff).toInt)
    out.toByteArray
  }

  /** Graded gzip document: k = 1 + id%4 members, member m holding
    * L_m = 50 + (id + 17m) mod 200 content bytes; content bytes continue
    * the single run `(id + i) mod 256` ACROSS members so the total sum
    * stays one cycle-split formula. Member size = 23 + L_m (single
    * stored block, no optional fields) ⇒ file size = 23k + ΣL_m.
    */
  def makeGzipDoc(id: Long): Array[Byte] = {
    val k = (1 + id % 4).toInt
    val out = new java.io.ByteArrayOutputStream()
    var i = 0L
    var m = 0
    while (m < k) {
      val len = (50 + (id + 17L * m) % 200).toInt
      val data = new Array[Byte](len)
      var j = 0
      while (j < len) { data(j) = ((id + i) % 256).toByte; i += 1; j += 1 }
      val member = gzipMember(data)
      out.write(member, 0, member.length)
      m += 1
    }
    out.toByteArray
  }

  // ================================================================= tar

  /** One regular-file tar entry: full name (ustar prefix applied), size,
    * and the data offset inside the archive buffer.
    */
  final case class TarEntry(name: String, size: Long, dataOff: Int)

  private def octal(b: Array[Byte], off: Int, len: Int): Option[Long] = {
    // Leading spaces allowed; digits; terminated by NUL/space or field end.
    // Base-256 (GNU large-size, high bit set) deliberately rejected —
    // adversarial inputs must fall out, not silently misparse.
    if ((b(off) & 0x80) != 0) return None
    var i = off
    val end = off + len
    while (i < end && b(i) == ' ') i += 1
    var v = 0L
    var digits = 0
    while (i < end && b(i) >= '0' && b(i) <= '7') { v = v * 8 + (b(i) - '0'); i += 1; digits += 1 }
    while (i < end && (b(i) == 0 || b(i) == ' ')) i += 1
    if (digits == 0 || i != end && b(i) != 0) None else Some(v)
  }

  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var n = 0
    while (n < len && b(off + n) != 0) n += 1
    new String(b, off, n, java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** REAL POSIX ustar walk: 512-byte headers (name / octal size / octal
    * mtime / checksum / typeflag / magic / prefix), data rounded up to
    * 512-byte blocks, terminated by two zero blocks (any further zero
    * padding tolerated — tar blocks archives to a blocking factor). The
    * header checksum is VERIFIED: unsigned byte sum with the checksum
    * field read as spaces. Non-regular entries (dirs, links, PAX
    * headers) are walked but only typeflag '0'/NUL regular files are
    * returned. Any violation — bad checksum, non-octal size, data past
    * the buffer, garbage after the terminator — returns None.
    */
  def parseTar(b: Array[Byte]): Option[Seq[TarEntry]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[TarEntry]
    var o = 0
    def zeroBlock(off: Int): Boolean = {
      var i = 0
      while (i < 512) { if (b(off + i) != 0) return false; i += 1 }
      true
    }
    while (true) {
      if (o + 512 > b.length) return None // no terminator reached
      if (zeroBlock(o)) {
        if (o + 1024 > b.length || !zeroBlock(o + 512)) return None
        var t = o + 1024
        while (t + 512 <= b.length && zeroBlock(t)) t += 512
        if (t != b.length) return None
        return if (out.isEmpty) None else Some(out.toSeq)
      }
      // Header checksum: unsigned sum with bytes 148..155 as spaces.
      val stored = octal(b, o + 148, 8).getOrElse(return None)
      var sum = 0L
      var i = 0
      while (i < 512) {
        sum += (if (i >= 148 && i < 156) ' '.toInt else b(o + i) & 0xff)
        i += 1
      }
      if (sum != stored) return None
      val magic = cstr(b, o + 257, 6)
      if (magic != "ustar" && magic != "ustar ") return None
      val size = octal(b, o + 124, 12).getOrElse(return None)
      if (size < 0) return None
      // Long arithmetic throughout: a checksum-valid header declaring a
      // ~2 GB size must fall out on the bounds check, not Int-overflow it
      // into a negative offset and throw (review finding r17 third
      // session — repro'd as ArrayIndexOutOfBoundsException pre-fix).
      val dataBlocks = (size + 511) / 512
      if (o + 512L + dataBlocks * 512L > b.length) return None
      val typeflag = b(o + 156)
      if (typeflag == '0' || typeflag == 0) {
        val name = cstr(b, o, 100)
        val prefix = cstr(b, o + 345, 155)
        val full = if (prefix.isEmpty) name else prefix + "/" + name
        if (full.isEmpty) return None
        out += TarEntry(full, size, o + 512)
      }
      o += 512 + (dataBlocks * 512).toInt
    }
    None // unreachable
  }

  /** WebDataset sample key: the member name up to the LAST dot —
    * `shard/000017.txt` and `shard/000017.bin` belong to one sample.
    */
  def sampleKey(name: String): String = {
    val dot = name.lastIndexOf('.')
    if (dot <= 0) name else name.substring(0, dot)
  }

  /** One ustar header block. Octal fields use the conventional
    * `%0*o`+NUL layouts; checksum is 6 octal digits, NUL, space.
    */
  def tarHeader(name: String, size: Long): Array[Byte] = {
    require(name.length <= 100, s"name too long: $name")
    val h = new Array[Byte](512)
    def put(s: String, off: Int): Unit = {
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      System.arraycopy(bytes, 0, h, off, bytes.length)
    }
    put(name, 0)
    put(f"${420}%07o", 100) // mode 0644
    put(f"${0}%07o", 108) // uid
    put(f"${0}%07o", 116) // gid
    put(f"$size%011o", 124)
    put(f"${0}%011o", 136) // mtime
    h(156) = '0' // regular file
    put("ustar", 257)
    put("00", 263)
    // checksum over the header with the field as 8 spaces
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    var i = 0
    while (i < 512) { sum += h(i) & 0xff; i += 1 }
    put(f"$sum%06o", 148)
    h(154) = 0
    h(155) = ' '
    h
  }

  /** Full archive from (name, bytes) members: headers + 512-padded data
    * + two zero terminator blocks.
    */
  def makeTar(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (name, data) =>
      out.write(tarHeader(name, data.length.toLong), 0, 512)
      out.write(data, 0, data.length)
      val pad = (512 - data.length % 512) % 512
      out.write(new Array[Byte](pad), 0, pad)
    }
    out.write(new Array[Byte](1024), 0, 1024)
    out.toByteArray
  }

  /** Graded WebDataset shard: s = 1 + id%5 samples, each a `.txt`
    * member of 10 + (id+31m) mod 100 bytes and a `.bin` member of
    * 400 + (id+53m) mod 300 bytes (spanning the 1-vs-2 data-block
    * boundary so the 512-rounding is oracle-observable). Content bytes
    * continue the single `(id + i) mod 256` run across all members in
    * order. Archive size = Σ_m [1536 + 512·ceil(Lb_m/512)] + 1024.
    */
  def makeTarDoc(id: Long): Array[Byte] = {
    val s = (1 + id % 5).toInt
    var i = 0L
    def content(len: Int): Array[Byte] = {
      val d = new Array[Byte](len)
      var j = 0
      while (j < len) { d(j) = ((id + i) % 256).toByte; i += 1; j += 1 }
      d
    }
    val members = (0 until s).flatMap { m =>
      val la = (10 + (id + 31L * m) % 100).toInt
      val lb = (400 + (id + 53L * m) % 300).toInt
      Seq(f"$m%06d.txt" -> content(la), f"$m%06d.bin" -> content(lb))
    }
    makeTar(members)
  }

  // ================================================================ warc

  /** One parsed WARC record: the WARC-Type, the declared Content-Length,
    * and — for `response` records — the HTTP body length and byte sum
    * after the status line + headers are stripped.
    */
  final case class WarcRecord(warcType: String, contentLength: Long,
      bodyLen: Long, bodySum: Long)

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int, until: Int): Int = {
    var i = from
    while (i + 3 < until) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** One record's span inside the uncompressed buffer: for `response`
    * records, [bodyOff, bodyOff + bodyLen) is the HTTP body after the
    * status line + headers; other record types carry bodyOff = −1.
    */
  final case class WarcRecordSpan(warcType: String, contentLength: Long,
      bodyOff: Int, bodyLen: Int)

  /** REAL WARC/1.0 walk over an UNCOMPRESSED buffer of concatenated
    * records (ISO 28500 grammar): version line, `Name: value` header
    * lines to a blank line, a Content-Length-delimited block, and the
    * mandatory CRLF CRLF record separator. `response` records must hold
    * a well-formed HTTP response — status line + headers + CRLFCRLF —
    * whose own Content-Length must match the remaining body bytes
    * exactly. Any violation → None. ([[parseWarcSpans]] is the offset
    * face the `graft-warc` connector reads bodies through; this face
    * derives the summed [[WarcRecord]] view from the same one walk.)
    */
  def parseWarc(b: Array[Byte]): Option[Seq[WarcRecord]] =
    parseWarcSpans(b).map(_.map { s =>
      var sum = 0L
      var i = math.max(s.bodyOff, 0)
      val end = math.max(s.bodyOff, 0) + s.bodyLen
      while (i < end) { sum += b(i) & 0xff; i += 1 }
      WarcRecord(s.warcType, s.contentLength, s.bodyLen.toLong, sum)
    })

  /** The one strict WARC walk — see [[parseWarc]] for the grammar. */
  def parseWarcSpans(b: Array[Byte]): Option[Seq[WarcRecordSpan]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecordSpan]
    var o = 0
    while (o < b.length) {
      val hdrEnd = indexOfCrlfCrlf(b, o, b.length)
      if (hdrEnd < 0) return None
      val header = new String(b, o, hdrEnd - o, Ascii)
      val lines = header.split("\r\n", -1)
      if (lines.isEmpty || lines(0) != "WARC/1.0") return None
      var warcType: String = null
      var contentLength = -1L
      lines.drop(1).foreach { line =>
        val c = line.indexOf(':')
        if (c <= 0) return None
        val (k, v) = (line.substring(0, c).trim, line.substring(c + 1).trim)
        if (k.equalsIgnoreCase("WARC-Type")) warcType = v
        else if (k.equalsIgnoreCase("Content-Length")) {
          // 19+ digits would overflow toLong into a thrown
          // NumberFormatException (review finding r17 third session) —
          // no real record is that long; reject by digit count first.
          if (!v.forall(_.isDigit) || v.isEmpty || v.length > 18) return None
          contentLength = v.toLong
        }
      }
      if (warcType == null || contentLength < 0) return None
      val blockStart = hdrEnd + 4
      val blockEnd = blockStart + contentLength
      if (blockEnd + 4 > b.length) return None
      if (b(blockEnd.toInt) != '\r' || b(blockEnd.toInt + 1) != '\n' ||
        b(blockEnd.toInt + 2) != '\r' || b(blockEnd.toInt + 3) != '\n') return None
      var bodyOff = -1
      var bodyLen = 0L
      if (warcType == "response") {
        val httpHdrEnd = indexOfCrlfCrlf(b, blockStart, blockEnd.toInt)
        if (httpHdrEnd < 0) return None
        val statusAndHeaders = new String(b, blockStart, httpHdrEnd - blockStart, Ascii)
        val hlines = statusAndHeaders.split("\r\n", -1)
        if (!hlines(0).startsWith("HTTP/1.")) return None
        val declared = hlines.drop(1).collectFirst {
          case l if l.toLowerCase.startsWith("content-length:") =>
            l.substring(l.indexOf(':') + 1).trim
        }
        val bodyStart = httpHdrEnd + 4
        bodyLen = blockEnd - bodyStart
        if (bodyLen < 0) return None
        declared match {
          case Some(v) if !v.forall(_.isDigit) || v.isEmpty || v.length > 18 ||
            v.toLong != bodyLen => return None
          case _ => ()
        }
        bodyOff = bodyStart
      }
      out += WarcRecordSpan(warcType, contentLength, bodyOff, bodyLen.toInt)
      o = (blockEnd + 4).toInt
    }
    if (out.isEmpty) None else Some(out.toSeq)
  }

  /** The `.warc.gz` convention: ONE gzip member per record (what makes
    * a 100-TB crawl splittable at record granularity). Each member is
    * inflated and must parse as exactly one WARC record.
    */
  def parseWarcGz(b: Array[Byte]): Option[Seq[WarcRecord]] = {
    // Inflate member-by-member, then parse each inflated record alone.
    val members = parseGzipMembersData(b).getOrElse(return None)
    val recs = members.map { data =>
      parseWarc(data) match {
        case Some(Seq(one)) => one
        case _ => return None
      }
    }
    Some(recs)
  }

  /** Like [[parseGzipMembers]] but returning the inflated bytes (WARC
    * needs to re-parse them). Same strict header/trailer contract —
    * both faces derive from the ONE [[walkGzipMembers]] walk.
    */
  def parseGzipMembersData(b: Array[Byte]): Option[Seq[Array[Byte]]] =
    walkGzipMembers(b).map(_.map(_._1))

  /** WARC header text for response record m of document id. Record-ID
    * is 19-digit zero-padded so the header length is CONSTANT for every
    * Long doc_id — mirror-shifted ids cannot change the closed form.
    */
  private def warcResponseRecord(id: Long, m: Int, body: Array[Byte]): Array[Byte] = {
    val http = f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: ${body.length}%03d\r\n\r\n"
    val contentLen = http.length + body.length
    val hdr = f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:graft:$id%019d:$m%02d>\r\nWARC-Target-URI: http://graft.invalid/doc\r\nContent-Type: application/http; msgtype=response\r\nContent-Length: $contentLen%03d\r\n\r\n"
    val out = new java.io.ByteArrayOutputStream()
    out.write(hdr.getBytes(Ascii))
    out.write(http.getBytes(Ascii))
    out.write(body, 0, body.length)
    out.write('\r'); out.write('\n'); out.write('\r'); out.write('\n')
    out.toByteArray
  }

  private def warcInfoRecord(id: Long): Array[Byte] = {
    val content = "software: graft\r\n"
    val hdr = f"WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Record-ID: <urn:graft:$id%019d:in>\r\nContent-Type: application/warc-fields\r\nContent-Length: ${content.length}%03d\r\n\r\n"
    (hdr + content + "\r\n\r\n").getBytes(Ascii)
  }

  /** Record header byte constants the oracle hardcodes; the closed loop
    * keeps them honest (a drifted header breaks the n_bytes hash).
    * responseOverhead = record bytes MINUS body bytes (WARC header +
    * HTTP header + trailing CRLFCRLF); infoRecordLen = the whole
    * warcinfo record.
    */
  def warcResponseOverhead: Int = warcResponseRecord(0L, 0, new Array[Byte](30)).length - 30
  def warcInfoRecordLen: Int = warcInfoRecord(0L).length

  /** WARC Content-Length constants the `q_warc_source` oracle hardcodes
    * (derived from the writer THROUGH the parser, so drift in either
    * breaks the pinning spec): a response record's Content-Length is the
    * HTTP status line + headers (this overhead) + the body; a warcinfo
    * record's Content-Length is its fixed warc-fields block.
    */
  def warcResponseContentOverhead: Int =
    parseWarc(warcResponseRecord(0L, 0, new Array[Byte](30))).get.head.contentLength.toInt - 30
  def warcInfoContentLen: Int =
    parseWarc(warcInfoRecord(0L)).get.head.contentLength.toInt

  /** Graded `.warc.gz` document: an optional warcinfo record (id even)
    * followed by r = 1 + id%3 response records with body lengths
    * B_m = 30 + (id + 41m) mod 120; body bytes continue the single
    * `(id + i) mod 256` run across records. EACH record is its own gzip
    * member (stored deflate, one block) — the splittable crawl layout.
    */
  def makeWarcDoc(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (id % 2 == 0) {
      val m = gzipMember(warcInfoRecord(id))
      out.write(m, 0, m.length)
    }
    val r = (1 + id % 3).toInt
    var i = 0L
    var m = 0
    while (m < r) {
      val len = (30 + (id + 41L * m) % 120).toInt
      val body = new Array[Byte](len)
      var j = 0
      while (j < len) { body(j) = ((id + i) % 256).toByte; i += 1; j += 1 }
      val member = gzipMember(warcResponseRecord(id, m, body))
      out.write(member, 0, member.length)
      m += 1
    }
    out.toByteArray
  }

  /** Graded WebDataset MULTIMODAL shard: s = 1 + id%3 samples, each a
    * real PNG member (`m.png`, [[Multimodal.makePng]] with per-sample
    * seed id + 97m — stored-deflate ⇒ closed-form size 68 + h(1+3w))
    * and a caption member (`m.txt`, 20 + (id+29m) mod 80 bytes whose
    * content continues the `(id + i) mod 256` run across txt members).
    * This is the actual shape multimodal training data ships in: tar
    * shards of sibling image+caption files grouped by basename key.
    */
  def makeWdsDoc(id: Long): Array[Byte] = {
    val s = (1 + id % 3).toInt
    var i = 0L
    val members = (0 until s).flatMap { m =>
      val w = (1 + (id + m) % 13).toInt
      val h = (1 + (id + 2L * m) % 11).toInt
      val png = Multimodal.makePng(w, h, seed = id + 97L * m)
      val lm = (20 + (id + 29L * m) % 80).toInt
      val txt = new Array[Byte](lm)
      var j = 0
      while (j < lm) { txt(j) = ((id + i) % 256).toByte; i += 1; j += 1 }
      Seq(f"$m%06d.png" -> png, f"$m%06d.txt" -> txt)
    }
    makeTar(members)
  }

  // ================================================================= zip

  /** One parsed ZIP entry: full name, compression method (0 stored /
    * 8 deflate), uncompressed size, and the uncompressed byte sum.
    */
  final case class ZipEntryP(name: String, method: Int, usize: Long, byteSum: Long)

  /** Combined declared-uncompressed-size cap (same zip-bomb discipline
    * as the PNG tier's declared-raster cap): a central directory whose
    * usize total exceeds this is rejected BEFORE any inflate runs.
    */
  val ZipUsizeCap: Long = 256L * 1024 * 1024

  /** REAL ZIP walk (PKWARE APPNOTE layout), central-directory-first —
    * the structure that makes ZIP *random-access* at 100 TB (a reader
    * seeks to the EOCD, walks the CD, and fetches only the members it
    * needs; contrast tar's linear scan): backward EOCD scan tolerant of
    * an archive comment (comment length must match the remaining bytes
    * exactly — trailing garbage is rejected), disk numbers must be 0,
    * CD must end exactly at the EOCD, every CD entry's local header is
    * re-read and its name cross-checked, stored (0) and deflate (8)
    * members are decoded — deflate through the real `Inflater(nowrap)`
    * with consumed-bytes == csize and produced-bytes == usize enforced
    * — and every member's CRC-32 is verified against the CD. Flag bit 3
    * (streaming data descriptor — what `ZipOutputStream` writes) is
    * honored: sizes/CRC come from the CD and the trailing descriptor
    * (with or without its optional signature) must agree. Encrypted
    * members (bit 0), other methods, any ZIP64 marker (0xFFFFFFFF
    * sizes/offsets or a ZIP64 EOCD locator), and declared sizes over
    * [[ZipUsizeCap]] all reject. Any violation → None, never a throw.
    */
  def parseZip(b: Array[Byte]): Option[Seq[ZipEntryP]] = {
    if (b.length < 22) return None
    // EOCD: last position whose signature AND comment length both fit.
    var e = b.length - 22
    val stop = math.max(0, b.length - 22 - 65535)
    while (e >= stop && !(le32u(b, e) == 0x06054b50L &&
      le16(b, e + 20) == b.length - e - 22)) e -= 1
    if (e < stop) return None
    // A ZIP64 EOCD locator directly precedes the EOCD when present.
    if (e >= 20 && le32u(b, e - 20) == 0x07064b50L) return None
    if (le16(b, e + 4) != 0 || le16(b, e + 6) != 0) return None // disk numbers
    val n = le16(b, e + 8)
    if (le16(b, e + 10) != n || n == 0xffff) return None
    val cdSize = le32u(b, e + 12)
    val cdOff = le32u(b, e + 16)
    if (cdSize == 0xffffffffL || cdOff == 0xffffffffL) return None // zip64
    if (cdOff + cdSize != e) return None // CD must end exactly at the EOCD
    val out = scala.collection.mutable.ArrayBuffer.empty[ZipEntryP]
    var p = cdOff.toInt
    var declaredTotal = 0L
    // First pass: structure + zip-bomb cap, BEFORE any inflate.
    val entries = scala.collection.mutable.ArrayBuffer
      .empty[(String, Int, Int, Long, Long, Long, Long)] // name, flags, method, crc, csize, usize, localOff
    var k = 0
    while (k < n) {
      // Long arithmetic for every CD bound: p near Int.MaxValue plus
      // three 16-bit field lengths wraps negative in Int and the guard
      // would wrongly pass, then throw — the tar 2 GB bug class (review
      // finding r17 fourth session).
      if (p.toLong + 46L > e) return None
      if (le32u(b, p) != 0x02014b50L) return None
      val flags = le16(b, p + 8)
      if ((flags & 1) != 0) return None // encrypted
      val method = le16(b, p + 10)
      if (method != 0 && method != 8) return None
      val crc = le32u(b, p + 16)
      val csize = le32u(b, p + 20)
      val usize = le32u(b, p + 24)
      if (csize == 0xffffffffL || usize == 0xffffffffL) return None // zip64
      val nameLen = le16(b, p + 28)
      val extraLen = le16(b, p + 30)
      val commentLen = le16(b, p + 32)
      if (le16(b, p + 34) != 0) return None // disk-number start
      val localOff = le32u(b, p + 42)
      if (localOff == 0xffffffffL) return None
      if (p.toLong + 46L + nameLen + extraLen + commentLen > e) return None
      val name = new String(b, p + 46, nameLen,
        java.nio.charset.StandardCharsets.UTF_8)
      declaredTotal += usize
      if (declaredTotal > ZipUsizeCap) return None
      entries += ((name, flags, method, crc, csize, usize, localOff))
      p += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    if (p != e) return None // CD size drift
    entries.foreach { case (name, flags, method, crc, csize, usize, localOff) =>
      val lo = localOff.toInt
      if (localOff + 30 > cdOff) return None
      if (le32u(b, lo) != 0x04034b50L) return None
      val lNameLen = le16(b, lo + 26)
      val lExtraLen = le16(b, lo + 28)
      val dataStart = localOff + 30 + lNameLen + lExtraLen
      if (dataStart + csize > cdOff) return None
      if (lNameLen != name.getBytes(java.nio.charset.StandardCharsets.UTF_8).length ||
        new String(b, lo + 30, lNameLen,
          java.nio.charset.StandardCharsets.UTF_8) != name) return None
      val hasDescriptor = (flags & 8) != 0
      if (!hasDescriptor) {
        // Local sizes/CRC are authoritative copies — must agree with the CD.
        if (le32u(b, lo + 14) != crc || le32u(b, lo + 18) != csize ||
          le32u(b, lo + 22) != usize) return None
      }
      val ds = dataStart.toInt
      val data: Array[Byte] =
        if (method == 0) {
          if (csize != usize) return None
          java.util.Arrays.copyOfRange(b, ds, ds + csize.toInt)
        } else {
          val inf = new java.util.zip.Inflater(true)
          try {
            inf.setInput(b, ds, csize.toInt)
            val acc = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            // Raw-deflate zlib documents needing one extra "dummy" byte
            // of lookahead when the stream ends exactly at the input
            // boundary (Inflater javadoc; the JDK's own ZipFile feeds
            // it too). Exactly-once: a second demand means truncation.
            var dummyFed = false
            while (!inf.finished()) {
              val m =
                try inf.inflate(buf)
                catch { case _: java.util.zip.DataFormatException => return None }
              if (m == 0) {
                if (inf.needsDictionary()) return None
                if (inf.needsInput()) {
                  if (dummyFed) return None
                  inf.setInput(Array[Byte](0))
                  dummyFed = true
                }
              } else {
                acc.write(buf, 0, m)
                if (acc.size() > usize) return None // lies about usize
              }
            }
            // needsInput before the dummy implies all csize real bytes
            // were consumed; without it the counter must match exactly.
            if (!dummyFed && inf.getBytesRead != csize) return None
            acc.toByteArray
          } finally inf.end()
        }
      if (data.length.toLong != usize) return None
      val c = new java.util.zip.CRC32()
      c.update(data)
      if (c.getValue != crc) return None
      if (hasDescriptor) {
        // 12-byte descriptor, optionally preceded by its signature.
        var dd = (dataStart + csize).toInt
        if (dd + 4 <= cdOff && le32u(b, dd) == 0x08074b50L) dd += 4
        if (dd + 12 > cdOff) return None
        if (le32u(b, dd) != crc || le32u(b, dd + 4) != csize ||
          le32u(b, dd + 8) != usize) return None
      }
      var sum = 0L
      var i = 0
      while (i < data.length) { sum += data(i) & 0xff; i += 1 }
      out += ZipEntryP(name, method, usize, sum)
    }
    if (out.isEmpty) None else Some(out.toSeq)
  }

  private def le16put(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def le32put(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
    o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
  }

  /** Whole archive from (name, bytes, deflate?) members: local headers
    * with exact sizes (no descriptors), stored or stored-deflate-framed
    * data, the central directory, and the EOCD. Closed-form sized:
    * member m costs 30 + |name| + csize local + 46 + |name| central,
    * csize = L (stored) or L + 5·ceil(L/65535) (deflate framing);
    * + 22 EOCD.
    */
  def makeZip(members: Seq[(String, Array[Byte], Boolean)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val central = new java.io.ByteArrayOutputStream()
    members.foreach { case (name, data, deflate) =>
      val nameB = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val body = if (deflate) deflateStored(data) else data
      val crcC = new java.util.zip.CRC32()
      crcC.update(data)
      val crc = crcC.getValue
      val localOff = out.size()
      le32put(out, 0x04034b50L)
      le16put(out, 20) // version needed
      le16put(out, 0) // flags
      le16put(out, if (deflate) 8 else 0)
      le16put(out, 0); le16put(out, 0) // time, date
      le32put(out, crc)
      le32put(out, body.length.toLong)
      le32put(out, data.length.toLong)
      le16put(out, nameB.length)
      le16put(out, 0) // extra
      out.write(nameB, 0, nameB.length)
      out.write(body, 0, body.length)
      le32put(central, 0x02014b50L)
      le16put(central, 20); le16put(central, 20) // made-by, needed
      le16put(central, 0) // flags
      le16put(central, if (deflate) 8 else 0)
      le16put(central, 0); le16put(central, 0) // time, date
      le32put(central, crc)
      le32put(central, body.length.toLong)
      le32put(central, data.length.toLong)
      le16put(central, nameB.length)
      le16put(central, 0); le16put(central, 0) // extra, comment
      le16put(central, 0) // disk start
      le16put(central, 0); le32put(central, 0L) // int/ext attrs
      le32put(central, localOff.toLong)
      central.write(nameB, 0, nameB.length)
    }
    val cdOff = out.size()
    val cd = central.toByteArray
    out.write(cd, 0, cd.length)
    le32put(out, 0x06054b50L)
    le16put(out, 0); le16put(out, 0) // disk numbers
    le16put(out, members.size); le16put(out, members.size)
    le32put(out, cd.length.toLong)
    le32put(out, cdOff.toLong)
    le16put(out, 0) // comment
    out.toByteArray
  }

  /** Graded ZIP document: e = 1 + id%4 members named `%06d.txt` (10
    * bytes each), member m holding L_m = 40 + (id + 23m) mod 180
    * content bytes — DEFLATE-framed when (id + m) is even (single
    * stored block ⇒ csize = L + 5; L ≤ 219 < 65535), STORED otherwise
    * (csize = L). Content bytes continue the single `(id + i) mod 256`
    * run across members. Archive size = Σ(40 + csize_m) + 56e + 22.
    */
  def makeZipDoc(id: Long): Array[Byte] = {
    val e = (1 + id % 4).toInt
    var i = 0L
    val members = (0 until e).map { m =>
      val len = (40 + (id + 23L * m) % 180).toInt
      val data = new Array[Byte](len)
      var j = 0
      while (j < len) { data(j) = ((id + i) % 256).toByte; i += 1; j += 1 }
      (f"$m%06d.txt", data, (id + m) % 2 == 0)
    }
    makeZip(members)
  }

  // ============================================== compressed text shards

  /** The modern-compression seam: zstd / lz4-frame / xz round-trips via
    * the codec libraries Spark itself ships on its runtime classpath
    * for shuffle/Parquet compression (zstd-jni, lz4-java, org.tukaani
    * xz — all public, no added dependency). `.jsonl.zst` is the shape
    * large public text corpora actually distribute in; lz4/xz cover the
    * fast-local and high-ratio ends. Decompress never throws — corrupt
    * or foreign bytes → None. NOTE zstd frames omit the content
    * checksum by default, so a flipped payload bit can inflate
    * "successfully" — detection is the CONTENT's job, which is exactly
    * what the closed loops' byte/char sums grade.
    */
  def codecCompress(codec: String, data: Array[Byte]): Array[Byte] = codec match {
    case "zstd" => com.github.luben.zstd.Zstd.compress(data)
    case "lz4" =>
      val bos = new java.io.ByteArrayOutputStream()
      val o = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
      o.write(data); o.close()
      bos.toByteArray
    case "xz" =>
      val bos = new java.io.ByteArrayOutputStream()
      // Payload-sized dictionary: the default preset allocates and
      // initializes an 8 MiB-dictionary encoder PER CALL — measured
      // 19 ms/op on 500-byte payloads vs 1 ms at preset 1 with a
      // bounded dict (a dictionary larger than the payload cannot help
      // compression; any valid LZMA2 option set decodes identically).
      // At 100 TB you'd also compress SHARDS, not tiny documents — the
      // per-stream encoder setup is the dominant cost at small sizes.
      val opts = new org.tukaani.xz.LZMA2Options(1)
      opts.setDictSize(math.max(org.tukaani.xz.LZMA2Options.DICT_SIZE_MIN,
        math.min(1 << 20, Integer.highestOneBit(math.max(1, data.length)) * 2)))
      val o = new org.tukaani.xz.XZOutputStream(bos, opts)
      o.write(data); o.close()
      bos.toByteArray
    case other => throw new IllegalArgumentException(s"unknown codec $other")
  }

  /** Streaming decompress of one frame sequence; any codec-layer
    * violation → None. Output is capped at [[ZipUsizeCap]] (same
    * decompression-bomb discipline as the ZIP walk).
    */
  def codecDecompress(codec: String, b: Array[Byte]): Option[Array[Byte]] =
    try {
      val in: java.io.InputStream = codec match {
        case "zstd" => new com.github.luben.zstd.ZstdInputStream(
          new java.io.ByteArrayInputStream(b))
        case "lz4" => new net.jpountz.lz4.LZ4FrameInputStream(
          new java.io.ByteArrayInputStream(b))
        case "xz" => new org.tukaani.xz.XZInputStream(
          new java.io.ByteArrayInputStream(b))
        case other => throw new IllegalArgumentException(s"unknown codec $other")
      }
      try {
        val acc = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) {
          acc.write(buf, 0, n)
          if (acc.size() > ZipUsizeCap) return None
          n = in.read(buf)
        }
        Some(acc.toByteArray)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Graded `.jsonl.zst` shard: r = 1 + id%5 JSON lines
    * `{"id":<id>,"seq":<m>,"text":"<t_m>"}` where t_m is
    * 20 + (id + 13m) mod 60 lowercase letters continuing the single
    * `'a' + (id + i) mod 26` run across lines — REALLY zstd-compressed
    * (dictionary-built frames, not stored framing; the compressed size
    * is NOT closed-form and deliberately not graded).
    */
  def makeJsonlZstDoc(id: Long): Array[Byte] = {
    val r = (1 + id % 5).toInt
    val sb = new StringBuilder
    var i = 0L
    var m = 0
    while (m < r) {
      val len = (20 + (id + 13L * m) % 60).toInt
      sb.append("{\"id\":").append(id).append(",\"seq\":").append(m)
        .append(",\"text\":\"")
      var j = 0
      while (j < len) {
        sb.append(('a' + ((id + i) % 26).toInt).toChar); i += 1; j += 1
      }
      sb.append("\"}\n")
      m += 1
    }
    codecCompress("zstd", sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  // ============================================================== queries

  /** ORACLE-GRADED closed loop for the multi-member gzip tier: per
    * document, k members are GENERATED (stored-deflate framing ⇒
    * closed-form sizes) and walked back by the REAL header/Inflater/
    * CRC-32/ISIZE pipeline. Emitted: member count, total raw bytes, the
    * content byte sum (cycle-split predictable), and the exact archive
    * size. Map-side generation and parse; payloads never leave the
    * executor.
    */
  val qContainerGzip: Q = (s, d) => {
    import s.implicits._
    documents(s, d).select(col("doc_id"))
      .repartition(s.sessionState.conf.numShufflePartitions)
      .as[Long]
      .mapPartitions(_.map { id =>
        val payload = makeGzipDoc(id)
        val members = parseGzipMembers(payload).getOrElse(
          throw new IllegalStateException(s"generated gzip for doc $id failed to parse"))
        (id, "gzip", members.size, members.map(_.rawLen).sum,
          members.map(_.byteSum).sum, payload.length.toLong)
      })
      .toDF("media_id", "format", "n_members", "raw_bytes", "byte_sum", "n_bytes")
      .orderBy("media_id")
  }

  /** ORACLE-GRADED closed loop for the WebDataset tar tier: per
    * document, s samples × {.txt,.bin} members are GENERATED and walked
    * back by the REAL ustar parser (checksum-verified headers, 512-byte
    * block rounding — the .bin sizes straddle the 1-vs-2-block boundary
    * so the rounding is oracle-observable). n_samples comes from the
    * WebDataset basename-key grouping. Map-side generation and parse.
    */
  val qContainerTar: Q = (s, d) => {
    import s.implicits._
    documents(s, d).select(col("doc_id"))
      .repartition(s.sessionState.conf.numShufflePartitions)
      .as[Long]
      .mapPartitions(_.map { id =>
        val payload = makeTarDoc(id)
        val entries = parseTar(payload).getOrElse(
          throw new IllegalStateException(s"generated tar for doc $id failed to parse"))
        var byteSum = 0L
        entries.foreach { e =>
          var i = e.dataOff
          val end = e.dataOff + e.size.toInt
          while (i < end) { byteSum += payload(i) & 0xff; i += 1 }
        }
        (id, "tar", entries.size, entries.map(e => sampleKey(e.name)).distinct.size,
          entries.map(_.size).sum, byteSum, payload.length.toLong)
      })
      .toDF("media_id", "format", "n_entries", "n_samples", "data_bytes",
        "byte_sum", "n_bytes")
      .orderBy("media_id")
  }

  /** ORACLE-GRADED closed loop for the WARC tier (the Common Crawl
    * layout): per document, an optional warcinfo + r response records
    * are GENERATED, each as its OWN gzip member, and walked back by the
    * REAL gzip-member + WARC/1.0 + HTTP parse — version line, headers,
    * Content-Length-delimited block, status-line strip, HTTP
    * Content-Length cross-checked against the actual body. Emitted:
    * record/response counts, total body bytes, the body byte sum, and
    * the exact archive size (header text lengths are doc_id-invariant
    * by 19-digit zero padding). Map-side generation and parse.
    */
  val qContainerWarc: Q = (s, d) => {
    import s.implicits._
    documents(s, d).select(col("doc_id"))
      .repartition(s.sessionState.conf.numShufflePartitions)
      .as[Long]
      .mapPartitions(_.map { id =>
        val payload = makeWarcDoc(id)
        val recs = parseWarcGz(payload).getOrElse(
          throw new IllegalStateException(s"generated warc for doc $id failed to parse"))
        val responses = recs.filter(_.warcType == "response")
        (id, "warc", recs.size, responses.size, responses.map(_.bodyLen).sum,
          responses.map(_.bodySum).sum, payload.length.toLong)
      })
      .toDF("media_id", "format", "n_records", "n_responses", "body_bytes",
        "body_sum", "n_bytes")
      .orderBy("media_id")
  }

  /** ORACLE-GRADED end-to-end shard ingest — the actual 100-TB corpus
    * shape: REAL `.warc.gz` FILES on storage, read back through Spark's
    * `binaryFile` source (one task per file — exactly how a crawl
    * ingests: per-record gzip members make each shard independently
    * decodable), walked by the real gzip+WARC+HTTP parse, aggregated
    * per shard. The write side is DISTRIBUTED: each mapGroups task
    * builds and writes its own shard (doc_id mod 64) — nothing funnels
    * through the driver. NOTE the write targets the task's LOCAL
    * filesystem via java.nio, which reaches the shared temp dir only
    * because this harness runs local-mode; a multi-node deployment must
    * route the same per-task write through the Hadoop FileSystem API to
    * DFS (the per-task-shard SHAPE is what carries over, not the nio
    * call — review finding r17 third session).
    * Concatenating per-document `.warc.gz` payloads IS a
    * valid `.warc.gz` file (member concatenation), so DuckDB predicts
    * every per-shard aggregate by summing the q_container_warc per-doc
    * closed forms GROUP BY doc_id mod 64. The temp shard dir is deleted
    * after the (eager, 64-row) localCheckpoint — repeated grading runs
    * leave no residue. NOTE (bench): this key deliberately times the
    * FULL round trip — shard build + file write + binaryFile scan +
    * parse — not just a read.
    */
  /** Distributed `.warc.gz` shard write (docs grouped by doc_id mod 64,
    * each mapGroups task builds and writes its own shard) — shared by
    * the binaryFile loop and the `graft-warc` connector key. See
    * [[qContainerShards]] for the local-FS caveat.
    */
  /** One shard's bytes: the docs' `.warc.gz` payloads concatenated in
    * ascending doc_id order (member concatenation is valid gzip). The
    * ONE shard layout the graded keys and their specs all build from.
    */
  def warcShardBytes(ids: Seq[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    ids.sorted.foreach { id =>
      val b = makeWarcDoc(id)
      out.write(b, 0, b.length)
    }
    out.toByteArray
  }

  def writeWarcShards(s: SparkSession, d: String, dir: String): Unit = {
    import s.implicits._
    val ids = documents(s, d).select(col("doc_id")).as[Long]
    ids.groupByKey(_ % 64)
      .mapGroups { (shard, it) =>
        java.nio.file.Files.write(
          new java.io.File(dir, f"shard-$shard%03d.warc.gz").toPath,
          warcShardBytes(it.toSeq))
        shard
      }
      .count() // force the distributed shard write before any scan
    ()
  }

  val qContainerShards: Q = (s, d) => {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_shards_").toString
    try {
      writeWarcShards(s, d, dir)
      s.read.format("binaryFile").option("pathGlobFilter", "*.warc.gz").load(dir)
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])]
        .map { case (path, bytes) =>
          val shard = "shard-(\\d+)".r.findFirstMatchIn(path)
            .map(_.group(1).toLong)
            .getOrElse(throw new IllegalStateException(s"unexpected shard path $path"))
          val recs = parseWarcGz(bytes).getOrElse(
            throw new IllegalStateException(s"shard $path failed to parse"))
          val responses = recs.filter(_.warcType == "response")
          (shard, recs.size.toLong, responses.size.toLong,
            responses.map(_.bodyLen).sum, responses.map(_.bodySum).sum,
            bytes.length.toLong)
        }
        .toDF("shard", "n_records", "n_responses", "body_bytes", "body_sum", "n_bytes")
        .orderBy("shard")
        .localCheckpoint()
    } finally Sources.deleteRecursively(new java.io.File(dir))
  }

  /** ORACLE-GRADED closed loop for the multimodal WebDataset shape —
    * container × codec COMPOSITION: per document a tar shard of
    * image+caption samples is GENERATED ([[makeWdsDoc]]) and walked back
    * by the real checksum-verified ustar parser, with every `.png`
    * member decoded by the REAL PNG pipeline (CRC chunk walk → Inflater
    * → five-filter unfilter — Multimodal.parsePngPixels) and every
    * `.txt` member byte-summed. DuckDB predicts sample counts, the
    * DECODED pixel sum of every image, caption bytes/sums, and the
    * exact tar size (PNG sizes are closed-form under stored-deflate
    * framing). Map-side generation, walk, and decode.
    */
  val qContainerWds: Q = (s, d) => {
    import s.implicits._
    documents(s, d).select(col("doc_id"))
      .repartition(s.sessionState.conf.numShufflePartitions)
      .as[Long]
      .mapPartitions(_.map { id =>
        val payload = makeWdsDoc(id)
        val entries = parseTar(payload).getOrElse(
          throw new IllegalStateException(s"generated wds tar for doc $id failed to parse"))
        var pixelSum = 0L
        var txtBytes = 0L
        var txtSum = 0L
        var nPng = 0
        entries.foreach { e =>
          val data = java.util.Arrays.copyOfRange(payload, e.dataOff, e.dataOff + e.size.toInt)
          if (e.name.endsWith(".png")) {
            val (_, ps) = Multimodal.parsePngPixels(data).getOrElse(
              throw new IllegalStateException(s"png member ${e.name} of doc $id failed to decode"))
            pixelSum += ps
            nPng += 1
          } else {
            txtBytes += data.length
            data.foreach(b => txtSum += b & 0xff)
          }
        }
        (id, entries.size, entries.map(e => sampleKey(e.name)).distinct.size,
          nPng, pixelSum, txtBytes, txtSum, payload.length.toLong)
      })
      .toDF("media_id", "n_entries", "n_samples", "n_png", "pixel_sum",
        "txt_bytes", "txt_sum", "n_bytes")
      .orderBy("media_id")
  }

  /** ORACLE-GRADED closed loop for the ZIP tier: per document, e
    * members are GENERATED ([[makeZipDoc]] — alternating stored /
    * deflate-framed, closed-form sizes) and walked back by the REAL
    * EOCD-scan → central-directory → local-header → Inflater → CRC-32
    * pipeline. Emitted: entry/deflated counts, total raw bytes, the
    * content byte sum, and the exact archive size. Map-side generation
    * and parse; payloads never leave the executor.
    */
  val qContainerZip: Q = (s, d) => {
    import s.implicits._
    documents(s, d).select(col("doc_id"))
      .repartition(s.sessionState.conf.numShufflePartitions)
      .as[Long]
      .mapPartitions(_.map { id =>
        val payload = makeZipDoc(id)
        val entries = parseZip(payload).getOrElse(
          throw new IllegalStateException(s"generated zip for doc $id failed to parse"))
        (id, "zip", entries.size, entries.count(_.method == 8),
          entries.map(_.usize).sum, entries.map(_.byteSum).sum,
          payload.length.toLong)
      })
      .toDF("media_id", "format", "n_entries", "n_deflated", "raw_bytes",
        "byte_sum", "n_bytes")
      .orderBy("media_id")
  }

  /** ORACLE-GRADED `.jsonl.zst` loop — the shape large public text
    * corpora ship in: per document a REALLY-zstd-compressed JSONL shard
    * is generated ([[makeJsonlZstDoc]]), decompressed through the real
    * codec stream, split to lines, and parsed by Spark's codegen'd
    * `from_json`; per-line fields then aggregate back to per-document
    * closed forms (line count, Σseq, text chars, the 26-cycle char
    * sum via the codegen'd `aggregate`/`ascii` expressions — no UDF).
    * The compressed size is real-zstd and deliberately ungraded; the
    * CONTENT sums are what prove the round trip. Map-side decompress;
    * one shuffle for the per-doc aggregate.
    */
  val qContainerZst: Q = (s, d) => {
    import s.implicits._
    val lineSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("seq",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    documents(s, d).select(col("doc_id"))
      .repartition(s.sessionState.conf.numShufflePartitions)
      .as[Long]
      .mapPartitions(_.flatMap { id =>
        val payload = makeJsonlZstDoc(id)
        val raw = codecDecompress("zstd", payload).getOrElse(
          throw new IllegalStateException(s"generated zst for doc $id failed to decompress"))
        new String(raw, java.nio.charset.StandardCharsets.UTF_8)
          .split("\n").iterator.filter(_.nonEmpty).map(line => (id, line))
      })
      .toDF("media_id", "line")
      .select(col("media_id"), from_json(col("line"), lineSchema).as("j"))
      .groupBy("media_id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("j.id") === col("media_id"), 1L).otherwise(0L)).as("id_ok"),
        sum(col("j.seq").cast("long")).as("seq_sum"),
        sum(length(col("j.text")).cast("long")).as("text_chars"),
        sum(expr("aggregate(split(j.text, ''), 0L, (acc, c) -> acc + ascii(c))"))
          .as("char_sum"))
      .withColumn("codec", lit("zstd"))
      .orderBy("media_id")
  }

  /** ORACLE-GRADED round trip across all three modern codecs: document
    * id picks codec = id mod 3 ∈ {zstd, lz4, xz}; a 300 + id mod 500
    * byte `(id + i) mod 256` run is REALLY compressed and streamed back
    * through the codec seam, with in-task byte-for-byte verification
    * (roundtrip_ok) plus the oracle-predicted raw length and cycle
    * sum. Map-only — compressed bytes never leave the executor.
    */
  val qContainerCodecs: Q = (s, d) => {
    import s.implicits._
    documents(s, d).select(col("doc_id"))
      .repartition(s.sessionState.conf.numShufflePartitions)
      .as[Long]
      .mapPartitions(_.map { id =>
        val codec = (id % 3) match {
          case 0 => "zstd"; case 1 => "lz4"; case _ => "xz"
        }
        val len = (300 + id % 500).toInt
        val data = new Array[Byte](len)
        var j = 0
        while (j < len) { data(j) = ((id + j) % 256).toByte; j += 1 }
        val back = codecDecompress(codec, codecCompress(codec, data)).getOrElse(
          throw new IllegalStateException(s"$codec round trip for doc $id failed"))
        var sum = 0L
        var i = 0
        while (i < back.length) { sum += back(i) & 0xff; i += 1 }
        (id, codec, back.length.toLong, sum, java.util.Arrays.equals(data, back))
      })
      .toDF("media_id", "codec", "raw_len", "byte_sum", "roundtrip_ok")
      .orderBy("media_id")
  }

  /** Container-format sniff — the "what is this blob" step every mixed
    * ingest runs first. Magic-number dispatch: ZIP local header or
    * empty-archive EOCD, zstd frame, xz stream, lz4 frame, gzip (then a
    * CONTENT sniff: a gzip whose first member inflates to `WARC/1.0` is
    * a `.warc.gz` — WARC is not distinguishable at the byte-0 magic
    * layer), and ustar via the offset-257 magic (tar has no offset-0
    * magic). Unknown → None.
    */
  def detectContainer(b: Array[Byte]): Option[String] = {
    if (b.length >= 4 && (b(0) & 0xff) == 0x50 && (b(1) & 0xff) == 0x4b &&
      ((b(2) & 0xff) == 0x03 && (b(3) & 0xff) == 0x04 ||
        (b(2) & 0xff) == 0x05 && (b(3) & 0xff) == 0x06)) Some("zip")
    else if (b.length >= 4 && (b(0) & 0xff) == 0x28 && (b(1) & 0xff) == 0xb5 &&
      (b(2) & 0xff) == 0x2f && (b(3) & 0xff) == 0xfd) Some("zstd")
    else if (b.length >= 6 && (b(0) & 0xff) == 0xfd && b(1) == '7' && b(2) == 'z' &&
      b(3) == 'X' && b(4) == 'Z' && b(5) == 0) Some("xz")
    else if (b.length >= 4 && (b(0) & 0xff) == 0x04 && (b(1) & 0xff) == 0x22 &&
      (b(2) & 0xff) == 0x4d && (b(3) & 0xff) == 0x18) Some("lz4")
    else if (b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b) {
      // FIRST member only (maxMembers = 1): the sniff must not inflate
      // a multi-GB archive — or depend on its later members — to read
      // 8 bytes (review finding r17 fourth session).
      val isWarc = walkGzipMembers(b, maxMembers = 1).exists(_.headOption.exists {
        case (m, _) => m.length >= 8 && new String(m, 0, 8, Ascii) == "WARC/1.0"
      })
      Some(if (isWarc) "warc" else "gzip")
    } else if (b.length >= 263 && cstr(b, 257, 6).startsWith("ustar")) Some("tar")
    else None
  }

  /** ORACLE-GRADED sniff-and-parse loop over ALL SEVEN container
    * formats: doc_id picks the format, the matching generator builds a
    * real payload, [[detectContainer]] must identify it from bytes
    * alone, and the detected format's REAL parser must accept it.
    * DuckDB predicts the format label per doc_id; a mis-sniff or a
    * parser regression breaks the hash.
    */
  val qContainerSniff: Q = (s, d) => {
    import s.implicits._
    documents(s, d).select(col("doc_id"))
      .repartition(s.sessionState.conf.numShufflePartitions)
      .as[Long]
      .mapPartitions(_.map { id =>
        val payload = (id % 7) match {
          case 0 => makeGzipDoc(id)
          case 1 => makeTarDoc(id)
          case 2 => makeWarcDoc(id)
          case 3 => makeZipDoc(id)
          case n =>
            val codec = n match { case 4 => "zstd"; case 5 => "xz"; case _ => "lz4" }
            val len = (100 + id % 100).toInt
            val data = new Array[Byte](len)
            var j = 0
            while (j < len) { data(j) = ((id + j) % 256).toByte; j += 1 }
            codecCompress(codec, data)
        }
        val fmt = detectContainer(payload).getOrElse(
          throw new IllegalStateException(s"doc $id payload failed to sniff"))
        val parsed = fmt match {
          case "gzip" => parseGzipMembers(payload).isDefined
          case "tar" => parseTar(payload).isDefined
          case "warc" => parseWarcGz(payload).isDefined
          case "zip" => parseZip(payload).isDefined
          case c => codecDecompress(c, payload).isDefined
        }
        (id, fmt, parsed)
      })
      .toDF("media_id", "format", "parse_ok")
      .orderBy("media_id")
  }

  /** ORACLE-GRADED `graft-warc` CONNECTOR loop — the corpus as a TABLE:
    * the same distributed shard write as [[qContainerShards]], read back
    * through the batch DataSourceV2 connector
    * (graft.sources.WarcDataSource: one partition per shard file,
    * streaming O(record)-memory member walk, column pruning,
    * statistics) and aggregated DECLARATIVELY — count/when for record
    * mix, `length(body)` for body bytes, and the codegen'd
    * `GraftExpressions.byteSum(body)` checksum; the whole aggregate
    * stays in whole-stage codegen, no typed lambda. DuckDB predicts
    * every per-shard value from the q_container_warc closed forms plus
    * the Content-Length constants pinned by ContainersSpec.
    */
  val qWarcSource: Q = (s, d) => {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_src_").toString
    try {
      writeWarcShards(s, d, dir)
      s.read.format("graft-warc").load(dir)
        .groupBy(regexp_extract(col("path"), "shard-(\\d+)", 1)
          .cast("long").as("shard"))
        .agg(
          count(lit(1)).as("n_records"),
          sum(when(col("warc_type") === "response", 1L).otherwise(0L)).as("n_responses"),
          sum(coalesce(length(col("body")).cast("long"), lit(0L))).as("body_bytes"),
          sum(coalesce(graft.functions.GraftExpressions.byteSum(col("body")), lit(0L)))
            .as("body_sum"),
          sum(col("content_length")).as("content_bytes"))
        .orderBy("shard")
        .localCheckpoint()
    } finally Sources.deleteRecursively(new java.io.File(dir))
  }

  val queries: Map[String, Q] = Map(
    "q_container_gzip" -> qContainerGzip,
    "q_container_tar" -> qContainerTar,
    "q_container_warc" -> qContainerWarc,
    "q_container_shards" -> qContainerShards,
    "q_container_wds" -> qContainerWds,
    "q_container_zip" -> qContainerZip,
    "q_container_zst" -> qContainerZst,
    "q_container_codecs" -> qContainerCodecs,
    "q_container_sniff" -> qContainerSniff,
    "q_warc_source" -> qWarcSource
  )
}
