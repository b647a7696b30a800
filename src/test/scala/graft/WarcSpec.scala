package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import graft.sources.WarcIngest

/** WARC container segmentation: golden byte-level fixtures (offsets,
  * Content-Length framing, type dispatch, HTTP parse, truncation
  * recovery) plus the Spark round-trip and the file-based ingest path.
  */
class WarcSpec extends SparkSpec {

  private val CRLF = "\r\n"

  private def md5hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes(UTF_8))
    d.map(b => f"${b & 0xff}%02x").mkString
  }

  private def record(typ: String, uri: Option[String],
                     block: String): String = {
    val uriLine = uri.map(u => s"WARC-Target-URI: $u$CRLF").getOrElse("")
    s"WARC/1.0${CRLF}WARC-Type: $typ$CRLF$uriLine" +
      s"Content-Length: ${block.getBytes(UTF_8).length}$CRLF$CRLF" +
      block + CRLF + CRLF
  }

  private def httpBlock(status: String, body: String): String =
    s"HTTP/1.1 $status${CRLF}Content-Type: text/plain$CRLF" +
      s"Content-Length: ${body.getBytes(UTF_8).length}$CRLF$CRLF" + body

  test("multi-record walk: offsets, skip of non-response types, md5") {
    val r0 = record("warcinfo", None, "software: test\n")
    val r1 = record("response", Some("http://a/1"),
      httpBlock("200 OK", "hello world"))
    val r2 = record("metadata", Some("http://a/1"), "via: test")
    val r3 = record("response", Some("http://a/2"),
      httpBlock("404 Not Found", "gone"))
    val bytes = (r0 + r1 + r2 + r3).getBytes(UTF_8)
    val recs = WarcIngest.parseContainer(7L, bytes)
    assert(recs.length == 2)
    val a = recs.head
    assert(a.shard_id == 7L && a.rec_index == 0L)
    assert(a.rec_offset == r0.getBytes(UTF_8).length.toLong)
    assert(a.target_uri == "http://a/1")
    assert(a.http_status == 200L)
    assert(a.body_text == "hello world" && a.body_len == 11L)
    assert(a.body_md5 == md5hex("hello world"))
    assert(a.content_length ==
      httpBlock("200 OK", "hello world").getBytes(UTF_8).length.toLong)
    val b = recs(1)
    assert(b.rec_index == 1L)
    assert(b.rec_offset ==
      (r0 + r1 + r2).getBytes(UTF_8).length.toLong)
    assert(b.http_status == 404L && b.body_text == "gone")
  }

  test("UTF-8 bodies: Content-Length and body_len are BYTE counts") {
    val body = "café — déjà"
    val r = record("response", Some("http://u/1"),
      httpBlock("200 OK", body))
    val recs = WarcIngest.parseContainer(0L, r.getBytes(UTF_8))
    assert(recs.length == 1)
    assert(recs.head.body_len == body.getBytes(UTF_8).length.toLong)
    assert(recs.head.body_text == body)
    assert(recs.head.body_md5 == md5hex(body))
  }

  test("truncated container returns the records parsed before the tear") {
    val r1 = record("response", Some("http://a/1"),
      httpBlock("200 OK", "complete"))
    val r2 = record("response", Some("http://a/2"),
      httpBlock("200 OK", "will be torn"))
    val full = (r1 + r2).getBytes(UTF_8)
    val torn = full.take(full.length - 20)
    val recs = WarcIngest.parseContainer(0L, torn)
    assert(recs.length == 1)
    assert(recs.head.body_text == "complete")
    // garbage that never frames parses to zero records, no throw
    assert(WarcIngest.parseContainer(0L,
      "not a warc at all".getBytes(UTF_8)).isEmpty)
    assert(WarcIngest.parseContainer(0L, Array.emptyByteArray).isEmpty)
  }

  test("unparsable Content-Length aborts the walk cleanly") {
    val bad = s"WARC/1.0${CRLF}WARC-Type: response$CRLF" +
      s"Content-Length: xyz$CRLF$CRLF"
    assert(WarcIngest.parseContainer(0L, bad.getBytes(UTF_8)).isEmpty)
  }

  test("synthesized shards round-trip: every doc surfaces once with " +
    "generator-exact offsets") {
    import spark.implicits._
    val docs = Seq(
      (0L, "web", "alpha beta gamma"),
      (5L, "web", "this body is replaced by the 404 variant"),
      (32L, "book", "delta epsilon"),
      (33L, "book", "zeta")
    ).toDF("doc_id", "source", "text")
    val recs = WarcIngest.warcRecords(
      WarcIngest.warcShardsFromDocs(docs, 32)).collect()
    assert(recs.length == 4)
    val byUri = recs.map(r => r.target_uri -> r).toMap
    // doc 0 and doc 32 share shard 0, in doc_id order after the preamble
    val d0 = byUri("http://corpus.example/web/0")
    val d32 = byUri("http://corpus.example/book/32")
    assert(d0.shard_id == 0L && d32.shard_id == 0L)
    assert(d0.rec_index == 0L && d32.rec_index == 1L)
    assert(d0.rec_offset == WarcIngest.InfoPreamble.getBytes(UTF_8).length)
    assert(d32.rec_offset == d0.rec_offset +
      WarcIngest.docRecord(0L, "web", "alpha beta gamma")
        .getBytes(UTF_8).length)
    assert(d0.http_status == 200L && d0.body_text == "alpha beta gamma")
    // doc_id 5 % 31 == 5: the 404 variant with the fixed body
    val d5 = byUri("http://corpus.example/web/5")
    assert(d5.http_status == 404L && d5.body_text == "not found")
    assert(d5.body_md5 == md5hex("not found"))
    val d33 = byUri("http://corpus.example/book/33")
    assert(d33.shard_id == 1L && d33.rec_index == 0L)
  }

  test("generator params: content type threads through, errEvery<=0 " +
    "disables the 404 variant") {
    import spark.implicits._
    // doc_id 5 would be the 404 doc under the default errEvery=31
    val docs = Seq((5L, "web", "<p>hello</p>"))
      .toDF("doc_id", "source", "text")
    val recs = WarcIngest.warcRecords(
      WarcIngest.warcShardsFromDocs(docs, 32, errEvery = 0L,
        contentType = "text/html; charset=utf-8")).collect()
    assert(recs.length == 1)
    assert(recs.head.http_status == 200L,
      "errEvery=0 must disable the 404 variant")
    assert(recs.head.body_text == "<p>hello</p>")
    // the content type is inside the HTTP block the parser frames by
    // Content-Length, so a wrong header would corrupt the framing
    val http = "HTTP/1.1 200 OK" + CRLF +
      "Content-Type: text/html; charset=utf-8" + CRLF +
      "Content-Length: 12" + CRLF + CRLF + "<p>hello</p>"
    assert(recs.head.content_length ==
      http.getBytes(UTF_8).length.toLong)
  }

  test("file-based ingest: binaryFile scan of *.warc parses identically") {
    val dir = java.nio.file.Files.createTempDirectory("warcspec")
    val f = dir.resolve("part0.warc")
    val r1 = record("response", Some("http://f/9"),
      httpBlock("200 OK", "from a file"))
    java.nio.file.Files.write(f,
      (record("warcinfo", None, "software: test\n") + r1).getBytes(UTF_8))
    // a non-matching extension must be ignored by the glob
    java.nio.file.Files.write(dir.resolve("notes.txt"),
      "ignore me".getBytes(UTF_8))
    val recs = WarcIngest.readWarcFiles(spark, dir.toString).collect()
    assert(recs.length == 1)
    assert(recs.head.target_uri == "http://f/9")
    assert(recs.head.body_text == "from a file")
    assert(recs.head.http_status == 200L)
  }

  // ---- gzip containers (r8 verdict item 2) ----

  private def gz(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(s.getBytes(UTF_8)); g.finish(); g.close()
    bos.toByteArray
  }

  test("gzip container: hand-gzipped multi-member walk equals plain") {
    val r0 = record("warcinfo", None, "software: test\n")
    val r1 = record("response", Some("http://g/1"),
      httpBlock("200 OK", "gzipped body one"))
    val r2 = record("response", Some("http://g/2"),
      httpBlock("404 Not Found", "gone"))
    // one gzip member PER record — the Common Crawl layout
    val members = Array(gz(r0), gz(r1), gz(r2))
    val container = members.flatten
    val plain = WarcIngest.parseContainer(3L,
      (r0 + r1 + r2).getBytes(UTF_8))
    val unzipped = WarcIngest.parseContainer(3L, container)
    assert(unzipped == plain,
      "member-gzipped parse must be bit-identical to the plain walk " +
        "(offsets index the inflated stream)")
    assert(unzipped.length == 2)
    assert(unzipped.head.body_text == "gzipped body one")
  }

  test("gzip container: corrupt member tail returns the intact prefix") {
    val r0 = record("warcinfo", None, "software: test\n")
    val r1 = record("response", Some("http://g/1"),
      httpBlock("200 OK", "survives"))
    val r2 = record("response", Some("http://g/2"),
      httpBlock("200 OK", "lost to the tear"))
    val good = gz(r0) ++ gz(r1)
    // tear INSIDE the deflate data (keep header + a third of the
    // stream) — genuine data loss, not just a clipped CRC trailer
    val full = gz(r2)
    val torn = full.take(10 + (full.length - 18) / 3)
    val recs = WarcIngest.parseContainer(1L, good ++ torn)
    assert(recs.map(_.body_text) == Seq("survives"),
      s"expected the intact prefix only, got ${recs.map(_.body_text)}")
  }

  test("gzip member with only a clipped CRC trailer still yields its " +
      "fully-inflated record (recovery-maximal)") {
    val r1 = record("response", Some("http://g/1"),
      httpBlock("200 OK", "all deflate data present"))
    val recs = WarcIngest.parseContainer(1L, gz(r1).dropRight(7))
    assert(recs.map(_.body_text) == Seq("all deflate data present"))
  }

  test("gzip-bomb guard: inflation caps at maxOut and the capped " +
      "prefix still parses (untrusted crawl bytes)") {
    val r1 = record("response", Some("http://g/1"),
      httpBlock("200 OK", "bounded"))
    // a hostile member: 1 MiB of one repeated byte gzips to ~1 KB —
    // the expansion shape a decompression bomb exploits
    val bomb = record("response", Some("http://g/2"),
      httpBlock("200 OK", "A" * (1 << 20)))
    val container = gz(r1) ++ gz(bomb)
    val cap = r1.getBytes(UTF_8).length + 1024
    val inflated = WarcIngest.gunzipMembers(container, cap)
    assert(inflated.length <= cap,
      s"inflation must stop at the cap: ${inflated.length} > $cap")
    // the capped prefix is just another truncated container: the
    // intact record parses, the capped one is dropped cleanly
    val recs = WarcIngest.parseContainer(1L, inflated)
    assert(recs.map(_.body_text) == Seq("bounded"))
    // the default cap never touches a legitimate container
    assert(WarcIngest.gunzipMembers(container).length ==
      r1.getBytes(UTF_8).length + bomb.getBytes(UTF_8).length)
  }

  test("file-based ingest ignores *.warc.tmp / *.warc.bak strays") {
    // mixed directories hold partially-written and editor-backup
    // files; the glob must admit exactly *.warc and *.warc.gz
    val dir = java.nio.file.Files.createTempDirectory("warcglob")
    val recA = record("response", Some("http://a"),
      httpBlock("200 OK", "plain file"))
    val recB = record("response", Some("http://b"),
      httpBlock("200 OK", "gz file"))
    java.nio.file.Files.write(dir.resolve("a.warc"),
      recA.getBytes(UTF_8))
    java.nio.file.Files.write(dir.resolve("b.warc.gz"), gz(recB))
    java.nio.file.Files.write(dir.resolve("c.warc.tmp"),
      recA.getBytes(UTF_8))
    java.nio.file.Files.write(dir.resolve("d.warc.bak"),
      recA.getBytes(UTF_8))
    val texts = WarcIngest.readWarcFiles(spark, dir.toString)
      .collect().map(_.body_text).sorted.toSeq
    assert(texts == Seq("gz file", "plain file"),
      s"stray suffixes must not ingest: $texts")
  }

  test("file-based ingest: *.warc.gz parses identically to *.warc") {
    val dir = java.nio.file.Files.createTempDirectory("warcgz")
    val rec = record("response", Some("http://gz/7"),
      httpBlock("200 OK", "from a gz file"))
    java.nio.file.Files.write(dir.resolve("part0.warc.gz"), gz(rec))
    val recs = WarcIngest.readWarcFiles(spark, dir.toString).collect()
    assert(recs.length == 1 && recs.head.body_text == "from a gz file")
  }

  test("gz shard generator output parses bit-identically to plain") {
    import spark.implicits._
    val docs = Seq(
      (0L, "hello world one", "web", 15L),
      (5L, "this doc is the 404 variant", "web", 27L),
      (7L, "third document text", "news", 19L))
      .toDF("doc_id", "text", "source", "n_chars")
    val plain = WarcIngest.warcRecords(
      WarcIngest.warcShardsFromDocs(docs, 2)).collect().toSet
    val gzed = WarcIngest.warcRecords(
      WarcIngest.warcGzShardsFromDocs(docs, 2)).collect().toSet
    assert(gzed == plain)
  }

  // ---- charset-aware body decode (r8 verdict item 3) ----

  test("latin-1 body with declared charset decodes correctly") {
    // 'café' in ISO-8859-1: the 0xE9 byte is INVALID UTF-8 — the old
    // lenient-UTF-8 decode produced U+FFFD and changed every
    // downstream hash; the declared charset must win
    val bodyBytes = Array[Byte]('c', 'a', 'f', 0xE9.toByte)
    val http = "HTTP/1.1 200 OK" + CRLF +
      "Content-Type: text/plain; charset=iso-8859-1" + CRLF +
      s"Content-Length: ${bodyBytes.length}" + CRLF + CRLF
    val head = s"WARC/1.0${CRLF}WARC-Type: response$CRLF" +
      s"WARC-Target-URI: http://c/1$CRLF" +
      s"Content-Length: ${http.getBytes(UTF_8).length + bodyBytes.length}" +
      CRLF + CRLF
    val bytes = head.getBytes(UTF_8) ++ http.getBytes(UTF_8) ++
      bodyBytes ++ (CRLF + CRLF).getBytes(UTF_8)
    val recs = WarcIngest.parseContainer(0L, bytes)
    assert(recs.length == 1)
    assert(recs.head.body_text == "café",
      s"got '${recs.head.body_text}' — a UTF-8 misdecode would be 'caf�'")
    // the md5 is over RAW bytes, decode-independent
    val md = MessageDigest.getInstance("MD5").digest(bodyBytes)
    assert(recs.head.body_md5 == md.map(b => f"${b & 0xff}%02x").mkString)
    // decode provenance surfaces on the record (q154's rollup keys)
    assert(recs.head.content_type == "text/plain; charset=iso-8859-1")
    assert(recs.head.charset == "iso-8859-1")
  }

  test("meta-tag charset wins when the header declares none") {
    val bodyStr = "<html><head><meta charset='windows-1252'></head>" +
      "<body>café ’quoted’</body></html>"
    val bodyBytes = bodyStr.getBytes(
      java.nio.charset.Charset.forName("windows-1252"))
    val http = "HTTP/1.1 200 OK" + CRLF +
      "Content-Type: text/html" + CRLF +
      s"Content-Length: ${bodyBytes.length}" + CRLF + CRLF
    val head = s"WARC/1.0${CRLF}WARC-Type: response$CRLF" +
      s"WARC-Target-URI: http://c/2$CRLF" +
      s"Content-Length: ${http.getBytes(UTF_8).length + bodyBytes.length}" +
      CRLF + CRLF
    val bytes = head.getBytes(UTF_8) ++ http.getBytes(UTF_8) ++
      bodyBytes ++ (CRLF + CRLF).getBytes(UTF_8)
    val recs = WarcIngest.parseContainer(0L, bytes)
    assert(recs.length == 1 && recs.head.body_text == bodyStr)
  }

  test("undeclared charset: strict UTF-8 first, latin-1 fallback") {
    // valid UTF-8 stays UTF-8
    val utf8Body = "déjà vu — ok"
    val r1 = record("response", Some("http://c/3"),
      s"HTTP/1.1 200 OK${CRLF}Content-Length: " +
        s"${utf8Body.getBytes(UTF_8).length}$CRLF$CRLF" + utf8Body)
    val a = WarcIngest.parseContainer(0L, r1.getBytes(UTF_8))
    assert(a.head.body_text == utf8Body)
    // invalid UTF-8 falls back to latin-1 (total, deterministic)
    val latinBytes = Array[Byte](0xE9.toByte, ' ', 0xFC.toByte)
    val http = s"HTTP/1.1 200 OK${CRLF}Content-Length: 3$CRLF$CRLF"
    val head = s"WARC/1.0${CRLF}WARC-Type: response$CRLF" +
      s"Content-Length: ${http.getBytes(UTF_8).length + 3}$CRLF$CRLF"
    val bytes = head.getBytes(UTF_8) ++ http.getBytes(UTF_8) ++
      latinBytes ++ (CRLF + CRLF).getBytes(UTF_8)
    val b = WarcIngest.parseContainer(0L, bytes)
    assert(b.head.body_text == "é ü")
    assert(b.head.charset == "iso-8859-1" && b.head.content_type == null)
    assert(a.head.charset == "utf-8")
  }
}
