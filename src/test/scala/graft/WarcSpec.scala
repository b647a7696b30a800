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
}
