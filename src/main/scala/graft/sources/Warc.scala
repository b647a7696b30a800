package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) record segmentation — the crawl-layer
  * ingest step UPSTREAM of every text operator in the catalog. A real
  * LLM data pipeline does not start from a clean `documents` table; it
  * starts from multi-gigabyte WARC containers holding concatenated
  * HTTP response records, and the first distributed operator is
  * exactly this: split each container into records, parse the record
  * and HTTP headers, and emit (uri, status, payload) rows. (The
  * reference pipeline ingests JSON API responses —
  * reference `src/ingestion.py:32-54` — and has no crawl layer; this
  * is brief-driven scale work.)
  *
  * Scope (the codec-seam discipline of [[graft.multimodal.Multimodal]]):
  * WARC/1.0, CRLF header lines, `Content-Length`-delimited blocks,
  * `response` records carrying `application/http` payloads; records of
  * other WARC-Types are walked over (their length still comes from the
  * real header parse) but not emitted. Gzip containers — the actual
  * Common Crawl delivery format, one gzip member per record
  * concatenated into `*.warc.gz` — are detected by magic bytes and
  * member-wise inflated inside the same partition-local walk
  * ([[gunzipMembers]]); record offsets are positions in the inflated
  * stream, so plain and gzipped forms of one container parse
  * identically. Malformed framing — a missing version line, an
  * unparsable Content-Length, a truncated block, a corrupt gzip
  * member — aborts the walk at that point and returns what was parsed
  * before it, so one corrupt container tail cannot poison a batch.
  *
  * Body decode is charset-aware ([[decodeBody]]): the HTTP
  * Content-Type `charset=` parameter wins, then an HTML5-style
  * prescan of the first 1024 bytes for a `<meta charset>` /
  * `http-equiv` declaration; with no declaration the body is decoded
  * as strict UTF-8 and falls back to ISO-8859-1 when invalid (every
  * byte sequence is valid latin-1, so the fallback is total).
  * Supported names: the UTF-8/ISO-8859-1/windows-1252/US-ASCII
  * family; anything else takes the sniff-then-fallback path —
  * deliberately minimal, documented, and deterministic.
  *
  * Scale shape: parsing is partition-local (`mapPartitions`), one
  * record walk per container, payload bytes never shuffle — the
  * emitted rows carry header-derived integers plus an md5 of the HTTP
  * body, never the body itself (body text extraction is a separate
  * projection, [[WarcIngest.warcRecords]] keeps it opt-in). A 1000-
  * executor cluster reading 100 TB of *.warc files gets one task per
  * container split via `spark.read.format("binaryFile")` —
  * [[WarcIngest.readWarcFiles]] — with identical per-record results.
  */
object WarcIngest {

  final case class WarcRecord(
      shard_id: Long,
      rec_index: Long,
      rec_offset: Long,
      target_uri: String,
      content_length: Long,
      http_status: Long,
      body_len: Long,
      body_md5: String,
      body_text: String,
      content_type: String,
      charset: String)

  private val CRLF = "\r\n"

  /** True when the container starts with the gzip magic (RFC 1952). */
  private[sources] def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && bytes(0) == 0x1f.toByte && bytes(1) == 0x8b.toByte

  /** Hard ceiling on inflated container size. Crawl data is UNTRUSTED
    * third-party bytes: gzip's format allows ~1032:1 expansion, so a
    * hostile ~1 MB member could otherwise balloon into a ~1 GB
    * executor allocation (a classic decompression bomb) while the
    * plain-WARC path's memory stays bounded by its input. 256 MB is
    * ~4× the largest container a sane sharder emits and far above any
    * legitimate WARC member; a container that blows past it aborts
    * with its intact prefix, like every other malformed-framing path.
    */
  private[graft] val MaxInflatedBytes: Int = 256 << 20

  /** Inflate a (possibly multi-member — the `.warc.gz` layout is one
    * member per record) gzip stream, partition-locally. Truncation
    * recovery mirrors the plain walk's: a corrupt or truncated member
    * stops inflation there and returns the bytes already produced, so
    * the record walk parses the intact prefix. `GZIPInputStream`
    * consumes concatenated members natively and verifies each
    * member's CRC32. Output is capped at `maxOut` (gzip-bomb guard):
    * hitting the cap stops inflation and returns the capped prefix.
    */
  private[graft] def gunzipMembers(bytes: Array[Byte],
      maxOut: Int = MaxInflatedBytes): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(
      math.max(64, math.min(bytes.length * 4L, maxOut.toLong).toInt))
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes), 64 * 1024)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0 && out.size < maxOut) {
        out.write(buf, 0, math.min(n, maxOut - out.size))
        n = in.read(buf)
      }
    } catch { case _: java.io.IOException => () }
    out.toByteArray
  }

  /** Parse one WARC container (plain or gzipped — see [[isGzip]]).
    * Returns emitted `response` records in offset order; `shard_id`
    * is caller-provided provenance (file or shard id), `body_text` is
    * the HTTP body decoded charset-aware ([[decodeBody]]) — the
    * downstream text-pipeline hand-off.
    */
  def parseContainer(shardId: Long, raw: Array[Byte]): Seq[WarcRecord] = {
    val bytes = if (isGzip(raw)) gunzipMembers(raw) else raw
    val md = MessageDigest.getInstance("MD5")
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = 0
    var recIndex = 0L
    while (pos < bytes.length) {
      val recOffset = pos
      // --- WARC version line ---
      val vLine = readLine(bytes, pos)
      if (vLine == null || !vLine._1.startsWith("WARC/")) return out.toSeq
      pos = vLine._2
      // --- WARC named fields until the blank line ---
      var warcType: String = null
      var targetUri: String = null
      var contentLength = -1L
      var headerOk = true
      var blank = false
      while (!blank && headerOk) {
        val l = readLine(bytes, pos)
        if (l == null) headerOk = false
        else {
          pos = l._2
          val line = l._1
          if (line.isEmpty) blank = true
          else {
            val ci = line.indexOf(':')
            if (ci < 0) headerOk = false
            else {
              val k = line.substring(0, ci).trim.toLowerCase
              val v = line.substring(ci + 1).trim
              k match {
                case "warc-type"       => warcType = v
                case "warc-target-uri" => targetUri = v
                case "content-length" =>
                  contentLength =
                    try v.toLong catch { case _: NumberFormatException => -1L }
                case _ => ()
              }
            }
          }
        }
      }
      if (!headerOk || contentLength < 0 ||
          pos + contentLength > bytes.length) return out.toSeq
      val blockStart = pos
      pos += contentLength.toInt
      // the two record-terminating CRLFs (tolerate a truncated tail)
      var t = 0
      while (t < 4 && pos < bytes.length &&
             (bytes(pos) == '\r' || bytes(pos) == '\n')) { pos += 1; t += 1 }
      if (warcType == "response") {
        // --- HTTP status line + headers inside the block ---
        val sLine = readLine(bytes, blockStart)
        val status: Long =
          if (sLine != null && sLine._1.startsWith("HTTP/")) {
            val parts = sLine._1.split(" ")
            if (parts.length >= 2)
              try parts(1).toLong catch { case _: NumberFormatException => 0L }
            else 0L
          } else 0L
        var bp = if (sLine == null) blockStart else sLine._2
        var httpBlank = false
        var httpContentType: String = null
        while (!httpBlank && bp < blockStart + contentLength) {
          val l = readLine(bytes, bp)
          if (l == null) httpBlank = true
          else {
            bp = l._2
            if (l._1.isEmpty) httpBlank = true
            else {
              val ci = l._1.indexOf(':')
              if (ci > 0 &&
                  l._1.substring(0, ci).trim
                    .equalsIgnoreCase("content-type"))
                httpContentType = l._1.substring(ci + 1).trim
            }
          }
        }
        val bodyLen = (blockStart + contentLength - bp).max(0L)
        val body = new Array[Byte](bodyLen.toInt)
        System.arraycopy(bytes, bp.toInt, body, 0, bodyLen.toInt)
        md.reset()
        val digest = md.digest(body)
        val hex = digest.map(b => f"${b & 0xff}%02x").mkString
        val (text, cs) = decodeBodyWithCharset(body, httpContentType)
        out += WarcRecord(shardId, recIndex, recOffset.toLong, targetUri,
          contentLength, status, bodyLen, hex, text,
          httpContentType, cs)
        recIndex += 1
      }
    }
    out.toSeq
  }

  /** Resolve a declared charset name to a supported JDK charset.
    * Whitelisted (determinism over completeness): the UTF-8 family,
    * the latin-1 family, windows-1252 (the HTML5 superset of
    * latin-1 — decoded as itself, not approximated), US-ASCII.
    * Unknown names return None → the caller's sniff/fallback path.
    */
  private def namedCharset(name: String)
      : Option[java.nio.charset.Charset] = {
    val n = name.trim.stripPrefix("\"").stripSuffix("\"")
      .stripPrefix("'").stripSuffix("'").toLowerCase
    n match {
      case "utf-8" | "utf8" =>
        Some(UTF_8)
      case "iso-8859-1" | "iso8859-1" | "latin-1" | "latin1" |
           "l1" | "iso_8859-1" =>
        Some(java.nio.charset.StandardCharsets.ISO_8859_1)
      case "windows-1252" | "cp1252" | "cp-1252" =>
        Some(java.nio.charset.Charset.forName("windows-1252"))
      case "us-ascii" | "ascii" =>
        Some(java.nio.charset.StandardCharsets.US_ASCII)
      case _ => None
    }
  }

  /** Extract the `charset=` parameter from a Content-Type value.
    * Compiled-once regex: case-insensitive, anchored at a parameter
    * boundary (start / `;` / `,` / whitespace) so a token merely
    * ENDING in "charset" never binds, and matched on the ORIGINAL
    * string — a locale-insensitive-lowercase copy can change string
    * LENGTH (e.g. U+0130) and misalign index math.
    */
  private val CharsetParamRe = java.util.regex.Pattern.compile(
    "(?i)(?:^|[;,\\s])charset\\s*=\\s*([^;\\s>]+)")

  private def charsetParam(contentType: String)
      : Option[java.nio.charset.Charset] = {
    val m = CharsetParamRe.matcher(contentType)
    if (m.find()) namedCharset(m.group(1)) else None
  }

  /** HTML5-style charset prescan of the first 1024 body bytes
    * (decoded as latin-1, which is total, for the scan itself):
    * `<meta charset="...">` or
    * `<meta http-equiv="content-type" content="...; charset=...">`.
    */
  private val MetaCharsetRe =
    """(?i)<meta[^>]*charset\s*=\s*["']?([A-Za-z0-9_\-]+)""".r

  private def metaCharset(body: Array[Byte])
      : Option[java.nio.charset.Charset] = {
    val n = math.min(body.length, 1024)
    val head = new String(body, 0, n,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    MetaCharsetRe.findFirstMatchIn(head)
      .flatMap(m => namedCharset(m.group(1)))
  }

  /** Charset-aware body decode (r8 verdict item 3): HTTP header
    * `charset=` wins, then the meta prescan; undeclared bodies decode
    * as STRICT UTF-8 with an ISO-8859-1 fallback when invalid (latin-1
    * is total over bytes, so the fallback never throws and never
    * silently mangles valid UTF-8 — the old behavior decoded
    * EVERYTHING as lenient UTF-8, turning latin-1 bytes into U+FFFD).
    */
  private[sources] def decodeBody(body: Array[Byte],
                                  contentType: String): String =
    decodeBodyWithCharset(body, contentType)._1

  /** [[decodeBody]] plus the RESOLVED charset's canonical lowercase
    * name — the decode-provenance label a crawl datacard rolls up
    * (q154): the declared/sniffed charset when present, else
    * "utf-8" for a clean strict decode or "iso-8859-1" for the
    * total fallback.
    */
  private[sources] def decodeBodyWithCharset(body: Array[Byte],
      contentType: String): (String, String) = {
    val declared = Option(contentType).flatMap(charsetParam)
      .orElse(metaCharset(body))
    declared match {
      case Some(cs) =>
        (new String(body, cs),
          cs.name().toLowerCase(java.util.Locale.ROOT))
      case None =>
        try {
          val dec = UTF_8.newDecoder()
            .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
            .onUnmappableCharacter(
              java.nio.charset.CodingErrorAction.REPORT)
          (dec.decode(java.nio.ByteBuffer.wrap(body)).toString, "utf-8")
        } catch {
          case _: java.nio.charset.CharacterCodingException =>
            (new String(body,
              java.nio.charset.StandardCharsets.ISO_8859_1),
              "iso-8859-1")
        }
    }
  }

  /** Read a CRLF-terminated ASCII line starting at `pos`; returns
    * (line-without-CRLF, position-after-CRLF) or null at EOF / no
    * terminator before EOF.
    */
  private def readLine(bytes: Array[Byte], pos: Int): (String, Int) = {
    if (pos >= bytes.length) return null
    var i = pos
    while (i + 1 < bytes.length &&
           !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
    if (i + 1 >= bytes.length) null
    else (new String(bytes, pos, i - pos, UTF_8), i + 2)
  }

  /** Segment a container table (shard_id, payload binary) into records.
    * Partition-local: one walk per container, no shuffle, payloads
    * never leave the partition that read them.
    */
  def warcRecords(containers: DataFrame): Dataset[WarcRecord] = {
    val spark = containers.sparkSession
    import spark.implicits._
    containers.select(col("shard_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        parseContainer(id, payload)
      })
  }

  /** File-based ingest: every *.warc / *.warc.gz under `path` becomes
    * one container row (shard_id = a stable hash of the file path),
    * then [[warcRecords]] segments it — gzip is detected per
    * container by magic bytes, so mixed directories work. The
    * production entry point — the synthesized-container path exists
    * so the catalog query can be oracle-checked without binary
    * fixtures in testdata.
    */
  def readWarcFiles(spark: org.apache.spark.sql.SparkSession,
                    path: String): Dataset[WarcRecord] = {
    val files = spark.read.format("binaryFile")
      // exact suffix alternation, NOT "*.warc*": a mixed directory's
      // partially-written *.warc.tmp / editor *.warc.bak files must
      // never ingest (Hadoop glob syntax supports {a,b} alternation)
      .option("pathGlobFilter", "*.{warc,warc.gz}").load(path)
      .select(xxhash64(col("path")).as("shard_id"),
        col("content").as("payload"))
    warcRecords(files)
  }

  // ------------------------------------------------------------------
  // Synthetic container generation (test scaffolding, not the operator
  // under test): documents become HTTP response records whose bytes
  // the SQL oracle can rebuild arithmetically — string concatenation
  // plus strlen — so every offset, length, status, and body md5 the
  // parser emits is independently recomputed from first principles.
  // ------------------------------------------------------------------

  /** The constant warcinfo preamble opening every synthetic container:
    * the parser must WALK it (its Content-Length is real) without
    * emitting it.
    */
  val InfoPreamble: String =
    "WARC/1.0" + CRLF +
      "WARC-Type: warcinfo" + CRLF +
      "Content-Length: 16" + CRLF + CRLF +
      "software: graft\n" + CRLF + CRLF

  /** Build one synthetic response record's bytes for a doc. Every
    * `errEvery`-th doc (doc_id % errEvery == 5) is a 404 with a fixed
    * short body — the status-dispatch case; `errEvery <= 0` disables
    * the variant (every record a 200).
    */
  def docRecord(docId: Long, source: String, text: String,
                errEvery: Long = 31L,
                contentType: String = "text/plain; charset=utf-8")
      : String = {
    val is404 = errEvery > 0 && docId % errEvery == 5
    val body = if (is404) "not found" else text
    val status = if (is404) "404 Not Found" else "200 OK"
    val http = "HTTP/1.1 " + status + CRLF +
      "Content-Type: " + contentType + CRLF +
      "Content-Length: " + utf8Len(body) + CRLF + CRLF + body
    val uri = s"http://corpus.example/$source/$docId"
    "WARC/1.0" + CRLF +
      "WARC-Type: response" + CRLF +
      "WARC-Target-URI: " + uri + CRLF +
      "Content-Length: " + utf8Len(http) + CRLF + CRLF +
      http + CRLF + CRLF
  }

  private def utf8Len(s: String): Int = s.getBytes(UTF_8).length

  /** Scale-proportional synthetic container table: docs hash into
    * `nShards` containers (doc_id % nShards), records concatenated in
    * doc_id order behind a warcinfo preamble. The grouping exchange
    * moves each doc's text ONCE to assemble its container — generator
    * cost, not parser cost; production reads real files via
    * [[readWarcFiles]].
    */
  /** ONE shard-assembly implementation for both container layouts:
    * `encode` wraps each record's bytes (identity for plain WARC,
    * [[gzipMember]] for the member-per-record `.warc.gz` layout), so
    * the two public generators can never drift in shard keying, doc
    * order, the 404 variant, or the content-type knob.
    */
  private def shardsFromDocs(docs: DataFrame, nShards: Int,
                             errEvery: Long,
                             contentTypeOf: Long => String,
                             encode: Array[Byte] => Array[Byte])
      : DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select((col("doc_id") % nShards).cast("long").as("shard_id"),
        col("doc_id").cast("long"), col("source"), col("text"))
      .as[(Long, Long, String, String)]
      .groupByKey(_._1)
      .mapGroups { (shard, rows) =>
        val recs = rows.toArray.sortBy(_._2)
        val bos = new java.io.ByteArrayOutputStream()
        bos.write(encode(InfoPreamble.getBytes(UTF_8)))
        recs.foreach { case (_, id, src, text) =>
          bos.write(encode(
            docRecord(id, src, text, errEvery, contentTypeOf(id))
              .getBytes(UTF_8)))
        }
        (shard, bos.toByteArray)
      }
      .toDF("shard_id", "payload")
  }

  def warcShardsFromDocs(docs: DataFrame, nShards: Int = 32,
                         errEvery: Long = 31L,
                         contentType: String =
                           "text/plain; charset=utf-8",
                         contentTypeOf: Long => String = null)
      : DataFrame = {
    val ctf: Long => String =
      if (contentTypeOf == null) _ => contentType else contentTypeOf
    shardsFromDocs(docs, nShards, errEvery, ctf, identity)
  }

  /** Gzip one record's bytes as ONE gzip member (the `.warc.gz`
    * member-per-record layout).
    */
  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(bytes.length / 2 + 32)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.finish(); gz.close()
    bos.toByteArray
  }

  /** [[warcShardsFromDocs]] in the Common Crawl delivery format: the
    * SAME records, each compressed as its own gzip member and the
    * members concatenated — so the parse output (offsets included:
    * they index the inflated stream) is bit-identical to the plain
    * container's, and q152 can share q147's arithmetic oracle.
    */
  def warcGzShardsFromDocs(docs: DataFrame, nShards: Int = 32,
                           errEvery: Long = 31L,
                           contentType: String =
                             "text/plain; charset=utf-8",
                           contentTypeOf: Long => String = null)
      : DataFrame = {
    val ctf: Long => String =
      if (contentTypeOf == null) _ => contentType else contentTypeOf
    shardsFromDocs(docs, nShards, errEvery, ctf, gzipMember)
  }
}
