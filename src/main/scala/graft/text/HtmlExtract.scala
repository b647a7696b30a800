package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.SqlShims.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML main-content extraction — the step between WARC segmentation
  * ([[graft.sources.WarcIngest]]) and every text operator in the
  * catalog. A crawler's HTTP bodies are HTML, not clean text; the
  * first text-side operator of a real LLM pipeline is boilerplate
  * removal: pull the title and the paragraph content, drop nav/footer
  * chrome and script/style code, decode entities, and measure link
  * density (the classic content-vs-chrome signal of trafilatura /
  * jusText-style extractors). (The reference pipeline starts from
  * JSON API responses and has no HTML layer; this is brief-driven
  * scale work.)
  *
  * Extraction contract (one native pass, no regex backtracking):
  *   - `title`:  text content of `<title>`, entities decoded.
  *   - `main_text`: text content of each `<p>` element (inline tags
  *     like `<a …>` stripped, their text kept), entities decoded,
  *     paragraphs joined with `\n`. Content OUTSIDE `<p>` — nav,
  *     footer, headers, scripts — is never collected, which is what
  *     makes the extraction boilerplate-robust rather than
  *     strip-all-tags naive.
  *   - `<script>`/`<style>` blocks are skipped as raw text to their
  *     closing tag (their content may contain `<` that is NOT markup
  *     — tag-walking inside them corrupts the parse state).
  *   - `n_links` / `link_text_chars`: `<a>` elements INSIDE `<p>`
  *     content and their decoded text length (code points) — the
  *     numerator of link density; nav/footer links don't count.
  *   - Entities: the named three (`&amp;` `&lt;` `&gt;`) and numeric
  *     references (`&#NN;` / `&#xHH;`, printable BMP scalars) decode;
  *     anything else passes through literally.
  *
  * Scale shape: per-row scan-parallel expression, zero exchanges —
  * the 100 TB cost is one pass over the HTML bytes, embarrassingly
  * parallel, and only the extracted text moves downstream.
  */
object HtmlExtract {

  val extractType: StructType = StructType(Seq(
    StructField("title", StringType, nullable = false),
    StructField("main_text", StringType, nullable = false),
    StructField("n_paragraphs", LongType, nullable = false),
    StructField("n_links", LongType, nullable = false),
    StructField("link_text_chars", LongType, nullable = false)))

  case class HtmlExtractExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = extractType

    override def nullSafeEval(input: Any): Any = {
      val html = input.asInstanceOf[UTF8String].toString
      val n = html.length
      val title = new java.lang.StringBuilder
      val para = new java.lang.StringBuilder
      val paras = scala.collection.mutable.ArrayBuffer.empty[String]
      var inTitle = false
      var inP = false
      var inA = false
      var nLinks = 0L
      var linkChars = 0L
      var i = 0
      while (i < n) {
        val c = html.charAt(i)
        if (c == '<') {
          val j = html.indexOf('>', i + 1)
          if (j < 0) { i = n } // unterminated tag: drop the tail
          else {
            val closing = i + 1 < n && html.charAt(i + 1) == '/'
            val ns = if (closing) i + 2 else i + 1
            var ne = ns
            while (ne < j && html.charAt(ne) != ' ' &&
                   html.charAt(ne) != '\t' && html.charAt(ne) != '/')
              ne += 1
            val name = html.substring(ns, ne)
              .toLowerCase(java.util.Locale.ROOT)
            i = j + 1
            name match {
              case "script" | "style" if !closing =>
                // raw-text element: scan FORWARD for the close tag
                // with a case-insensitive regionMatches walk — never
                // lowercase a copy of the whole document per tag (r8
                // ADVICE item 2: that was O(len × nScripts) time and
                // garbage on real pages)
                val close = "</" + name
                var k = i
                var found = -1
                while (found < 0 && k <= n - close.length) {
                  if (html.regionMatches(true, k, close, 0,
                      close.length)) found = k
                  else k += 1
                }
                if (found < 0) i = n
                else {
                  val endGt = html.indexOf('>', found)
                  i = if (endGt < 0) n else endGt + 1
                }
              case "title" => inTitle = !closing
              case "p" =>
                if (!closing) { inP = true; para.setLength(0) }
                else if (inP) {
                  inP = false; inA = false
                  paras += para.toString
                }
              case "a" =>
                if (inP) {
                  if (!closing) { inA = true; nLinks += 1 }
                  else inA = false
                }
              case _ => ()
            }
          }
        } else if (c == '&') {
          // named (&amp; &lt; &gt;) and numeric (&#NN; / &#xHH;, BMP
          // range) references decode; anything else passes literally
          var decoded = '&'
          var adv = 1
          if (html.startsWith("amp;", i + 1)) { decoded = '&'; adv = 5 }
          else if (html.startsWith("lt;", i + 1)) { decoded = '<'; adv = 4 }
          else if (html.startsWith("gt;", i + 1)) { decoded = '>'; adv = 4 }
          else if (i + 2 < n && html.charAt(i + 1) == '#') {
            val hex = i + 2 < n &&
              (html.charAt(i + 2) == 'x' || html.charAt(i + 2) == 'X')
            val ds = if (hex) i + 3 else i + 2
            var de = ds
            var v = 0L
            while (de < n && v <= 0x10FFFFL && {
              val d = Character.digit(html.charAt(de), if (hex) 16 else 10)
              if (d >= 0) { v = v * (if (hex) 16 else 10) + d; true }
              else false
            }) de += 1
            if (de > ds && de < n && html.charAt(de) == ';' &&
                v >= 0x20 && v <= 0xFFFF &&
                !Character.isSurrogate(v.toChar)) {
              decoded = v.toChar
              adv = de - i + 1
            }
          }
          if (inTitle) title.append(decoded)
          if (inP) {
            para.append(decoded)
            if (inA) linkChars += 1
          }
          i += adv
        } else {
          if (inTitle) title.append(c)
          if (inP) {
            para.append(c)
            // count code POINTS (Spark length()/DuckDB length()
            // semantics): a low surrogate continues the previous
            // point, it is not a new character
            if (inA && !Character.isLowSurrogate(c)) linkChars += 1
          }
          i += 1
        }
      }
      if (inP) paras += para.toString // flush an unclosed trailing <p>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(title.toString),
        UTF8String.fromString(paras.mkString("\n")),
        paras.length.toLong, nLinks, linkChars))
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  def htmlExtract(html: Column): Column =
    toColumn(HtmlExtractExpr(toExpression(html)))

  // ------------------------------------------------------------------
  // Synthetic page generation (test scaffolding): documents render to
  // full pages — chrome, script, entity-escaped paragraph content,
  // in-content links — that the SQL oracle can rebuild the EXTRACTED
  // side of arithmetically (paragraphs are fixed 40-token windows of
  // the original text, links wrap the first token of every third
  // paragraph), so extraction correctness is checked against first
  // principles, never against the extractor itself.
  // ------------------------------------------------------------------

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Render one document as a full synthetic page. Paragraphs are
    * consecutive 40-token windows of `split(text, " ", -1)` (empty
    * tokens kept — join restores the original byte-for-byte);
    * paragraph p with p % 3 == 1 wraps its first token in an in-text
    * link. Chrome (nav/footer links, a script whose body contains a
    * raw `<`) exists to punish strip-all-tags extraction.
    */
  def renderPage(docId: Long, source: String, text: String): String = {
    val toks = text.split(" ", -1)
    val paras = toks.grouped(40).zipWithIndex.map { case (w, p) =>
      val inner =
        if (p % 3 == 1) {
          val rest =
            if (w.length > 1) " " + esc(w.drop(1).mkString(" ")) else ""
          s"""<a href="/doc/$docId/$p">""" + esc(w.head) + "</a>" + rest
        } else esc(w.mkString(" "))
      "<p>" + inner + "</p>"
    }.mkString
    "<html><head><title>" + esc(s"Doc $docId ($source)") +
      "</title><script>var x = 1 < 2 && true;</script></head>" +
      "<body><nav><a href=\"/\">Home</a> <a href=\"/about\">About</a>" +
      "</nav>" + paras +
      "<footer>&copy; " + esc(source) + "</footer></body></html>"
  }

  /** Scale-proportional synthetic page table: one page per document.
    * Per-row map, no shuffle — render cost distributes with the data.
    */
  def pagesFromDocs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("source"), col("text"))
      .as[(Long, String, String)]
      .map { case (id, src, text) =>
        (id, src, renderPage(id, src, text))
      }
      .toDF("doc_id", "source", "html")
  }
}
