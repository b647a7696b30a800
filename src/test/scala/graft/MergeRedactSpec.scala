package graft

import org.apache.spark.sql.functions._
import graft.operators.Merge
import graft.text.Redact
import graft.sim.Similarity

/** Round-5 pipeline operators: PII/pattern scrubbing, SCD2 CDC merge,
  * and the in-engine k-means refinement iteration.
  */
class MergeRedactSpec extends SparkSpec {
  import spark.implicits._

  // ---- Redact ----

  test("scrub redacts every pattern class, in the pinned order") {
    val text = "mail a.b+c@x-y.example.com see https://h.example.com/p/1 " +
      "node 10.2.3.44 dial +1-555-0100 plain words stay"
    val out = Seq(text).toDF("t")
      .select(Redact.scrub($"t").as("r")).as[String].head()
    assert(out == "mail <EMAIL> see <URL> node <IP> dial <PHONE> " +
      "plain words stay")
  }

  test("countMatches counts each class on the original text") {
    val text = "a@b.example.com c@d.example.org http://e.example.com " +
      "1.2.3.4 +12-345-6789 not-an-ip 1.2.3 not-a-phone 555-0100"
    val df = Seq(text).toDF("t").select(
      Redact.countMatches($"t", Redact.EmailRe).as("e"),
      Redact.countMatches($"t", Redact.UrlRe).as("u"),
      Redact.countMatches($"t", Redact.Ipv4Re).as("i"),
      Redact.countMatches($"t", Redact.PhoneRe).as("p"))
    val r = df.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((2L, 1L, 1L, 1L)))
  }

  test("redactStats matches the column-function formulation exactly") {
    // the native single-pass expression must be bit-equal to the 8
    // independent regexp_* expressions it replaces (same java regex,
    // counts on the original text, pinned replacement order)
    val texts = Seq(
      "mail a.b+c@x-y.example.com see https://h.example.com/p/1 " +
        "node 10.2.3.44 dial +1-555-0100 plain words stay",
      "order 7 contact user3@mail-0.example.com visit " +
        "https://shop-2.example.com/o/7 ip 10.7.3.7 call +1-107-1007",
      "a@b.example.com c@d.example.org 1.2.3.4 +12-345-6789 1.2.3",
      "no pii at all", "")
    val df = texts.toDF("t")
    val native = df.select(Redact.redactStats($"t").as("r"))
      .select($"r.n_urls", $"r.n_emails", $"r.n_ips", $"r.n_phones",
        $"r.redacted").collect().toSeq
    val composed = df.select(
      Redact.countMatches($"t", Redact.UrlRe),
      Redact.countMatches($"t", Redact.EmailRe),
      Redact.countMatches($"t", Redact.Ipv4Re),
      Redact.countMatches($"t", Redact.PhoneRe),
      Redact.scrub($"t")).collect().toSeq
    assert(native.map(_.toSeq) == composed.map(_.toSeq))
  }

  test("a URL host never double-counts as an IP or email") {
    val text = "go to https://shop-1.example.com/o/42 now"
    val r = Seq(text).toDF("t").select(
      Redact.countMatches($"t", Redact.Ipv4Re).as("i"),
      Redact.countMatches($"t", Redact.EmailRe).as("e"),
      md5(Redact.scrub($"t")).as("h"),
      md5(lit("go to <URL> now")).as("want")).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L)
    assert(r.getString(2) == r.getString(3))
  }

  test("byte scanners replicate java.util.regex on adversarial fuzz") {
    // redactEval no longer runs a regex engine; this pins its
    // leftmost-greedy equivalence to java.util.regex on inputs built
    // to stress every backtracking corner: over-long octets, dotted
    // runs, multiple '@'s, domain tails with digits after the TLD,
    // phone country-code fallback, URLs hugging emails/IPs, UTF-8
    // multibyte chars adjacent to matches, and word-boundary edges.
    import java.util.regex.Pattern
    import org.apache.spark.unsafe.types.UTF8String
    // The scanners implement RE2 \b semantics (ASCII word chars — what
    // the DuckDB oracle runs), while java.util.regex's \b is
    // Unicode-aware even without UNICODE_CHARACTER_CLASS ('é' counts
    // as a word char). To fuzz non-ASCII adjacency too, the reference
    // rewrites \b as explicit ASCII lookarounds — exactly RE2's rule.
    // DuckDB-verified: regexp_extract_all('é1.2.3.4-', Ipv4Re) → 1
    // match; '日1.2.3.4_x' → 0 (trailing '_' is a word char).
    val pats = Redact.patterns.map { case (t, re) =>
      t -> Pattern.compile(re
        .replace("\\b[", "(?<![A-Za-z0-9_])[")
        .replace("}\\b", "}(?![A-Za-z0-9_])"))
    }
    def reference(s: String): (Seq[Long], String) = {
      val counts = pats.map { case (_, p) =>
        var n = 0L; val m = p.matcher(s); while (m.find()) n += 1; n
      }
      var cur = s
      pats.foreach { case (t, p) =>
        cur = p.matcher(cur).replaceAll(s"<$t>")
      }
      (counts, cur)
    }
    val frags = Seq(
      "http://a.b/c", "https://", "http:/x", "httpss://y", "https://q",
      "a@b.co", "@", "a@b", "x@y.z", "u@d.example.comm9", "a@@b.cd",
      "a.b@c.d.ee", "@.ab", "#+%a@-.-ab-", "1.2.3.4", "12.34.56.789",
      "1234.5.6.7", "1.2.3.4.5", "1.2.3.4x", "_1.2.3.4", "9.9.9.9_",
      "+1-234-5678", "+12-345-6789", "+123-456-7890", "+1-23-4567",
      "+1-234-56789", "ü", "日本", " ", ".", "-", "_", "@x.yz", "..",
      "é1.2.3.4", "a", "7", ":", "//", "http", "https", "+", "-5")
    val rnd = new scala.util.Random(42)
    (0 until 4000).foreach { _ =>
      val s = (0 until rnd.nextInt(8))
        .map(_ => frags(rnd.nextInt(frags.length))).mkString
      val (wantCounts, wantText) = reference(s)
      val row = Redact.redactEval(UTF8String.fromString(s))
      val got = (0 until 4).map(row.getLong)
      val gotText = row.getUTF8String(4).toString
      assert(got == wantCounts && gotText == wantText,
        s"mismatch on <<$s>>: got=$got/$gotText want=$wantCounts/$wantText")
    }
  }

  // ---- Merge.scd2 ----

  private def hist = Seq(
    // key 1: snapshot only
    (1L, "A", 100L, 0),
    // key 2: snapshot + one later change
    (2L, "A", 100L, 0), (2L, "B", 200L, 1),
    // key 3: two same-instant versions — precedence 2 must win —
    // plus a later third version
    (3L, "A", 100L, 0), (3L, "B", 150L, 1), (3L, "C", 150L, 2),
    (3L, "D", 300L, 1)
  ).toDF("k", "status", "valid_from", "prec")

  test("scd2 chains effective ranges and picks same-instant winners") {
    val out = Merge.scd2(hist, Seq("k"), "valid_from", "prec")
      .select($"k", $"status", $"valid_from", $"valid_to", $"is_current")
      .as[(Long, String, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3))
    assert(out.toSeq == Seq(
      (1L, "A", 100L, None, true),
      (2L, "A", 100L, Some(200L), false),
      (2L, "B", 200L, None, true),
      (3L, "A", 100L, Some(150L), false),
      (3L, "C", 150L, Some(300L), false), // B superseded at the instant
      (3L, "D", 300L, None, true)))
  }

  test("scd2 plans exactly one exchange (both windows share it)") {
    val p = Merge.scd2(hist, Seq("k"), "valid_from", "prec")
      .queryExecution.executedPlan.toString
    val n = "(?<!Reused)Exchange".r.findAllIn(p).length
    assert(n == 1, s"expected 1 exchange, got $n:\n${p.take(3000)}")
  }

  // ---- Similarity.kmeansRefine ----

  test("kmeansRefine computes quantized per-cell means and shifts") {
    // two centroids on the unit axes of R^2; vectors cluster cleanly
    val cents = Seq(Array(1.0, 0.0), Array(0.0, 1.0))
    val vecs = Seq(
      (1L, Array(0.9f, 0.1f)), (2L, Array(0.8f, 0.0f)),
      (3L, Array(0.1f, 0.7f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.kmeansRefine(vecs, cents, quantDp = 6)
      .as[(Int, Int, Long, Double, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    def q(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val c00 = (q(0.9f.toDouble) + q(0.8f.toDouble)) / 2
    val c01 = (q(0.1f.toDouble) + q(0.0)) / 2
    assert(out.map(r => (r._1, r._2, r._3)) ==
      Seq((0, 0, 2L), (0, 1, 2L), (1, 0, 1L), (1, 1, 1L)))
    assert(approx(out(0)._4, c00, 1e-6) && approx(out(1)._4, c01, 1e-6))
    // cell 1 holds exactly vector 3 — mean is its quantized components
    assert(approx(out(2)._4, q(0.1f.toDouble), 1e-6))
    assert(approx(out(3)._4, q(0.7f.toDouble), 1e-6))
    // shift = |new - old| against the input centroid literal
    assert(approx(out(0)._5, math.abs(c00 - 1.0), 1e-6))
    assert(approx(out(3)._5, math.abs(q(0.7f.toDouble) - 1.0), 1e-6))
  }

  test("kmeansRefine iterated twice moves centroids toward the data") {
    // refined centroids (iteration 1) must not shift MORE in
    // iteration 2 than the untrained grid did in iteration 1 —
    // Lloyd's monotone-improvement signature on a fixed assignment
    // structure (sf0.001-sized deterministic fixture)
    val vecs = (0 until 200).map { i =>
      val ang = (i % 8) * math.Pi / 4.0 + (i / 8) * 0.001
      (i.toLong, Array(math.cos(ang).toFloat, math.sin(ang).toFloat))
    }.toDF("vec_id", "embedding")
    val g0 = Similarity.gridCentroids(4, 2)
    val r1 = Similarity.kmeansRefine(vecs, g0)
      .select($"cell", $"dim", $"centroid_value", $"shift")
      .as[(Int, Int, Double, Double)].collect()
    val c1: Seq[Array[Double]] = {
      val byCell = r1.groupBy(_._1)
      (0 until 4).map { c =>
        byCell.get(c).map(_.sortBy(_._2).map(_._3)).getOrElse(
          g0(c).map(identity))
      }
    }
    val r2 = Similarity.kmeansRefine(vecs, c1)
      .select($"shift").as[Double].collect()
    assert(r2.max <= r1.map(_._4).max + 1e-9,
      s"iteration 2 max shift ${r2.max} > iteration 1 ${r1.map(_._4).max}")
  }

  // ---- q91 chunk dedup semantics ----

  test("chunk-level dup fraction counts global chunk multiplicity") {
    import graft.text.TextAnalysis
    import org.apache.spark.sql.expressions.Window
    // docs 1 and 2 share their first 32-token chunk; doc 3 is unique
    val shared = (1 to 32).map(i => s"s$i").mkString(" ")
    val df = Seq(
      (1L, shared + " " + (1 to 5).map(i => s"a$i").mkString(" ")),
      (2L, shared + " " + (1 to 5).map(i => s"b$i").mkString(" ")),
      (3L, (1 to 40).map(i => s"c$i").mkString(" "))
    ).toDF("doc_id", "text")
    val ch = df.select($"doc_id",
        explode(TextAnalysis.tokenChunks($"text", 32, 32)).as("c"))
      .select($"doc_id", md5(concat_ws(" ", $"c.chunk_tokens")).as("h"))
    val w = Window.partitionBy($"h")
    val out = ch.withColumn("n", count(lit(1)).over(w))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when($"n" > 1, 1L).otherwise(0L)).as("n_dup"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 2L, 0L)))
  }
}
