package graft

import org.apache.spark.sql.functions._
import graft.text.{BpeApply, TextAnalysis}

/** Vocab-scale BPE apply (r6 verdict item 2): the native greedy
  * min-rank segmentation expression vs an INDEPENDENT sequential
  * reference (apply merges one rank at a time, in order, to
  * exhaustion — the textbook definition the greedy loop optimizes).
  */
class BpeApplySpec extends SparkSpec {
  import spark.implicits._

  /** Sequential rank-order reference: for each merge in rank order,
    * rewrite left-to-right until no occurrence remains. Structurally
    * unlike the expression's min-rank loop — O(|merges|·len) per
    * word, which is exactly why the engine doesn't use it.
    */
  private def refPieces(word: String,
                        merges: Seq[(String, String)]): Int = {
    var syms = {
      val b = Seq.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val n = Character.charCount(word.codePointAt(i))
        b += word.substring(i, i + n); i += n
      }
      b.result()
    }
    merges.foreach { case (a, bSym) =>
      var changed = true
      while (changed) {
        changed = false
        val out = Seq.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == bSym) {
            out += a + bSym; changed = true; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
      }
    }
    syms.length
  }

  private def exprPieces(words: Seq[String]): Map[String, Long] =
    words.toDF("text")
      .withColumn("st", BpeApply.segmentStats(col("text")))
      .select($"text", $"st.n_pieces")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("fuzz: expression == sequential rank-order reference (2000 words)") {
    val rnd = new scala.util.Random(421)
    // biased alphabet so merges fire constantly; includes letters
    // outside a-f, digits, punctuation (never in the table)
    val alpha = "aabbccddeeffghijklmnopqrstuvwxyz09.!"
    val words = (1 to 2000).map { _ =>
      val len = rnd.nextInt(15)
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }.filter(_.nonEmpty).distinct
    val got = exprPieces(words)
    words.foreach { w =>
      val expect = refPieces(w, BpeApply.mergeTable1k)
      assert(got(w) == expect.toLong,
        s"word '$w': expression ${got(w)} != reference $expect")
    }
  }

  test("merge table is >= 1k entries, self-pair-free, well-formed") {
    val t = BpeApply.mergeTable1k
    assert(t.size == 1100)
    assert(t.forall { case (a, b) => a != b })
    assert(t.distinct.size == t.size)
    // well-formed: every multi-char symbol is produced by a
    // LOWER-ranked merge (the greedy == sequential precondition)
    val producedAt = t.zipWithIndex
      .map { case ((a, b), r) => (a + b) -> r }.toMap
    t.zipWithIndex.foreach { case ((a, b), r) =>
      Seq(a, b).filter(_.length > 1).foreach { s =>
        assert(producedAt.contains(s) && producedAt(s) < r,
          s"rank $r uses symbol '$s' not produced by a lower rank")
      }
    }
  }

  test("token/char accounting matches the HOF formulation on real docs") {
    val d = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val tks = TextAnalysis.tokens(col("text"))
    val both = d
      .withColumn("st", BpeApply.segmentStats(col("text")))
      .select($"doc_id", $"st.n_tokens", $"st.n_chars",
        size(tks).cast("long").as("hof_tokens"),
        coalesce(aggregate(transform(tks, w => length(w).cast("long")),
          lit(0L), (a, x) => a + x), lit(0L)).as("hof_chars"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getLong(1) == r.getLong(3), s"n_tokens @ ${r.get(0)}")
      assert(r.getLong(2) == r.getLong(4), s"n_chars @ ${r.get(0)}")
    }
  }

  test("edge cases: empty, whitespace-only, null, astral plane") {
    val rows = Seq("", "   \t\n  ", null, "ab 😀ab cd")
      .toDF("text")
      .withColumn("st", BpeApply.segmentStats(col("text")))
      .select($"st.n_tokens", $"st.n_pieces", $"st.n_chars")
      .collect()
    assert(rows(0).getLong(0) == 0L && rows(0).getLong(1) == 0L)
    assert(rows(1).getLong(0) == 0L && rows(1).getLong(2) == 0L)
    assert(rows(2).getLong(0) == 0L)
    // tokens: "ab", "😀ab", "cd"; the emoji is ONE code point (2
    // UTF-16 units) and never merges; (a,b) and (c,d) merge
    assert(rows(3).getLong(0) == 3L)
    assert(rows(3).getLong(2) == 2L + 3L + 2L)
    assert(rows(3).getLong(1) == 1L + 2L + 1L)
  }

  test("train → apply: greedy segmentation agrees with sequential " +
      "application of a LEARNED merge table") {
    // the end-to-end tokenizer pipeline: learn merges (batched) from
    // the real corpus, apply them with the vocab-scale greedy
    // expression, and check against sequential rank-order application
    // — the well-formedness that makes these equal is a property BPE
    // training guarantees (a merge can only consume symbols that
    // already exist when its round counts pairs)
    val d = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val (learned, _) = graft.text.BpeLearn
      .learnMergesBatched(d, nMerges = 24, batchSize = 8)
    val table = learned.map(m => (m.sym_a, m.sym_b))
    assert(table.size == 24)
    val producedAt = table.zipWithIndex
      .map { case ((a, b), r) => (a + b) -> r }.toMap
    table.zipWithIndex.foreach { case ((a, b), r) =>
      Seq(a, b).filter(_.length > 1).foreach { s =>
        assert(producedAt.contains(s) && producedAt(s) < r,
          s"learned rank $r uses unproduced symbol '$s'")
      }
    }
    val words = d.select(explode(TextAnalysis.tokens(col("text")))
        .as("w")).distinct().collect().map(_.getString(0)).toSeq
    val got = words.toDF("text")
      .withColumn("st", BpeApply.segmentStats(col("text"), table))
      .select($"text", $"st.n_pieces")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach { w =>
      assert(got(w) == refPieces(w, table).toLong,
        s"learned-table apply diverges on '$w'")
    }
  }

  test("piece counts are invariant to |merges| table padding (flatness)") {
    // appending 10k never-matching merges must not change any result
    // (the loop is lookup-driven — table size is not in the hot path)
    val padded = BpeApply.mergeTable1k ++
      (0 until 10000).map(i => (s"Q$i", s"Z$i"))
    val words = Seq("table", "window", "customer", "aggregation")
    val base = exprPieces(words)
    val withPad = words.toDF("text")
      .withColumn("st", BpeApply.segmentStats(col("text"), padded))
      .select($"text", $"st.n_pieces")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach(w => assert(base(w) == withPad(w)))
  }
}
