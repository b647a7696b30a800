package graft

import org.apache.spark.sql.functions._
import graft.forecast.Models
import graft.text.TextAnalysis
import graft.text.TextStatsExpression.textStats

/** Text-analysis operators and the MLlib forecasting surface. */
class TextForecastSpec extends SparkSpec {
  import spark.implicits._

  test("token stats: HOF and native single-pass agree") {
    val df = Seq("the quick  brown fox", "", "  a  b ", "one")
      .toDF("text")
    val withSt = df.withColumn("st", textStats($"text")).select(
      TextAnalysis.tokenCount($"text").cast("long").as("hof_n"),
      col("st.n_tokens").as("nat_n"),
      TextAnalysis.avgTokenLength($"text").as("hof_avg"),
      when(col("st.n_tokens") > 0,
        col("st.total_token_len").cast("double") / col("st.n_tokens"))
        .as("nat_avg"))
    withSt.collect().foreach { r =>
      assert(r.getAs[Long]("hof_n") == r.getAs[Long]("nat_n"))
      val h = Option(r.getAs[java.lang.Double]("hof_avg"))
      val n = Option(r.getAs[java.lang.Double]("nat_avg"))
      assert(h.isEmpty == n.isEmpty)
      h.zip(n).foreach { case (a, b) => assert(approx(a, b)) }
    }
  }

  test("stopword ratio and quality score agree between paths") {
    val df = Seq("the cat and the dog in a house").toDF("text")
      .withColumn("st", textStats($"text"))
    val r = df.select(
      TextAnalysis.stopwordRatio($"text").as("hof"),
      (col("st.n_stop").cast("double") / col("st.n_tokens")).as("nat"))
      .collect().head
    assert(approx(r.getAs[Double]("hof"), r.getAs[Double]("nat")))
    // 8 tokens: the, and, the, in, a are stopwords -> 5/8
    assert(approx(r.getAs[Double]("nat"), 5.0 / 8.0))
  }

  test("langId trigram cosine: clear text, compounds, short text") {
    // clear-language fixtures, plus the marker-word failure cases the
    // r5 verdict called out: German compounds / French plurals /
    // Spanish text containing NO marker word as a standalone token
    // (the old vote returned 'und' for all three), and short text
    val df = Seq(
      "the cat and the dog of the house",  // en, both designs
      "le chat et la maison",              // fr, both designs
      "der hund und die katze",            // de, both designs
      "xyz qqq www",                       // no profile hits -> und
      "schneller verstehen",               // de compounds; marker: und
      "les enfants chantent ensemble",     // fr plural; marker: und
      "buenos dias a todos los vecinos",   // es no-marker; marker: und
      "the cat"                            // short en
    ).toDF("text").select(TextAnalysis.langId($"text").as("l"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("en", "fr", "de", "und", "de", "fr", "es", "en"))
  }

  test("property: native langId matches an independent trigram-cosine " +
      "model on random mixed-language soups") {
    // differential check of the packed-long native expression against
    // an INDEPENDENT String-keyed model of the same contract: count
    // all length-3 windows of ' '+lower(text)+' ', integer dot with
    // each profile, one rounded float cosine, strict-> argmax with
    // first-wins ties, 'und' when no profile trigram hits
    import graft.functions.PortableRound
    val gen = org.scalacheck.Gen.listOfN(10, org.scalacheck.Gen.oneOf(
      "the", "and", "of", "el", "la", "que", "le", "et", "der", "und",
      "die", "cat", "DOG", "xyz", "niño", "straße", "l'eau", "q",
      "entwicklung", "information", "", "2.5", "---"))
      .map(_.mkString(" "))
    def model(text: String): String = {
      val p = " " + text.toLowerCase(java.util.Locale.ROOT) + " "
      val counts = (0 to p.length - 3).map(i => p.substring(i, i + 3))
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val n2 = counts.values.map(v => v * v).sum
      val scores = TextAnalysis.defaultTrigramProfiles.map {
        case (lang, prof) =>
          val dot = prof.map { case (t, w) =>
            counts.getOrElse(t, 0L) * w }.sum
          val l2 = prof.map(tw => tw._2.toDouble * tw._2).sum
          lang -> (if (dot > 0)
            PortableRound.proundScala(
              dot.toDouble / math.sqrt(n2.toDouble * l2), 6)
          else 0.0)
      }
      val best = scores.map(_._2).max
      if (best <= 0) "und"
      else scores.find(_._2 == best).get._1
    }
    val texts = Iterator.continually(gen.sample).flatten.take(80).toSeq
    val got = texts.toDF("text")
      .select(TextAnalysis.langId($"text").as("l"))
      .collect().map(_.getString(0)).toSeq
    texts.zip(got).foreach { case (t, g) =>
      assert(g == model(t), s"langId('$t') = $g, model says ${model(t)}")
    }
  }

  test("property: winnowing invariant under whitespace/case noise, " +
      "size-bounded, sorted-distinct") {
    val word = org.scalacheck.Gen.listOfN(6,
      org.scalacheck.Gen.alphaLowerChar).map(_.mkString)
    val gen = org.scalacheck.Gen.chooseNum(0, 8).flatMap(n =>
      org.scalacheck.Gen.listOfN(n, word).map(_.mkString(" ")))
    val texts = Iterator.continually(gen.sample).flatten.take(40).toSeq
    val noisy = texts.map(t =>
      "  " + t.toUpperCase(java.util.Locale.ROOT).replace(" ", " \t ")
        + "\n")
    val fp = (ts: Seq[String]) => ts.toDF("text")
      .select(TextAnalysis.winnowingFingerprints($"text").as("f"))
      .collect().map(_.getSeq[String](0).toList)
    val a = fp(texts)
    val b = fp(noisy)
    texts.indices.foreach { i =>
      // normalization: whitespace runs + case never change the set
      assert(a(i) == b(i), s"fps changed under noise for '${texts(i)}'")
      assert(a(i) == a(i).distinct.sorted, "output not sorted-distinct")
      val n = texts(i).trim.replaceAll("\\s+", " ").length
      val grams = if (n >= 8) n - 7 else 1
      val bound = math.max(1, grams - 3)
      assert(a(i).nonEmpty && a(i).size <= bound,
        s"|fps|=${a(i).size} outside (0, $bound] for '${texts(i)}'")
    }
  }

  test("BPE-ish token count splits letter/digit/punct runs") {
    val df = Seq("hello world 123 foo-bar!", "", "a1b2").toDF("text")
      .select(TextAnalysis.bpeTokenCount($"text").as("n"))
    val got = df.collect().map(_.getInt(0)).toSeq
    // "hello"," world"," 123"," foo","-","bar","!" = 7; ""=0;
    // "a1b2" -> a,1,b,2 = 4
    assert(got == Seq(7, 0, 4))
  }

  test("winnowing fingerprints: shifted text shares most hashes") {
    val base = "the quick brown fox jumps over the lazy dog again"
    val df = Seq(
      (1L, base),
      (2L, "PREFIX " + base),   // shifted content
      (3L, "totally different words entirely unrelated content here")
    ).toDF("id", "text").select($"id",
      TextAnalysis.winnowingFingerprints($"text").as("fp"))
    val fps = df.collect().map(r =>
      r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val overlap12 = fps(1L).intersect(fps(2L)).size.toDouble /
      fps(1L).union(fps(2L)).size
    val overlap13 = fps(1L).intersect(fps(3L)).size.toDouble /
      fps(1L).union(fps(3L)).size
    assert(overlap12 > 0.5, s"shifted overlap $overlap12")
    assert(overlap13 < 0.1, s"unrelated overlap $overlap13")
  }

  test("shingles produce n-grams or the whole doc when short") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(TextAnalysis.shingles($"text", 3).as("s"))
    val got = df.collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq("a b"))
  }

  test("linear model recovers a linear relationship") {
    val data = (1 to 200).map { i =>
      val x1 = i % 17.0; val x2 = i % 7.0; val x3 = i % 3.0
      ("p", x1, x2, x3, 2.0 * x1 + 0.5 * x2 - x3 + 1.0)
    }.toDF("player", "points_rolling_avg", "rebounds_rolling_avg",
      "assists_rolling_avg", "target_points")
    val model = Models.train(data, "linear")
    val pred = Models.predict(model, data)
      .select(abs(col("prediction") - col("target_points")).as("err"))
      .agg(max("err")).collect().head.getDouble(0)
    assert(pred < 1e-6)
  }

  test("random forest trains deterministically with seed 42") {
    val data = (1 to 100).map { i =>
      ("p", i % 13.0, i % 5.0, i % 3.0, (i % 13) * 2.0)
    }.toDF("player", "points_rolling_avg", "rebounds_rolling_avg",
      "assists_rolling_avg", "target_points")
    val p1 = Models.predict(Models.train(data, "random_forest"), data)
      .select(sum("prediction")).collect().head.getDouble(0)
    val p2 = Models.predict(Models.train(data, "random_forest"), data)
      .select(sum("prediction")).collect().head.getDouble(0)
    assert(p1 == p2)
  }

  test("invalid model type throws") {
    val data = Seq(("p", 1.0, 1.0, 1.0, 1.0))
      .toDF("player", "points_rolling_avg", "rebounds_rolling_avg",
        "assists_rolling_avg", "target_points")
    assertThrows[IllegalArgumentException](Models.train(data, "xgboost"))
  }

  test("normText folds NFC form, case, and whitespace drift") {
    import spark.implicits._
    import graft.text.NormalizeExpression.normText
    val rows = Seq(
      ("pre", "Caf\u00e9  du  Monde"),          // precomposed, ragged ws
      ("dec", "cafe\u0301 du monde"),           // decomposed + acute
      ("pad", "\tcaf\u00e9 du monde \n"),     // leading/trailing ws
      ("nul", null)).toDF("k", "t")
    val got = rows.select($"k", normText($"t").as("n"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("pre") == "caf\u00e9 du monde")
    assert(got("dec") == "caf\u00e9 du monde") // composed by NFC
    assert(got("pad") == "caf\u00e9 du monde")
    assert(got("nul") == null)
    // SQL surface parity
    graft.GraftExtensions.register(spark)
    val viaSql = rows.filter($"t".isNotNull)
      .selectExpr("graft_norm_text(t) AS n")
      .collect().map(_.getString(0)).distinct
    assert(viaSql.toSeq == Seq("caf\u00e9 du monde"))
  }

  test("BPE apply: piece counts under the pinned merge table") {
    // hand-applied chain (priority order, replace-all per merge):
    //   the    t h e -> th e -> the                      = 1 piece
    //   value  v a l u e -> va -> val -> valu -> value   = 1
    //   row    r o w -> ro w -> row                      = 1
    //   fast   f a s t -> (s t) f a st -> fa st -> fast  = 1
    //   key    k e y -> (e y) k ey -> key                = 1
    //   window w i n d o w -> w in d o w -> w in d ow    = 4
    //   scan   s c a n -> s c an                         = 3
    //   a      single char, no merge                     = 1
    val expect = Map("the" -> 1, "value" -> 1, "row" -> 1, "fast" -> 1,
      "key" -> 1, "window" -> 4, "scan" -> 3, "a" -> 1)
    val got = expect.keys.toSeq.toDF("w")
      .select($"w", TextAnalysis.bpePieceCount($"w").as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == expect)
    // a reference scalar implementation of the same chain, fuzzed over
    // random lowercase words \u2014 guards the column expression against
    // regex/replace edge cases (overlaps resolve leftmost-first in
    // both paths)
    def refPieces(w: String): Int = {
      var s = w.toCharArray.mkString(" ")
      TextAnalysis.defaultBpeMerges.foreach { case (f, t) =>
        s = s.replace(f, t)
      }
      s.split(" ").length
    }
    val rnd = new scala.util.Random(42)
    val words = Seq.fill(200)(
      (1 to (1 + rnd.nextInt(10))).map(_ =>
        ('a' + rnd.nextInt(26)).toChar).mkString)
    val fuzz = words.toDF("w")
      .select($"w", TextAnalysis.bpePieceCount($"w").as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1))
    fuzz.foreach { case (w, n) => assert(n == refPieces(w), s"word=$w") }
  }

  test("CDC chunks: lossless, O(n) roll == window sums, edit-stable") {
    import spark.implicits._
    import graft.text.CdcExpression
    val rnd = new scala.util.Random(7)
    val base = (0 until 120).map(_ =>
      ('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(2)))
      .mkString(" ")
    def chunksOf(s: String): Seq[String] =
      Seq(s).toDF("t")
        .select(CdcExpression.cdcChunks($"t").as("c"))
        .collect().head.getSeq[String](0)
    // scalar reference: recompute every boundary with an independent
    // O(n·w) window polynomial (the oracle's formulation)
    def refChunks(s: String, w: Int = 16, div: Long = 64): Seq[String] = {
      val cps = s.codePoints().toArray
      val pow = Array.iterate(1L, w)(p => p * CdcExpression.B % CdcExpression.M)
      val ends = (w - 1 until cps.length).filter { i =>
        val h = (0 until w).map(q =>
          cps(i - w + 1 + q) * pow(w - 1 - q) % CdcExpression.M)
          .sum % CdcExpression.M
        h % div == 0
      }
      val cuts = if (ends.nonEmpty && ends.last == cps.length - 1) ends
                 else ends :+ (cps.length - 1)
      cuts.zip(-1 +: cuts.dropRight(1)).map { case (e, p) =>
        new String(cps, p + 1, e - p) }
    }
    val got = chunksOf(base)
    assert(got == refChunks(base))
    assert(got.mkString == base) // lossless: chunks concatenate back
    assert(got.length > 2, s"fixture too smooth: ${got.length} chunks")
    // edit stability — THE property fixed-size chunking lacks: insert
    // a word mid-doc; every chunk fingerprint outside the edited
    // region survives (boundaries re-sync after w untouched points)
    val k = base.length / 2
    val edited = base.substring(0, k) + "zzz " + base.substring(k)
    val a = got.toSet
    val b = chunksOf(edited).toSet
    assert(chunksOf(edited).mkString == edited)
    val survived = (a intersect b).size
    assert(survived >= a.size - 2,
      s"expected all but ~the edited chunk to survive: $survived/${a.size}")
    // short doc = one chunk; empty doc = one empty chunk
    assert(chunksOf("tiny") == Seq("tiny"))
    assert(chunksOf("") == Seq(""))
  }

  test("BPE learn: hand-checkable merges, pinned ties, non-overlap") {
    import spark.implicits._
    import graft.text.BpeLearn
    // corpus: "lower lower lower newer newer wider"
    // char pairs (freq-weighted, self-pairs excluded):
    //   er: 6 (3x lower, 2x newer, 1x wider)  <- round 1 winner
    //   lo/ow/we: 3 each; ne/ew: 2; wi/id/de: 1
    // after merging 'e r'->'er': "l o w er", "n e w er", "w i d er"
    //   w+er: 3 (lower) + 2 (newer) = 5 -> round 2 winner
    val docs = Seq("lower lower newer wider", "lower newer").toDF("text")
    val ms = BpeLearn.learnMerges(docs, nMerges = 3)
    assert(ms.head.sym_a == "e" && ms.head.sym_b == "r"
      && ms.head.pair_count == 6L && ms.head.merged == "er")
    assert(ms(1).sym_a == "w" && ms(1).sym_b == "er"
      && ms(1).pair_count == 5L)
    assert(ms.map(_.merge_rank) == Seq(1, 2, 3))
    // pinned tiebreak: equal counts resolve (a ASC, b ASC) — "ab"
    // and "cd" both appear twice; 'a b' must win round 1
    val tie = Seq("ab cd", "ab cd").toDF("text")
    val t = BpeLearn.learnMerges(tie, nMerges = 1)
    assert(t.head.sym_a == "a" && t.head.sym_b == "b")
    // non-overlap: 'x y x y x y' — with a != b adjacent matches never
    // share a symbol, so all three pairs merge in one round
    val alt = Seq("xyxyxy xyxyxy").toDF("text")
    val m1 = BpeLearn.learnMerges(alt, nMerges = 1)
    assert(m1.head.sym_a == "x" && m1.head.sym_b == "y"
      && m1.head.pair_count == 6L)
  }
}
