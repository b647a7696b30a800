package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** SQL function registration (§2.10 stretch), salted skew join, and
  * stateful streaming dedup.
  */
class ExtensionsSkewSpec extends SparkSpec {
  import spark.implicits._

  test("graft_* functions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_american_to_decimal(-110.0) AS dec,
        |       graft_decimal_to_american(2.2) AS am,
        |       graft_implied_prob(2.0) AS p,
        |       graft_ev(0.5, 2.2) AS ev,
        |       graft_simhash('the quick brown fox') AS sh,
        |       graft_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |       graft_l2norm(array(3.0F, 4.0F)) AS n
        |""".stripMargin).collect().head
    assert(approx(r.getAs[Double]("dec"), 1.0 + 100.0 / 110.0))
    assert(r.getAs[Double]("am") == 120.0)
    assert(r.getAs[Double]("p") == 0.5)
    assert(approx(r.getAs[Double]("ev"), 0.1))
    assert(r.getAs[String]("sh").length == 16)
    assert(r.getAs[Double]("d") == 11.0)
    assert(r.getAs[Double]("n") == 5.0)
  }

  test("SQL functions agree with the Column API across sampled odds") {
    GraftExtensions.register(spark)
    import graft.functions.OddsFunctions
    val samples = Seq(-250.0, -110.0, -100.0, 100.0, 120.0, 1.5, 2.0,
      2.2, 3.75, 99.0)
    val df = samples.toDF("x")
    val sql = df.selectExpr("x", "graft_decimalize(x) AS a",
      "graft_decimal_to_american(graft_decimalize(x)) AS b",
      "graft_implied_prob(graft_decimalize(x)) AS c").collect()
    val col = df.select($"x",
      OddsFunctions.decimalize($"x").as("a"),
      OddsFunctions.decimalToAmerican(
        OddsFunctions.decimalize($"x")).as("b"),
      OddsFunctions.impliedProb(
        OddsFunctions.decimalize($"x")).as("c")).collect()
    sql.zip(col).foreach { case (s, c) =>
      Seq("a", "b", "c").foreach { f =>
        val i = s.fieldIndex(f)
        assert(s.isNullAt(i) == c.isNullAt(i), s"null mismatch $f")
        if (!s.isNullAt(i))
          assert(s.getDouble(i) == c.getDouble(i),
            s"$f mismatch at x=${s.getDouble(0)}")
      }
    }
  }

  test("graft_minhash in SQL equals the Column API") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_minhash('a b c d e f') AS s").collect()
      .head.getSeq[String](0)
    val viaCol = Seq("a b c d e f").toDF("t")
      .select(graft.dedup.Dedup.minhashSignature($"t").as("s"))
      .collect().head.getSeq[String](0)
    assert(viaSql == viaCol && viaSql.length == 16)
  }

  test("graft_shingle_hashes / repetition_stats / srp_signature from SQL") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_shingle_hashes('a b c d') AS sh").collect()
      .head.getSeq[String](0)
    val viaCol = Seq("a b c d").toDF("t")
      .select(graft.dedup.HashExpressions
        .distinctShingleHashes($"t").as("sh"))
      .collect().head.getSeq[String](0)
    assert(viaSql == viaCol && viaSql.length == 2) // "a b c", "b c d"
    val reps = spark.sql(
      "SELECT graft_repetition_stats('x x x').n_tokens AS n").collect()
      .head.getLong(0)
    assert(reps == 3L)
    val sig = spark.sql(
      "SELECT graft_srp_signature(array(1.0F, 0.0F), 8) AS s").collect()
      .head.getString(0)
    val sigCol = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("v")
      .select(graft.sim.Similarity.srpSignature($"v", 8).as("s"))
      .collect().head.getString(0)
    assert(sig == sigCol && sig.length == 8)
  }

  test("graft_langid / text_stats / winnowing from SQL match Column API") {
    GraftExtensions.register(spark)
    val sample = "the of and to in is it a the of"
    val sqlRow = spark.sql(
      s"""SELECT graft_langid('$sample') AS lang,
         |       graft_text_stats('$sample').n_tokens AS n,
         |       graft_winnowing('$sample', 3, 4) AS fp""".stripMargin)
      .collect().head
    val colRow = Seq(sample).toDF("t").select(
      graft.text.TextAnalysis.langId($"t").as("lang"),
      graft.text.TextStatsExpression.textStats($"t")
        .getField("n_tokens").as("n"),
      graft.text.WinnowingExpression
        .winnowingFingerprints($"t", 3, 4).as("fp"))
      .collect().head
    assert(sqlRow.getAs[String]("lang") == colRow.getAs[String]("lang"))
    assert(sqlRow.getAs[String]("lang") == "en")
    assert(sqlRow.getAs[Long]("n") == colRow.getAs[Long]("n"))
    assert(sqlRow.getSeq[String](sqlRow.fieldIndex("fp")) ==
      colRow.getSeq[String](colRow.fieldIndex("fp")))
    assert(sqlRow.getSeq[String](sqlRow.fieldIndex("fp")).nonEmpty)
  }

  test("wrong arity raises a helpful error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception](
      spark.sql("SELECT graft_implied_prob(1.0, 2.0)").collect())
    assert(e.getMessage.contains("graft_implied_prob") ||
      e.getCause != null)
  }

  test("salted join equals the plain join, spread over buckets") {
    val large = (1 to 1000).map(i =>
      (if (i <= 900) "hot" else s"k$i", i.toLong))
      .toDF("key", "row_id")
    val small = Seq(("hot", 1.0), ("k950", 2.0)).toDF("key", "w")
    val plain = large.join(small, "key")
    val salted = SkewJoin.saltedJoin(large, small, "key", col("row_id"),
      buckets = 8)
    assert(salted.count() == plain.count())
    assert(salted.agg(sum("row_id")).collect().head.getLong(0) ==
      plain.agg(sum("row_id")).collect().head.getLong(0))
    // the hot key's rows actually spread across salt buckets
    val spread = large.filter($"key" === "hot")
      .withColumn("salt", pmod(hash($"row_id"), lit(8)))
      .select("salt").distinct().count()
    assert(spread == 8)
  }

  test("stateful streaming dedup emits first row per key") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val deduped = graft.streaming.StreamingIngest.dedupStream(
      input.toDS())
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    input.addData(("a", "first"), ("a", "second"), ("b", "x"))
    q.processAllAvailable()
    input.addData(("a", "third"), ("c", "y"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_out").as[(String, String)]
      .collect().toMap
    assert(out == Map("a" -> "first", "b" -> "x", "c" -> "y"))
  }

  test("topK heap aggregate: ties, nulls, merge, and SQL registration") {
    import spark.implicits._
    import graft.functions.TopKAggregate
    // ties on score keep the SMALLEST ids (window-order parity);
    // null score and null id rows are skipped
    val df = Seq[(Int, java.lang.Double, java.lang.Long)](
      (1, 5.0, 10L), (1, 5.0, 7L), (1, 5.0, 12L), (1, 9.0, 99L),
      (1, null, 1L), (1, 2.0, null),
      (2, 1.0, 1L))
      .toDF("g", "score", "id")
    val got = df.groupBy($"g")
      .agg(TopKAggregate.topK($"score", $"id", 3).as("tk"))
      .select($"g", posexplode($"tk").as(Seq("pos", "s")))
      .select($"g", $"pos", $"s.score", $"s.id")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(got == Set(
      (1, 0, 9.0, 99L), (1, 1, 5.0, 7L), (1, 2, 5.0, 10L),
      (2, 0, 1.0, 1L)))
    // forced multi-partition input exercises serialize/merge
    val big = spark.range(0, 1000).repartition(8)
      .select(lit(1).as("g"), ($"id" % 10).cast("double").as("score"),
        $"id".as("id"))
    val top = big.groupBy($"g")
      .agg(TopKAggregate.topK($"score", $"id", 5).as("tk"))
      .select(explode($"tk").as("s")).select($"s.id")
      .as[Long].collect().toSeq
    // best score 9.0 at ids 9, 19, 29, 39, 49 (ties -> smallest ids)
    assert(top == Seq(9L, 19L, 29L, 39L, 49L))
    // SQL surface
    graft.GraftExtensions.register(spark)
    df.createOrReplaceTempView("topk_in")
    val viaSql = spark.sql(
      "SELECT g, graft_topk(score, id, 3) AS tk FROM topk_in GROUP BY g")
      .select($"g", explode($"tk").as("s")).select($"g", $"s.id")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(viaSql == Set((1, 99L), (1, 7L), (1, 10L), (2, 1L)))
  }

  test("topK generalized payloads: string, struct, NaN, implicit cast") {
    import spark.implicits._
    import graft.functions.TopKAggregate
    // string payload — ties keep the lexicographically smallest
    val s = Seq((1, 3.0, "bb"), (1, 3.0, "aa"), (1, 3.0, "cc"),
      (1, 1.0, "zz"))
      .toDF("g", "score", "doc")
      .groupBy($"g")
      .agg(TopKAggregate.topK($"score", $"doc", 2).as("tk"))
      .select(explode($"tk.id").as("doc")).as[String].collect().toSeq
    assert(s == Seq("aa", "bb"))
    // struct payload rides the heap whole; struct ordering ties on
    // the first field
    val st = Seq((1, 2.0, 30L, "x"), (1, 2.0, 10L, "y"), (1, 5.0, 99L, "z"))
      .toDF("g", "score", "k", "tag")
      .groupBy($"g")
      .agg(TopKAggregate.topK($"score", struct($"k", $"tag"), 2).as("tk"))
      .select(explode($"tk").as("s"))
      .select($"s.score", $"s.id.k", $"s.id.tag")
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getString(2)))
      .toSeq
    assert(st == Seq((5.0, 99L, "z"), (2.0, 10L, "y")))
    // NaN sorts GREATEST = best under DESC, matching the window form
    // (r5 advice: the old -score ordering ranked NaN worst)
    val nan = Seq((1, Double.NaN, 1L), (1, 100.0, 2L), (1, 1.0, 3L))
      .toDF("g", "score", "id")
      .groupBy($"g")
      .agg(TopKAggregate.topK($"score", $"id", 2).as("tk"))
      .select(explode($"tk.id").as("id")).as[Long].collect().toSeq
    assert(nan == Seq(1L, 2L))
    // SQL surface: int scores implicit-cast to double at analysis
    // time instead of a runtime ClassCastException (r5 advice)
    graft.GraftExtensions.register(spark)
    Seq((1, 7, 70L), (1, 9, 90L), (1, 8, 80L)).toDF("g", "iscore", "id")
      .createOrReplaceTempView("topk_int_in")
    val viaSql = spark.sql(
      "SELECT graft_topk(iscore, id, 2) AS tk FROM topk_int_in GROUP BY g")
      .select(explode($"tk.id").as("id")).as[Long].collect().toSeq
    assert(viaSql == Seq(90L, 80L))
    // unorderable payload fails at ANALYSIS, not execution
    Seq((1, 1.0, Map("a" -> 1))).toDF("g", "score", "m")
      .createOrReplaceTempView("topk_map_in")
    val ex = intercept[Exception] {
      spark.sql(
        "SELECT graft_topk(score, m, 2) AS tk FROM topk_map_in GROUP BY g")
    }
    assert(ex.getMessage.contains("orderable") ||
      ex.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
