package graft

import org.apache.spark.sql.functions._
import graft.functions.PortableRound.proundScala

/** q140 (in-engine LR training) and q141 (exact AUC): independent
  * driver-side recomputations of the full training trajectory and the
  * midrank statistic.
  */
class LrEvalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def feats(): Array[(Double, Array[Double])] = {
    import graft.text.TextStatsExpression.textStats
    spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("st", textStats(col("text")))
      .select(
        when(col("lang") === "en", lit(1.0)).otherwise(lit(0.0)),
        log(lit(1.0) + col("st.n_tokens").cast("double")),
        coalesce(when(col("st.n_tokens") > 0,
          col("st.n_stop").cast("double") / col("st.n_tokens")),
          lit(0.0)),
        coalesce(when(col("st.n_chars") > 0,
          col("st.n_punct").cast("double") / col("st.n_chars")),
          lit(0.0)),
        abs(coalesce(when(col("st.n_tokens") > 0,
          col("st.total_token_len").cast("double") /
            col("st.n_tokens")), lit(0.0)) - lit(5.0)))
      .collect()
      .map(r => (r.getDouble(0),
        Array(1.0, r.getDouble(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4))))
  }

  test("q140 training trajectory matches a scalar GD reimplementation") {
    val data = feats()
    val w = Array.fill(5)(0.0)
    val expected = (1 to 8).map { r =>
      val grads = Array.fill(5)(0.0)
      var llSum = 0.0
      data.foreach { case (y, x) =>
        val m = (0 to 4).map(j => w(j) * x(j)).sum
        val p0 = 1.0 / (1.0 + math.exp(-m))
        val p = math.min(math.max(p0, 1e-12), 1.0 - 1e-12)
        (0 to 4).foreach(j => grads(j) += (p - y) * x(j))
        llSum += -(y * math.log(p) + (1.0 - y) * math.log(1.0 - p))
      }
      (0 to 4).foreach(j =>
        w(j) = proundScala(w(j) - 0.1 * (grads(j) / data.length), 6))
      (r, w.toVector, proundScala(llSum / data.length, 6))
    }
    val got = SparkEntry.queries("q140_lr_train")(spark, dir)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0),
        (1 to 5).map(r.getDouble).toVector, r.getDouble(6)))
    expected.zip(got).foreach { case ((er, ew, ell), (gr, gw, gll)) =>
      assert(er == gr)
      ew.zip(gw).foreach { case (a, b) =>
        assert(approx(a, b, 1e-6), s"round $er weights: $ew vs $gw")
      }
      assert(approx(ell, gll, 1e-6), s"round $er logloss")
    }
    // training actually learns: logloss falls from the w=0 baseline
    assert(got.last._3 < got.head._3,
      s"logloss did not improve: ${got.map(_._3).toSeq}")
  }

  test("q141 AUC matches a scalar midrank Mann-Whitney") {
    val rows = SparkEntry.queries("q141_quality_auc")(spark, dir)
      .collect()
    assert(rows.length == 1)
    val (nPos, nNeg, auc) =
      (rows(0).getLong(0), rows(0).getLong(1), rows(0).getDouble(2))
    // independent: collect (score, label) via q119's own output and
    // the lang column, then the naive O(n log n) midrank AUC
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), (col("lang") === "en").as("pos"))
    val s = SparkEntry.queries("q119_quality_classifier")(spark, dir)
      .select(col("doc_id"), col("p_keep"))
      .join(d, Seq("doc_id"))
      .select(col("p_keep"), col("pos")).collect()
      .map(r => (r.getDouble(0), r.getBoolean(1)))
    val sorted = s.sortBy(_._1)
    var i = 0; var sumRanksPos = 0.0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      val midrank = (i + 1 + j) / 2.0 // avg of ranks i+1..j
      (i until j).foreach(k => if (sorted(k)._2) sumRanksPos += midrank)
      i = j
    }
    val np = s.count(_._2).toLong
    val nn = s.length - np
    assert(np == nPos && nn == nNeg)
    val expected = proundScala(
      (sumRanksPos - np * (np + 1) / 2.0) / (np.toDouble * nn), 6)
    assert(approx(auc, expected, 1e-6), s"auc $auc vs $expected")
    assert(auc > 0.0 && auc < 1.0)
  }

  test("q142 calibration bins agree with a scalar recomputation") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), (col("lang") === "en").as("pos"))
    val s = SparkEntry.queries("q119_quality_classifier")(spark, dir)
      .select(col("doc_id"), col("p_keep")).join(d, Seq("doc_id"))
      .select(col("p_keep"), col("pos")).collect()
      .map(r => (r.getDouble(0), r.getBoolean(1)))
    val expected = s.groupBy { case (p, _) =>
      math.min(math.floor(p * 10).toLong, 9L)
    }.map { case (bin, xs) =>
      bin -> (xs.length.toLong, xs.count(_._2).toLong,
        proundScala(xs.map(_._1).sum / xs.length, 6),
        proundScala(xs.count(_._2).toDouble / xs.length, 6))
    }
    val got = SparkEntry.queries("q142_calibration")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (bin, (n, np, ms, or)) =>
      val (gn, gnp, gms, gor) = got(bin)
      assert(gn == n && gnp == np, s"bin $bin counts")
      assert(approx(gms, ms, 1e-6) && approx(gor, or, 1e-6),
        s"bin $bin rates")
    }
  }
}
