package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin
import graft.sim.Similarity

/** As-of join semantics and IVF ANN recall. */
class AsOfIvfSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of attaches latest right row at-or-before") {
    val bets = Seq((1L, "g1", 100L), (2L, "g1", 250L), (3L, "g2", 50L))
      .toDF("bet_id", "game", "t")
    val odds = Seq((10L, "g1", 100L, 1.9), (11L, "g1", 200L, 2.0),
      (12L, "g1", 300L, 2.1), (13L, "g2", 60L, 1.5))
      .toDF("line_id", "game", "t", "price")
    val joined = AsOfJoin.backward(bets, odds, Seq("game"), "t",
      "line_id").collect().map(r =>
        r.getAs[Long]("bet_id") ->
          (if (r.isNullAt(r.fieldIndex("right_price"))) None
           else Some(r.getAs[Double]("right_price")))).toMap
    assert(joined(1L).contains(1.9))  // exact-time match visible
    assert(joined(2L).contains(2.0))  // latest at-or-before 250
    assert(joined(3L).isEmpty)        // no odds yet at t=50
  }

  test("forward as-of attaches earliest right row at-or-after") {
    val bets = Seq((1L, "g1", 100L), (2L, "g1", 250L), (3L, "g2", 999L))
      .toDF("bet_id", "game", "t")
    val odds = Seq((10L, "g1", 100L, 1.9), (11L, "g1", 200L, 2.0),
      (12L, "g1", 300L, 2.1), (13L, "g2", 60L, 1.5))
      .toDF("line_id", "game", "t", "price")
    val joined = AsOfJoin.forward(bets, odds, Seq("game"), "t",
      "line_id").collect().map(r =>
        r.getAs[Long]("bet_id") ->
          (if (r.isNullAt(r.fieldIndex("right_price"))) None
           else Some(r.getAs[Double]("right_price")))).toMap
    assert(joined(1L).contains(1.9))  // exact-time match visible
    assert(joined(2L).contains(2.1))  // earliest at-or-after 250
    assert(joined(3L).isEmpty)        // no odds after t=999
  }

  test("forward ties at equal right times resolve like backward") {
    val l = Seq((1L, "k", 10L)).toDF("id", "key", "t")
    val r = Seq((5L, "k", 10L, 1.0), (6L, "k", 10L, 2.0))
      .toDF("rid", "key", "t", "v")
    val out = AsOfJoin.forward(l, r, Seq("key"), "t", "rid").collect()
    assert(out.head.getAs[Double]("right_v") == 2.0)
  }

  test("tolerance nulls matches beyond the window, inclusive at it") {
    val l = Seq((1L, "k", 100L), (2L, "k", 300L), (3L, "k", 301L))
      .toDF("id", "key", "t")
    val r = Seq((5L, "k", 100L, 1.0)).toDF("rid", "key", "t", "v")
    def prices(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(row => row.getAs[Long]("id") ->
        (if (row.isNullAt(row.fieldIndex("right_v"))) None
         else Some(row.getAs[Double]("right_v")))).toMap
    val back = prices(AsOfJoin.backward(l, r, Seq("key"), "t", "rid",
      tolerance = Some(200L)))
    assert(back(1L).contains(1.0))  // distance 0
    assert(back(2L).contains(1.0))  // distance 200 == tolerance: kept
    assert(back(3L).isEmpty)        // distance 201: nulled
    val fl = Seq((1L, "k", 100L), (2L, "k", 0L)).toDF("id", "key", "t")
    val fwd = prices(AsOfJoin.forward(fl, r, Seq("key"), "t", "rid",
      tolerance = Some(50L)))
    assert(fwd(1L).contains(1.0))   // distance 0
    assert(fwd(2L).isEmpty)         // distance 100 > 50: nulled
  }

  test("tolerance rejects a non-numeric time column") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq((1L, "k", ts("2025-01-01 00:00:00")))
      .toDF("id", "key", "t")
    val r = Seq((5L, "k", ts("2025-01-01 00:00:00"), 1.0))
      .toDF("rid", "key", "t", "v")
    val ex = intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, r, Seq("key"), "t", "rid",
        tolerance = Some(10L))
    }
    assert(ex.getMessage.contains("numeric time column"))
  }

  test("as-of ties at equal right times resolve to highest order col") {
    val l = Seq((1L, "k", 10L)).toDF("id", "key", "t")
    val r = Seq((5L, "k", 10L, 1.0), (6L, "k", 10L, 2.0))
      .toDF("rid", "key", "t", "v")
    val out = AsOfJoin.backward(l, r, Seq("key"), "t", "rid").collect()
    assert(out.head.getAs[Double]("right_v") == 2.0)
  }

  test("as-of keeps sub-second timestamp order columns intact") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq((1L, "k", 10L)).toDF("id", "key", "t")
    // equal time t=10; updated_at differs only by millis — a long cast
    // would collapse these into a tie
    val r = Seq(
      (5L, "k", 10L, ts("2025-01-01 00:00:00.100"), 1.0),
      (6L, "k", 10L, ts("2025-01-01 00:00:00.900"), 2.0))
      .toDF("rid", "key", "t", "updated_at", "v")
    val out = AsOfJoin.backward(l, r, Seq("key"), "t", "updated_at")
      .collect()
    assert(out.head.getAs[Double]("right_v") == 2.0)
  }

  test("broadcast as-of matches the union+window variant, left unshuffled") {
    val bets = Seq((1L, "g1", 100L), (2L, "g1", 250L), (3L, "g2", 50L),
      (4L, "g3", 999L))
      .toDF("bet_id", "game", "t")
    val odds = Seq((10L, "g1", 100L, 1.9), (11L, "g1", 200L, 2.0),
      (12L, "g1", 300L, 2.1), (13L, "g2", 60L, 1.5),
      (14L, "g2", 10L, 1.4))
      .toDF("line_id", "game", "t", "price")
    val a = AsOfJoin.backward(bets, odds, Seq("game"), "t", "line_id")
    val b = AsOfJoin.backwardBroadcast(bets, odds, Seq("game"), "t",
      "line_id")
    assert(a.columns.toSeq == b.columns.toSeq)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("bet_id"),
        Option(r.getAs[Any]("right_line_id")),
        Option(r.getAs[Any]("right_price")))).sortBy(_._1).toSeq
    assert(rows(a) == rows(b))
    // the left side joins against a broadcast — no shuffle of bets
    val plan = b.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("broadcast as-of equal-time ties resolve like backward") {
    val l = Seq((1L, "k", 10L)).toDF("id", "key", "t")
    val r = Seq((5L, "k", 10L, 1.0), (6L, "k", 10L, 2.0))
      .toDF("rid", "key", "t", "v")
    val out = AsOfJoin.backwardBroadcast(l, r, Seq("key"), "t", "rid")
      .collect()
    assert(out.head.getAs[Double]("right_v") == 2.0)
  }

  test("property: both directions match a Scala model over random frames") {
    // model: backward = max (t, ro) with rt <= lt; forward = min t
    // (then max ro within it) with rt >= lt; tolerance nulls beyond.
    import org.scalacheck.Gen
    val frameGen = for {
      nL <- Gen.chooseNum(1, 12)
      nR <- Gen.chooseNum(0, 12)
      ls <- Gen.listOfN(nL, for {
        k <- Gen.oneOf("a", "b"); t <- Gen.chooseNum(0L, 40L)
      } yield (k, t))
      rs <- Gen.listOfN(nR, for {
        k <- Gen.oneOf("a", "b"); t <- Gen.chooseNum(0L, 40L)
        v <- Gen.chooseNum(1, 999)
      } yield (k, t, v.toDouble))
      tol <- Gen.oneOf(None, Some(0L), Some(5L), Some(100L))
    } yield (ls, rs, tol)
    Iterator.continually(frameGen.sample).flatten.take(10).foreach {
      case (ls, rs, tol) =>
        val l = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
          .toDF("id", "key", "t")
        val r = rs.zipWithIndex.map { case ((k, t, v), i) =>
          (i.toLong, k, t, v) }.toDF("rid", "key", "t", "v")
        def model(fwd: Boolean): Map[Long, Option[Long]] =
          ls.zipWithIndex.map { case ((k, t), i) =>
            val elig = rs.zipWithIndex.filter { case ((rk, rt, _), _) =>
              rk == k && (if (fwd) rt >= t else rt <= t) &&
                tol.forall(x => math.abs(rt - t) <= x) }
            val pick = if (elig.isEmpty) None
              else Some(if (fwd) {
                val tmin = elig.map(_._1._2).min
                elig.filter(_._1._2 == tmin).map(_._2).max.toLong
              } else {
                val tmax = elig.map(_._1._2).max
                elig.filter(_._1._2 == tmax).map(_._2).max.toLong
              })
            i.toLong -> pick
          }.toMap
        def got(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
          df.collect().map(row => row.getAs[Long]("id") ->
            (if (row.isNullAt(row.fieldIndex("right_rid"))) None
             else Some(row.getAs[Long]("right_rid")))).toMap
        assert(got(AsOfJoin.backward(l, r, Seq("key"), "t", "rid", tol))
          == model(fwd = false), s"backward ls=$ls rs=$rs tol=$tol")
        assert(got(AsOfJoin.forward(l, r, Seq("key"), "t", "rid", tol))
          == model(fwd = true), s"forward ls=$ls rs=$rs tol=$tol")
    }
  }

  test("as-of rejects an unorderable order column") {
    val l = Seq((1L, "k", 10L)).toDF("id", "key", "t")
    val r = Seq((5L, "k", 10L, Array(1.0), 1.0))
      .toDF("rid", "key", "t", "arr", "v")
    assertThrows[IllegalArgumentException](
      AsOfJoin.backward(l, r, Seq("key"), "t", "arr"))
  }

  test("IVF top-1 recall vs brute force on clustered vectors") {
    val rnd = new scala.util.Random(7)
    // 4 well-separated cluster centers in 8 dims, 40 vectors each
    val centers = Array.fill(4, 8)(rnd.nextGaussian() * 5)
    val vecs = (0 until 160).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 8)
    val brute = Similarity.bruteForceTopK(vecs, queries, 1)
      .collect().map(r => r.getAs[Long]("query_id") ->
        r.getAs[Long]("neighbor_id")).toMap
    // offline fit (once), online probe (per query) — the split the
    // production q36 path relies on
    val centroids = Similarity.fitIvfKmeans(vecs,
      Similarity.gridCentroids(4, vecs.select(size($"embedding"))
        .head().getInt(0)), iters = 3)._1
    val ivf = Similarity.ivfTopK(vecs, queries, centroids, 1, nprobe = 2)
      .collect().map(r => r.getAs[Long]("query_id") ->
        r.getAs[Long]("neighbor_id")).toMap
    val recall = brute.keys.count(k => ivf.get(k) == brute.get(k))
      .toDouble / brute.size
    assert(recall >= 0.75, s"IVF top-1 recall $recall too low")
  }

  test("fitIvfKmeans: tol gate stops early; one iter == kmeansRefine") {
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.fill(8)((rnd.nextGaussian() * 2).toFloat))
    }.toDF("vec_id", "embedding")
    val init = Similarity.kmeansInit(vecs, 4)
    // a huge tol stops after the first iteration regardless of maxIters
    val (_, one) = Similarity.fitIvfKmeans(vecs, init, iters = 5,
      tol = Some(1e9))
    assert(one == 1)
    // the fit's first step IS kmeansRefine: centroids after iters=1
    // equal the refined table applied to the init (empty cells carry)
    val (c1, _) = Similarity.fitIvfKmeans(vecs, init, iters = 1)
    val refined = Similarity.kmeansRefine(vecs, init)
      .select($"cell", $"dim", $"centroid_value").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val expect = init.zipWithIndex.map { case (c0, cell) =>
      c0.indices.map(d => refined.getOrElse((cell, d), c0(d))).toArray
    }
    assert(c1.map(_.toSeq) == expect.map(_.toSeq))
    // Lloyd monotonicity smoke: shifts shrink over iterations
    val s1 = Similarity.kmeansRefine(vecs, c1)
      .agg(max($"shift")).head().getDouble(0)
    val (c3, _) = Similarity.fitIvfKmeans(vecs, init, iters = 3)
    val s3 = Similarity.kmeansRefine(vecs, c3)
      .agg(max($"shift")).head().getDouble(0)
    assert(s3 <= s1, s"shift after 3 iters ($s3) vs 1 ($s1)")
  }

  test("fit materializes only centroid-sized relations on the driver") {
    // r5 verdict item 4's contract: NO corpus-sized data reaches the
    // driver during training. Every action the fit runs must be
    // rooted in an Aggregate (the kmeansRefine centroid table, ≤
    // nlist×dims rows) or a Limit (kmeansInit's TakeOrdered sample /
    // the dim probe) — a bare corpus collect would be neither.
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit}
    val captured =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Boolean)]
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution,
          d: Long): Unit = {
        val bounded = qe.analyzed.collectFirst {
          case _: Aggregate => true
          case _: GlobalLimit => true
          case _: LocalLimit => true
        }.isDefined
        captured.add(f -> bounded)
      }
      override def onFailure(f: String, qe: QueryExecution,
          e: Exception): Unit = ()
    }
    val rnd = new scala.util.Random(13)
    val vecs = (0 until 300).map { i =>
      (i.toLong, Array.fill(16)((rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    spark.listenerManager.register(listener)
    try {
      Similarity.fitIvfKmeans(vecs, Similarity.kmeansInit(vecs, 4),
        iters = 2)
      graft.sim.Pq.fitCodebooks(vecs, m = 4, k = 8, iters = 1)
      // the listener bus is async; wait for it to drain
      val deadline = System.nanoTime() + 10e9.toLong
      var last = -1
      while (System.nanoTime() < deadline &&
          (captured.size != last || captured.isEmpty)) {
        last = captured.size; Thread.sleep(200)
      }
    } finally spark.listenerManager.unregister(listener)
    assert(!captured.isEmpty, "listener captured no fit actions")
    val unbounded = captured.toArray(Array.empty[(String, Boolean)])
      .filterNot(_._2)
    assert(unbounded.isEmpty,
      s"fit ran corpus-sized driver actions: ${unbounded.mkString(", ")}")
  }
}
