package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable string-similarity join: all (probe, master) pairs with
  * `levenshtein(a, b) <= tau`.
  *
  * The naive formulation (`probe.join(master, levenshtein(a, b) <= t)`)
  * plans a BroadcastNestedLoopJoin — O(|probe|·|master|) edit-distance
  * evaluations, dead at scale. The scalable shape is the
  * partition-based signature scheme (PassJoin — Li, Deng, Jiang, Feng,
  * VLDB 2011; same pigeonhole family as the reference's
  * dedup-by-normalized-key in `src/processing.py`, generalized from
  * "exact after cleanup" to "within tau edits"):
  *
  *   1. every master string of length m splits into `tau + 1`
  *      contiguous segments (even partition: `m mod (tau+1)` trailing
  *      segments one char longer). If ed(a, b) <= tau, at least one
  *      segment of b contains NO edit in the optimal alignment — so it
  *      appears in `a` VERBATIM, start-shifted by at most tau (net
  *      indels before it);
  *   2. each probe string of length n emits, for every candidate
  *      master length m in [n-tau, n+tau] and segment index i, the
  *      substrings of a at the <= 2·tau+1 admissible start positions —
  *      a bounded, length-linear expansion ((2tau+1)²·(tau+1) keys per
  *      row worst case);
  *   3. equi-join on (segment value, segment index, master length) — a
  *      plain shuffled hash join Catalyst/AQE treat like any other;
  *   4. DISTINCT candidate pairs, then one exact `levenshtein` rescore
  *      (codegen'd builtin) keeps true matches. The signature join is
  *      a guaranteed superset, so the rescore output is EXACTLY the
  *      naive join's.
  *
  * Strings shorter than `tau + 1` cannot be segmented; they route
  * through a residual nested-loop branch against the (length <=
  * 2·tau) band of the other side. Such strings are a fixed tiny
  * slice of any real corpus (and each is within tau edits of half the
  * short universe anyway — no signature can prune them), so the
  * branch is broadcast-sized by construction.
  *
  * Cost: one shuffle of each side with small constant fan-out instead
  * of a quadratic loop. Skew on a hot segment value is bounded by the
  * join key including (index, length) — the classic failure mode
  * (every row sharing one common q-gram) does not exist here because
  * segments partition the string instead of sliding over it.
  */
object FuzzyJoin {

  /** @param excludeSelfPairs drop pairs with equal keys — set when
    *   probe is a subset of master keyed by the same ids (self-join
    *   dedup shape); leave false for cross-dataset matching.
    */
  def editDistanceJoin(probe: DataFrame, master: DataFrame,
      keyCol: String, strCol: String, tau: Int,
      excludeSelfPairs: Boolean = false): DataFrame = {
    require(tau >= 1, s"tau must be >= 1, got $tau")
    val k = tau + 1

    val a = probe.select(col(keyCol).as("a_key"), col(strCol).as("a_str"))
      .filter(col("a_str").isNotNull)
    val b = master.select(col(keyCol).as("b_key"), col(strCol).as("b_str"))
      .filter(col("b_str").isNotNull)

    // even-partition segment arithmetic for a length-m string:
    // l = m div k, r = m mod k; segments 0..k-r-1 have length l,
    // the last r segments length l+1 (all integer Column math).
    def segLen(m: org.apache.spark.sql.Column,
               i: org.apache.spark.sql.Column) = {
      val l = ((m - pmod(m, lit(k))) / k).cast("int")
      val r = pmod(m, lit(k))
      (when(i < lit(k) - r, l).otherwise(l + 1),
        when(i < lit(k) - r, i * l + 1)
          .otherwise((lit(k) - r) * l + (i - (lit(k) - r)) * (l + 1) + 1))
    }

    // ---- normal branch: both sides length >= k --------------------
    val bSeg = b.withColumn("m", length(col("b_str")))
      .filter(col("m") >= k)
      .withColumn("i", explode(sequence(lit(0), lit(k - 1))))
    val (bl, bp) = segLen(col("m"), col("i"))
    val bKeyed = bSeg.select(col("b_key"), col("b_str"), col("m"),
      col("i"), col("b_str").substr(bp, bl).as("seg"))

    val aNorm = a.filter(length(col("a_str")) >= k)
    val aSub = aNorm.withColumn("n", length(col("a_str")))
      .withColumn("m",
        explode(sequence(greatest(col("n") - tau, lit(k)), col("n") + tau)))
      .withColumn("i", explode(sequence(lit(0), lit(k - 1))))
    val (al, ap) = segLen(col("m"), col("i"))
    val aKeyed = aSub
      .withColumn("lo", greatest(ap - tau, lit(1)))
      .withColumn("hi", least(ap + tau, col("n") - al + 1))
      .filter(col("lo") <= col("hi"))
      .withColumn("p", explode(sequence(col("lo"), col("hi"))))
      .select(col("a_key"), col("a_str"), col("m"), col("i"),
        col("a_str").substr(col("p"), al).as("seg"))

    val normal = aKeyed.join(bKeyed, Seq("seg", "i", "m"))
      .select("a_key", "a_str", "b_key", "b_str")

    // ---- residual branch: pairs touching a short (< k) string -----
    val aShort = a.filter(length(col("a_str")) < k)
    val bShort = b.filter(length(col("b_str")) < k)
    val bBand = b.filter(length(col("b_str")) <= 2 * tau)
    val short1 = broadcast(aShort).join(bBand,
      abs(length(col("a_str")) - length(col("b_str"))) <= tau)
    val short2 = aNorm.join(broadcast(bShort),
      abs(length(col("a_str")) - length(col("b_str"))) <= tau)
    val shortPairs = short1.select("a_key", "a_str", "b_key", "b_str")
      .unionByName(short2.select("a_key", "a_str", "b_key", "b_str"))

    val cands = normal.unionByName(shortPairs).distinct()
    val scored = cands
      .withColumn("dist", levenshtein(col("a_str"), col("b_str")))
      .filter(col("dist") <= tau)
    val out = if (excludeSelfPairs)
      scored.filter(col("a_key") =!= col("b_key")) else scored
    out.select(col("a_key"), col("b_key"), col("dist"))
  }
}
