package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic sketches — the summaries a 100 TB pipeline keeps
  * when the exact answer would cost a corpus-wide shuffle (capability
  * extension; the reference's pandas scale never needs them).
  *
  * All three sketches hash with md5 arithmetic only, so every
  * register, bit position, and counter cell is reproducible in any
  * SQL engine (the DuckDB oracles rebuild them value-for-value) and
  * stable across runs, partitionings, and engine versions — a sketch
  * you persist today still merges with one you build next year.
  *
  * Scale shapes:
  *  - HLL: per-row hash → register/rank projection; partial `max`
  *    collapses every partition to ≤ m rows before the single tiny
  *    exchange. Estimating |vocab| never shuffles a token.
  *  - Bloom: the bit set is ≤ mBits rows (a few KB) — broadcast it;
  *    the probe side streams map-only past it.
  *  - Count-Min: partial `sum` collapses each partition to ≤ d·w
  *    cells; frequency estimates for any key set come from a
  *    broadcast join against the d·w-row counter table, not from
  *    re-aggregating the corpus.
  */
object Sketches {

  // ---------------------------------------------------------------
  // HyperLogLog (Flajolet et al. 2007), md5-deterministic variant.
  // ---------------------------------------------------------------

  /** Bits of md5 tail used for the rank: 12 hex chars = 48 bits, so
    * rank ∈ [1, 49] and 2^(49-rank) stays an exact Long.
    */
  private val hllTailBits = 48

  private def require4(p: Int): Unit =
    require(p >= 4 && p <= 16 && p % 4 == 0,
      s"hll: p must be in {4,8,12,16} (hex-aligned registers), got $p")

  /** Non-empty HLL registers of `item`: one row per register that saw
    * at least one item, with the max rank ρ (position of the first
    * 1-bit in the 48-bit md5 tail; an all-zero tail ranks 49).
    * Duplicates need no pre-distinct — `max` absorbs them, which is
    * the whole point: the plan is project + partial-max, never a
    * distinct shuffle of the items themselves.
    */
  def hllRegisters(items: DataFrame, item: Column, p: Int = 8,
                   groupCols: Seq[String] = Nil): DataFrame = {
    require4(p)
    val h = md5(item.cast("string"))
    val register = conv(substring(h, 1, p / 4), 16, 10).cast("int")
    val tail = conv(substring(h, p / 4 + 1, hllTailBits / 4), 16, 10)
      .cast("long")
    // length(bin(x)) = floor(log2 x) + 1 for x > 0; bin(0) = "0" would
    // miscount, hence the explicit all-zero branch.
    val rho = when(tail === 0L, lit(hllTailBits + 1))
      .otherwise(lit(hllTailBits + 1) - length(bin(tail))).cast("int")
    items.select(groupCols.map(col) ++
        Seq(register.as("register"), rho.as("rho")): _*)
      .groupBy((groupCols :+ "register").map(col): _*)
      .agg(max(col("rho")).as("max_rho"))
  }

  /** α_m · m² · 2^48 — the numerator of the raw HLL estimate with the
    * register sum kept as the EXACT integer Σ 2^(49-ρ_j) (order-free,
    * engine-free; a float Σ 2^-ρ would depend on summation order).
    * Exposed so oracles can interpolate the identical double literal.
    */
  def hllNumerator(p: Int): Double = {
    require4(p)
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    // scale by 2^(tailBits + 1): registers contribute 2^(49-ρ) ≥ 1
    alpha * m * m * math.pow(2.0, hllTailBits + 1)
  }

  /** One-row summary of [[hllRegisters]]: register stats, the exact
    * integer register sum, and the estimate (with the standard
    * linear-counting correction below 2.5·m when empty registers
    * remain). Everything up to the final division is exact integer
    * arithmetic, so the estimate is bit-identical across engines.
    */
  def hllSummary(registers: DataFrame, p: Int = 8,
                 groupCols: Seq[String] = Nil): DataFrame = {
    require4(p)
    val m = 1 << p
    val maxTerm = 1L << (hllTailBits + 1) // empty register: 2^(49-0)
    val sPresent =
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${hllTailBits + 1} - max_rho)"))
    val agged =
      if (groupCols.isEmpty)
        registers.agg(count(lit(1)).cast("int").as("nonzero_registers"),
          coalesce(sPresent, lit(0L)).as("sp"))
      else
        registers.groupBy(groupCols.map(col): _*)
          .agg(count(lit(1)).cast("int").as("nonzero_registers"),
            coalesce(sPresent, lit(0L)).as("sp"))
    agged
      .withColumn("m", lit(m))
      .withColumn("s_num",
        col("sp") + (lit(m.toLong) - col("nonzero_registers")) * maxTerm)
      .select(groupCols.map(col) ++ Seq(col("m"),
        col("nonzero_registers"), col("s_num"),
        graft.functions.PortableRound.pround(hllEstimateCol(p), 4)
          .as("hll_estimate")): _*)
  }

  private def hllEstimateCol(p: Int): Column = {
    val m = 1 << p
    val raw = lit(hllNumerator(p)) / col("s_num").cast("double")
    val zeros = (lit(m) - col("nonzero_registers")).cast("double")
    when(raw <= lit(2.5 * m) && col("nonzero_registers") < m,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros)).otherwise(raw)
  }

  // ---------------------------------------------------------------
  // Bloom filter (Bloom 1970), md5-deterministic variant.
  // ---------------------------------------------------------------

  /** The k bit positions of `key`: position j is the first 32 bits of
    * md5(j + ":" + key) mod mBits.
    */
  def bloomPositions(key: Column, k: Int, mBits: Int): Column = {
    require(k >= 1 && mBits >= 2, s"bloom: bad k=$k mBits=$mBits")
    array((0 until k).map { j =>
      (conv(substring(md5(concat(lit(s"$j:"), key.cast("string"))), 1, 8),
        16, 10).cast("long") % mBits).cast("int")
    }: _*)
  }

  /** The filter itself: the distinct set positions (≤ mBits rows — a
    * few KB at any corpus size; broadcast it to probes).
    */
  def bloomBits(keys: DataFrame, key: Column, k: Int, mBits: Int): DataFrame =
    keys.select(explode(bloomPositions(key, k, mBits)).as("pos")).distinct()

  /** Append `outCol` = "all k bit positions of `key` are set" to
    * every row of `df` — k broadcast left joins against the ≤mBits-row
    * bit set, so the probe side streams MAP-ONLY: no explode, no
    * distinct, no shuffle. This is the shape that matters at 100 TB:
    * a trillion-row probe pays k hash lookups per row and moves
    * nothing. No false negatives; false positives at the textbook
    * (1-e^{-kn/m})^k rate.
    */
  def withBloomMayContain(df: DataFrame, key: Column, bits: DataFrame,
                          k: Int, mBits: Int,
                          outCol: String = "may_contain"): DataFrame = {
    require(k >= 1 && mBits >= 2, s"bloom: bad k=$k mBits=$mBits")
    val joined = (0 until k).foldLeft(df) { (acc, j) =>
      val pos = (conv(substring(md5(concat(lit(s"$j:"),
        key.cast("string"))), 1, 8), 16, 10).cast("long") % mBits)
        .cast("int")
      acc.withColumn(s"__gbpos$j", pos)
        .join(broadcast(bits.select(col("pos").as(s"__gbhit$j"))),
          col(s"__gbpos$j") === col(s"__gbhit$j"), "left")
    }
    val all = (0 until k).map(j => col(s"__gbhit$j").isNotNull)
      .reduce(_ && _)
    joined.withColumn(outCol, all)
      .drop((0 until k).flatMap(j =>
        Seq(s"__gbpos$j", s"__gbhit$j")): _*)
  }

  /** (key, may_contain) for each distinct `keyCol` value of `probe`.
    * Convenience over [[withBloomMayContain]].
    */
  def bloomMayContain(probe: DataFrame, keyCol: String, bits: DataFrame,
                      k: Int, mBits: Int): DataFrame =
    withBloomMayContain(probe.select(col(keyCol)).distinct(),
      col(keyCol), bits, k, mBits)

  // ---------------------------------------------------------------
  // Count-Min sketch (Cormode & Muthukrishnan 2005).
  // ---------------------------------------------------------------

  /** (row j, cell pos) for one hash row of the sketch. */
  private def cmsPos(item: Column, j: Int, w: Int): Column =
    (conv(substring(md5(concat(lit(s"$j:"), item.cast("string"))), 1, 8),
      16, 10).cast("long") % w).cast("int")

  /** The d×w counter table: each item occurrence increments one cell
    * per hash row. Partial aggregation caps every partition's output
    * at d·w cells, so the shuffle is O(d·w), not O(corpus).
    */
  def cmsCounters(items: DataFrame, item: Column,
                  d: Int = 4, w: Int = 2048): DataFrame = {
    require(d >= 1 && w >= 2, s"cms: bad d=$d w=$w")
    items.select(explode(array((0 until d).map(j =>
        struct(lit(j).as("j"), cmsPos(item, j, w).as("pos"))): _*))
        .as("c"))
      .groupBy(col("c.j").as("j"), col("c.pos").as("pos"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the frequency of each distinct key in `keys`:
    * min over the d counter cells the key hashes to. Never
    * underestimates (CMS's one-sided guarantee). The counter table is
    * broadcast — estimating any key set never touches the corpus.
    */
  def cmsEstimate(keys: DataFrame, keyCol: String, counters: DataFrame,
                  d: Int = 4, w: Int = 2048): DataFrame =
    keys.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(array((0 until d).map(j =>
        struct(lit(j).as("j"), cmsPos(col(keyCol), j, w).as("pos"))): _*))
        .as("c"))
      .select(col(keyCol), col("c.j").as("j"), col("c.pos").as("pos"))
      .join(broadcast(counters), Seq("j", "pos"))
      .groupBy(col(keyCol))
      .agg(min(col("cnt")).as("cms_count"))
}
