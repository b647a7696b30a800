package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (Array[Float])
  * (capability extension — BASELINE.json north star).
  *
  * Dot products are higher-order-function folds (`aggregate` over
  * `zip_with`) — sequential left-to-right accumulation in double, so
  * results are deterministic and reproducible by the DuckDB oracle.
  * No UDFs.
  *
  * Scale design: brute-force top-k broadcasts the (small) query set so
  * the corpus never shuffles — each corpus partition scores locally and
  * only k rows per query survive the final top-k. The LSH variant
  * bucket-joins on sign-random-projection signatures so candidate
  * generation is a hash join, not a cross product.
  */
object Similarity {

  /** Elementwise dot product in double precision — a codegen'd native
    * expression ([[VectorExpressions.DotProduct]]); same sequential
    * fold semantics as `aggregate(zip_with(...))` but ~10-100× faster
    * in pair loops.
    */
  def dot(a: Column, b: Column): Column = VectorExpressions.dotProduct(a, b)

  /** L2 norm in double precision (codegen'd native expression). */
  def l2Norm(v: Column): Column = VectorExpressions.l2Norm(v)

  /** Cosine similarity (null when either vector has zero norm). */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom > 0, dot(a, b) / denom)
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (excluding self-matches by id). Queries are
    * broadcast — the corpus side stays partition-local until the
    * per-query top-k window.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cvec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qvec"), col("__cvec")).as("cosine_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1):
    * derived from md5(plane + ":" + dim) — engine-independent, no RNG
    * state. Computed ONCE driver-side per (plane, dim); embedding the
    * values as array literals saves every row from re-hashing a
    * constant (planes × dim md5 calls per row otherwise).
    */
  private def planeComponent(plane: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"$plane:$dim"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 2147483648.0 - 1.0
  }

  private val maxSrpDim = 512

  /** Sign-random-projection signature: one bit per hyperplane —
    * bit_p = (Σ_d v[d] * plane(p, d)) >= 0. Vectors with equal
    * signatures land in the same bucket. Supports dims up to
    * `maxSrpDim` (plane matrices are constant-folded literals); an
    * oversized vector FAILS LOUDLY via raise_error — silently
    * null-padding past the plane would collapse every >maxSrpDim
    * vector into one bucket (quadratic candidate blowup downstream).
    */
  def srpSignature(vec: Column, planes: Int = 8): Column = {
    val bits = (0 until planes).map { p =>
      val plane = array((0 until maxSrpDim)
        .map(d => lit(planeComponent(p, d))): _*)
      val s = aggregate(
        zip_with(vec, slice(plane, lit(1), size(vec)),
          (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(s >= 0, lit("1")).otherwise(lit("0"))
    }
    when(size(vec) <= maxSrpDim, concat(bits: _*))
      .otherwise(raise_error(concat(
        lit(s"srpSignature: vector dim "), size(vec).cast("string"),
        lit(s" exceeds maxSrpDim=$maxSrpDim"))))
  }

  /** LSH-bucketed ANN: candidates = pairs sharing an SRP bucket,
    * re-scored with exact cosine, top-k per query. Trades recall for
    * a hash join instead of a cross product — the 100 TB path.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 8, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cvec"),
      srpSignature(col(vecCol), planes).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qvec"),
      srpSignature(col(vecCol), planes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qvec"), col("__cvec")).as("cosine_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF (inverted-file) ANN: a KMeans coarse quantizer assigns every
    * corpus vector to one of `nlist` centroid cells; each query probes
    * its `nprobe` nearest cells and exact-scores only those
    * candidates. The 100 TB path when SRP recall is too coarse:
    * candidate count scales with nprobe/nlist of the corpus, the
    * centroid table is tiny and broadcast, and cell assignment is a
    * single MLlib transform.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._

    val withFeatures = corpus.withColumn("__f",
      array_to_vector(col(vecCol)))
    val model = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("__f").fit(withFeatures)
    val assigned = model.transform(withFeatures)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cvec"),
        col("prediction").as("cell"))

    val centers = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq
      .toDF("cell", "center")
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qvec"))
    val wCell = Window.partitionBy(col("query_id"))
      .orderBy(col("center_dist").asc, col("cell").asc)
    // zero-norm guard: nulls sort FIRST ascending in Spark, so an
    // unguarded divide-by-zero would rank arbitrary cells ahead of
    // every real distance; degenerate vectors fall back to 0 (cell
    // order decides, deterministically)
    val qn = l2Norm(col("__qvec"))
    val cn = l2Norm(col("center"))
    val probed = q.join(broadcast(centers),
        lit(true))
      .withColumn("center_dist",
        when(qn * cn > 0, -dot(col("__qvec"), col("center")) / (qn * cn))
          .otherwise(lit(0.0)))
      .withColumn("__cr", row_number().over(wCell))
      .filter(col("__cr") <= nprobe)
      .select(col("query_id"), col("__qvec"), col("cell"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
    probed.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qvec"), col("__cvec")).as("cosine_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding near-duplicate pairs above a cosine threshold, bucketed
    * by SRP signature to avoid the all-pairs cross product.
    */
  def nearDuplicates(vectors: DataFrame, threshold: Double = 0.95,
                     planes: Int = 8, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val v = vectors.select(col(idCol), col(vecCol),
      srpSignature(col(vecCol), planes).as("bucket"))
    val a = v.select(col(idCol).as("id_a"), col(vecCol).as("__va"),
      col("bucket"))
    val b = v.select(col(idCol).as("id_b"), col(vecCol).as("__vb"),
      col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("__va"), col("__vb")).as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
      .distinct()
  }
}
