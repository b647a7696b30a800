package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableRound.pround

/** Product quantization (PQ) for embedding columns (capability
  * extension — the compressed-vector path of a large-scale similarity
  * stack: a d-dim float vector becomes m small codes, an ~dsub*4/1-x
  * compression that makes billion-vector ANN indexes RAM-resident).
  *
  * Split into offline codebook fit and online encode, mirroring the
  * IVF design ([[Similarity.fitIvfCentroids]]/[[Similarity.ivfTopK]]):
  * codebooks are trained once ([[fitCodebooks]], seeded KMeans per
  * subspace) or derived deterministically ([[codebookLiteral]], md5 —
  * reproducible in any engine, which is what makes a DuckDB oracle
  * possible), then [[distances]]/[[codes]]/[[quantError]] are pure
  * per-row column work against codebook LITERALS: no join, no shuffle,
  * no state — the encode scales linearly and survives any
  * repartitioning.
  *
  * Per-subspace distances are rounded to 9 dp BEFORE the argmin so
  * both engines see identical values (a sub-ULP summation-order
  * difference at a near-tie would otherwise flip a code); ties break
  * to the lowest code index in both engines (first position of the
  * min).
  */
object Pq {

  /** Deterministic codebook component in [-1, 1): md5-derived like
    * [[Similarity.planeComponent]] but tagged per (subspace, code,
    * dim) — engine-independent constants.
    */
  private[graft] def pqComponent(sub: Int, code: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"pq:$sub:$code:$dim"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 2147483648.0 - 1.0
  }

  /** Deterministic m x k x dsub codebook (no training, reproducible
    * anywhere — the oracle-checkable stand-in for [[fitCodebooks]]).
    */
  def codebookLiteral(m: Int, k: Int, dsub: Int): Seq[Seq[Seq[Double]]] =
    (0 until m).map(s => (0 until k).map(t =>
      (0 until dsub).map(j => pqComponent(s, t, j))))

  /** OFFLINE fit: seeded KMeans per subspace over the sliced
    * subvectors — at scale this is its own job and the codebooks are
    * persisted; the online encode never re-fits. The collect is
    * inherent and tiny (m*k centroid subvectors).
    */
  def fitCodebooks(corpus: DataFrame, m: Int, k: Int,
                   seed: Long = 42L, vecCol: String = "embedding")
      : Seq[Seq[Seq[Double]]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"PQ: dim $dim not divisible by m=$m")
    val dsub = dim / m
    (0 until m).map { s =>
      val sub = corpus.select(array_to_vector(
        slice(col(vecCol), s * dsub + 1, dsub).cast("array<double>"))
        .as("__f"))
      new KMeans().setK(k).setSeed(seed + s).setFeaturesCol("__f")
        .fit(sub).clusterCenters.map(_.toArray.toSeq).toSeq
    }
  }

  /** Per-subspace, per-code squared L2 distances as a nested array
    * column: dists[s][t] = round(sum_j (v[s*dsub+j] - cb[s][t][j])^2, 9).
    */
  def distances(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    require(codebooks.nonEmpty && codebooks.head.nonEmpty,
      "PQ: codebooks must be non-empty")
    val m = codebooks.length
    val k = codebooks.head.length
    val dsub = codebooks.head.head.length
    val cb = typedLit(codebooks)
    // fail LOUDLY on a dim mismatch (same doctrine as srpSignature:
    // silent null-padding would corrupt every downstream code)
    val guard = assert_true(size(vec) === lit(m * dsub),
      concat(lit(s"pq: expected dim ${m * dsub}, got "),
        size(vec).cast("string")))
    when(guard.isNull,
      transform(sequence(lit(0), lit(m - 1)), s =>
        transform(sequence(lit(1), lit(k)), t =>
          pround(aggregate(
            zip_with(slice(vec, s * lit(dsub) + lit(1), lit(dsub)),
              element_at(element_at(cb, s + 1), t),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, z) => a + z), 9))))
  }

  /** Code per subspace: first index of the minimum distance (0-based,
    * ties to the lowest code).
    */
  def codes(dists: Column): Column =
    transform(dists, dl =>
      (array_position(dl, array_min(dl)) - 1).cast("int"))

  /** Total squared reconstruction error: sum over subspaces of the
    * min per-subspace distance, rounded for portability.
    */
  def quantError(dists: Column, digits: Int = 6): Column =
    pround(aggregate(transform(dists, dl => array_min(dl)),
      lit(0.0), (a, z) => a + z), digits)
}
