package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableRound.pround
import graft.text.TextAnalysis
import graft.dedup.Dedup
import graft.sim.Similarity

/** Scale-path query catalog: LLM-data-pipeline operators (dedup,
  * similarity search, text analysis) over `documents` / `embeddings`,
  * plus the MLlib forecasting surface. Each query has a DuckDB oracle
  * reproducing the same hashing/math (md5-based — engine-portable).
  */
object QueriesScale {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** documents/embeddings arrive as single-row-group parquet (one
    * input split) — every per-row-heavy stage would run on one core.
    * Hash-repartition by id so hashing/similarity work spreads across
    * the cluster; the exchanged bytes are tiny relative to the CPU
    * saved (same reasoning as salting a skewed scan at 100 TB).
    */
  private def docs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").repartition(col("doc_id"))

  private def vecs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings").repartition(col("vec_id"))

  private def q(f: (SparkSession, String) => DataFrame)
      : (SparkSession, String) => DataFrame = { (spark, dir) =>
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    f(spark, dir)
  }

  // Shared DuckDB CTEs for tokenized / shingled / minhashed documents.
  private val toksSql =
    """toks AS (
      |  SELECT doc_id, lang, text,
      |         list_filter(regexp_split_to_array(text, '\s+'),
      |                     x -> x <> '') AS tk
      |  FROM documents)""".stripMargin

  private val sigsSql =
    s"""$toksSql,
       |sh AS (
       |  SELECT doc_id,
       |         CASE WHEN len(tk) >= 3
       |              THEN list_transform(generate_series(1, len(tk) - 2),
       |                     j -> array_to_string(tk[j:j+2], ' '))
       |              ELSE [array_to_string(tk, ' ')] END AS shl
       |  FROM toks),
       |shd AS (SELECT doc_id, list_distinct(shl) AS shl FROM sh),
       |sigs AS (
       |  SELECT doc_id,
       |         list_transform(generate_series(0, 15),
       |           i -> list_min(list_transform(shl,
       |                  s -> md5(CAST(i AS VARCHAR) || ':' || s)))) AS sig
       |  FROM shd)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_token_stats" -> q { (spark, dir) =>
      import graft.text.TextStatsExpression.textStats
      docs(spark, dir)
        .withColumn("st", textStats(col("text")))
        .select(col("doc_id"),
          col("st.n_tokens").as("n_tokens"),
          TextAnalysis.bpeTokenCount(col("text")).cast("long")
            .as("n_bpeish_tokens"),
          col("st.n_chars").as("n_chars"),
          pround(when(col("st.n_tokens") > 0,
            col("st.total_token_len").cast("double") / col("st.n_tokens")),
            6).as("avg_token_len"))
    },

    "q21_text_quality" -> q { (spark, dir) =>
      import graft.text.TextStatsExpression.textStats
      val stopRatio = when(col("st.n_tokens") > 0,
        col("st.n_stop").cast("double") / col("st.n_tokens"))
      val punctRatio = when(col("st.n_chars") > 0,
        col("st.n_punct").cast("double") / col("st.n_chars"))
      val lenScore =
        least(col("st.n_tokens").cast("double") / 100.0, lit(1.0))
      docs(spark, dir)
        .withColumn("st", textStats(col("text")))
        .select(col("doc_id"),
          pround(stopRatio, 6).as("stopword_ratio"),
          pround(punctRatio, 6).as("punct_ratio"),
          pround(lit(0.5) * lenScore
            + lit(0.3) * (lit(1.0) - abs(coalesce(stopRatio, lit(0.0))
              - 0.4))
            + lit(0.2) * (lit(1.0) - coalesce(punctRatio, lit(0.0))), 6)
            .as("quality_score"))
    },

    "q22_lang_id" -> q { (spark, dir) =>
      docs(spark, dir).select(col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("predicted_lang"))
    },

    "q23_dedup_exact" -> q { (spark, dir) =>
      Dedup.exact(docs(spark, dir))
    },

    "q24_minhash_sig" -> q { (spark, dir) =>
      val sig = Dedup.minhashSignature(col("text"), 16, 3)
      docs(spark, dir)
        .withColumn("sig", sig)
        // barrier: sig is referenced 6× below (sig_cat + 4 band
        // slices); without the exchange CollapseProject would inline
        // and recompute the k-hash signature per reference
        .repartition(col("doc_id"))
        .select(col("doc_id"),
          array_join(col("sig"), "|").as("sig_cat"),
          array_join(transform(sequence(lit(0), lit(3)),
            b => md5(concat_ws("|", slice(col("sig"), b * 4 + 1, lit(4))))),
            "|").as("band_hashes"))
    },

    "q25_lsh_pairs" -> q { (spark, dir) =>
      Dedup.minhashPairs(docs(spark, dir),
          threshold = 0.0)
        .select(col("id_a"), col("id_b"), col("est_jaccard"))
    },

    "q26_simhash" -> q { (spark, dir) =>
      docs(spark, dir).select(col("doc_id"),
        Dedup.simhash(col("text")).as("simhash"))
    },

    // Banded SimHash near-dup pairs: candidates share an exact 16-bit
    // band (guaranteed for hamming <= 3 by pigeonhole), re-scored with
    // exact hamming. Same banded-join scale shape as MinHash-LSH.
    "q47_simhash_pairs" -> q { (spark, dir) =>
      Dedup.simhashPairs(docs(spark, dir), maxHamming = 12)
    },

    "q27_embed_norm" -> q { (spark, dir) =>
      vecs(spark, dir).select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        pround(Similarity.l2Norm(col("embedding")), 6).as("l2_norm"))
    },

    "q28_ann_topk" -> q { (spark, dir) =>
      val v = vecs(spark, dir).select(col("vec_id"),
        col("embedding"), Similarity.l2Norm(col("embedding")).as("nrm"))
      val qv = v.filter(col("vec_id") % 40 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          col("nrm").as("qn"))
      val scored = v.join(broadcast(qv), col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          pround(Similarity.dot(col("qe"), col("embedding"))
            / (col("qn") * col("nrm")), 6).as("cosine_sim"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
    },

    "q29_embed_neardup" -> q { (spark, dir) =>
      val v = vecs(spark, dir).select(col("vec_id"),
        col("embedding"), Similarity.l2Norm(col("embedding")).as("nrm"))
      val a = v.select(col("vec_id").as("id_a"), col("embedding").as("ea"),
        col("nrm").as("na"))
      val b = v.select(col("vec_id").as("id_b"), col("embedding").as("eb"),
        col("nrm").as("nb"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          pround(Similarity.dot(col("ea"), col("eb"))
            / (col("na") * col("nb")), 6).as("cosine_sim"))
        .filter(col("cosine_sim") >= 0.35)
    },

    // IVF ANN (KMeans coarse quantizer + nprobe cells + exact rescore)
    // — no DuckDB oracle (KMeans isn't reproducible there); the driver
    // records a rows-only check, and DedupSimilaritySpec pins recall
    // against brute force.
    "q36_ann_ivf" -> q { (spark, dir) =>
      val v = vecs(spark, dir)
      Similarity.ivfTopK(v, v.filter(col("vec_id") % 40 === 0), k = 5,
          nlist = 8, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          pround(col("cosine_sim"), 6).as("cosine_sim"))
    },

    // End-to-end corpus cleaning: quality-filter -> language-filter ->
    // exact-dedup survivors, one declarative plan (the LLM-data
    // pipeline's daily materialized view, composed from the same
    // operators the individual queries check).
    "q41_clean_corpus" -> q { (spark, dir) =>
      import graft.text.TextStatsExpression.textStats
      import graft.text.TextAnalysis
      val scored = docs(spark, dir)
        .withColumn("st", textStats(col("text")))
        .withColumn("predicted_lang", TextAnalysis.langId(col("text")))
        .withColumn("fingerprint", TextAnalysis.fingerprint(col("text")))
        .filter(col("st.n_tokens") >= 20 &&
          col("predicted_lang") =!= "und")
      val wDedup = Window.partitionBy(col("fingerprint"))
        .orderBy(col("doc_id").asc)
      scored
        .withColumn("__rn", row_number().over(wDedup))
        .filter(col("__rn") === 1)
        .select(col("doc_id"), col("predicted_lang"),
          col("st.n_tokens").as("n_tokens"))
    },

    // Multimodal plumbing through the driver harness: deterministic
    // synthetic assets -> mapPartitions decode -> typed features. No
    // SQL oracle (binary payloads + stub codec); rows-only check.
    "q42_multimodal_features" -> q { (spark, dir) =>
      import graft.multimodal.Multimodal
      val n = 256
      Multimodal.extractFeatures(Multimodal.syntheticAssets(spark, n))
        .toDF()
        .select(col("asset_id"), col("media_type"), col("n_bytes"),
          col("content_hash"),
          pround(col("feature").getItem(0).cast("double"), 6)
            .as("f0"))
    },

    "q30_linreg_forecast" -> q { (spark, dir) =>
      import org.apache.spark.ml.feature.VectorAssembler
      import org.apache.spark.ml.regression.LinearRegression
      val df = t(spark, dir, "events").select(
        col("user_id").cast("double").as("x"), col("value").as("y"))
      val assembled = new VectorAssembler().setInputCols(Array("x"))
        .setOutputCol("features").transform(df)
      val model = new LinearRegression().setFeaturesCol("features")
        .setLabelCol("y").setSolver("normal").setRegParam(0.0)
        .fit(assembled)
      val n = df.count()
      import spark.implicits._
      import graft.functions.PortableRound.proundScala
      Seq((proundScala(model.coefficients(0), 4),
        proundScala(model.intercept, 4), n))
        .toDF("slope", "intercept", "n")
    }
  )

  val oracles: Map[String, String] = Map(
    "q20_token_stats" ->
      s"""WITH $toksSql
         |SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
         |       CAST(len(regexp_extract_all(text,
         |         ' ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+'))
         |         AS BIGINT) AS n_bpeish_tokens,
         |       CAST(length(text) AS BIGINT) AS n_chars,
         |       round(CASE WHEN len(tk) > 0
         |             THEN CAST(list_sum(list_transform(tk,
         |                    x -> length(x))) AS DOUBLE) / len(tk)
         |             END, 6) AS avg_token_len
         |FROM toks""".stripMargin,

    "q21_text_quality" ->
      s"""WITH $toksSql,
         |r AS (
         |  SELECT doc_id, text, tk,
         |         CASE WHEN len(tk) > 0
         |              THEN CAST(len(list_filter(tk, x -> list_contains(
         |                     ['the','a','an','and','or','of','to','in',
         |                      'is','it'], lower(x)))) AS DOUBLE) / len(tk)
         |              END AS stop_ratio,
         |         CASE WHEN length(text) > 0
         |              THEN CAST(length(regexp_replace(text,
         |                     '[^[:punct:]]', '', 'g')) AS DOUBLE)
         |                   / length(text)
         |              END AS punct_ratio
         |  FROM toks)
         |SELECT doc_id, round(stop_ratio, 6) AS stopword_ratio,
         |       round(punct_ratio, 6) AS punct_ratio,
         |       round(0.5 * LEAST(CAST(len(tk) AS DOUBLE) / 100.0, 1.0)
         |             + 0.3 * (1.0 - abs(COALESCE(stop_ratio, 0.0) - 0.4))
         |             + 0.2 * (1.0 - COALESCE(punct_ratio, 0.0)), 6)
         |         AS quality_score
         |FROM r""".stripMargin,

    "q22_lang_id" ->
      """WITH p AS (
        |  SELECT doc_id, lang, ' ' || lower(text) || ' ' AS pt
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, lang,
        |    (length(pt) - length(replace(pt, ' the ', ''))) / 5
        |    + (length(pt) - length(replace(pt, ' and ', ''))) / 5
        |    + (length(pt) - length(replace(pt, ' of ', ''))) / 4 AS s_en,
        |    (length(pt) - length(replace(pt, ' el ', ''))) / 4
        |    + (length(pt) - length(replace(pt, ' la ', ''))) / 4
        |    + (length(pt) - length(replace(pt, ' que ', ''))) / 5 AS s_es,
        |    (length(pt) - length(replace(pt, ' le ', ''))) / 4
        |    + (length(pt) - length(replace(pt, ' la ', ''))) / 4
        |    + (length(pt) - length(replace(pt, ' et ', ''))) / 4 AS s_fr,
        |    (length(pt) - length(replace(pt, ' der ', ''))) / 5
        |    + (length(pt) - length(replace(pt, ' und ', ''))) / 5
        |    + (length(pt) - length(replace(pt, ' die ', ''))) / 5 AS s_de
        |  FROM p)
        |SELECT doc_id, lang,
        |       CASE WHEN GREATEST(s_en, s_es, s_fr, s_de) <= 0 THEN 'und'
        |            WHEN s_en = GREATEST(s_en, s_es, s_fr, s_de) THEN 'en'
        |            WHEN s_es = GREATEST(s_en, s_es, s_fr, s_de) THEN 'es'
        |            WHEN s_fr = GREATEST(s_en, s_es, s_fr, s_de) THEN 'fr'
        |            WHEN s_de = GREATEST(s_en, s_es, s_fr, s_de) THEN 'de'
        |            ELSE 'und' END AS predicted_lang
        |FROM s""".stripMargin,

    "q23_dedup_exact" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
        |         AS fingerprint,
        |       MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM documents
        |GROUP BY 1""".stripMargin,

    "q24_minhash_sig" ->
      s"""WITH $sigsSql
         |SELECT doc_id, array_to_string(sig, '|') AS sig_cat,
         |       array_to_string(list_transform(generate_series(0, 3),
         |         b -> md5(array_to_string(sig[b*4+1:b*4+4], '|'))), '|')
         |         AS band_hashes
         |FROM sigs""".stripMargin,

    "q25_lsh_pairs" ->
      s"""WITH $sigsSql,
         |bands AS (
         |  SELECT doc_id, sig, b.b AS band_idx,
         |         md5(array_to_string(sig[b.b*4+1:b.b*4+4], '|'))
         |           AS band_hash
         |  FROM sigs CROSS JOIN (SELECT unnest([0,1,2,3]) AS b) b)
         |SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b,
         |       CAST(list_sum(list_transform(generate_series(1, 16),
         |              i -> CASE WHEN a.sig[i] = bb.sig[i]
         |                        THEN 1 ELSE 0 END)) AS DOUBLE) / 16.0
         |         AS est_jaccard
         |FROM bands a
         |JOIN bands bb ON a.band_idx = bb.band_idx
         |             AND a.band_hash = bb.band_hash
         |             AND a.doc_id < bb.doc_id""".stripMargin,

    "q26_simhash" ->
      s"""WITH $toksSql,
         |h AS (
         |  SELECT doc_id,
         |         list_transform(tk, t -> substr(md5(t), 1, 16)) AS hs
         |  FROM toks),
         |v AS (
         |  SELECT doc_id,
         |         list_transform(generate_series(0, 63), j ->
         |           CASE WHEN COALESCE(list_sum(list_transform(hs, h ->
         |             2 * (((strpos('0123456789abcdef',
         |                    substr(h, (j // 4) + 1, 1)) - 1)
         |                   >> (3 - (j % 4))) & 1) - 1)), 0) > 0
         |           THEN 1 ELSE 0 END) AS bits
         |  FROM h)
         |SELECT doc_id,
         |       array_to_string(list_transform(generate_series(0, 15), n ->
         |         substr('0123456789abcdef',
         |           8 * bits[4*n+1] + 4 * bits[4*n+2] + 2 * bits[4*n+3]
         |           + bits[4*n+4] + 1, 1)), '') AS simhash
         |FROM v""".stripMargin,

    "q47_simhash_pairs" ->
      s"""WITH $toksSql,
         |h AS (
         |  SELECT doc_id,
         |         list_transform(tk, t -> substr(md5(t), 1, 16)) AS hs
         |  FROM toks),
         |v AS (
         |  SELECT doc_id,
         |         list_transform(generate_series(0, 63), j ->
         |           CASE WHEN COALESCE(list_sum(list_transform(hs, h ->
         |             2 * (((strpos('0123456789abcdef',
         |                    substr(h, (j // 4) + 1, 1)) - 1)
         |                   >> (3 - (j % 4))) & 1) - 1)), 0) > 0
         |           THEN 1 ELSE 0 END) AS bits
         |  FROM h),
         |sh AS (
         |  SELECT doc_id,
         |         array_to_string(list_transform(generate_series(0, 15),
         |           n -> substr('0123456789abcdef',
         |             8 * bits[4*n+1] + 4 * bits[4*n+2] + 2 * bits[4*n+3]
         |             + bits[4*n+4] + 1, 1)), '') AS s
         |  FROM v),
         |banded AS (
         |  SELECT doc_id, s, b.b AS band_idx,
         |         substr(s, b.b * 4 + 1, 4) AS band_val
         |  FROM sh CROSS JOIN (SELECT unnest([0,1,2,3]) AS b) b),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b,
         |         CAST(list_sum(list_transform(generate_series(1, 16),
         |           i -> bit_count(xor(
         |             strpos('0123456789abcdef', substr(a.s, i, 1)) - 1,
         |             strpos('0123456789abcdef', substr(bb.s, i, 1)) - 1
         |           )))) AS INT) AS hamming
         |  FROM banded a
         |  JOIN banded bb ON a.band_idx = bb.band_idx
         |               AND a.band_val = bb.band_val
         |               AND a.doc_id < bb.doc_id)
         |SELECT id_a, id_b, hamming FROM pairs
         |WHERE hamming <= 12""".stripMargin,

    "q27_embed_norm" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |       round(sqrt(list_sum(list_transform(embedding,
        |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6)
        |         AS l2_norm
        |FROM embeddings""".stripMargin,

    "q28_ann_topk" ->
      """WITH v AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_sum(list_transform(embedding,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |p AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         round(list_sum(list_transform(generate_series(1, 64),
        |             i -> CAST(q.embedding[i] AS DOUBLE)
        |                  * CAST(c.embedding[i] AS DOUBLE)))
        |           / (q.nrm * c.nrm), 6) AS cosine_sim
        |  FROM v q JOIN v c
        |    ON q.vec_id % 40 = 0 AND c.vec_id <> q.vec_id)
        |SELECT query_id, neighbor_id,
        |       CAST(row_number() OVER w AS INT) AS rank, cosine_sim
        |FROM p
        |WINDOW w AS (PARTITION BY query_id
        |             ORDER BY cosine_sim DESC, neighbor_id ASC)
        |QUALIFY row_number() OVER w <= 5""".stripMargin,

    "q29_embed_neardup" ->
      """WITH v AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_sum(list_transform(embedding,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |         round(list_sum(list_transform(generate_series(1, 64),
        |             i -> CAST(a.embedding[i] AS DOUBLE)
        |                  * CAST(b.embedding[i] AS DOUBLE)))
        |           / (a.nrm * b.nrm), 6) AS cosine_sim
        |  FROM v a JOIN v b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, cosine_sim FROM p
        |WHERE cosine_sim >= 0.35""".stripMargin,

    "q41_clean_corpus" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |         len(list_filter(regexp_split_to_array(text, '\s+'),
        |             x -> x <> '')) AS n_tokens,
        |         ' ' || lower(text) || ' ' AS pt,
        |         md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
        |           AS fingerprint
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, n_tokens, fingerprint,
        |    (length(pt) - length(replace(pt, ' the ', ''))) / 5
        |    + (length(pt) - length(replace(pt, ' and ', ''))) / 5
        |    + (length(pt) - length(replace(pt, ' of ', ''))) / 4 AS s_en,
        |    (length(pt) - length(replace(pt, ' el ', ''))) / 4
        |    + (length(pt) - length(replace(pt, ' la ', ''))) / 4
        |    + (length(pt) - length(replace(pt, ' que ', ''))) / 5 AS s_es,
        |    (length(pt) - length(replace(pt, ' le ', ''))) / 4
        |    + (length(pt) - length(replace(pt, ' la ', ''))) / 4
        |    + (length(pt) - length(replace(pt, ' et ', ''))) / 4 AS s_fr,
        |    (length(pt) - length(replace(pt, ' der ', ''))) / 5
        |    + (length(pt) - length(replace(pt, ' und ', ''))) / 5
        |    + (length(pt) - length(replace(pt, ' die ', ''))) / 5 AS s_de
        |  FROM t),
        |lang AS (
        |  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |         fingerprint,
        |         CASE WHEN GREATEST(s_en, s_es, s_fr, s_de) <= 0
        |              THEN 'und'
        |              WHEN s_en = GREATEST(s_en, s_es, s_fr, s_de)
        |              THEN 'en'
        |              WHEN s_es = GREATEST(s_en, s_es, s_fr, s_de)
        |              THEN 'es'
        |              WHEN s_fr = GREATEST(s_en, s_es, s_fr, s_de)
        |              THEN 'fr'
        |              WHEN s_de = GREATEST(s_en, s_es, s_fr, s_de)
        |              THEN 'de'
        |              ELSE 'und' END AS predicted_lang
        |  FROM s),
        |filtered AS (
        |  SELECT * FROM lang
        |  WHERE n_tokens >= 20 AND predicted_lang <> 'und')
        |SELECT doc_id, predicted_lang, n_tokens
        |FROM filtered
        |QUALIFY row_number() OVER (
        |  PARTITION BY fingerprint ORDER BY doc_id ASC) = 1""".stripMargin,

    "q30_linreg_forecast" ->
      """SELECT round(regr_slope(value, CAST(user_id AS DOUBLE)), 4)
        |         AS slope,
        |       round(regr_intercept(value, CAST(user_id AS DOUBLE)), 4)
        |         AS intercept,
        |       COUNT(*) AS n
        |FROM events""".stripMargin
  )
}
