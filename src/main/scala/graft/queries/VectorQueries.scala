package graft.queries

import graft.Tables
import graft.operators.VectorOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity coverage (SURVEY.md §2 B5–B7) over
  * `embeddings` (64-dim float vectors). Oracles mirror the exact
  * left-fold double arithmetic (DuckDB list_dot_product ≡ Spark
  * zip_with+aggregate), with ROUND(..,6) guarding the last ulp.
  */
object VectorQueries {

  val defs: Map[String, QueryDef] = Map(
    // B6: brute-force cosine top-k for 10 query vectors
    "ann_topk_brute" -> QueryDef.sql(
      (s, dir) => VectorOps.annTopKBrute(Tables.embeddings(s, dir), col("vec_id") < 10, 5),
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm FROM n WHERE vec_id < 10),
        |sc AS (SELECT q_id, vec_id AS neighbor_id,
        |         ROUND(list_dot_product(v, qv) / (nrm * qnrm), 6) AS score
        |       FROM n CROSS JOIN q WHERE vec_id <> q_id),
        |r AS (SELECT q_id, neighbor_id, score,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
        |      FROM sc)
        |SELECT q_id, neighbor_id, score, rnk FROM r WHERE rnk <= 5
        |ORDER BY q_id, rnk""".stripMargin),

    // B5 PRIMARY (r9): embedding-cosine near-duplicate pairs over the
    // FULL corpus — EXACT-duplicate vectors collapse to min-id
    // representatives with group counts first (identical embeddings
    // carry identical information; on replicated packs their pairwise
    // expansion is output-quadratic — the sf100 lesson), then banded
    // LSH candidates with the bit width derived from the DISTINCT
    // count (bits = ceil(log2(N/64)), integer ladder on both engines)
    // and exact cosine verify on the survivors. Expected bucket
    // occupancy stays ~64 at EVERY scale factor, so candidate volume
    // is linear in the distinct count — the plan that runs at 100 TB,
    // and what the bench measures. The weight family is the
    // oracle-expressible integer mix (lsh_band_keys_lin); the oracle
    // recomputes the collapse, the dial, every plane dot, the banded
    // join, and the verify. The id-capped exact all-pairs form
    // (VectorOps.cosineNearDupPairs) is a spec anchor only.
    "neardup_cosine" -> QueryDef.sql(
      (s, dir) => VectorOps.cosineNearDupPairsAuto(
        Tables.embeddings(s, dir), 0.4, 64, bands = 6).orderBy("d1", "d2"),
      s"""WITH g AS (SELECT embedding, MIN(vec_id) AS vec_id, COUNT(*) AS ndup
         |           FROM embeddings GROUP BY embedding),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v, ndup FROM g),
         |k AS (SELECT ${VectorOps.lshBitsSqlCase("COUNT(*)")} AS bits FROM g),
         |n AS (SELECT vec_id, v, ndup, sqrt(list_dot_product(v, v)) AS nrm FROM e),
         |${VectorOps.lshLinKeysSql(64, 6)},
         |cand AS (SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
         |         FROM keys a JOIN keys b
         |           ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id)
         |SELECT c.d1, c.d2,
         |  ROUND(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) AS score,
         |  x.ndup AS n1_dups, y.ndup AS n2_dups
         |FROM cand c JOIN n x ON x.vec_id = c.d1 JOIN n y ON y.vec_id = c.d2
         |WHERE ROUND(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) >= 0.4
         |ORDER BY d1, d2""".stripMargin),

    // B5 scale path: near-dup pairs via LSH buckets — candidates only
    // within a bucket, exact cosine verify. Oracle embeds the same
    // literal hyperplane weights (left-associated chain), so buckets
    // and the surviving pair set match bit-for-bit; with 2 bits the
    // buckets are coarse, proving the bucket JOIN (not a cross join)
    // produces the pairs.
    "neardup_cosine_lsh" -> QueryDef.sql(
      (s, dir) => VectorOps.cosineNearDupPairsLsh(
        Tables.embeddings(s, dir), 300, 0.4, 64, 2).orderBy("d1", "d2"),
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 300),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
         |        ${VectorOps.lshPlanesSql(64, 2)} AS bucket FROM e)
         |SELECT a.vec_id AS d1, b.vec_id AS d2,
         |  ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS score
         |FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.4
         |ORDER BY d1, d2""".stripMargin),

    // B5 scale path at production widths: multi-band OR (6 bands × 5
    // sign bits) — a pair is a candidate when ANY band's bucket
    // matches, so recall survives bit widths that keep each band's
    // buckets fine-grained (the candidate volume stays ≪ all-pairs;
    // VectorOpsSpec measures both). Oracle: per-band equi-joins
    // UNION'd (UNION dedups exactly like the Spark-side distinct),
    // each embedding the same literal plane slice.
    "neardup_cosine_lsh_banded" -> QueryDef.sql(
      (s, dir) => VectorOps.cosineNearDupPairsLshBanded(
        Tables.embeddings(s, dir), 300, 0.4, 64, bitsPerBand = 5, bands = 6)
        .orderBy("d1", "d2"),
      {
        val bandCols = (0 until 6)
          .map(j => s"${VectorOps.lshBandSql(64, 5, 6, j)} AS b$j").mkString(",\n         |        ")
        val candUnion = (0 until 6)
          .map(j => s"SELECT a.vec_id AS d1, b.vec_id AS d2 FROM n a JOIN n b ON a.b$j = b.b$j AND a.vec_id < b.vec_id")
          .mkString("\n         |  UNION\n         |  ")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 300),
           |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
           |        $bandCols
           |      FROM e),
           |cand AS (
           |  $candUnion
           |)
           |SELECT c.d1, c.d2,
           |  ROUND(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) AS score
           |FROM cand c
           |JOIN n x ON x.vec_id = c.d1
           |JOIN n y ON y.vec_id = c.d2
           |WHERE ROUND(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) >= 0.4
           |ORDER BY d1, d2""".stripMargin
      }),

    // B7d: int8 scalar-quantized ANN — the memory-bound scale path
    // (8× smaller corpus representation for the coarse scan, exact
    // rescore of the top-15 coarse candidates per query). The whole
    // quantize → integer-dot rank → rescore pipeline is deterministic
    // IEEE math, so the oracle replays it exactly; recall vs brute is
    // measured in VectorOpsSpec.
    "ann_topk_quantized" -> QueryDef.sql(
      (s, dir) => VectorOps.annTopKQuantized(
        Tables.embeddings(s, dir), col("vec_id") < 10, k = 5, rerank = 15),
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |m AS (SELECT vec_id, v, nrm, list_max(list_transform(v, x -> abs(x))) AS mx
        |      FROM n WHERE nrm > 0),
        |z AS (SELECT vec_id, v, nrm, CASE WHEN mx = 0 THEN 1.0 ELSE mx / 127.0 END AS s FROM m),
        |qz AS (SELECT vec_id, v, nrm, s,
        |         list_transform(v, x -> CAST(floor(x / s + 0.5) AS BIGINT)) AS q FROM z),
        |p AS (SELECT vec_id AS q_id, v AS pv, nrm AS pnrm, s AS ps, q AS pq
        |      FROM qz WHERE vec_id < 10),
        |co AS (SELECT q_id, vec_id AS neighbor_id, v, nrm, pv, pnrm,
        |         list_dot_product(q, pq) * s * ps AS qscore
        |       FROM qz CROSS JOIN p WHERE vec_id <> q_id),
        |cand AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
        |           ORDER BY qscore DESC, neighbor_id) AS crnk FROM co),
        |sc AS (SELECT q_id, neighbor_id,
        |         ROUND(list_dot_product(v, pv) / (nrm * pnrm), 6) AS score
        |       FROM cand WHERE crnk <= 15),
        |r AS (SELECT q_id, neighbor_id, score,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
        |      FROM sc)
        |SELECT q_id, neighbor_id, score, rnk FROM r WHERE rnk <= 5
        |ORDER BY q_id, rnk""".stripMargin),

    // B60: int8 quantization error audit — the reconstruction-error
    // companion to ann_topk_quantized's memory path: per vector, the
    // worst per-element deviation from the integer grid in per-mille
    // of the quantization STEP (|v_i/s − q_i| ≤ 0.5 by construction —
    // the audit proves the bound holds and shows the distribution's
    // edge), plus the step itself. The per-mille figure is floored to
    // an INTEGER from deterministic IEEE doubles (s = mx/127, one
    // division per element — both engines bit-identical), so the
    // output is hash-robust with no ROUND-on-double hazards. Top-20
    // by (worst error, vec_id); all row-local scan work + TakeOrdered.
    "embed_quant_error" -> QueryDef.sql(
      (s, dir) => Tables.embeddings(s, dir)
        .select(col("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
        .withColumn("mx", expr("array_max(transform(v, x -> abs(x)))"))
        .filter(col("mx") > 0)
        .withColumn("s", col("mx") / 127.0)
        .withColumn("max_err_pm", expr(
          """CAST(FLOOR(array_max(transform(v,
            |  x -> abs(x / s - CAST(FLOOR(x / s + 0.5) AS BIGINT)))) * 1000) AS BIGINT)""".stripMargin))
        .select(col("vec_id"), col("s").as("step"), col("max_err_pm"))
        .orderBy(col("max_err_pm").desc, col("vec_id")).limit(20),
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx
        |      FROM e WHERE list_max(list_transform(v, x -> abs(x))) > 0),
        |z AS (SELECT vec_id, mx / 127.0 AS step,
        |        CAST(FLOOR(list_max(list_transform(v,
        |          x -> abs(x / (mx / 127.0) - CAST(FLOOR(x / (mx / 127.0) + 0.5) AS BIGINT))))
        |          * 1000) AS BIGINT) AS max_err_pm
        |      FROM m)
        |SELECT vec_id, step, max_err_pm FROM z
        |ORDER BY max_err_pm DESC, vec_id LIMIT 20""".stripMargin),

    // B7: LSH-bucketed ANN — scale path; recall checked in
    // VectorOpsSpec. Full DuckDB oracle: the hyperplane weights are
    // driver-side literals, embedded into the SQL as the SAME
    // left-associated v[i]*w chain, so sign bits (and therefore
    // buckets, candidates, and top-k) match bit-for-bit.
    "ann_topk_lsh" -> QueryDef.sql(
      (s, dir) => VectorOps.annTopKLsh(Tables.embeddings(s, dir), col("vec_id") < 10, 5, 64, 4),
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
         |        ${VectorOps.lshPlanesSql(64, 4)} AS bucket FROM e),
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm, bucket AS q_bucket
         |      FROM n WHERE vec_id < 10),
         |sc AS (SELECT q_id, vec_id AS neighbor_id,
         |         ROUND(list_dot_product(v, qv) / (nrm * qnrm), 6) AS score
         |       FROM n JOIN q ON bucket = q_bucket AND vec_id <> q_id),
         |r AS (SELECT q_id, neighbor_id, score,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
         |      FROM sc)
         |SELECT q_id, neighbor_id, score, rnk FROM r WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin),

    // B7b: IVF-style ANN — probe-limited centroid cells. Full DuckDB
    // oracle: deterministic centroids + cosine cell ranking are plain
    // SQL, so the hash match proves the shuffle-free row-local
    // assignment ranks cells exactly like the reference windowed form.
    "ann_topk_ivf" -> QueryDef.sql(
      (s, dir) => VectorOps.annTopKIvf(Tables.embeddings(s, dir), col("vec_id") < 10, 5,
        nCentroids = 16, nProbe = 4),
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |c AS (SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM n WHERE vec_id < 16),
        |aff AS (SELECT n.vec_id, n.v, n.nrm, c.c_id,
        |          ROW_NUMBER() OVER (PARTITION BY n.vec_id
        |            ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC, c.c_id) AS crnk
        |        FROM n CROSS JOIN c),
        |assigned AS (SELECT vec_id, v, nrm, c_id AS cell FROM aff WHERE crnk = 1),
        |probes AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm, c_id AS cell
        |           FROM aff WHERE crnk <= 4 AND vec_id < 10),
        |sc AS (SELECT q_id, a.vec_id AS neighbor_id,
        |         ROUND(list_dot_product(a.v, qv) / (a.nrm * qnrm), 6) AS score
        |       FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.q_id),
        |r AS (SELECT q_id, neighbor_id, score,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
        |      FROM sc)
        |SELECT q_id, neighbor_id, score, rnk FROM r WHERE rnk <= 5
        |ORDER BY q_id, rnk""".stripMargin),

    // B7c: IVF with Lloyd's-refined centroids (2 distributed k-means
    // rounds: row-local assignment, typed partial-agg cell means) —
    // recall vs brute in VectorOpsSpec. FULL DuckDB oracle: Lloyd's
    // with deterministic init (first k vectors) and fixed iters is
    // plain SQL — per round, argmax-cosine assignment (ROW_NUMBER) +
    // per-dimension AVG rebuilt into a list. The elementwise mean is
    // sum/count in double on both engines; assignment/rank margins are
    // orders of magnitude above the reduce-order ulps, so the rounded
    // scores hash-match (verified cell-exact against the Spark dump).
    "ann_topk_ivf_kmeans" -> QueryDef.sql(
      (s, dir) => VectorOps.annTopKIvf(Tables.embeddings(s, dir), col("vec_id") < 10, 5,
        nCentroids = 16, nProbe = 4, kmeansIters = 2),
      kmeansIvfOracleSql(nCentroids = 16, iters = 2, nProbe = 4, k = 5, nQueries = 10)),

    // Per-label centroids in long (label, pos, c) form — never an
    // array column in query output (driver canon). Element sums
    // accumulate in exact DECIMAL (partition-order independent); the
    // mean is one exact-operand double division, rounded.
    "embed_centroids" -> QueryDef.sql(
      (s, dir) => VectorOps.labelCentroidSums(Tables.embeddings(s, dir))
        .select(col("label").cast("long").as("label"), col("pos").cast("long").as("pos"),
          round(col("sdec").cast("double") / col("n"), 6).as("c"))
        .orderBy("label", "pos"),
      """SELECT CAST(label AS BIGINT) AS label, CAST(t.i AS BIGINT) AS pos,
        |  ROUND(CAST(CAST(SUM(CAST(embedding[CAST(t.i AS INT) + 1] AS DECIMAL(18,9)))
        |                  AS DECIMAL(38,9)) AS DOUBLE) / COUNT(*), 6) AS c
        |FROM embeddings, UNNEST(range(len(embedding))) AS t(i)
        |GROUP BY label, t.i ORDER BY label, pos""".stripMargin),

    // Class-outlier scoring: cosine of every vector to its label's
    // centroid (exact sum vector S — cos(v, S/n) = cos(v, S), so no
    // lossy mean), 20 least-typical vectors. Ordering happens on the
    // ROUNDED score + vec_id on both engines, so the cut line is
    // identical even where raw fold order differs in the last ulp.
    "embed_outliers" -> QueryDef.sql(
      (s, dir) => VectorOps.centroidCosine(Tables.embeddings(s, dir))
        .select(col("vec_id"), col("label").cast("long").as("label"), col("cos_centroid"))
        .orderBy(col("cos_centroid").asc, col("vec_id"))
        .limit(20),
      """WITH sums AS (
        |  SELECT label, t.i AS pos,
        |    CAST(CAST(SUM(CAST(embedding[CAST(t.i AS INT) + 1] AS DECIMAL(18,9)))
        |              AS DECIMAL(38,9)) AS DOUBLE) AS sv
        |  FROM embeddings, UNNEST(range(len(embedding))) AS t(i)
        |  GROUP BY label, t.i),
        |cent AS (SELECT label, list(sv ORDER BY pos) AS cv FROM sums GROUP BY label),
        |e AS (SELECT vec_id, e.label, embedding::DOUBLE[] AS v
        |      FROM embeddings e
        |      WHERE sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) > 0),
        |sc AS (SELECT vec_id, CAST(e.label AS BIGINT) AS label,
        |         ROUND(list_dot_product(v, cv) /
        |               (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))), 6)
        |           AS cos_centroid
        |       FROM e JOIN cent ON e.label = cent.label
        |       WHERE sqrt(list_dot_product(cv, cv)) > 0)
        |SELECT vec_id, label, cos_centroid FROM sc
        |ORDER BY cos_centroid ASC, vec_id LIMIT 20""".stripMargin),

    // ANN recall@5 as a MEASURED surface: the IVF path's top-5 overlap
    // with brute-force ground truth, one row. Both pipelines are
    // deterministic (rounded-score ranking), so recall is a stable
    // number, not a distribution — the cell-probe cost/recall tradeoff
    // on the record next to the operators themselves.
    "ann_recall_ivf" -> QueryDef.sql(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val ivf = VectorOps.annTopKIvf(emb, col("vec_id") < 10, 5,
          nCentroids = 16, nProbe = 4)
          .select(col("q_id"), col("neighbor_id"))
        // materialize the ground truth once — it feeds both the hit
        // join and the denominator, and the corpus scan behind it is
        // the dominant cost of this surface
        val brute = VectorOps.annTopKBrute(emb, col("vec_id") < 10, 5)
          .select(col("q_id").as("bq"), col("neighbor_id").as("bn"))
          .localCheckpoint()
        val hits = ivf.join(brute,
          col("q_id") === col("bq") && col("neighbor_id") === col("bn"))
          .agg(count(lit(1)).as("n_hits"))
        hits.crossJoin(brute.agg(count(lit(1)).as("n_truth")))
          .select(col("n_hits"), col("n_truth"),
            round(col("n_hits").cast("double") / col("n_truth"), 6).as("recall_at_5"))
      },
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |c AS (SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM n WHERE vec_id < 16),
        |aff AS (SELECT n.vec_id, n.v, n.nrm, c.c_id,
        |          ROW_NUMBER() OVER (PARTITION BY n.vec_id
        |            ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC, c.c_id) AS crnk
        |        FROM n CROSS JOIN c),
        |assigned AS (SELECT vec_id, v, nrm, c_id AS cell FROM aff WHERE crnk = 1),
        |probes AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm, c_id AS cell
        |           FROM aff WHERE crnk <= 4 AND vec_id < 10),
        |sc AS (SELECT q_id, a.vec_id AS neighbor_id,
        |         ROUND(list_dot_product(a.v, qv) / (a.nrm * qnrm), 6) AS score
        |       FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.q_id),
        |ivf AS (SELECT q_id, neighbor_id FROM (
        |          SELECT q_id, neighbor_id,
        |            ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, neighbor_id) AS rnk
        |          FROM sc) WHERE rnk <= 5),
        |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm FROM n WHERE vec_id < 10),
        |bsc AS (SELECT q_id, vec_id AS neighbor_id,
        |          ROUND(list_dot_product(v, qv) / (nrm * qnrm), 6) AS score
        |        FROM n CROSS JOIN q WHERE vec_id <> q_id),
        |brute AS (SELECT q_id, neighbor_id FROM (
        |            SELECT q_id, neighbor_id,
        |              ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, neighbor_id) AS rnk
        |            FROM bsc) WHERE rnk <= 5)
        |SELECT (SELECT COUNT(*) FROM ivf JOIN brute USING (q_id, neighbor_id)) AS n_hits,
        |  (SELECT COUNT(*) FROM brute) AS n_truth,
        |  ROUND(CAST((SELECT COUNT(*) FROM ivf JOIN brute USING (q_id, neighbor_id)) AS DOUBLE) /
        |        (SELECT COUNT(*) FROM brute), 6) AS recall_at_5""".stripMargin),

    // The LSH tradeoff as a MEASURED surface: candidate-pair count,
    // surviving near-dup pairs, and recall vs the exact quadratic
    // path, in one row. On this synthetic corpus the 0.4 threshold
    // sits only ~3σ above random-pair cosine (≈N(0, 1/√64)), the
    // hardest regime for sign-bit LSH — 4-bit × 8-band banding buys
    // 0.79 recall for 0.41 of the pair comparisons. Real near-dup
    // thresholds (≥0.9) collapse candidate_frac by orders of
    // magnitude; this row keeps the engine honest about the curve's
    // hard end rather than demoing the easy one.
    "neardup_lsh_stats" -> QueryDef.sql(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val exact = VectorOps.cosineNearDupPairs(emb, 300, 0.4)
        val cand = VectorOps.cosineNearDupCandidatesLshBanded(emb, 300, 64, bitsPerBand = 4, bands = 8)
        val lsh = VectorOps.cosineNearDupPairsLshBanded(emb, 300, 0.4, 64, bitsPerBand = 4, bands = 8)
        val allPairs = 300L * 299L / 2L
        exact.agg(count(lit(1)).as("n_exact"))
          .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
          .crossJoin(lsh.agg(count(lit(1)).as("n_lsh")))
          .select(col("n_exact"), col("n_candidates"), col("n_lsh"),
            round(col("n_candidates").cast("double") / allPairs, 6).as("candidate_frac"),
            round(col("n_lsh").cast("double") / col("n_exact"), 6).as("recall"))
      },
      {
        val bandCols = (0 until 8)
          .map(j => s"${VectorOps.lshBandSql(64, 4, 8, j)} AS b$j").mkString(",\n         |        ")
        val candUnion = (0 until 8)
          .map(j => s"SELECT a.vec_id AS d1, b.vec_id AS d2 FROM n a JOIN n b ON a.b$j = b.b$j AND a.vec_id < b.vec_id")
          .mkString("\n         |  UNION\n         |  ")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 300),
           |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
           |        $bandCols
           |      FROM e),
           |cand AS (
           |  $candUnion
           |),
           |lsh AS (
           |  SELECT c.d1, c.d2
           |  FROM cand c JOIN n x ON x.vec_id = c.d1 JOIN n y ON y.vec_id = c.d2
           |  WHERE ROUND(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) >= 0.4),
           |exact AS (
           |  SELECT a.vec_id AS d1, b.vec_id AS d2
           |  FROM n a JOIN n b ON a.vec_id < b.vec_id
           |  WHERE ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.4)
           |SELECT (SELECT COUNT(*) FROM exact) AS n_exact,
           |  (SELECT COUNT(*) FROM cand) AS n_candidates,
           |  (SELECT COUNT(*) FROM lsh) AS n_lsh,
           |  ROUND(CAST((SELECT COUNT(*) FROM cand) AS DOUBLE) / ${300L * 299L / 2L}, 6) AS candidate_frac,
           |  ROUND(CAST((SELECT COUNT(*) FROM lsh) AS DOUBLE) /
           |        (SELECT COUNT(*) FROM exact), 6) AS recall""".stripMargin
      }),

    // SemDeDup semantic dedup, PRIMARY (r9): centroid cells bound the
    // quadratic, within-cell cosine ≥ 0.4 drops the higher id.
    // Per-cell census output. UNCAPPED since r9 with the production
    // dial LIVE: nCentroids = max(4, floor(√N / 2)) computed from the
    // corpus count on BOTH engines (IEEE sqrt is correctly rounded, so
    // floor agrees everywhere — unlike float log), which keeps
    // per-cell membership ~2√N and the within-cell pair volume
    // O(N^1.5) — SemDeDup's own scaling answer (50k cells for LAION).
    // The oracle replays the dial, the assignment (argmax cosine over
    // the seed centroids, c_id tie-break — same margins as the
    // hash-green ann_topk_ivf) and the greedy min-id drop rule.
    "dedup_semantic" -> QueryDef.sql(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val k = math.max(4L,
          math.floor(math.sqrt(emb.count().toDouble) / 2).toLong).toInt
        // cell-LOCAL census (sf100 lesson: the declarative pair join
        // expanded O(N*cellsize) vector-carrying rows and exhausted
        // the single-box disk at 2M vectors; one cell shuffle + local
        // loops compute the identical integers/doubles)
        VectorOps.semDeDupCellLocal(emb, nCentroids = k, threshold = 0.4)
      },
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |kk AS (SELECT GREATEST(4, CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)) / 2) AS BIGINT)) AS k
        |       FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
        |      WHERE sqrt(list_dot_product(v, v)) > 0),
        |c AS (SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM n, kk WHERE vec_id < kk.k),
        |aff AS (SELECT n.vec_id, n.v, n.nrm, c.c_id,
        |          ROW_NUMBER() OVER (PARTITION BY n.vec_id
        |            ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC, c.c_id) AS crnk
        |        FROM n CROSS JOIN c),
        |assigned AS (SELECT vec_id, v, nrm, c_id AS cell FROM aff WHERE crnk = 1),
        |dropped AS (
        |  SELECT DISTINCT a.cell, b.vec_id AS d2
        |  FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.4),
        |sizes AS (SELECT cell, COUNT(*) AS n_vecs FROM assigned GROUP BY cell),
        |drops AS (SELECT cell, COUNT(*) AS n_dropped FROM dropped GROUP BY cell)
        |SELECT s.cell AS c_id, s.n_vecs,
        |  CAST(COALESCE(d.n_dropped, 0) AS BIGINT) AS n_dropped,
        |  CAST(s.n_vecs - COALESCE(d.n_dropped, 0) AS BIGINT) AS n_kept
        |FROM sizes s LEFT JOIN drops d ON s.cell = d.cell
        |ORDER BY c_id""".stripMargin),

    // Full d×d covariance of the embedding corpus — the PCA / whitening
    // / anisotropy input, exactly (the top-eigenvector step is driver
    // math on the 64×64 result; what needs the cluster is THIS moment
    // matrix). Distributed shape: elements quantize to milli-unit
    // integers in the scan stage (the q_stats_agg integer-leg lesson:
    // exact long sums have no accumulation order to drift), each row
    // emits its d(d+1)/2 upper-triangle products ROW-LOCALLY (nested
    // generators — never a self-join of the element relation), and the
    // hash aggregate map-combines to 2080 (i, j) keys per partition, so
    // the shuffle is O(partitions · d²) regardless of corpus size. The
    // final covariance is one double expression over exact integer
    // sums, identical on both engines.
    "embed_covariance" -> QueryDef.sql(
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
          .select(col("vec_id"),
            expr("transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))").as("q"))
        e.select(posexplode(col("q")).as(Seq("i0", "xi")), col("q"))
          .select(col("i0"), col("xi"),
            posexplode(expr("slice(q, i0 + 1, size(q) - i0)")).as(Seq("joff", "xj")))
          .select((col("i0") + 1).as("i"), (col("i0") + col("joff") + 1).as("j"),
            col("xi"), col("xj"))
          .groupBy("i", "j")
          .agg(count(lit(1)).as("n_vecs"), sum("xi").as("sx"), sum("xj").as("sy"),
            sum(col("xi") * col("xj")).as("sxy"))
          // cov in micro-units as an EXACT integer: (n*sxy - sx*sy) div n^2
          // (elements pre-scaled by 1e3, so products carry 1e6 — the div by
          // n^2 leaves micro-units directly). DECIMAL(38,0) legs because at
          // 100 TB n*sxy ~ 1e30; `div` truncates toward zero on BOTH engines
          // (verified against DuckDB `//`). Never ROUND-on-double: at sf0.01
          // three tiny negative cells rounded to -0.0 in DuckDB vs +0.0 in
          // Spark and failed the driver's representation hash (r8 verdict).
          .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"), col("n_vecs"),
            expr("""CAST((CAST(n_vecs AS DECIMAL(38,0)) * CAST(sxy AS DECIMAL(38,0))
                        - CAST(sx AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0)))
                    div (CAST(n_vecs AS DECIMAL(38,0)) * CAST(n_vecs AS DECIMAL(38,0)))
                    AS BIGINT)""").as("cov_micro"))
          .orderBy("i", "j")
      },
      """WITH e AS (SELECT vec_id,
        |             list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS q
        |           FROM embeddings),
        |p AS (SELECT ii.i, jj.j, q[ii.i] AS xi, q[jj.j] AS xj
        |      FROM e
        |      CROSS JOIN (SELECT unnest(range(1, 65)) AS i) ii
        |      CROSS JOIN (SELECT unnest(range(1, 65)) AS j) jj
        |      WHERE jj.j >= ii.i),
        |a AS (SELECT i, j, COUNT(*) AS n_vecs,
        |        CAST(SUM(xi) AS BIGINT) AS sx, CAST(SUM(xj) AS BIGINT) AS sy,
        |        CAST(SUM(xi * xj) AS BIGINT) AS sxy
        |      FROM p GROUP BY 1, 2)
        |SELECT i, j, n_vecs,
        |  CAST((CAST(n_vecs AS HUGEINT) * CAST(sxy AS HUGEINT)
        |      - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT))
        |    // (CAST(n_vecs AS HUGEINT) * CAST(n_vecs AS HUGEINT)) AS BIGINT) AS cov_micro
        |FROM a ORDER BY i, j""".stripMargin),

    // B49: product-quantization ANN — codebook training (integer
    // Lloyd's per subspace), code assignment, and ADC lookup-join
    // scoring, all exact integer (see VectorOps.annTopKPq). The oracle
    // unrolls the same two training rounds; per-round CTEs
    // MATERIALIZED (the embed_pca DuckDB-inlining lesson).
    "ann_topk_pq" -> QueryDef.sql(
      (s, dir) => VectorOps.annTopKPq(Tables.embeddings(s, dir),
        col("vec_id") < 10, k = 5, m = 8, codes = 16, iters = 2),
      pqOracleSql(k = 5, m = 8, codes = 16, iters = 2, nQueries = 10)),

    // B55: IVF-PQ — the production composition (coarse cells route
    // vectors, PQ codes the residuals, queries probe nProbe cells via
    // a per-cell residual lookup table; the IVF pruning lives IN the
    // (cell, m, code) join key). Exact integer end to end: the coarse
    // quantizer is integer PQ with one full-width subspace, so the
    // oracle unrolls BOTH quantizers with the same round template.
    "ann_topk_ivfpq" -> QueryDef.sql(
      (s, dir) => VectorOps.annTopKIvfPq(Tables.embeddings(s, dir),
        col("vec_id") < 10, k = 5, kc = 8, coarseIters = 2, m = 8,
        codes = 16, pqIters = 2, nProbe = 2),
      ivfPqOracleSql(k = 5, kc = 8, coarseIters = 2, m = 8, codes = 16,
        pqIters = 2, nProbe = 2, nQueries = 10)),

    // r13 build/probe split for the vector tier (the dedup_incremental
    // convention): ann_index_build trains both quantizers, persists
    // (cent, codebook, coded corpus) via IndexStore keyed by
    // embeddings content, and hash-checks a census of the coded
    // corpus against the oracle's from-scratch retrain. In production
    // this runs once per embedding snapshot.
    "ann_index_build" -> QueryDef.sql(
      (s, dir) => graft.operators.IndexStore.buildIvfPqIndex(s, dir),
      ivfPqBuildStatsSql(kc = 8, coarseIters = 2, m = 8, codes = 16,
        pqIters = 2)),

    // …and the probe against the PERSISTED index: identical output
    // (and oracle) to ann_topk_ivfpq, but the training/assignment
    // stages are gone from the plan — the per-query serving cost at
    // 100 TB is the coarse-distance rank + the broadcast-LUT ADC join
    // over the probed cells only. Builds transparently on first touch.
    "ann_topk_ivfpq_indexed" -> QueryDef.sql(
      (s, dir) => {
        val (cent, codebook, codesDf) =
          graft.operators.IndexStore.ivfPqIndex(s, dir)
        VectorOps.ivfPqProbe(Tables.embeddings(s, dir), cent, codebook,
          codesDf, col("vec_id") < 10, k = 5, m = 8, nProbe = 2)
      },
      ivfPqOracleSql(k = 5, kc = 8, coarseIters = 2, m = 8, codes = 16,
        pqIters = 2, nProbe = 2, nQueries = 10)),

    // B47: dominant principal component (the PCA anisotropy/whitening
    // direction) — exact-integer power iteration, reproducible
    // bit-for-bit in any engine with floor division and 128-bit sums
    // (see VectorOps.pcaTopComponent for the scale shape: distributed
    // covariance + projection scans, bounded 64×64 driver eigen). The
    // oracle unrolls the SAME 24 integer matvec rounds as CTEs (the
    // kmeansIvfOracleSql precedent).
    "embed_pca" -> QueryDef.sql(
      (s, dir) => VectorOps.pcaTopComponent(Tables.embeddings(s, dir), 24, 20),
      pcaOracleSql(24, 20)),

    // B68: cluster-quality report (Davies–Bouldin shape, squared-
    // distance variant) over the label clustering — the evaluate-the-
    // clusters step after any kmeans/SemDeDup pass, done entirely in
    // EXACT integers so the hash can't drift: milli-quantized dims,
    // round-half-away integer centroids (the pqTrain mean rule),
    // floor-mean within-cluster scatter s2, exact pairwise centroid
    // distances, and the per-cluster worst ratio reported as the
    // scaled integer ((s2_a + s2_b) * 1e9) div d2_ab (long-safe: unit-
    // bounded embeddings keep s2, d2 under ~2.6e8). Scale: one
    // (label, dim) map-combined pass for centroids (≤ |labels|·d
    // rows), one broadcast-join scan for scatter, and a |labels|²
    // pair table — the corpus never moves twice.
    "embed_cluster_quality" -> QueryDef.sql(
      (s, dir) => {
        val dims = Tables.embeddings(s, dir)
          .select(col("label").cast("long").as("label"),
            posexplode(expr(
              "transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))"))
              .as(Seq("i", "x")))
        val cent = dims.groupBy("label", "i")
          .agg(sum("x").as("sx"), count(lit(1)).as("n"))
          .select(col("label"), col("i"),
            expr("CAST(sign(sx) AS BIGINT) * ((2 * abs(sx) + n) div (2 * n))").as("c"))
        val sc2 = dims.join(broadcast(cent), Seq("label", "i"))
          .groupBy("label")
          .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("sd2"),
            (count(lit(1)) / 64L).cast("long").as("n_vecs"))
          .select(col("label"), col("n_vecs"),
            expr("sd2 div n_vecs").as("s2"))
        val pa = sc2.select(col("label").as("la"), col("s2").as("s2a"))
        val pb = sc2.select(col("label").as("lb"), col("s2").as("s2b"))
        val ca = cent.select(col("label").as("la"), col("i"), col("c").as("cca"))
        val cb = cent.select(col("label").as("lb"), col("i"), col("c").as("ccb"))
        val d2 = ca.join(cb, Seq("i")).filter(col("la") =!= col("lb"))
          .groupBy("la", "lb")
          .agg(sum((col("cca") - col("ccb")) * (col("cca") - col("ccb"))).as("d2ab"))
        // d2ab = 0 (two labels with identical integer centroids) would
        // throw under ANSI division — drop such degenerate pairs (a
        // coincident-centroid pair has no meaningful separation ratio)
        val ratios = d2.filter(col("d2ab") > 0L).join(pa, "la").join(pb, "lb")
          .select(col("la"), col("lb"),
            expr("((s2a + s2b) * 1000000000) div d2ab").as("r_scaled"))
        val worst = ratios.groupBy(col("la").as("label"))
          .agg(max(struct(col("r_scaled").as("rs"), negate(col("lb")).as("nl"))).as("w"))
          .select(col("label"), col("w.rs").as("db_scaled"),
            negate(col("w.nl")).cast("long").as("worst_other"))
        sc2.join(worst, "label")
          .select("label", "n_vecs", "s2", "worst_other", "db_scaled")
          .orderBy("label")
      },
      """WITH dims AS (
        |  SELECT CAST(label AS BIGINT) AS label, s.i, s.x
        |  FROM (SELECT label,
        |          generate_subscripts(embedding, 1) - 1 AS i,
        |          CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000, 0) AS BIGINT) AS x
        |        FROM embeddings) s(label, i, x)),
        |cent AS (
        |  SELECT label, i,
        |    CAST(sign(SUM(x)) AS BIGINT)
        |      * ((2 * abs(SUM(x)) + COUNT(*)) // (2 * COUNT(*))) AS c
        |  FROM dims GROUP BY 1, 2),
        |sc AS (
        |  SELECT label, COUNT(*) // 64 AS n_vecs,
        |    CAST(SUM((x - c) * (x - c)) AS BIGINT) // (COUNT(*) // 64) AS s2
        |  FROM dims JOIN cent USING (label, i) GROUP BY label),
        |d2 AS (
        |  SELECT a.label AS la, b.label AS lb,
        |    CAST(SUM((a.c - b.c) * (a.c - b.c)) AS BIGINT) AS d2ab
        |  FROM cent a JOIN cent b ON a.i = b.i AND a.label <> b.label
        |  GROUP BY 1, 2),
        |ratios AS (
        |  SELECT la, lb, ((pa.s2 + pb.s2) * 1000000000) // d2ab AS r_scaled
        |  FROM d2 JOIN sc pa ON d2.la = pa.label JOIN sc pb ON d2.lb = pb.label
        |  WHERE d2ab > 0),
        |worst AS (
        |  SELECT la AS label, MAX(r_scaled) AS db_scaled FROM ratios GROUP BY 1),
        |pick AS (
        |  SELECT r.la AS label, MIN(r.lb) AS worst_other, r.r_scaled AS db_scaled
        |  FROM ratios r JOIN worst w ON r.la = w.label AND r.r_scaled = w.db_scaled
        |  GROUP BY 1, 3)
        |SELECT sc.label, CAST(sc.n_vecs AS BIGINT) AS n_vecs,
        |       CAST(sc.s2 AS BIGINT) AS s2,
        |       CAST(pick.worst_other AS BIGINT) AS worst_other,
        |       CAST(pick.db_scaled AS BIGINT) AS db_scaled
        |FROM sc JOIN pick USING (label) ORDER BY label""".stripMargin),

    // B72: batch-perceptron training — the quality-classifier-training
    // step done the embed_pca way: EXACT INTEGERS end to end so the
    // oracle replays training bit-for-bit. Features = milli-quantized
    // embedding + a 1000-unit bias; labels y = ±1 (label 0 vs rest);
    // each round w += Σ_misclassified y·x (the batch perceptron — the
    // per-sample update is sequential, the batch form is one
    // map-combined per-dim sum). Weights live on the driver (d+1
    // longs — the kmeans-centroid bounded-collect contract) and
    // re-enter each round's scan as an inlined literal array; margins
    // stay in long range through sf100 (|w| ≤ rounds·N·1000 ≈ 4e10,
    // margin ≤ 65·|w|·1000 ≈ 2.6e15). Output: per-round misclassified
    // count + exact accuracy ppm, plus a final-weight checksum row
    // (Σ w_i·(i+1)) so the hash pins the whole trajectory. The oracle
    // unrolls the rounds as MATERIALIZED CTEs.
    "embed_perceptron" -> QueryDef.sql(
      (s, dir) => {
        val rounds = 10
        // planted-hyperplane labels (y = sign(x0 + x1 − x2), over the
        // QUANTIZED features so both engines agree at the boundary):
        // separable by construction, so the learner must actually
        // converge — the planted-recovery demo discipline (ANN
        // recall, winnowing pair recovery) applied to training
        val data = Tables.embeddings(s, dir)
          .select(col("vec_id"),
            expr("concat(transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)), array(1000L))")
              .as("x"))
          .withColumn("y",
            when(expr("x[0] + x[1] - x[2]") >= 0L, 1L).otherwise(-1L))
          .localCheckpoint()
        val d = 65
        var w = Array.fill(d)(0L)
        val hist = scala.collection.mutable.Buffer[(Long, Long, Long)]()
        val total = data.count()
        (1 to rounds).foreach { r =>
          val mis = data
            .withColumn("margin", VectorOps.dotl(col("x"), typedLit(w.toSeq)))
            .filter(col("y") * col("margin") <= 0L)
          val deltas = mis
            .select(col("y"), posexplode(col("x")).as(Seq("i", "xi")))
            .groupBy("i").agg(sum(col("y") * col("xi")).as("dw"))
            .collect().map(row => row.getInt(0) -> row.getLong(1)).toMap
          val nMis = mis.count()
          hist += ((r.toLong, nMis, (total - nMis) * 1000000L / total))
          // MEAN update (sign·(abs div n) — the cross-engine floor
          // idiom): the raw batch sum overshoots by a factor of
          // |misclassified| and oscillates without converging; the
          // averaged step is the standard stable batch form and keeps
          // |w| data-scale-free. (A 1/t decay was tried and floored
          // the per-dim means to zero — recorded so it isn't retried.)
          if (nMis > 0) (0 until d).foreach { i =>
            val sum = deltas.getOrElse(i, 0L)
            w(i) += math.signum(sum) * (math.abs(sum) / nMis)
          }
        }
        val checksum = w.zipWithIndex.map { case (v, i) => v * (i + 1) }.sum
        // POCKET row (Gallant 1990): plain batch perceptron enters a
        // 2-cycle on this boundary (measured: odd rounds bounce back
        // to 258 mis); the pocket keeps the best model seen, which is
        // the classic remedy and the model a pipeline would ship
        val (bestRound, bestMis, bestAcc) = hist.minBy(t => (t._2, t._1))
        import s.implicits._
        hist.toSeq.toDF("round", "n_misclassified", "acc_ppm")
          .unionByName(Seq((98L, bestMis, bestAcc), (99L, checksum, 0L))
            .toDF("round", "n_misclassified", "acc_ppm"))
          .orderBy("round")
          .withColumn("best_round",
            when(col("round") === 98L, lit(bestRound)).otherwise(lit(null).cast("long")))
      }, {
        val rounds = 10
        val steps = (1 to rounds).map { r =>
          s"""m$r AS MATERIALIZED (
             |  SELECT d.vec_id, d.y, d.x
             |  FROM data d, w${r - 1}
             |  WHERE d.y * CAST(list_dot_product(d.x, w${r - 1}.wl) AS BIGINT) <= 0),
             |h$r AS MATERIALIZED (
             |  SELECT $r AS round, COUNT(*) AS n_mis,
             |    ((SELECT COUNT(*) FROM data) - COUNT(*)) * 1000000
             |      // (SELECT COUNT(*) FROM data) AS acc_ppm
             |  FROM m$r),
             |d$r AS (SELECT i,
             |          CAST(sign(SUM(y * xi)) AS BIGINT)
             |            * (abs(CAST(SUM(y * xi) AS BIGINT)) // COUNT(*)) AS dw
             |        FROM (SELECT y, generate_subscripts(x, 1) AS i,
             |                     unnest(x) AS xi
             |              FROM m$r) u
             |        GROUP BY i),
             |w$r AS MATERIALIZED (
             |  SELECT list(wv ORDER BY i) AS wl
             |  FROM (SELECT g.i,
             |          CAST(w${r - 1}.wl[g.i] + COALESCE(d$r.dw, 0) AS BIGINT) AS wv
             |        FROM w${r - 1}, generate_series(1, 65) g(i)
             |        LEFT JOIN d$r ON d$r.i = g.i))""".stripMargin
        }.mkString(",\n")
        val union = (1 to rounds).map(r => s"SELECT round, n_mis, acc_ppm FROM h$r")
          .mkString(" UNION ALL ")
        s"""WITH data AS MATERIALIZED (
           |  SELECT vec_id,
           |    CASE WHEN q[1] + q[2] - q[3] >= 0 THEN 1 ELSE -1 END AS y,
           |    list_append(q, CAST(1000 AS BIGINT)) AS x
           |  FROM (SELECT vec_id,
           |          list_transform(embedding, e -> CAST(ROUND(CAST(e AS DOUBLE) * 1000, 0) AS BIGINT)) AS q
           |        FROM embeddings) t),
           |w0 AS MATERIALIZED (
           |  SELECT list_transform(range(65), i -> CAST(0 AS BIGINT)) AS wl),
           |$steps,
           |hall AS ($union),
           |pocket AS (
           |  SELECT 98 AS round, n_mis, acc_ppm, round AS best_round
           |  FROM hall ORDER BY n_mis, round LIMIT 1),
           |chk AS (
           |  SELECT 99 AS round,
           |    CAST((SELECT SUM(wl[g.i] * g.i)
           |          FROM w$rounds, generate_series(1, 65) g(i)) AS BIGINT) AS n_mis,
           |    CAST(0 AS BIGINT) AS acc_ppm)
           |SELECT CAST(round AS BIGINT) AS round,
           |       CAST(n_mis AS BIGINT) AS n_misclassified,
           |       CAST(acc_ppm AS BIGINT) AS acc_ppm,
           |       CAST(best_round AS BIGINT) AS best_round
           |FROM (SELECT round, n_mis, acc_ppm, NULL AS best_round FROM hall
           |      UNION ALL SELECT round, n_mis, acc_ppm, best_round FROM pocket
           |      UNION ALL SELECT round, n_mis, acc_ppm, NULL FROM chk)
           |ORDER BY round""".stripMargin
      }),

    // B71: MMR result diversification (Carbonell & Goldstein 1998) —
    // the greedy re-ranking every retrieval pipeline runs between ANN
    // and the user: pick the candidate maximizing
    // λ·rel − (1−λ)·max_sim-to-already-picked; at λ = 1/2 the argmax
    // order equals rel − max_sim, which stays an EXACT integer over
    // milli-quantized dot products (components ≤ ~1000, 64 dims →
    // dots ≤ 6.4e7, exactly representable everywhere). 10 greedy
    // rounds; each round is a distributed max over the candidate set
    // joined to the ≤10-row broadcast picked set, with a bounded
    // 1-ROW collect of the winner (the BPE argmax contract — the
    // driver must know the pick to plan the next round). Ties break
    // on vec_id. The oracle unrolls the same 10 rounds as CTEs.
    "embed_mmr_diversify" -> QueryDef.sql(
      (s, dir) => {
        val k = 10
        val q = Tables.embeddings(s, dir)
          .select(col("vec_id"),
            expr("transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))").as("v"))
          .localCheckpoint()
        val qv = broadcast(q.filter(col("vec_id") === 0L)
          .select(col("v").as("qv")))
        // r13: the corpus-scale work (relevance scan + top-50) stays
        // distributed; the greedy MMR loop then runs driver-locally
        // over the COLLECTED 50-row candidate set (bounded driver
        // state by construction) instead of 10 driver-synchronized
        // jobs of filter/crossJoin/argmax over those same 50 rows.
        // Math.*Exact mirrors the ANSI column dot products.
        val cand: Array[(Long, Array[Long], Long)] =
          q.filter(col("vec_id") =!= 0L).crossJoin(qv)
            .withColumn("rel", VectorOps.dotl(col("v"), col("qv")))
            .select("vec_id", "v", "rel")
            .orderBy(col("rel").desc, col("vec_id")).limit(50)
            .collect()
            .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
        def dotL(a: Array[Long], b: Array[Long]): Long = {
          var acc = 0L; var i = 0
          while (i < a.length) {
            acc = Math.addExact(acc, Math.multiplyExact(a(i), b(i))); i += 1
          }
          acc
        }
        val picks = scala.collection.mutable.Buffer[(Long, Long, Long, Long, Long)]()
        var selected = List.empty[Long]
        (1 to k).foreach { r =>
          val rest = cand.filter(c => !selected.contains(c._1))
          val (id, rel, ms) =
            if (selected.isEmpty) {
              val best = rest.maxBy(c => (c._3, -c._1))
              (best._1, best._3, 0L)
            } else {
              val selVecs = cand.filter(c => selected.contains(c._1)).map(_._2)
              val scored = rest.map { c =>
                val msim = selVecs.map(sv => dotL(c._2, sv)).max
                (c._1, c._3, msim)
              }
              scored.maxBy { case (cid, crel, cms) => (crel - cms, -cid) }
            }
          picks += ((r.toLong, id, rel, ms, rel - ms))
          selected = selected :+ id
        }
        import s.implicits._
        picks.toSeq.toDF("pick_rank", "vec_id", "rel", "max_sim_at_pick", "mmr_score")
          .orderBy("pick_rank")
      }, {
        val k = 10
        val steps = (2 to k).map { r =>
          s"""sc$r AS MATERIALIZED (
             |  SELECT c.vec_id, c.rel,
             |    MAX(CAST(list_dot_product(c.v, s.v) AS BIGINT)) AS ms
             |  FROM cand c JOIN (SELECT cand.v, cand.vec_id FROM cand
             |                    JOIN sel${r - 1} USING (vec_id)) s ON TRUE
             |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${r - 1})
             |  GROUP BY 1, 2),
             |p$r AS MATERIALIZED (
             |  SELECT $r AS pick_rank, vec_id, rel, ms
             |  FROM sc$r ORDER BY rel - ms DESC, vec_id LIMIT 1),
             |sel$r AS MATERIALIZED (
             |  SELECT vec_id FROM sel${r - 1} UNION ALL SELECT vec_id FROM p$r)""".stripMargin
        }.mkString(",\n")
        val union = (2 to k).map(r =>
          s"SELECT pick_rank, vec_id, rel, ms FROM p$r").mkString(" UNION ALL ")
        s"""WITH vq AS (
           |  SELECT vec_id,
           |    list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS v
           |  FROM embeddings),
           |cand AS MATERIALIZED (
           |  SELECT c.vec_id, c.v,
           |    CAST(list_dot_product(c.v, q.v) AS BIGINT) AS rel
           |  FROM vq c, (SELECT v FROM vq WHERE vec_id = 0) q
           |  WHERE c.vec_id <> 0
           |  ORDER BY rel DESC, c.vec_id LIMIT 50),
           |p1 AS MATERIALIZED (
           |  SELECT 1 AS pick_rank, vec_id, rel, CAST(0 AS BIGINT) AS ms
           |  FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
           |sel1 AS MATERIALIZED (SELECT vec_id FROM p1),
           |$steps
           |SELECT CAST(pick_rank AS BIGINT) AS pick_rank, vec_id, rel,
           |       ms AS max_sim_at_pick, rel - ms AS mmr_score
           |FROM (SELECT * FROM p1 UNION ALL $union)
           |ORDER BY pick_rank""".stripMargin
      }),

    // B75: Johnson–Lindenstrauss random projection — the dimensionality
    // reduction in front of any large-scale ANN tier, fully
    // deterministic and EXACT: milli-quantized 64-dim vectors project
    // to 16 dims through a ±1 sign matrix derived from bit 16 of the
    // multiplicative hash (i + j·64)·2654435761 (the flat index in the multiplicand — an additive j·97 never reached bit 16, leaving every output dim the same sign row and the projection rank-1) (identical BIGINT
    // arithmetic on both engines — never a runtime RNG), and the
    // distortion audit reports d2_proj·1e6 div (16·d2_orig) per
    // consecutive-id pair (E[d2_proj] = 16·d2_orig for ±1 entries).
    // Projection is row-local (one scan); the pair join shuffles on
    // vec_id only.
    "embed_jl_projection" -> QueryDef.sql(
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
          .select(col("vec_id"),
            expr("transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))").as("q"))
          // r13: native codegen'd forms of the same exact-integer math
          // (the interpreted 16×64 lambda loop dominated this scan)
          .withColumn("y", VectorOps.jlProject(col("q")))
        val a = e.select(col("vec_id").as("vec_a"), col("q").as("qa"), col("y").as("ya"))
          .filter(col("vec_a") % 2 === 0)
        val b = e.select(col("vec_id").as("vec_b"), col("q").as("qb"), col("y").as("yb"))
        a.join(b, col("vec_b") === col("vec_a") + 1)
          .select(col("vec_a"), col("vec_b"),
            VectorOps.l2sq(col("qa"), col("qb")).as("d2_orig"),
            VectorOps.l2sq(col("ya"), col("yb")).as("d2_proj"))
          .filter(col("d2_orig") > 0)
          .withColumn("ratio_ppm",
            expr("CAST(d2_proj AS DECIMAL(38,0)) * 1000000 div (CAST(16 AS DECIMAL(38,0)) * d2_orig)"))
          .orderBy("vec_a")
      },
      """WITH e AS (
        |  SELECT vec_id,
        |         list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS q
        |  FROM embeddings),
        |flat AS (
        |  SELECT vec_id, CAST(s.i AS BIGINT) - 1 AS i, q[CAST(s.i AS INT)] AS x
        |  FROM (SELECT vec_id, q, unnest(range(1, len(q) + 1)) AS i FROM e) s(vec_id, q, i)),
        |proj AS MATERIALIZED (
        |  SELECT vec_id, j,
        |    SUM((1 - 2 * (bit_count((((i + j * 64) * 2654435761) % 2147483648) * 2246822519) % 2)) * x) AS y
        |  FROM flat CROSS JOIN (SELECT unnest(range(0, 16)) AS j) js
        |  GROUP BY 1, 2),
        |d2p AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |         CAST(SUM((a.y - b.y) * (a.y - b.y)) AS BIGINT) AS d2_proj
        |  FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1 AND a.j = b.j
        |  WHERE a.vec_id % 2 = 0 GROUP BY 1, 2),
        |d2o AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |         CAST(SUM((a.x - b.x) * (a.x - b.x)) AS BIGINT) AS d2_orig
        |  FROM flat a JOIN flat b ON b.vec_id = a.vec_id + 1 AND a.i = b.i
        |  WHERE a.vec_id % 2 = 0 GROUP BY 1, 2)
        |SELECT vec_a, vec_b, d2_orig, d2_proj,
        |  CAST(CAST(d2_proj AS HUGEINT) * 1000000
        |    // (16 * CAST(d2_orig AS HUGEINT)) AS BIGINT) AS ratio_ppm
        |FROM d2p JOIN d2o USING (vec_a, vec_b)
        |WHERE d2_orig > 0 ORDER BY vec_a""".stripMargin),

    // B77: k-center seeding by farthest-first traversal (Gonzalez
    // 1985, the 2-approximation that is also kmeans++'s deterministic
    // cousin): start from the smallest vec_id, then 7 rounds of
    // "distributed argmax of min-squared-distance-to-picked" — each
    // round is ONE corpus scan against the <=8-row broadcast picked
    // set with a 1-row collect (the MMR/BPE bounded-collect contract).
    // All distances are exact integers over milli-quantized dims; the
    // reported min_d2 at each pick is the covering radius sequence.
    // Oracle unrolls the same rounds with d2 = n2a + n2b − 2·dot.
    "embed_kcenter" -> QueryDef.sql(
      (s, dir) => {
        val k = 8
        val q = Tables.embeddings(s, dir)
          .select(col("vec_id"),
            expr("transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))").as("v"))
          .localCheckpoint()
        val first = q.agg(min("vec_id")).head().getLong(0)
        val picks = scala.collection.mutable.Buffer[(Long, Long, Long)]((1L, first, 0L))
        var selected = List(first)
        (2 to k).foreach { r =>
          val selVecs = broadcast(q.filter(col("vec_id").isin(selected: _*))
            .select(col("v").as("sv")))
          val row = q.filter(!col("vec_id").isin(selected: _*))
            .crossJoin(selVecs)
            .withColumn("d2", VectorOps.l2sq(col("v"), col("sv")))
            .groupBy("vec_id").agg(min("d2").as("min_d2"))
            .orderBy(col("min_d2").desc, col("vec_id")).limit(1)
            .collect().head
          picks += ((r.toLong, row.getLong(0), row.getLong(1)))
          selected = selected :+ row.getLong(0)
        }
        import s.implicits._
        picks.toSeq.toDF("pick_rank", "vec_id", "min_d2_at_pick")
          .orderBy("pick_rank")
      }, {
        val k = 8
        val steps = (2 to k).map { r =>
          s"""sc$r AS MATERIALIZED (
             |  SELECT c.vec_id,
             |    MIN(c.n2 + s.n2 - 2 * CAST(list_dot_product(c.v, s.v) AS BIGINT))
             |      AS min_d2
             |  FROM e c JOIN (SELECT e.v, e.n2 FROM e JOIN sel${r - 1} USING (vec_id)) s
             |    ON TRUE
             |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${r - 1})
             |  GROUP BY 1),
             |p$r AS MATERIALIZED (
             |  SELECT CAST($r AS BIGINT) AS pick_rank, vec_id, min_d2
             |  FROM sc$r ORDER BY min_d2 DESC, vec_id LIMIT 1),
             |sel$r AS MATERIALIZED (
             |  SELECT vec_id FROM sel${r - 1} UNION ALL SELECT vec_id FROM p$r)"""
            .stripMargin
        }.mkString(",\n")
        val union = (2 to k).map(r =>
          s"SELECT pick_rank, vec_id, min_d2 FROM p$r").mkString(" UNION ALL ")
        s"""WITH e AS MATERIALIZED (
           |  SELECT vec_id,
           |    list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS v,
           |    CAST(list_dot_product(
           |      list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)),
           |      list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)))
           |      AS BIGINT) AS n2
           |  FROM embeddings),
           |sel1 AS MATERIALIZED (SELECT vec_id FROM e ORDER BY vec_id LIMIT 1),
           |p1 AS (SELECT CAST(1 AS BIGINT) AS pick_rank, vec_id,
           |              CAST(0 AS BIGINT) AS min_d2 FROM sel1),
           |$steps
           |SELECT pick_rank, vec_id, min_d2 AS min_d2_at_pick
           |FROM (SELECT * FROM p1 UNION ALL $union)
           |ORDER BY pick_rank""".stripMargin
      }),

    // B78: JL-projection candidate-recall audit — the way a JL tier is
    // actually used: over-fetch candidates in the projected space,
    // rescore exactly. Queries vec_id < 10 rank all other vectors
    // twice (projected d2 vs original d2, exact integers, (d2, vec_id)
    // tie-breaks); candidate recall = |proj_top50 ∩ true_top5| / 50 —
    // i.e. how much of the true top-5 a 10× over-fetch keeps. (Plain
    // recall@5 is near chance here BY THE DATA's nature: the synthetic
    // embeddings have weak neighbor structure, and 16-dim JL noise
    // (~sqrt(2/16)≈35%) swamps it — the spec pins the candidate form
    // well above chance instead.) Queries broadcast against one scan.
    "ann_recall_jl" -> QueryDef.sql(
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
          .select(col("vec_id"),
            expr("transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))").as("q"))
          .withColumn("y", VectorOps.jlProject(col("q")))
          .localCheckpoint()
        val queries = broadcast(e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("q").as("qq"), col("y").as("qy")))
        val scored = e.filter(col("vec_id") >= 10).crossJoin(queries)
          .select(col("q_id"), col("vec_id"),
            VectorOps.l2sq(col("q"), col("qq")).as("d2_orig"),
            VectorOps.l2sq(col("y"), col("qy")).as("d2_proj"))
        val wo = Window.partitionBy("q_id").orderBy(col("d2_orig"), col("vec_id"))
        val wp = Window.partitionBy("q_id").orderBy(col("d2_proj"), col("vec_id"))
        val ranked = scored
          .withColumn("ro", row_number().over(wo))
          .withColumn("rp", row_number().over(wp))
        val hits = ranked.filter(col("ro") <= 5 && col("rp") <= 50)
          .agg(count(lit(1)).as("n_hits"))
        hits.select(col("n_hits"), lit(50L).as("n_truth"),
          round(col("n_hits").cast("double") / 50, 6).as("candidate_recall"))
      },
      """WITH e AS MATERIALIZED (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS q
        |  FROM embeddings),
        |flat AS (
        |  SELECT vec_id, CAST(s.i AS BIGINT) - 1 AS i, q[CAST(s.i AS INT)] AS x
        |  FROM (SELECT vec_id, q, unnest(range(1, len(q) + 1)) AS i FROM e) s(vec_id, q, i)),
        |proj AS MATERIALIZED (
        |  SELECT vec_id, j,
        |    SUM((1 - 2 * (bit_count((((i + j * 64) * 2654435761) % 2147483648) * 2246822519) % 2)) * x) AS y
        |  FROM flat CROSS JOIN (SELECT unnest(range(0, 16)) AS j) js
        |  GROUP BY 1, 2),
        |n2 AS (SELECT vec_id, CAST(list_dot_product(q, q) AS BIGINT) AS nn FROM e),
        |dorig AS (
        |  SELECT qe.vec_id AS q_id, ce.vec_id,
        |    qn.nn + cn.nn - 2 * CAST(list_dot_product(qe.q, ce.q) AS BIGINT) AS d2_orig
        |  FROM e qe JOIN n2 qn ON qe.vec_id = qn.vec_id,
        |       e ce JOIN n2 cn ON ce.vec_id = cn.vec_id
        |  WHERE qe.vec_id < 10 AND ce.vec_id >= 10),
        |dproj AS (
        |  SELECT qp.vec_id AS q_id, cp.vec_id,
        |    SUM((qp.y - cp.y) * (qp.y - cp.y)) AS d2_proj
        |  FROM proj qp JOIN proj cp ON qp.j = cp.j
        |  WHERE qp.vec_id < 10 AND cp.vec_id >= 10
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT d.q_id, d.vec_id,
        |    row_number() OVER (PARTITION BY d.q_id ORDER BY d2_orig, d.vec_id) AS ro,
        |    row_number() OVER (PARTITION BY d.q_id ORDER BY d2_proj, d.vec_id) AS rp
        |  FROM dorig d JOIN dproj p ON d.q_id = p.q_id AND d.vec_id = p.vec_id)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_hits,
        |       CAST(50 AS BIGINT) AS n_truth,
        |       ROUND(CAST(COUNT(*) AS DOUBLE) / 50, 6) AS candidate_recall
        |FROM ranked WHERE ro <= 5 AND rp <= 50""".stripMargin),

    // Contrastive-training hard-example mining: per anchor, the hardest
    // positive (lowest cosine among same-label vectors — the pair the
    // model most needs to pull together) and the hardest negative
    // (highest cosine among other-label vectors — the pair it most
    // needs to push apart), plus the triplet violation margin. The
    // extremes come from one grouped pass over the candidate pairs; the
    // arg-ids from a second conditional-min pass keyed on score
    // equality (deterministic tie-break = min cand id on both engines).
    // PRIMARY since r9: UNCAPPED over the full corpus, candidates
    // cell-local (VectorOps.integerCells with the √N dial — hard
    // examples are mined within ANN neighborhoods, the production
    // shape); the mining passes are unchanged and the oracle replays
    // the assignment argmin and the cell-restricted pair join.
    "embed_triplet_mining" -> QueryDef.sql(
      (s, dir) => VectorOps.tripletCellLocal(Tables.embeddings(s, dir)),
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
        |           FROM embeddings),
        |qq AS (SELECT vec_id,
        |         list_transform(embedding,
        |           x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS q
        |       FROM embeddings),
        |kk AS (SELECT ${VectorOps.sqrtCellsSql} AS k FROM embeddings),
        |seeds AS (SELECT vec_id AS sid, q AS sq FROM qq, kk WHERE vec_id < kk.k),
        |asg AS MATERIALIZED (
        |  SELECT vec_id, cell FROM (
        |    SELECT a.vec_id, s.sid AS cell,
        |      ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
        |        CAST(list_sum(list_transform(range(1, 65),
        |          i -> (a.q[CAST(i AS INT)] - s.sq[CAST(i AS INT)])
        |             * (a.q[CAST(i AS INT)] - s.sq[CAST(i AS INT)]))) AS BIGINT),
        |        s.sid) AS rn
        |    FROM qq a CROSS JOIN seeds s) t
        |  WHERE rn = 1),
        |n AS (SELECT e.vec_id, e.v, e.label, sqrt(list_dot_product(v, v)) AS nrm,
        |        asg.cell
        |      FROM e JOIN asg ON e.vec_id = asg.vec_id
        |      WHERE sqrt(list_dot_product(v, v)) > 0),
        |p AS (SELECT a.vec_id AS anchor, b.vec_id AS cand,
        |        a.label = b.label AS same,
        |        ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS score
        |      FROM n a JOIN n b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
        |ext AS (SELECT anchor,
        |          MIN(CASE WHEN same THEN score END) AS pos_score,
        |          MAX(CASE WHEN NOT same THEN score END) AS neg_score
        |        FROM p GROUP BY 1
        |        HAVING pos_score IS NOT NULL AND neg_score IS NOT NULL)
        |SELECT p.anchor,
        |  MIN(CASE WHEN p.same AND p.score = x.pos_score THEN p.cand END)
        |    AS hard_pos,
        |  MIN(CASE WHEN NOT p.same AND p.score = x.neg_score THEN p.cand END)
        |    AS hard_neg,
        |  x.pos_score, x.neg_score,
        |  x.neg_score - x.pos_score AS violation
        |FROM p JOIN ext x ON p.anchor = x.anchor
        |GROUP BY p.anchor, x.pos_score, x.neg_score
        |ORDER BY violation DESC, p.anchor""".stripMargin),

    // B92: ε-NN graph degree census — the connectivity statistic an
    // HNSW/NN-descent index build watches: per vector, how many
    // cell-mates clear the similarity threshold (round6 cosine ≥ 0.15
    // on this corpus — its pairwise p90 sits at ~0.156), rolled into a
    // (degree → n_vecs) histogram. A near-empty graph means the
    // threshold prunes to brute force; a near-complete one means the
    // index can't discriminate. Scale: the same fused cell shape as
    // embed_triplet_mining — one projection, broadcast-seed argmin,
    // ONE cell shuffle, bounded-cell local loop scoring each unordered
    // pair once with rounding deferred to the ±1e-6 decision band. The
    // oracle replays the dial, the argmin and the thresholded count.
    "embed_ann_graph_degree" -> QueryDef.sql(
      (s, dir) => VectorOps.annGraphDegreeCellLocal(Tables.embeddings(s, dir), 0.15),
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |qq AS (SELECT vec_id,
        |         list_transform(embedding,
        |           x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS q
        |       FROM embeddings),
        |kk AS (SELECT ${VectorOps.sqrtCellsSql} AS k FROM embeddings),
        |seeds AS (SELECT vec_id AS sid, q AS sq FROM qq, kk WHERE vec_id < kk.k),
        |asg AS MATERIALIZED (
        |  SELECT vec_id, cell FROM (
        |    SELECT a.vec_id, s.sid AS cell,
        |      ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
        |        CAST(list_sum(list_transform(range(1, 65),
        |          i -> (a.q[CAST(i AS INT)] - s.sq[CAST(i AS INT)])
        |             * (a.q[CAST(i AS INT)] - s.sq[CAST(i AS INT)]))) AS BIGINT),
        |        s.sid) AS rn
        |    FROM qq a CROSS JOIN seeds s) t
        |  WHERE rn = 1),
        |n AS (SELECT e.vec_id, e.v, sqrt(list_dot_product(v, v)) AS nrm, asg.cell
        |      FROM e JOIN asg ON e.vec_id = asg.vec_id
        |      WHERE sqrt(list_dot_product(v, v)) > 0),
        |deg AS (SELECT a.vec_id,
        |          COUNT(*) FILTER (
        |            ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.15)
        |            AS degree
        |        FROM n a LEFT JOIN n b ON a.cell = b.cell AND a.vec_id <> b.vec_id
        |        GROUP BY 1)
        |SELECT degree, COUNT(*) AS n_vecs FROM deg GROUP BY 1 ORDER BY 1""".stripMargin),

    // Local Outlier Factor — density-based outlier scoring (the
    // data-cleaning primitive centroid distance misses: a point can be
    // far from its centroid yet sit in a dense local cluster). k=5
    // kNN over EXACT milli-quantized integer distances (the PQ idiom),
    // reach-dists and their sums stay integers, and the
    // 1/lrd harmonic sum is floored per term at 1e18 scale — so LOF
    // lands as a deterministic integer ppm on both engines with no
    // order-dependent double summation anywhere. lof_ppm ≈ 1e6 for
    // inliers, ≫1e6 for density outliers.
    //
    // PRIMARY since r9: UNCAPPED over the full corpus with the kNN
    // candidates cell-local — VectorOps.integerCells assigns every
    // vector to its nearest of max(4, floor(√N/2)) integer-seed cells
    // (one broadcast + one map-combined argmin; the √N dial keeps
    // cells ~2√N so the within-cell pair volume is O(N^1.5)), and the
    // 5-NN is exact WITHIN the cell — the standard IVF-style
    // approximate-kNN LOF. The oracle replays the dial, the argmin
    // assignment, and the cell-restricted pair join.
    "embed_lof" -> QueryDef.sql(
      (s, dir) => VectorOps.lofCellLocal(Tables.embeddings(s, dir)),
      s"""WITH q AS MATERIALIZED (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      e -> CAST(ROUND(CAST(e AS DOUBLE) * 1000, 0) AS BIGINT)) AS q
        |  FROM embeddings),
        |kk AS (SELECT ${VectorOps.sqrtCellsSql} AS k FROM embeddings),
        |seeds AS (SELECT vec_id AS sid, q AS sq FROM q, kk WHERE vec_id < kk.k),
        |asg AS MATERIALIZED (
        |  SELECT vec_id, q, cell FROM (
        |    SELECT a.vec_id, a.q, s.sid AS cell,
        |      ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
        |        CAST(list_sum(list_transform(range(1, 65),
        |          i -> (a.q[CAST(i AS INT)] - s.sq[CAST(i AS INT)])
        |             * (a.q[CAST(i AS INT)] - s.sq[CAST(i AS INT)]))) AS BIGINT),
        |        s.sid) AS rn
        |    FROM q a CROSS JOIN seeds s) t
        |  WHERE rn = 1),
        |p AS MATERIALIZED (
        |  SELECT a.vec_id AS aid, b.vec_id AS bid,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      i -> (a.q[CAST(i AS INT)] - b.q[CAST(i AS INT)])
        |         * (a.q[CAST(i AS INT)] - b.q[CAST(i AS INT)]))) AS BIGINT) AS d2
        |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
        |knn AS MATERIALIZED (
        |  SELECT aid, bid, d2 FROM (
        |    SELECT aid, bid, d2,
        |      ROW_NUMBER() OVER (PARTITION BY aid ORDER BY d2, bid) AS rn
        |    FROM p) t
        |  WHERE rn <= 5),
        |kd AS (SELECT aid AS kv, MAX(d2) AS kdist FROM knn GROUP BY 1),
        |ri AS (
        |  SELECT knn.aid,
        |    GREATEST(CAST(SUM(GREATEST(knn.d2, kd.kdist)) AS BIGINT), 1) AS ri
        |  FROM knn JOIN kd ON knn.bid = kd.kv GROUP BY 1),
        |s AS (
        |  SELECT knn.aid,
        |    CAST(SUM(1000000000000000000 // rb.ri) AS HUGEINT) AS s_inv
        |  FROM knn JOIN ri rb ON knn.bid = rb.aid GROUP BY 1)
        |SELECT r.aid AS vec_id, kd.kdist, r.ri AS reach_sum,
        |  CAST(CAST(r.ri AS HUGEINT) * s.s_inv // 5000000000000 AS BIGINT)
        |    AS lof_ppm
        |FROM ri r JOIN s ON r.aid = s.aid JOIN kd ON r.aid = kd.kv
        |ORDER BY lof_ppm DESC, vec_id""".stripMargin),

    // B-row (r9): cell-majority label-propagation eval — the
    // weak-supervision diagnostic behind every label-spreading
    // pipeline: predict each vector's label as the MAJORITY label
    // among its cell mates (excluding itself; ties to the smallest
    // label id), then emit the confusion matrix against truth.
    // Candidates are cell-local (VectorOps.integerCells, the √N dial
    // shared with embed_lof/embed_triplet_mining — at 100 TB the
    // neighborhood comes from the ANN cell, not all-pairs);
    // singleton-cell vectors are unscorable and drop
    // deterministically. The oracle replays the dial, the integer
    // argmin assignment, the vote counts, and the ROW_NUMBER argmax.
    "embed_knn_label_eval" -> QueryDef.sql(
      (s, dir) => VectorOps.knnLabelEvalCellLocal(Tables.embeddings(s, dir)),
      s"""WITH q AS MATERIALIZED (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      e -> CAST(ROUND(CAST(e AS DOUBLE) * 1000, 0) AS BIGINT)) AS q
        |  FROM embeddings),
        |kk AS (SELECT ${VectorOps.sqrtCellsSql} AS k FROM embeddings),
        |seeds AS (SELECT vec_id AS sid, q AS sq FROM q, kk WHERE vec_id < kk.k),
        |asg AS MATERIALIZED (
        |  SELECT vec_id, cell FROM (
        |    SELECT a.vec_id, s.sid AS cell,
        |      ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
        |        CAST(list_sum(list_transform(range(1, 65),
        |          i -> (a.q[CAST(i AS INT)] - s.sq[CAST(i AS INT)])
        |             * (a.q[CAST(i AS INT)] - s.sq[CAST(i AS INT)]))) AS BIGINT),
        |        s.sid) AS rn
        |    FROM q a CROSS JOIN seeds s) t
        |  WHERE rn = 1),
        |al AS (SELECT asg.vec_id, asg.cell, e.label
        |       FROM asg JOIN embeddings e ON asg.vec_id = e.vec_id),
        |votes AS (SELECT a.vec_id AS aid, a.label AS la, b.label AS lb, COUNT(*) AS n
        |          FROM al a JOIN al b ON a.cell = b.cell AND a.vec_id <> b.vec_id
        |          GROUP BY 1, 2, 3),
        |pred AS (SELECT aid, la, lb FROM (
        |  SELECT aid, la, lb,
        |    ROW_NUMBER() OVER (PARTITION BY aid ORDER BY n DESC, lb) AS rn
        |  FROM votes) t WHERE rn = 1)
        |SELECT CAST(la AS BIGINT) AS label, CAST(lb AS BIGINT) AS predicted,
        |  COUNT(*) AS n_vecs
        |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // B45: embedding centroid drift — has the representation of each
    // class moved between two corpus snapshots (here the even/odd
    // vec_id halves)? Per-label squared centroid distance kept EXACT
    // as a rational: Σ_pos (s_a·n_b − s_b·n_a)² div (n_a·n_b)², with
    // the milli-quantized integer element sums (the PQ idiom) in
    // DECIMAL(38,0). One posexplode + one (label, pos) map-combined
    // shuffle — the monitoring primitive behind embedding-model
    // regression alerts.
    "embed_centroid_drift" -> QueryDef.sql(
      (s, dir) => {
        val q = Tables.embeddings(s, dir)
          .select(col("label").cast("long").as("label"),
            (col("vec_id") % 2).as("half"),
            posexplode(expr(
              "transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))"))
              .as(Seq("pos", "v")))
        val cells = q.groupBy("label", "pos")
          .agg(
            sum(when(col("half") === 0, 1L).otherwise(0L)).as("n_a"),
            sum(when(col("half") === 1, 1L).otherwise(0L)).as("n_b"),
            sum(when(col("half") === 0, expr("CAST(v AS DECIMAL(38,0))"))
              .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("s_a"),
            sum(when(col("half") === 1, expr("CAST(v AS DECIMAL(38,0))"))
              .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("s_b"))
        cells
          .withColumn("term",
            expr("(s_a * n_b - s_b * n_a) * (s_a * n_b - s_b * n_a)"))
          .groupBy("label")
          .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
            sum("term").as("num"))
          .select(col("label"), col("n_a"), col("n_b"),
            expr("num div (CAST(n_a AS DECIMAL(38,0)) * n_b" +
              " * CAST(n_a AS DECIMAL(38,0)) * n_b)").as("drift_sq_milli"))
          .orderBy("label")
      },
      """WITH q AS (
        |  SELECT CAST(label AS BIGINT) AS label, vec_id % 2 AS half,
        |    CAST(t.i AS BIGINT) - 1 AS pos,
        |    CAST(ROUND(CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) * 1000, 0)
        |      AS BIGINT) AS v
        |  FROM embeddings CROSS JOIN generate_series(1, 64) t(i)),
        |cells AS (
        |  SELECT label, pos,
        |    CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    SUM(CASE WHEN half = 0 THEN CAST(v AS HUGEINT) ELSE 0 END) AS s_a,
        |    SUM(CASE WHEN half = 1 THEN CAST(v AS HUGEINT) ELSE 0 END) AS s_b
        |  FROM q GROUP BY 1, 2),
        |d AS (
        |  SELECT label, MAX(n_a) AS n_a, MAX(n_b) AS n_b,
        |    SUM((s_a * n_b - s_b * n_a) * (s_a * n_b - s_b * n_a)) AS num
        |  FROM cells GROUP BY 1)
        |SELECT label, n_a, n_b,
        |  CAST(num // (CAST(n_a AS HUGEINT) * n_b * n_a * n_b) AS BIGINT)
        |    AS drift_sq_milli
        |FROM d ORDER BY label""".stripMargin)
  )

  /** DuckDB SQL for [[VectorOps.annTopKPq]]: identical milli-quantized
    * subvectors, `iters` integer Lloyd rounds (argmin by (dist, code)
    * row_number, round-half-away integer centroid means, empty cells
    * keep the previous centroid), ADC lookup-table scoring. The
    * squared distances are exact integer lambda sums on both engines.
    */
  private def pqOracleSql(k: Int, m: Int, codes: Int, iters: Int, nQueries: Int): String = {
    val sub = 64 / m
    def dist(a: String, b: String): String =
      s"CAST(list_sum(list_transform(range(1, ${sub + 1}), i -> " +
        s"($a[CAST(i AS INT)] - $b[CAST(i AS INT)]) * ($a[CAST(i AS INT)] - $b[CAST(i AS INT)]))) AS BIGINT)"
    val rounds = (1 to iters).map { r =>
      s"""a$r AS MATERIALIZED (
         |  SELECT vec_id, m, code, sv FROM (
         |    SELECT vec_id, m, sv, code,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, code) AS rn
         |    FROM (SELECT s.vec_id, s.m, s.sv, c.code, ${dist("s.sv", "c.cv")} AS d
         |          FROM sv s JOIN c${r - 1} c ON s.m = c.m) dd) t
         |  WHERE rn = 1),
         |u$r AS (SELECT m, code, CAST(t.i AS INT) AS i,
         |          CAST(SUM(sv[CAST(t.i AS INT)]) AS BIGINT) AS sx, COUNT(*) AS n
         |        FROM a$r CROSS JOIN generate_series(1, $sub) t(i) GROUP BY 1, 2, 3),
         |n$r AS (SELECT m, code,
         |          list(CAST(sign(sx) AS BIGINT) * ((2 * ABS(sx) + n) // (2 * n)) ORDER BY i) AS cv
         |        FROM u$r GROUP BY m, code),
         |c$r AS MATERIALIZED (SELECT p.m, p.code, COALESCE(nn.cv, p.cv) AS cv
         |        FROM c${r - 1} p LEFT JOIN n$r nn ON p.m = nn.m AND p.code = nn.code)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS MATERIALIZED (SELECT vec_id,
       |      list_transform(embedding, e -> CAST(ROUND(CAST(e AS DOUBLE) * 1000, 0) AS BIGINT)) AS q
       |      FROM embeddings),
       |sv AS MATERIALIZED (SELECT vec_id, CAST(t.mi AS BIGINT) AS m,
       |      q.q[CAST(t.mi AS INT) * $sub + 1 : CAST(t.mi AS INT) * $sub + $sub] AS sv
       |      FROM q CROSS JOIN generate_series(0, ${m - 1}) t(mi)),
       |c0 AS (SELECT m, vec_id AS code, sv AS cv FROM sv WHERE vec_id < $codes),
       |$rounds,
       |af AS MATERIALIZED (
       |  SELECT vec_id, m, code FROM (
       |    SELECT s.vec_id, s.m, c.code,
       |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m ORDER BY ${dist("s.sv", "c.cv")}, c.code) AS rn
       |    FROM sv s JOIN c$iters c ON s.m = c.m) t
       |  WHERE rn = 1),
       |qs AS (SELECT vec_id AS q_id, m, sv AS qsv FROM sv WHERE vec_id < $nQueries),
       |qd AS MATERIALIZED (SELECT q.q_id, q.m, c.code, ${dist("q.qsv", "c.cv")} AS qd
       |      FROM qs q JOIN c$iters c ON q.m = c.m),
       |adc AS (SELECT d.q_id, a.vec_id, CAST(SUM(d.qd) AS BIGINT) AS dist
       |        FROM af a JOIN qd d ON a.m = d.m AND a.code = d.code
       |        WHERE a.vec_id <> d.q_id GROUP BY 1, 2),
       |r AS (SELECT q_id, vec_id AS neighbor_id, dist,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist, vec_id) AS BIGINT) AS rnk
       |      FROM adc)
       |SELECT q_id, neighbor_id, dist, rnk FROM r WHERE rnk <= $k
       |ORDER BY q_id, rnk""".stripMargin
  }

  /** Exact integer squared distance between two BIGINT lists of length
    * `sub` (1-indexed), shared by the IVF-PQ oracle's CTE templates. */
  private def distSql(a: String, b: String, sub: Int): String =
    s"CAST(list_sum(list_transform(range(1, ${sub + 1}), i -> " +
      s"($a[CAST(i AS INT)] - $b[CAST(i AS INT)]) * ($a[CAST(i AS INT)] - $b[CAST(i AS INT)]))) AS BIGINT)"

  /** `iters` unrolled integer Lloyd rounds over subvector CTE `svCte`
    * with codebook CTEs `${pfx}c0..${pfx}c$iters` — the pqOracleSql
    * round template parameterized for reuse by both IVF-PQ quantizers
    * (every per-round CTE MATERIALIZED: the embed_pca inlining
    * lesson). */
  private def lloydSql(pfx: String, svCte: String, iters: Int, sub: Int): String =
    (1 to iters).map { r =>
      s"""${pfx}a$r AS (
         |  SELECT vec_id, m, code, sv FROM (
         |    SELECT s.vec_id, s.m, s.sv, c.code,
         |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m ORDER BY ${distSql("s.sv", "c.cv", sub)}, c.code) AS rn
         |    FROM $svCte s JOIN ${pfx}c${r - 1} c ON s.m = c.m) t
         |  WHERE rn = 1),
         |${pfx}u$r AS (SELECT m, code, CAST(t.i AS INT) AS i,
         |          CAST(SUM(sv[CAST(t.i AS INT)]) AS BIGINT) AS sx, COUNT(*) AS n
         |        FROM ${pfx}a$r CROSS JOIN generate_series(1, $sub) t(i) GROUP BY 1, 2, 3),
         |${pfx}n$r AS (SELECT m, code,
         |          list(CAST(sign(sx) AS BIGINT) * ((2 * ABS(sx) + n) // (2 * n)) ORDER BY i) AS cv
         |        FROM ${pfx}u$r GROUP BY m, code),
         |${pfx}c$r AS MATERIALIZED (SELECT p.m, p.code, COALESCE(nn.cv, p.cv) AS cv
         |        FROM ${pfx}c${r - 1} p LEFT JOIN ${pfx}n$r nn ON p.m = nn.m AND p.code = nn.code)""".stripMargin
    }.mkString(",\n")

  /** Final argmin assignment of `svCte` against codebook `cbCte`. */
  private def assignSql(name: String, svCte: String, cbCte: String, sub: Int): String =
    s"""$name AS MATERIALIZED (
       |  SELECT vec_id, m, code FROM (
       |    SELECT s.vec_id, s.m, c.code,
       |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m ORDER BY ${distSql("s.sv", "c.cv", sub)}, c.code) AS rn
       |    FROM $svCte s JOIN $cbCte c ON s.m = c.m) t
       |  WHERE rn = 1)""".stripMargin

  /** DuckDB SQL for [[VectorOps.annTopKIvfPq]]: milli quantization,
    * coarse quantizer = one full-width-subspace integer PQ (unrolled
    * Lloyd rounds), residuals against the final coarse centroids,
    * residual PQ (same template), nProbe coarse-ranked cells per
    * query, per-cell residual lookup table, ADC keyed on
    * (cell, m, code). */
  /** The BUILD portion of the IVF-PQ oracle chain — everything through
    * the coded corpus `rfc` (plus `cent` and the final residual
    * codebook `rc<pqIters>`). Factored (r13) so the probe oracle and
    * the index-build census oracle certify the SAME relations the
    * persisted index stores. */
  private def ivfPqBuildCtes(kc: Int, coarseIters: Int, m: Int,
      codes: Int, pqIters: Int): String = {
    val sub = 64 / m
    s"""q AS MATERIALIZED (SELECT vec_id,
       |      list_transform(embedding, e -> CAST(ROUND(CAST(e AS DOUBLE) * 1000, 0) AS BIGINT)) AS q
       |      FROM embeddings),
       |svc AS MATERIALIZED (SELECT vec_id, CAST(0 AS BIGINT) AS m, q AS sv FROM q),
       |cc0 AS (SELECT m, vec_id AS code, sv AS cv FROM svc WHERE vec_id < $kc),
       |${lloydSql("c", "svc", coarseIters, 64)},
       |${assignSql("cf", "svc", s"cc$coarseIters", 64)},
       |cent AS (SELECT code AS cell, cv FROM cc$coarseIters),
       |rs AS MATERIALIZED (
       |  SELECT q.vec_id, cf.code AS cell,
       |    list_transform(range(1, 65),
       |      i -> q.q[CAST(i AS INT)] - c.cv[CAST(i AS INT)]) AS q
       |  FROM q JOIN cf ON q.vec_id = cf.vec_id JOIN cent c ON cf.code = c.cell),
       |svr AS MATERIALIZED (SELECT vec_id, CAST(t.mi AS BIGINT) AS m,
       |      q[CAST(t.mi AS INT) * $sub + 1 : CAST(t.mi AS INT) * $sub + $sub] AS sv
       |      FROM rs CROSS JOIN generate_series(0, ${m - 1}) t(mi)),
       |rc0 AS (SELECT m, vec_id AS code, sv AS cv FROM svr WHERE vec_id < $codes),
       |${lloydSql("r", "svr", pqIters, sub)},
       |${assignSql("rf", "svr", s"rc$pqIters", sub)},
       |rfc AS (SELECT rf.vec_id, rs.cell, rf.m, rf.code
       |        FROM rf JOIN (SELECT DISTINCT vec_id, cell FROM rs) rs ON rf.vec_id = rs.vec_id)"""
      .stripMargin
  }

  /** Census of the coded corpus — the dedup_index_build convention for
    * the vector tier: counts plus a content checksum over the bounded
    * (cell, m, code) assignment fields. */
  private def ivfPqBuildStatsSql(kc: Int, coarseIters: Int, m: Int,
      codes: Int, pqIters: Int): String =
    s"""WITH ${ivfPqBuildCtes(kc, coarseIters, m, codes, pqIters)}
       |SELECT (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) FROM rfc) AS n_vecs,
       |  (SELECT CAST(COUNT(DISTINCT cell) AS BIGINT) FROM rfc) AS n_cells,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM rfc) AS n_code_rows,
       |  (SELECT CAST(SUM(cell * 251 + m * 31 + code) AS BIGINT) FROM rfc) AS code_checksum"""
      .stripMargin

  private def ivfPqOracleSql(k: Int, kc: Int, coarseIters: Int, m: Int,
      codes: Int, pqIters: Int, nProbe: Int, nQueries: Int): String = {
    val sub = 64 / m
    s"""WITH ${ivfPqBuildCtes(kc, coarseIters, m, codes, pqIters)},
       |qs AS (SELECT vec_id AS q_id, q FROM q WHERE vec_id < $nQueries),
       |qcd AS (SELECT q_id, cell, ${distSql("qs.q", "c.cv", 64)} AS cd
       |        FROM qs CROSS JOIN cent c),
       |pn AS MATERIALIZED (SELECT q_id, cell FROM (
       |        SELECT q_id, cell, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cd, cell) AS rn
       |        FROM qcd) t WHERE rn <= $nProbe),
       |qr AS (SELECT pn.q_id, pn.cell,
       |         list_transform(range(1, 65),
       |           i -> qs.q[CAST(i AS INT)] - c.cv[CAST(i AS INT)]) AS q
       |       FROM pn JOIN qs ON pn.q_id = qs.q_id JOIN cent c ON pn.cell = c.cell),
       |qsv AS (SELECT q_id, cell, CAST(t.mi AS BIGINT) AS m,
       |          q[CAST(t.mi AS INT) * $sub + 1 : CAST(t.mi AS INT) * $sub + $sub] AS sv
       |        FROM qr CROSS JOIN generate_series(0, ${m - 1}) t(mi)),
       |lut AS MATERIALIZED (SELECT v.q_id, v.cell, v.m, c.code, ${distSql("v.sv", "c.cv", sub)} AS qd
       |      FROM qsv v JOIN rc$pqIters c ON v.m = c.m),
       |adc AS (SELECT l.q_id, a.vec_id, CAST(SUM(l.qd) AS BIGINT) AS dist
       |        FROM rfc a JOIN lut l
       |          ON a.cell = l.cell AND a.m = l.m AND a.code = l.code
       |        WHERE a.vec_id <> l.q_id GROUP BY 1, 2),
       |res AS (SELECT q_id, vec_id AS neighbor_id, dist,
       |          CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist, vec_id) AS BIGINT) AS rnk
       |        FROM adc)
       |SELECT q_id, neighbor_id, dist, rnk FROM res WHERE rnk <= $k
       |ORDER BY q_id, rnk""".stripMargin
  }

  /** DuckDB SQL for [[VectorOps.pcaTopComponent]]: identical integer
    * means, centered second-moment matrix, `iters` power-iteration
    * rounds (HUGEINT matvec, max-abs renormalization via the sign/abs
    * floor idiom), sign canonicalization, Rayleigh quotient, top-`topK`
    * |projection|. */
  private def pcaOracleSql(iters: Int, topK: Int): String = {
    val rounds = (1 to iters).map { k =>
      val prev = if (k == 1) "v0" else s"v${k - 1}"
      // every per-round CTE is MATERIALIZED: u$k is referenced twice
      // (max + renormalize) and contains v${k - 1} — left to DuckDB's
      // default inlining the reference tree doubles per round (2^24
      // plan nodes; observed as a planner hang)
      s"""u$k AS MATERIALIZED (SELECT c.i, SUM(CAST(c.v AS HUGEINT) * p.x) AS ui
         |      FROM covfull c JOIN $prev p ON c.j = p.i GROUP BY c.i),
         |m$k AS (SELECT MAX(ABS(ui)) AS m FROM u$k),
         |v$k AS MATERIALIZED (SELECT i, CAST(CAST(sign(ui) AS HUGEINT) * ((ABS(ui) * 1000000) // m) AS BIGINT) AS x
         |      FROM u$k, m$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS MATERIALIZED (SELECT vec_id,
       |        list_transform(embedding, e -> CAST(ROUND(CAST(e AS DOUBLE) * 1000, 0) AS BIGINT)) AS q
       |      FROM embeddings),
       |mu0 AS (SELECT t.i, CAST(SUM(q.q[t.i]) AS BIGINT) AS sx, COUNT(*) AS n
       |      FROM q CROSS JOIN generate_series(1, 64) t(i) GROUP BY t.i),
       |mu AS (SELECT i, CAST(sign(sx) AS BIGINT) * ((2 * ABS(sx) + n) // (2 * n)) AS m FROM mu0),
       |qc AS MATERIALIZED (SELECT q.vec_id, t.i, q.q[t.i] - mu.m AS x
       |      FROM q CROSS JOIN generate_series(1, 64) t(i) JOIN mu ON mu.i = t.i),
       |cov AS MATERIALIZED (SELECT a.i, b.i AS j, CAST(SUM(a.x * b.x) AS BIGINT) AS v
       |      FROM qc a JOIN qc b ON a.vec_id = b.vec_id AND b.i >= a.i GROUP BY 1, 2),
       |covfull AS MATERIALIZED (SELECT i, j, v FROM cov
       |            UNION ALL SELECT j, i, v FROM cov WHERE i <> j),
       |v0 AS (SELECT unnest(generate_series(1, 64)) AS i, CAST(1000000 AS BIGINT) AS x),
       |$rounds,
       |pk AS (SELECT i FROM v$iters ORDER BY ABS(x) DESC, i LIMIT 1),
       |sgn AS (SELECT CASE WHEN (SELECT x FROM v$iters WHERE i = (SELECT i FROM pk)) < 0
       |               THEN -1 ELSE 1 END AS sg),
       |vf AS MATERIALIZED (SELECT i, x * sg AS x FROM v$iters, sgn),
       |ray AS (SELECT CAST(
       |        (SELECT SUM(CAST(c.v AS HUGEINT) * a.x * b.x)
       |         FROM covfull c JOIN vf a ON c.i = a.i JOIN vf b ON c.j = b.i)
       |        // (SELECT SUM(CAST(x AS HUGEINT) * x) FROM vf) AS BIGINT) AS l),
       |pr AS (SELECT qc.vec_id, CAST(SUM(qc.x * vf.x) AS BIGINT) AS p
       |      FROM qc JOIN vf ON vf.i = qc.i GROUP BY qc.vec_id),
       |top AS (SELECT vec_id, p FROM pr ORDER BY ABS(p) DESC, vec_id LIMIT $topK)
       |SELECT 'lambda' AS kind, CAST(0 AS BIGINT) AS idx, l AS value FROM ray
       |UNION ALL SELECT 'load' AS kind, CAST(i AS BIGINT) AS idx, x AS value FROM vf
       |UNION ALL SELECT 'proj' AS kind, CAST(vec_id AS BIGINT) AS idx, p AS value FROM top
       |ORDER BY kind, idx""".stripMargin
  }

  /** DuckDB SQL for [[VectorOps.annTopKIvf]] with `iters` Lloyd's
    * rounds: centroid refinement unrolled into per-round CTEs. */
  private def kmeansIvfOracleSql(
      nCentroids: Int, iters: Int, nProbe: Int, k: Int, nQueries: Int): String = {
    def affinity(name: String, cents: String): String =
      s"""$name AS (SELECT n.vec_id, c.c_id,
         |  ROW_NUMBER() OVER (PARTITION BY n.vec_id
         |    ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC, c.c_id) AS crnk
         |FROM n CROSS JOIN $cents c)""".stripMargin
    val rounds = (1 to iters).map { i =>
      val prev = if (i == 1) "c0" else s"c${i - 1}n"
      s"""${affinity(s"aff$i", prev)},
         |asg$i AS (SELECT vec_id, c_id AS cell FROM aff$i WHERE crnk = 1),
         |m$i AS (SELECT a.cell AS c_id, t.i, avg(n.v[t.i]) AS mval
         |        FROM asg$i a JOIN n ON n.vec_id = a.vec_id
         |        CROSS JOIN generate_series(1, 64) t(i)
         |        GROUP BY a.cell, t.i),
         |c$i AS (SELECT c_id, list(mval ORDER BY i) AS cv FROM m$i GROUP BY c_id),
         |c${i}n AS (SELECT c_id, cv, sqrt(list_dot_product(cv, cv)) AS cnrm FROM c$i)""".stripMargin
    }.mkString(",\n")
    val finalCents = if (iters == 0) "c0" else s"c${iters}n"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       |c0 AS (SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM n WHERE vec_id < $nCentroids),
       |$rounds,
       |aff AS (SELECT n.vec_id, n.v, n.nrm, c.c_id,
       |          ROW_NUMBER() OVER (PARTITION BY n.vec_id
       |            ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC, c.c_id) AS crnk
       |        FROM n CROSS JOIN $finalCents c),
       |assigned AS (SELECT vec_id, v, nrm, c_id AS cell FROM aff WHERE crnk = 1),
       |probes AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm, c_id AS cell
       |           FROM aff WHERE crnk <= $nProbe AND vec_id < $nQueries),
       |sc AS (SELECT q_id, a.vec_id AS neighbor_id,
       |         ROUND(list_dot_product(a.v, qv) / (a.nrm * qnrm), 6) AS score
       |       FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.q_id),
       |r AS (SELECT q_id, neighbor_id, score,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
       |      FROM sc)
       |SELECT q_id, neighbor_id, score, rnk FROM r WHERE rnk <= $k
       |ORDER BY q_id, rnk""".stripMargin
  }
}
