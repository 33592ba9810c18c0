package graft.queries

import graft.Tables
import graft.operators.VectorOps
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

    // B5: embedding-cosine near-duplicate pairs
    "neardup_cosine" -> QueryDef.sql(
      (s, dir) => VectorOps.cosineNearDupPairs(Tables.embeddings(s, dir), 300, 0.4),
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 300),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
        |SELECT a.vec_id AS d1, b.vec_id AS d2,
        |  ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS score
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.4
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
    // recall vs brute in VectorOpsSpec
    "ann_topk_ivf_kmeans" -> QueryDef.rowsOnly(
      (s, dir) => VectorOps.annTopKIvf(Tables.embeddings(s, dir), col("vec_id") < 10, 5,
        nCentroids = 16, nProbe = 4, kmeansIters = 2))
  )
}
