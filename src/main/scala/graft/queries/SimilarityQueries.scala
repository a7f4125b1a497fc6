package graft.queries

import graft.{QueryDef, Tables}
import graft.ext.Similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity-search queries over the `embeddings` table
  * (array<float>, dim 64). Exact cosine kernels use the decimal-sum trick
  * so Spark and DuckDB agree bit-for-bit.
  */
object SimilarityQueries {

  /** Oracle fragment: exact decimal dot of two list columns over index i. */
  private def dotSql(a: String, b: String) =
    s"CAST(SUM(CAST(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) AS DECIMAL(30,18))) AS DOUBLE)"

  def defs: Seq[QueryDef] = Seq(

    // ── Brute-force exact top-k cosine neighbors for a small query set:
    //    the correctness baseline. Queries broadcast; candidates stream.
    QueryDef(
      "q40_cosine_topk",
      (s, dir) => {
        import s.implicits._
        val e = Tables.embeddings(s, dir)
          .select($"vec_id".as("id"), $"embedding")
        Similarity.bruteForceTopK(e.where($"id" < 5), e, k = 10)
      },
      Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
        |terms AS (
        |  SELECT qid, cid, qe, ce, unnest(generate_series(1, len(qe))) AS i
        |  FROM q CROSS JOIN c WHERE qid <> cid),
        |dots AS (
        |  SELECT qid, cid,
        |    ${dotSql("qe", "ce")} AS dot,
        |    ${dotSql("qe", "qe")} AS qn2,
        |    ${dotSql("ce", "ce")} AS cn2
        |  FROM terms GROUP BY 1, 2),
        |scored AS (
        |  SELECT qid AS query_id, cid AS cand_id,
        |    ROUND(CASE WHEN qn2 > 0 AND cn2 > 0 THEN dot / (sqrt(qn2) * sqrt(cn2))
        |         ELSE 0.0 END, 9) AS cosine_sim
        |  FROM dots)
        |SELECT query_id, cand_id, cosine_sim, CAST(rank AS INT) AS rank FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY cosine_sim DESC, cand_id ASC) AS rank
        |  FROM scored)
        |WHERE rank <= 10""".stripMargin)),

    // ── Embedding near-dup pairs, blocked by label (pairwise only inside
    //    blocks; the global path would LSH-bucket first, as in q42).
    QueryDef(
      "q41_embedding_near_dup",
      (s, dir) => {
        import s.implicits._
        graft.functions.GraftFunctions.register(s)
        import graft.functions.GraftFunctions.cosineSimExact
        // written in the NAIVE exact form on purpose: the CosinePrefilter
        // optimizer rule injects the fast-double margin prefilter under
        // this threshold automatically (PlanShapeSpec asserts it), so the
        // exact decimal kernel only runs near the decision boundary — the
        // hand-written two-phase version this replaces lives on in q40/q45
        // as the precomputed-norm pattern
        val e = Tables.embeddings(s, dir)
          .select($"vec_id", $"label", $"embedding")
        val a = e.select($"vec_id".as("vec_a"), $"label", $"embedding".as("ea"))
        val b = e.select($"vec_id".as("vec_b"), $"label", $"embedding".as("eb"))
        a.join(b, Seq("label"))
          .where($"vec_a" < $"vec_b")
          .select($"vec_a", $"vec_b", $"label",
            cosineSimExact($"ea", $"eb").as("cosine_sim"))
          .where($"cosine_sim" >= 0.4)
      },
      Some(s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
        |terms AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
        |    a.embedding AS ea, b.embedding AS eb,
        |    unnest(generate_series(1, len(a.embedding))) AS i
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id),
        |dots AS (
        |  SELECT vec_a, vec_b, label,
        |    ${dotSql("ea", "eb")} AS dot,
        |    ${dotSql("ea", "ea")} AS na,
        |    ${dotSql("eb", "eb")} AS nb
        |  FROM terms GROUP BY 1, 2, 3),
        |scored AS (
        |  SELECT vec_a, vec_b, label,
        |    ROUND(CASE WHEN na > 0 AND nb > 0 THEN dot / (sqrt(na) * sqrt(nb))
        |         ELSE 0.0 END, 9) AS cosine_sim
        |  FROM dots)
        |SELECT * FROM scored WHERE cosine_sim >= 0.4""".stripMargin)),

    // ── Random-hyperplane LSH bucketing (the ANN scale path): 12-plane
    //    sign signature per vector; buckets become equi-join keys.
    QueryDef(
      "q42_lsh_buckets",
      (s, dir) => {
        import s.implicits._
        Tables.embeddings(s, dir)
          .select($"vec_id",
            Similarity.lshSignature($"embedding", nPlanes = 12).as("signature"))
          .groupBy($"signature")
          .agg(count(lit(1)).as("n_vectors"), min($"vec_id").as("min_vec_id"))
      },
      Some {
        val nPlanes = 12
        val planeSums = (0 until nPlanes).map { p =>
          s"""CASE WHEN SUM(CAST(CAST(e[i] AS DOUBLE) *
             | (CASE WHEN ('0x' || substr(md5('plane$p:' || CAST(i - 1 AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
             |  THEN 1.0 ELSE -1.0 END) AS DECIMAL(30,18))) >= 0 THEN '1' ELSE '0' END AS b$p""".stripMargin
        }.mkString(",\n    ")
        val sig = (0 until nPlanes).map(p => s"b$p").mkString(" || ")
        s"""WITH terms AS (
        |  SELECT vec_id, embedding AS e,
        |    unnest(generate_series(1, len(embedding))) AS i
        |  FROM embeddings),
        |bits AS (
        |  SELECT vec_id,
        |    $planeSums
        |  FROM terms GROUP BY 1),
        |sigs AS (SELECT vec_id, $sig AS signature FROM bits)
        |SELECT signature, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec_id
        |FROM sigs GROUP BY 1""".stripMargin
      })
  )
}
