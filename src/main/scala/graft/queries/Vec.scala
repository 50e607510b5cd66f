package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]`, dim 64).
  *
  * Three tiers, mirroring how ANN is actually deployed on a big corpus:
  *   - q41: brute-force cosine top-k against one query vector — the exactness
  *     baseline. The query vector is a 1-row broadcast; the scan is a single
  *     shuffle-free map + TakeOrdered(k), which scales linearly and never
  *     materializes a global sort. Broadcast sides join on a literal key so
  *     the plan is a BroadcastHashJoin, not a nested-loop cartesian.
  *   - q42: random-hyperplane LSH — every vector gets a 4-bit signature from
  *     deterministic md5-derived hyperplanes; search only touches the query's
  *     bucket (~1/16 of the corpus at uniform spread). The scale path when
  *     one query must not scan everything.
  *   - q43: IVF cell assignment — vectors partitioned by nearest of 16
  *     deterministic centroids (the first 16 vectors as a stand-in codebook;
  *     a real pipeline would k-means them). This is the partition layout an
  *     IVF index would persist; queries then probe 1-2 cells.
  *
  * All float math is widened to double before any reduction, so engine
  * summation-order differences stay ~1e-13 relative and `round(6)` yields
  * identical digits in Spark and DuckDB.
  */
object Vec {
  import Tables._

  private val Dim = 64
  private val NBits = 4 // LSH signature bits
  private val NCells = 16 // IVF codebook size

  private def toD(a: Column): Column = transform(a, x => x.cast("double"))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** q41: top-10 nearest by cosine to the vec_id=0 embedding. */
  private def q41(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    // join key derived from a column (pmod == 0 always) so Catalyst keeps a
    // hash-join key instead of folding a literal condition into a nested loop
    val q = e.filter(col("vec_id") === 0)
      .select(toD(col("embedding")).as("qv"), pmod(col("vec_id"), lit(1)).as("jk"))
    e.filter(col("vec_id") =!= 0)
      .withColumn("jk", pmod(col("vec_id"), lit(1)))
      .join(broadcast(q), Seq("jk"))
      .select(col("vec_id"), col("label"),
        round(cosine(toD(col("embedding")), col("qv")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  private val o41 = """
    SELECT vec_id, label,
           round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
             (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
              WHERE vec_id = 0)), 6) AS cos_sim
    FROM embeddings WHERE vec_id <> 0
    ORDER BY cos_sim DESC, vec_id LIMIT 10"""

  /** Deterministic md5-derived hyperplane component i of plane j (oracle
    * fragment): first hex digit of md5("j:i"), offset to be mean-zero-ish.
    */
  private def oHyperplane(j: Int): String =
    s"""list_transform(range(0, $Dim), i ->
        strpos('0123456789abcdef',
          substr(md5('$j:' || CAST(i AS VARCHAR)), 1, 1)) - 8.5)"""

  /** LSH signature: one char per hyperplane, '1' iff dot(v, h_j) > 0.
    * Computed by the codegen'd native expression
    * [[graft.functions.LshSignatureExpression]] (same md5-derived planes and
    * IEEE fold order as the SQL formulation the oracle runs — an interpreted
    * aggregate/zip_with chain re-evaluated 4 folds per row).
    */
  private def sigExpr: Column =
    graft.functions.LshSignatureExpression.lshSignature(col("embedding"))

  private def oSigExpr: String = (0 until NBits).map(j =>
    s"""(CASE WHEN list_sum(list_transform(range(1, ${Dim + 1}),
        i -> CAST(embedding[i] AS DOUBLE) * hp$j[i])) > 0
        THEN '1' ELSE '0' END)""").mkString(" || ")

  /** q42: all vectors in the query vector's LSH bucket, ranked by cosine. */
  private def q42(s: SparkSession, d: String): DataFrame = {
    val e = parallelize(s, embeddings(s, d)).withColumn("sig", sigExpr)
    val q = e.filter(col("vec_id") === 0)
      .select(toD(col("embedding")).as("qv"), col("sig").as("qsig"))
    e.filter(col("vec_id") =!= 0)
      .join(broadcast(q), col("sig") === col("qsig"))
      .select(col("vec_id"), col("sig"),
        round(cosine(toD(col("embedding")), col("qv")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
  }

  private def o42: String = {
    val hps = (0 until NBits).map(j => s"${oHyperplane(j)} AS hp$j").mkString(", ")
    s"""WITH hp AS (SELECT $hps),
       sigs AS (
         SELECT vec_id, embedding, ($oSigExpr) AS sig
         FROM embeddings, hp)
       SELECT s.vec_id, s.sig,
              round(list_cosine_similarity(CAST(s.embedding AS DOUBLE[]),
                CAST(q.embedding AS DOUBLE[])), 6) AS cos_sim
       FROM sigs s
       JOIN (SELECT sig, embedding FROM sigs WHERE vec_id = 0) q
         ON s.sig = q.sig
       WHERE s.vec_id <> 0
       ORDER BY cos_sim DESC, s.vec_id"""
  }

  /** q43: IVF cell assignment — nearest of the 16 codebook centroids per
    * vector (L2), with per-cell population and mean distance.
    */
  private def q43(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val cents = e.filter(col("vec_id") < NCells)
      .select(col("vec_id").as("cid"), toD(col("embedding")).as("cv"),
        pmod(col("vec_id"), lit(1)).as("jk"))
    val dist2 = aggregate(
      zip_with(toD(col("embedding")), col("cv"),
        (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("dist").asc, col("cid").asc)
    e.withColumn("jk", pmod(col("vec_id"), lit(1)))
      .join(broadcast(cents), Seq("jk"))
      .select(col("vec_id"), col("cid"), sqrt(dist2).as("dist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vectors"),
        round(avg(col("dist")), 6).as("avg_dist"))
      .orderBy(col("cid"))
  }

  private val o43 = s"""
    WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
               FROM embeddings WHERE vec_id < $NCells),
    dists AS (
      SELECT e.vec_id, c.cid,
             list_distance(CAST(e.embedding AS DOUBLE[]), c.cv) AS dist
      FROM embeddings e CROSS JOIN c),
    best AS (
      SELECT vec_id, cid, dist,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      FROM dists)
    SELECT cid, count(*) AS n_vectors, round(avg(dist), 6) AS avg_dist
    FROM best WHERE rn = 1
    GROUP BY cid ORDER BY cid"""

  /** q44: per-label embedding statistics (norm moments) — the sanity sweep a
    * pipeline runs before indexing a new embedding batch.
    */
  private def q44(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("label"), norm(toD(col("embedding"))).as("nrm"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("nrm")), 6).as("avg_norm"),
        round(min(col("nrm")), 6).as("min_norm"),
        round(max(col("nrm")), 6).as("max_norm"))
      .orderBy(col("label"))

  private val o44 = """
    SELECT label, count(*) AS n, round(avg(nrm), 6) AS avg_norm,
           round(min(nrm), 6) AS min_norm, round(max(nrm), 6) AS max_norm
    FROM (SELECT label, sqrt(list_sum(list_transform(
            CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
          FROM embeddings)
    GROUP BY label ORDER BY label"""

  /** q47: embedding near-duplicate pairs — candidates limited to vectors
    * sharing an LSH signature (hamming-0 buckets; at uniform spread each
    * bucket holds ~1/2^bits of the corpus, so pair work is corpus²/2^bits
    * per bucket set, never a global all-pairs), then verified by exact
    * cosine >= 0.3.
    */
  private def q47(s: SparkSession, d: String): DataFrame = {
    val sigs = parallelize(s, embeddings(s, d)).withColumn("sig", sigExpr)
      .select(col("vec_id"), col("sig"), toD(col("embedding")).as("ed"))
    sigs.as("a")
      .join(sigs.as("b"),
        col("a.sig") === col("b.sig") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(cosine(col("a.ed"), col("b.ed")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= 0.3)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  private def o47: String = {
    val hps = (0 until NBits).map(j => s"${oHyperplane(j)} AS hp$j").mkString(", ")
    s"""WITH hp AS (SELECT $hps),
       sigs AS (
         SELECT vec_id, embedding, ($oSigExpr) AS sig
         FROM embeddings, hp)
       SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
       FROM sigs a JOIN sigs b
         ON a.sig = b.sig AND a.vec_id < b.vec_id
       WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
               CAST(b.embedding AS DOUBLE[])), 6) >= 0.3
       ORDER BY vec_a, vec_b"""
  }

  /** q81: per-label centroid via the typed single-pass vector Aggregator
    * ([[graft.functions.VecCentroid]]) — how a pipeline trains the IVF
    * codebook q43 assigns against. The aggregation ships one O(dim) buffer
    * per (group, partition); only the final 3 x 64 means explode into rows
    * for the oracle compare (the DuckDB side must explode first — rows x dim
    * — which is exactly the shuffle shape the Aggregator avoids).
    */
  private def q81(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds = embeddings(s, d)
      .select(col("label"), toD(col("embedding")).as("v"))
      .as[(Int, Seq[Double])]
    val cent = new graft.functions.VecCentroid.Centroid(Dim).toColumn
    ds.groupByKey(_._1)
      .mapValues(_._2)
      .agg(cent.name("c"))
      .toDF("label", "c")
      .select(col("label"), posexplode(col("c")).as(Seq("dim", "mean_raw")))
      .select(col("label"), col("dim"),
        round(col("mean_raw"), 6).as("mean_v"))
      .orderBy(col("label"), col("dim"))
  }

  private val o81 = """
    SELECT label, CAST(dim - 1 AS INT) AS dim, round(avg(v), 6) AS mean_v
    FROM (SELECT label, generate_subscripts(embedding, 1) AS dim,
                 CAST(unnest(embedding) AS DOUBLE) AS v
          FROM embeddings)
    GROUP BY label, dim ORDER BY label, dim"""

  /** q84: one Lloyd (k-means) iteration of the IVF codebook — assign every
    * vector to its nearest centroid (q43's plan shape: broadcast codebook,
    * windowed argmin), then recompute per-cell means with the single-pass
    * centroid Aggregator (q81's shape). This is the iterative-refinement
    * step a real pipeline loops; output truncated to the first 4 dims per
    * cell to keep compare rows bounded.
    */
  private def q84(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = embeddings(s, d)
    val cents = e.filter(col("vec_id") < NCells)
      .select(col("vec_id").as("cid"), toD(col("embedding")).as("cv"),
        pmod(col("vec_id"), lit(1)).as("jk"))
    val dist2 = aggregate(
      zip_with(toD(col("embedding")), col("cv"),
        (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("dist").asc, col("cid").asc)
    val assigned = e.withColumn("jk", pmod(col("vec_id"), lit(1)))
      .join(broadcast(cents), Seq("jk"))
      .select(col("vec_id"), col("cid"), sqrt(dist2).as("dist"),
        toD(col("embedding")).as("v"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val cent = new graft.functions.VecCentroid.Centroid(Dim).toColumn
    assigned.select(col("cid"), col("v")).as[(Long, Seq[Double])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(cent.name("c"))
      .toDF("cid", "c")
      .select(col("cid"), posexplode(col("c")).as(Seq("dim", "mean_raw")))
      .filter(col("dim") < 4)
      .select(col("cid"), col("dim"), round(col("mean_raw"), 6).as("mean_v"))
      .orderBy(col("cid"), col("dim"))
  }

  private val o84 = s"""
    WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
               FROM embeddings WHERE vec_id < $NCells),
    dists AS (
      SELECT e.vec_id, c.cid,
             list_distance(CAST(e.embedding AS DOUBLE[]), c.cv) AS dist
      FROM embeddings e CROSS JOIN c),
    best AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      FROM dists),
    ex AS (
      SELECT e.vec_id, generate_subscripts(e.embedding, 1) AS dim,
             CAST(unnest(e.embedding) AS DOUBLE) AS v
      FROM embeddings e)
    SELECT b.cid, CAST(ex.dim - 1 AS INT) AS dim,
           round(avg(ex.v), 6) AS mean_v
    FROM best b JOIN ex ON b.vec_id = ex.vec_id
    WHERE b.rn = 1 AND ex.dim <= 4
    GROUP BY b.cid, ex.dim ORDER BY b.cid, ex.dim"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q84_kmeans_iter", q84, Some(o84)),
    QueryDef("q81_centroid_agg", q81, Some(o81)),
    QueryDef("q41_cosine_topk", q41, Some(o41)),
    QueryDef("q42_ann_lsh_bucket", q42, Some(o42)),
    QueryDef("q43_ivf_assign", q43, Some(o43)),
    QueryDef("q44_embedding_stats", q44, Some(o44)),
    QueryDef("q47_embedding_near_dup", q47, Some(o47)))
}
