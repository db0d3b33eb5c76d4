package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** Similarity-search operator family (SURVEY.md §2.E): top-k cosine
  * neighbors over the embeddings table.
  *
  * - brute force: exact baseline. The (small) query set is broadcast
  *   against the corpus — a narrow map over the big side, then a
  *   per-query top-k window. At 100 TB this is the ground-truth/recall
  *   harness, not the serving path.
  * - LSH: random-hyperplane buckets; candidates share a bucket. The
  *   shuffle is on bucket id, never all-pairs.
  * - IVF: coarse centroids (mean per label here — a stand-in for a
  *   k-means codebook), nprobe nearest lists probed per query.
  */
object Similarity {

  def corpus(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))

  /** Exact brute-force top-k for queries `vec_id < nQueries`. */
  def bruteForceTopK(emb: DataFrame, k: Int = 5, nQueries: Int = 10): DataFrame = {
    val c = corpus(emb)
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("q_id")
      .orderBy(round(col("cos"), 9).desc, col("vec_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Random-hyperplane LSH ANN with `nTables` independent hash tables
    * (the standard recall amplifier: a true neighbor is missed only if
    * it hashes apart in EVERY table). Each vector lands in one bucket
    * per table; candidates are the union over tables, deduped before
    * the exact re-rank. The shuffle key is (table, bucket) — never
    * all-pairs.
    */
  def lshTopK(emb: DataFrame, k: Int = 5, nQueries: Int = 10,
      nPlanes: Int = 4, nTables: Int = 4): DataFrame = {
    val base = corpus(emb)
    // per-table bucket: table t uses planes [t*nPlanes, (t+1)*nPlanes)
    // via the deterministic plane hash, so tables are independent
    val c = base.withColumn("buckets", array((0 until nTables).map { t =>
      val planes = transform(sequence(lit(t * nPlanes), lit((t + 1) * nPlanes - 1)), p => {
        val proj = aggregate(
          zip_with(col("v"), sequence(lit(0), size(col("v")) - 1),
            (x, d) => x * graft.functions.VectorFunctions.planeComponent(p.cast("long"), d.cast("long"))),
          lit(0.0), _ + _)
        when(proj >= 0, 1).otherwise(0)
      })
      xxhash64(planes, lit(t))
    }: _*)).cache()
    val buckets = c.select(col("vec_id"), col("v"), col("nrm"),
      posexplode(col("buckets")).as(Seq("table", "bucket")))
    val qBuckets = buckets
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("table").as("qtable"), col("bucket").as("qbucket"))
    val w = Window.partitionBy("q_id")
      .orderBy(round(col("cos"), 9).desc, col("vec_id").asc)
    buckets.join(broadcast(qBuckets),
        col("table") === col("qtable") && col("bucket") === col("qbucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id", "v", "nrm", "qv", "qn")
      // union candidates across tables, once each (payload columns are
      // functionally determined by the pair key)
      .dropDuplicates("q_id", "vec_id")
      .withColumn("cos", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Deterministic seeded k-means (the IVF coarse codebook): init =
    * the first `k` vectors by id, then `iters` rounds of
    * assign-to-nearest + element-wise mean. Every step is a
    * distributed DataFrame op (assignment broadcast, means via
    * posexplode-groupBy); fully deterministic — no RNG.
    */
  def kmeansCentroids(c: DataFrame, k: Int, iters: Int): DataFrame = {
    var centroids = c.filter(col("vec_id") < k)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))
      .withColumn("cn", norm(col("cv")))
    for (_ <- 1 to iters) {
      val wAssign = Window.partitionBy("vec_id")
        .orderBy(round(col("ccos"), 9).desc, col("c_id").asc)
      val assigned = c.crossJoin(broadcast(centroids))
        .withColumn("ccos", dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
        .withColumn("crk", row_number().over(wAssign))
        .filter(col("crk") === 1)
        .select(col("c_id"), col("v"))
      centroids = assigned.select(col("c_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("c_id", "pos").agg(avg("x").as("cx"))
        .groupBy("c_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pcs"))
        .select(col("c_id"), expr("transform(pcs, p -> p.cx)").as("cv"))
        .withColumn("cn", norm(col("cv")))
    }
    centroids
  }

  /** IVF ANN: coarse centroids from seeded k-means; assign every
    * vector to its nearest centroid, probe the `nprobe` nearest lists
    * per query.
    */
  def ivfTopK(emb: DataFrame, k: Int = 5, nQueries: Int = 10, nprobe: Int = 3): DataFrame = {
    val c = corpus(emb)
    val centroids = kmeansCentroids(c, k = 10, iters = 2)
    // assign corpus vectors to nearest centroid
    val wAssign = Window.partitionBy("vec_id").orderBy(round(col("ccos"), 9).desc, col("c_id").asc)
    val assigned = c.crossJoin(broadcast(centroids))
      .withColumn("ccos", dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
      .withColumn("crk", row_number().over(wAssign))
      .filter(col("crk") === 1)
      .select(col("vec_id"), col("label"), col("v"), col("nrm"), col("c_id").as("list_id"))
    // queries probe their nprobe nearest lists
    val wProbe = Window.partitionBy("q_id").orderBy(round(col("ccos"), 9).desc, col("c_id").asc)
    val probes = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      .crossJoin(broadcast(centroids))
      .withColumn("ccos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("crk", row_number().over(wProbe))
      .filter(col("crk") <= nprobe)
      .select(col("q_id"), col("qv"), col("qn"), col("c_id").as("list_id"))
    val w = Window.partitionBy("q_id")
      .orderBy(round(col("cos"), 9).desc, col("vec_id").asc)
    assigned.join(broadcast(probes), Seq("list_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }
}

/** Registry for the similarity family. s1 has an exact DuckDB oracle;
  * s2/s3 are recall-tested against s1 in specs (approximate results
  * are hash-engine-specific → rows-only driver check).
  */
object SimilarityQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_knn_brute" -> ((s, d) => Similarity.bruteForceTopK(Tables.embeddings(s, d))),
    "s2_knn_lsh" -> ((s, d) => Similarity.lshTopK(Tables.embeddings(s, d))),
    "s3_knn_ivf" -> ((s, d) => Similarity.ivfTopK(Tables.embeddings(s, d)))
  )

  val oracles: Map[String, String] = Map(
    "s1_knn_brute" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         n AS (
           SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
         pairs AS (
           SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(list_zip(c.v, q.v), s -> s[1] * s[2]))
               / (c.nrm * q.nrm) AS cos
           FROM n c JOIN n q ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
         ranked AS (
           SELECT q_id, neighbor_id, cos,
             CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY ROUND(cos, 9) DESC, neighbor_id ASC) AS BIGINT) AS rank
           FROM pairs)
         SELECT q_id, rank, neighbor_id, ROUND(cos, 6) AS cosine
         FROM ranked WHERE rank <= 5"""
  )
}
