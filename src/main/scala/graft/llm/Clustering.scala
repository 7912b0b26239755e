package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed spherical k-means over an embedding column — the clustering
  * step a curation pipeline runs before cluster-balanced sampling or
  * SemDeDup-style pruning (Abbas et al. 2023 cluster the corpus exactly
  * like this). Unlike [[Similarity.trainCentroids]] (a bounded-sample
  * trainer for the IVF coarse quantizer), this is full-data Lloyd's:
  * every row participates in every update, so the result is the real
  * corpus clustering, not a sketch of it.
  *
  * Scale shape per iteration: ONE job — assignment is the codegen'd
  * broadcast argmax-dot ([[IvfCell]], k×dim doubles riding the closure),
  * the update is a (cell, dim) groupBy whose output is k×dim rows of
  * driver metadata (same bounded-collect class as the IVF sample; the
  * data table is never collected). Sums run in DECIMAL so the centroid
  * update is independent of partitioning/addition order — assignments,
  * and therefore the whole training run, are bit-deterministic.
  * Init is data-driven and deterministic: the k vectors with the
  * smallest md5(id) (the corpus's own portable-shuffle idiom, q82).
  */
object Clustering {

  private def dv(c: Column): Column = c.cast(ArrayType(DoubleType))

  /** Train `iters` rounds of spherical k-means; returns the final
    * centroids (unit vectors, index = cluster id).
    */
  def kmeansCentroids(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): Array[Array[Double]] = {
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    // deterministic data-driven init: k rows by md5(id) order
    var centroids: Array[Array[Double]] = emb
      .select(dv(col(vecCol)).as("v"),
        md5(concat(lit("km:"), col(idCol).cast(StringType))).as("__o"))
      .orderBy("__o").limit(k)
      .select("v")
      .collect().map(r => normalize(r.getSeq[Double](0).toArray))
    require(centroids.length == k, s"need at least $k rows to seed $k clusters")
    for (_ <- 0 until iters) {
      val upd = emb
        .withColumn("cell", IvfCell(dv(col(vecCol)), centroids))
        .select(col("cell"), posexplode(dv(col(vecCol))).as(Seq("d", "x")))
        // DECIMAL sum: addition-order-independent, so centroids (and every
        // downstream assignment) are identical under any partitioning
        .groupBy("cell", "d")
        .agg(sum(col("x").cast(DecimalType(28, 14))).cast(DoubleType).as("s"),
          count(lit(1)).as("n"))
        .collect() // k×dim rows — bounded driver metadata, data never collected
      val dim = centroids(0).length
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      upd.foreach { r =>
        val (c, d) = (r.getInt(0), r.getInt(1))
        sums(c)(d) = r.getDouble(2)
        counts(c) = r.getLong(3)
      }
      centroids = Array.tabulate(k)(c =>
        if (counts(c) == 0) centroids(c) else normalize(sums(c)))
    }
    centroids
  }

  /** Full assignment under the trained centroids: (id, cluster, sim) rows
    * — sim is the dot to the assigned unit centroid (spherical k-means'
    * cosine), the per-row quality signal SemDeDup-style pruning keys on.
    * Pure per-row codegen'd pass: zero shuffles.
    */
  def kmeansAssign(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val centroids = kmeansCentroids(emb, idCol, vecCol, k, iters)
    emb.select(col(idCol), dv(col(vecCol)).as("v"))
      .select(col(idCol),
        IvfCell(col("v"), centroids).as("cluster"),
        IvfBestDot(col("v"), centroids).as("sim"))
  }

  /** Cluster-balanced sampling: at most `cap` members per cluster, chosen
    * by a deterministic md5 shuffle (q82's portable-shuffle idiom) — the
    * "diversify by cluster" step after k-means. One WindowGroupLimit per
    * cluster, never a global sort.
    */
  def clusterSample(assigned: DataFrame, idCol: String, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("cluster")
      .orderBy(md5(concat(lit("cs:"), col(idCol).cast(StringType))), col(idCol))
    assigned.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
  }
}
