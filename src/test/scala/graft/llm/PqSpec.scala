package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Product-quantization ANN (q148) vs the exact brute-force baseline:
  * recall floor, codebook determinism, compression shape, and the
  * unit-vector identity that makes squared-L2 ADC rank like cosine.
  */
class PqSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def triples(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("PQ+rerank recall@5 >= 0.9 vs brute force") {
    val e = Tables(spark, dir, "embeddings")
    val queries = e.filter(col("vec_id") < 10)
    val bf = triples(Similarity.bruteForceTopK(queries, e, 5))
    val pq = triples(Similarity.pqTopK(queries, e, 5))
    val recall = (bf & pq).size.toDouble / bf.size
    // measured 1.00 at sf0.001 with rerank=48; floor leaves noise margin
    assert(recall >= 0.9, s"recall=$recall bf=${bf.size} pq=${pq.size}")
  }

  test("wider rerank can only improve (or tie) recall") {
    val e = Tables(spark, dir, "embeddings")
    val queries = e.filter(col("vec_id") < 10)
    val bf = triples(Similarity.bruteForceTopK(queries, e, 5))
    val narrow = triples(Similarity.pqTopK(queries, e, 5, rerank = 8))
    val wide = triples(Similarity.pqTopK(queries, e, 5, rerank = 96))
    val rn = (bf & narrow).size.toDouble / bf.size
    val rw = (bf & wide).size.toDouble / bf.size
    assert(rw >= rn, s"rerank=96 recall $rw < rerank=8 recall $rn")
  }

  test("codebook training is deterministic and correctly shaped") {
    val e = Tables(spark, dir, "embeddings")
    val a = Similarity.trainPqCodebooks(e, m = 8, ksub = 16)
    val b = Similarity.trainPqCodebooks(e.repartition(7), m = 8, ksub = 16)
    assert(a.length == 8)
    assert(a.forall(_.length == 16))
    val dim = e.select(size(col("embedding"))).first().getInt(0)
    assert(a.forall(_.forall(_.length == dim / 8)))
    // hash-picked sample + fixed iterations: partition-count independent
    assert(a.map(_.map(_.toSeq).toSeq).toSeq == b.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("codes compress to m small ints and ADC agrees with table lookup") {
    val e = Tables(spark, dir, "embeddings")
    val books = Similarity.trainPqCodebooks(e, m = 8, ksub = 16)
    import spark.implicits._
    val codes = e.select(col("vec_id"),
        PqCode(transform(col("embedding").cast("array<double>"),
          x => x / sqrt(aggregate(transform(col("embedding").cast("array<double>"),
            y => y * y), lit(0.0d), (acc, v) => acc + v))).as("unit"), books).as("codes"))
      .as[(Long, Seq[Int])].collect()
    assert(codes.nonEmpty)
    assert(codes.forall(_._2.length == 8))
    assert(codes.forall(_._2.forall(c => c >= 0 && c < 16)))
  }

  test("query result is partition-count independent") {
    val e = Tables(spark, dir, "embeddings")
    val queries = e.filter(col("vec_id") < 10)
    val one = Similarity.pqTopK(queries, e.repartition(1), 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val many = Similarity.pqTopK(queries, e.repartition(7), 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(one == many)
  }

  // ---- IVF-PQ (IVFADC composite, q174) ----

  test("IVF-PQ recall@5 >= 0.85 vs brute force at the q174 defaults") {
    val e = Tables(spark, dir, "embeddings")
    val queries = e.filter(col("vec_id") < 10)
    val bf = triples(Similarity.bruteForceTopK(queries, e, 5))
    val ivfpq = triples(Similarity.ivfpqTopK(queries, e, 5))
    val recall = (bf & ivfpq).size.toDouble / bf.size
    // probing 8/16 cells bounds recall by list coverage; measured 0.96
    // at sf0.001 — floor leaves noise margin
    assert(recall >= 0.85, s"recall=$recall bf=${bf.size} ivfpq=${ivfpq.size}")
  }

  test("probing every cell recovers (at least) the flat-PQ recall") {
    val e = Tables(spark, dir, "embeddings")
    val queries = e.filter(col("vec_id") < 10)
    val bf = triples(Similarity.bruteForceTopK(queries, e, 5))
    val all = triples(Similarity.ivfpqTopK(queries, e, 5, nlist = 16, nprobe = 16))
    val part = triples(Similarity.ivfpqTopK(queries, e, 5, nlist = 16, nprobe = 4))
    val rAll = (bf & all).size.toDouble / bf.size
    val rPart = (bf & part).size.toDouble / bf.size
    // full probing scores every list — narrowing probes can only lose lists
    assert(rAll >= rPart, s"nprobe=16 recall $rAll < nprobe=4 recall $rPart")
    assert(rAll >= 0.9, s"full-probe recall $rAll")
  }

  test("IVF-PQ result is partition-count independent") {
    val e = Tables(spark, dir, "embeddings")
    val queries = e.filter(col("vec_id") < 10)
    val one = Similarity.ivfpqTopK(queries, e.repartition(1), 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val many = Similarity.ivfpqTopK(queries, e.repartition(7), 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(one == many)
  }

  test("residual codebooks are deterministic and residual-scale small") {
    val e = Tables(spark, dir, "embeddings")
    val cents = Similarity.trainCentroids(e, 16)
    val a = Similarity.trainResidualCodebooks(e, cents, m = 8, ksub = 16)
    val b = Similarity.trainResidualCodebooks(e.repartition(7), cents, m = 8, ksub = 16)
    assert(a.map(_.map(_.toSeq).toSeq).toSeq == b.map(_.map(_.toSeq).toSeq).toSeq)
    // residuals live near the origin: their codebook centroids should be
    // much shorter than unit-vector sub-centroids on average
    val norms = for (book <- a; cen <- book) yield math.sqrt(cen.map(x => x * x).sum)
    assert(norms.max < 1.0, s"residual sub-centroid norm ${norms.max} not residual-scale")
  }
}
