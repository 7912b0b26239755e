package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The persisted IVF index (q220): probe ≡ the inline ivfTopK at equal
  * parameters, the probe scan is partition-pruned to the probed cells,
  * and a rebuild fully replaces the previous generation.
  */
class IvfIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val idx = "/tmp/graft_ivf_idx_spec"

  test("probe of the persisted index equals the inline ivfTopK exactly") {
    val e = Tables(spark, dir, "embeddings")
    Similarity.buildIvfIndex(e, idx, nlist = 16)
    val q = e.filter(col("vec_id") < 10)
    val got = Similarity.probeIvfIndex(idx, q, k = 5, nprobe = 12)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val want = Similarity.ivfTopK(q, e, k = 5, nlist = 16, nprobe = 12)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == want, s"persisted probe diverged: got ${got.take(5)}…")
    assert(got.nonEmpty)
  }

  test("probe scan is statically pruned to the probed cells") {
    val e = Tables(spark, dir, "embeddings")
    Similarity.buildIvfIndex(e, idx, nlist = 16)
    val one = e.filter(col("vec_id") === 0)
    val plan = Similarity.probeIvfIndex(idx, one, k = 5, nprobe = 4)
      .queryExecution.executedPlan.toString
    // The cell IN (...) predicate must land in the scan's partition
    // filters — the unprobed cells' files are never opened.
    assert(plan.contains("PartitionFilters"), plan.take(4000))
    val pf = plan.split("PartitionFilters").lift(1).getOrElse("")
    assert(pf.contains("cell"), "cell filter missing from partition filters\n" + plan.take(4000))
  }

  test("append ≡ one-shot assignment under the same centroids, exactly") {
    val e = Tables(spark, dir, "embeddings")
    val a = e.filter(col("vec_id") % 2 === 0)
    val b = e.filter(col("vec_id") % 2 =!= 0)
    // production path: build on A, append B incrementally
    val idxApp = idx + "_app"
    Similarity.buildIvfIndex(a, idxApp, nlist = 16)
    Similarity.appendToIvfIndex(b, idxApp)
    // reference path: identical training (build on A is deterministic),
    // then postings regenerated in ONE shot under the frozen centroids
    val idxRef = idx + "_ref"
    Similarity.buildIvfIndex(a, idxRef, nlist = 16)
    Similarity.assignIvfPostings(a.unionByName(b), idxRef, "overwrite")
    val q = e.filter(col("vec_id") < 10)
    def probe(d: String) = Similarity.probeIvfIndex(d, q, k = 5, nprobe = 12)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val got = probe(idxApp)
    assert(got == probe(idxRef), s"append diverged from one-shot: ${got.take(5)}…")
    assert(got.nonEmpty)
    // reachability: an appended (odd) vector is a returnable neighbor
    assert(got.exists(_._3 % 2 == 1), "no appended vector ever surfaced")
    // postings hold exactly |A| + |B| rows — nothing lost, nothing doubled
    val n = spark.read.parquet(idxApp + "/postings").count()
    assert(n == e.count(), s"postings count $n")
  }

  test("balance report: shares sum to ~1e6 ppm, counts reconcile") {
    val e = Tables(spark, dir, "embeddings")
    Similarity.buildIvfIndex(e, idx, nlist = 16)
    val bal = Similarity.ivfIndexBalance(spark, idx)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(bal.map(_._2).sum == e.count(), "cell counts must total the corpus")
    val ppm = bal.map(_._3).sum
    // each share floors, so the total undershoots 1e6 by < nlist
    assert(ppm <= 1000000L && ppm > 1000000L - bal.length, s"ppm sum $ppm")
    assert(bal.forall(_._2 > 0L), "empty cells have no postings rows")
  }

  test("the rebuild trigger fires on a hot cell and stays quiet on a " +
      "balanced index") {
    val e = Tables(spark, dir, "embeddings")
    // Balanced: built on the full corpus, k-means shares stay near fair.
    Similarity.buildIvfIndex(e, idx, nlist = 16)
    assert(!Similarity.ivfNeedsRebuild(spark, idx, factor = 4.0),
      "a freshly built index must not demand a rebuild")
    // Drifted: append a hot batch the quantizer never saw — as many
    // copies of ONE vector as the whole corpus, all landing in one cell,
    // which then holds >= 50% of postings, far past 4x the 1/16 fair
    // share. (The real-world shape: a new ingest source whose embeddings
    // cluster where the frozen centroids have a single cell.)
    val idxDrift = idx + "_drift"
    Similarity.buildIvfIndex(e, idxDrift, nlist = 16)
    val n = e.count()
    val hot = e.filter(col("vec_id") === 0).select("embedding")
      .crossJoin(spark.range(n).select((col("id") + 1000000L).as("vec_id")))
      .select("vec_id", "embedding")
    Similarity.appendToIvfIndex(hot, idxDrift)
    assert(Similarity.ivfNeedsRebuild(spark, idxDrift, factor = 4.0),
      "a one-cell hot append of corpus size must fire")
    intercept[IllegalArgumentException] {
      Similarity.ivfNeedsRebuild(spark, idx, factor = 1.0)
    }
  }

  /** Hash-dense synthetic corpus with PLANTED near-dups: independent ids
    * are ~orthogonal (|cos| ~ 1/√dim), id 10000+k carries id k's exact
    * embedding — so a 0.9 threshold catches exactly the plants.
    */
  private def synthWithDups(n: Int) = {
    val emb = (src: org.apache.spark.sql.Column) =>
      transform(sequence(lit(0), lit(63)),
        i => (pmod(xxhash64(src, i), lit(2000)).cast("double") / 1000.0)
          - lit(1.0))
    spark.range(n.toLong)
      .select(col("id").as("vec_id"), emb(col("id")).as("embedding"))
      .unionByName(spark.range(10)
        .select((col("id") + 10000L).as("vec_id"), emb(col("id")).as("embedding")))
  }

  test("ivfThresholdPairs at full probe equals the exact threshold pairs") {
    val e = synthWithDups(500)
    Similarity.buildIvfIndex(e, idx, nlist = 8)
    val q = e.filter(col("vec_id") < 20)
    val got = Similarity.ivfThresholdPairs(idx, q, threshold = 0.9, nprobe = 8)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact reference: every cross pair scoring >= threshold
    val want = q.select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
      .crossJoin(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").cast("array<double>").as("cv")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .filter(Similarity.cosine(col("qv"), col("cv")) >= 0.9)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"threshold screen diverged: ±${(got diff want).size}/${(want diff got).size}")
    assert((0 until 10).forall(k => got.contains((k.toLong, 10000L + k))),
      s"every planted dup must surface: $got")
  }

  test("stageIvfAppend's staged delta published into the postings " +
      "equals the in-place append") {
    val e = Tables(spark, dir, "embeddings")
    val a = e.filter(col("vec_id") % 2 === 0)
    val b = e.filter(col("vec_id") % 2 =!= 0)
    val idxStg = idx + "_stg"
    val idxRef2 = idx + "_ref2"
    Similarity.buildIvfIndex(a, idxStg, nlist = 8)
    Similarity.buildIvfIndex(a, idxRef2, nlist = 8)
    Similarity.appendToIvfIndex(b, idxRef2)
    // stage the delta aside, then move its files in (what StoreTxn does)
    val staged = idx + "_stg_delta"
    Similarity.stageIvfAppend(b, idxStg, staged)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def move(src: org.apache.hadoop.fs.Path,
        dst: org.apache.hadoop.fs.Path): Unit = {
      fs.mkdirs(dst)
      fs.listStatus(src).foreach { st =>
        val n = st.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".")) {
          if (st.isDirectory)
            move(st.getPath, new org.apache.hadoop.fs.Path(dst, n))
          else require(fs.rename(st.getPath,
            new org.apache.hadoop.fs.Path(dst, s"b1-$n")))
        }
      }
    }
    move(new org.apache.hadoop.fs.Path(staged),
      new org.apache.hadoop.fs.Path(idxStg + "/postings"))
    val q = e.filter(col("vec_id") < 10)
    def probe(d: String) = Similarity.probeIvfIndex(d, q, k = 5, nprobe = 8)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(probe(idxStg) == probe(idxRef2))
  }

  test("the IVF-pruned PQ-code index: candidates at a margin cover every " +
      "exact threshold pair, extras ride through, the scan prunes") {
    val e = synthWithDups(500)
    val withB = e.withColumn("b", lit(7L))
    val cidx = idx + "_code"
    Similarity.buildIvfCodeIndex(withB, cidx, nlist = 8)
    val q = e.filter(col("vec_id") < 20)
    val cand = Similarity.ivfCodeThresholdCandidates(cidx, q,
      minAdc = 0.9 - 0.15, nprobe = 8)
    val candPairs = cand.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = q.select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
      .crossJoin(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").cast("array<double>").as("cv")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .filter(Similarity.cosine(col("qv"), col("cv")) >= 0.9)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty)
    assert(want.subsetOf(candPairs),
      s"ADC margin lost true pairs: ${(want diff candPairs).take(5)}")
    // the extra column (the admit batch) rides through the postings
    assert(cand.columns.contains("b"))
    assert(cand.select("b").distinct().collect().map(_.getLong(0)).toSeq == Seq(7L))
    // and the postings scan is partition-pruned to the probed cells
    val plan = Similarity.ivfCodeThresholdCandidates(cidx,
        e.filter(col("vec_id") === 0), minAdc = 0.35, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.split("PartitionFilters").lift(1).exists(_.contains("cell")),
      plan.take(4000))
  }

  test("stageIvfCodeAppend ≡ one-shot encode under frozen centroids " +
      "and codebooks") {
    val e = synthWithDups(500)
    val a = e.filter(col("vec_id") % 2 === 0)
    val b = e.filter(col("vec_id") % 2 =!= 0)
    val one = idx + "_code_one"
    val app = idx + "_code_app"
    Similarity.buildIvfCodeIndex(a.unionByName(b), one, nlist = 8)
    // the appended variant trains on A ∪ B too (frozen artifacts equal),
    // but encodes B through the staged-append path
    Similarity.buildIvfCodeIndex(a.unionByName(b), app, nlist = 8)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(app + "/postings"), true)
    Similarity.stageIvfCodeAppend(a, app, app + "/postings_a")
    Similarity.stageIvfCodeAppend(b, app, app + "/postings_b")
    spark.read.parquet(app + "/postings_a")
      .unionByName(spark.read.parquet(app + "/postings_b"))
      .write.partitionBy("cell").parquet(app + "/postings")
    val q = e.filter(col("vec_id") < 10)
    def cands(d: String) = Similarity
      .ivfCodeThresholdCandidates(d, q, minAdc = 0.4, nprobe = 8)
      .select("query_id", "neighbor_id", "adc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(cands(app) == cands(one))
    assert(cands(one).nonEmpty)
  }

  test("ADC calibration: the build persists the measured residual-norm " +
      "quantiles, the margin bounds the observed per-pair ADC error on " +
      "the build corpus, and an empty-query probe carries the postings' " +
      "extra columns") {
    val e = synthWithDups(500)
    val withB = e.withColumn("b", lit(7L))
    val cidx = idx + "_calib"
    Similarity.buildIvfCodeIndex(withB, cidx, nlist = 8)
    val margin = Similarity.adcCalibratedMargin(spark, cidx)
    assert(margin.isDefined, "build must persist a calibration")
    assert(margin.get > 0 && margin.get < 2.0, s"degenerate margin $margin")
    // the calibrated margin covers the ADC error actually observed on
    // threshold-class pairs of the build corpus (Cauchy–Schwarz: the
    // p99 residual norm bounds |exact − adc| for ≥99% of neighbors)
    val q = e.filter(col("vec_id") < 20)
    val errs = Similarity.ivfCodeThresholdCandidates(cidx, q,
        minAdc = 0.0, nprobe = 8)
      .join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").cast("array<double>").as("cv")), Seq("neighbor_id"))
      .join(e.select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv")), Seq("query_id"))
      .select((Similarity.cosine(col("qv"), col("cv")) - col("adc")).as("err"))
      .collect().map(_.getDouble(0).abs).sorted
    assert(errs.nonEmpty)
    val p99 = errs(math.min(errs.length - 1, (0.99 * errs.length).toInt))
    assert(p99 <= margin.get + 1e-9,
      s"observed p99 ADC error $p99 exceeds calibrated margin ${margin.get}")
    // empty-query probe: the frame still carries the extras (a
    // pure-tombstone CDC trigger reaches this path — r14 ADVICE high)
    val empty = Similarity.ivfCodeThresholdCandidates(cidx,
      q.limit(0), minAdc = 0.5, nprobe = 2)
    assert(empty.columns.contains("b"))
    assert(empty.filter(col("b").isNull || col("b") >= 0).count() == 0L)
  }

  test("per-posting exact margin: an out-of-distribution append's exact " +
      "dup is a candidate at the raw threshold where the calibrated " +
      "global margin provably misses it") {
    val s2 = spark
    import s2.implicits._
    def axisVec(axis: Int): Seq[Double] =
      Seq.tabulate(64)(i => if (i == axis) 1.0 else 0.0)
    // low-residual founding corpus: 16 one-hot axes — each distinct
    // sub-vector becomes its own codebook centroid, so the calibrated
    // p99 margin reads ~0
    val corpus = (0 until 16).map(i => (i.toLong, axisVec(i)))
      .toDF("vec_id", "embedding")
    val cidx = idx + "_mrg"
    Similarity.buildIvfCodeIndex(corpus, cidx, nlist = 4)
    val calib = Similarity.adcCalibratedMargin(spark, cidx).get
    assert(calib < 0.05, s"fixture needs a tight calibration, got $calib")
    // OOD append: axis 40 — its subspace was all-zero in training, so
    // its codes decode to ~0 and the ADC of its own EXACT dup reads ~0.5
    val ood = Seq((100L, axisVec(40))).toDF("vec_id", "embedding")
    Similarity.stageIvfCodeAppend(ood, cidx, cidx + "/postings_app")
    spark.read.parquet(cidx + "/postings_app")
      .write.mode("append").partitionBy("cell").parquet(cidx + "/postings")
    val q = Seq((200L, axisVec(40))).toDF("vec_id", "embedding")
    val exact = Similarity
      .ivfCodeThresholdCandidatesExact(cidx, q, threshold = 0.92, nprobe = 4)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(exact.contains(100L),
      s"the per-posting margin must keep the OOD dup a candidate: $exact")
    val global = Similarity
      .ivfCodeThresholdCandidates(cidx, q, minAdc = 0.92 - calib, nprobe = 4)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(!global.contains(100L),
      "fixture mismatch: the calibrated global margin should miss the " +
        "OOD dup — otherwise this test proves nothing")
    // in-distribution: a dup of a founding axis is a candidate on the
    // exact path too (tight mrg does not over-prune)
    val q3 = Seq((300L, axisVec(3))).toDF("vec_id", "embedding")
    val inDist = Similarity
      .ivfCodeThresholdCandidatesExact(cidx, q3, threshold = 0.92, nprobe = 4)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(inDist.contains(3L), s"in-distribution dup lost: $inDist")
  }

  test("rebuild replaces the previous generation completely") {
    val e = Tables(spark, dir, "embeddings")
    // Generation 1: only even vectors. A probe can never return an odd id.
    Similarity.buildIvfIndex(e.filter(col("vec_id") % 2 === 0), idx, nlist = 8)
    val q = e.filter(col("vec_id") === 1)
    val g1 = Similarity.probeIvfIndex(idx, q, k = 10, nprobe = 8)
      .collect().map(_.getLong(2))
    assert(g1.nonEmpty && g1.forall(_ % 2 == 0))
    // Generation 2: full corpus. Odd neighbors must now be reachable.
    Similarity.buildIvfIndex(e, idx, nlist = 8)
    val g2 = Similarity.probeIvfIndex(idx, q, k = 10, nprobe = 8)
      .collect().map(_.getLong(2))
    assert(g2.exists(_ % 2 == 1), "rebuild did not surface the new vectors")
  }
}
