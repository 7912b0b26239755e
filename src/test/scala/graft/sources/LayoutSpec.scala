package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Layout operators: Morton-index goldens, planning-time partition
  * pruning, and Z-order file-skipping locality — the behaviors q84/q85's
  * value oracles cannot see.
  */
class LayoutSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_layout_spec_$name").toString

  test("interleave goldens: bit placement, identity corners, full 62-bit range") {
    assert(ZOrderKernels.interleave(0, 0) == 0L)
    assert(ZOrderKernels.interleave(1, 0) == 1L) // x occupies even bits
    assert(ZOrderKernels.interleave(0, 1) == 2L) // y occupies odd bits
    // x=3 → bits {0,2} = 5; y=5 → bits {1,5} = 34; morton = 39
    assert(ZOrderKernels.interleave(3, 5) == 39L)
    // full 31-bit inputs fill exactly 62 bits, never the sign bit
    assert(ZOrderKernels.interleave(Int.MaxValue, Int.MaxValue) == (1L << 62) - 1)
    assert(ZOrderKernels.interleave(Int.MaxValue, 0) == 0x1555555555555555L)
  }

  test("zorder2 is SQL-registered and matches the kernel") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql("SELECT zorder2(3, 5) AS z").collect().head.getLong(0)
    assert(r == 39L)
  }

  test("partitioned write prunes directories at planning time") {
    import spark.implicits._
    val df = (0 until 400)
      .map(i => (i.toLong, s"t$i", Seq("en", "zh", "de", "fr")(i % 4)))
      .toDF("id", "body", "lang")
    val path = tmp("prune")
    Layout.writePartitioned(df, path, Seq("lang"))

    val read = Layout.readPartitioned(spark, path).filter($"lang" === "en")
    // Value correctness of the round-trip
    assert(read.count() == 100)
    assert(read.agg(sum("id")).head.getLong(0) == (0 until 400 by 4).sum.toLong)

    // The predicate must land in PartitionFilters (planning-time pruning),
    // NOT as a data filter evaluated over all partitions' rows.
    val scan = read.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters"), scan)
    val pf = scan.split("PartitionFilters:")(1).split("]")(0)
    assert(pf.contains("lang"), s"partition predicate missing: $pf")
    // One of four lang directories survives pruning.
    val scanned = read.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(scanned.nonEmpty && scanned.forall(_.contains("lang=en")), scanned.mkString(","))
  }

  test("zorder clustering: either-dim predicates hit a minority of files") {
    import spark.implicits._
    // 64x64 grid, z-clustered into 16 files: each file is one contiguous
    // z segment = one 16x16 tile, so a y-slice predicate (the dim a plain
    // x-sort can't serve) touches exactly 4 tiles.
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x, y)))
      .toDF("x", "y")
    val path = tmp("zorder")
    Layout.zorderWrite(grid, path, "x", "y", files = 16)

    val back = spark.read.parquet(path)
    val files = back.select(input_file_name().as("f")).distinct().count()
    assert(files == 16L, s"expected 16 files, got $files")

    def filesHit(pred: org.apache.spark.sql.Column): Long =
      back.filter(pred).select(input_file_name()).distinct().count()
    // Row-level truth via per-file min/max: a footer-skipping reader opens
    // only files whose range intersects the predicate. input_file_name over
    // the filtered rows measures exactly that set.
    assert(filesHit($"y" < 16) == 4L)
    assert(filesHit($"x" < 16) == 4L)
    assert(filesHit($"x" < 16 && $"y" < 16) == 1L)
    // and the row results are exact
    assert(back.filter($"y" < 16).count() == 64L * 16)

    // The same predicates are pushed to parquet (footer skipping applies).
    val scan = back.filter($"y" < 16).queryExecution.executedPlan
      .collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.split("PushedFilters:")(1).contains("LessThan(y,16)"), scan)
  }

  test("capPerGroup: exact per-group cap, deterministic, nested draws") {
    import spark.implicits._
    val df = (0 until 300)
      .map(i => (i.toLong, Seq("a", "b", "c")(i % 3)))
      .toDF("id", "grp")
    val k10 = graft.llm.Sampling.capPerGroup(df, "id", "grp", 10)
    assert(k10.groupBy("grp").count().collect().forall(_.getLong(1) == 10L))
    // deterministic across evaluations
    val ids1 = k10.select("id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = graft.llm.Sampling.capPerGroup(df, "id", "grp", 10)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2)
    // nesting: the 10-cap draw is a subset of the 20-cap draw
    val ids20 = graft.llm.Sampling.capPerGroup(df, "id", "grp", 20)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1.forall(ids20.contains))
    // a cap above the group size keeps everything
    assert(graft.llm.Sampling.capPerGroup(df, "id", "grp", 1000).count() == 300L)
  }
}
