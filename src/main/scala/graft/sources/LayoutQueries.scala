package graft.sources

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Data-layout operator surface: partition-pruned reads over a
  * hive-partitioned round-trip, and the Z-order clustering index.
  * The scan-side pruning behavior (PartitionFilters, file skipping)
  * is asserted in LayoutSpec; the queries here gate VALUE correctness
  * of the round-trip / index against the DuckDB oracle.
  */
object LayoutQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Scratch dir for round-trip writes, unique per fixture dir so sf0.001
    * bench runs and sf0.01 verify runs never collide.
    */
  private def scratch(dir: String, name: String): String = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"${sys.props("java.io.tmpdir")}/graft_layout_${name}_$tag"
  }

  val qs: Seq[Q] = Seq(

    // documents → hive-partitioned-by-lang parquet → pruned read back.
    // The oracle never sees the layout, so a hash match proves the
    // round-trip is lossless (values, types, partition-column recovery)
    // and the filtered read is exactly the direct filter. LayoutSpec
    // asserts the same read plans a PartitionFilters-only scan (the
    // pruned directories are never listed or read).
    Q("q84_layout_partition_prune", { (s, dir) =>
        val path = scratch(dir, "q84")
        Layout.writePartitioned(
          t(s, dir, "documents").select("doc_id", "text", "lang", "source", "n_chars"),
          path, Seq("lang"))
        Layout.readPartitioned(s, path)
          .filter(col("lang") === "en")
          .select("doc_id", "lang", "source", "n_chars")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang, source, n_chars FROM documents
             |WHERE lang = 'en' ORDER BY doc_id""".stripMargin)),

    // The Z-order (Morton) index itself, value-gated against a DuckDB
    // bit-interleave oracle. zorderWrite clusters files by this index;
    // LayoutSpec asserts the resulting per-file min/max tightness turns
    // into real file skipping on BOTH dims.
    Q("q85_zorder_index", { (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            (col("n_chars") % 1024).cast(IntegerType).as("x"),
            (col("doc_id") % 1024).cast(IntegerType).as("y"))
          .select(col("doc_id"), col("x"), col("y"),
            ZOrder2(col("x"), col("y")).as("zv"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, x, y,
             |  CAST(list_sum(list_transform(generate_series(0, 30),
             |    i -> (CAST((x >> i) & 1 AS BIGINT) << (2*i))
             |       + (CAST((y >> i) & 1 AS BIGINT) << (2*i+1)))) AS BIGINT) AS zv
             |FROM (SELECT doc_id,
             |        CAST(n_chars % 1024 AS INTEGER) AS x,
             |        CAST(doc_id % 1024 AS INTEGER) AS y
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin))
  )
}
