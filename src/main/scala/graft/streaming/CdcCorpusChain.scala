package graft.streaming

import graft.cdc.{BinlogDecode, BinlogRowCodec, BinlogSchema, MysqlReplicaSession}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The CAPSTONE composition — "replicate a production DB into a curated
  * training corpus", the shape this engine exists for (the reference
  * feeds MQ consumers, `/root/reference/src/main.rs:74-130`; a training
  * pipeline feeds the corpus instead): the CDC wire chain and the LLM
  * curation chain, until now two separately-composed pipelines
  * (ReplicaStream → TxnStream/SchemaStream → Pipeline on the wire side;
  * [[CurationChain]] on the corpus side), joined in ONE streaming job.
  *
  * Per micro-batch: raw replica transport chunks reassemble and fold
  * through the session state machine ([[ReplicaStream.fromChunks]] —
  * bring-up, framing, 16 MB continuation), ROWS events split and decode
  * under the declared table schema (codegen'd
  * [[graft.cdc.BinlogDecode]] expressions, INSERTs only — a document
  * table fed by an ingest service is append-shaped; UPDATE/DELETE
  * corpus maintenance is [[CdcSnapshot]]'s latest-image job), each row
  * image projects to (doc_id, text[, content][, embedding] — a declared
  * BLOB column's hex-lossless bytes and a JSON-array vector ride into
  * the perceptual/semantic screens), and the batch runs
  * [[CurationChain.ingestInto]]'s full admission body — gate → exact →
  * perceptual → signature → semantic screens, exactly-once store
  * publication. [[startCdcMulti]] is the multi-table form: stateful
  * TABLE_MAP pairing via [[SchemaStream]], one curated root per table.
  * [[start]]/[[startCdc]] take the single-table dump shape the
  * reference's motivating workload has.
  *
  * Scale posture: the wire fold is per-session state (bytes, not rows),
  * the decode is a stateless per-row kernel, and the curation screens
  * are the measured [[CurationChain]] joins — nothing here adds a
  * shuffle beyond the screens' own key-colocated joins. The end-to-end
  * contract is gated by CdcCorpusChainSpec: binlog bytes in, curated
  * admitted store out, equal to the batch replay of the same documents.
  */
object CdcCorpusChain {

  /** Raw replica chunks → (doc_id, text) rows of INSERT events, decoded
    * under `columns` (name → mysql type, the table's declared schema).
    */
  def docsFromChunks(chunks: Dataset[ByteChunk],
      config: MysqlReplicaSession.Config,
      columns: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val schema = BinlogSchema.fromMysqlTypes(columns)
    ReplicaStream.fromChunks(chunks, config).toDF()
      .select(BinlogDecode.eventSplit(col("event")).as("h"))
      .filter(col("h.event_type").isin(
        BinlogRowCodec.WriteV1, BinlogRowCodec.WriteV2))
      .select(BinlogDecode.rows(col("h.body"), col("h.event_type"), schema)
        .as("r"))
      .select(explode(col("r.data")).as("m"))
      .select(element_at(col("m"), idCol).cast("long").as("doc_id"),
        element_at(col("m"), textCol).as("text"))
  }

  /** Wire the whole chain as one running query: chunks in, curated
    * corpus stores under `rootDir` out. `checkpointDir` carries both the
    * reassembly/session state and the source offsets; the store side is
    * exactly-once through [[CurationChain]]'s [[StoreTxn]] protocol.
    */
  def start(chunks: Dataset[ByteChunk], config: MysqlReplicaSession.Config,
      columns: Seq[(String, String)], rootDir: String, checkpointDir: String,
      threshold: Double = 0.92, compactEvery: Int = 0,
      idCol: String = "doc_id", textCol: String = "text"): StreamingQuery =
    docsFromChunks(chunks, config, columns, idCol, textCol)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(CurationChain.ingestInto(rootDir, threshold, compactEvery) _)
      .start()

  /** Raw replica chunks → (op, ord, doc_id, text[, content][, embedding])
    * rows across the FULL DML surface: INSERT/UPDATE rows carry the
    * surviving (after) image, DELETE rows the deleted image (the Canal
    * slot conventions [[Pipeline.envelopesFromWire]] renders); `ord` is
    * event-ordinal-major, row-position-minor, so the last op per doc in
    * a batch is well defined. This is [[CurationChain.ingestCdcInto]]'s
    * input shape — the mutable-corpus form of [[docsFromChunks]].
    *
    * `contentCol` names a BLOB column to carry as media bytes: the row
    * decoder renders binary columns as lossless lowercase hex
    * ([[graft.cdc.BinlogRow]]), so `unhex` recovers the exact bytes and
    * the chain's PERCEPTUAL screen becomes reachable from binlog bytes
    * (r13 verdict item 3 — without this a binlog-fed corpus could never
    * reject a media near-dup). `embeddingCol` names a JSON-array column
    * (`[0.1, …]`, the portable way a MySQL table carries a vector)
    * decoded to `array<double>` so the SEMANTIC screen composes too.
    */
  def cdcDocsFromChunks(chunks: Dataset[ByteChunk],
      config: MysqlReplicaSession.Config,
      columns: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text",
      contentCol: Option[String] = None,
      embeddingCol: Option[String] = None): DataFrame = {
    val schema = BinlogSchema.fromMysqlTypes(columns)
    opsFromEvents(ReplicaStream.fromChunks(chunks, config).toDF(),
      schema, idCol, textCol, contentCol, embeddingCol)
  }

  /** The shared ops projection: whole binlog events (`ordinal`, `event`)
    * → (op, ord, doc_id, text[, content][, embedding]) under one table's
    * declared schema — the tail of [[cdcDocsFromChunks]], factored so the
    * multi-table router ([[startCdcMulti]]) can apply it per table to an
    * already-routed event batch.
    */
  private def opsFromEvents(events: DataFrame,
      schema: Array[graft.cdc.BinlogColumn],
      idCol: String, textCol: String,
      contentCol: Option[String], embeddingCol: Option[String]): DataFrame = {
    import BinlogRowCodec._
    val deletes = Seq(DeleteV1, DeleteV2)
    val updates = Seq(UpdateV1, UpdateV2)
    val writes = Seq(WriteV1, WriteV2)
    val extras =
      contentCol.map(c => unhex(element_at(col("m"), c)).as("content")).toSeq ++
        embeddingCol.map(c => from_json(element_at(col("m"), c),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)).as("embedding")).toSeq
    events
      .select(col("ordinal"), BinlogDecode.eventSplit(col("event")).as("h"))
      .filter(col("h.event_type").isin((writes ++ updates ++ deletes)
        .map(Integer.valueOf): _*))
      .select(col("ordinal"), col("h.event_type").as("t"),
        BinlogDecode.rows(col("h.body"), col("h.event_type"), schema).as("r"))
      .select(col("ordinal"), col("t"),
        posexplode(when(col("t").isin(deletes.map(Integer.valueOf): _*),
          col("r.old")).otherwise(col("r.data"))).as(Seq("pos", "m")))
      .select(Seq(
        // ordinal-major, position-minor packed so neither component can
        // overflow into the other: a 16 MB ROWS event with small images
        // can exceed 1e6 rows, which the old decimal packing collided on
        // (r13 ADVICE) — both components fit a long under a 32-bit shift
        shiftleft(col("ordinal"), 32).bitwiseOR(col("pos")).as("ord"),
        when(col("t").isin(deletes.map(Integer.valueOf): _*), "DELETE")
          .when(col("t").isin(updates.map(Integer.valueOf): _*), "UPDATE")
          .otherwise("INSERT").as("op"),
        element_at(col("m"), idCol).cast("long").as("doc_id"),
        element_at(col("m"), textCol).as("text")) ++ extras: _*)
  }

  /** [[start]] for the full DML surface: UPDATE/DELETE retire the doc's
    * standing store rows (tombstones) and UPDATE re-offers the new text
    * through the screens — the mutable-corpus capstone. Declaring
    * `contentCol`/`embeddingCol` routes the table's BLOB/vector columns
    * into the perceptual/semantic screens.
    */
  def startCdc(chunks: Dataset[ByteChunk], config: MysqlReplicaSession.Config,
      columns: Seq[(String, String)], rootDir: String, checkpointDir: String,
      threshold: Double = 0.92, compactEvery: Int = 0,
      idCol: String = "doc_id", textCol: String = "text",
      contentCol: Option[String] = None,
      embeddingCol: Option[String] = None): StreamingQuery =
    cdcDocsFromChunks(chunks, config, columns, idCol, textCol,
        contentCol, embeddingCol)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(CurationChain.ingestCdcInto(rootDir, threshold, compactEvery) _)
      .start()

  /** One table's place in a multi-table CDC→corpus stream: its declared
    * schema, its corpus root, and which columns carry the id / text /
    * media / vector.
    *
    * `indexedSemantic = true` (requires `embeddingCol`) routes the table
    * to [[SemDedupStream.ingestCdcIntoIndexed]] instead of the full
    * curation chain (r14 verdict item 4): the root becomes a PURE
    * semantic corpus screened through the persisted frozen-cell PQ index
    * — per-trigger cost corpus-size-FLAT, the right shape for a
    * vector-heavy table whose text is incidental — with full-DML
    * tombstone semantics (UPDATE/DELETE retire the standing vector and
    * its index posting). The chain's text/media screens do NOT run for
    * such a table; declare it un-indexed to keep them.
    */
  final case class TableCorpus(database: String, table: String,
      columns: Seq[(String, String)], rootDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      contentCol: Option[String] = None, embeddingCol: Option[String] = None,
      indexedSemantic: Boolean = false) {
    require(!indexedSemantic || embeddingCol.isDefined,
      s"table $database.$table: indexedSemantic needs an embeddingCol")
  }

  /** MULTI-TABLE [[startCdc]] (r13 verdict item 4 — previously prose):
    * one binlog stream carrying several tables' DML routes each table
    * into its OWN curated corpus root. [[SchemaStream.withSchema]] does
    * the stateful TABLE_MAP pairing (table_id → (db, table) binding
    * survives checkpoint restarts and batch splits — an in-batch-only
    * pairing would misroute a ROWS event whose TABLE_MAP landed in the
    * previous trigger), then ONE `foreachBatch` splits the stamped batch
    * by table and runs each slice through the full
    * [[CurationChain.ingestCdcInto]] admission body against that table's
    * root. A row event for a table declared in NEITHER `tables` nor
    * `bootstrapOnly` fails loudly at the schema stage (an explicit
    * allowlist beats a silent drop — the reference's wildcard filter
    * semantics live in [[graft.cdc.Routing]] for the envelope path);
    * `bootstrapOnly` tables decode and drop at routing. Per-root
    * batchIds stay the query's trigger ids, so every root keeps the
    * exactly-once [[StoreTxn]] contract independently (a table with no
    * rows in a trigger commits an empty batch — the marker, not the
    * data, is what replay consults).
    */
  def startCdcMulti(chunks: Dataset[ByteChunk],
      config: MysqlReplicaSession.Config, tables: Seq[TableCorpus],
      checkpointDir: String, threshold: Double = 0.92,
      compactEvery: Int = 0,
      bootstrapOnly: Map[(String, String), Seq[(String, String)]] = Map.empty)
      : StreamingQuery = {
    require(tables.nonEmpty, "startCdcMulti: no tables declared")
    require(tables.map(t => (t.database, t.table)).distinct.size == tables.size,
      "startCdcMulti: duplicate (database, table) declarations")
    require(tables.map(_.rootDir).distinct.size == tables.size,
      "startCdcMulti: two tables share a corpus root")
    val bootstrap = bootstrapOnly ++
      tables.map(t => (t.database, t.table) -> t.columns).toMap
    val stamped = SchemaStream.withSchema(
      ReplicaStream.fromChunks(chunks, config), bootstrap)
    stamped.toDF()
      .select(col("ordinal"), col("db"), col("table"), col("event"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val pinned = batch.persist()
        try tables.foreach { t =>
          val ops = opsFromEvents(
            pinned.filter(col("db") === t.database && col("table") === t.table),
            BinlogSchema.fromMysqlTypes(t.columns),
            t.idCol, t.textCol, t.contentCol, t.embeddingCol)
          if (t.indexedSemantic)
            // the PQ-indexed semantic root: (op, ord, vec_id, embedding)
            // ops, DELETE rows needing only their id (the decoded old
            // image's vector is unused — tombstones key on the id)
            SemDedupStream.ingestCdcIntoIndexed(t.rootDir, threshold,
                compactEvery = compactEvery)(
              ops.select(col("op"), col("ord"),
                col("doc_id").as("vec_id"), col("embedding")),
              batchId)
          else
            CurationChain.ingestCdcInto(t.rootDir, threshold, compactEvery)(
              ops, batchId)
        } finally { pinned.unpersist(); () }
      }
      .start()
  }
}
