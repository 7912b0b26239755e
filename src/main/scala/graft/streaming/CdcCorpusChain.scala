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
  * image projects to (doc_id, text), and the batch runs
  * [[CurationChain.ingestInto]]'s full admission body — gate → exact →
  * perceptual → signature → semantic screens, exactly-once store
  * publication. Multi-table streams compose the same way with
  * [[SchemaStream]]/[[graft.cdc.Routing]] upstream of the projection;
  * this chain takes the single-table dump shape the reference's
  * motivating workload has.
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

  /** Raw replica chunks → (op, ord, doc_id, text) rows across the FULL
    * DML surface: INSERT/UPDATE rows carry the surviving (after) image,
    * DELETE rows the deleted image (the Canal slot conventions
    * [[Pipeline.envelopesFromWire]] renders); `ord` is
    * event-ordinal-major, row-position-minor, so the last op per doc in
    * a batch is well defined. This is [[CurationChain.ingestCdcInto]]'s
    * input shape — the mutable-corpus form of [[docsFromChunks]].
    */
  def cdcDocsFromChunks(chunks: Dataset[ByteChunk],
      config: MysqlReplicaSession.Config,
      columns: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import BinlogRowCodec._
    val schema = BinlogSchema.fromMysqlTypes(columns)
    val deletes = Seq(DeleteV1, DeleteV2)
    val updates = Seq(UpdateV1, UpdateV2)
    val writes = Seq(WriteV1, WriteV2)
    ReplicaStream.fromChunks(chunks, config).toDF()
      .select(col("ordinal"), BinlogDecode.eventSplit(col("event")).as("h"))
      .filter(col("h.event_type").isin((writes ++ updates ++ deletes)
        .map(Integer.valueOf): _*))
      .select(col("ordinal"), col("h.event_type").as("t"),
        BinlogDecode.rows(col("h.body"), col("h.event_type"), schema).as("r"))
      .select(col("ordinal"), col("t"),
        posexplode(when(col("t").isin(deletes.map(Integer.valueOf): _*),
          col("r.old")).otherwise(col("r.data"))).as(Seq("pos", "m")))
      .select(
        (col("ordinal") * 1000000L + col("pos")).as("ord"),
        when(col("t").isin(deletes.map(Integer.valueOf): _*), "DELETE")
          .when(col("t").isin(updates.map(Integer.valueOf): _*), "UPDATE")
          .otherwise("INSERT").as("op"),
        element_at(col("m"), idCol).cast("long").as("doc_id"),
        element_at(col("m"), textCol).as("text"))
  }

  /** [[start]] for the full DML surface: UPDATE/DELETE retire the doc's
    * standing store rows (tombstones) and UPDATE re-offers the new text
    * through the screens — the mutable-corpus capstone.
    */
  def startCdc(chunks: Dataset[ByteChunk], config: MysqlReplicaSession.Config,
      columns: Seq[(String, String)], rootDir: String, checkpointDir: String,
      threshold: Double = 0.92, compactEvery: Int = 0,
      idCol: String = "doc_id", textCol: String = "text"): StreamingQuery =
    cdcDocsFromChunks(chunks, config, columns, idCol, textCol)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(CurationChain.ingestCdcInto(rootDir, threshold, compactEvery) _)
      .start()
}
