package graft.config

/** The machine-readable inventory of the declarative config surface — the
  * single source of truth that `docs/SPEC_REFERENCE.md` (the user-facing
  * reference), `PipelineSpec.validate`'s unknown-op error, and the
  * SpecFuzzProperties coverage check are all tested against
  * (SpecSurfaceSpec): adding a transform op or a config field without
  * updating the doc — or documenting something the code doesn't carry —
  * fails the build instead of shipping drift.
  *
  * Field inventories are derived REFLECTIVELY from the case classes
  * (productElementNames of a minimal instance), so they cannot lag the
  * code by construction; only the op list is declared, and the validator
  * handshake test proves every listed op is actually dispatched.
  */
object SpecSurface {

  /** Every transform op `PipelineSpec.validateOp` dispatches (and the
    * Interpreter executes). Order is the documentation order.
    */
  val transformOps: Seq[String] = Seq(
    "filter", "parse_json",
    "dedup_exact", "quality_filter", "redact_pii", "dedup_near",
    "shingle_index", "shingle_index_append", "shingle_index_retract",
    "shingle_index_compact", "chunk",
    "contamination_screen", "lang_id", "text_stats", "stratified_sample",
    "weighted_mix", "top_k", "heavy_hitters", "knn", "knn_index",
    "knn_index_append", "knn_index_delete", "knn_index_compact", "resample",
    "profile",
    "quantile_rollup", "distinct_rollup", "pack", "snapshot_drift",
    "scalar_summary", "embedding_summary", "merge_embedding_summaries",
    "merge_scalar_summaries")

  /** knn method family members (PipelineSpec knn validation). */
  val knnMethods: Seq[String] = Seq("exact", "quantized", "ivf", "lsh")

  /** Config case-class name → its field names, reflectively derived. */
  def fields: Map[String, Seq[String]] = Map(
    "PipelineSpec" -> PipelineSpec(id = "s", processingMode = "SIMPLE_STREAM",
      sourceTopic = TopicConfig("t")).productElementNames.toSeq,
    "TransformOp" -> TransformOp(op = "lang_id").productElementNames.toSeq,
    "TopicConfig" -> TopicConfig("t").productElementNames.toSeq,
    "KeyExtraction" -> KeyExtraction("KEY").productElementNames.toSeq,
    "FieldMapping" -> FieldMapping(outputFieldName = "o")
      .productElementNames.toSeq,
    "JoinOp" -> JoinOp(id = "j", `type` = "INNER_JOIN",
      enrichmentTopic = TopicConfig("t")).productElementNames.toSeq,
    "AsOfSpec" -> AsOfSpec("lt", "rt").productElementNames.toSeq,
    "OutputTopic" -> OutputTopic(name = "o").productElementNames.toSeq,
    "SnapshotSpec" -> SnapshotSpec(Seq("k"), Seq("v")).productElementNames.toSeq,
    "BranchSpec" -> BranchSpec("true", OutputTopic(name = "o"))
      .productElementNames.toSeq,
    "AggSpec" -> AggSpec().productElementNames.toSeq,
    "HistogramSpec" -> HistogramSpec("c", 0.0, 1.0, 1).productElementNames.toSeq,
    "EventTimeSpec" -> EventTimeSpec("ts", "1 hour").productElementNames.toSeq)
}
