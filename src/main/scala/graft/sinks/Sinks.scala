package graft.sinks

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.{OutputTopic, PipelineSpec}
import graft.pipeline.Interpreter
import graft.sources.SourceResolver

/** Sink layer — R15 (topic write) + R18 (topic provisioning/DDL).
  *
  * The reference provisions the output Kafka topic via AdminClient with
  * partitions/replication/retention and `cleanup.policy=compact` when
  * `retentionMs == -1` (service/TopicProvisioner.java:22-55), then writes with
  * config-resolved serdes (DynamicTopologyBuilder.java:61-74). Batch-mode
  * analogue: a table directory with a descriptor file; compaction ≅ the sink
  * being a latest-per-key table, partitions ≅ output file parallelism.
  * Kafka-mode streaming uses graft.streaming.KafkaSink (same record shape).
  */
trait TopicProvisioner {
  def provision(topic: OutputTopic): Unit
}

/** Filesystem provisioner: creates the table dir and writes a descriptor
  * capturing the reference's topic DDL knobs (tolerates pre-existence, like
  * TopicProvisioner.java:48-53 tolerates TopicExistsException).
  */
class DirProvisioner(baseDir: String) extends TopicProvisioner {
  override def provision(topic: OutputTopic): Unit = {
    val dir = Paths.get(baseDir, topic.name)
    Files.createDirectories(dir)
    val compacted = topic.retentionMs.contains(-1L)
    val desc =
      s"""{"name":"${topic.name}","partitions":${topic.partitions.getOrElse(3)},
         |"replicationFactor":${topic.replicationFactor.getOrElse(1: Short)},
         |"retentionMs":${topic.retentionMs.getOrElse(-2L)},"compacted":$compacted}"""
        .stripMargin.replace("\n", "")
    Files.writeString(dir.resolve("_graft_topic.json"), desc)
  }
}

/** Minimal admin SPI the Kafka provisioner drives. Separating "what to
  * provision" (KafkaTopicProvisioner, unit-testable) from "how to reach a
  * broker" (this trait) lets the provisioning logic be tested without
  * kafka-clients on the classpath — absent in this environment — while
  * [[TopicAdmin.reflective]] binds to the real AdminClient when a deployment
  * has the connector jars.
  */
trait TopicAdmin extends AutoCloseable {
  /** Create the topic; implementations MUST tolerate an already-existing
    * topic (the reference swallows TopicExistsException,
    * TopicProvisioner.java:48-53).
    */
  def createTopic(name: String, partitions: Int, replicationFactor: Short,
      configs: Map[String, String]): Unit
}

object TopicAdmin {
  /** Reflective binding to org.apache.kafka.clients.admin.AdminClient, so the
    * engine itself carries no kafka-clients dependency. Only callable in a
    * deployment with the Kafka client jars on the runtime classpath.
    */
  def reflective(bootstrapServers: String): TopicAdmin = new TopicAdmin {
    private val adminClass = Class.forName("org.apache.kafka.clients.admin.AdminClient")
    private val newTopicClass = Class.forName("org.apache.kafka.clients.admin.NewTopic")
    private val client = {
      val props = new java.util.Properties()
      props.put("bootstrap.servers", bootstrapServers)
      adminClass.getMethod("create", classOf[java.util.Properties]).invoke(null, props)
    }
    override def createTopic(name: String, partitions: Int, replicationFactor: Short,
        configs: Map[String, String]): Unit = {
      val nt = newTopicClass
        .getConstructor(classOf[String], java.lang.Integer.TYPE, java.lang.Short.TYPE)
        .newInstance(name, Int.box(partitions), Short.box(replicationFactor))
      newTopicClass.getMethod("configs", classOf[java.util.Map[_, _]])
        .invoke(nt, scala.jdk.CollectionConverters.MapHasAsJava(configs).asJava)
      val result = adminClass.getMethod("createTopics", classOf[java.util.Collection[_]])
        .invoke(client, java.util.List.of(nt))
      try {
        val fut = result.getClass.getMethod("all").invoke(result)
        fut.getClass.getMethod("get").invoke(fut)
      } catch {
        // reflective invocation wraps the KafkaFuture's ExecutionException;
        // walk the cause chain for the tolerated already-exists case
        case e: Throwable
            if Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
              .exists(_.getClass.getName.endsWith("TopicExistsException")) => ()
      }
    }
    override def close(): Unit = adminClass.getMethod("close").invoke(client)
  }
}

/** Kafka topic provisioner ≅ service/TopicProvisioner.java:22-55: partitions
  * and replication from the output-topic config (reference defaults 3 / 1),
  * `retention.ms` from retentionMs, and retentionMs == -1 → a compacted
  * topic (`cleanup.policy=compact`) instead of a retention setting.
  */
class KafkaTopicProvisioner(admin: () => TopicAdmin) extends TopicProvisioner {
  override def provision(topic: OutputTopic): Unit = {
    val configs =
      if (topic.retentionMs.contains(-1L)) Map("cleanup.policy" -> "compact")
      else topic.retentionMs.map(ms => "retention.ms" -> ms.toString).toMap
    val a = admin()
    try a.createTopic(topic.name, topic.partitions.getOrElse(3),
      topic.replicationFactor.getOrElse(1: Short), configs)
    finally a.close()
  }
}

object BatchSink {
  /** R15: write the pipeline output in Kafka record shape (key string +
    * JSON value) honoring the declared partition count. Gated on
    * `outputTopic.enabled` like DynamicTopologyBuilder.java:62.
    */
  def write(df: DataFrame, topic: OutputTopic, baseDir: String,
      provisioner: TopicProvisioner): Boolean = {
    if (!topic.enabled) return false
    provisioner.provision(topic)
    val shaped = Interpreter.toKafkaShape(df)
    val parts = topic.partitions.getOrElse(3)
    shaped.repartition(parts)
      .write.mode("overwrite").parquet(s"$baseDir/${topic.name}/data")
    true
  }

  /** KTable write side: apply a changelog batch to a stored parquet
    * snapshot — union existing + changes, keep latest-per-key, swap the
    * result in. Spark cannot overwrite a path it is reading, so the merge
    * writes to a staging directory and renames: the old snapshot stays
    * readable until the atomic-within-a-filesystem swap. First call (no
    * snapshot yet) just materializes the changes' latest view. Returns the
    * resulting snapshot row count. Snapshot cost is one latest-per-key
    * shuffle over |snapshot| + |changes| — at recurring cadence on 100 TB
    * prefer PARTITIONING the snapshot (e.g. by key range or date) and
    * merging only partitions the delta touches.
    */
  def upsertSnapshot(spark: org.apache.spark.sql.SparkSession, path: String,
      changes: DataFrame, keys: Seq[String], orderCols: Seq[String]): Long = {
    import org.apache.hadoop.fs.{Path => HPath}
    // Hadoop FileSystem API, not java.nio: the snapshot lives wherever
    // Spark writes (hdfs://, s3a://, file:) — local-only path ops would
    // silently treat a remote snapshot as absent and clobber it
    val cur = new HPath(path)
    val fs = cur.getFileSystem(spark.sessionState.newHadoopConf())
    val aside = new HPath(path + ".old")
    val staging = new HPath(path + ".staging")
    // crash recovery BEFORE reading: a previous swap may have moved the
    // snapshot aside without installing its replacement (crash between the
    // two renames) — restore it; an aside left AFTER a completed install is
    // just the prior version, dropped
    if (!fs.exists(cur) && fs.exists(aside))
      require(fs.rename(aside, cur), s"cannot restore $aside to $cur")
    if (fs.exists(aside)) fs.delete(aside, true)
    val merged =
      if (fs.exists(cur))
        graft.sources.Tables.latestPerKey(
          spark.read.parquet(path).unionByName(changes), keys, orderCols)
      else
        graft.sources.Tables.latestPerKey(changes, keys, orderCols)
    merged.write.mode("overwrite").parquet(staging.toString)
    val n = spark.read.parquet(staging.toString).count()
    // swap via two renames (atomic per rename on HDFS-like filesystems;
    // object stores want a manifest-based table format instead): the old
    // snapshot is moved ASIDE, never deleted before its replacement exists,
    // so every crash point leaves either cur or aside recoverable above.
    // Replaying the same batch after any crash re-merges the same versions
    // to the same result (last-write-wins idempotence).
    if (fs.exists(cur))
      require(fs.rename(cur, aside), s"cannot move $cur aside")
    require(fs.rename(staging, cur), s"cannot install $staging as $cur")
    fs.delete(aside, true)
    n
  }
}

/** End-to-end batch pipeline runner: spec → plan → sink (the full
  * buildAggregationTopology + start lifecycle in batch mode). `branches`
  * fan the output out to predicate-routed topics (KStream.split analogue);
  * the main outputTopic and every branch write from ONE built plan — the
  * pipeline computes once, each sink adds only its filter.
  */
object PipelineRunner {
  def runBatch(spark: SparkSession, spec: PipelineSpec, sources: SourceResolver,
      outBase: String): Seq[String] = {
    val df0 = Interpreter.build(spark, spec, sources)
    val enabledBranches = spec.branches.filter(_.outputTopic.enabled)
    // more than one sink consumes the same built frame → persist for the
    // fan-out (a derived frame recomputes per consuming action otherwise)
    val fanOut = enabledBranches.nonEmpty && spec.outputTopic.exists(_.enabled)
    val df = if (fanOut || enabledBranches.size > 1)
      df0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else df0
    try {
      val provisioner = new DirProvisioner(outBase)
      val main = spec.outputTopic.filter(_.enabled).map { topic =>
        BatchSink.write(df, topic, outBase, provisioner)
        s"$outBase/${topic.name}/data"
      }
      val branched = enabledBranches.map { b =>
        BatchSink.write(df.filter(org.apache.spark.sql.functions.expr(b.predicate)),
          b.outputTopic, outBase, provisioner)
        s"$outBase/${b.outputTopic.name}/data"
      }
      main.toSeq ++ branched
    } finally if (df ne df0) { df.unpersist(); () }
  }
}

/** R13 peek: the reference logs every record pass-through
  * (DynamicTopologyBuilder.java:51-55). Row-level logging is an anti-pattern
  * at any scale; the Spark-native observe() metric channel gives the same
  * "what flowed through here" signal for free (one aggregate per task, no
  * per-row cost, no plan change).
  */
object Peek {
  /** Attach a named observation counting rows (and null keys, the reference's
    * recurring debug concern). Read `obs.get` after an action completes.
    */
  def observed(df: DataFrame, name: String): (DataFrame, Observation) = {
    val obs = new Observation(name)
    val keyed = df.columns.contains(Interpreter.KeyCol)
    val metrics =
      if (keyed) Seq(count(lit(1)).as("rows"),
        count(when(col(Interpreter.KeyCol).isNull, 1)).as("null_keys"))
      else Seq(count(lit(1)).as("rows"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
