package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.{ExternalEventDef, ResourceCodec, SpecCodec,
  SpecValidationError, TaskDef, WFSpec}

/** Metadata-resource store (SURVEY.md §2.5 Q1/Q4/Q6/Q8 + §2.1 S4):
  * CRUD for WFSpec / TaskDef / ExternalEventDef documents.
  *
  * Storage mirrors the reference's compacted per-resource "ID topics"
  * (GETable.java:37-41,124-140): an append-only parquet log of
  * `(kind, id, name, json, deleted, seq)` where the latest record per
  * id wins and a delete is a tombstone. Reads compact at query time
  * (latest-per-id window); at scale this is a Delta MERGE instead.
  *
  * Writes are synchronous (parquet append completes before `post`
  * returns), which gives the read-your-writes guarantee the reference
  * implements with its offset-polling barrier
  * (APIStreamsContext.waitForProcessing:168-222, Q5).
  */
class MetadataStore(spark: SparkSession, rootDir: String) {
  import spark.implicits._

  private val path = s"$rootDir/metadata_log"
  private val seq = new java.util.concurrent.atomic.AtomicLong(
    System.currentTimeMillis())

  object Kind {
    val WFSpec = "wfSpec"
    val TaskDef = "taskDef"
    val ExternalEventDef = "externalEventDef"
  }

  private def append(kind: String, id: String, name: String, json: String,
      deleted: Boolean): Unit = {
    Seq((kind, id, name, json, deleted, seq.incrementAndGet()))
      .toDF("kind", "id", "name", "json", "deleted", "seq")
      .write.mode("append").parquet(path)
  }

  /** POST a WFSpec document: validate (WFSpec.validate parity —
    * entrypoints, edge endpoints, node-type checks, recursive variable
    * scoping) then persist. Throws SpecValidationError on bad specs,
    * mirroring the reference's 400 response (POSTApi.post:40-87). */
  def postWfSpec(json: String): WFSpec = {
    val spec = SpecCodec.decode(json) // validates
    append(Kind.WFSpec, spec.objectId, spec.name, json, deleted = false)
    spec
  }

  /** POST a TaskDef / ExternalEventDef (opaque JSON documents keyed by
    * name — the reference validates little beyond identity). */
  def postResource(kind: String, id: String, name: String, json: String): Unit =
    append(kind, id, name, json, deleted = false)

  /** POST a TaskDef wire document (TaskDefSchema shape): decode +
    * validate, then persist under id = name (TaskDef.getObjectId,
    * TaskDef.java:36). Returns the decoded resource. */
  def postTaskDef(json: String): TaskDef = {
    val td = ResourceCodec.decodeTaskDef(json)
    append(Kind.TaskDef, td.objectId, td.name, json, deleted = false)
    td
  }

  /** POST an ExternalEventDef wire document (ExternalEventDefSchema
    * shape), id = name (ExternalEventDef.java:14). */
  def postExternalEventDef(json: String): ExternalEventDef = {
    val ed = ResourceCodec.decodeExternalEventDef(json)
    append(Kind.ExternalEventDef, ed.objectId, ed.name, json, deleted = false)
    ed
  }

  /** DELETE = tombstone (the reference produces a null record to the ID
    * topic, GETable.sendNullRecord:134-140). */
  def delete(kind: String, id: String): Unit =
    append(kind, id, "", "", deleted = true)

  /** The compacted view: latest record per (kind, id), tombstones
    * dropped. */
  def table(): DataFrame = {
    val w = Window.partitionBy($"kind", $"id").orderBy($"seq".desc)
    spark.read.parquet(path)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && !$"deleted")
      .drop("rn", "deleted")
  }

  /** Q1: point lookup by id. */
  def getById(kind: String, id: String): Option[String] =
    table().filter($"kind" === kind && $"id" === id)
      .select($"json").as[String].collect().headOption

  /** Q8: lookup by id, falling back to the latest record with that name
    * (LHDatabaseClient.getByNameOrId, LHDatabaseClient.java:22-45). */
  def getByNameOrId(kind: String, key: String): Option[String] = {
    getById(kind, key).orElse {
      table().filter($"kind" === kind && $"name" === key)
        .orderBy($"seq".desc)
        .select($"json").as[String].collect().headOption
    }
  }

  /** Q4: scan all ids of a resource type. */
  def getAllIds(kind: String): Seq[String] =
    table().filter($"kind" === kind).select($"id").as[String].collect().toSeq

  /** Q6 deploy surface: the deployed-spec map handed to the multiplexed
    * streaming scheduler ([[Scheduler.apply]]). Deploying a WFSpec =
    * the next (re)start of the streaming query picks it up — one query
    * serves every spec, replacing the reference's scheduler-process-
    * per-WFSpec (WFSpec.deploy, WFSpec.java:263-272). */
  def deployedSpecs(): Map[String, WFSpec] =
    table().filter($"kind" === Kind.WFSpec)
      .select($"json").as[String].collect()
      .map(SpecCodec.decode)
      .map(sp => sp.name -> sp)
      .toMap
}
