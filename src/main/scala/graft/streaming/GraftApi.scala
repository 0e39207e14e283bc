package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap

import graft.engine._
import graft.streaming.bus.GraftBus

/** The reference's HTTP API surface as a facade over the Spark-native
  * pieces — every route a reference deployment serves, with the same
  * semantics and the same `LHRPCResponse` wire envelope
  * (lhctl/lh_lib/schema/lh_rpc_response_schema.py:15-19; route
  * registration at GETApi.java:26-49, POSTApi.java:33-36,
  * WFRun.overridePostAPIEndpoints, WFRun.java:308-318):
  *
  *  - `POST /{Type}`            → [[postResource]] (validate + persist)
  *  - `DELETE /{Type}/{id}`     → [[deleteResource]]
  *  - `GET /{Type}/{id}`        → [[get]] (name-or-id fallback = Q8)
  *  - `GET /{Type}All`          → [[getAll]]
  *  - `GET /WFRun/{id}`         → [[getWfRun]] (SDK WFRunSchema shape)
  *  - `GET /WFRunAlias/{k}/{v}` → [[getWfRunAlias]] (Q2/Q9 search)
  *  - `POST /WFRun`             → [[postRun]]
  *  - `POST /externalEvent/{defId}/{wfRunId}` → [[postEvent]]
  *  - `POST /WFRun/stop/{wfRunId}/{tid}`      → [[postStop]]
  *  - `POST /WFRun/resume/{wfRunId}/{tid}`    → [[postResume]]
  *
  * HTTP itself is out of scope (the reference's Javalin server is
  * deployment plumbing Spark doesn't need); the METHODS are the API.
  * Run-state reads go through the per-spec state topics the scheduler
  * sink writes — the same documents a real consumer would read — OR,
  * when a [[CompactedStateStore]] is supplied, through its
  * base∪delta parquet (the RocksDB-compacted analogue, reference
  * SchedulerTopology.java:130-146): reads stay O(live runs) instead
  * of O(snapshot history) — measured at 1000 runs × 51 snapshots:
  * ~11× route-to-route (367 ms vs 4,023 ms p50 `GET /WFRun`), and
  * near-FLAT in history where the bus path grows ~6.5× per decade
  * (serve bench in [[graft.StreamBench]], BASELINE.md). A 24/7
  * deployment serves from the compacted store; the bus path is the
  * zero-infra variant for short-lived jobs and tests.
  */
class GraftApi(
    spark: SparkSession, store: MetadataStore, busRoot: String,
    compacted: Option[CompactedStateStore] = None,
    // Optional driver-side read-through cache over `compacted` (must
    // wrap the SAME store): GET /WFRun answers warm hits from memory
    // (microseconds) instead of launching a Spark job (~150-300 ms),
    // the reference's local-RocksDB locality bet made explicit. Miss
    // and Bypass both fall through to the distributed path, so wiring
    // the cache can only ever change LATENCY, never an answer.
    servingCache: Option[ServingCache] = None) {

  require(servingCache.forall(c => compacted.exists(_ eq c.store)),
    "servingCache must wrap the SAME CompactedStateStore passed as " +
      "`compacted` — a cache over a different store would serve answers " +
      "the distributed fallback path cannot reproduce")

  // ---- LHRPCResponse envelope (model field order) ----

  object RpcStatus {
    val OK = "OK"
    val VALIDATION_ERROR = "VALIDATION_ERROR"
    val OBJECT_NOT_FOUND = "OBJECT_NOT_FOUND"
    val INTERNAL_ERROR = "INTERNAL_ERROR"
  }

  private def response(
      status: String,
      objectId: Option[String] = None,
      result: Any = null,
      message: Option[String] = None): String =
    LHJson.render(ListMap[String, Any](
      "message" -> message.orNull,
      "status" -> status,
      "objectId" -> objectId.orNull,
      "result" -> result))

  /** Status of a rendered response (spec/test convenience). */
  def statusOf(responseJson: String): String =
    LHJson.parse(responseJson).asInstanceOf[ListMap[String, Any]]("status")
      .asInstanceOf[String]

  // ---- metadata routes ----

  /** POST /{Type}: decode + validate + persist; VALIDATION_ERROR with
    * the validator's message on a bad document, like POSTApi.post
    * (POSTApi.java:40-87). */
  def postResource(kind: String, json: String): String =
    try {
      val id = kind match {
        case store.Kind.WFSpec => store.postWfSpec(json).objectId
        case store.Kind.TaskDef => store.postTaskDef(json).objectId
        case store.Kind.ExternalEventDef =>
          store.postExternalEventDef(json).objectId
        case other =>
          return response(RpcStatus.VALIDATION_ERROR,
            message = Some(s"unknown resource type $other"))
      }
      response(RpcStatus.OK, Some(id), LHJson.parse(json))
    } catch {
      case e: SpecValidationError =>
        response(RpcStatus.VALIDATION_ERROR, message = Some(e.getMessage))
    }

  /** DELETE /{Type}/{id} (tombstone). */
  def deleteResource(kind: String, id: String): String = {
    if (store.getById(kind, id).isEmpty)
      response(RpcStatus.OBJECT_NOT_FOUND, Some(id))
    else { store.delete(kind, id); response(RpcStatus.OK, Some(id)) }
  }

  /** GET /{Type}/{id} with the reference's name-or-id fallback
    * (LHDatabaseClient.getByNameOrId). */
  def get(kind: String, key: String): String =
    store.getByNameOrId(kind, key) match {
      case Some(doc) => response(RpcStatus.OK, Some(key), LHJson.parse(doc))
      case None => response(RpcStatus.OBJECT_NOT_FOUND, Some(key))
    }

  /** GET /{Type}All. */
  def getAll(kind: String): String =
    response(RpcStatus.OK, None, store.getAllIds(kind).sorted.toVector)

  // ---- run-state routes (read the scheduler's state topics) ----

  /** The scheduler's run-state topics as a DISTRIBUTED frame: the
    * `graft-bus` DSv2 batch read — the same topics a real consumer
    * reads, scanned executor-side (one input partition per
    * topic-partition), never iterated on the driver. A `key` point
    * lookup is applied BEFORE the select so it pushes into the scan
    * ([[graft.streaming.bus.BusScanBuilder]]): the partition readers
    * skip non-matching records at the source and only the requested
    * run's snapshots ever become rows. */
  private[graft] def snapshotFrame(
      key: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val raw = spark.read.format("graft-bus")
      .option("path", busRoot)
      .option("subscribePattern",
        java.util.regex.Pattern.quote(Scheduler.STATE_TOPIC_PREFIX) + ".*")
      .load()
    val pruned = key.fold(raw)(k =>
      raw.filter(col("key") === lit(k.getBytes("UTF-8"))))
    pruned.select(
      col("key").cast("string").as("wfRunId"),
      col("value").cast("string").as("json"),
      col("offset").as("seq"),
      col("topic"))
  }

  /** Latest snapshot per run: the compacted store's base∪delta when
    * one is supplied (already latest-folded, files touched O(live
    * runs)), else the latest-fold over the distributed bus batch read.
    * A point-lookup `key` prunes BEFORE the fold either way — through
    * parquet predicate pushdown (the wfRunId filter passes through the
    * latest window because it IS the window's partition key) or the
    * bus scan's key pushdown. */
  private def latestFrame(key: Option[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    compacted match {
      case Some(c) =>
        // an empty store (API up before the first snapshot lands) must
        // answer like the bus path: NOT_FOUND / empty, never a crash
        if (c.readFootprint.isEmpty) {
          import spark.implicits._
          Seq.empty[(String, String)].toDF("wfRunId", "json")
        } else {
          val base = c.read(spark)
          key.fold(base)(k => base.filter(col("wfRunId") === k))
        }
      case None => StateTable.latest(snapshotFrame(key))
    }
  }

  /** Key-pruned point lookup frame (spec hook for plan assertions). */
  private[graft] def latestSnapshotFrame(wfRunId: String): DataFrame =
    latestFrame(Some(wfRunId))

  /** Collects at most one row: (snapshot json, spec name). The spec
    * name comes from whichever column the frame carries without a
    * JSON decode — the state topic name (`wfRunState__<specName>`) on
    * the bus path, the scheduler's `wfSpecName` column on a
    * scheduler-written compacted store — falling back to the decoded
    * snapshot. */
  private def latestSnapshot(wfRunId: String): Option[(String, String)] = {
    // cache fast path: a Hit IS the store's latest snapshot (the cache
    // re-validates against the store's published file set on every
    // lookup, so read-your-writes holds); Miss/Bypass → distributed
    servingCache.foreach { c =>
      c.lookup(spark, wfRunId) match {
        case ServingCache.Hit(json, spec) => return Some((json, spec))
        case _ => // fall through
      }
    }
    val frame = latestFrame(Some(wfRunId))
    val cols = frame.columns.toSet
    if (cols.contains("topic"))
      frame.select("json", "topic").collect().headOption.map(r =>
        (r.getString(0),
          r.getString(1).stripPrefix(Scheduler.STATE_TOPIC_PREFIX)))
    else if (cols.contains("wfSpecName"))
      frame.select("json", "wfSpecName").collect().headOption.map(r =>
        (r.getString(0), r.getString(1)))
    else
      frame.select("json").collect().headOption.map { r =>
        val json = r.getString(0)
        (json, StateCodec.decode(json).wfSpecName)
      }
  }

  /** Resolve a deployed WFSpec by name via the metadata store's point
    * lookup (Q8) — never a full deployed-spec scan per request. */
  private def specByName(name: String): Option[WFSpec] =
    store.getByNameOrId(store.Kind.WFSpec, name).map(SpecCodec.decode)

  /** GET /WFRun/{id}: the latest snapshot, exported in the SDK's
    * serialized WFRunSchema shape so lhctl-family tooling reads it
    * unchanged. Read path: key-pruned scan (at most one row
    * collected) + one metadata point lookup for the spec. */
  def getWfRun(id: String): String =
    latestSnapshot(id) match {
      case Some((json, specName)) =>
        val st = StateCodec.decode(json)
        specByName(specName) match {
          case Some(spec) => response(RpcStatus.OK, Some(id),
            LHJson.parse(StateCodec.encodeSdk(st, spec)))
          case None => response(RpcStatus.INTERNAL_ERROR, Some(id),
            message = Some(s"spec $specName not deployed"))
        }
      case None => response(RpcStatus.OBJECT_NOT_FOUND, Some(id))
    }

  /** GET /WFRunAlias/{key}/{value}: Q2/Q9 variable search — every
    * String-valued variable is an index alias (WFRun.getAliases).
    * The predicate evaluates DISTRIBUTED (columnar over the `aliases`
    * map column when the frame carries one); only matching run ids
    * (bounded by matches) reach the driver. */
  def getWfRunAlias(key: String, value: String): String = {
    import spark.implicits._
    val ids = StateTable
      .searchByVariable(latestFrame(None), key, value)
      .as[String].collect().sorted.toVector
    response(RpcStatus.OK, None, ids)
  }

  // ---- run-lifecycle routes (produce to the spec's event topic) ----

  private def eventTopic(spec: WFSpec) = s"wfEvents__${spec.name}"

  private def now() = System.currentTimeMillis()

  /** Read-your-writes barrier wired into the POST routes (reference:
    * POSTApi blocks inside the request, POSTApi.java:53-58): when a
    * scheduler [[org.apache.spark.sql.streaming.StreamingQuery]] is
    * supplied, a produce-route response is withheld until the scheduler
    * has committed past the produced record — so POST-then-GET observes
    * the write with no manual barrier call. */
  private def awaitIfRequested(
      await: Option[org.apache.spark.sql.streaming.StreamingQuery],
      topic: String, partition: Int, offset: Long, timeoutMs: Long): Unit =
    await.foreach(q =>
      ReadYourWrites.awaitProcessed(q, topic, partition, offset, 0, timeoutMs))

  /** POST /WFRun: resolve the spec (name-or-id), produce
    * WF_RUN_STARTED. Returns the new run id as objectId. With `await`,
    * blocks until the scheduler has processed the event (the
    * reference's synchronous-write contract). */
  def postRun(
      wfSpecKey: String,
      variables: ListMap[String, Any] = ListMap.empty,
      wfRunId: Option[String] = None,
      await: Option[org.apache.spark.sql.streaming.StreamingQuery] = None,
      timeoutMs: Long = 30000L): String =
    store.getByNameOrId(store.Kind.WFSpec, wfSpecKey) match {
      case None => response(RpcStatus.OBJECT_NOT_FOUND, Some(wfSpecKey))
      case Some(doc) =>
        val spec = SpecCodec.decode(doc)
        val runId = wfRunId.getOrElse(
          java.util.UUID.randomUUID().toString.replace("-", ""))
        val (part, off) = GraftBus.send(busRoot, eventTopic(spec), runId,
          EventCodec.encodeWFEvent(WFEvent(
            spec.objectId, spec.name, runId, now(), 0,
            WFEventType.WF_RUN_STARTED,
            EventCodec.encodeRunRequest(
              WFRunRequest(variables, spec.objectId, Some(runId))))))
        awaitIfRequested(await, eventTopic(spec), part, off, timeoutMs)
        response(RpcStatus.OK, Some(runId))
    }

  /** POST /externalEvent/{externalEventDefId}/{wfRunId}: wrap the
    * payload in the ExternalEventPayload envelope, broadcast threadId
    * -1 (WFRunApiStuff.postEvent). The def is validated against the
    * registered ExternalEventDefs (unknown def → OBJECT_NOT_FOUND,
    * like the reference resolving the def before posting) and the
    * resolved name is used for `externalEventDefName`; the run's spec
    * comes from its state topic + a metadata point lookup. */
  def postEvent(externalEventDefId: String, wfRunId: String,
      content: Any,
      await: Option[org.apache.spark.sql.streaming.StreamingQuery] = None,
      timeoutMs: Long = 30000L): String =
    store.getByNameOrId(
        store.Kind.ExternalEventDef, externalEventDefId) match {
      case None =>
        response(RpcStatus.OBJECT_NOT_FOUND, Some(externalEventDefId),
          message = Some(s"no ExternalEventDef $externalEventDefId"))
      case Some(defDoc) =>
        val eed = ResourceCodec.decodeExternalEventDef(defDoc)
        latestSnapshot(wfRunId) match {
          case None => response(RpcStatus.OBJECT_NOT_FOUND, Some(wfRunId))
          case Some((_, specName)) =>
            specByName(specName) match {
              case None => response(RpcStatus.INTERNAL_ERROR, Some(wfRunId),
                message = Some(s"spec $specName not deployed"))
              case Some(spec) =>
                val t = now()
                val (part, off) = GraftBus.send(
                  busRoot, eventTopic(spec), wfRunId,
                  EventCodec.encodeWFEvent(WFEvent(
                    spec.objectId, spec.name, wfRunId, t, -1,
                    WFEventType.EXTERNAL_EVENT,
                    EventCodec.encodeExternalEvent(ExternalEventPayload(
                      externalEventDefId, eed.name, content, t)))))
                awaitIfRequested(await, eventTopic(spec), part, off, timeoutMs)
                response(RpcStatus.OK, Some(wfRunId))
            }
        }
    }

  private def lifecycle(
      wfRunId: String, tid: Int, evType: String,
      await: Option[org.apache.spark.sql.streaming.StreamingQuery],
      timeoutMs: Long): String =
    latestSnapshot(wfRunId) match {
      case None => response(RpcStatus.OBJECT_NOT_FOUND, Some(wfRunId))
      case Some((_, specName)) =>
        specByName(specName) match {
          case None => response(RpcStatus.INTERNAL_ERROR, Some(wfRunId),
            message = Some(s"spec $specName not deployed"))
          case Some(spec) =>
            val (part, off) = GraftBus.send(busRoot, eventTopic(spec), wfRunId,
              EventCodec.encodeWFEvent(WFEvent(
                spec.objectId, spec.name, wfRunId, now(), tid, evType, "")))
            awaitIfRequested(await, eventTopic(spec), part, off, timeoutMs)
            response(RpcStatus.OK, Some(wfRunId))
        }
    }

  /** POST /WFRun/stop/{wfRunId}/{tid}. */
  def postStop(wfRunId: String, tid: Int,
      await: Option[org.apache.spark.sql.streaming.StreamingQuery] = None,
      timeoutMs: Long = 30000L): String =
    lifecycle(wfRunId, tid, WFEventType.WF_RUN_STOP_REQUEST, await, timeoutMs)

  /** POST /WFRun/resume/{wfRunId}/{tid}. */
  def postResume(wfRunId: String, tid: Int,
      await: Option[org.apache.spark.sql.streaming.StreamingQuery] = None,
      timeoutMs: Long = 30000L): String =
    lifecycle(wfRunId, tid, WFEventType.WF_RUN_RESUME_REQUEST, await,
      timeoutMs)

  /** GET /{Type}Offset/{id}/{offset}/{partition} — the read-your-writes
    * barrier route (GETApi.waitForProcessing,
    * APIStreamsContext.waitForProcessing:168-222): block until the
    * scheduler has committed past (partition, offset) on `topic`, so a
    * subsequent GET observes the write that produced that record. OK
    * once processed; INTERNAL_ERROR with a message on timeout. */
  def waitForProcessing(
      query: org.apache.spark.sql.streaming.StreamingQuery,
      topic: String, partition: Int, offset: Long,
      timeoutMs: Long = 30000L): String =
    try {
      ReadYourWrites.awaitProcessed(query, topic, partition, offset, 0,
        timeoutMs)
      response(RpcStatus.OK)
    } catch {
      case e: Exception =>
        response(RpcStatus.INTERNAL_ERROR, message = Some(e.getMessage))
    }

  /** GET /{Type}AliasSet/{aliasKey}/{aliasValue} for metadata
    * resources — whose only alias is `{name: name}`
    * (GETable.getAliases:142-149), so the route is a name lookup
    * returning every matching id. */
  def getAliasSet(kind: String, aliasKey: String, aliasValue: String): String = {
    if (aliasKey != "name")
      response(RpcStatus.OK, None, Vector.empty[String])
    else
      response(RpcStatus.OK, None,
        store.idsByName(kind, aliasValue).toVector)
  }
}
