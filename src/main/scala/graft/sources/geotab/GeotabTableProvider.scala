package graft.sources.geotab

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** DataSource V2 connector for the Geotab entity streams:
  * `spark.read.format("geotab").option("entity", "user"|"device"|"deviceInfo")`.
  *
  * Reproduces the reference's source behaviors as connector capabilities:
  *  - predicate pushdown into the JSON-RPC `search` payload — `isDriver`
  *    for User (task.ts:175-177, CHANGELOG v2.6.0) and group membership for
  *    Device (task.ts:198-202, CHANGELOG v2.5.0) — via
  *    SupportsPushDownFilters;
  *  - `excludeUntrackedAssets:true` always sent for Device (task.ts:194);
  *  - schema-level column pruning ("only grabs relevantish fields",
  *    task.ts:38) via SupportsPushDownRequiredColumns;
  *  - session reuse with validate-on-use + re-login (task.ts:127-143,
  *    297-324) via GeotabSessionCache;
  *  - FAILFAST schema validation like `req.typed()` (task.ts:161-163): a
  *    malformed row throws rather than nulling out.
  *
  * Scale note: the JSON-RPC API returns one result set per call, so an
  * unfiltered scan is a single partition per entity (like the reference's
  * one fetch) and the three entity scans parallelize across tasks. A pushed
  * group-membership predicate shards the scan — one input partition (= one
  * concurrent API call) per group id — so fleet-of-fleets reads scale with
  * the group count instead of one serial fetch; see
  * [[GeotabScan.planInputPartitions]].
  */
class GeotabTableProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "geotab"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GeotabTableProvider.schemaFor(options.get("entity"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GeotabTable(schema, properties.asScala.toMap)
}

object GeotabTableProvider {
  import graft.geotab.GeotabSchemas

  def schemaFor(entity: String): StructType = entity match {
    case "user" => GeotabSchemas.driver.add("isDriver", BooleanType)
    // `group` is exposed so group-membership predicates can push into the
    // API search payload (task.ts:198-202)
    case "device" => GeotabSchemas.device.add("group", StringType)
    case "deviceInfo" | null => GeotabSchemas.deviceInfo
    case other => throw new IllegalArgumentException(s"unknown entity '$other'")
  }

  def typeNameFor(entity: String): String = entity match {
    case "user" => "User"
    case "device" => "Device"
    case _ => "DeviceStatusInfo"
  }
}

class GeotabTable(schema: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"geotab/${props.getOrElse("entity", "deviceInfo")}"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GeotabScanBuilder(schema, props)
}

class GeotabScanBuilder(fullSchema: StructType, props: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private val entity = props.getOrElse("entity", "deviceInfo")
  private var pushed: Array[Filter] = Array.empty
  private var prunedSchema: StructType = fullSchema

  /** Translate Catalyst filters to the API's `search` payload. isDriver is
    * exact server-side (fully consumed); group predicates are pushed
    * PARTIALLY — they shard the fetch, but the API's membership search may
    * return supersets (multi-group membership, hierarchies), so they are
    * also returned as residual filters for Spark to re-apply. That keeps
    * the scan an optimization, never a semantics change. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case EqualTo("isDriver", true) if entity == "user" => true
      case EqualTo("group", _: String) if entity == "device" => true
      case In("group", vs) if entity == "device" && vs.nonEmpty => true
      case _ => false
    }
    pushed = supported
    val residualGroups = supported.filter {
      case EqualTo("group", _) | In("group", _) => true
      case _ => false
    }
    rest ++ residualGroups
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // API-level projection: only declared fields are materialized
    prunedSchema = requiredSchema
  }

  override def build(): Scan = {
    val search = scala.collection.mutable.Map[String, String]()
    if (entity == "device") search += ("excludeUntrackedAssets" -> "true") // task.ts:194
    // A conjunction of pushed group predicates (`group = 'g1' AND group IN
    // (...)`) constrains rows to the INTERSECTION of the group sets — each
    // predicate was claimed as fully consumed, so folding them any other way
    // (e.g. last-write-wins) silently widens the result. An empty
    // intersection is a contradiction: the scan must return zero rows, not
    // fall back to an unfiltered fetch.
    var groupSets: List[Set[String]] = Nil
    pushed.foreach {
      case EqualTo("isDriver", true) => search += ("isDriver" -> "true")
      case EqualTo("group", g: String) => groupSets ::= Set(g)
      case In("group", vs) => groupSets ::= vs.map(_.toString).toSet
      case _ =>
    }
    val groupShards: Seq[String] =
      if (groupSets.isEmpty) Nil else groupSets.reduce(_ intersect _).toSeq.sorted
    val contradiction = groupSets.nonEmpty && groupShards.isEmpty
    new GeotabScan(prunedSchema, entity, search.toMap, groupShards, contradiction, props)
  }
}

class GeotabScan(schema: StructType, entity: String,
                 search: Map[String, String], groupShards: Seq[String],
                 contradiction: Boolean,
                 props: Map[String, String])
    extends Scan with Batch with SupportsReportPartitioning {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  /** A group-sharded scan is clustered by `group` BY CONSTRUCTION: each
    * reader enforces exact key ownership — it emits only non-null rows
    * whose own `group` equals its shard key, dropping membership
    * over-fetch (other-shard, out-of-set, and null-group rows) at the
    * source. The clustering property therefore holds for ANY consumer of
    * the scan, not just ones downstream of the residual group filter.
    * Reporting KeyGroupedPartitioning lets a per-group aggregation or a
    * join on `group` run with NO Exchange after the scan (with
    * spark.sql.sources.v2.bucketing.enabled); each partition also exposes
    * its key via HasPartitionKey. */
  override def outputPartitioning(): partitioning.Partitioning =
    if (!contradiction && groupShards.nonEmpty && schema.fieldNames.contains("group"))
      new partitioning.KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions.identity("group")),
        groupShards.size)
    else
      new partitioning.UnknownPartitioning(
        if (contradiction) 0 else math.max(groupShards.size, 1))
  override def description(): String =
    s"GeotabScan(entity=$entity, search=$search, shards=${groupShards.mkString("|")}, " +
      s"empty=$contradiction, columns=${schema.fieldNames.mkString(",")})"

  /** Group-sharded parallel fetch: a pushed group-membership predicate
    * becomes one input partition PER group id, so N groups fetch as N
    * concurrent API calls (the distributed generalization of the
    * reference's single `groups:[{id}]` search, task.ts:198-202, and of
    * its Promise.all request parallelism, CHANGELOG v2.9.0). No groups →
    * the API's one-result-set-per-call shape: a single partition. A
    * contradictory group conjunction → zero partitions. */
  override def planInputPartitions(): Array[InputPartition] =
    GeotabScan.shardPartitions(entity, search, groupShards, contradiction)

  override def createReaderFactory(): PartitionReaderFactory =
    new GeotabReaderFactory(schema, props)

  /** Streaming read: each advance of the client's snapshot version fires a
    * micro-batch that re-polls the API — the reference's scheduled-Lambda
    * cadence (task.ts:106-107) under engine-managed triggers. */
  override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream =
    new GeotabMicroBatchStream(schema, entity, search, groupShards, contradiction, props)
}

object GeotabScan {
  def shardPartitions(entity: String, search: Map[String, String],
                      groupShards: Seq[String],
                      contradiction: Boolean): Array[InputPartition] =
    if (contradiction) Array.empty
    else if (groupShards.isEmpty) Array(GeotabInputPartition(entity, search))
    else groupShards.map(g =>
      GeotabInputPartition(entity, search + ("groups" -> g)): InputPartition).toArray
}

case class GeotabOffset(version: Long) extends streaming.Offset {
  override def json(): String = version.toString
}

class GeotabMicroBatchStream(schema: StructType, entity: String,
                             search: Map[String, String],
                             groupShards: Seq[String],
                             contradiction: Boolean,
                             props: Map[String, String])
    extends streaming.MicroBatchStream
    with streaming.SupportsTriggerAvailableNow {
  private def client = GeotabClients(props.getOrElse("client", "default"))

  /** Trigger.AvailableNow contract: pin the snapshot version at trigger
    * time, drain up to it, stop — one "scheduled run" of the reference
    * (task.ts:106-107) per trigger, with data arriving mid-drain left for
    * the next run. */
  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(client.dataVersion)

  override def initialOffset(): streaming.Offset = GeotabOffset(0L)
  override def latestOffset(): streaming.Offset =
    GeotabOffset(availableNowCap.getOrElse(client.dataVersion))
  // admission-control variant (SupportsTriggerAvailableNow extends it); the
  // API snapshot is atomic, so no rate limit applies — same answer
  override def latestOffset(start: streaming.Offset,
                            limit: streaming.ReadLimit): streaming.Offset =
    latestOffset()
  override def deserializeOffset(json: String): streaming.Offset =
    GeotabOffset(json.toLong)
  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: streaming.Offset,
                                   end: streaming.Offset): Array[InputPartition] =
    GeotabScan.shardPartitions(entity, search, groupShards, contradiction)

  override def createReaderFactory(): PartitionReaderFactory =
    new GeotabReaderFactory(schema, props)
}

case class GeotabInputPartition(entity: String, search: Map[String, String])
  extends InputPartition with HasPartitionKey {
  /** The shard's group id — consulted by Spark only when the scan reports
    * KeyGroupedPartitioning (i.e. when group-sharded). */
  override def partitionKey(): InternalRow =
    InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(
      search.getOrElse("groups", "")))
}

class GeotabReaderFactory(schema: StructType, props: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GeotabInputPartition]
    new GeotabPartitionReader(schema, p, props)
  }
}

class GeotabPartitionReader(schema: StructType, partition: GeotabInputPartition,
                            props: Map[String, String])
    extends PartitionReader[InternalRow] {

  private val clientName = props.getOrElse("client", "default")

  // Strict key ownership (owner-shard rule): with one fetch per pushed
  // group, the API's membership search can return rows the shard does not
  // own — devices whose primary group is another pushed shard's (that shard
  // fetches them itself), devices matched hierarchically whose primary
  // group is outside the pushed set, and null-group rows. Each shard keeps
  // ONLY non-null rows whose own `group` equals its shard key. This is
  // exactly the clustering the scan advertises via KeyGroupedPartitioning,
  // so the property holds for any consumer — it does not depend on the
  // residual group filter Spark re-applies (group predicates are partially
  // pushed; the residual is now redundant but harmless). Query results are
  // unchanged: every row dropped here would fail that residual predicate.
  private val sharded = partition.search.contains("groups")
  private val myGroup = partition.search.getOrElse("groups", "")
  // the parse schema must carry `group` even when the projection pruned it
  private val parseSchema =
    if (sharded && !schema.fieldNames.contains("group"))
      schema.add("group", StringType)
    else schema
  private val groupOrdinal =
    if (sharded) parseSchema.fieldIndex("group") else -1
  // project appended parse-only fields back off before emitting
  private val project: InternalRow => InternalRow =
    if (parseSchema eq schema) identity
    else {
      val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
        schema.indices.map(i => org.apache.spark.sql.catalyst.expressions.BoundReference(
          i, schema(i).dataType, schema(i).nullable)))
      r => proj(r)
    }

  private def ownedByThisShard(row: InternalRow): Boolean = {
    if (!sharded) return true
    if (row.isNullAt(groupOrdinal)) return false
    row.getUTF8String(groupOrdinal).toString == myGroup
  }

  /** One fetch with the reference's two recovery paths (task.ts:297-324):
    * an expired-session rejection re-resolves credentials through the
    * validate-on-use cache — which re-logins exactly because the server
    * no longer validates the old session — and retries once; a transient
    * 503 retries with the SAME session under short exponential backoff
    * (the g09 submit-side discipline on the ingest side). Anything past
    * the budgets propagates: the scan fails loudly, never half-fetches. */
  private def fetchWithRecovery(): Seq[String] = {
    val db = props.getOrElse("database", "db")
    val user = props.getOrElse("user", "user")
    val pw = props.getOrElse("password", "")
    var reauthLeft = 1
    var transientLeft = 3
    var backoffMs = 50L
    while (true) {
      val creds = GeotabSessionCache.credentials(clientName, db, user, pw)
      try return GeotabClients(clientName)
        .get(GeotabTableProvider.typeNameFor(partition.entity), partition.search, creds)
      catch {
        case _: GeotabSessionExpiredException if reauthLeft > 0 =>
          reauthLeft -= 1 // next credentials() re-validates and re-logins
        case _: GeotabTransientException if transientLeft > 0 =>
          transientLeft -= 1
          Thread.sleep(backoffMs)
          backoffMs *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private lazy val rows: Iterator[InternalRow] = {
    val raw = fetchWithRecovery()
    // FAILFAST JSON deserialize — the req.typed() analogue (task.ts:161-163)
    val parser = new JacksonParser(parseSchema,
      new JSONOptions(Map("mode" -> "FAILFAST"), "UTC"),
      allowArrayAsStructs = false)
    raw.iterator.flatMap(json =>
      parser.parse(json, CreateJacksonParser.string, org.apache.spark.unsafe.types.UTF8String.fromString))
      .filter(ownedByThisShard)
      .map(project)
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
