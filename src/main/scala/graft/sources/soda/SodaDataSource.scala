package graft.sources.soda

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.connectors.{HttpClient, SodaConnector}

/** S1/S2 as a native DataSource V2 source: `spark.read.format("soda")`.
  *
  * The reference pushes its WHERE clause into the remote SoQL query by
  * hand (nyc_open_data_fetcher.py:64-77); here the SAME pushdown is a
  * Catalyst contract — [[SodaScanBuilder]] implements
  * `SupportsPushDownFilters` (equality predicates compile to SoQL and
  * never reach Spark) and `SupportsPushDownRequiredColumns` (the
  * pruned projection compiles to SoQL `SELECT a, b` — the server never
  * serializes unread fields — and only those fields materialize into
  * rows). `df.filter($"year" === "2023").select("nta")` therefore
  * sends `SELECT nta WHERE year = '2023'` and builds one-column
  * InternalRows, with every non-equality predicate left as a residual
  * Spark filter.
  *
  * Schema: SODA JSON is schemaless — a user schema is required
  * (all-StringType; typing happens in the transform chains, SURVEY
  * §1.3). The paged protocol is serial, so the scan plans ONE input
  * partition; parallelism comes from everything downstream of the
  * exchange. HTTP is injected via [[SodaHttp]] (offline container:
  * specs install stubs; a cluster deploy binds a real client
  * per-executor).
  */
class SodaDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "soda"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "SODA responses are schemaless JSON — supply .schema(...) (all string columns)")

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new SodaTable(schema, properties.asScala.toMap)
}

/** Per-JVM HTTP binding for the source (DSv2 instantiates providers
  * reflectively, so constructor injection isn't available).
  */
object SodaHttp {
  @volatile var client: HttpClient = new HttpClient {
    override def get(url: String, params: Map[String, String]) =
      throw new IllegalStateException(
        "no HTTP client bound (zero-egress environment) — set SodaHttp.client")
    override def post(url: String, jsonBody: String) = get(url, Map.empty)
  }
}

final class SodaTable(schema: StructType, props: Map[String, String])
    extends Table with SupportsRead {

  require(props.contains("datasetid" ) || props.contains("datasetId"),
    "option 'datasetId' is required")
  require(schema.fields.forall(_.dataType == StringType),
    "SODA schemas are all-string (typing happens in transformers)")

  private def datasetId: String =
    props.getOrElse("datasetid", props("datasetId"))

  override def name(): String = s"soda:$datasetId"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SodaScanBuilder(schema, datasetId,
      Option(options.get("baseUrl")).orElse(Option(options.get("baseurl"))),
      Option(options.get("pageSize")).orElse(Option(options.get("pagesize")))
        .map(_.toInt).getOrElse(1000))
}

final class SodaScanBuilder(fullSchema: StructType, datasetId: String,
                            baseUrl: Option[String], pageSize: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema

  /** Equality on a known column → SoQL WHERE (S2); everything else is
    * Spark's residual.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition {
      case EqualTo(attr, _) => fullSchema.fieldNames.contains(attr)
      case _ => false
    }
    pushed = supported
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val soqlFilters = pushed.collect { case EqualTo(a, v) => a -> v }.toMap
    // Pruned projection travels to the server as SoQL `SELECT a, b`
    // (the reference always sends `SELECT *`, fetcher.py:64-77 — remote
    // narrowing is strictly less payload). An all-columns scan keeps
    // the reference's literal `SELECT *`; an empty requirement (pure
    // COUNT) still needs row multiplicity, so fetch one narrow column.
    val select: Seq[String] =
      if (required == fullSchema) Nil
      else if (required.fields.isEmpty) fullSchema.fieldNames.toSeq.take(1)
      else required.fieldNames.toSeq
    new SodaScan(required, datasetId, baseUrl, pageSize, soqlFilters, select)
  }
}

final class SodaScan(schema: StructType, datasetId: String,
                     baseUrl: Option[String], pageSize: Int,
                     filters: Map[String, Any],
                     select: Seq[String]) extends Scan with Batch {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  // one partition: the paged SODA protocol is inherently serial
  override def planInputPartitions(): Array[InputPartition] =
    Array(new InputPartition {})

  override def createReaderFactory(): PartitionReaderFactory = {
    val s = schema; val id = datasetId; val base = baseUrl
    val ps = pageSize; val fs = filters; val sel = select
    (_: InputPartition) => new PartitionReader[InternalRow] {
      private val connector = base
        .map(b => new SodaConnector(SodaHttp.client, b, ps))
        .getOrElse(new SodaConnector(SodaHttp.client, pageSize = ps))
      private val rows = connector.fetchRows(id, fs, sel).iterator
      private var current: Map[String, String] = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow =
        InternalRow.fromSeq(s.fieldNames.toIndexedSeq.map(f =>
          current.get(f).map(UTF8String.fromString).orNull))
      override def close(): Unit = ()
    }
  }
}
