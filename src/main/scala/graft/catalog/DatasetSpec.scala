package graft.catalog

import org.apache.spark.sql.types._

/** Declarative per-column schema + validation metadata — the engine
  * mirror of the reference's Pydantic `ColumnSchema`
  * (src/config/models.py:14-22): SQL type string, required flag,
  * primary key, max_length, min/max range rules.
  */
final case class ColumnSpec(
    name: String,
    sqlType: String,
    required: Boolean = false,
    primaryKey: Boolean = false,
    maxLength: Option[Int] = None,
    min: Option[Double] = None,
    max: Option[Double] = None,
    default: Option[String] = None)

/** Validation block (models.py:25-28). */
final case class ValidationRules(
    allowDuplicates: Boolean = true,
    uniqueKeys: Seq[String] = Nil)

/** One registered dataset (models.py:65-102 + registry.yaml): identity,
  * source type, declared schema, validation rules, indexes.
  */
final case class DatasetSpec(
    key: String,
    datasetId: String,
    tableName: String,
    sourceType: String,
    columns: Seq[ColumnSpec],
    validation: ValidationRules = ValidationRules(),
    indexes: Seq[(String, Seq[String])] = Nil,
    uniqueConstraints: Seq[Seq[String]] = Nil,
    partitionColumns: Seq[String] = Nil) {
  def column(name: String): Option[ColumnSpec] = columns.find(_.name == name)
  def requiredColumns: Seq[String] = columns.filter(_.required).map(_.name)
}

/** SQL-type-string → Spark type compiler + DDL generator (K3) — the
  * engine mirror of storage.py:73-183's SQLAlchemy table builder.
  *
  * Runtime mapping follows SURVEY §1.2: SERIAL→surrogate (storage
  * detail, IntegerType in flight), FLOAT→DoubleType, DATE→DateType,
  * GEOMETRY→StringType carrying WKT (SRID pinned 4326, §7.4). The DDL
  * side preserves the reference's *widening* quirks (FLOAT→NUMERIC,
  * DATE→TIMESTAMP, storage.py:91-92) so generated DDL matches what the
  * reference would create.
  */
object SchemaCompiler {

  private val TypeWithArgs = """(?s)([A-Za-z]+)\s*\((.*)\)""".r

  /** Parse a declared SQL type string into the in-flight Spark type. */
  def toSparkType(sqlType: String): DataType = sqlType.trim.toUpperCase match {
    case "INTEGER" | "SERIAL" => IntegerType
    case "TEXT" | "STRING" => StringType
    case "FLOAT" => DoubleType
    case "DATE" => DateType
    case "TIMESTAMP" => TimestampType
    // bare NUMERIC (no precision — the YAML logical "numeric",
    // food config.yaml): pandas to_numeric yields float64 in flight
    case "NUMERIC" => DoubleType
    case TypeWithArgs(base, args) => base match {
      case "VARCHAR" => StringType
      case "NUMERIC" =>
        val ps = args.split(",").map(_.trim.toInt)
        DecimalType(ps(0), if (ps.length > 1) ps(1) else 0)
      case "GEOMETRY" => StringType // WKT in flight (§7.4)
      case _ => StringType
    }
    case "VARCHAR" => StringType
    case other =>
      // config files also use lowercase logical names ("integer",
      // "string", "numeric" — food config.yaml:10-62)
      other.toLowerCase match {
        case "integer" => IntegerType
        case "numeric" => DoubleType
        case _ => StringType
      }
  }

  def toStructType(spec: DatasetSpec): StructType =
    StructType(spec.columns.map { c =>
      StructField(c.name, toSparkType(c.sqlType), nullable = !c.required)
    })

  /** DDL-side type rendering, preserving the reference's widenings
    * (storage.py:86-96): FLOAT→NUMERIC, DATE→TIMESTAMP, SERIAL kept
    * (Postgres auto-increment), logical lowercase names normalized.
    */
  def toDdlType(sqlType: String): String = sqlType.trim.toUpperCase match {
    case "FLOAT" => "NUMERIC"
    case "DATE" => "TIMESTAMP"
    case "INTEGER" | "SERIAL" | "TEXT" | "TIMESTAMP" | "NUMERIC" | "VARCHAR" => sqlType.trim.toUpperCase
    case t if t.startsWith("VARCHAR") || t.startsWith("NUMERIC") => t
    case t if t.startsWith("GEOMETRY") =>
      // GEOMETRY('MULTIPOLYGON', srid=4326) → GEOMETRY(MULTIPOLYGON, 4326)
      val TypeWithArgs(_, args) = t: @unchecked
      val parts = args.split(",").map(_.trim.stripPrefix("'").stripSuffix("'"))
      val geomType = parts(0).replaceAll("['\"]", "")
      val srid = parts.drop(1).headOption
        .map(_.toLowerCase.replace("srid=", "").trim).getOrElse("4326")
      s"GEOMETRY($geomType, $srid)"
    case t => t
  }

  /** K3 — CREATE TABLE + CREATE INDEX statements from the spec
    * (storage.py:73-183): primary keys, NOT NULL for required, server
    * defaults, named indexes, uq_<table>_<cols> unique constraints.
    */
  def toDdl(spec: DatasetSpec): Seq[String] = {
    val colDefs = spec.columns.map { c =>
      val base = s"  ${c.name} ${toDdlType(c.sqlType)}"
      val notNull = if (c.required && !c.primaryKey) " NOT NULL" else ""
      val default = c.default.map(d => s" DEFAULT $d").getOrElse("")
      base + notNull + default
    }
    val pks = spec.columns.filter(_.primaryKey).map(_.name)
    val pkClause =
      if (pks.isEmpty) Nil else Seq(s"  PRIMARY KEY (${pks.mkString(", ")})")
    val uqClauses = spec.uniqueConstraints.map { cols =>
      s"  CONSTRAINT uq_${spec.tableName}_${cols.mkString("_")} UNIQUE (${cols.mkString(", ")})"
    }
    val create =
      s"CREATE TABLE IF NOT EXISTS ${spec.tableName} (\n" +
        (colDefs ++ pkClause ++ uqClauses).mkString(",\n") + "\n)"
    val indexes = spec.indexes.map { case (name, cols) =>
      s"CREATE INDEX IF NOT EXISTS $name ON ${spec.tableName} (${cols.mkString(", ")})"
    }
    create +: indexes
  }
}
