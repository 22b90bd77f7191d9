package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{Registry, SchemaCompiler}

/** K3 — type-string parsing, StructType compilation, and DDL generation
  * (engine mirror of storage.py:73-183).
  */
class SchemaCompilerSpec extends AnyFunSuite {

  test("SQL type strings map to the documented Spark types (SURVEY §1.2)") {
    assert(SchemaCompiler.toSparkType("INTEGER") == IntegerType)
    assert(SchemaCompiler.toSparkType("SERIAL") == IntegerType)
    assert(SchemaCompiler.toSparkType("VARCHAR(20)") == StringType)
    assert(SchemaCompiler.toSparkType("TEXT") == StringType)
    assert(SchemaCompiler.toSparkType("NUMERIC(12, 2)") == DecimalType(12, 2))
    assert(SchemaCompiler.toSparkType("NUMERIC(5,2)") == DecimalType(5, 2))
    assert(SchemaCompiler.toSparkType("FLOAT") == DoubleType)
    assert(SchemaCompiler.toSparkType("DATE") == DateType)
    assert(SchemaCompiler.toSparkType("TIMESTAMP") == TimestampType)
    // geometry travels as WKT strings (§7.4)
    assert(SchemaCompiler.toSparkType("GEOMETRY('MULTIPOLYGON', srid=4326)") == StringType)
    // lowercase logical names from the YAML configs (food config.yaml);
    // bare NUMERIC = pandas float64 in flight
    assert(SchemaCompiler.toSparkType("integer") == IntegerType)
    assert(SchemaCompiler.toSparkType("numeric") == DoubleType)
    assert(SchemaCompiler.toSparkType("NUMERIC") == DoubleType)
    assert(SchemaCompiler.toSparkType("string") == StringType)
  }

  test("toStructType: required columns are non-nullable") {
    val st = SchemaCompiler.toStructType(Registry.foodSupplyGap)
    assert(st.fieldNames.head == "year")
    assert(!st("year").nullable)
    assert(st("nta_name").nullable)
    assert(st("supply_gap_lbs").dataType == DecimalType(12, 2))
  }

  test("DDL preserves the reference's widening quirks (storage.py:86-96)") {
    assert(SchemaCompiler.toDdlType("FLOAT") == "NUMERIC")
    assert(SchemaCompiler.toDdlType("DATE") == "TIMESTAMP")
    assert(SchemaCompiler.toDdlType("VARCHAR(20)") == "VARCHAR(20)")
    assert(SchemaCompiler.toDdlType("GEOMETRY('MULTIPOLYGON', srid=4326)") ==
      "GEOMETRY(MULTIPOLYGON, 4326)")
  }

  test("toDdl emits CREATE TABLE with PK, NOT NULL, defaults, UNIQUE, and indexes") {
    val ddl = SchemaCompiler.toDdl(Registry.foodSupplyGap)
    val create = ddl.head
    assert(create.startsWith("CREATE TABLE IF NOT EXISTS food_supply_gaps"))
    assert(create.contains("year INTEGER NOT NULL"))
    assert(create.contains("ingestion_timestamp TIMESTAMP NOT NULL DEFAULT CURRENT_TIMESTAMP"))
    assert(create.contains(
      "CONSTRAINT uq_food_supply_gaps_dataset_id_year_nta_code UNIQUE (dataset_id, year, nta_code)"))
    assert(ddl.exists(_ ==
      "CREATE INDEX IF NOT EXISTS idx_dataset_year ON food_supply_gaps (dataset_id, year)"))
    assert(ddl.size == 4) // create + 3 indexes
  }

  test("toDdl renders primary keys (census_acs composite pk)") {
    val create = SchemaCompiler.toDdl(Registry.censusAcs).head
    assert(create.contains("PRIMARY KEY (zip_code, year)"))
  }

  test("all five registered datasets compile to schemas") {
    assert(Registry.all.size == 5)
    Registry.all.values.foreach { spec =>
      val st = SchemaCompiler.toStructType(spec)
      assert(st.fields.nonEmpty, spec.key)
      assert(SchemaCompiler.toDdl(spec).head.contains(spec.tableName))
    }
  }
}
