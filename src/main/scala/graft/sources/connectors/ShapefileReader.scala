package graft.sources.connectors

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.time.LocalDate
import java.time.format.DateTimeFormatter

import scala.collection.immutable.IndexedSeq

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.geo.Geo
import graft.geo.Geo.{GMultiPolygon, GPoint, GPolygon, Geom, Pt, Ring}

/** S8 — pure-Scala ESRI shapefile decoder (.shp geometry + .dbf
  * attributes), closing the binary-decode seam the reference delegates
  * to geopandas/GDAL (src/ingestion/shapefile_fetcher.py:86-88 feeding
  * datasets/census_zctas_2020/transformer.py:27-45).
  *
  * Format is the public "ESRI Shapefile Technical Description" (1998):
  *   - .shp: 100-byte header (file code 9994 big-endian at 0, shape
  *     type little-endian at 32), then records of
  *     [recNum:int32 BE][contentWords:int32 BE][shape content LE].
  *   - Polygon content: bbox (4 doubles), numParts, numPoints,
  *     parts[numParts] (ring start indices), points[numPoints] (x,y).
  *     Ring orientation carries topology: clockwise = outer ring,
  *     counter-clockwise = hole of the enclosing outer.
  *   - .dbf (dBASE III): 32-byte header (record count LE at 4, header
  *     size LE at 8, record size LE at 10), 32-byte field descriptors
  *     terminated by 0x0D, then fixed-width text records each prefixed
  *     by a deletion-flag byte.
  *
  * Scope: shape types actually present in the reference's data —
  * Point (1) and Polygon (5, covering MultiPolygon: multiple outer
  * rings in one record), plus Null (0). Anything else fails loudly.
  *
  * Scale note: decode is driver-side, like the reference's geopandas
  * path — shapefiles are bounded artifacts (TIGER national ZCTAs
  * ≲1 GB), not the 100 TB fact data. The result lands in a DataFrame
  * immediately, so everything downstream is distributed.
  */
object ShapefileReader {

  // -------------------------------------------------------------------
  // .shp
  // -------------------------------------------------------------------

  /** Decode .shp bytes to one Option[Geom] per record (None = null shape). */
  def readShp(bytes: Array[Byte]): IndexedSeq[Option[Geom]] = {
    require(bytes.length >= 100, s"not a shapefile: ${bytes.length} bytes < 100-byte header")
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val fileCode = be.getInt(0)
    require(fileCode == 9994, s"bad .shp file code: $fileCode (want 9994)")
    val fileLenBytes = math.min(be.getInt(24).toLong * 2, bytes.length.toLong).toInt

    val out = IndexedSeq.newBuilder[Option[Geom]]
    var pos = 100
    while (pos + 8 <= fileLenBytes) {
      val contentWords = be.getInt(pos + 4) // record header: recNum, content length
      val contentStart = pos + 8
      val le = ByteBuffer.wrap(bytes, contentStart, contentWords * 2)
        .order(ByteOrder.LITTLE_ENDIAN)
      out += decodeShape(le)
      pos = contentStart + contentWords * 2
    }
    out.result()
  }

  private def decodeShape(b: ByteBuffer): Option[Geom] = b.getInt match {
    case 0 => None // null shape
    case 1 => Some(GPoint(b.getDouble, b.getDouble))
    case 5 =>
      b.position(b.position() + 32) // skip bbox
      val numParts = b.getInt
      val numPoints = b.getInt
      val parts = IndexedSeq.fill(numParts)(b.getInt)
      val pts = IndexedSeq.fill(numPoints)((b.getDouble, b.getDouble): Pt)
      val rings: IndexedSeq[Ring] = parts.zipWithIndex.map { case (start, i) =>
        val end = if (i + 1 < numParts) parts(i + 1) else numPoints
        pts.slice(start, end)
      }
      Some(assemblePolygons(rings))
    case t =>
      throw new IllegalArgumentException(
        s"unsupported shape type $t (supported: 0 null, 1 point, 5 polygon)")
  }

  /** Shoelace signed area; counter-clockwise rings are positive.
    * Includes the wrap-around last→first edge: zero for the
    * explicitly-closed rings the ESRI spec mandates (last == first),
    * but keeps orientation correct for a malformed unclosed ring
    * instead of silently misclassifying outer vs hole.
    */
  private[connectors] def signedArea(r: Ring): Double = {
    var s = 0.0
    var i = 0
    while (i < r.length) {
      val j = if (i + 1 < r.length) i + 1 else 0
      s += r(i)._1 * r(j)._2 - r(j)._1 * r(i)._2
      i += 1
    }
    s / 2.0
  }

  /** Even-odd ray cast: is p strictly inside ring? Delegates to the
    * shared Geo primitive so decoder hole-attachment and query-side
    * containment cannot drift.
    */
  private[connectors] def contains(ring: Ring, p: Pt): Boolean =
    Geo.ringCrossings(ring, p._1, p._2) % 2 == 1

  /** ESRI ring soup → Polygon/MultiPolygon: clockwise (area ≤ 0) rings
    * are outers; each hole attaches to the outer containing its first
    * vertex (first outer as lenient fallback for degenerate input).
    */
  private def assemblePolygons(rings: IndexedSeq[Ring]): Geom = {
    val (outers, holes) = rings.partition(r => signedArea(r) <= 0)
    if (outers.isEmpty) return GPolygon(rings) // degenerate: keep as-is
    val grouped = outers.map(o => (o, IndexedSeq.newBuilder[Ring]))
    holes.foreach { h =>
      val owner = grouped.find { case (o, _) => contains(o, h.head) }
        .getOrElse(grouped.head)
      owner._2 += h
    }
    val polys = grouped.map { case (o, hs) => o +: hs.result() }
    if (polys.length == 1) GPolygon(polys.head) else GMultiPolygon(polys)
  }

  // -------------------------------------------------------------------
  // .dbf
  // -------------------------------------------------------------------

  final case class DbfField(name: String, fieldType: Char, length: Int, decimals: Int)
  final case class DbfTable(fields: IndexedSeq[DbfField], rows: IndexedSeq[IndexedSeq[Any]])

  private val dbfDate = DateTimeFormatter.BASIC_ISO_DATE

  /** Decode dBASE III bytes. Deleted-flag bytes are ignored (record
    * positions must stay 1:1 with .shp records per the spec).
    */
  def readDbf(bytes: Array[Byte]): DbfTable = {
    require(bytes.length >= 32, s"not a .dbf: ${bytes.length} bytes < 32-byte header")
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val numRecords = le.getInt(4)
    val headerSize = le.getShort(8) & 0xffff
    val recordSize = le.getShort(10) & 0xffff

    val fields = IndexedSeq.newBuilder[DbfField]
    var off = 32
    while (off + 32 <= headerSize && bytes(off) != 0x0d) {
      val nameEnd = (off until off + 11).find(bytes(_) == 0).getOrElse(off + 11)
      val name = new String(bytes, off, nameEnd - off, StandardCharsets.ISO_8859_1)
      fields += DbfField(
        name = name,
        fieldType = bytes(off + 11).toChar,
        length = bytes(off + 16) & 0xff,
        decimals = bytes(off + 17) & 0xff)
      off += 32
    }
    val fs = fields.result()

    val rows = IndexedSeq.newBuilder[IndexedSeq[Any]]
    var rec = 0
    var pos = headerSize
    while (rec < numRecords && pos + recordSize <= bytes.length) {
      var fo = pos + 1 // skip deletion flag
      val row = fs.map { f =>
        val raw = new String(bytes, fo, f.length, StandardCharsets.ISO_8859_1).trim
        fo += f.length
        decodeField(f, raw)
      }
      rows += row
      rec += 1
      pos += recordSize
    }
    DbfTable(fs, rows.result())
  }

  private def decodeField(f: DbfField, raw: String): Any =
    if (raw.isEmpty || raw.forall(_ == '*')) null
    else f.fieldType match {
      case 'C' => raw
      // Decoded value must match sparkType(f) exactly or createDataFrame
      // rejects the row at materialization: 'F' is a float regardless of
      // the decimals byte; 'N' with decimals=0 is integral, but lenient
      // writers emit decimal text there — truncate rather than crash.
      case 'F' => raw.toDoubleOption.orNull
      case 'N' =>
        if (f.decimals > 0) raw.toDoubleOption.orNull
        else raw.toLongOption.orElse(raw.toDoubleOption.map(_.toLong)).orNull
      case 'D' =>
        try java.sql.Date.valueOf(LocalDate.parse(raw, dbfDate))
        catch { case _: Exception => null }
      case 'L' =>
        raw.head match {
          case 'Y' | 'y' | 'T' | 't' => java.lang.Boolean.TRUE
          case 'N' | 'n' | 'F' | 'f' => java.lang.Boolean.FALSE
          case _ => null
        }
      case _ => raw
    }

  private def sparkType(f: DbfField): DataType = f.fieldType match {
    case 'C' => StringType
    case 'F' => DoubleType
    case 'N' => if (f.decimals > 0) DoubleType else LongType
    case 'D' => DateType
    case 'L' => BooleanType
    case _ => StringType
  }

  // -------------------------------------------------------------------
  // Combined read → DataFrame
  // -------------------------------------------------------------------

  /** Read a .shp + sibling .dbf into (attrs…, geometry WKT) — the exact
    * shape geopandas.read_file hands the zctas transformer. Missing
    * .dbf yields a geometry-only frame.
    */
  def read(spark: SparkSession, shpPath: Path): DataFrame = {
    val geoms = readShp(Files.readAllBytes(shpPath))

    val dbfPath = shpPath.resolveSibling(
      shpPath.getFileName.toString.replaceAll("\\.shp$", ".dbf"))
    val dbf =
      if (Files.exists(dbfPath)) readDbf(Files.readAllBytes(dbfPath))
      else DbfTable(IndexedSeq.empty, IndexedSeq.fill(geoms.length)(IndexedSeq.empty))
    require(dbf.rows.length == geoms.length,
      s".dbf/.shp record mismatch: ${dbf.rows.length} vs ${geoms.length}")

    val schema = StructType(
      dbf.fields.map(f => StructField(f.name, sparkType(f), nullable = true)) :+
        StructField("geometry", StringType, nullable = true))
    val rows: java.util.List[Row] = new java.util.ArrayList[Row](geoms.length)
    geoms.indices.foreach { i =>
      rows.add(Row.fromSeq(dbf.rows(i) :+ geoms(i).map(Geo.toWkt).orNull))
    }
    spark.createDataFrame(rows, schema)
  }
}
