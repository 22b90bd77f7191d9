package graft

import graft.functions.GraftFunctions

/** The SQL surface: every registered engine function callable from
  * spark.sql with the same results as the DataFrame/Scala forms.
  */
class SqlSurfaceSpec extends SparkSpecBase {

  test("geometry codecs round-trip through pure SQL") {
    GraftFunctions.registerAll(spark)
    val row = spark.sql(
      """SELECT
        |  st_asgeojson('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))') AS gj,
        |  geojson_to_wkt('{"type":"Point","coordinates":[-73.98,40.75]}') AS wkt,
        |  st_multi('POLYGON ((0 0, 1 0, 1 1, 0 0))') AS multi,
        |  st_envelope_box('MULTIPOLYGON (((1 2, 5 2, 5 9, 1 9, 1 2)))') AS env
        |""".stripMargin).head
    assert(row.getAs[String]("gj") ==
      """{"type":"Polygon","coordinates":[[[0,0],[2,0],[2,2],[0,2],[0,0]]]}""")
    assert(row.getAs[String]("wkt") == "POINT (-73.98 40.75)")
    assert(row.getAs[String]("multi") == "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))")
    val env = row.getStruct(row.fieldIndex("env"))
    assert(env.getDouble(0) == 1.0 && env.getDouble(3) == 9.0)
  }

  test("text primitives work from SQL and agree with the Scala surface") {
    GraftFunctions.registerAll(spark)
    val row = spark.sql(
      """SELECT
        |  lang_id('der rat der stadt ist mit der planung nicht zufrieden') AS lang,
        |  simhash64(split('alpha beta gamma', ' ')) AS sim,
        |  size(minhash_sig(array('a b c', 'b c d'))) AS k,
        |  size(winnow_fingerprints('a reasonably long sentence for fingerprinting windows')) AS nfp,
        |  fast_cosine(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |              CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS cos
        |""".stripMargin).head
    assert(row.getAs[String]("lang") == "de")
    assert(row.getAs[Int]("k") == graft.functions.TextFunctions.minhashK)
    assert(row.getAs[Int]("nfp") > 0)
    assert(row.getAs[Double]("cos") == 1.0)
  }
}
