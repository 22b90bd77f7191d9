package graft

import java.awt.geom.Path2D

import org.apache.spark.sql.functions._

import graft.geo.Geo
import graft.queries.GeoQ

/** Ground truth for the grid spatial join on IRREGULAR shapes (the
  * oracle query only exercises axis-aligned squares): random triangles,
  * a polygon with a hole, and a two-part multipolygon, checked against
  * an INDEPENDENT containment implementation (java.awt.geom.Path2D
  * with even-odd winding) — not the engine's own ray cast.
  */
class SpatialJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def path(rings: Seq[Seq[(Double, Double)]]): Path2D.Double = {
    val p = new Path2D.Double(Path2D.WIND_EVEN_ODD)
    rings.foreach { r =>
      p.moveTo(r.head._1, r.head._2)
      r.tail.foreach { case (x, y) => p.lineTo(x, y) }
      p.closePath()
    }
    p
  }

  private def wkt(rings: Seq[Seq[(Double, Double)]]): String =
    rings.map(r => (r :+ r.head)
      .map { case (x, y) => s"$x $y" }.mkString("(", ", ", ")"))
      .mkString("POLYGON (", ", ", ")")

  test("grid join equals Path2D containment on triangles, holes, multipolygons") {
    val rng = new scala.util.Random(42)
    // 20 random triangles
    val triangles = (0 until 20).map { i =>
      val cx = rng.nextDouble() * 8
      val cy = rng.nextDouble() * 8
      val ring = Seq(
        (cx, cy), (cx + 1 + rng.nextDouble(), cy + rng.nextDouble()),
        (cx + rng.nextDouble(), cy + 1 + rng.nextDouble()))
      (i.toLong, Seq(ring))
    }
    // a square with a square hole, and a two-part multipolygon (as WKT)
    val donut = (100L, Seq(
      Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)),
      Seq((1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0))))
    val polys = triangles :+ donut
    val polyDf = polys.map { case (id, rings) => (id, wkt(rings)) }
      .toDF("poly_id", "wkt")
    val multiWkt = "MULTIPOLYGON (((6 6, 7 6, 7 7, 6 7, 6 6)), " +
      "((8 8, 9 8, 9 9, 8 9, 8 8)))"
    val allPolys = polyDf.union(Seq((200L, multiWkt)).toDF("poly_id", "wkt"))

    // 500 random points, nudged off any grid line
    val points = (0 until 500).map { i =>
      (i.toLong, rng.nextDouble() * 10 + 1e-7, rng.nextDouble() * 10 + 1e-7)
    }
    val pointDf = points.toDF("point_id", "x", "y")

    val got = GeoQ.pointInPolygonJoin(pointDf, allPolys, cellSize = 2.0)
      .select("point_id", "poly_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // independent ground truth
    val paths = polys.map { case (id, rings) => id -> path(rings) } ++ Seq(
      200L -> path(Seq(
        Seq((6.0, 6.0), (7.0, 6.0), (7.0, 7.0), (6.0, 7.0)),
        Seq((8.0, 8.0), (9.0, 8.0), (9.0, 9.0), (8.0, 9.0)))))
    val expected = (for {
      (pid, px, py) <- points
      (gid, g) <- paths
      if g.contains(px, py)
    } yield (pid, gid)).toSet

    assert(expected.nonEmpty, "fixture must produce containments")
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("donut hole is outside, shell is inside (even-odd parity)") {
    assert(Geo.parseWkt(
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))")
      .exists { g =>
        Geo.containsXY(g, 0.5, 0.5) && // in shell
        !Geo.containsXY(g, 2.0, 2.0) && // in hole
        !Geo.containsXY(g, 5.0, 5.0) // outside
      })
  }
}
