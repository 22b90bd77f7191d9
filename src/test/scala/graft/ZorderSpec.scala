package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_layout_zorder: the per-file layout plan must
  * equal an independent driver-side re-derivation (test-local Morton
  * interleave, sort, cut), and the layout must actually cluster — the
  * point of Z-ordering is that BOTH dimensions' per-file footprints
  * shrink versus a corpus-wide span.
  */
class ZorderSpec extends SparkSpecBase {
  import spark.implicits._

  /** Test-local reimplementation of the 16-bit interleave — written
    * from the Morton definition, not shared with the engine, so a
    * transcription bug in either shows up as a mismatch.
    */
  private def morton(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i + 1)
      z |= ((y >> i) & 1L) << (2 * i)
      i += 1
    }
    z
  }

  /** 32768 deterministic rows over a 1009 x 997 key space -> 8 full
    * 4096-row files.
    */
  private lazy val plantedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("zorder_fix").toString
    val rows = (0 until 32768).map { i =>
      val part = (i.toLong * 2654435761L) % 1009
      val day = (i.toLong * 7919L) % 997
      (i.toLong, part, 1, day)
    }
    rows.toDF("l_orderkey", "l_partkey", "l_linenumber", "day")
      .withColumn("l_shipdate", timestamp_seconds(col("day") * 86400L))
      .select("l_orderkey", "l_partkey", "l_linenumber", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  private case class FileStat(nRows: Long, pMin: Long, pMax: Long,
                              dMin: Long, dMax: Long)

  private def expectedStats(rows: Seq[(Long, Long, Long)]): Map[Long, FileStat] = {
    // rows: (orderkey, part, day)
    val pMin = rows.map(_._2).min; val pMax = rows.map(_._2).max
    val dMin = rows.map(_._3).min; val dMax = rows.map(_._3).max
    val ranked = rows.map { case (k, p, d) =>
      val x = (p - pMin) * 65535L / math.max(pMax - pMin, 1L)
      val y = (d - dMin) * 65535L / math.max(dMax - dMin, 1L)
      (morton(x, y), k, p, d)
    }.sortBy(t => (t._1, t._2)).zipWithIndex
    ranked.groupBy { case (_, rk) => rk.toLong >> 12 }.map { case (f, g) =>
      f -> FileStat(g.size.toLong,
        g.map(_._1._3).min, g.map(_._1._3).max,
        g.map(_._1._4).min, g.map(_._1._4).max)
    }
  }

  test("planted 32k rows: per-file stats equal the reference Morton sort") {
    val out = SparkEntry.queries("q_layout_zorder")(spark, plantedDir).collect()
    val planted = (0 until 32768).map { i =>
      (i.toLong, (i.toLong * 2654435761L) % 1009, (i.toLong * 7919L) % 997)
    }
    val expected = expectedStats(planted)
    assert(out.length == expected.size)
    out.foreach { r =>
      val e = expected(r.getLong(0))
      assert(r.getLong(1) == e.nRows, s"file ${r.getLong(0)} n_rows")
      assert(r.getLong(2) == e.pMin && r.getLong(3) == e.pMax,
        s"file ${r.getLong(0)} part bounds")
      assert(r.getLong(4) == e.dMin && r.getLong(5) == e.dMax,
        s"file ${r.getLong(0)} day bounds")
      assert(r.getLong(6) == e.pMax - e.pMin && r.getLong(7) == e.dMax - e.dMin)
    }
  }

  test("clustering quality: both dimensions' mean per-file span beat the global span") {
    val out = SparkEntry.queries("q_layout_zorder")(spark, plantedDir).collect()
    val gPart = out.map(_.getLong(3)).max - out.map(_.getLong(2)).min
    val gDay = out.map(_.getLong(5)).max - out.map(_.getLong(4)).min
    val meanPartSpan = out.map(_.getLong(6)).sum.toDouble / out.length
    val meanDaySpan = out.map(_.getLong(7)).sum.toDouble / out.length
    assert(meanPartSpan < 0.75 * gPart,
      s"part not clustered: mean $meanPartSpan vs global $gPart")
    assert(meanDaySpan < 0.75 * gDay,
      s"day not clustered: mean $meanDaySpan vs global $gDay")
  }

  test("skip stats: probes admit a strict subset on both dimensions") {
    val out = SparkEntry.queries("q_layout_skip_stats")(spark, plantedDir).collect()
    assert(out.length == 12)
    out.foreach { r =>
      val (nFiles, nAdm, ratio) = (r.getLong(4), r.getLong(5), r.getDouble(6))
      assert(nAdm >= 0L && nAdm <= nFiles)
      assert(ratio == 1.0 - nAdm.toDouble / nFiles)
    }
    // the point of the layout: probes on EITHER dimension skip files
    val byKind = out.groupBy(_.getString(1))
    Seq("part_point", "day_range").foreach { kind =>
      val mean = byKind(kind).map(_.getDouble(6)).sum / byKind(kind).length
      assert(mean > 0.2, s"$kind probes skip too little (mean $mean)")
    }
  }

  test("corpus run: files are contiguous 4096-row cuts covering every row") {
    val out = SparkEntry.queries("q_layout_zorder")(spark, sfDir).collect()
    val total = graft.sources.Tables.lineitem(spark, sfDir).count()
    assert(out.map(_.getLong(1)).sum == total)
    assert(out.map(_.getLong(0)).toSeq == out.indices.map(_.toLong),
      "file ids must be dense from 0")
    out.dropRight(1).foreach(r => assert(r.getLong(1) == 4096L))
  }
}
