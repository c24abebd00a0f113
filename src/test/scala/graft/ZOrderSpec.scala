package graft

import org.apache.spark.sql.functions._
import graft.operators.Scale

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue reproduces the Morton sequence on a 4x4 grid") {
    val grid = for (y <- 0 until 4; x <- 0 until 4) yield (x, y)
    val got = grid.toDF("x", "y")
      .select(col("x"), col("y"), Scale.zValue(col("x"), col("y"), 2).as("z"))
      .orderBy("z")
      .as[(Int, Int, Long)].collect()
    // the canonical Morton walk (x in even bit positions)
    val want = Seq(
      (0, 0), (1, 0), (0, 1), (1, 1),
      (2, 0), (3, 0), (2, 1), (3, 1),
      (0, 2), (1, 2), (0, 3), (1, 3),
      (2, 2), (3, 2), (2, 3), (3, 3))
    assert(got.map(t => (t._1, t._2)).toSeq == want)
    assert(got.map(_._3).toSeq == (0L until 16L))
  }

  test("zValue is a bijection on the full 16x16 grid") {
    val grid = for (y <- 0 until 16; x <- 0 until 16) yield (x, y)
    val zs = grid.toDF("x", "y")
      .select(Scale.zValue(col("x"), col("y"), 4).as("z"))
      .as[Long].collect()
    assert(zs.distinct.length == 256 && zs.min == 0L && zs.max == 255L)
  }

  test("quantize maps the domain to cells and clamps outliers") {
    val got = Seq(-5.0, 0.0, 1999.0, 2000.0, 9999.0).toDF("v")
      .select(Scale.quantize(col("v"), 0.0, 2000.0, 3).as("c"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 7L, 7L, 7L)) // 8 cells over [0,2000), clamped
  }

  test("z-order layout prunes a 2-d box better than a lexicographic sort") {
    // one row per cell of a 16x16 grid, 16 cells per "file"
    val grid = (for (y <- 0 until 16; x <- 0 until 16) yield (x, y))
    def fileBoxes(order: Seq[(Int, Int)]): Seq[((Int, Int), (Int, Int))] =
      order.grouped(16).map { cells =>
        ((cells.map(_._1).min, cells.map(_._1).max),
          (cells.map(_._2).min, cells.map(_._2).max))
      }.toSeq
    val zOrder = grid.toDF("x", "y")
      .select(col("x"), col("y"), Scale.zValue(col("x"), col("y"), 4).as("z"))
      .orderBy("z").as[(Int, Int, Long)].collect().map(t => (t._1, t._2)).toSeq
    val lexOrder = grid.sortBy { case (x, y) => (x, y) }
    // files whose min/max stats intersect the box x,y in [0,7]
    def hit(boxes: Seq[((Int, Int), (Int, Int))]): Int = boxes.count {
      case ((x0, x1), (y0, y1)) => x0 <= 7 && x1 >= 0 && y0 <= 7 && y1 >= 0
    }
    val (zHits, lexHits) = (hit(fileBoxes(zOrder)), hit(fileBoxes(lexOrder)))
    assert(zHits == 4, s"z-order quadrant should span exactly 4/16 files, got $zHits")
    assert(lexHits == 8, s"lexicographic stripe spans 8/16 files, got $lexHits")
  }

  test("zorderWrite round-trips and clusters the files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val df = (for (y <- 0 until 16; x <- 0 until 16) yield (x, y)).toDF("x", "y")
    Scale.zorderWrite(df, col("x"), col("y"), bits = 4, files = 4, path = dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 256 && back.columns.sorted.toSeq == Seq("x", "y"))
    // no helper column leaks into the files
    assert(!back.columns.contains("__z"))
  }
}
