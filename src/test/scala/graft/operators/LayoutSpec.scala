package graft.operators

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  // the full 4x4 grid: with bounds 0..3 and 2 bits per dim, the cell IS
  // the value, so every Morton code is checkable by hand
  private def grid = (for (x <- 0L to 3L; y <- 0L to 3L) yield (x, y))
    .toDF("x", "y")

  test("zorderLayout: hand-checked Morton codes and quadrant buckets on " +
      "the 4x4 grid") {
    val out = rows(Layout.zorderLayout(grid, "x", "y",
      nBuckets = 4, bitsPerDim = 2).orderBy("x", "y"))
      .map(r => ((r(0).asInstanceOf[Long], r(1).asInstanceOf[Long]),
        (r(2), r(3)))).toMap
    // interleave: x bits at even positions, y bits at odd
    assert(out((0L, 0L)) == ((0L, 0L)))
    assert(out((1L, 0L)) == ((1L, 0L)))
    assert(out((0L, 1L)) == ((2L, 0L)))
    assert(out((3L, 1L)) == ((7L, 1L)))   // x=11 -> 5, y=01 -> 2
    assert(out((2L, 0L)) == ((4L, 1L)))   // right-bottom quadrant
    assert(out((0L, 2L)) == ((8L, 2L)))   // left-top quadrant
    assert(out((3L, 3L)) == ((15L, 3L)))  // last cell of the curve
    // buckets are exactly the four quadrants
    for (((x, y), (_, b)) <- out)
      assert(b == (if (x < 2) 0L else 1L) + (if (y < 2) 0L else 2L))
  }

  test("zorderStats: every bucket's envelope spans half of EACH " +
      "dimension — the pruning guarantee a single-column sort lacks") {
    val out = rows(Layout.zorderStats(grid, "x", "y",
      nBuckets = 4, bitsPerDim = 2).orderBy("bucket"))
    assert(out.map(_(0)) == Seq(0L, 1L, 2L, 3L))
    for (r <- out) {
      assert(r(1) == 4L)                                // 4 rows per quadrant
      assert(r(3).asInstanceOf[Long] - r(2).asInstanceOf[Long] == 1L) // x span
      assert(r(5).asInstanceOf[Long] - r(4).asInstanceOf[Long] == 1L) // y span
    }
  }

  test("zorderLayout: constant column degenerates to cell 0, not a " +
      "divide-by-zero") {
    val df = Seq((5L, 7L), (5L, 9L)).toDF("x", "y")
    val out = rows(Layout.zorderLayout(df, "x", "y",
      nBuckets = 4, bitsPerDim = 2).orderBy("y"))
    // x range is a point -> cx = 0 for all rows; y still spreads:
    // bounds 7..9, 4 cells: y=7 -> cell 0 (zval 0), y=9 -> cell
    // (2*4) div 3 = 2, whose bit 1 interleaves to position 3 -> zval 8
    assert(out.map(_(2)) == Seq(0L, 8L))
  }

  test("zorderLayout rejects a bucket count that is not an aligned Z square") {
    intercept[IllegalArgumentException] {
      Layout.zorderLayout(grid, "x", "y", nBuckets = 8, bitsPerDim = 2)
    }
    intercept[IllegalArgumentException] {
      Layout.zorderLayout(grid, "x", "y", nBuckets = 64, bitsPerDim = 2)
    }
  }

  test("hilbertLayout: bijection, neighbor locality, quadrant buckets on " +
      "the 4x4 grid") {
    val out = rows(Layout.hilbertLayout(grid, "x", "y",
      nBuckets = 4, bitsPerDim = 2).orderBy("hval"))
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long],
        r(2).asInstanceOf[Long], r(3).asInstanceOf[Long]))
    // the 16 codes are a bijection of the grid
    assert(out.map(_._3) == (0L to 15L))
    // THE Hilbert property Morton lacks: consecutive curve positions are
    // always grid neighbors (Manhattan distance exactly 1)
    out.sliding(2).foreach { case Seq((x1, y1, _, _), (x2, y2, _, _)) =>
      assert((x1 - x2).abs + (y1 - y2).abs == 1)
    }
    // curve starts at the origin corner and each quadrant is one bucket
    assert(out.head._1 == 0L && out.head._2 == 0L)
    for ((x, y, _, b) <- out)
      assert(out.filter(o => o._1 / 2 == x / 2 && o._2 / 2 == y / 2)
        .map(_._4).distinct == Seq(b))
  }

  test("hilbertStats: every bucket envelope spans half of each dimension") {
    val out = rows(Layout.hilbertStats(grid, "x", "y",
      nBuckets = 4, bitsPerDim = 2).orderBy("bucket"))
    assert(out.map(_(0)) == Seq(0L, 1L, 2L, 3L))
    for (r <- out) {
      assert(r(1) == 4L)
      assert(r(3).asInstanceOf[Long] - r(2).asInstanceOf[Long] == 1L)
      assert(r(5).asInstanceOf[Long] - r(4).asInstanceOf[Long] == 1L)
    }
  }
}
