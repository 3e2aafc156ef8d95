package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The two properties that make [[ZOrder.hilbertD]] a Hilbert index:
  * it is a BIJECTION of the grid, and curve-consecutive cells are always
  * GRID NEIGHBORS (Manhattan distance exactly 1 — the property Morton
  * order lacks at its seams, and the reason sort_hilbert's locality sum
  * beats the z-order twin's). Checked exhaustively at order 4 (16x16). */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  private def grid(order: Int) = {
    val side = 1 << order
    val pts = spark.range(side.toLong * side)
      .select(expr(s"id div $side").as("x"), (col("id") % side).as("y"))
    ZOrder.hilbertD(pts, col("x"), col("y"), order)
      .select(col("x"), col("y"), col("hd"))
      .as[(Long, Long, Long)].collect().toSeq
  }

  test("order-4 index is a bijection onto [0, 256)") {
    val ds = grid(4).map(_._3)
    assert(ds.toSet == (0L until 256L).toSet)
  }

  test("curve-consecutive cells are grid neighbors (distance exactly 1)") {
    val byD = grid(4).sortBy(_._3)
    byD.sliding(2).foreach { case Seq((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"seam between ($x1,$y1) and ($x2,$y2)")
    }
  }

  test("out-of-range coordinates wrap like the z-order key (pmod)") {
    val pts = spark.range(1).select(lit(17L).as("x"), lit(-3L).as("y"))
    val wrapped = spark.range(1).select(lit(1L).as("x"), lit(13L).as("y"))
    val a = ZOrder.hilbertD(pts, col("x"), col("y"), 4).select("hd").as[Long].head()
    val b = ZOrder.hilbertD(wrapped, col("x"), col("y"), 4).select("hd").as[Long].head()
    assert(a == b) // 17 ≡ 1, −3 ≡ 13 (mod 16)
  }
}
