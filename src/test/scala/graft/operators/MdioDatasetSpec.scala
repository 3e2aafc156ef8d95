package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parity tests for the reference's slicing/selection semantics
  * (mdio/variable.h slice clamping, mdio/dataset.h sel paths). */
class MdioDatasetSpec extends SparkSpec {
  import spark.implicits._

  private def grid: MdioDataset = {
    val data = Seq.tabulate(100) { i => (i.toLong % 10, i.toLong / 10, i * 1.0) }
      .toDF("x", "y", "v")
    MdioDataset(data, Seq("x", "y"),
      Map("x" -> (0L, 10L), "y" -> (0L, 10L)),
      coords = Map("xc" -> (Seq("x"),
        Seq.tabulate(10)(i => (i.toLong, i * 100.0)).toDF("x", "xc"))))
  }

  test("isel slices a half-open interval") {
    assert(grid.isel("x", 2, 5).data.count() == 30)
  }

  test("isel clamps out-of-domain bounds (reference sliceInRange)") {
    val g = grid.isel("x", -100, 100)
    assert(g.data.count() == 100)
    assert(g.intervals("x") == (0L, 10L))
  }

  test("isel on unknown label is a silent no-op (reference hasLabel)") {
    assert(grid.isel("nope", 0, 1).data.count() == 100)
  }

  test("isel start > stop errors (reference Variable::slice)") {
    intercept[IllegalArgumentException](grid.isel("x", 5, 2))
  }

  test("isel honors stride (step=2 from start)") {
    // x in [2,8) step 2 -> x in {2,4,6}, 10 y-cells each
    assert(grid.isel("x", 2, 8, step = 2).data.count() == 30)
  }

  test("duplicate labels in one isel concat their sub-slices (SET1)") {
    val g = grid.isel(Seq(("x", 0L, 2L), ("x", 5L, 7L)))
    assert(g.data.count() == 40)
    assert(g.data.select("x").distinct().as[Long].collect().sorted.toSeq == Seq(0L, 1L, 5L, 6L))
  }

  test("sel keeps every index where the coordinate matches (P7)") {
    assert(grid.sel("xc", lit(300.0)).data.count() == 10) // x == 3
  }

  test("selRange is stop-inclusive (P8, mdio/dataset.h:872-876)") {
    // xc in [200, 400] -> x in {2,3,4}: 30 cells
    assert(grid.selRange("xc", lit(200.0), lit(400.0)).data.count() == 30)
  }

  test("selRangeStrict errors when an endpoint is missing") {
    intercept[IllegalArgumentException](grid.selRangeStrict("xc", 250.0, 400.0))
  }

  test("selList selects all listed values (P9 — Unimplemented in reference)") {
    assert(grid.selList("xc", Seq(100.0, 900.0)).data.count() == 20)
  }

  test("sel on a 2-D coordinate errors (reference 1-D requirement)") {
    val g2 = grid.copy(coords = grid.coords +
      ("c2" -> (Seq("x", "y"), grid.data.select(col("x"), col("y"), col("v").as("c2")))))
    intercept[IllegalArgumentException](g2.sel("c2", lit(1.0)))
  }

  test("selectVariable projects dims + the variable (P1)") {
    assert(grid.selectVariable("v").data.columns.toSeq == Seq("x", "y", "v"))
  }

  test("statsV1 computes count/min/max/sum/sumSquares in one pass (A1)") {
    val r = grid.statsV1("v").collect()(0)
    assert(r.getLong(0) == 100)
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 99.0)
    assert(r.getDouble(3) == 4950.0)
    assert(r.getDouble(4) == (0 until 100).map(i => i.toDouble * i).sum)
  }

  test("isel composes: slice then slice == intersection") {
    val a = grid.isel("x", 2, 8).isel("x", 4, 9)
    val b = grid.isel("x", 4, 8)
    assert(a.data.count() == b.data.count())
    assert(a.intervals("x") == b.intervals("x"))
  }

  test("withCoordinate attaches coordinate values by dim join") {
    val df = grid.withCoordinate("xc").data
    assert(df.filter(col("x") === 3 && col("xc") =!= 300.0).count() == 0)
  }

  test("sortByKey chains like sequential stable sorts: last key dominates") {
    // reference coordinate_selector.h:122-188 — each sortSelectionByKey is a
    // std::stable_sort, so the LAST key is primary, earlier keys break ties
    val ds = MdioDataset(
      Seq((0L, 3.0, 1.0), (1L, 1.0, 2.0), (2L, 3.0, 0.5), (3L, 1.0, 0.1), (4L, 2.0, 9.0))
        .toDF("i", "a", "b"),
      Seq("i"), Map("i" -> (0L, 5L)))
    val got = CoordinateSelector(ds)
      .sortByKey(col("b").desc) // applied first -> tie-breaker
      .sortByKey(col("a"))      // applied last  -> primary
      .readSelection(Seq("a", "b"))
      .select("i").as[Long].collect().toSeq
    // sequential stable sort oracle: sort by b desc, then stable by a asc
    val oracle = Seq((0L, 3.0, 1.0), (1L, 1.0, 2.0), (2L, 3.0, 0.5), (3L, 1.0, 0.1), (4L, 2.0, 9.0))
      .sortBy { case (_, _, b) => -b }
      .sortBy { case (_, a, _) => a }(Ordering.Double.TotalOrdering) // scala sortBy is stable
      .map(_._1)
    assert(got == oracle)
  }
}
