package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spark-native replacement for the reference's CoordinateSelector
  * (`mdio/coordinate_selector.h:81-566`): filter-by-coordinate-value,
  * multi-key stable sort, and gather of data variables.
  *
  * The reference builds run-length lists of matching hyper-rectangles with a
  * multidimensional odometer, then memcpy-gathers each run. In long form all
  * of that collapses to `filter → orderBy → select` — Catalyst pushes the
  * coordinate predicates into the scan (chunk/row-group pruning gives the
  * same effect as the reference's run pruning), and the sort is a
  * distributed range-partitioned sort instead of a driver-side stable sort.
  *
  * Stability (reference uses std::stable_sort, `coordinate_selector.h:122-188`)
  * is reproduced by appending the dimension-index columns as final
  * tie-breakers, which makes the order total and deterministic.
  */
final case class CoordinateSelector(ds: MdioDataset, filters: Seq[Column] = Nil,
                                    sortKeys: Seq[Column] = Nil) {

  /** Add a coordinate predicate (reference filterByCoordinate; subsequent
    * filters refine the previous selection). */
  def filterByCoordinate(pred: Column): CoordinateSelector =
    copy(filters = filters :+ pred)

  /** Add a sort key. The reference applies each sortSelectionByKey as a
    * sequential std::stable_sort (`coordinate_selector.h:122-188`), so the
    * LAST-applied key dominates and earlier orders survive only in ties. */
  def sortByKey(key: Column): CoordinateSelector =
    copy(sortKeys = sortKeys :+ key)

  /** Gather the requested variables for the selection, in selection order
    * (reference ReadDataVariables + readSelection). Stable-sort chaining is
    * reproduced in ONE distributed sort by reversing the key list (latest
    * key primary, earlier keys as tie-breakers) — equivalent to running the
    * reference's per-key stable sorts in order. */
  def readSelection(outputs: Seq[String]): DataFrame = {
    val filtered = filters.foldLeft(ds.data)((df, p) => df.filter(p))
    val ordered =
      if (sortKeys.isEmpty) filtered
      else filtered.orderBy(sortKeys.reverse ++ ds.dims.map(col): _*)
    ordered.select((ds.dims.map(col) ++ outputs.map(col)): _*)
  }
}
