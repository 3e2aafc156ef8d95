package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Labeled-dimension dataset: the Spark-native projection of the reference's
  * Dataset/Variable model (SURVEY.md §1.1).
  *
  * A dense N-D grid is held in "long form": one row per cell, carrying one
  * integer index column per dimension plus one column per data variable.
  * Coordinate variables (reference `mdio/dataset.h:1071-1080`) are separate
  * small DataFrames keyed by their dimension columns and broadcast-joined on
  * demand. This representation makes every reference operator an ordinary
  * relational operator, and scales by partitioning on dimension (chunk) keys.
  *
  * Semantics preserved from the reference:
  *  - `isel` clamps out-of-domain ranges instead of erroring
  *    (`mdio/variable.h:1211-1232` sliceInRange);
  *  - unknown dimension labels are a silent no-op
  *    (`mdio/variable.h:1186-1202` hasLabel check);
  *  - `start > stop` is an error (`mdio/variable.h:1302-1400`);
  *  - duplicate labels in one isel call concatenate the sub-slices
  *    (`mdio/variable.h:1357-1396`, tensorstore::Concat);
  *  - `sel` value ranges are stop-INCLUSIVE and require unique endpoint
  *    values in the coordinate (`mdio/dataset.h:787-885`);
  *  - `sel` on a list of values: reference declares it but returns
  *    Unimplemented (`mdio/dataset.h:676-684`); here it is complete;
  *  - `sel` requires a 1-D coordinate (`mdio/dataset.h:676-723`).
  */
object MdioDataset {

  /** Open an on-disk MDIO/Zarr dataset (v2 or v3) as a labeled dataset:
    * data variables come through `format("mdio")` in long form; dimension
    * coordinates (1-D arrays named after their dim) and listed coordinate
    * variables load as coordinate DataFrames keyed by their dims — the
    * full reference Dataset shape (`mdio/dataset.h:941-963` Open +
    * `mdio/dataset.h:913-922` coordinate attachment), so isel/sel/
    * CoordinateSelector run against real chunked storage with pushdown. */
  def open(spark: org.apache.spark.sql.SparkSession, path: String): MdioDataset = {
    import org.apache.spark.sql.functions.col
    val (_, arrays) = graft.zarr.ZarrMeta.readGroup(graft.zarr.ZarrMeta.path(path))
    val labeled = arrays.flatMap { case (name, (meta, attrs)) =>
      meta.dimNames.orElse(attrs.flatMap(graft.sources.MdioTableUtil.arrayDimensions))
        .map(d => name -> (meta, d, attrs))
    }
    val dimCoords = labeled.collect {
      case (name, (_, d, _)) if d.size == 1 && d.head == name => name
    }.toSet
    val listedCoords = labeled.values.flatMap { case (_, _, attrs) =>
      attrs.toSeq.flatMap(graft.sources.MdioTableUtil.coordinatesAttr)
    }.toSet
    val allDataVars = labeled.keys.filterNot(n => dimCoords(n) || listedCoords(n)).toSeq.sorted
    require(allDataVars.nonEmpty, s"no data variables at $path")
    // the main grid = the highest-rank dimension tuple (most vars breaks
    // ties); variables on other tuples attach via [[attachVariable]]
    val byDims = allDataVars.groupBy(v => labeled(v)._2)
    val (dims, dataVars) = byDims.toSeq
      .maxBy { case (d, vs) => (d.size, vs.size) }
    val domain = dims.zipWithIndex.map { case (dname, i) =>
      dname -> (0L, labeled(dataVars.head)._1.shape(i))
    }.toMap

    def loadCoord(name: String): (Seq[String], DataFrame) = {
      val cdims = labeled(name)._2
      // dimension coordinates keep the `__value` alias — their natural name
      // is taken by the dim-index column (see MdioDataset.coordValueCol)
      (cdims, spark.read.format("mdio").option("variables", name).load(path))
    }
    val coords = (dimCoords ++ listedCoords).filter(labeled.contains)
      .map(n => n -> loadCoord(n)).toMap

    val unitsByVar = arrays.flatMap { case (name, (_, attrs)) =>
      attrs.map(a => name -> (
        try graft.sources.MdioTableUtil.unitsAttr(a)
        catch { case _: IllegalArgumentException => Nil }))
    }.filter(_._2.nonEmpty)

    MdioDataset(
      data = spark.read.format("mdio")
        .option("variables", dataVars.mkString(",")).load(path),
      dims = dims, domain = domain, coords = coords, units = unitsByVar)
  }

  /** J1 — dimension alignment across variables with DIFFERENT dimension
    * subsets (reference: all variables sharing a dim name are implicitly
    * aligned on integer index, mdio/dataset_factory.h:676-701). Reads
    * `variable` with its own dims from the same store and broadcast-joins
    * it onto `ds` on the shared dimension columns — e.g. a 1-D
    * velocity(depth) profile attached to a 3-D image(inline, crossline,
    * depth). The smaller per-variable table broadcasts; the grid never
    * shuffles. */
  def attachVariable(spark: org.apache.spark.sql.SparkSession, ds: MdioDataset,
                     path: String, variable: String): MdioDataset = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val vdf0 = spark.read.format("mdio").option("variables", variable).load(path)
    val vdims = vdf0.columns.filterNot(c => c == variable || c == s"${variable}__value").toSeq
    val shared = vdims.filter(ds.dims.contains)
    require(shared.nonEmpty,
      s"variable '$variable' shares no dimensions with the dataset (${ds.dims.mkString(",")})")
    val valueCol = if (vdims.contains(variable)) s"${variable}__value" else variable
    val vdf = vdf0.select((shared.map(col) :+ col(valueCol).as(variable)): _*)
    ds.copy(data = ds.data.join(broadcast(vdf), shared))
  }
}

final case class MdioDataset(
    data: DataFrame,
    dims: Seq[String],
    domain: Map[String, (Long, Long)],          // label -> [min, maxExclusive)
    coords: Map[String, (Seq[String], DataFrame)] = Map.empty,
    /** F6 — typed unitsV1 (category, unit) pairs per variable, validated
      * against the reference vocabulary (mdio/impl.h:78-118). */
    units: Map[String, Seq[(String, String)]] = Map.empty) {

  /** Typed units accessor (reference getUnits on UserAttributes,
    * mdio/stats.h:499-520): Nil when the variable declares none. */
  def unitsOf(variable: String): Seq[(String, String)] =
    units.getOrElse(variable, Nil)

  /** One half-open index range over a labeled dimension. */
  case class DimRange(label: String, start: Long, stop: Long, step: Long = 1L)

  def hasDim(label: String): Boolean = dims.contains(label)

  /** Index-based slice of one dimension: clamp, no-op on unknown label,
    * error on inverted range (reference `Variable::slice`). */
  def isel(label: String, start: Long, stop: Long, step: Long = 1L): MdioDataset = {
    if (!hasDim(label)) return this // reference: unknown labels are a no-op
    require(start <= stop, s"isel $label: start $start > stop $stop")
    require(step >= 1, s"isel $label: step must be >= 1, got $step")
    val (lo, hi) = domain(label)
    // clamp BOTH endpoints into [lo, hi] (reference sliceInRange clamps a
    // fully-out-of-domain slice to an empty range at the boundary)
    val s0 = math.min(math.max(start, lo), hi)
    val s1 = math.min(math.max(stop, s0), hi)
    val base = col(label) >= s0 && col(label) < s1
    val pred = if (step == 1L) base
               else base && (col(label) - lit(s0)) % lit(step) === 0L
    copy(data = data.filter(pred), domain = domain.updated(label, (s0, s1)))
  }

  /** Multi-range isel; duplicate labels union their sub-slices (reference
    * slice-concat, `mdio/variable.h:1357-1396`). In long form the concat
    * is a disjunction — no physical copy. */
  def isel(ranges: Seq[(String, Long, Long)]): MdioDataset = {
    val known = ranges.filter(r => hasDim(r._1))
    if (known.isEmpty) return this
    val byLabel = known.groupBy(_._1)
    val pred = byLabel.map { case (label, rs) =>
      val (lo, hi) = domain(label)
      rs.map { case (_, a, b) =>
        require(a <= b, s"isel $label: start $a > stop $b")
        col(label) >= math.max(a, lo) && col(label) < math.min(b, hi)
      }.reduce(_ || _)
    }.reduce(_ && _)
    val newDomain = byLabel.foldLeft(domain) { case (dom, (label, rs)) =>
      val (lo, hi) = dom(label)
      val s0 = math.min(math.max(rs.map(_._2).min, lo), hi)
      val s1 = math.min(math.max(rs.map(_._3).max, s0), hi)
      dom.updated(label, (s0, s1))
    }
    copy(data = data.filter(pred), domain = newDomain)
  }

  private def coordFor(name: String): (Seq[String], DataFrame) =
    coords.getOrElse(name,
      throw new IllegalArgumentException(s"sel: no coordinate named '$name'"))

  private def require1D(name: String): (String, DataFrame) = {
    val (cdims, cdf) = coordFor(name)
    require(cdims.size == 1,
      s"sel: coordinate '$name' is ${cdims.size}-D; sel requires 1-D (reference mdio/dataset.h:676-723)")
    (cdims.head, cdf)
  }

  /** A dimension coordinate's value column is aliased `<name>__value`
    * because its natural name is taken by the dim-index column. */
  private def coordValueCol(name: String, dim: String): String =
    if (name == dim) s"${name}__value" else name

  /** Value-based selection: every index where the 1-D coordinate equals the
    * value is kept (reference emits one unit slice per hit then isels —
    * `mdio/dataset.h:552-629`; here: a broadcast semi-join on the dim). */
  def sel(coordName: String, value: Column): MdioDataset = {
    val (dim, cdf) = require1D(coordName)
    val hits = cdf.filter(col(coordValueCol(coordName, dim)) === value).select(col(dim))
    copy(data = data.join(broadcast(hits), Seq(dim), "left_semi"))
  }

  /** Value-range selection, stop-INCLUSIVE, endpoints need not be unique in
    * long form but the reference errors on duplicate endpoints — callers
    * wanting strict parity use [[selRangeStrict]]. */
  def selRange(coordName: String, start: Column, stop: Column): MdioDataset = {
    val (dim, cdf) = require1D(coordName)
    val v = col(coordValueCol(coordName, dim))
    val hits = cdf.filter(v >= start && v <= stop).select(col(dim))
    copy(data = data.join(broadcast(hits), Seq(dim), "left_semi"))
  }

  /** Strict reference parity for sel ranges: endpoint values must occur
    * exactly once in the coordinate (`mdio/dataset.h:823-846`), else error. */
  def selRangeStrict(coordName: String, start: Any, stop: Any): MdioDataset = {
    val (dim0, cdf) = require1D(coordName)
    val v0 = col(coordValueCol(coordName, dim0))
    val dup = cdf.filter(v0.isin(start, stop))
      .groupBy(v0).count()
    val rows = dup.collect()
    rows.foreach { r =>
      require(r.getLong(1) == 1L,
        s"sel range endpoint ${r.get(0)} occurs ${r.getLong(1)} times; must be unique")
    }
    require(rows.length == 2, s"sel range endpoints ($start, $stop) not both present in '$coordName'")
    selRange(coordName, lit(start), lit(stop))
  }

  /** List-of-values selection (reference declares ListDescriptor but returns
    * UnimplementedError; complete here via isin semi-join). */
  def selList(coordName: String, values: Seq[Any]): MdioDataset = {
    val (dim, cdf) = require1D(coordName)
    val hits = cdf.filter(col(coordValueCol(coordName, dim)).isin(values: _*)).select(col(dim))
    copy(data = data.join(broadcast(hits), Seq(dim), "left_semi"))
  }

  /** Variable selection `dataset["image"]` (reference `mdio/dataset.h:896-925`):
    * projects the variable plus dimension columns — column pruning reaches
    * the scan. Attached coordinates stay available via `coords`. */
  def selectVariable(name: String): MdioDataset =
    copy(data = data.select((dims.map(col) :+ col(name)): _*))

  /** Struct-field selection (reference SelectField, `mdio/dataset.h:1131-1262`):
    * nested-field pruning via getField. */
  def selectField(variable: String, field: String): DataFrame =
    data.select((dims.map(col) :+ col(variable).getField(field).as(s"${variable}_$field")): _*)

  /** Typed get with dtype cast (reference `variables.get<T>`). */
  def getAs(variable: String, dataType: String): DataFrame =
    data.select((dims.map(col) :+ col(variable).cast(dataType).as(variable)): _*)

  /** Current per-dimension intervals (reference get_intervals). */
  def intervals: Map[String, (Long, Long)] = domain

  /** Attach a coordinate variable's values as columns (reference coordinate
    * gather; broadcast join on the coordinate's dims). */
  def withCoordinate(name: String): MdioDataset = {
    val (cdims, cdf) = coordFor(name)
    copy(data = data.join(broadcast(cdf), cdims, "left"))
  }

  /** One-pass statsV1 (reference `mdio/stats.h:229-335`): count, min, max,
    * sum, sumSquares — exact decimal accumulation, order-independent. */
  def statsV1(variable: String): DataFrame = {
    val c = col(variable)
    data.agg(
      count(c).as("count"),
      min(c).as("min"),
      max(c).as("max"),
      sum(c.cast("decimal(27,6)")).cast("double").as("sum"),
      sum((c * c).cast("decimal(30,6)")).cast("double").as("sumSquares"))
  }
}
