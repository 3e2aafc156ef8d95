package graft.sources

import graft.zarr.VPath
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Per-chunk value statistics (min/max) for one MDIO variable — the
  * connector-side analog of the reference's statsV1 summaries
  * (mdio/stats.h:229-335) and of the CoordinateSelector's value-run pruning
  * (mdio/coordinate_selector.h:302-407), generalized to every chunk of
  * every scalar variable: with current stats on disk, a range predicate on
  * a DATA/COORDINATE VALUE column prunes chunks exactly the way a
  * dimension-index predicate already does, so a `sel`-style value query on
  * a 100 TB store opens only the chunks whose [min, max] can satisfy it
  * (SURVEY §2.2 P10's "chunk-level min/max stats give the same pruning
  * effect").
  *
  * On-disk layout, per variable directory (hidden keys — invisible to
  * zarr readers, excluded from consolidation and from the v2 chunk-file
  * namespace, which never starts with '.'):
  *
  *  - `.mdio_wgen` — the variable's DATA write generation: a plain integer
  *    every data-write path bumps after its tasks commit
  *    ([[MdioWriter.writeVariable]], the DSv2 sink's driver commit, trim).
  *  - `.mdio_stats.json` — `{"generation": G, "chunks": {"0.1": [min,max],
  *    "2.0": null, …}}`: per-chunk closed bounds keyed by the v2-style
  *    C-order chunk key; `null` marks an all-NaN chunk (no finite value —
  *    prunable under ANY range predicate, since NaN satisfies none).
  *
  * The generation check is the staleness contract (same optimistic shape
  * as the S10 metadata commit, mdio/variable.h:1522): stats are used for
  * pruning ONLY when `stats.generation == .mdio_wgen`. Write paths that
  * compute fresh stats (the scalar chunk-shuffle write, whose tasks hold
  * each final post-RMW chunk buffer and so know exact bounds for free)
  * publish both files at the new generation; every other mutation path
  * (record/sharded/complex writes, the DSv2 sink, trim, external writers
  * that at least bump the generation) leaves the stats behind the
  * generation, and the scan silently falls back to unpruned planning —
  * stale stats can lose pruning, never correctness.
  *
  * Bounds are JSON numbers compared as BigDecimal on the read side, so
  * integral stats stay exact past 2^53 and float stats keep full double
  * precision; non-finite bounds are never written (a chunk whose finite
  * values are absent writes `null`, a chunk holding ±Inf simply omits its
  * entry and stays unprunable — safe).
  *
  * Scale envelope: the sidecar is one JSON object with one entry per
  * chunk — the same information density as parquet footers, concentrated
  * in one key. At 100 TB with 64 MB chunks that is ~1.6M entries (~50 MB)
  * per variable: fine to read once per planned scan on a driver, and the
  * same order as the consolidated-metadata rewrite the store already pays
  * on commit. Each stats-aware write rewrites the merged file (again the
  * `.zmetadata` consolidation cost class); a deployment pushing past that
  * would shard the sidecar by chunk-range under the same generation guard
  * without touching the read-side contract. Writers follow the store's
  * existing single-writer-per-variable discipline (concurrent writers to
  * one variable are already torn-chunk UB before stats enter the
  * picture); the generation file makes any violation fail SAFE here —
  * last writer wins and anything inconsistent reads as stale. */
object MdioChunkStats {

  val StatsFile = ".mdio_stats.json"
  val GenFile = ".mdio_wgen"

  /** The remaining statsV1 moments (reference SummaryStats,
    * mdio/stats.h:229-335: count/sum/sumSquares beside min/max) over a
    * chunk's FINITE values, kept EXACT: `sum` is the exact real-number sum
    * of the cells' binary values (Shewchuk partials at write time, see
    * [[ExactSum]]), `sumSq` the exact sum of their exact squares, so
    * merging chunk moments is plain BigDecimal addition — order-free and
    * reproducible, which is what lets SUM/statsV1 over a 100 TB store be
    * answered from metadata without a numerical-reproducibility caveat.
    * Integral chunks whose exact sums overflow the fast path simply omit
    * moments (bounds survive; the SUM pushdown falls back to a scan). */
  final case class Moments(cnt: Long, sum: BigDecimal, sumSq: Option[BigDecimal])

  /** Exact Σ of BigDecimals. scala.math.BigDecimal's `+` rounds every
    * intermediate to its MathContext (34 significant digits by default) —
    * catastrophic under cancellation of large chunk sums — so all moment
    * arithmetic goes through java.math.BigDecimal.add, which is exact. */
  def exactTotal(xs: IterableOnce[BigDecimal]): BigDecimal =
    BigDecimal(xs.iterator.foldLeft(java.math.BigDecimal.ZERO)((a, b) => a.add(b.underlying)))

  /** Bounds over a chunk's FINITE values; `hasNaN` records whether any
    * cell is NaN — irrelevant to range-predicate pruning (NaN satisfies no
    * range) but load-bearing for the metadata MIN/MAX answer, where both
    * engines treat NaN as the greatest double (MAX returns NaN when any
    * cell is NaN; MIN still returns the finite minimum). `moments`, when
    * present, carries the chunk's exact statsV1 moments. */
  final case class Bounds(min: BigDecimal, max: BigDecimal, hasNaN: Boolean = false,
                          moments: Option[Moments] = None)

  /** One chunk's value bounds: None = no finite value in the chunk. */
  type Entry = Option[Bounds]

  /** Current data-write generation of a variable directory (0 = never
    * stamped; pre-stats stores read as generation 0 with no stats file,
    * i.e. never pruned). */
  def generation(varDir: VPath): Long = {
    val f = varDir.resolve(GenFile)
    val bytes = f.readBytesOrNull()
    if (bytes == null) 0L
    else new String(bytes, java.nio.charset.StandardCharsets.UTF_8).trim.toLong
  }

  /** Bump the variable's data generation WITHOUT refreshing stats — the
    * invalidation hook for write paths that do not compute bounds. Any
    * existing stats file is left at its old generation and thereby
    * disabled. Returns the new generation. */
  def bump(varDir: VPath): Long = {
    val next = generation(varDir) + 1
    varDir.resolve(GenFile).writeString(next.toString)
    next
  }

  /** Read the stats file regardless of generation: (generation, entries).
    * None when absent or unparseable (treated as no stats). */
  def read(varDir: VPath): Option[(Long, Map[String, Entry])] = {
    val f = varDir.resolve(StatsFile)
    val bytes = f.readBytesOrNull()
    if (bytes == null) return None
    try {
      // exact-decimal parse: moment sums can carry full binary expansions
      // (hundreds of digits) that a double-routed parse would destroy
      val j = JsonMethods.parse(new String(bytes, java.nio.charset.StandardCharsets.UTF_8),
        useBigDecimalForDouble = true)
      val gen = (j \ "generation") match {
        case JInt(i) => i.toLong
        case JLong(l) => l
        case _ => return None
      }
      val chunks = (j \ "chunks") match {
        case JObject(fields) => fields.map { case (k, v) =>
          k -> (v match {
            case JNull => None
            case JArray(List(a, b)) => Some(Bounds(num(a), num(b)))
            case JArray(List(a, b, JBool(n))) => Some(Bounds(num(a), num(b), n))
            case JArray(List(a, b, JBool(n), c, s, s2)) =>
              Some(Bounds(num(a), num(b), n,
                Some(Moments(num(c).toLongExact, num(s),
                  if (s2 == JNull) None else Some(num(s2))))))
            case other => throw new IllegalArgumentException(s"bad stats entry $other")
          })
        }.toMap
        case _ => Map.empty[String, Entry]
      }
      Some((gen, chunks))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def num(j: JValue): BigDecimal = j match {
    case JInt(i) => BigDecimal(i)
    case JLong(l) => BigDecimal(l)
    case JDouble(d) => BigDecimal(d)
    case JDecimal(d) => d
    case other => throw new IllegalArgumentException(s"bad stats number $other")
  }

  /** Entries usable for pruning RIGHT NOW: present and generation-current.
    * None ⇒ plan without value pruning. */
  def current(varDir: VPath): Option[Map[String, Entry]] =
    read(varDir).filter(_._1 == generation(varDir)).map(_._2)

  /** Publish stats at generation `gen` (the caller bumped `.mdio_wgen` to
    * `gen` FIRST — a crash between the two leaves stats stale, never
    * wrongly current). `entries` override `prior` per chunk key. */
  def write(varDir: VPath, gen: Long, entries: Map[String, Entry],
            prior: Map[String, Entry] = Map.empty): Unit = {
    val merged = prior ++ entries
    val body = merged.toSeq.sortBy(_._1).map {
      case (k, None) => s""""$k": null"""
      case (k, Some(Bounds(mn, mx, nan, mom))) =>
        val tail = mom match {
          case Some(Moments(c, s, s2)) =>
            val sq = s2.map(_.underlying.toPlainString).getOrElse("null")
            s", $nan, $c, ${s.underlying.toPlainString}, $sq"
          case None => if (nan) ", true" else ""
        }
        s""""$k": [${mn.underlying.toPlainString}, ${mx.underlying.toPlainString}$tail]"""
    }.mkString(", ")
    varDir.resolve(StatsFile).writeString(
      s"""{"generation": $gen, "chunks": {$body}}""")
  }

  /** The refresh used by stats-aware writers: bump the generation, carry
    * over prior entries IF they were current (untouched chunks keep exact
    * bounds across an RMW pass), overlay the fresh entries, publish. */
  def refresh(varDir: VPath, entries: Map[String, Entry]): Unit = {
    val g = generation(varDir)
    val prior = current(varDir).getOrElse(Map.empty)
    val next = g + 1
    varDir.resolve(GenFile).writeString(next.toString)
    write(varDir, next, entries, prior)
  }

  /** The exact binary expansion of a double as a BigDecimal (NOT the
    * shortest round-trip form `BigDecimal(d)` gives — moment arithmetic
    * needs the true value). */
  def exactBD(d: Double): BigDecimal = BigDecimal(new java.math.BigDecimal(d))

  /** Exactly-rounded streaming sum of doubles via Shewchuk's non-overlapping
    * partials (the msum/fsum algorithm, "Adaptive Precision Floating-Point
    * Arithmetic and Fast Robust Geometric Predicates", Shewchuk 1997 —
    * the same algorithm behind Python's `math.fsum`): after any sequence of
    * `add`s the partials sum EXACTLY (as real numbers) to the running total,
    * so `toBigDecimal` is the exact real-number sum of every input in any
    * order — ~2-3 flops per element, a handful of live partials. Finite
    * inputs only (callers skip NaN and abandon stats on ±Inf). */
  final class ExactSum {
    private var partials = new Array[Double](8)
    private var n = 0

    def add(v: Double): Unit = {
      var x = v
      var i = 0
      var j = 0
      while (j < n) {
        var y = partials(j)
        if (math.abs(x) < math.abs(y)) { val t = x; x = y; y = t }
        val hi = x + y
        val lo = y - (hi - x) // exact: |x| >= |y| ⇒ Dekker fast-two-sum
        if (lo != 0.0) {
          if (i >= partials.length)
            partials = java.util.Arrays.copyOf(partials, partials.length * 2)
          partials(i) = lo
          i += 1
        }
        x = hi
        j += 1
      }
      if (i >= partials.length)
        partials = java.util.Arrays.copyOf(partials, partials.length * 2)
      partials(i) = x
      n = i + 1
    }

    /** Add the EXACT square of `v`: Dekker/FMA two-product splits v*v into
      * a rounded head and its exact residual, both fed to the partials. */
    def addSquare(v: Double): Unit = {
      val hi = v * v
      val lo = Math.fma(v, v, -hi) // exact residual of the product
      add(hi)
      if (lo != 0.0) add(lo)
    }

    /** False when accumulation overflowed double range (a partial hit ±Inf
      * or NaN) — the exact sum is unrepresentable and must be discarded. */
    def valid: Boolean = {
      var j = 0
      while (j < n) {
        val p = partials(j)
        if (p.isInfinite || p.isNaN) return false
        j += 1
      }
      true
    }

    /** The exact real-number sum of everything added so far. */
    def toBigDecimal: BigDecimal = {
      var s = java.math.BigDecimal.ZERO
      var j = 0
      while (j < n) {
        if (partials(j) != 0.0) s = s.add(new java.math.BigDecimal(partials(j)))
        j += 1
      }
      BigDecimal(s)
    }
  }
}
