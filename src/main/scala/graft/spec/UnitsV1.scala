package graft.spec

import org.json4s._

/** unitsV1 metadata: the reference's typed unit models
  * (mdio/impl.h:78-118 vocabulary; schema models
  * mdio/dataset_schema.h LengthUnitModel/TimeUnitModel/… — each an object
  * of {category: unit}; stats.h:450-470 accepts an object, an array of
  * objects, or a bare string). Parsed into (category, unit) pairs with the
  * enum vocabulary enforced per category. */
object UnitsV1 {

  /** category -> allowed unit symbols (mdio/impl.h:78-118). */
  val vocabulary: Map[String, Set[String]] = Map(
    "angle"     -> Set("deg", "rad"),
    "density"   -> Set("g/cm**3", "kg/m**3", "lb/gal"),
    "frequency" -> Set("Hz"),
    "length"    -> Set("mm", "cm", "m", "km", "in", "ft", "yd", "mi"),
    "speed"     -> Set("m/s", "ft/s"),
    "time"      -> Set("ns", "µs", "ms", "s", "min", "h", "d"),
    "voltage"   -> Set("µV", "mV", "V"))

  /** Parse a unitsV1 JSON value into (category, unit) pairs. A bare string
    * (the legacy loose form the reference also ingests) gets category "". */
  def parse(j: JValue): Seq[(String, String)] = j match {
    case JNothing | JNull => Nil
    case JString(s) => Seq("" -> s)
    case JObject(fields) => fields.map {
      case (k, JString(v)) => k -> v
      case (k, other) => throw new IllegalArgumentException(
        s"unitsV1.$k must be a string, got $other")
    }
    case JArray(items) => items.flatMap(parse)
    case other => throw new IllegalArgumentException(s"bad unitsV1 $other")
  }

  /** Enforce the vocabulary: known categories only, unit in the category's
    * enum (mdio/dataset_schema.h *UnitModel: additionalProperties false). */
  def validate(pairs: Seq[(String, String)], where: String): Unit =
    pairs.foreach { case (cat, unit) =>
      if (cat.nonEmpty) {
        val allowed = vocabulary.getOrElse(cat,
          throw new IllegalArgumentException(
            s"$where: unknown unitsV1 category '$cat' (${vocabulary.keys.toSeq.sorted.mkString("/")})"))
        require(allowed.contains(unit),
          s"$where: '$unit' is not a valid $cat unit (${allowed.toSeq.sorted.mkString(", ")})")
      }
    }

  /** Extract + validate a variable-metadata JSON's unitsV1. */
  def fromMetadata(metadata: Option[JValue], where: String): Seq[(String, String)] = {
    val pairs = metadata.map(m => parse(m \ "unitsV1")).getOrElse(Nil)
    validate(pairs, where)
    pairs
  }
}
