package graft

import org.apache.spark.sql.types._

/** Verify-time output-type tripwire.
  *
  * Round-9 lesson (q168/q170): the driver's oracle hasher canonicalizes
  * results through pandas, where 128-bit carriers (Spark decimal128 /
  * DuckDB HUGEINT) degrade to float64 — values above 2^53 then
  * hash-mismatch even when both engines computed the identical exact
  * integer. The values were right; the CARRIER was not driver-portable.
  *
  * This gate makes that failure class impossible to ship silently:
  * every query output that Verify dumps must be built from driver-safe
  * types only. Driver-safe = the types whose pandas/pyarrow round-trip
  * is lossless at any magnitude: integral ≤ 64-bit, string, boolean,
  * float/double (only where a float result is actually claimed), date /
  * timestamp, and arrays/structs/maps thereof. NOT safe: any
  * DecimalType (decimal128 is exactly the q168 trap) and raw binary
  * (bytes hash engine-dependently; ship md5-hex strings instead).
  *
  * Exact 128-bit results remain first-class INSIDE a plan — LinearFit
  * still solves in Decimal(38,0) — but the final select must re-carry
  * them as digit strings (scale-0 decimal → plain digits on both
  * engines; the hash then compares strings) or as split int64 limbs.
  *
  * An explicit per-query allowlist exists for a future query that can
  * justify a non-portable carrier; it must document why. Empty today.
  */
object OutputPortability {

  /** Queries exempt from the gate, each with a written justification.
    * Deliberately empty — adding an entry is a design decision, not a
    * workaround. */
  val allowlist: Set[String] = Set.empty

  /** All schema paths carrying a driver-unsafe type, recursively
    * through arrays, structs, and maps. Empty = portable. */
  def offendingFields(schema: StructType): Seq[String] = {
    def walk(dt: DataType, path: String): Seq[String] = dt match {
      case d: DecimalType => Seq(s"$path: $d")
      case BinaryType     => Seq(s"$path: binary")
      case s: StructType  =>
        s.fields.toSeq.flatMap(f => walk(f.dataType, s"$path.${f.name}"))
      case a: ArrayType   => walk(a.elementType, s"$path[]")
      case m: MapType     =>
        walk(m.keyType, s"$path<key>") ++ walk(m.valueType, s"$path<val>")
      case _ => Nil
    }
    schema.fields.toSeq.flatMap(f => walk(f.dataType, f.name))
  }

  /** Throws IllegalArgumentException naming every offending column if
    * `name` is not allowlisted and its output schema is non-portable.
    * Verify calls this on every query before writing its parquet, so a
    * non-portable output fails the dump loudly instead of becoming a
    * silent hash mismatch in the driver's correctness artifact. */
  def check(name: String, schema: StructType): Unit =
    if (!allowlist.contains(name)) {
      val bad = offendingFields(schema)
      require(bad.isEmpty,
        s"$name output schema is not driver-portable (the r9 q168/q170 " +
          s"failure class): ${bad.mkString("; ")}. Cast exact 128-bit " +
          "results to STRING digit strings on BOTH the Spark and oracle " +
          "sides (or int64 limbs); ship binary as md5-hex. A justified " +
          "exception belongs in OutputPortability.allowlist.")
    }
}
