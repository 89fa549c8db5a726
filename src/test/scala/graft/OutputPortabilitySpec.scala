package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The r10 output-type tripwire (VERDICT r9 ask #2): a decimal-output
  * query must fail Verify's portability gate loudly; the repaired
  * q168/q170 string carriers must pass it; and the gate must see
  * decimals hidden inside nested types. */
class OutputPortabilitySpec extends SparkSpec {

  test("a decimal128 output column trips the gate (the r9 failure class)") {
    // Exactly the shape that burned r9: an exact Decimal(38,0) sum far
    // past float53 — correct values, non-portable carrier.
    val df = spark.range(3)
      .agg(sum(lit("99999999999999999999999").cast(DecimalType(38, 0)))
        .as("det"))
    val e = intercept[IllegalArgumentException] {
      OutputPortability.check("q_decimal_demo", df.schema)
    }
    assert(e.getMessage.contains("q_decimal_demo"))
    assert(e.getMessage.contains("det"))
  }

  test("binary output trips; md5-hex string passes") {
    val bin = spark.range(1).select(unhex(lit("FF")).as("payload"))
    intercept[IllegalArgumentException] {
      OutputPortability.check("q_bin_demo", bin.schema)
    }
    val hex = spark.range(1).select(md5(lit("x").cast("binary")).as("payload"))
    OutputPortability.check("q_hex_demo", hex.schema)
  }

  test("decimals nested in arrays/structs/maps are still caught") {
    val schema = StructType(Seq(
      StructField("ok", LongType),
      StructField("arr", ArrayType(DecimalType(38, 0))),
      StructField("st", StructType(Seq(StructField("d", DecimalType(20, 0))))),
      StructField("mp", MapType(StringType, DecimalType(38, 0)))))
    val bad = OutputPortability.offendingFields(schema)
    assert(bad.size == 3)
    assert(bad.exists(_.startsWith("arr[]")))
    assert(bad.exists(_.startsWith("st.d")))
    assert(bad.exists(_.startsWith("mp<val>")))
  }

  test("repaired q168/q170 carriers pass the gate end to end") {
    val sf = "/root/testdata/sf0.001"
    for (name <- Seq("q168_linear_fit", "q170_residual_gate")) {
      val df = SparkEntry.queries(name)(spark, sf)
      OutputPortability.check(name, df.schema)
      // And the carrier really is strings now, not decimal128.
      assert(!df.schema.fields.exists(_.dataType.isInstanceOf[DecimalType]))
    }
    // Values survive the re-carry: q168's digit strings parse back to
    // the exact integers LinearFit produced (scale-0, no sci notation).
    val row = SparkEntry.queries("q168_linear_fit")(spark, sf).collect()(0)
    val det = BigInt(row.getAs[String]("det"))
    assert(det > 0, "XᵀX determinant must be positive for full-rank features")
    assert(row.getAs[String]("n") == BigInt(row.getAs[String]("n")).toString)
  }
}
