package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** graft_json_long pinned to its declarative twin
  * from_json(struct<k: long>).getField("k") — well-formed, malformed,
  * truncated, nested, repeated, and non-integral cases. */
class JsonKernelSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    """{"k": 42}""",
    """{"k": 0}""",
    """{"k": -7}""",
    """{"k": 42, "other": "x"}""",
    """{"other": 1}""", // absent
    """{"k": null}""", // JSON null
    """{"k": 1.5}""", // non-integral
    """{"k": "12"}""", // string, no coercion
    """{"k": true}""",
    """{"nested": {"k": 9}}""", // nested name must not match
    """{"k": 1, "k": 2}""", // repeated: last wins
    """{"a": [1, 2, {"k": 3}], "k": 5}""", // array child skipped
    """{"k": 9223372036854775807}""", // Long.MaxValue
    """not json at all""",
    """[1, 2, 3]""", // non-object root
    """{"k": 1""", // truncated AFTER the field was seen
    """{"k": }""", // malformed value
    "",
    """{}""")

  test("kernel ≡ from_json twin on every case class") {
    graft.plans.GraftExtensions.ensure(spark)
    val df = cases.toDF("j")
      .select(
        col("j"),
        call_function("graft_json_long", col("j"), lit("k")).as("kernel"),
        from_json(col("j"), StructType(Seq(StructField("k", LongType))))
          .getField("k").as("twin"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"mismatch on ${r.getString(0)}: kernel=${r.get(1)} twin=${r.get(2)}")
    }
    // and the values are what the contract says
    val byInput = rows.map(r => r.getString(0) -> r.get(1)).toMap
    assert(byInput("""{"k": 42}""") == 42L)
    assert(byInput("""{"k": 1, "k": 2}""") == 2L)
    assert(byInput("""{"nested": {"k": 9}}""") == null)
    assert(byInput("""{"k": 9223372036854775807}""") == Long.MaxValue)
  }
}
