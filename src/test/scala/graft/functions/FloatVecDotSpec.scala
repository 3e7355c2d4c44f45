package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** FloatVecDot must be bit-identical to the higher-order-function
  * formulation it replaces (`aggregate(zip_with(...))`) on every input
  * shape — the vector queries' oracle equality rides on that parity.
  */
class FloatVecDotSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("matches the HOF dot bit-for-bit on 200 random float vectors") {
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(200)((
      Array.fill(1 + rnd.nextInt(64))(rnd.nextFloat() * 20 - 10),
      1 + rnd.nextInt(64))).map { case (a, n) =>
      (a, Array.fill(a.length)(rnd.nextFloat() * 20 - 10)) // same length
    }
    val df = rows.toDF("a", "b")
      .select(FloatVecDot.fvecDot(col("a"), col("b")).as("fast"),
        hofDot(col("a"), col("b")).as("hof"))
    val bad = df.filter(col("fast") =!= col("hof") ||
      col("fast").isNull =!= col("hof").isNull).count()
    assert(bad === 0L)
  }

  test("edge cases: empty, unequal length, null element, null array, mixed types") {
    // empty arrays -> 0.0 (the aggregate's init), like the HOF form
    val empty = Seq((Array.empty[Float], Array.empty[Float])).toDF("a", "b")
      .select(FloatVecDot.fvecDot(col("a"), col("b")).as("d")).collect().head
    assert(!empty.isNullAt(0) && empty.getDouble(0) === 0.0)

    // unequal lengths -> null (zip_with pads null, null poisons the sum)
    val unequal = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
      .select(FloatVecDot.fvecDot(col("a"), col("b")).as("d")).collect().head
    assert(unequal.isNullAt(0))

    // null element -> null
    val withNull = Seq((Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](1.0f, 1.0f)))
      .toDF("a", "b")
      .select(FloatVecDot.fvecDot(col("a"), col("b")).as("d")).collect().head
    assert(withNull.isNullAt(0))

    // null array -> null
    val nullArr = Seq((null.asInstanceOf[Array[Float]], Array(1.0f))).toDF("a", "b")
      .select(FloatVecDot.fvecDot(col("a"), col("b")).as("d")).collect().head
    assert(nullArr.isNullAt(0))

    // float x double (the LSH hyperplane literals are double arrays)
    val mixed = Seq((Array(0.5f, -2.0f), Array(2.0, 0.25))).toDF("a", "b")
      .select(FloatVecDot.fvecDot(col("a"), col("b")).as("fast"),
        hofDot(col("a"), col("b")).as("hof")).collect().head
    assert(mixed.getDouble(0) === mixed.getDouble(1))
    assert(mixed.getDouble(0) === 0.5 * 2.0 + -2.0 * 0.25)
  }

  test("SQL registration exposes fvec_dot and survives codegen") {
    FloatVecDot.register(spark)
    val out = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 1.0f, 1.0f)))
      .toDF("a", "b").createOrReplaceTempView("fv")
    val r = spark.sql("SELECT fvec_dot(a, b) AS d FROM fv").collect().head
    assert(r.getDouble(0) === 6.0)
  }
}
