package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TypedAggsSpec extends SparkSpec {
  import spark.implicits._

  test("Welford variance matches the exact decimal formulation across partitions") {
    val bal = Tables.load(spark, sfDir, "customer")
      .select(col("c_acctbal")).as[Double]
      .repartition(7) // force non-trivial merge path
    val m = bal.select(TypedAggs.welford).head()

    val x = col("c_acctbal").cast("decimal(18,4)")
    val exact = Tables.load(spark, sfDir, "customer")
      .agg(count(lit(1)).as("n"), sum(x).cast("double").as("sx"),
        sum(x * x).cast("double").as("sxx"))
      .select(col("n"),
        (col("sx") / col("n")).as("mean"),
        ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)).as("v"))
      .as[(Long, Double, Double)].head()

    assert(m.n == exact._1)
    assert(math.abs(m.mean - exact._2) < 1e-9)
    assert(math.abs(m.varSamp - exact._3) / exact._3 < 1e-9)
  }

  test("typed Dataset flatMap: one row to many (table-UDF shape)") {
    val docs = Seq((1L, "a b"), (2L, "c")).toDF("id", "text")
      .as[(Long, String)]
    val out = docs.flatMap { case (id, t) => t.split(" ").map(w => (id, w)) }
      .collect().toSet
    assert(out == Set((1L, "a"), (1L, "b"), (2L, "c")))
  }
}
