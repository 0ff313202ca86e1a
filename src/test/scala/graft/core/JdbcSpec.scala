package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JDBC source/sink parity (reference: Postgres catalog + offline store,
  * README.md:16, sqlmodel dep projects/feray/pyproject.toml:27). Derby ships
  * with Spark, so the same `df.write.jdbc` path that would target Postgres is
  * exercised end-to-end against an embedded Derby database. */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  test("jdbc round-trip: write a feature table, read it back, push a filter") {
    val url = s"jdbc:derby:${tmpDir("derby")}/graftdb;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")

    val df = Seq((1L, "a", 10.5), (2L, "b", 20.5), (3L, "c", 30.5))
      .toDF("entity_id", "name", "score")
    df.write.mode("overwrite").jdbc(url, "features", props)

    val back = spark.read.jdbc(url, "features", props)
    assert(back.count() == 3)
    assert(back.schema.fieldNames.toSet == Set("entity_id", "name", "score"))
    // predicate pushdown to the JDBC source (shows up as a WHERE in the
    // generated SQL; observable: filtered count without full scan semantics)
    val filtered = back.filter(col("score") > 15.0)
    assert(filtered.count() == 2)
    // partitioned parallel read (the 100 TB ingest shape: one task per range)
    val ranged = spark.read.jdbc(url, "features", "entity_id", 1L, 4L, 2, props)
    assert(ranged.rdd.getNumPartitions == 2)
    assert(ranged.count() == 3)
  }
}
