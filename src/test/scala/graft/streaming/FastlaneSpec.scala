package graft.streaming

import graft.SparkSpec
import graft.core.{FeatureDef, FeatureStore}
import org.apache.spark.sql.functions._

class FastlaneSpec extends SparkSpec {
  import spark.implicits._

  private val feature = FeatureDef(
    name = "user_value_sum",
    entityKeys = Seq("user_id"),
    codeVersion = "v1",
    transform = df => df.groupBy("user_id")
      .agg(sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"),
        count(lit(1)).as("n")))

  test("fastlane stream: micro-batches upsert into the feature store") {
    val root = tmpDir("fastlane")
    val store = new FeatureStore(root)
    val srcDir = tmpDir("fastlane_src")

    // batch 1 lands before the stream starts (AvailableNow drains it)
    Seq((1L, 10.0), (2L, 5.0), (1L, 2.5)).toDF("user_id", "value")
      .write.mode("overwrite").json(s"$srcDir/b1")

    val stream = spark.readStream
      .schema("user_id LONG, value DOUBLE")
      .json(s"$srcDir/*")
    val q = Fastlane.serve(feature, stream, store, tmpDir("fastlane_ckpt"))
    q.awaitTermination(60000)

    val out = store.read(feature.name)
      .select("user_id", "sum_value").as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 12.5, 2L -> 5.0))

    // fastlane single-row (warm session) path: upsert user 2
    Fastlane.serveOnce(feature, Seq((2L, 100.0)).toDF("user_id", "value"), store)
    val out2 = store.read(feature.name)
      .select("user_id", "sum_value").as[(Long, Double)].collect().toMap
    assert(out2 == Map(1L -> 12.5, 2L -> 100.0))
    // history preserved: pre-upsert version still readable (time travel)
    assert(store.versions(feature.name).size >= 2)
  }

  test("same transform in batch and fastlane produces identical results") {
    val rootA = tmpDir("modeA"); val rootB = tmpDir("modeB")
    val storeA = new FeatureStore(rootA); val storeB = new FeatureStore(rootB)
    val data = Seq((1L, 1.0), (1L, 2.0), (2L, 3.0)).toDF("user_id", "value")
    // batch
    storeA.write(feature.transform(data), feature.name)
    // fastlane warm path
    Fastlane.serveOnce(feature, data, storeB)
    val a = storeA.read(feature.name).select("user_id", "sum_value", "n")
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    val b = storeB.read(feature.name).select("user_id", "sum_value", "n")
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }
}
