package graft

import graft.sources.Readers

/** Source-format availability probes (the formats themselves are
  * oracle-gated through the src_json/src_csv/src_orc catalog
  * entries). */
class SourcesSpec extends SparkSpecBase {

  test("avro source: round-trips when the DataSource ships, clear error otherwise") {
    if (Readers.avroAvailable) {
      val dir = java.nio.file.Files.createTempDirectory("graft_avro").toString
      Readers.writeAvro(spark.range(5).toDF("v"), s"$dir/a")
      assert(Readers.avro(spark, s"$dir/a").count() === 5)
      // metadata sink path resolves the format name the same way
      graft.sinks.Writers.write(spark.range(7).toDF("v"),
        graft.meta.SinkSpec(input = "x", name = "s",
          paths = Seq(s"$dir/b"), format = "avro", saveMode = "overwrite"))
      assert(Readers.avro(spark, s"$dir/b").count() === 7)
    } else {
      // this deployment carries only avro-core jars, not the
      // spark-avro DataSource — the probe must say so, not throw a
      // ClassNotFoundException from the source resolver
      val f = java.nio.file.Files.createTempFile("graft_probe", ".avro")
      val ex = intercept[IllegalArgumentException] {
        Readers.read(spark,
          graft.meta.SourceSpec("a", f.toString, "avro", Map.empty))
      }
      assert(ex.getMessage.contains("spark-avro"))
    }
  }
}
