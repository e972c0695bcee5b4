package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** Layered-config precedence — ports the reference's config tests
  * (tests/unit/test_config.py:10-33) onto ScragConfig, plus the
  * config→cascade/chunk wiring.
  */
class ConfigSpec extends AnyFunSuite {

  test("layers merge with the documented precedence (test_config.py:10-27)") {
    val defaults = Map(
      "logging" -> Map("level" -> "INFO"),
      "feature" -> Map("enabled" -> false))
    val layers = Map(
      "staging" -> Map("feature" -> Map("enabled" -> true)))
    val cfg = ScragConfig.resolve(
      environment = "staging",
      layers = layers,
      runtimeOverrides = Map("logging" -> Map("level" -> "DEBUG")),
      baseDefaults = defaults)
    assert(cfg.environment == "staging")
    assert(cfg.get("feature.enabled") == true) // env layer beats default
    assert(cfg.get("logging.level") == "DEBUG") // runtime beats both
  }

  test("dotted get returns the default for missing paths (test_config.py:30-33)") {
    val cfg = ScragConfig.resolve(baseDefaults = Map.empty)
    assert(cfg.get("nonexistent", "fallback") == "fallback")
    assert(cfg.get("a.b.c", "fb") == "fb")
    // traversal through a non-map value also falls back
    val cfg2 = ScragConfig.resolve(baseDefaults = Map("a" -> 1))
    assert(cfg2.get("a.b", "fb") == "fb")
  }

  test("deep merge: nested maps merge key-wise, scalars replace (config.py:47-54)") {
    val merged = ScragConfig.deepMerge(
      Map("a" -> Map("x" -> 1, "y" -> 2), "b" -> 10),
      Map("a" -> Map("y" -> 3, "z" -> 4), "b" -> Map("now" -> "a map")))
    assert(merged("a") == Map("x" -> 1, "y" -> 3, "z" -> 4))
    assert(merged("b") == Map("now" -> "a map")) // non-map→map replaces
  }

  test("missing environment layer contributes nothing (like a missing env.yml)") {
    val cfg = ScragConfig.resolve(environment = "prod")
    assert(cfg.get("pipeline.minimum_content_length") == 200)
  }

  test("config drives CascadeConfig: extractor order + min length") {
    val cfg = ScragConfig.resolve(
      runtimeOverrides = Map("pipeline" -> Map(
        "extractors" -> Seq("http", "readability"),
        "minimum_content_length" -> 50)))
    val cc = ScragConfig.cascadeConfig(cfg)
    assert(cc.strategies == Seq("http", "readability"))
    assert(cc.minContentLength == 50)
    // defaults unchanged elsewhere
    val base = ScragConfig.cascadeConfig(ScragConfig.resolve())
    assert(base.strategies == Seq("newspaper", "readability", "http"))
    assert(base.minContentLength == 200)
  }

  test("config drives ChunkConfig") {
    val cfg = ScragConfig.resolve(
      runtimeOverrides = Map("chunking" -> Map(
        "chunk_size" -> 128, "preserve_sentences" -> false)))
    val ch = ScragConfig.chunkConfig(cfg)
    assert(ch.chunkSize == 128 && !ch.preserveSentences)
    assert(ch.overlap == 50 && ch.minChunkSize == 50) // untouched defaults
  }
}
