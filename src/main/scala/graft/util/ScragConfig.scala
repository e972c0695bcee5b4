package graft.util

import graft.extract.CascadeConfig
import graft.text.ChunkConfig

/** Layered runtime configuration (reference core/utils/config.py:13-70):
  * `default` layer ← environment layer ← runtime overrides, combined by
  * a recursive deep merge (nested maps merge key-wise, anything else is
  * replaced), then read with dotted-path `get`.
  *
  * The reference reads the layers from YAML files in a config dir
  * (config.py:57-64); no YAML parser ships in this sandbox, so layers
  * are plain `Map[String, Any]` values — the precedence machinery and
  * the dotted accessor are the semantics under test
  * (tests/unit/test_config.py:10-33), not the file format.
  */
final case class ScragConfig(environment: String, data: Map[String, Any]) {

  /** Dotted-path access (config.py:20-29): returns `default` as soon as
    * a path segment is missing or the current value is not a map.
    */
  def get(key: String, default: Any = null): Any = {
    var value: Any = data
    val parts = key.split("\\.")
    var i = 0
    while (i < parts.length) {
      value match {
        case m: Map[_, _] =>
          m.asInstanceOf[Map[String, Any]].get(parts(i)) match {
            case Some(v) => value = v
            case None => return default
          }
        case _ => return default
      }
      i += 1
    }
    value
  }

  def getInt(key: String, default: Int): Int = get(key, default) match {
    case i: Int => i
    case l: Long => l.toInt
    case s: String => s.toInt
    case other => other.asInstanceOf[Int]
  }

  def getBoolean(key: String, default: Boolean): Boolean =
    get(key, default).asInstanceOf[Boolean]

  def getString(key: String, default: String): String =
    String.valueOf(get(key, default))

  def getSeq(key: String, default: Seq[String] = Nil): Seq[String] =
    get(key, default) match {
      case s: Seq[_] => s.map(String.valueOf)
      case other => Seq(String.valueOf(other))
    }

  /** Pretty JSON of the resolved config with the environment name as a
    * top-level key — what the reference's `info` verb prints
    * (config.py:31 to_pretty_json; tests assert `"environment"` appears
    * in stdout).
    */
  def toPrettyJson: String = {
    def render(v: Any, indent: String): String = v match {
      case m: Map[_, _] =>
        val inner = m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
          .map { case (k, x) => s"""$indent  "$k": ${render(x, indent + "  ")}""" }
        if (inner.isEmpty) "{}" else inner.mkString("{\n", ",\n", s"\n$indent}")
      case s: Seq[_] => s.map(render(_, indent)).mkString("[", ", ", "]")
      case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      case b: Boolean => b.toString
      case n @ (_: Int | _: Long | _: Double) => n.toString
      case null => "null"
      case other => "\"" + String.valueOf(other) + "\""
    }
    render(Map("environment" -> environment) ++ data, "")
  }
}

object ScragConfig {

  /** The default extractor cascade order (config/default.yml:8-11) —
    * exposed so callers (Cli --async) ride the same source of truth as
    * the layered-config resolution instead of inlining the literal.
    */
  val defaultExtractors: Seq[String] = Seq("newspaper", "readability", "http")

  /** The reference's shipped defaults (config/default.yml) for the
    * components this engine implements.
    */
  val defaults: Map[String, Any] = Map(
    "pipeline" -> Map(
      "extractors" -> defaultExtractors,
      "processors" -> Seq("normalize_whitespace"),
      "minimum_content_length" -> 200),
    "chunking" -> Map(
      "chunk_size" -> 512,
      "chunk_overlap" -> 50,
      "min_chunk_size" -> 50,
      "preserve_sentences" -> true),
    "retrieval" -> Map(
      "top_k" -> 10,
      "threshold" -> 0.0))

  /** Recursive deep merge (config.py:47-54): map-over-map merges
    * key-wise; any other override value replaces the base value.
    */
  def deepMerge(base: Map[String, Any], override_ : Map[String, Any]): Map[String, Any] =
    override_.foldLeft(base) { case (acc, (k, v)) =>
      (acc.get(k), v) match {
        case (Some(bm: Map[_, _]), vm: Map[_, _]) =>
          acc.updated(k, deepMerge(
            bm.asInstanceOf[Map[String, Any]], vm.asInstanceOf[Map[String, Any]]))
        case _ => acc.updated(k, v)
      }
    }

  /** load_config precedence (config.py:57-70): defaults ← the named
    * environment's layer ← runtime overrides. A missing environment
    * layer contributes nothing (like a missing `<env>.yml`).
    */
  def resolve(
      environment: String = "default",
      layers: Map[String, Map[String, Any]] = Map.empty,
      runtimeOverrides: Map[String, Any] = Map.empty,
      baseDefaults: Map[String, Any] = defaults): ScragConfig = {
    val env = layers.getOrElse(environment, Map.empty[String, Any])
    ScragConfig(environment, deepMerge(deepMerge(baseDefaults, env), runtimeOverrides))
  }

  /** Config-driven cascade (the reference's config-ordered extractor
    * list, core/pipeline.py:40-47 over config/default.yml:8-11).
    */
  def cascadeConfig(c: ScragConfig): CascadeConfig =
    CascadeConfig(
      strategies = c.getSeq("pipeline.extractors", CascadeConfig().strategies),
      minContentLength = c.getInt("pipeline.minimum_content_length", 200))

  def chunkConfig(c: ScragConfig): ChunkConfig =
    ChunkConfig(
      chunkSize = c.getInt("chunking.chunk_size", 512),
      overlap = c.getInt("chunking.chunk_overlap", 50),
      minChunkSize = c.getInt("chunking.min_chunk_size", 50),
      preserveSentences = c.getBoolean("chunking.preserve_sentences", true))
}
