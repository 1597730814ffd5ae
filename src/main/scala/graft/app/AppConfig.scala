package graft.app

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/**
 * Minimal `.env`-style config source (reference: load_dotenv +
 * os.getenv, omnichannel_to_bq.py:12-13,127-129,207; SURVEY.md §2.1-S9).
 *
 * Precedence: real environment variables win over file entries (same as
 * python-dotenv's default `override=False`). File syntax: `KEY=VALUE`
 * lines; `#` comments and blank lines ignored; surrounding single/double
 * quotes on the value stripped; whitespace around the key trimmed.
 */
final class AppConfig(fileEntries: Map[String, String],
                      env: Map[String, String]) {
  def get(key: String): Option[String] =
    env.get(key).orElse(fileEntries.get(key))
  def getOrElse(key: String, default: => String): String =
    get(key).getOrElse(default)
  def require(key: String): String =
    get(key).getOrElse(throw new IllegalArgumentException(
      s"missing required config key '$key' (set it in the env file or environment)"))
}

object AppConfig {

  def parseLine(line: String): Option[(String, String)] = {
    val t = line.trim
    if (t.isEmpty || t.startsWith("#") || !t.contains('=')) None
    else {
      val i = t.indexOf('=')
      val k = t.substring(0, i).trim
      var v = t.substring(i + 1).trim
      if (v.length >= 2 &&
          ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
        v = v.substring(1, v.length - 1)
      if (k.isEmpty) None else Some(k -> v)
    }
  }

  /** Load `.env`-style file (missing file = empty config, like dotenv). */
  def load(path: String = ".env",
           env: Map[String, String] = sys.env): AppConfig = {
    val p = Paths.get(path)
    val entries =
      if (!Files.exists(p)) Map.empty[String, String]
      else Files.readAllLines(p).asScala.flatMap(parseLine).toMap
    new AppConfig(entries, env)
  }
}
