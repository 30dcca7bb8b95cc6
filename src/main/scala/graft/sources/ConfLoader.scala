package graft.sources

/** Minimal flat-HOCON/properties loader for CLI defaults.
  *
  * The reference app is configured via `ConfigFactory.load(propFileName)`
  * over a FLAT key=value file (reference `conf/sessionize.conf`:
  * `kafka.topic.in=raw`, `flink.parallelism=120`, ... — no nesting,
  * substitution, or includes). This loader covers exactly that dialect:
  *
  *  - `#` / `//` comment lines and blank lines;
  *  - `key = value`, `key: value`, `key=value` (first separator wins);
  *  - values optionally wrapped in double quotes (the reference quotes
  *    `flink.job.name="khone_prod"`);
  *  - later duplicate keys override earlier ones (HOCON semantics).
  *
  * Deliberately NOT a full HOCON implementation: the container resolves no
  * new dependencies (typesafe-config is unavailable), and the reference
  * file exercises none of HOCON's extended syntax.
  */
object ConfLoader {

  def parse(lines: Iterator[String]): Map[String, String] =
    lines
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith("//"))
      .flatMap { l =>
        val sep = l.indexWhere(c => c == '=' || c == ':')
        if (sep <= 0) None
        else {
          val k = l.substring(0, sep).trim
          val raw = l.substring(sep + 1).trim
          val v =
            if (raw.length >= 2 && raw.startsWith("\"") && raw.endsWith("\""))
              raw.substring(1, raw.length - 1)
            else raw
          Some(k -> v)
        }
      }
      .toMap // later duplicates override: Iterator->Map keeps the last value

  def load(path: String): Map[String, String] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }
}
