package graft.tools

/** Dev-only: dump SparkEntry.oracleSql as JSON for local oracle linting
  * (scripts/oracle_check.py's HUGEINT scan over the full corpus). */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val m = graft.SparkEntry.oracleSql
    val parts = m.toSeq.sortBy(_._1).map { case (k, v) =>
      val esc = v.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\t' => "\\t"
        case '\r' => "\\r"
        case c    => c.toString
      }
      "\"" + k + "\": \"" + esc + "\""
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(args(0)),
      ("{" + parts.mkString(",\n") + "}").getBytes("UTF-8"))
    println(s"dumped ${m.size}")
  }
}
