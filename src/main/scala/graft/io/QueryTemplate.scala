package graft.io

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** F10 — the reference's two templating dialects and the folder
  * UNION-ALL combiner (SURVEY.md §2.8, §2.7 U1).
  *
  *  - `{{ var }}` Jinja-style block-range substitution
  *    (`clickhouse/v1/utils.py:237-251`, `operator.py:442-447`)
  *  - `[[ var ]]` environment routing, exact-token replace so it can't
  *    collide with SQL array syntax (`bigquery/utils.py:43-53`,
  *    `format_sql_query` at `clickhouse/v1/utils.py:215-219`)
  *  - recursive folder walk joining every .sql file with UNION ALL
  *    (`join_bigquery_queries_in_folder`, `bigquery/utils.py:56-83`)
  */
object QueryTemplate {

  /** Render `{{ key }}` (whitespace-tolerant) occurrences. */
  def renderJinja(sql: String, vars: Map[String, String]): String =
    vars.foldLeft(sql) { case (s, (k, v)) =>
      s.replaceAll("\\{\\{\\s*" + java.util.regex.Pattern.quote(k) + "\\s*\\}\\}",
        java.util.regex.Matcher.quoteReplacement(v))
    }

  /** Render `[[ key ]]` exact-token occurrences. */
  def renderBracket(sql: String, vars: Map[String, String]): String =
    vars.foldLeft(sql) { case (s, (k, v)) =>
      s.replace(s"[[ $k ]]", v).replace(s"[[$k]]", v)
    }

  /** U1: all .sql files under `folder` (recursive), joined with UNION ALL
    * in deterministic path order. */
  def unionAllFolder(folder: String, render: String => String = identity): String = {
    val root = Paths.get(folder)
    val files = Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".sql"))
      .toSeq.sortBy(_.toString)
    files.map(p => render(new String(Files.readAllBytes(p)).trim))
      .mkString("\n \n UNION ALL \n \n")
  }
}
