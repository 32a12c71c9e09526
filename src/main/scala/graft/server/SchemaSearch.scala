package graft.server

import org.apache.spark.sql.SparkSession

/** Keyword schema search over catalog metadata — the engine-side analog of
  * the reference's `search_schemas` MCP tool (semantic search over a
  * table/column metadata index, /root/reference/python/strake/search.py
  * and metadata enrichment in python/strake/metadata.py:42-260). The
  * reference embeds metadata with an ML model; offline we rank by token
  * overlap + substring affinity, which the MCP layer can swap for an
  * embedding index without changing the surface.
  */
object SchemaSearch {

  final case class Hit(table: String, column: Option[String], score: Double)

  def search(spark: SparkSession, query: String, limit: Int = 10): Seq[Hit] = {
    val terms = tokenize(query)
    if (terms.isEmpty) return Nil
    val tables = spark.catalog.listTables().collect()
    val hits = tables.flatMap { t =>
      val tableScore = score(terms, tokenize(t.name))
      val tableHit = if (tableScore > 0) Seq(Hit(t.name, None, tableScore)) else Nil
      val colHits =
        try spark.catalog.listColumns(t.name).collect().toSeq.flatMap { c =>
          // comments (declared in YAML, carried as field metadata) count
          // toward relevance — an agent searching "customer churn risk"
          // should hit a column whose comment says so even if the name is
          // an opaque code
          val s = score(terms, tokenize(c.name) ++ tokenize(c.dataType) ++
            tokenize(Option(c.description).getOrElse("")))
          if (s > 0) Some(Hit(t.name, Some(c.name), s)) else None
        } catch { case _: Exception => Nil }
      tableHit ++ colHits
    }
    hits.sortBy(h => (-h.score, h.table, h.column.getOrElse(""))).take(limit).toSeq
  }

  private def tokenize(s: String): Seq[String] =
    s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  private def score(query: Seq[String], target: Seq[String]): Double = {
    if (target.isEmpty) return 0
    val targetSet = target.toSet
    query.map { q =>
      if (targetSet.contains(q)) 1.0
      else if (target.exists(t => t.contains(q) || q.contains(t))) 0.5
      else 0.0
    }.sum / query.size
  }
}
