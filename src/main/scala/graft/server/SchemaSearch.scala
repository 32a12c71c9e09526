package graft.server

import org.apache.spark.sql.SparkSession

/** Schema search over catalog metadata — the engine-side analog of the
  * reference's `search_schemas` MCP tool (semantic search over a
  * table/column metadata index, /root/reference/python/strake/search.py
  * and metadata enrichment in python/strake/metadata.py:42-260).
  *
  * The reference embeds metadata with an ML model (LanceDB vector index);
  * offline, relevance is layered deterministically so synonym-level recall
  * survives without a model:
  *   1. exact token match (1.0);
  *   2. curated data-domain synonym groups (0.9) — "client attrition"
  *     finds a churn column, "vendor" finds supplier tables;
  *   3. character-trigram cosine (≤0.7) — morphological variants
  *     ("shipped"/"shipment", "custkey"/"customer") without a stemmer;
  *   4. substring affinity (0.5).
  * The MCP layer can swap in an embedding index without changing the
  * surface.
  */
object SchemaSearch {

  final case class Hit(table: String, column: Option[String], score: Double)

  /** Symmetric synonym groups for the data-warehouse domain. Deliberately
    * small and curated: each group is a set of tokens an analyst uses
    * interchangeably when hunting for a table. */
  private val SynonymGroups: Seq[Set[String]] = Seq(
    Set("churn", "attrition", "retention"),
    Set("revenue", "sales", "income", "earnings", "totalprice"),
    Set("customer", "client", "account", "buyer"),
    Set("user", "member", "visitor"),
    Set("price", "cost", "amount", "charge", "fee"),
    Set("discount", "rebate", "markdown"),
    Set("tax", "vat", "duty"),
    Set("date", "day", "time", "timestamp"),
    Set("region", "territory", "area", "location", "geo"),
    Set("quantity", "qty", "count", "volume", "units"),
    Set("supplier", "vendor", "provider", "seller"),
    Set("order", "purchase", "transaction", "sale"),
    Set("risk", "score", "probability", "likelihood"),
    Set("product", "item", "part", "sku", "goods"),
    Set("nation", "country"),
    Set("address", "street", "residence"),
    Set("phone", "telephone", "contact"),
    Set("balance", "bal", "acctbal"),
    Set("comment", "note", "remark", "description"),
    Set("status", "state", "flag"),
    Set("priority", "urgency", "severity"),
    Set("ship", "shipment", "shipping", "delivery", "freight"),
    Set("document", "text", "doc", "content"),
    Set("language", "lang", "locale"),
    Set("embedding", "vector", "vec"))

  private val synonymId: Map[String, Int] =
    SynonymGroups.zipWithIndex.flatMap { case (g, i) => g.map(_ -> i) }.toMap

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
      else {
        val syn = synonymId.get(q)
          .exists(g => target.exists(t => synonymId.get(t).contains(g)))
        if (syn) 0.9
        else {
          val tri = target.map(t => trigramCosine(q, t)).maxOption.getOrElse(0.0)
          lazy val sub = target.exists(t => t.contains(q) || q.contains(t))
          // the trigram tier outranks-or-equals the substring tier by
          // design: floor it at 0.5 so a close morphological match never
          // ranks below a weaker containment match
          if (tri >= 0.45) math.max(0.7 * tri, 0.5)
          else if (sub) 0.5
          else 0.0
        }
      }
    }.sum / query.size
  }

  /** Cosine similarity over padded character trigrams — the no-model
    * stand-in for embedding distance on short identifiers. */
  private def trigramCosine(a: String, b: String): Double = {
    if (a == b) return 1.0
    if (a.length < 2 || b.length < 2) return 0.0
    val ta = trigrams(a); val tb = trigrams(b)
    if (ta.isEmpty || tb.isEmpty) 0.0
    else ta.intersect(tb).size.toDouble / math.sqrt(ta.size.toDouble * tb.size)
  }

  private def trigrams(s: String): Set[String] = {
    val padded = s"__${s}_"
    (0 to padded.length - 3).map(i => padded.substring(i, i + 3)).toSet
  }
}
