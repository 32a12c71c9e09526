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

  /** Glue words carry no relevance signal and dilute per-term averages —
    * "customer purchases by country" should score over 3 terms, not 4. */
  private val Stopwords = Set("a", "an", "the", "by", "of", "in", "on",
    "for", "with", "to", "and", "or", "from", "per", "all")

  def search(spark: SparkSession, query: String, limit: Int = 10): Seq[Hit] =
    search(spark, query, limit, NullEnricher, "")

  /** Search with remote-catalog enrichment: descriptions the Spark
    * catalog doesn't carry (JDBC-registered tables) are looked up through
    * the enricher (information_schema / pg_catalog / REMARKS probes —
    * [[InformationSchemaEnricher]]), so a column whose remote comment
    * explains an opaque name still ranks. Declared YAML comments win
    * where both exist. */
  def search(spark: SparkSession, query: String, limit: Int,
      enricher: MetadataEnricher, source: String): Seq[Hit] = {
    val raw = tokenize(query)
    val terms = { val t = raw.filterNot(Stopwords); if (t.isEmpty) raw else t }
    if (terms.isEmpty) return Nil
    val qVec = embed(terms)
    val tables = spark.catalog.listTables().collect()
    def describe(table: String, column: Option[String], declared: String): String =
      Option(declared).filter(_.nonEmpty)
        .orElse(enricher.enrich(table, column, source)).getOrElse("")
    val hits = tables.flatMap { t =>
      val cols =
        try spark.catalog.listColumns(t.name).collect().toSeq
        catch { case _: Exception => Nil }
      val tableScore = score(terms, tokenize(t.name))
      // document-level embedding over the table's whole metadata text
      // (name + columns + types + comments), the search.py unit of
      // indexing: cross-term evidence accumulates even when no single
      // token matches outright. Weighted below the exact-token tier so a
      // literal name match always outranks a paraphrase.
      val doc = tokenize(t.name) ++
        tokenize(describe(t.name, None, "")) ++ cols.flatMap(c =>
          tokenize(c.name) ++ tokenize(c.dataType) ++
            tokenize(describe(t.name, Some(c.name), c.description)))
      val sem = 0.85 * cosine(qVec, embed(doc))
      val tableHit =
        if (math.max(tableScore, sem) > 0.15)
          Seq(Hit(t.name, None, math.max(tableScore, sem)))
        else Nil
      val colHits = cols.flatMap { c =>
        // comments (declared in YAML, carried as field metadata, or
        // probed from the remote catalog) count toward relevance — an
        // agent searching "customer churn risk" should hit a column
        // whose comment says so even if the name is an opaque code
        val s = score(terms, tokenize(c.name) ++ tokenize(c.dataType) ++
          tokenize(describe(t.name, Some(c.name), c.description)))
        if (s > 0) Some(Hit(t.name, Some(c.name), s)) else None
      }
      tableHit ++ colHits
    }
    hits.sortBy(h => (-h.score, h.table, h.column.getOrElse(""))).take(limit).toSeq
  }

  // ------------------------------------------------- hash-ngram embedding

  /** Embedding dimensionality. 256 keeps collisions rare for identifier
    * vocabularies while the vectors stay trivially cheap. */
  private val Dim = 256

  /** Deterministic hash-ngram embedding — the no-model stand-in for the
    * reference's LanceDB vectors (search.py embeds `table col type desc`
    * text per column; here the same text embeds via signed feature
    * hashing). Features per token: the word itself, its light stem, its
    * synonym GROUP (so "purchases" and "orders" share a dimension), and
    * its character trigrams (morphology). Signed hashing (the sign bit of
    * the feature hash) keeps collisions unbiased. The serving path scores
    * a catalog's worth of vectors driver-side; at index scale the same
    * vectors go in a DataFrame and rank with the codegen'd
    * `graft_cosine` — identical arithmetic. */
  private[graft] def embed(tokens: Seq[String]): Array[Double] = {
    val v = new Array[Double](Dim)
    def add(feature: String, w: Double): Unit = {
      val h = graft.functions.PortableHash.hash63(
        feature.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val sign = if (((h >> 32) & 1L) == 0L) 1.0 else -1.0
      v((h % Dim).toInt) += w * sign
    }
    tokens.foreach { t =>
      add("w:" + t, 1.0)
      val st = stem(t)
      if (st != t) add("w:" + st, 0.8)
      (synonymId.get(t) orElse synonymId.get(st)).foreach(g => add("g:" + g, 1.0))
      trigrams(t).foreach(tri => add("t:" + tri, 0.3))
    }
    v
  }

  /** Plural-stripping stem — enough for identifier vocabulary
    * ("purchases"→"purchase", "orders"→"order"); no Porter machinery. */
  private def stem(t: String): String =
    if (t.length > 3 && t.endsWith("ies")) t.dropRight(3) + "y"
    else if (t.length > 2 && t.endsWith("es") && !t.endsWith("ses")) t.dropRight(1)
    else if (t.length > 2 && t.endsWith("s") && !t.endsWith("ss")) t.dropRight(1)
    else t

  /** Same arithmetic as the codegen'd graft_cosine expression. */
  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  private def tokenize(s: String): Seq[String] =
    s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  private def score(query: Seq[String], target: Seq[String]): Double = {
    if (target.isEmpty) return 0
    val targetSet = target.toSet
    query.map { q =>
      if (targetSet.contains(q)) 1.0
      else {
        // synonym groups match through the light stem on either side:
        // "purchases" must find the order group even though only
        // "purchase" is in the lexicon
        def groupOf(w: String): Option[Int] =
          synonymId.get(w) orElse synonymId.get(stem(w))
        val syn = groupOf(q)
          .exists(g => target.exists(t => groupOf(t).contains(g)))
        if (syn) 0.9
        else {
          val tri = target.map(t => trigramCosine(q, t)).maxOption.getOrElse(0.0)
          // containment needs ≥3 chars on both sides: single-letter
          // prefix tokens ("c", "r") would otherwise substring-match
          // every query term at 0.5
          lazy val sub = target.exists(t => t.length >= 3 && q.length >= 3 &&
            (t.contains(q) || q.contains(t)))
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
