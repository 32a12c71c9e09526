package graft.operators

/** DuckDB oracles for the sample-trained ANN queries — the re-derivation
  * that graduates `s_ann_ivf` / `s_ann_pq` / `s_ann_ivfpq` from
  * rows-only to hash-verified. The training sample was always
  * deterministic (vec_id-filtered, ordered, limited); what was missing
  * was an independent engine re-running Lloyd's k-means to the SAME
  * doubles. These CTE chains do exactly that, on three disciplines:
  *
  *   - SEQUENTIAL-ORDER float math. Every dot/sum the Scala trainers
  *     ([[Similarity.kmeans]]/[[Similarity.kmeansL2]]) and the native
  *     kernels ([[graft.functions.NearestCentroid]]/PqEncode/PqLut/
  *     PqAdc) execute is a left fold in index order; the SQL mirrors
  *     each as `sum(x ORDER BY <index>)` (ordered aggregates accumulate
  *     sequentially — verified bit-identical to `list_reduce` folds) or
  *     the `list_reduce(list_prepend(0.0, ...))` fold the LSH oracle
  *     established. Same IEEE ops in the same order → bit-equal
  *     centroids, not approximately-equal ones.
  *   - EXPLICIT tie-breaks. Training argmax keeps the LOWER index
  *     (Scala `maxBy`); corpus assignment keeps the HIGHER
  *     (NearestCentroid's `>=` scan); probe ranking keeps the LOWER
  *     (TopCentroids). Each is one `row_number` ordering clause.
  *   - MATERIALIZED iteration CTEs. DuckDB inlines CTEs; five chained
  *     Lloyd iterations each referencing the previous twice would
  *     re-evaluate exponentially without `AS MATERIALIZED`.
  *
  * Outputs rank on ROUND(·, 6) values with vec_id tie-breaks (the
  * file-wide rank-stability discipline), so the final hash is immune to
  * last-ULP drift even if an engine changes its float printing.
  */
private[operators] object AnnOracleSql {
  private def fold(listExpr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), $listExpr), (a, x) -> a + x)"
  private def dotLL(a: String, b: String): String =
    fold(s"list_transform(list_zip($a, $b), p -> p[1] * p[2])")
  private val sq = fold("list_transform(v, x -> x * x)")

  /** The deterministic sample: vec_id % mod = 0, ordered, first n, cast
    * to doubles; then L2-normalized with the zero-norm guard
    * ([[Similarity]]'s `normalize`). */
  private def sampleCtes(p: String, mod: Int, n: Int): Seq[String] = Seq(
    s"""${p}samp AS MATERIALIZED (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS sid,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings WHERE vec_id % $mod = 0 ORDER BY vec_id LIMIT $n)""",
    s"""${p}snrm AS MATERIALIZED (
       |  SELECT sid, CASE WHEN $sq = 0 THEN v
       |              ELSE list_transform(v, x -> x / sqrt($sq)) END AS nv
       |  FROM ${p}samp)""")

  /** Lloyd's k-means in cosine space ([[Similarity.kmeans]]): init =
    * first k normalized sample points; per iteration argmax-dot
    * assignment (ties → lower cid), per-cluster sequential sums in
    * sample order, centroid = normalize(sum) (empty cluster keeps its
    * previous centroid). Emits `${p}cent(cid, cv)` with centroid lists. */
  def kmeansCosineCtes(p: String, mod: Int, n: Int, k: Int,
      iters: Int): Seq[String] = {
    val base = sampleCtes(p, mod, n) ++ Seq(
      s"""${p}dims AS MATERIALIZED (SELECT unnest(range(1, 65)) AS i)""",
      s"""${p}sd AS MATERIALIZED (
         |  SELECT sid, i - 1 AS d, nv[i] AS x FROM ${p}snrm CROSS JOIN ${p}dims)""",
      s"""${p}c0 AS MATERIALIZED (SELECT sid AS cid, d, x AS c FROM ${p}sd WHERE sid < $k)""")
    val iterations = (1 to iters).flatMap { it =>
      val pv = s"${p}c${it - 1}"
      Seq(
        s"""${p}dp$it AS MATERIALIZED (
           |  SELECT s.sid, c.cid, sum(s.x * c.c ORDER BY s.d) AS dp
           |  FROM ${p}sd s JOIN $pv c USING (d) GROUP BY s.sid, c.cid)""",
        s"""${p}a$it AS MATERIALIZED (SELECT sid, cid FROM (
           |  SELECT sid, cid, row_number() OVER (PARTITION BY sid ORDER BY dp DESC, cid ASC) AS rn
           |  FROM ${p}dp$it) WHERE rn = 1)""",
        s"""${p}sm$it AS MATERIALIZED (
           |  SELECT a.cid, s.d, sum(s.x ORDER BY s.sid) AS sm
           |  FROM ${p}sd s JOIN ${p}a$it a USING (sid) GROUP BY a.cid, s.d)""",
        s"""${p}nn$it AS MATERIALIZED (
           |  SELECT cid, sqrt(sum(sm * sm ORDER BY d)) AS nn FROM ${p}sm$it GROUP BY cid)""",
        s"""${p}c$it AS MATERIALIZED (
           |  SELECT m.cid, m.d, CASE WHEN n.nn = 0 THEN m.sm ELSE m.sm / n.nn END AS c
           |  FROM ${p}sm$it m JOIN ${p}nn$it n USING (cid)
           |  UNION ALL
           |  SELECT c.cid, c.d, c.c FROM $pv c
           |  WHERE c.cid NOT IN (SELECT cid FROM ${p}sm$it))""")
    }
    base ++ iterations :+
      s"""${p}cent AS MATERIALIZED (
         |  SELECT cid, list(c ORDER BY d) AS cv FROM ${p}c$iters GROUP BY cid)"""
  }

  /** Per-subspace L2 k-means ([[Similarity.kmeansL2]]) over all M
    * subspaces at once (the subspace id j is just a grouping column):
    * init = first Ksub sample slices; argmin squared-L2 (ties → lower),
    * centroid = mean (empty keeps previous). Emits
    * `${p}book(cid, j, t, c)` plus the `${p}js`/`${p}ts` dimension
    * helpers the encode phase reuses. */
  def pqBookCtes(p: String, mod: Int, n: Int, m: Int, ksub: Int,
      subDim: Int, iters: Int): Seq[String] = {
    val base = sampleCtes(p, mod, n) ++ Seq(
      s"""${p}js AS MATERIALIZED (SELECT unnest(range(0, $m)) AS j)""",
      s"""${p}ts AS MATERIALIZED (SELECT unnest(range(0, $subDim)) AS t)""",
      s"""${p}bd AS MATERIALIZED (
         |  SELECT s.sid, j.j, t.t, s.nv[j.j * $subDim + t.t + 1] AS x
         |  FROM ${p}snrm s CROSS JOIN ${p}js j CROSS JOIN ${p}ts t)""",
      s"""${p}b0 AS MATERIALIZED (SELECT sid AS cid, j, t, x AS c FROM ${p}bd WHERE sid < $ksub)""")
    val iterations = (1 to iters).flatMap { it =>
      val pv = s"${p}b${it - 1}"
      Seq(
        s"""${p}d$it AS MATERIALIZED (
           |  SELECT s.sid, s.j, c.cid, sum((s.x - c.c) * (s.x - c.c) ORDER BY s.t) AS d2
           |  FROM ${p}bd s JOIN $pv c ON s.j = c.j AND s.t = c.t
           |  GROUP BY s.sid, s.j, c.cid)""",
        s"""${p}a$it AS MATERIALIZED (SELECT sid, j, cid FROM (
           |  SELECT sid, j, cid, row_number() OVER (PARTITION BY sid, j ORDER BY d2 ASC, cid ASC) AS rn
           |  FROM ${p}d$it) WHERE rn = 1)""",
        s"""${p}s$it AS MATERIALIZED (
           |  SELECT a.cid, s.j, s.t, sum(s.x ORDER BY s.sid) AS sm, count(*) AS cnt
           |  FROM ${p}bd s JOIN ${p}a$it a ON s.sid = a.sid AND s.j = a.j
           |  GROUP BY a.cid, s.j, s.t)""",
        s"""${p}b$it AS MATERIALIZED (
           |  SELECT cid, j, t, sm / cnt AS c FROM ${p}s$it
           |  UNION ALL
           |  SELECT c.cid, c.j, c.t, c.c FROM $pv c
           |  WHERE NOT EXISTS (SELECT 1 FROM ${p}s$it s WHERE s.cid = c.cid AND s.j = c.j))""")
    }
    base ++ iterations :+
      s"""${p}book AS MATERIALIZED (SELECT cid, j, t, c FROM ${p}b$iters)"""
  }

  /** Corpus/query assignment against `${p}cent`: `cdp` holds every
    * (vector, centroid) dot; `asg` is NearestCentroid (ties → HIGHER
    * cid), `probes` is TopCentroids' best-`nprobe` (ties → lower cid)
    * for query vectors (vec_id < 5). */
  private def assignCtes(p: String, nprobe: Int): Seq[String] = Seq(
    s"""allv AS MATERIALIZED (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings)""",
    s"""cdp AS MATERIALIZED (
       |  SELECT a.vec_id, c.cid, ${dotLL("a.v", "c.cv")} AS dp
       |  FROM allv a CROSS JOIN ${p}cent c)""",
    s"""asg AS MATERIALIZED (SELECT vec_id, cid AS list_id FROM (
       |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dp DESC, cid DESC) AS rn
       |  FROM cdp) WHERE rn = 1)""",
    s"""probes AS MATERIALIZED (SELECT vec_id AS qid, cid AS list_id FROM (
       |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dp DESC, cid ASC) AS rn
       |  FROM cdp WHERE vec_id < 5) WHERE rn <= $nprobe)""")

  /** PQ encode/LUT shared phase against `${p}book`: `ad2` holds every
    * (vector, subspace, sub-centroid) squared distance over the
    * L2-normalized vector (PqEncode/PqLut's shared formula — elementwise
    * `v[i]·inv − c[t]`, sequential over t); `codes` is the corpus argmin
    * (ties → lower), `lut` keeps all distances for query vectors. */
  private def pqPhaseCtes(p: String, subDim: Int): Seq[String] = Seq(
    s"""ninv AS MATERIALIZED (SELECT vec_id, v,
       |  CASE WHEN $sq > 0 THEN 1.0 / sqrt($sq) ELSE 0.0 END AS inv FROM allv)""",
    s"""ud AS MATERIALIZED (
       |  SELECT n.vec_id, j.j, t.t, n.v[j.j * $subDim + t.t + 1] * n.inv AS u
       |  FROM ninv n CROSS JOIN ${p}js j CROSS JOIN ${p}ts t)""",
    s"""ad2 AS MATERIALIZED (
       |  SELECT d.vec_id, d.j, b.cid, sum((d.u - b.c) * (d.u - b.c) ORDER BY d.t) AS d2
       |  FROM ud d JOIN ${p}book b ON d.j = b.j AND d.t = b.t
       |  GROUP BY d.vec_id, d.j, b.cid)""",
    s"""codes AS MATERIALIZED (SELECT vec_id, j, cid AS code FROM (
       |  SELECT vec_id, j, cid, row_number() OVER (PARTITION BY vec_id, j ORDER BY d2 ASC, cid ASC) AS rn
       |  FROM ad2 WHERE vec_id >= 5) WHERE rn = 1)""",
    s"""lut AS MATERIALIZED (SELECT vec_id AS qid, j, cid, d2 FROM ad2 WHERE vec_id < 5)""")

  private def render(ctes: Seq[String], body: String): String =
    "WITH " + ctes.map(_.stripMargin).mkString(",\n") + "\n" + body.stripMargin

  /** s_ann_ivf: coarse k-means (sample %7, 128, k=8, 5 iters), probe
    * the 4 nearest lists per query, exact cosine rerank, top-10. */
  def ivfSql: String = render(
    kmeansCosineCtes("k_", mod = 7, n = 128, k = 8, iters = 5) ++
      assignCtes("k_", nprobe = 4) ++ Seq(
      s"""norms AS MATERIALIZED (SELECT vec_id, v, sqrt($sq) AS nrm FROM allv)""",
      s"""corpus AS MATERIALIZED (
         |  SELECT n.vec_id, n.v, n.nrm, a.list_id
         |  FROM norms n JOIN asg a USING (vec_id) WHERE n.vec_id >= 5)""",
      s"""qside AS MATERIALIZED (
         |  SELECT n.vec_id AS qid, n.v AS qv, n.nrm AS qn, p.list_id
         |  FROM norms n JOIN probes p ON p.qid = n.vec_id)""",
      s"""cand AS MATERIALIZED (
         |  SELECT q.qid, c.vec_id,
         |    round(coalesce(${dotLL("q.qv", "c.v")} / nullif(q.qn * c.nrm, 0), 0), 6) AS cos
         |  FROM corpus c JOIN qside q USING (list_id))"""),
    """SELECT qid, vec_id, cos, rn FROM (
      |  SELECT qid, vec_id, cos,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rn
      |  FROM cand) WHERE rn <= 10""")

  /** s_ann_pq: 16×16×4 sub-codebooks (sample %3, 256, 10 iters), flat
    * ADC scan of all corpus codes, top-10 per query on round-6 ADC. */
  def pqSql: String = render(
    pqBookCtes("q_", mod = 3, n = 256, m = 16, ksub = 16, subDim = 4,
      iters = 10) ++ Seq(
      s"""allv AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings)""") ++
      pqPhaseCtes("q_", subDim = 4) :+
      s"""adc AS MATERIALIZED (
         |  SELECT l.qid, c.vec_id, round(sum(l.d2 ORDER BY l.j), 6) AS adist
         |  FROM codes c JOIN lut l ON l.j = c.j AND l.cid = c.code
         |  GROUP BY l.qid, c.vec_id)""",
    """SELECT qid, vec_id, adist, rn FROM (
      |  SELECT qid, vec_id, adist,
      |    row_number() OVER (PARTITION BY qid ORDER BY adist ASC, vec_id ASC) AS rn
      |  FROM adc) WHERE rn <= 10""")

  /** s_ann_ivfpq: coarse k-means (sample %3, 256, k=8, 5 iters) prunes
    * to 4 probed lists; PQ codes + ADC score the candidates; top-10. */
  def ivfPqSql: String = render(
    kmeansCosineCtes("k_", mod = 3, n = 256, k = 8, iters = 5) ++
      pqBookCtes("q_", mod = 3, n = 256, m = 16, ksub = 16, subDim = 4,
        iters = 10) ++
      assignCtes("k_", nprobe = 4) ++
      pqPhaseCtes("q_", subDim = 4) ++ Seq(
      s"""cand AS MATERIALIZED (
         |  SELECT p.qid, a.vec_id FROM asg a JOIN probes p USING (list_id)
         |  WHERE a.vec_id >= 5)""",
      s"""adc AS MATERIALIZED (
         |  SELECT ca.qid, ca.vec_id, round(sum(l.d2 ORDER BY l.j), 6) AS adist
         |  FROM cand ca JOIN codes c ON c.vec_id = ca.vec_id
         |  JOIN lut l ON l.qid = ca.qid AND l.j = c.j AND l.cid = c.code
         |  GROUP BY ca.qid, ca.vec_id)"""),
    """SELECT qid, vec_id, adist, rn FROM (
      |  SELECT qid, vec_id, adist,
      |    row_number() OVER (PARTITION BY qid ORDER BY adist ASC, vec_id ASC) AS rn
      |  FROM adc) WHERE rn <= 10""")
}
