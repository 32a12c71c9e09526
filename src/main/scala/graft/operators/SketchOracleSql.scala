package graft.operators

import graft.functions.VectorFunctions

/** DuckDB SQL that re-derives the sketch-family signatures exactly.
  *
  * The sketch basis hash ([[graft.functions.PortableHash]]) is pure
  * integer arithmetic — polynomial base 257 mod 2^64, MurmurHash3 fmix64
  * finalizer, sign bit cleared — so any engine with 64-bit integers can
  * recompute it. DuckDB errors on signed 64-bit overflow instead of
  * wrapping, so the fold runs in HUGEINT (128-bit) with explicit
  * `% 2^64`; the fmix multiplications split each operand at 2^32 to keep
  * every intermediate under 2^127. Bitwise xor/shift steps route through
  * UBIGINT (bit patterns of values < 2^64 are identical across the
  * signed/unsigned divide, so equality and every derived value agree with
  * the JVM's wrapping-signed arithmetic).
  *
  * Each fmix step is staged through its own CTE column rather than
  * substituted inline: every step references its input 2-3 times, so
  * textual inlining would grow the expression ~2^5× while CTE staging
  * keeps each stage O(1) size.
  *
  * These oracles make the MinHash/SimHash/winnowing pipelines fully
  * hash-verified by the driver's DuckDB differential gate — previously
  * rows-only ("engine-specific hash basis"). Winnowing needs no staging:
  * its Karp-Rabin hash is 31-bit masked arithmetic already.
  */
object SketchOracleSql {
  private val M64 = "18446744073709551616"
  private val C1 = "18397679294719823053" // 0xff51afd7ed558ccd
  private val C2 = "14181476777654086739" // 0xc4ceb9fe1a85ec53
  private val P = "2147483647"

  /** xor-shift-33 on a HUGEINT value < 2^64, via UBIGINT bit ops. */
  private def x33(h: String): String =
    s"CAST(xor(CAST(($h) AS UBIGINT), CAST(($h) // 8589934592 AS UBIGINT)) AS HUGEINT)"

  /** wrapping 64-bit multiply: operands split at 2^32 so intermediates
    * stay under 2^127 (HUGEINT is signed 128-bit). */
  private def wmul(h: String, c: String): String =
    s"((($h) % 4294967296) * $c + (((($h) // 4294967296) * $c) % 4294967296) * 4294967296) % $M64"

  /** polynomial base-257 accumulation mod 2^64 over the chars of string
    * expr `s` (the corpus is normalized ASCII, so char == byte). */
  private def poly64(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
      s"list_transform(range(1, length($s) + 1), p -> CAST(ord(substr($s, p, 1)) AS HUGEINT))), " +
      s"(a, b) -> (a * 257 + b) % $M64)"

  /** CTE chain hashing every element of string-list column `listExpr` of
    * CTE `src` to its 63-bit portable hash; the final CTE (returned name)
    * has columns `keys` + `hs` (list<BIGINT>). */
  private def hashListCtes(pfx: String, src: String, keys: String,
      listExpr: String): (String, String) = {
    val stages = Seq(
      s"${pfx}0 AS (SELECT $keys, list_transform($listExpr, s -> ${poly64("s")}) AS hs FROM $src)",
      s"${pfx}1 AS (SELECT $keys, list_transform(hs, h -> ${x33("h")}) AS hs FROM ${pfx}0)",
      s"${pfx}2 AS (SELECT $keys, list_transform(hs, h -> ${wmul("h", C1)}) AS hs FROM ${pfx}1)",
      s"${pfx}3 AS (SELECT $keys, list_transform(hs, h -> ${x33("h")}) AS hs FROM ${pfx}2)",
      s"${pfx}4 AS (SELECT $keys, list_transform(hs, h -> ${wmul("h", C2)}) AS hs FROM ${pfx}3)",
      s"${pfx}5 AS (SELECT $keys, list_transform(hs, h -> CAST(${x33("h")} // 2 AS BIGINT)) AS hs FROM ${pfx}4)")
    (stages.mkString(",\n"), s"${pfx}5")
  }

  /** CTE chain applying fmix63 to scalar HUGEINT column `col` of `src`;
    * final CTE has `keys` + `fh` (BIGINT, 63-bit). Public: also the
    * oracle-side of `graft_fmix63` (deterministic TABLESAMPLE). */
  def fmixScalarCtes(pfx: String, src: String, keys: String,
      col: String): (String, String) = {
    val stages = Seq(
      s"${pfx}1 AS (SELECT $keys, ${x33(col)} AS fh FROM $src)",
      s"${pfx}2 AS (SELECT $keys, ${wmul("fh", C1)} AS fh FROM ${pfx}1)",
      s"${pfx}3 AS (SELECT $keys, ${x33("fh")} AS fh FROM ${pfx}2)",
      s"${pfx}4 AS (SELECT $keys, ${wmul("fh", C2)} AS fh FROM ${pfx}3)",
      s"${pfx}5 AS (SELECT $keys, CAST(${x33("fh")} // 2 AS BIGINT) AS fh FROM ${pfx}4)")
    (stages.mkString(",\n"), s"${pfx}5")
  }

  /** CTE chain hashing scalar string column `strCol` of `src` to its
    * 63-bit portable hash (`graft_porthash63`'s oracle twin); carries
    * `keys` through, final CTE has `keys` + `fh` (BIGINT). */
  def hashScalarCtes(pfx: String, src: String, keys: String,
      strCol: String): (String, String) = {
    val s0 = s"${pfx}0 AS (SELECT $keys, ${poly64(strCol)} AS ph FROM $src)"
    val (rest, last) = fmixScalarCtes(pfx, s"${pfx}0", keys, "ph")
    (s0 + ",\n" + rest, last)
  }

  /** doc_id + distinct-word 63-bit hashes (`hs`), the SimHash token basis. */
  private def tokenHashCtes(norm: String): (String, String) = {
    val w = s"w AS (SELECT doc_id, list_distinct(string_split($norm, ' ')) AS ws FROM documents)"
    val (h, last) = hashListCtes("h", "w", "doc_id", "ws")
    (s"$w,\n$h", last)
  }

  /** SimHash32 over the token hashes: bit i set when more than half the
    * tokens have bit i set (the +1/-1 vote count is positive). */
  def simhash(norm: String): String = {
    val (ctes, last) = tokenHashCtes(norm)
    s"""WITH $ctes
       |SELECT doc_id,
       |  CAST(list_sum(list_transform(range(0, 32),
       |    i -> CASE WHEN 2 * len(list_filter(hs, h -> ((h >> i) & 1) = 1)) > len(hs)
       |              THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS simhash
       |FROM $last""".stripMargin
  }

  /** The full multi-band SimHash near-dup pipeline: 3 disjoint bands
    * (bits 21-31 / 10-20 / 0-9 — perfect recall at hamming <= 2 by
    * pigeonhole), bucket-size cap 200, exact hamming rerank, top-100. */
  def simhashPairs(norm: String): String = {
    val (ctes, last) = tokenHashCtes(norm)
    s"""WITH $ctes,
       |sims AS (SELECT doc_id,
       |  CAST(list_sum(list_transform(range(0, 32),
       |    i -> CASE WHEN 2 * len(list_filter(hs, h -> ((h >> i) & 1) = 1)) > len(hs)
       |              THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS simhash
       |  FROM $last),
       |bands AS (SELECT doc_id, simhash, b AS band,
       |    CASE WHEN b = 0 THEN simhash // 2097152
       |         WHEN b = 1 THEN (simhash // 1024) % 2048
       |         ELSE simhash % 1024 END AS bucket
       |  FROM sims, UNNEST([0, 1, 2]) t(b)),
       |capped AS (SELECT band, bucket, doc_id, simhash FROM (
       |    SELECT *, count(*) OVER (PARTITION BY band, bucket) AS bsize FROM bands)
       |  WHERE bsize <= 200),
       |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    a.simhash AS sim_a, b.simhash AS sim_b
       |  FROM capped a JOIN capped b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b, CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
       |FROM pairs WHERE bit_count(xor(sim_a, sim_b)) <= 10
       |ORDER BY hamming, id_a, id_b LIMIT 100""".stripMargin
  }

  /** doc_id + 3-word-shingle hashes mod P (`bh`), the MinHash basis. */
  private def shingleHashCtes(norm: String): (String, String) = {
    val pre =
      s"""w AS (SELECT doc_id, string_split($norm, ' ') AS ws FROM documents),
         |sh AS (SELECT doc_id,
         |  CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         |       ELSE list_transform(range(1, len(ws) - 1),
         |              i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]) END AS shingles
         |  FROM w)""".stripMargin
    val (h, last) = hashListCtes("h", "sh", "doc_id", "shingles")
    (s"$pre,\n$h,\nbh AS (SELECT doc_id, list_transform(hs, h -> h % $P) AS bh FROM $last)",
      "bh")
  }

  private def permsLiteral: String =
    VectorFunctions.minhashPerms
      .map { case (a, b) => s"[${a}, ${b}]" }.mkString("[", ", ", "]")

  /** First MinHash signature element per document. */
  def minhashSignatures(norm: String): String = {
    val (ctes, last) = shingleHashCtes(norm)
    val (a0, b0) = VectorFunctions.minhashPerms.head
    s"""WITH $ctes
       |SELECT doc_id,
       |  list_min(list_transform(bh, h -> (h * $a0 + $b0) % $P)) AS sig_head
       |FROM $last""".stripMargin
  }

  /** The shared MinHash-LSH candidate chain, appended after
    * [[shingleHashCtes]]'s tail CTE `last`: 32-permutation signatures,
    * 8 bands × 4 rows with fmix63-folded bucket keys, bucket cap 200,
    * and `pairs(id_a, id_b)` under `pairCond` — ONE definition for the
    * three LSH consumers (pair mining, fuzzy decontamination,
    * incremental near-dedup), so the band/fold/cap constants cannot
    * drift between their oracles. */
  private def lshCandidateCtes(last: String, pairCond: String): String = {
    val (fmixCtes, fmixLast) = fmixScalarCtes("f", "fold", "doc_id, band", "fh")
    s"""sig AS (SELECT doc_id, bh,
       |  list_transform($permsLiteral,
       |    p -> list_min(list_transform(bh, h -> (h * p[1] + p[2]) % $P))) AS sig
       |  FROM $last),
       |fold AS (SELECT doc_id, b AS band,
       |    list_reduce(list_prepend(CAST(0 AS HUGEINT),
       |      list_transform(sig[b * 4 + 1 : b * 4 + 4], v -> CAST(v AS HUGEINT))),
       |      (a, v) -> (a * 1099511628211 + v) % $M64) AS fh
       |  FROM sig, UNNEST([0, 1, 2, 3, 4, 5, 6, 7]) t(b)),
       |$fmixCtes,
       |bb AS (SELECT doc_id, band, fh % 4294967296 AS bucket FROM $fmixLast),
       |capped AS (SELECT band, bucket, doc_id FROM (
       |    SELECT *, count(*) OVER (PARTITION BY band, bucket) AS bsize FROM bb)
       |  WHERE bsize <= 200),
       |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM capped a JOIN capped b
       |    ON a.band = b.band AND a.bucket = b.bucket AND $pairCond)""".stripMargin
  }

  /** Exact-jaccard rerank over `pairs`, ending in
    * `rr(id_a, id_b, jaccard)` — distinct shingle-hash sets, one
    * intersection expression. */
  private def jaccardRerankCtes(last: String): String =
    s"""sets AS (SELECT doc_id, list_distinct(bh) AS s FROM $last),
       |rr AS (SELECT p.id_a, p.id_b,
       |  CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
       |    / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS jaccard
       |  FROM pairs p
       |  JOIN sets sa ON p.id_a = sa.doc_id
       |  JOIN sets sb ON p.id_b = sb.doc_id)""".stripMargin

  /** The full MinHash LSH pipeline: 32-permutation signatures, 8 bands × 4
    * rows with fmix63-folded bucket keys, cap 200, exact-jaccard rerank
    * over distinct shingle-hash sets, top-100 by jaccard. */
  def minhashLshPairs(norm: String): String = {
    val (ctes, last) = shingleHashCtes(norm)
    s"""WITH $ctes,
       |${lshCandidateCtes(last, "a.doc_id < b.doc_id")},
       |${jaccardRerankCtes(last)}
       |SELECT id_a, id_b, jaccard FROM rr
       |ORDER BY jaccard DESC, id_a, id_b LIMIT 100""".stripMargin
  }


  /** The fuzzy-decontamination pipeline: the minhashLshPairs machinery
    * pointed across the train/eval split — candidates are (train, eval)
    * band-bucket collisions (train = doc_id % 10 ≠ 0, eval = % 10 = 0,
    * the d_decontaminate split contract), reranked by exact jaccard over
    * distinct shingle hashes, flagged at `thresh`. */
  def fuzzyDecontaminate(norm: String, thresh: String): String = {
    val (ctes, last) = shingleHashCtes(norm)
    s"""WITH $ctes,
       |${lshCandidateCtes(last, "a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0")},
       |${jaccardRerankCtes(last)}
       |SELECT id_a AS train_id, id_b AS eval_id, jaccard FROM rr
       |WHERE jaccard >= $thresh
       |ORDER BY train_id, eval_id LIMIT 500""".stripMargin
  }


  /** The incremental near-dup admission pipeline: the same LSH
    * machinery, split base (doc_id < `split`) vs increment (≥ `split`,
    * the d_incremental_dedup contract). An increment doc is admitted
    * iff it has NO near-dup (jaccard ≥ `thresh`) among base docs or
    * smaller-id increment docs — the keep-first convention; base ids
    * sort below increment ids, so ONE `a.doc_id < b.doc_id` predicate
    * covers both blocker classes. */
  def incrementalNearDup(norm: String, split: Long, thresh: String): String = {
    val (ctes, last) = shingleHashCtes(norm)
    s"""WITH $ctes,
       |${lshCandidateCtes(last,
          s"a.doc_id < b.doc_id AND b.doc_id >= $split")},
       |${jaccardRerankCtes(last)},
       |blk AS (SELECT id_b AS doc_id, CAST(min(id_a) AS BIGINT) AS blocked_by
       |  FROM rr WHERE jaccard >= $thresh GROUP BY id_b)
       |SELECT d.doc_id, (b.blocked_by IS NULL) AS admitted, b.blocked_by
       |FROM documents d LEFT JOIN blk b USING (doc_id)
       |WHERE d.doc_id >= $split""".stripMargin
  }


  /** 31-bit Karp-Rabin polynomial over the chars of string expr `s` —
    * the winnowing hash (mod 2^31 == the JVM's `& 0x7fffffff` mask). */
  private def poly31(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, length($s) + 1), p -> CAST(ord(substr($s, p, 1)) AS BIGINT))), " +
      s"(a, b) -> (a * 257 + b) % 2147483648)"

  /** Winnowed fingerprints (k=8, w=16) per document: rolling k-gram
    * hashes, minimum of every w-window (the winnowing selection keeps the
    * rightmost minimal INDEX, but the selected VALUE set is exactly the
    * per-window minima), distinct + sorted. */
  private def winnowCtes(norm: String): String =
    s"""n AS (SELECT doc_id, $norm AS t FROM documents),
       |rh AS (SELECT doc_id,
       |  CASE WHEN length(t) < 8 THEN [${poly31("t")}]
       |       ELSE list_transform(range(1, length(t) - 6), i -> ${poly31("substr(t, i, 8)")}) END AS hs
       |  FROM n),
       |sel AS (SELECT doc_id,
       |  CASE WHEN len(hs) < 16 THEN [list_min(hs)]
       |       ELSE list_transform(range(16, len(hs) + 1), i -> list_min(hs[i - 15 : i])) END AS sels
       |  FROM rh),
       |fps AS (SELECT doc_id, list_sort(list_distinct(sels)) AS fps FROM sel)""".stripMargin

  def winnowFp(norm: String): String =
    s"""WITH ${winnowCtes(norm)}
       |SELECT doc_id, CAST(len(fps) AS INT) AS n_fp, fps[1] AS fp_min
       |FROM fps""".stripMargin

  def winnowPairs(norm: String): String =
    s"""WITH ${winnowCtes(norm)},
       |f AS (SELECT doc_id, unnest(fps) AS fp FROM fps),
       |capped AS (SELECT fp, doc_id FROM (
       |    SELECT fp, doc_id, count(*) OVER (PARTITION BY fp) AS fsize FROM f)
       |  WHERE fsize <= 50),
       |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
       |  FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, n_shared FROM pairs WHERE n_shared >= 5
       |ORDER BY n_shared DESC, id_a, id_b LIMIT 100""".stripMargin
}
