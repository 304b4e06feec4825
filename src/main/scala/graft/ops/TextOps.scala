package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, fingerprinting. All are pure
  * column expressions (whole-stage-codegen'd, no UDFs) with exact-integer
  * outputs so the DuckDB oracle matches bit-for-bit.
  */
object TextOps {

  /** Tokens = maximal runs of alphanumerics (deterministic across engines). */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+"), lit(0))).cast("long")

  val tokenCountSql: String = "CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)"

  /** BPE-ish subword count: a GPT-2-style pre-tokenizer pattern (letter runs,
    * digit runs, punctuation runs, each with optional leading space) —
    * deliberately lookahead-free so Java regex and RE2 (DuckDB) agree.
    */
  val BpeishPattern = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0))).cast("long")

  val bpeTokenCountSql: String =
    s"CAST(len(regexp_extract_all(text, '$BpeishPattern')) AS BIGINT)"

  /** Stopword evidence: hits of the English stopword markers (shared with
    * [[langMarkers]]' `en` row plus common fillers).
    */
  val StopwordPattern = "\\b(the|and|of|to|is|in|that|for|with|a|as|it|on|at|by)\\b"

  /** Quality metrics in basis points (integer-exact): alphabetic ratio,
    * whitespace ratio, mean token length ×100, plus raw counts.
    * A simple composite quality flag mirrors heuristics like Gopher rules:
    * enough tokens, sane mean token length, mostly alphabetic.
    */
  def qualityMetrics(df: DataFrame, text: Column): DataFrame = {
    val len    = length(text).cast("long")
    val alpha  = len - length(regexp_replace(text, "[A-Za-z]", ""))
    val spaces = len - length(regexp_replace(text, " ", ""))
    // whitespace spelled out (not \s): Java \s includes vertical tab \x0B,
    // RE2/DuckDB \s does not — a \x0B document would diverge from the oracle
    val punct  = len - length(regexp_replace(text, "[^A-Za-z0-9 \\t\\n\\f\\r]", ""))
    val toks   = tokenCount(text)
    val stops  = size(regexp_extract_all(text, lit(StopwordPattern), lit(0))).cast("long")
    df.withColumn("n_chars", len)
      .withColumn("n_tokens", toks)
      .withColumn("n_bpeish", bpeTokenCount(text))
      .withColumn("alpha_bp", floor(alpha * 10000 / greatest(len, lit(1L))).cast("long"))
      .withColumn("space_bp", floor(spaces * 10000 / greatest(len, lit(1L))).cast("long"))
      .withColumn("punct_bp", floor(punct * 10000 / greatest(len, lit(1L))).cast("long"))
      .withColumn("stop_bp", floor(stops * 10000 / greatest(toks, lit(1L))).cast("long"))
      .withColumn("mean_tok_len_c",
        floor((len - spaces) * 100 / greatest(toks, lit(1L))).cast("long"))
      .withColumn("quality_ok",
        (col("n_tokens") >= 10) && col("mean_tok_len_c").between(150, 1500) &&
          (col("alpha_bp") >= 5000))
  }

  def qualityMetricsSql(from: String): String = {
    val len    = "CAST(length(text) AS BIGINT)"
    val alpha  = s"($len - length(regexp_replace(text, '[A-Za-z]', '', 'g')))"
    val spaces = s"($len - length(regexp_replace(text, ' ', '', 'g')))"
    val punct  = s"($len - length(regexp_replace(text, '[^A-Za-z0-9 \\t\\n\\f\\r]', '', 'g')))"
    val toks   = tokenCountSql
    val stops  = s"CAST(len(regexp_extract_all(text, '$StopwordPattern')) AS BIGINT)"
    s"""SELECT doc_id, $len AS n_chars, $toks AS n_tokens, $bpeTokenCountSql AS n_bpeish,
       | CAST(floor($alpha * 10000 / greatest($len, 1)) AS BIGINT) AS alpha_bp,
       | CAST(floor($spaces * 10000 / greatest($len, 1)) AS BIGINT) AS space_bp,
       | CAST(floor($punct * 10000 / greatest($len, 1)) AS BIGINT) AS punct_bp,
       | CAST(floor($stops * 10000 / greatest($toks, 1)) AS BIGINT) AS stop_bp,
       | CAST(floor(($len - $spaces) * 100 / greatest($toks, 1)) AS BIGINT) AS mean_tok_len_c,
       | ($toks >= 10 AND floor(($len - $spaces) * 100 / greatest($toks, 1)) BETWEEN 150 AND 1500
       |   AND floor($alpha * 10000 / greatest($len, 1)) >= 5000) AS quality_ok
       | FROM $from""".stripMargin.replace("\n", "")
  }

  /** The `quality_ok` predicate as standalone DuckDB SQL over a `text`
    * column (mirrors [[qualityMetrics]]).
    */
  val qualityOkSql: String = {
    val len    = "CAST(length(text) AS BIGINT)"
    val alpha  = s"($len - length(regexp_replace(text, '[A-Za-z]', '', 'g')))"
    val spaces = s"($len - length(regexp_replace(text, ' ', '', 'g')))"
    s"($tokenCountSql >= 10 AND floor(($len - $spaces) * 100 / greatest($tokenCountSql, 1)) BETWEEN 150 AND 1500" +
      s" AND floor($alpha * 10000 / greatest($len, 1)) >= 5000)"
  }

  /** Language-ID by stopword evidence: count hits of per-language marker
    * regexes, pick the argmax (ties → lexicographically first language).
    * An n-gram heuristic classifier — deliberately expressible in both Spark
    * and DuckDB so the oracle can replay it.
    */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|is|in|that|for|with)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|mit|ein|zu)\\b",
    "es" -> "\\b(el|la|los|las|es|y|en|que|de|por)\\b",
    "fr" -> "\\b(le|la|les|est|et|dans|que|pour|une)\\b",
  )

  def langId(text: Column): Column = {
    val counts = langMarkers.map { case (lang, re) =>
      lang -> size(regexp_extract_all(text, lit(re), lit(0))).cast("long")
    }
    // argmax with deterministic tie-break on language code
    val best = counts.sortBy(_._1).reduceLeft { (a, b) =>
      (a._1, when(b._2 > a._2, b._2).otherwise(a._2))
    }
    counts.sortBy(_._1).foldLeft(lit("und")) { case (acc, (lang, cnt)) =>
      when(cnt > lit(0) && cnt === best._2 && acc === lit("und"), lit(lang)).otherwise(acc)
    }
  }

  def langIdSql: String = {
    val cs = langMarkers.sortBy(_._1).map { case (lang, re) =>
      lang -> s"len(regexp_extract_all(text, '$re'))"
    }
    val best = cs.map(_._2).reduceLeft((a, b) => s"greatest($a, $b)")
    val cases = cs.map { case (lang, c) => s"WHEN $c > 0 AND $c = $best THEN '$lang'" }
    s"CASE ${cases.mkString(" ")} ELSE 'und' END"
  }

  /** Content fingerprint: md5 hex (cross-engine deterministic). The
    * rolling-hash winnowing fingerprint (not SQL-expressible) lives in
    * [[winnowFingerprint]].
    */
  def contentFingerprint(text: Column): Column = md5(text)

  /** Winnowing document fingerprint (Schleimer et al. 2003): k-gram hashes
    * over the lowercased text, rightmost-minimum per sliding window, xor-fold
    * of the distinct selected hashes. The k-gram hash is the cross-engine
    * [[graft.functions.OracleHash.hash60]] so the DuckDB oracle
    * ([[winnowSelectSql]]) replays the fingerprint bit-for-bit; at web scale
    * you would swap in a rolling hash (same selection logic, cheaper hash).
    */
  def winnowFingerprint(text: String, k: Int = 8, window: Int = 16): Long = {
    // CODE POINTS, not UTF-16 units: DuckDB len/substr count code points, and
    // Java String.substring would split surrogate pairs mid-gram. Lowercase
    // per code point (1:1, like DuckDB's lower) — String.toLowerCase applies
    // locale multi-char expansions (İ → i̇) that the oracle does not.
    val cps = text.codePoints().toArray
    var i = 0
    while (i < cps.length) { cps(i) = Character.toLowerCase(cps(i)); i += 1 }
    if (cps.length < k) return graft.functions.OracleHash.hash60(new String(cps, 0, cps.length))
    val n = cps.length - k + 1
    val hashes = Array.tabulate(n)(i => graft.functions.OracleHash.hash60(new String(cps, i, k)))
    val win = math.min(window, n)
    // rightmost argmin per window; a position is xored once no matter how
    // many windows select it
    val selected = scala.collection.mutable.LinkedHashSet.empty[Int]
    var j = 0
    while (j + win <= n) {
      var minIdx = j
      var t = j + 1
      while (t < j + win) { if (hashes(t) <= hashes(minIdx)) minIdx = t; t += 1 }
      selected += minIdx
      j += 1
    }
    selected.foldLeft(0L)((acc, p) => acc ^ hashes(p))
  }

  /** DuckDB SQL replaying [[winnowFingerprint]] over `from(doc_id, text)`:
    * emits CTEs ending in `wfp(doc_id, winnow_fp)`. The `range(0, 16384)`
    * bounds k-gram CHARACTER positions (not tokens) — documents longer than
    * 16 384 chars would silently truncate oracle-side; raise it with the
    * corpus.
    */
  def winnowSql(from: String, k: Int = 8, window: Int = 16): String = {
    val h = graft.functions.OracleHash.hash60Sql(s"substr(lt, i + 1, $k)")
    s"""wl AS (
       |  SELECT doc_id, lower(text) AS lt, len(lower(text)) AS n FROM $from
       |), kg AS (
       |  SELECT doc_id, i, $h AS h
       |  FROM wl, range(0, 16384) r(i) WHERE n >= $k AND i <= n - $k
       |), kn AS (
       |  SELECT doc_id, count(*) AS nk, least($window, count(*)) AS win
       |  FROM kg GROUP BY 1
       |), wins AS (
       |  SELECT kn.doc_id, j, win FROM kn, range(0, 16384) r(j) WHERE j <= nk - win
       |), wm AS (
       |  SELECT w.doc_id, w.j, w.win, min(g.h) AS mn
       |  FROM wins w JOIN kg g ON g.doc_id = w.doc_id AND g.i BETWEEN w.j AND w.j + w.win - 1
       |  GROUP BY 1, 2, 3
       |), selp AS (
       |  SELECT DISTINCT doc_id, p FROM (
       |    SELECT m.doc_id AS doc_id, m.j, max(g.i) AS p
       |    FROM wm m JOIN kg g ON g.doc_id = m.doc_id
       |      AND g.i BETWEEN m.j AND m.j + m.win - 1 AND g.h = m.mn
       |    GROUP BY 1, 2
       |  )
       |), fps AS (
       |  SELECT s.doc_id, bit_xor(g.h) AS fp
       |  FROM selp s JOIN kg g ON g.doc_id = s.doc_id AND g.i = s.p GROUP BY 1
       |), wfp AS (
       |  SELECT w.doc_id,
       |         CASE WHEN w.n < $k THEN ${graft.functions.OracleHash.hash60Sql("w.lt")}
       |              ELSE coalesce(f.fp, 0) END AS winnow_fp
       |  FROM wl w LEFT JOIN fps f ON f.doc_id = w.doc_id
       |)""".stripMargin.replace("\n", " ")
  }
}
