package graft.ops

import graft.functions.SimHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora. All shuffle on compact keys
  * (hashes / band buckets), never on document text, so shuffle bytes stay
  * O(rows), not O(corpus bytes) — the property that matters at 100 TB.
  */
object Dedup {

  /** Exact dedup: group on md5(text), keep the smallest id. One shuffle on a
    * 128-bit key; the text column itself never moves.
    */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), md5(col(textCol)).as("h"))
      .groupBy(col("h")).agg(min(col(idCol)).as(idCol))
      .select(idCol)

  def exactDedupSql: String =
    "SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)"

  // ---- n-gram Jaccard ------------------------------------------------------

  /** Distinct word-k-gram shingles of a text column, hashed to long. */
  def shingles(text: Column, k: Int): Column = {
    val toks = split(trim(text), "\\s+")
    val grams = transform(
      sequence(lit(0), greatest(size(toks) - k, lit(0))),
      i => when(size(toks) >= k, xxhash64(concat_ws(" ", slice(toks, i + 1, lit(k))))))
    array_distinct(filter(grams, _.isNotNull))
  }

  /** Exact n-gram Jaccard near-dup pairs: explode distinct shingles, equi-join
    * on shingle, count common shingles per pair, compare against sizes with
    * integer cross-multiplication (`common * den >= num * (|A|+|B|-common)` —
    * no floating point). Emits each unordered pair once (idA < idB).
    *
    * The shingle-join is the scalable plan: one shuffle on shingle hash, one
    * aggregation on (idA, idB) — no O(n²) candidate set.
    */
  def jaccardPairs(docs: DataFrame, k: Int, num: Int, den: Int,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val shArr = docs.select(col(idCol).as("id"), shingles(col(textCol), k).as("shs"))
    val sh = shArr.select(col("id"), size(col("shs")).as("n"), explode(col("shs")).as("sh"))
    val a = sh.toDF("a_id", "a_n", "sh")
    val b = sh.toDF("b_id", "b_n", "sh_b")
    // length filter: jaccard >= num/den implies num*|a| <= den*|b| (and sym.)
    val common = a.join(b, col("sh") === col("sh_b") && col("a_id") < col("b_id") &&
        col("a_n") * num <= col("b_n") * den && col("b_n") * num <= col("a_n") * den)
      .groupBy("a_id", "b_id", "a_n", "b_n").agg(count(lit(1)).as("common"))
    common
      .filter(col("common") * den >= lit(num) * (col("a_n") + col("b_n") - col("common")))
      .select(col("a_id"), col("b_id"))
  }

  /** DuckDB oracle for [[jaccardPairs]] — same shingling via string_split +
    * md5 (cross-engine stable hash of the joined shingle text).
    */
  def jaccardPairsSql(k: Int, num: Int, den: Int): String = {
    // DuckDB: tokens = regexp_split_to_array(trim(text), '\s+');
    // shingle i = md5 of tokens[i+1 .. i+k] joined by ' '.
    // NOTE: DuckDB range() cannot take lateral column bounds — use a constant
    // bound + WHERE (4096 ≫ max token count in the testdata).
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
       |), sh AS (
       |  SELECT DISTINCT doc_id, md5(array_to_string(t[i + 1 : i + $k], ' ')) AS sh
       |  FROM toks, range(0, 4096) r(i)
       |  WHERE len(t) >= $k AND i <= len(t) - $k
       |), sizes AS (
       |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
       |), common AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS common
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT a_id, b_id FROM common
       |  JOIN sizes sa ON sa.doc_id = a_id
       |  JOIN sizes sb ON sb.doc_id = b_id
       | WHERE common * $den >= $num * (sa.n_sh + sb.n_sh - common)""".stripMargin.replace("\n", " ")
  }

  /** AllPairs/PPJoin-style prefix-filtered exact Jaccard (Bayardo et al.
    * 2007, public algorithm): order each document's shingles by ascending
    * global frequency; for threshold t = num/den only the first
    * `⌊(1−t)·|d|⌋ + 1` shingles (the rarest ones) need to be indexed — two
    * documents with Jaccard ≥ t must collide on at least one prefix shingle.
    * Candidates are verified exactly. Same output as [[jaccardPairs]], with
    * the candidate set cut from "docs sharing any shingle" to "docs sharing a
    * rare prefix shingle" — the web-scale version of the shingle join.
    */
  def jaccardPairsPrefix(docs: DataFrame, k: Int, num: Int, den: Int,
                         idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val shArr = docs.select(col(idCol).as("id"), shingles(col(textCol), k).as("shs"))
      .filter(size(col("shs")) > 0)
    val sh = shArr.select(col("id"), explode(col("shs")).as("sh"))
    val freq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    // global order = (df, sh); rank shingles per doc, keep the prefix
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("df"), col("sh"))
    // prefix length = n - ceil(t*n) + 1, in INTEGER arithmetic: the float
    // form floor((1-t)*n)+1 under-counts by one whenever t*n is an exact
    // integer (e.g. t=4/5, n=5 -> 0.19999... * 5), losing qualifying pairs
    val prefix = sh.join(freq, "sh")
      .withColumn("pos", row_number().over(w))
      .join(shArr.select(col("id"), size(col("shs")).cast("long").as("n")), "id")
      .filter(col("pos") <=
        col("n") - floor((col("n") * num + den - 1) / den).cast("long") + 1)
      .select(col("id"), col("sh"))
    val cand = prefix.toDF("a_id", "sh")
      .join(prefix.toDF("b_id", "sh_b"), col("sh") === col("sh_b") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    cand.join(shArr.toDF("a_id", "a_shs"), "a_id")
      .join(shArr.toDF("b_id", "b_shs"), "b_id")
      .withColumn("common", size(array_intersect(col("a_shs"), col("b_shs"))).cast("long"))
      .filter(col("common") * den >=
        lit(num) * (size(col("a_shs")) + size(col("b_shs")) - col("common")))
      .select(col("a_id"), col("b_id"))
  }

  // ---- MinHash LSH -----------------------------------------------------------

  /** MinHash signature (numPerm permutations via `(a_i * h + b_i) mod p`) over
    * the shingle set, banded for LSH: documents sharing any band bucket are
    * candidates; candidates are verified with exact Jaccard on signature
    * agreement (estimate) — the standard shingle→minhash→band→bucket-join.
    */
  def minhashCandidates(docs: DataFrame, k: Int, numPerm: Int, bands: Int,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(numPerm % bands == 0, "numPerm must divide into bands")
    val rowsPerBand = numPerm / bands
    val p = 2147483647L // 2^31 - 1 (Mersenne prime); keeps a*h+b within int64
    val rnd = new scala.util.Random(42)
    val perms = Array.fill(numPerm)((rnd.nextInt((p - 1).toInt).toLong + 1, rnd.nextInt(p.toInt).toLong))
    val sh = docs.select(col(idCol).as("id"), shingles(col(textCol), k).as("shs"))
      .filter(size(col("shs")) > 0)
    // signature: per permutation, min over shingles of (a*(h mod p)+b) mod p
    val sigCols = perms.zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(col("shs"),
        h => pmod(pmod(h, lit(p)) * lit(a) + lit(b), lit(p)))).as(s"m$i")
    }
    val sig = sh.select((col("id") +: sigCols): _*)
    // bands: hash rowsPerBand consecutive minhashes per band, explode
    val bandCols = (0 until bands).map { bi =>
      struct(lit(bi).as("band"),
        xxhash64((bi * rowsPerBand until (bi + 1) * rowsPerBand).map(i => col(s"m$i")): _*).as("bucket"))
    }
    // pair generation via bucket self-join: a hot bucket shuffle-partitions
    // instead of materializing all its ids in one collect_list row (which
    // would OOM a single task on a near-dup-heavy corpus)
    val bucketed = sig.select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    bucketed.toDF("a_id", "band", "bucket")
      .join(bucketed.toDF("b_id", "band_b", "bucket_b"),
        col("band") === col("band_b") && col("bucket") === col("bucket_b") &&
          col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: candidates → exact Jaccard verify. */
  def minhashDedupPairs(docs: DataFrame, k: Int = 3, numPerm: Int = 64, bands: Int = 16,
                        num: Int = 1, den: Int = 2): DataFrame = {
    val cand = minhashCandidates(docs, k, numPerm, bands)
    val shArr = docs.select(col("doc_id"), shingles(col("text"), k).as("shs"))
    cand.join(shArr.toDF("a_id", "a_shs"), "a_id")
      .join(shArr.toDF("b_id", "b_shs"), "b_id")
      .withColumn("common", size(array_intersect(col("a_shs"), col("b_shs"))).cast("long"))
      .filter(col("common") * den >=
        lit(num) * (size(col("a_shs")) + size(col("b_shs")) - col("common")))
      .select(col("a_id"), col("b_id"))
  }

  // ---- SimHash ---------------------------------------------------------------

  /** SimHash near-dup pairs within Hamming distance `maxHam` (< 16): band the
    * 64-bit fingerprint into 4×16-bit pieces; by pigeonhole any pair within
    * Hamming ≤ 3 shares at least one exact band → candidate join on (band,
    * piece), verified by bit_count(xor). Complete w.r.t. the SimHash metric.
    */
  def simhashPairs(docs: DataFrame, maxHam: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxHam <= 3, "4-band pigeonhole supports maxHam <= 3")
    val f = docs.select(col(idCol).as("id"), SimHash.simhash64(col(textCol)).as("f"))
    val banded = f.select(col("id"), col("f"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("f"), b * 16).bitwiseAND(lit(0xffffL)).as("piece"))): _*)).as("bp"))
      .select(col("id"), col("f"), col("bp.band").as("band"), col("bp.piece").as("piece"))
    val a = banded.toDF("a_id", "a_f", "band", "piece")
    val b = banded.toDF("b_id", "b_f", "band_b", "piece_b")
    a.join(b, col("band") === col("band_b") && col("piece") === col("piece_b") && col("a_id") < col("b_id"))
      .filter(bit_count(col("a_f").bitwiseXOR(col("b_f"))) <= maxHam)
      .select(col("a_id"), col("b_id"))
      .distinct()
  }

  /** Keep-list from a near-dup pair set: drop the larger id of each pair
    * (connected-component-lite: min-id survivor per direct link).
    */
  def survivors(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol))
      .join(pairs.select(col("b_id").as(idCol)).distinct(), Seq(idCol), "left_anti")
}
