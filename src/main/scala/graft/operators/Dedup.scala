package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}

/** Corpus deduplication operators for the 100 TB training-data path.
  *
  * Exact dedup is a hash group-by (one shuffle on the content hash).
  * Near-dup families (MinHash+LSH, SimHash, embedding-SRP) all follow the
  * same scale shape: compute a compact per-row signature map-side (pure
  * Catalyst expressions, no UDFs), explode into a handful of band buckets,
  * self-join on the bucket key (the only shuffle — bucket keys are
  * high-cardinality so it parallelizes), then verify candidates exactly.
  * No all-pairs comparison ever materializes.
  */
object Dedup {

  /** Exact dedup on a content column: one representative (min id) per
    * distinct value + multiplicity. */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Deterministic (a*h + b) mod p permutation family for MinHash. */
  private val MersennePrime = 2147483647L
  private def hashParams(n: Int, seed: Long): Array[(Long, Long)] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n)((1 + rng.nextInt(Int.MaxValue - 1).toLong,
      rng.nextInt(Int.MaxValue).toLong))
  }

  /** MinHash signature column (`array<bigint>` of length numHashes) over
    * word k-shingles. */
  def minHashSignature(text: Column, k: Int = 3, numHashes: Int = 64,
                       seed: Long = 42L): Column = {
    val shingleHashes = array_distinct(
      transform(TextFunctions.shingles(text, k), s => hash(s).cast("long")))
    val sig = hashParams(numHashes, seed).map { case (a, b) =>
      array_min(transform(shingleHashes, h => pmod(lit(a) * h + lit(b),
        lit(MersennePrime))))
    }
    array(sig.toIndexedSeq: _*)
  }

  /** MinHash + LSH near-duplicate pairs.
    *
    * @return (id_a, id_b, est_jaccard) with id_a < id_b, est_jaccard =
    *         fraction of matching signature positions, filtered ≥ threshold.
    *         Banding: `numHashes/rowsPerBand` bands; a pair is a candidate
    *         if any band collides (standard S-curve guarantee).
    */
  def minHashLSH(df: DataFrame, idCol: String, textCol: String,
                 threshold: Double = 0.5, k: Int = 3, numHashes: Int = 64,
                 rowsPerBand: Int = 4, seed: Long = 42L): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    val nBands = numHashes / rowsPerBand
    val sigd = df.select(col(idCol).as("id"),
      minHashSignature(col(textCol), k, numHashes, seed).as("sig"))
    // explode into (band, bandKey) — bandKey hashes the band's slice
    val banded = sigd.select($bandCols(nBands, rowsPerBand): _*)
      .withColumn("band", explode(col("bands")))
      .select(col("id"), col("sig"), col("band.b").as("b"),
        col("band.key").as("key"))
    val a = banded.select(col("id").as("id_a"), col("sig").as("sig_a"),
      col("b"), col("key"))
    val bb = banded.select(col("id").as("id_b"), col("sig").as("sig_b"),
      col("b"), col("key"))
    val cand = a.join(bb, Seq("b", "key")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b").distinct()
    cand.select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          (x === y).cast("int")), v => v === 1)).cast("double") / numHashes)
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  private def $bandCols(nBands: Int, rowsPerBand: Int) = Seq(
    col("id"), col("sig"),
    array((0 until nBands).map(b => struct(lit(b).as("b"),
      hash(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("key"))): _*)
      .as("bands"))

  /** 64-bit SimHash per document, computed with explode + 64 partial-agg
    * sums (map-side combine keeps the shuffle at one row per doc).
    */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
        explode_outer(TextFunctions.tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map(i =>
      sum(when(col("tok").isNull, 0)
        .when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"s$i"))
    val summed = tok.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val bits = (0 until 64).map(i =>
      when(col(s"s$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
    summed.select(col("id"), bits.reduce((x, y) => x.bitwiseOR(y)).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, using
    * 4×16-bit band blocking (pigeonhole: any pair within distance 3 shares
    * at least one exact band).
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sh = simHash(df, idCol, textCol)
    val banded = sh.select(col("id"), col("simhash"),
        explode(array((0 until 4).map(b => struct(lit(b).as("b"),
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("key"))): _*))
          .as("band"))
      .select(col("id"), col("simhash"), col("band.b").as("b"),
        col("band.key").as("key"))
    val a = banded.select(col("id").as("id_a"), col("simhash").as("sh_a"),
      col("b"), col("key"))
    val bb = banded.select(col("id").as("id_b"), col("simhash").as("sh_b"),
      col("b"), col("key"))
    a.join(bb, Seq("b", "key")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity for LSH candidate pairs: re-joins the
    * shingle sets and computes |∩|/|∪| precisely. The expensive exact step
    * only ever runs on the candidate set, never all pairs.
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.3, k: Int = 3): DataFrame = {
    val cand = minHashLSH(df, idCol, textCol, threshold = 0.2, k = k)
      .select("id_a", "id_b")
    val sh = df.select(col(idCol).as("id"),
      array_distinct(TextFunctions.shingles(col(textCol), k)).as("sh"))
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding near-dup pairs: SRP-LSH bucketing then exact cosine ≥
    * threshold within buckets. */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                       threshold: Double = 0.95, nbits: Int = 12): DataFrame = {
    val b = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorFunctions.srpBucket(col(vecCol), dim, nbits).as("bucket"))
    val l = b.select(col("id").as("id_a"), col("v").as("v_a"), col("bucket"))
    val r = b.select(col("id").as("id_b"), col("v").as("v_b"), col("bucket"))
    l.join(r, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosine(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct()
  }
}
