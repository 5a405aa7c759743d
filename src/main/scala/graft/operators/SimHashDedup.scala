package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** SimHash near-duplicate detection: 64-bit locality-sensitive fingerprints
  * whose Hamming distance tracks document similarity (Charikar's simhash —
  * the classic web-dedup fingerprint).
  *
  * The fingerprint is a single codegen'd expression tree: token hashes via
  * `xxhash64`, per-bit ±1 vote sums via `aggregate`, sign bits packed with
  * shifts — no UDF, no shuffle until the pairing step.
  *
  * Near-dup pairing uses the pigeonhole band trick: distance <= k implies
  * at least one of (k+1) disjoint bit-chunks is identical, so candidates
  * join on chunk equality (4 chunks of 16 bits for k<=3) and are verified
  * with `bit_count(xor)` — same candidate-then-verify shape as
  * [[MinHashDedup]], linear in matches rather than quadratic in corpus.
  */
object SimHashDedup {

  final case class Config(
      maxHamming: Int = 3,
      ngramN: Int = 2,
      maxBucketSize: Int = 1000)

  /** 64-bit simhash over word n-grams of `text` — single pass over the
    * feature array: a 64-wide ±1 vote vector is accumulated with
    * `aggregate`+`zip_with`, then sign bits are packed. Shift amounts are
    * data columns, so the SQL shiftleft/shiftright are invoked via
    * `call_function` (the Scala wrappers only take literal Ints).
    */
  def simhash(text: Column, ngramN: Int = 2): Column = {
    val features = TextFunctions.wordNGrams(text, ngramN)
    val hashes = transform(features, f => xxhash64(f))
    val bitIdx = sequence(lit(0), lit(63))
    val votes = aggregate(
      hashes,
      array_repeat(lit(0), 64),
      (acc, h) =>
        zip_with(acc, bitIdx, (a, j) =>
          a + when(call_function("shiftright", h, j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)))
    // disjoint bits: sum == bitwise OR
    aggregate(
      zip_with(votes, bitIdx, (v, j) =>
        when(v > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L),
      (acc, b) => acc + b)
  }

  /** (id, simhash) fingerprint table. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String, cfg: Config = Config()): DataFrame =
    df.select(col(idCol).as("id"), simhash(col(textCol), cfg.ngramN).as("simhash"))

  /** Verified near-dup pairs (idA < idB, hamming <= maxHamming) via the
    * pigeonhole chunk join. Chunk count = maxHamming + 1.
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String, cfg: Config = Config()): DataFrame = {
    val chunks = cfg.maxHamming + 1
    val width = 64 / chunks
    val fps = fingerprints(df, idCol, textCol, cfg)
    val chunked = fps.select(
      col("id"), col("simhash"),
      explode(transform(sequence(lit(0), lit(chunks - 1)), c =>
        struct(c.as("chunk"),
          call_function("shiftright", col("simhash"), (c * width).cast("int"))
            .bitwiseAND((1L << width) - 1).as("key")))).as("ck"))
      .select(col("id"), col("simhash"), col("ck.chunk").as("chunk"), col("ck.key").as("key"))
    val sized = chunked
      .withColumn("bs", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("chunk"), col("key"))))
      .where(col("bs") <= cfg.maxBucketSize)
      .drop("bs")
    val l = sized.select(col("chunk"), col("key"), col("id").as("idA"), col("simhash").as("shA"))
    val r = sized.select(col("chunk"), col("key"), col("id").as("idB"), col("simhash").as("shB"))
    l.join(r, Seq("chunk", "key"))
      .where(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        bit_count(col("shA").bitwiseXOR(col("shB"))).as("hamming"))
      .where(col("hamming") <= cfg.maxHamming)
      .distinct()
  }

  /** Drop near-dups, keeping the least id of each connected component. */
  def dedup(df: DataFrame, idCol: String, textCol: String, cfg: Config = Config()): DataFrame = {
    val groups = MinHashDedup.duplicateGroups(nearDupPairs(df, idCol, textCol, cfg))
    val losers = groups.where(col("rep") =!= col("id")).select(col("id").as("__loser"))
    df.join(losers, col(idCol) === col("__loser"), "left_anti")
  }
}
