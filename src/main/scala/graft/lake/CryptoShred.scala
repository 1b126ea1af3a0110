package graft.lake

import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CRYPTO-SHREDDING — O(1) right-to-be-forgotten at 100 TB.
  *
  * [[Purge]] physically rewrites every file that holds an erased key:
  * correct, but at 100 TB each erasure ticket costs file rewrites, and a
  * day's batch of tickets costs a maintenance window. Crypto-shredding is
  * the complementary standard technique (NIST SP 800-88 "cryptographic
  * erase"): encrypt each principal's sensitive columns under a PER-PRINCIPAL
  * data key at ingest, keep the keys in a tiny keyring table, and erase by
  * DELETING THE KEY ROW — the ciphertext, still sitting untouched in every
  * data file, snapshot, and backup, is unreadable forever. Erasure cost is
  * O(1) metadata per principal, zero data-file IO, and it covers history
  * and replicas for free (they only ever held ciphertext).
  *
  * Mechanics:
  *  - per-principal key = SHA-256(master ‖ ":" ‖ principal), truncated to
  *    128 bits (a deterministic KDF keeps the gate reproducible; a real
  *    deployment would use random keys in a KMS — the lattice of table
  *    operations is identical);
  *  - AES/GCM-128, per-row IV = first 12 bytes of
  *    SHA-256("iv:" ‖ principal ‖ ":" ‖ rowId) — unique per (key, row), the
  *    GCM requirement; ciphertext layout = IV ‖ GCM output (tag appended);
  *  - encrypt/decrypt run as ONE typed mapPartitions pass with the Cipher
  *    instance reused across the partition (AES-NI intrinsics do the work;
  *    no per-row Cipher.getInstance, no codegen needed — crypto is opaque
  *    to Catalyst by nature);
  *  - the keyring joins in by BROADCAST (it is #principals rows — tiny
  *    against the data), so the read path adds no shuffle;
  *  - decrypt of a shredded principal finds no key row and yields NULL —
  *    the reader sees the column erased, never a crypto error.
  *
  * Scale shape: encryption rides the ingest scan (narrow, no shuffle);
  * decryption rides the read scan the same way; shredding touches only the
  * keyring. The ONLY rewritten state over a principal's lifetime is the
  * keyring parquet — a few KB. */
object CryptoShred {

  private val IvLen = 12
  private val TagBits = 128

  private def sha(bytes: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(bytes)

  /** Deterministic per-principal 128-bit data key. */
  def deriveKey(master: String, principal: Long): Array[Byte] =
    sha(s"$master:$principal".getBytes("UTF-8")).take(16)

  private def rowIv(principal: Long, rowId: Long): Array[Byte] =
    sha(s"iv:$principal:$rowId".getBytes("UTF-8")).take(IvLen)

  /** Keyring frame (principal, dkey) for the given principals. */
  def keyring(spark: SparkSession, master: String,
      principals: DataFrame): DataFrame = {
    import spark.implicits._
    principals.select(col("principal").cast("long")).as[Long]
      .map(p => (p, deriveKey(master, p)))
      .toDF("principal", "dkey")
  }

  /** Shred: the keyring minus the erased principals — the WHOLE erasure
    * operation. Data files are untouched by design. */
  def shred(keyringDf: DataFrame, erased: DataFrame): DataFrame =
    keyringDf.join(erased.select(col("principal").cast("long")),
      Seq("principal"), "left_anti")

  /** Encrypt `valueCol` (string) under each row's principal key: one typed
    * pass, Cipher reused per partition. Output schema:
    * (rowId, principal, ct) with ct = IV ‖ AES-GCM(value). */
  def encrypt(spark: SparkSession, df: DataFrame, keyringDf: DataFrame,
      rowIdCol: String, principalCol: String, valueCol: String): DataFrame = {
    import spark.implicits._
    val joined = df
      .select(col(rowIdCol).cast("long").as("row_id"),
        col(principalCol).cast("long").as("principal"),
        col(valueCol).cast("string").as("v"))
      .join(broadcast(keyringDf), Seq("principal"))
      .select(col("row_id"), col("principal"), col("v"), col("dkey"))
      .as[(Long, Long, String, Array[Byte])]
    joined.mapPartitions { it =>
      val cipher = Cipher.getInstance("AES/GCM/NoPadding")
      it.map { case (rowId, principal, v, dkey) =>
        val iv = rowIv(principal, rowId)
        cipher.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(dkey, "AES"),
          new GCMParameterSpec(TagBits, iv))
        val ct = cipher.doFinal(if (v == null) Array.emptyByteArray
          else v.getBytes("UTF-8"))
        (rowId, principal, iv ++ ct)
      }
    }.toDF("row_id", "principal", "ct")
  }

  /** Decrypt back to (rowId, principal, value): principals whose key is
    * gone from the keyring decrypt to NULL — the erased read. One typed
    * pass; keyring broadcast via a LEFT join so shredded rows survive. */
  def decrypt(spark: SparkSession, enc: DataFrame,
      keyringDf: DataFrame): DataFrame = {
    import spark.implicits._
    val joined = enc.select(col("row_id"), col("principal"), col("ct"))
      .join(broadcast(keyringDf), Seq("principal"), "left")
      .select(col("row_id"), col("principal"), col("ct"), col("dkey"))
      .as[(Long, Long, Array[Byte], Array[Byte])]
    joined.mapPartitions { it =>
      val cipher = Cipher.getInstance("AES/GCM/NoPadding")
      it.map { case (rowId, principal, ct, dkey) =>
        val v =
          if (dkey == null) None
          else {
            val iv = java.util.Arrays.copyOfRange(ct, 0, IvLen)
            val body = java.util.Arrays.copyOfRange(ct, IvLen, ct.length)
            cipher.init(Cipher.DECRYPT_MODE, new SecretKeySpec(dkey, "AES"),
              new GCMParameterSpec(TagBits, iv))
            Some(new String(cipher.doFinal(body), "UTF-8"))
          }
        (rowId, principal, v)
      }
    }.toDF("row_id", "principal", "value")
  }
}
