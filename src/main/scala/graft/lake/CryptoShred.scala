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
      // LEFT join + loud per-row check: an inner join would silently DROP
      // every row of a principal missing from the keyring (a stale ring vs
      // today's data), and the caller would believe the batch encrypted
      // whole — same fail-closed contract as encryptInPlace
      .join(broadcast(keyringDf), Seq("principal"), "left_outer")
      .select(col("row_id"), col("principal"), col("v"), col("dkey"))
      .as[(Long, Long, String, Array[Byte])]
    joined.mapPartitions { it =>
      val cipher = Cipher.getInstance("AES/GCM/NoPadding")
      it.map { case (rowId, principal, v, dkey) =>
        if (dkey == null)
          throw new IllegalArgumentException(
            s"no data key for principal $principal — refusing to drop its " +
              "rows; derive the keyring over every principal present")
        val iv = rowIv(principal, rowId)
        cipher.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(dkey, "AES"),
          new GCMParameterSpec(TagBits, iv))
        val ct = cipher.doFinal(if (v == null) Array.emptyByteArray
          else v.getBytes("UTF-8"))
        (rowId, principal, iv ++ ct)
      }
    }.toDF("row_id", "principal", "ct")
  }

  // ------- in-place string-column flavor (ingest-path transforms) -------
  // Principals are STRINGS here (a repo, a tenant id), the ciphertext is
  // BASE64 so the encrypted column keeps its STRING type — an ingest
  // transform must not change the table schema. Cipher instances are
  // thread-local (reused across rows; AES-NI does the work).

  private object Ciphers {
    val tl: ThreadLocal[Cipher] = ThreadLocal.withInitial(() =>
      Cipher.getInstance("AES/GCM/NoPadding"))

    /** Init for encryption, tolerating SunJCE's (correct) refusal to
      * re-init one instance with an identical (key, IV) pair — which a
      * DETERMINISTIC transform hits whenever the same row re-encrypts on
      * the same thread (a replayed micro-batch, a retried task): swap in a
      * fresh Cipher for that case. */
    def forEncrypt(key: SecretKeySpec, spec: GCMParameterSpec): Cipher = {
      val c = tl.get()
      try { c.init(Cipher.ENCRYPT_MODE, key, spec); c }
      catch {
        case _: java.security.InvalidAlgorithmParameterException =>
          val f = Cipher.getInstance("AES/GCM/NoPadding")
          tl.set(f)
          f.init(Cipher.ENCRYPT_MODE, key, spec)
          f
      }
    }
  }

  /** Deterministic per-principal key, string-principal flavor. */
  def deriveKeyS(master: String, principal: String): Array[Byte] =
    sha(s"$master:$principal".getBytes("UTF-8")).take(16)

  /** Keyring (principal: string, dkey) for the given principal frame. */
  def keyringS(spark: SparkSession, master: String,
      principals: DataFrame): DataFrame = {
    import spark.implicits._
    principals.select(col("principal").cast("string")).as[String]
      .map(p => (p, deriveKeyS(master, p)))
      .toDF("principal", "dkey")
  }

  /** Replace `valueCol` (string) with base64(IV ‖ AES-GCM(value)) under the
    * row's principal key; every other column passes through. IV derives
    * from (principal, rowId) — deterministic, so an exactly-once replay of
    * the same batch produces the same bytes. A principal MISSING from the
    * keyring fails loudly (silent plaintext passthrough would be a leak).
    * NULL values stay NULL (a DELETE event has no payload to protect). */
  def encryptInPlace(df: DataFrame, keyringDf: DataFrame,
      rowIdCol: String, principalCol: String, valueCol: String): DataFrame = {
    val enc = udf { (v: String, principal: String, rowId: Long, dkey: Array[Byte]) =>
      if (v == null) null
      else {
        if (dkey == null) throw new IllegalStateException(
          s"no data key for principal $principal — refusing to pass plaintext")
        val iv = sha(s"iv:$principal:$rowId".getBytes("UTF-8")).take(IvLen)
        val c = Ciphers.forEncrypt(new SecretKeySpec(dkey, "AES"),
          new GCMParameterSpec(TagBits, iv))
        java.util.Base64.getEncoder.encodeToString(iv ++ c.doFinal(v.getBytes("UTF-8")))
      }
    }
    val meta = df.schema(valueCol).metadata // keep field-id metadata intact
    df.join(broadcast(keyringDf.withColumnRenamed("principal", "__ks_p")),
        col(principalCol) === col("__ks_p"), "left")
      .withColumn(valueCol,
        enc(col(valueCol), col(principalCol), col(rowIdCol), col("dkey"))
          .as(valueCol, meta))
      .drop("__ks_p", "dkey")
  }

  /** Inverse of [[encryptInPlace]]: decode + decrypt `valueCol` under the
    * keyring; a SHREDDED principal (no key row) reads NULL. */
  def decryptInPlace(df: DataFrame, keyringDf: DataFrame,
      principalCol: String, valueCol: String): DataFrame = {
    val dec = udf { (b64: String, dkey: Array[Byte]) =>
      if (b64 == null || dkey == null) null
      else {
        val ct = java.util.Base64.getDecoder.decode(b64)
        val c = Ciphers.tl.get()
        c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(dkey, "AES"),
          new GCMParameterSpec(TagBits, java.util.Arrays.copyOfRange(ct, 0, IvLen)))
        new String(c.doFinal(java.util.Arrays.copyOfRange(ct, IvLen, ct.length)), "UTF-8")
      }
    }
    val meta = df.schema(valueCol).metadata
    df.join(broadcast(keyringDf.withColumnRenamed("principal", "__ks_p")),
        col(principalCol) === col("__ks_p"), "left")
      .withColumn(valueCol, dec(col(valueCol), col("dkey")).as(valueCol, meta))
      .drop("__ks_p", "dkey")
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
