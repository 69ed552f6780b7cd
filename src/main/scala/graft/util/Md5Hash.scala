package graft.util

/** Cross-engine-reproducible 64-bit hash: the first 8 md5 bytes of the
  * UTF-8 string, big-endian unsigned. md5 is the one hash Spark, the
  * JVM, and DuckDB all expose bit-identically, so sketches built on
  * this value (SimHash signatures, LSH hyperplanes) can be reproduced
  * by a SQL oracle: the same value is
  * `conv(substr(md5(s),1,16),16,10)` in Spark SQL and
  * `('0x' || substr(md5(s),1,16))::UBIGINT` in DuckDB.
  */
object Md5Hash {

  /** Caller-managed digest for tight loops (MessageDigest is stateful
    * and not thread-safe; create one per partition/task).
    */
  def prefix64(s: String, md: java.security.MessageDigest): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  def prefix64(s: String): Long =
    prefix64(s, java.security.MessageDigest.getInstance("MD5"))
}
