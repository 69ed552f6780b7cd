package graft.util

/** Deterministic 64-bit string/byte hashing for the sketch operators
  * (MinHash, SimHash, LSH). FNV-1a over UTF-8 bytes with a splitmix64
  * finalizer — stable across JVMs and releases (unlike String.hashCode
  * or any engine-internal hash), which keeps sketches reproducible
  * run-over-run and cluster-over-cluster.
  */
object Hash64 {

  def apply(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0xcbf29ce484222325L // FNV offset basis
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L // FNV prime
      i += 1
    }
    mix(h)
  }

  /** splitmix64 finalizer — full avalanche. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Combine two hashes (order-sensitive). */
  def combine(a: Long, b: Long): Long = mix(a * 0x100000001b3L + b)
}
