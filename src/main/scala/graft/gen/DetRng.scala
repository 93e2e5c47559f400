package graft.gen

/**
 * Deterministic, splittable pseudo-random stream.
 *
 * The reference corrupts text with Python's unseeded global RNG
 * (`/root/reference/src/corpus/make_messy_dataset.py:28-60`), which is
 * irreproducible and order-dependent — unusable in a distributed engine where
 * partitions race and resume must be idempotent. We instead derive every
 * random draw from a SplitMix64 stream seeded by a stable 64-bit hash of the
 * (docId, spanOffset) coordinates, so the noisy corpus is a pure function of
 * the clean table (SURVEY.md §7 hard-part 1: same distribution, different
 * stream — a documented deviation).
 *
 * SplitMix64 constants are from the public-domain reference implementation
 * (Steele, Lea & Flood, "Fast Splittable Pseudorandom Number Generators").
 */
final class DetRng(seed: Long) {
  private var state: Long = seed

  def nextLong(): Long = {
    state += 0x9E3779B97F4A7C15L
    var z = state
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Uniform in [0, 1). */
  def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16 // 2^-53

  /** Uniform in [0, bound). */
  def nextInt(bound: Int): Int = {
    require(bound > 0)
    // rejection-free modulo is fine here: bound << 2^64, bias negligible,
    // and determinism (not statistical perfection) is the requirement
    (((nextLong() >>> 1) % bound).toInt)
  }
}

object DetRng {
  /** FNV-1a 64-bit over UTF-8 bytes — stable across JVMs/runs. */
  def hash64(s: String): Long = {
    var h = 0xCBF29CE484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFFL)
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  def hash64(parts: Long*): Long = {
    var h = 0xCBF29CE484222325L
    parts.foreach { p =>
      var v = p
      var k = 0
      while (k < 8) {
        h ^= (v & 0xFFL)
        h *= 0x100000001B3L
        v >>>= 8
        k += 1
      }
    }
    h
  }

  /** Stream seeded by string + longs (e.g. docId, offset). */
  def forKey(key: String, parts: Long*): DetRng =
    new DetRng(hash64(hash64(key) +: parts: _*))
}
