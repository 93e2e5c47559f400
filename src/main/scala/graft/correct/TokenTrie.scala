package graft.correct

import scala.collection.mutable

/**
 * Code-point trie over the vocabulary with Levenshtein-automaton-style
 * candidate generation: a DFS that carries a Damerau-Levenshtein (OSA) DP row
 * per node and prunes any subtree whose row minimum exceeds `maxDist` — the
 * classic trie ∩ Levenshtein-automaton intersection. Replaces the reference's
 * full-vocabulary scan per OOV token
 * (`/root/reference/src/baselines/dictionary_corrector.py:86-95`) with a
 * search that touches only the fraction of the trie within edit range
 * (BASELINE.json north_star: "broadcast dictionary trie with
 * Levenshtein-automaton candidate generation").
 */
final class TokenTrie private (root: TokenTrie.Node, val maxDepth: Int) extends Serializable {

  /**
   * All (word, freq, dist) with dist(word, token) <= maxDist.
   *
   * DP rows live in a per-search stack indexed by trie depth (siblings reuse
   * the same buffer once the previous subtree unwinds) — one allocation per
   * search instead of one per visited node, which matters: wide searches over
   * merged tokens visit thousands of nodes, and per-node allocation makes the
   * kernel GC-bound at high parallelism.
   */
  def searchWithin(token: String, maxDist: Int): mutable.ArrayBuffer[(String, Long, Int)] = {
    val t = token.codePoints().toArray
    val n = t.length
    val out = mutable.ArrayBuffer.empty[(String, Long, Int)]
    val depthCap = math.min(maxDepth, n + maxDist) + 2
    val rows = TokenTrie.rowCache.get().acquire(depthCap + 1, n + 1)
    var j = 0
    while (j <= n) { rows(0)(j) = j; j += 1 }
    val chars = new Array[Int](depthCap + 1) // node char per depth (for swap)

    // depth d = number of trie chars consumed; rows(d) = DP row of that prefix
    def dfs(node: TokenTrie.Node, d: Int): Unit = {
      if (d + 1 > depthCap) return // any deeper word exceeds maxDist by length
      val row = rows(d)
      val parentRow = if (d >= 1) rows(d - 1) else null
      val nodeChar = if (d >= 1) chars(d) else -1
      var i = 0
      while (i < node.childChars.length) {
        val ch = node.childChars(i)
        val child = node.childNodes(i)
        val childRow = rows(d + 1)
        childRow(0) = row(0) + 1
        var minV = childRow(0)
        var jj = 1
        while (jj <= n) {
          val ins = childRow(jj - 1) + 1
          val del = row(jj) + 1
          val sub = row(jj - 1) + (if (ch == t(jj - 1)) 0 else 1)
          var v = math.min(math.min(ins, del), sub)
          if (jj >= 2 && nodeChar != -1 && ch == t(jj - 2) && nodeChar == t(jj - 1)) {
            val swap = parentRow(jj - 2) + 1
            if (swap < v) v = swap
          }
          childRow(jj) = v
          if (v < minV) minV = v
          jj += 1
        }
        if (child.word != null && childRow(n) <= maxDist)
          out += ((child.word, child.freq, childRow(n)))
        if (minV <= maxDist) {
          chars(d + 1) = ch
          dfs(child, d + 1)
        }
        i += 1
      }
    }
    if (root.word != null && n <= maxDist) out += ((root.word, root.freq, n))
    dfs(root, 0)
    out
  }
}

object TokenTrie {
  /** Per-thread DP-row workspace, grown on demand and reused across searches
    * — segmentation-aware inference issues ~2·len width-1 searches per merged
    * token, so per-search allocation shows up as GC pressure at scale. */
  private final class RowWorkspace {
    private var rows: Array[Array[Int]] = Array.empty
    def acquire(nRows: Int, rowLen: Int): Array[Array[Int]] = {
      if (rows.length < nRows || (rows.length > 0 && rows(0).length < rowLen)) {
        val r = math.max(nRows, rows.length)
        val c = math.max(rowLen, if (rows.isEmpty) 0 else rows(0).length)
        rows = Array.ofDim[Int](r, c)
      }
      rows
    }
  }
  private val rowCache = new ThreadLocal[RowWorkspace] {
    override def initialValue(): RowWorkspace = new RowWorkspace
  }

  private[correct] final class Node extends Serializable {
    var word: String = _
    var freq: Long = 0L
    // parallel sorted arrays — compact, cache-friendly, cheap to serialize
    var childChars: Array[Int] = Array.emptyIntArray
    var childNodes: Array[Node] = Array.empty

    private[TokenTrie] def childFor(ch: Int): Node = {
      val idx = java.util.Arrays.binarySearch(childChars, ch)
      if (idx >= 0) childNodes(idx)
      else {
        val at = -idx - 1
        val n = new Node
        childChars = childChars.patch(at, Array(ch), 0)
        childNodes = childNodes.patch(at, Array(n), 0)
        n
      }
    }
  }

  def build(words: Iterable[(String, Long)]): TokenTrie = {
    val root = new Node
    var maxDepth = 0
    words.foreach { case (w, f) =>
      var node = root
      w.codePoints().forEach(cp => node = node.childFor(cp))
      node.word = w
      node.freq = f
      maxDepth = math.max(maxDepth, w.codePointCount(0, w.length))
    }
    new TokenTrie(root, maxDepth)
  }
}
