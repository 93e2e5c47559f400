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
final class TokenTrie private (root: TokenTrie.Node) extends Serializable {

  /** All (word, freq, dist) with dist(word, token) <= maxDist. */
  def searchWithin(token: String, maxDist: Int): mutable.ArrayBuffer[(String, Long, Int)] = {
    val t = token.codePoints().toArray
    val n = t.length
    val out = mutable.ArrayBuffer.empty[(String, Long, Int)]
    val row0 = Array.tabulate(n + 1)(identity) // empty-prefix row

    def dfs(node: TokenTrie.Node, nodeChar: Int, row: Array[Int], parentRow: Array[Int]): Unit = {
      var i = 0
      while (i < node.childChars.length) {
        val ch = node.childChars(i)
        val child = node.childNodes(i)
        val childRow = new Array[Int](n + 1)
        childRow(0) = row(0) + 1
        var minV = childRow(0)
        var j = 1
        while (j <= n) {
          val ins = childRow(j - 1) + 1
          val del = row(j) + 1
          val sub = row(j - 1) + (if (ch == t(j - 1)) 0 else 1)
          var v = math.min(math.min(ins, del), sub)
          if (j >= 2 && nodeChar != -1 && ch == t(j - 2) && nodeChar == t(j - 1)) {
            val swap = parentRow(j - 2) + 1
            if (swap < v) v = swap
          }
          childRow(j) = v
          if (v < minV) minV = v
          j += 1
        }
        if (child.word != null && childRow(n) <= maxDist)
          out += ((child.word, child.freq, childRow(n)))
        if (minV <= maxDist) dfs(child, ch, childRow, row)
        i += 1
      }
    }
    if (root.word != null && n <= maxDist) out += ((root.word, root.freq, n))
    dfs(root, -1, row0, row0)
    out
  }
}

object TokenTrie {
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
    words.foreach { case (w, f) =>
      var node = root
      w.codePoints().forEach(cp => node = node.childFor(cp))
      node.word = w
      node.freq = f
    }
    new TokenTrie(root)
  }
}
