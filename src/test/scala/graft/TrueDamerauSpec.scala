package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.DamerauLevenshtein._

class TrueDamerauSpec extends AnyFunSuite {

  test("unrestricted DL: classic cases") {
    assert(distanceUnrestricted("CA", "ABC") == 2)   // OSA gives 3
    assert(distance("CA", "ABC") == 3)
    assert(distanceUnrestricted("ab", "ba") == 1)
    assert(distanceUnrestricted("", "abc") == 3)
    assert(distanceUnrestricted("abc", "") == 3)
    assert(distanceUnrestricted("abc", "abc") == 0)
    assert(distanceUnrestricted("xxabcdefghijklnmop", "abcdefghijklmnop") == 3)
  }

  private def randomStrings(n: Int): Seq[(String, String)] = {
    val rng = new scala.util.Random(42)
    val alpha = "abcd"
    def mk() = (0 until rng.nextInt(12)).map(_ => alpha(rng.nextInt(4))).mkString
    (0 until n).map(_ => (mk(), mk()))
  }

  test("property: unrestricted <= restricted (OSA), both within length bounds") {
    randomStrings(500).foreach { case (a, b) =>
      val unres = distanceUnrestricted(a, b)
      val osa = distance(a, b)
      assert(unres <= osa, s"'$a' vs '$b'")
      assert(unres >= math.abs(a.length - b.length))
      assert(unres <= math.max(a.length, b.length))
    }
  }

  test("property: symmetry and identity") {
    randomStrings(300).foreach { case (a, b) =>
      assert(distanceUnrestricted(a, b) == distanceUnrestricted(b, a))
      assert(distanceUnrestricted(a, a) == 0)
    }
  }
}
