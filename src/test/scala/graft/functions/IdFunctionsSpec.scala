package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class IdFunctionsSpec extends AnyFunSuite {

  private val uuidRe =
    "^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$".r

  test("uuidV7 format: version 7, RFC-4122 variant, lowercase hex") {
    (1 to 100).foreach { _ =>
      val u = IdFunctions.uuidV7String()
      assert(uuidRe.findFirstIn(u).isDefined, u)
    }
  }

  test("uuidV7 is monotonically increasing within a thread") {
    val ids = (1 to 1000).map(_ => IdFunctions.uuidV7String())
    assert(ids === ids.sorted)
    assert(ids.distinct.size === ids.size)
  }

  test("uuidV7 embeds current wall-clock millis") {
    val before = System.currentTimeMillis()
    val u = IdFunctions.uuidV7String()
    val after = System.currentTimeMillis()
    val ms = java.lang.Long.parseLong(u.replace("-", "").take(12), 16)
    assert(ms >= before && ms <= after)
  }
}
