package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class CellsSpec extends AnyFunSuite {

  test("encode/decode round-trip at several levels") {
    val rnd = new scala.util.Random(7)
    (0 until 500).foreach { _ =>
      val x = rnd.nextDouble() * (Cells.World - 1)
      val y = rnd.nextDouble() * (Cells.World - 1)
      val l = 1 + rnd.nextInt(20)
      val c = Cells.encode(x, y, l)
      assert(Cells.level(c) === l)
      val size = Cells.sizeAt(l)
      assert(Cells.ix(c) === math.floor(x / size).toLong)
      assert(Cells.iy(c) === math.floor(y / size).toLong)
    }
  }

  test("distinct points in the same cell square encode equal; neighbors differ") {
    val l = 14
    val s = Cells.sizeAt(l)
    assert(Cells.encode(10 * s + 1, 7 * s + 1, l) === Cells.encode(10 * s + s - 1, 7 * s + s - 1, l))
    assert(Cells.encode(10 * s + 1, 7 * s + 1, l) !== Cells.encode(11 * s + 1, 7 * s + 1, l))
  }

  test("out-of-domain points clamp, never fail") {
    assert(Cells.level(Cells.encode(-5.0, 1e9, 10)) === 10)
    assert(Cells.ix(Cells.encode(-5.0, 0, 10)) === 0L)
    assert(Cells.iy(Cells.encode(0, 1e12, 10)) === (1L << 10) - 1)
  }

  test("parent is the enclosing coarser cell") {
    val c = Cells.encode(12345.6, 54321.0, 16)
    val p = Cells.parent(c, 12)
    assert(Cells.level(p) === 12)
    assert(Cells.ix(p) === Cells.ix(c) >> 4)
    assert(Cells.iy(p) === Cells.iy(c) >> 4)
  }

  test("cover contains the encode cell of every point in the box") {
    val rnd = new scala.util.Random(11)
    (0 until 500).foreach { _ =>
      val x = rnd.nextDouble() * 100000.0
      val y = rnd.nextDouble() * 100000.0
      val w = rnd.nextDouble() * 500.0
      val h = rnd.nextDouble() * 500.0
      val l = 14
      val cells = Cells.cover(x, y, x + w, y + h, l).toSet
      assert(cells.contains(Cells.encode(x, y, l)))
      assert(cells.contains(Cells.encode(x + w, y + h, l)))
      assert(cells.contains(Cells.encode(x + w / 2, y + h / 2, l)))
    }
  }

  test("neighbors: 9 interior, fewer at the border, all adjacent") {
    val c = Cells.encode(5000, 5000, 14)
    val n = Cells.neighbors(c)
    assert(n.length === 9)
    assert(n.contains(c))
    n.foreach { m =>
      assert(math.abs(Cells.ix(m) - Cells.ix(c)) <= 1)
      assert(math.abs(Cells.iy(m) - Cells.iy(c)) <= 1)
    }
    val corner = Cells.encode(0, 0, 14)
    assert(Cells.neighbors(corner).length === 4)
  }

  test("morton interleave is monotone within a row and bit-exact") {
    assert(Cells.interleave(0, 0) === 0L)
    assert(Cells.interleave(1, 0) === 1L)
    assert(Cells.interleave(0, 1) === 2L)
    assert(Cells.interleave(1, 1) === 3L)
    assert(Cells.interleave(0xFFFFFF, 0) === 0x555555555555L)
  }
}
