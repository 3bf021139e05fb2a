package graft

import graft.core._
import graft.core.HParam._
import org.scalatest.funsuite.AnyFunSuite

import java.util.SplittableRandom

class CoreSpec extends AnyFunSuite {

  val sp: Searchspace = Searchspace(Seq(
    DoubleParam("argument_param", 1, 5),
    IntParam("param2", 3, 4)))

  // -- trial id parity with the reference (maggy/tests/test_trial.py:30-35) --
  test("trial id matches the reference golden hash") {
    val t = Trial.fromAny(Map("param1" -> 5, "param2" -> "ada"))
    assert(Trial.canonicalJson(t.params) == """{"param1": 5, "param2": "ada"}""")
    assert(t.trialId == "3d1cc9fdb1d4d001")
  }

  test("canonical json matches python json.dumps for mixed types") {
    val params = Map("act" -> HV.S("relu"), "lr" -> HV.D(0.01), "x" -> HV.D(3.7))
    assert(Trial.canonicalJson(params) == """{"act": "relu", "lr": 0.01, "x": 3.7}""")
    assert(Trial.trialIdFor(params) == "2d452424339acad7")
  }

  // -- searchspace validation matrix (maggy/tests/test_searchspace.py:34-77) --
  test("searchspace rejects invalid definitions") {
    assertThrows[IllegalArgumentException](Searchspace(Seq(DoubleParam("x", 5, 1))))
    assertThrows[IllegalArgumentException](Searchspace(Seq(DoubleParam("x", 2, 2))))
    assertThrows[IllegalArgumentException](Searchspace(Seq(DiscreteParam("x", Seq.empty))))
    assertThrows[IllegalArgumentException](Searchspace(Seq(CategoricalParam("x", Seq.empty))))
    assertThrows[IllegalArgumentException](Searchspace(Seq(DoubleParam("budget", 0, 1))))
    assertThrows[IllegalArgumentException](
      Searchspace(Seq(DoubleParam("x", 0, 1), DoubleParam("x", 0, 2))))
  }

  test("samples stay within feasible regions") {
    val space = Searchspace(Seq(
      DoubleParam("d", -2, 7), IntParam("i", 10, 20),
      DiscreteParam("q", Seq(0.1, 0.3, 0.9)), CategoricalParam("c", Seq("a", "b"))))
    val rng = new SplittableRandom(7)
    (1 to 500).foreach { _ =>
      val s = space.sample(rng)
      val d = s("d").asDouble; assert(d >= -2 && d <= 7)
      val i = s("i").asDouble; assert(i >= 10 && i <= 20 && i == i.floor)
      assert(Seq(0.1, 0.3, 0.9).contains(s("q").asDouble))
      assert(Seq("a", "b").contains(s("c") match { case HV.S(v) => v; case _ => "?" }))
    }
  }

  test("transform/inverseTransform round-trips (up to integer rounding)") {
    val space = Searchspace(Seq(
      DoubleParam("d", -2, 7), IntParam("i", 10, 20), CategoricalParam("c", Seq("a", "b", "z"))))
    val rng = new SplittableRandom(11)
    (1 to 200).foreach { _ =>
      val s = space.sample(rng)
      val back = space.inverseTransform(space.transform(s))
      assert(math.abs(back("d").asDouble - s("d").asDouble) < 1e-9)
      assert(back("i").asDouble == s("i").asDouble)
      assert(back("c") == s("c"))
    }
  }

  test("transform clips out-of-range values to [0,1]") {
    val space = Searchspace(Seq(DoubleParam("d", 0, 10)))
    assert(space.transform(Map("d" -> HV.D(-5)))(0) == 0.0)
    assert(space.transform(Map("d" -> HV.D(15)))(0) == 1.0)
  }

  test("grid size is the product of axis sizes; continuous rejected") {
    val space = Searchspace(Seq(
      DiscreteParam("q", Seq(1, 2, 3)), CategoricalParam("c", Seq("a", "b"))))
    val g = space.grid()
    assert(g.size == 6)
    assert(g.distinct.size == 6)
    assertThrows[IllegalArgumentException](sp.grid())
  }

  test("metric history drops duplicate/non-monotone steps") {
    val t = Trial.fromAny(Map("a" -> 1))
    t.appendMetric(0, 1.0); t.appendMetric(1, 2.0)
    t.appendMetric(1, 99.0) // dup step dropped (reference trial.py:98-102)
    t.appendMetric(0, 98.0) // regression dropped
    t.appendMetric(2, 3.0)
    assert(t.metricHistory == Vector(MetricPoint(0, 1.0), MetricPoint(1, 2.0), MetricPoint(2, 3.0)))
  }

  test("property: sampled double params always in bounds (randomized)") {
    val meta = new SplittableRandom(1234)
    (1 to 300).foreach { _ =>
      val lo = meta.nextDouble() * 200 - 100
      val width = meta.nextDouble() * 99 + 1
      val space = Searchspace(Seq(DoubleParam("x", lo, lo + width)))
      val v = space.sample(new SplittableRandom(meta.nextLong()))("x").asDouble
      assert(v >= lo && v <= lo + width)
    }
  }
}
