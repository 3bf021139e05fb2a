package graft

import graft.core._
import graft.core.HParam._
import graft.optimize._
import org.scalatest.funsuite.AnyFunSuite

class OptimizerSpec extends AnyFunSuite {

  private def space2d = Searchspace(Seq(DoubleParam("x", 0, 5), DoubleParam("y", 0, 5)))

  /** Drive an optimizer synchronously with a pure metric fn; returns finals. */
  private def drive(opt: Optimizer, metric: Map[String, HV] => Double, maxSteps: Int = 10000): Seq[Trial] = {
    var steps = 0
    var done = false
    while (!done && steps < maxSteps) {
      steps += 1
      opt.getSuggestion(None) match {
        case NewTrial(t) =>
          opt.noteStarted(t)
          t.finalize_(metric(t.paramsSansBudget))
          opt.noteFinalized(t)
        case Idle => fail("synchronous drive should never see Idle with no busy trials")
        case Done => done = true
      }
    }
    assert(done, "optimizer did not terminate")
    opt.finalStore.toSeq
  }

  test("random search issues exactly numTrials distinct configs") {
    val opt = new RandomSearch()
    opt.initialize(space2d, 20, Direction.Max, seed = 42L)
    val finals = drive(opt, _ => 1.0)
    assert(finals.size == 20)
    assert(finals.map(_.trialId).distinct.size == 20)
  }

  test("random search requires a continuous param") {
    val opt = new RandomSearch()
    assertThrows[IllegalArgumentException] {
      opt.initialize(Searchspace(Seq(CategoricalParam("c", Seq("a")))), 5, Direction.Max, 1L)
    }
  }

  test("grid search enumerates the full cartesian product exactly once") {
    val space = Searchspace(Seq(
      DiscreteParam("a", Seq(1, 2, 3)), CategoricalParam("b", Seq("u", "v"))))
    val opt = new GridSearch()
    opt.initialize(space, 0, Direction.Max, 1L)
    val finals = drive(opt, _ => 0.0)
    assert(finals.size == 6)
    assert(finals.map(t => Trial.canonicalJson(t.params)).distinct.size == 6)
  }

  test("single run issues numTrials empty-param runs") {
    val opt = new SingleRun()
    opt.initialize(Searchspace(Seq.empty), 4, Direction.Max, 1L)
    assert(drive(opt, _ => 0.0).size == 4)
  }

  // -- ASHA rung math (FIXTURES §4: rf=3, min=1, max=9 → budgets 1,3,9) --
  test("ASHA budgets and rung count") {
    val asha = new Asha(reductionFactor = 3, resourceMin = 1, resourceMax = 9)
    asha.initialize(space2d, 27, Direction.Max, 7L) // needs rf^(maxRung+1) = 27
    assert(asha.maxRung == 2)
    assert(asha.budgetFor(0) == 1.0 && asha.budgetFor(1) == 3.0 && asha.budgetFor(2) == 9.0)
  }

  test("ASHA rejects too-small trial budgets") {
    val asha = new Asha(3, 1, 9)
    assertThrows[IllegalArgumentException](asha.initialize(space2d, 8, Direction.Max, 7L))
  }

  test("ASHA promotes top-1/rf and never over-promotes") {
    val asha = new Asha(reductionFactor = 2, resourceMin = 1, resourceMax = 4)
    asha.initialize(space2d, 16, Direction.Max, 7L)
    // metric = x so promotion order is known; ASHA sorts DESC by final metric
    val finals = drive(asha, p => p("x").asDouble)
    val byRung = finals.groupBy(t => asha.rungOf(t.trialId).getOrElse(-1))
    assert(byRung(0).size == 16)
    // async ASHA can promote trials that were top-1/rf *at promotion time*;
    // structural invariants: rungs shrink, budgets follow min·rf^rung
    val r1 = byRung.getOrElse(1, Seq.empty)
    val r2 = byRung.getOrElse(2, Seq.empty)
    assert(r1.nonEmpty && r1.size < byRung(0).size)
    assert(r2.size <= r1.size)
    assert(r1.forall(_.budget.contains(2.0)) && r2.forall(_.budget.contains(4.0)))
    // the best rung-0 trial must have been promoted (it is in every top-k)
    val bestR0 = byRung(0).maxBy(_.params("x").asDouble)
    assert(r1.exists(_.paramsSansBudget == bestR0.paramsSansBudget))
  }

  // -- Hyperband budget table (FIXTURES §4: η=3, min=1, max=9) --
  test("Hyperband rung/budget math") {
    val hb = new Hyperband(eta = 3, resourceMin = 1, resourceMax = 9)
    assert(hb.maxShRungs == 3)
    assert(hb.budgetFor(0) == 1.0 && hb.budgetFor(1) == 3.0 && hb.budgetFor(2) == 9.0)
  }

  test("Hyperband via RandomSearch completes all SH iterations") {
    val opt = new RandomSearch(Some(new Hyperband(eta = 3, resourceMin = 1, resourceMax = 9)))
    opt.initialize(space2d, 100, Direction.Min, 3L)
    val finals = drive(opt, p => p("x").asDouble)
    // (FIXTURES §4, η=3, min=1, max=9 → maxShRungs=3, budgets [1,3,9]):
    // iteration 0: ns=[9,3,1] budgets[1,3,9]; iteration 1: ns=[3,1] budgets[3,9];
    // iteration 2: ns=[3] budgets[9]
    assert(finals.size == (9 + 3 + 1) + (3 + 1) + 3)
    val budgets = finals.flatMap(_.budget).groupBy(identity).view.mapValues(_.size).toMap
    assert(budgets(1.0) == 9)
    assert(budgets(3.0) == 3 + 3)
    assert(budgets(9.0) == 1 + 1 + 3)
  }

  test("BOHB (TPE + Hyperband) keeps the SH schedule and draws model samples") {
    val opt = Optimizer.forName("bohb",
      Map("eta" -> 3.0, "resource_min" -> 1.0, "resource_max" -> 9.0, "num_warmup" -> 4.0))
    opt.initialize(space2d, 100, Direction.Min, 3L)
    val finals = drive(opt, p => {
      val x = p("x").asDouble; val y = p("y").asDouble
      (x - 3.2) * (x - 3.2) + (y - 2) * (y - 2)
    })
    // budget schedule identical to plain Hyperband (FIXTURES §4)
    assert(finals.size == (9 + 3 + 1) + (3 + 1) + 3)
    val budgets = finals.flatMap(_.budget).groupBy(identity).view.mapValues(_.size).toMap
    assert(budgets(1.0) == 9)
    assert(budgets(3.0) == 3 + 3)
    assert(budgets(9.0) == 1 + 1 + 3)
    // TPE must have informed at least one fresh config once rung data existed
    assert(finals.exists(_.sampleType == "model"),
      s"sample types: ${finals.map(_.sampleType).distinct}")
  }

  test("GP under Hyperband keeps the SH schedule") {
    val opt = Optimizer.forName("gp_hyperband",
      Map("eta" -> 3.0, "resource_min" -> 1.0, "resource_max" -> 9.0, "num_warmup" -> 4.0))
    opt.initialize(space2d, 100, Direction.Min, 3L)
    val finals = drive(opt, p => {
      val x = p("x").asDouble; val y = p("y").asDouble
      (x - 3.2) * (x - 3.2) + (y - 2) * (y - 2)
    })
    assert(finals.size == (9 + 3 + 1) + (3 + 1) + 3)
    val budgets = finals.flatMap(_.budget).groupBy(identity).view.mapValues(_.size).toMap
    assert(budgets(1.0) == 9 && budgets(3.0) == 6 && budgets(9.0) == 5)
  }

  // -- median stopping rule worked example (reference medianrule.py:34-59) --
  test("median rule stops a below-median candidate (direction=max)") {
    def finalizedWith(vals: Seq[Double]): Trial = {
      val t = Trial.fromAny(Map("v" -> vals.head))
      vals.zipWithIndex.foreach { case (v, i) => t.appendMetric(i.toLong, v) }
      t.finalize_(vals.last)
      t
    }
    val finalized = Seq(
      finalizedWith(Seq(1.0, 2.0, 3.0)), // prefix avg @2 steps = 1.5
      finalizedWith(Seq(5.0, 6.0, 7.0)), // 5.5
      finalizedWith(Seq(9.0, 10.0, 11.0))) // 9.5  → median = 5.5
    val weak = Trial.fromAny(Map("v" -> 0.1))
    weak.appendMetric(0, 1.0); weak.appendMetric(1, 2.0) // best = 2.0 < 5.5 → stop
    val strong = Trial.fromAny(Map("v" -> 0.2))
    strong.appendMetric(0, 6.0); strong.appendMetric(1, 8.0) // best = 8.0 > 5.5 → keep
    val stopped = MedianStoppingRule.check(Seq(weak, strong), finalized, Direction.Max)
    assert(stopped == Seq(weak.trialId))
    // direction=min flips: strong (high metrics) is the one stopped
    val stoppedMin = MedianStoppingRule.check(Seq(weak, strong), finalized, Direction.Min)
    assert(stoppedMin == Seq(strong.trialId))
  }

  test("TPE finds a near-optimal config on a smooth objective") {
    val opt = new Tpe()
    opt.initialize(space2d, 60, Direction.Min, seed = 5L)
    // minimize (x-3.2)^2 + (y-2)^2
    val finals = drive(opt, p => {
      val x = p("x").asDouble; val y = p("y").asDouble
      (x - 3.2) * (x - 3.2) + (y - 2) * (y - 2)
    })
    assert(finals.size == 60)
    val best = finals.flatMap(_.finalMetric).min
    assert(best < 0.5, s"TPE best $best should beat random-ish 0.5")
    // model-based samples must appear after warm-up and beat the random draws
    val modelBest = finals.filter(_.sampleType == "model").flatMap(_.finalMetric)
    val randomBest = finals.filter(_.sampleType != "model").flatMap(_.finalMetric)
    assert(modelBest.nonEmpty && modelBest.min < randomBest.min)
  }

  test("GP finds a near-optimal config on a smooth objective") {
    val opt = new Gp(nPoints = 2000)
    opt.initialize(space2d, 40, Direction.Min, seed = 9L)
    val finals = drive(opt, p => {
      val x = p("x").asDouble; val y = p("y").asDouble
      (x - 3.2) * (x - 3.2) + (y - 2) * (y - 2)
    })
    assert(finals.size == 40)
    val best = finals.flatMap(_.finalMetric).min
    assert(best < 0.3, s"GP best $best")
    assert(finals.count(_.sampleType == "model") > 0)
  }

  test("GP LCB and PI acquisitions also converge on a smooth objective") {
    for (acqName <- Seq("gp_lcb", "gp_pi", "gp_asyts")) {
      val opt = Optimizer.forName(acqName).asInstanceOf[Gp]
      opt.initialize(space2d, 40, Direction.Min, seed = 9L)
      val finals = drive(opt, p => {
        val x = p("x").asDouble; val y = p("y").asDouble
        (x - 3.2) * (x - 3.2) + (y - 2) * (y - 2)
      })
      assert(finals.size == 40)
      val best = finals.flatMap(_.finalMetric).min
      assert(best < 0.5, s"$acqName best $best")
      assert(finals.count(_.sampleType == "model") > 0, s"$acqName never used the model")
    }
  }

  test("TPE samples categorical dims by resample-probability, not gaussian index walk") {
    val catSpace = Searchspace(Seq(
      HParam.DoubleParam("x", 0, 5),
      HParam.CategoricalParam("mode", Seq("a", "b", "c"))))
    val opt = new Tpe()
    opt.initialize(catSpace, 60, Direction.Min, seed = 11L)
    // mode=b is strictly better; TPE should concentrate there
    val finals = drive(opt, p => {
      val x = p("x").asDouble
      val penalty = p("mode") match { case HV.S("b") => 0.0; case _ => 5.0 }
      (x - 3.2) * (x - 3.2) + penalty
    })
    assert(finals.size == 60)
    val model = finals.filter(_.sampleType == "model")
    assert(model.nonEmpty)
    val bRate = model.count(t => t.params("mode") == HV.S("b")).toDouble / model.size
    assert(bRate > 0.5, s"model samples should concentrate on mode=b, got $bRate")
  }

  test("GP interim-results mode learns from metric histories (budget-augmented X)") {
    val opt = new Gp(nPoints = 2000, interimResults = true, interimInterval = 2)
    opt.initialize(space2d, 40, Direction.Min, seed = 13L)
    // objective whose training curve anneals toward the true value — interim
    // points (z < 1) are worse than the final, so the surrogate must use the
    // budget dimension to separate them
    def truth(p: Map[String, HV]): Double = {
      val x = p("x").asDouble; val y = p("y").asDouble
      (x - 3.2) * (x - 3.2) + (y - 2) * (y - 2)
    }
    var steps = 0
    var done = false
    while (!done && steps < 10000) {
      steps += 1
      opt.getSuggestion(None) match {
        case NewTrial(t) =>
          opt.noteStarted(t)
          val v = truth(t.paramsSansBudget)
          (0 until 10).foreach(s => t.appendMetric(s.toLong, v + (9 - s) * 0.5))
          t.finalize_(v)
          opt.noteFinalized(t)
        case Idle => fail("synchronous drive should never see Idle")
        case Done => done = true
      }
    }
    val finals = opt.finalStore.toSeq
    assert(finals.size == 40)
    val best = finals.flatMap(_.finalMetric).min
    assert(best < 0.5, s"interim GP best $best")
    assert(finals.count(_.sampleType == "model") > 0)
  }

  test("pruner-path duplicate exhaustion skips the slot instead of reissuing") {
    // an optimizer whose fresh-config supply is exhausted under a pruner
    // must answer Idle (work outstanding) / Done (none) — never a trial
    // whose id collides with an existing one (the store-corruption hazard
    // prunerDispatch's Option path exists to prevent)
    object ExhaustedOpt extends Optimizer {
      def getSuggestion(completed: Option[Trial]): Suggestion =
        prunerDispatch(new Hyperband(eta = 3, resourceMin = 1, resourceMax = 9),
          completed, _ => None)
    }
    ExhaustedOpt.initialize(space2d, 100, Direction.Min, 7L)
    // nothing busy → Done, and REPEATABLY Done: the pruner's slot
    // reservation must roll back each time (without trackSkipped the rung
    // bookkeeping counts phantom configs and the schedule stalls in Idle)
    assert(ExhaustedOpt.getSuggestion(None) == Done)
    assert(ExhaustedOpt.getSuggestion(None) == Done)
    // something busy → Idle (the slot waits; no colliding trial is emitted)
    val busy = new Trial(Map("x" -> HV.D(1.0), "y" -> HV.D(2.0)))
    ExhaustedOpt.noteStarted(busy)
    assert(ExhaustedOpt.getSuggestion(None) == Idle)
  }

  test("pruner slot recovers after a transient exhaustion") {
    // fresh fails once, then supplies configs again: the rolled-back slot
    // must be re-offered and the SH schedule complete normally
    var failures = 1
    val rng = new java.util.SplittableRandom(11L)
    object FlakyOpt extends Optimizer {
      val hb = new Hyperband(eta = 3, resourceMin = 1, resourceMax = 9)
      override protected def init(): Unit = hb.initialize(numTrials)
      def getSuggestion(completed: Option[Trial]): Suggestion =
        prunerDispatch(hb, completed, _ => {
          if (failures > 0) { failures -= 1; None }
          else Some(new Trial(searchspace.sample(rng)))
        })
    }
    FlakyOpt.initialize(space2d, 100, Direction.Min, 11L)
    // drive synchronously; first ask returns Done (nothing busy, fresh failed)
    assert(FlakyOpt.getSuggestion(None) == Done)
    // subsequent asks succeed and the full Hyperband schedule completes
    var done = false
    var steps = 0
    var finals = 0
    while (!done && steps < 1000) {
      steps += 1
      FlakyOpt.getSuggestion(None) match {
        case NewTrial(t) =>
          FlakyOpt.noteStarted(t)
          t.finalize_(t.paramsSansBudget("x").asDouble)
          FlakyOpt.noteFinalized(t)
          finals += 1
        case Idle => fail("no busy trials — Idle would livelock")
        case Done => done = true
      }
    }
    assert(done, "schedule did not complete after transient exhaustion")
    assert(finals == (9 + 3 + 1) + (3 + 1) + 3, s"unexpected trial count $finals")
  }

  test("duplicate-config detection ignores budget") {
    val opt = new RandomSearch()
    opt.initialize(space2d, 2, Direction.Max, 1L)
    val t1 = new Trial(Map("x" -> HV.D(1.0), "budget" -> HV.D(1.0)))
    opt.noteStarted(t1)
    val t2 = new Trial(Map("x" -> HV.D(1.0), "budget" -> HV.D(3.0)))
    assert(opt.hparamsExist(t2))
  }
}
