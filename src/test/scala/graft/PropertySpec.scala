package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.plan.{ParamGrid, ParamSampler, RemovalLadder}

/** Property tests for the driver-side planners (SURVEY.md §5 test plan:
  * grid = sorted-key product, sampler clamp, ladder monotonicity).
  */
object PlannerProperties extends Properties("planners") {

  private val gridGen: Gen[Map[String, Seq[Int]]] = for {
    nKeys <- Gen.choose(1, 4)
    keys <- Gen.listOfN(nKeys,
      Gen.nonEmptyListOf(Gen.alphaChar).map(_.take(6).mkString))
    sizes <- Gen.listOfN(nKeys, Gen.choose(1, 4))
  } yield keys.distinct.zip(sizes).map { case (k, s) =>
    k -> (1 to s).toSeq
  }.toMap

  property("grid size = product of value-list sizes; combos distinct") =
    forAll(gridGen) { grid =>
      val expanded = ParamGrid.expand(
        grid.map { case (k, v) => k -> v.map(_.asInstanceOf[Any]) })
      val expected = grid.values.map(_.size.toLong).product
      Prop(expanded.size.toLong == expected) &&
        Prop(expanded.distinct.size == expanded.size) &&
        Prop(expanded.forall(_.keySet == grid.keySet))
    }

  property("grid order: first sorted key varies slowest") =
    forAll(gridGen.suchThat(_.size >= 2)) { grid =>
      val expanded = ParamGrid.expand(
        grid.map { case (k, v) => k -> v.map(_.asInstanceOf[Any]) })
      val firstKey = grid.keys.toSeq.sorted.head
      val firstVals = expanded.map(_(firstKey).asInstanceOf[Int])
      Prop(firstVals == firstVals.sorted)
    }

  property("sampler clamps, draws without replacement, seeded-deterministic") =
    forAll(gridGen, Gen.choose(0, 50), Gen.choose(0L, 1000L)) {
      (grid, nIter, seed) =>
        val g = grid.map { case (k, v) => k -> v.map(_.asInstanceOf[Any]) }
        val full = ParamGrid.expand(g)
        val s = ParamSampler.sample(g, nIter, seed)
        Prop(s.size == math.min(nIter, full.size)) &&
          Prop(s.distinct.size == s.size) &&
          Prop(s.toSet.subsetOf(full.toSet)) &&
          Prop(s == ParamSampler.sample(g, nIter, seed))
    }

  property("ladder: starts at 0, strictly increasing, bounded, maximal") =
    forAll(Gen.choose(1, 200), Gen.choose(1, 20), Gen.choose(1, 50)) {
      (nFeat, step, minKeep) =>
        val drops = RemovalLadder.dropCounts(nFeat, step, minKeep)
        if (nFeat >= minKeep)
          Prop(drops.head == 0) &&
            Prop(drops == drops.sorted && drops.distinct == drops) &&
            Prop(drops.forall(d => nFeat - d >= minKeep)) &&
            Prop(nFeat - (drops.last + step) < minKeep)
        else Prop(drops.isEmpty)
    }
}
