package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plan.{ParamGrid, ParamSampler, RemovalLadder}

class PlannerSpec extends AnyFunSuite {

  test("ParamGrid expands in sorted-key product order, last key fastest") {
    val got = ParamGrid.expand(Map("b" -> Seq(3, 4), "a" -> Seq(1, 2)))
    assert(got == Seq(
      Map("a" -> 1, "b" -> 3), Map("a" -> 1, "b" -> 4),
      Map("a" -> 2, "b" -> 3), Map("a" -> 2, "b" -> 4)))
  }

  test("ParamGrid multi-grid concatenates in order") {
    val got = ParamGrid.expandAll(Seq(
      Map("a" -> Seq(1)), Map("b" -> Seq(2, 3))))
    assert(got == Seq(Map("a" -> 1), Map("b" -> 2), Map("b" -> 3)))
  }

  test("ParamSampler clamps nIter to grid size and is seeded-deterministic") {
    val grid = Map("a" -> Seq(1, 2, 3), "b" -> Seq(10, 20))
    val all = ParamSampler.sample(grid, 100, seed = 7)
    assert(all.size == 6)
    assert(all.toSet == ParamGrid.expand(grid).toSet)
    val s1 = ParamSampler.sample(grid, 3, seed = 42)
    val s2 = ParamSampler.sample(grid, 3, seed = 42)
    assert(s1 == s2 && s1.size == 3)
    assert(s1.distinct.size == 3, "sampling is without replacement")
  }

  test("groupKFolds: no group straddles folds; row counts balance greedily") {
    import graft.exec.ModelParallel.groupKFolds
    val rng = new scala.util.Random(3)
    // 40 groups with skewed sizes (1..30 rows each)
    val groups = (0 until 40).flatMap(g =>
      Seq.fill(1 + rng.nextInt(30))(s"g$g")).toArray
    val folds = groupKFolds(groups, 5)
    assert(folds.length == groups.length)
    // invariant: fold is a function of the group
    val perGroup = groups.zip(folds).groupBy(_._1).view.mapValues(_.map(_._2).distinct)
    assert(perGroup.values.forall(_.length == 1), "a group straddled folds")
    // greedy balancing keeps fold sizes within the largest group's size
    val sizes = folds.groupBy(identity).values.map(_.length)
    val largestGroup = groups.groupBy(identity).values.map(_.length).max
    assert(sizes.max - sizes.min <= largestGroup,
      s"fold sizes $sizes spread more than the largest group ($largestGroup)")
    // deterministic
    assert(groupKFolds(groups, 5).toSeq == folds.toSeq)
    // needs at least k groups
    assertThrows[IllegalArgumentException] {
      groupKFolds(Array("a", "a", "b"), 3)
    }
  }

  test("RemovalLadder keeps the empty drop-set and respects min features") {
    assert(RemovalLadder.dropCounts(64, 5, 10) == (0 to 50 by 5))
    assert(RemovalLadder.dropCounts(10, 3, 10) == Seq(0))
    val rungs = RemovalLadder.rungs(Seq(9, 8, 7, 6, 5, 4, 3, 2, 1, 0), 3, 4)
    assert(rungs == Seq(Seq(), Seq(9, 8, 7), Seq(9, 8, 7, 6, 5, 4)))
  }
}
