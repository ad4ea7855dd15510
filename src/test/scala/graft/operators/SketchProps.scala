package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants of the Space-Saving summary — pure JVM-side
  * (no Spark session): the `est - err ≤ true ≤ est` bound and the
  * frequent-items guarantee must survive ARBITRARY partition splits and
  * merge orders, because Spark decides both at runtime. */
object SketchProps extends Properties("sketches") {

  private val keyGen = Gen.frequency(
    (5, Gen.choose(0, 4).map(i => s"hot_$i")), // skewed head
    (3, Gen.choose(0, 50).map(i => s"mid_$i")),
    (2, Gen.choose(0, 5000).map(i => s"cold_$i")))

  private val streamGen = for {
    n <- Gen.choose(50, 800)
    keys <- Gen.listOfN(n, keyGen)
    parts <- Gen.choose(1, 7)
  } yield (keys, parts)

  property("est-err <= true <= est after arbitrary splits and merges") =
    forAll(streamGen, Gen.choose(4, 32)) { case ((keys, parts), capacity) =>
      val agg = new Sketches.SpaceSaving(capacity)
      // split round-robin into `parts` buffers, then left-fold merge —
      // mimics Spark's partial/final aggregation tree
      val bufs = (0 until parts).map(_ => agg.zero)
      keys.zipWithIndex.foreach { case (k, i) => agg.reduce(bufs(i % parts), (k, 1L)) }
      val merged = bufs.reduceLeft(agg.merge)
      val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      agg.finish(merged).forall { e =>
        val t = truth.getOrElse(e.key, 0L)
        t <= e.est && e.est - e.err <= t
      }
    }

  property("keys above the total/capacity frequency bound always survive") =
    forAll(streamGen, Gen.choose(8, 32)) { case ((keys, parts), capacity) =>
      val agg = new Sketches.SpaceSaving(capacity)
      val bufs = (0 until parts).map(_ => agg.zero)
      keys.zipWithIndex.foreach { case (k, i) => agg.reduce(bufs(i % parts), (k, 1L)) }
      val merged = bufs.reduceLeft(agg.merge)
      val kept = agg.finish(merged).map(_.key).toSet
      val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      // merge truncation can add up to (parts-1) mins of hidden mass; the
      // conservative survivor bound is parts * n / capacity
      val bound = parts.toLong * keys.size / capacity
      truth.filter(_._2 > bound).keys.forall(kept.contains)
    }

  property("exact when capacity covers the key space, regardless of split") =
    forAll(streamGen) { case (keys, parts) =>
      val agg = new Sketches.SpaceSaving(6000)
      val bufs = (0 until parts).map(_ => agg.zero)
      keys.zipWithIndex.foreach { case (k, i) => agg.reduce(bufs(i % parts), (k, 1L)) }
      val merged = bufs.reduceLeft(agg.merge)
      val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val out = agg.finish(merged)
      out.size == truth.size && out.forall(e =>
        e.err == 0L && truth(e.key) == e.est)
    }
}
