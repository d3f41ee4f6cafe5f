package graft.model

/** Distance metric. Ref: `Distance` `lib/segment/src/types.rs:313-320`;
  * ordering `distance_order()` `types.rs:348-353` — Cosine/Dot larger-better,
  * Euclid/Manhattan smaller-better. User-visible Euclid score is
  * `sqrt(Σ(a-b)²)` and Manhattan `Σ|a-b|` (postprocess,
  * `lib/segment/src/spaces/simple.rs:74-121`).
  */
sealed trait Metric { def largerBetter: Boolean }
case object Dot extends Metric { val largerBetter = true }
case object Cosine extends Metric { val largerBetter = true }
case object Euclid extends Metric { val largerBetter = false }
case object Manhattan extends Metric { val largerBetter = false }
