package graft.etl

/**
 * GCD story-credit type system (reference:
 * /root/reference/src/main/java/org/gcd/etl/GcdStoryCredit.java:26-39 enum,
 * :62-77 id→type table). Ids 1-6 and 9 are base credit kinds; 7, 8 and 10-13
 * are compound macros that expand (recursively in the reference,
 * GcdStoryCredit.java:86-90) to sets of base kinds.
 *
 * We flatten the recursion once, at plan time, into a 20-row relational
 * mapping (id → base id) so the expansion becomes an inner join + fan-out —
 * fully distributed, no per-row branching.
 */
object CreditTypes {

  /** Base credit-type id → snapshot field stem. */
  val baseField: Map[Int, String] = Map(
    1 -> "script", 2 -> "pencils", 3 -> "inks", 4 -> "colors",
    5 -> "letters", 6 -> "editing", 9 -> "painting")

  /** Full id → base-ids expansion (compounds pre-flattened). */
  val expansion: Map[Int, Seq[Int]] = Map(
    1 -> Seq(1), 2 -> Seq(2), 3 -> Seq(3), 4 -> Seq(4), 5 -> Seq(5),
    6 -> Seq(6), 9 -> Seq(9),
    7 -> Seq(2, 3),          // PENCILS_INKS
    8 -> Seq(2, 3, 4),       // PENCILS_INKS_COLORS
    10 -> Seq(1, 2, 3),      // SCRIPT_PENCILS_INKS
    11 -> Seq(1, 2, 3, 4),   // SCRIPT_PENCILS_INKS_COLORS
    12 -> Seq(1, 2, 3, 5),   // SCRIPT_PENCILS_INKS_LETTERS
    13 -> Seq(1, 2, 3, 4, 5) // SCRIPT_PENCILS_INKS_COLORS_LETTERS
  )

  /** Flat (credit_type_id, base_field) pairs — the join-able mapping table. */
  val flatMapping: Seq[(Int, String)] =
    expansion.toSeq.sortBy(_._1).flatMap { case (id, bases) =>
      bases.map(b => (id, baseField(b)))
    }
}
