package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

/** Greedy sequence packing — assemble documents into fixed token-budget
  * training sequences (the packing step between curation and
  * tokenization: short docs share a sequence, the packer resets at the
  * budget boundary instead of splitting a doc).
  *
  * Rule (classic greedy next-fit over a deterministic order): walk docs
  * in (group, id) order keeping a running fill; when a doc would push
  * fill past the budget AND the bin is non-empty, open a new bin seeded
  * with that doc. An oversized doc (n_tok > budget) therefore sits in a
  * bin of its own rather than being dropped or split — the caller's
  * chunker (q66) is the tool for those.
  *
  * Scale shape: packing is sequential BY DEFINITION inside a group (bin
  * k's boundary depends on every prior doc), so the parallel unit is the
  * group — one shuffle on the group key, then a per-group in-memory walk
  * (`flatMapGroups`). Groups are pack-shards (source, language, or an
  * explicit shard column); memory per task is the largest group, the
  * same bound every blocked operator here rides ([[Dedup
  * .blockLocalComponents]]). A corpus-sized single group is the caller
  * choosing no parallelism — pre-shard (e.g. hash(doc_id) % nShards)
  * to bound it.
  */
object SequencePack {

  /** rows = (group, id, n_tok); returns (group, id, n_tok, bin) with bin
    * dense from 0 within each group in (id) order. */
  def greedy(rows: Dataset[(String, Long, Long)], budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .groupByKey(_._1)
      .flatMapGroups { (group, it) =>
        val docs = it.toArray.sortBy(_._2)
        var bin = 0L
        var fill = 0L
        docs.iterator.map { case (_, id, tok) =>
          if (fill > 0 && fill + tok > budget) { bin += 1; fill = tok }
          else fill += tok
          (group, id, tok, bin)
        }
      }
      .toDF("source", "doc_id", "n_tok", "bin")
  }
}
