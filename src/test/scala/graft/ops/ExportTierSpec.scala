package graft.ops

import graft.SparkSpec

/** Laws of the training-data export tier (q142 epoch shuffle, q143
  * BPE-budget packing, q148 loader manifest) that the value-level oracle
  * can't state: the shuffle is a real permutation that differs by epoch
  * but never by run, packs fill to the budget, and the manifest's order
  * fingerprints change across epochs while totals are conserved.
  */
class ExportTierSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  test("q142: each (epoch, shard) holds a dense 1..n position range, " +
      "every doc appears exactly once per epoch, and the two epochs " +
      "order docs differently") {
    val rows = q("q142_epoch_shuffle").collect()
    val byEpoch = rows.groupBy(_.getAs[Int]("epoch"))
    assert(byEpoch.keySet == Set(0, 1))
    byEpoch.foreach { case (e, rs) =>
      val docs = rs.map(_.getAs[Long]("doc_id"))
      assert(docs.length == docs.distinct.length,
        s"epoch $e assigns a doc twice")
      rs.groupBy(_.getAs[String]("shard")).foreach { case (sh, srs) =>
        val pos = srs.map(_.getAs[Long]("pos")).sorted
        assert(pos.toSeq == (1L to srs.length).toSeq,
          s"epoch $e shard $sh positions not dense: $pos")
      }
    }
    val order = (e: Int) => byEpoch(e)
      .sortBy(r => (r.getAs[String]("shard"), r.getAs[Long]("pos")))
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(order(0) != order(1),
      "epochs must produce different permutations")
  }

  test("q143: offsets are a per-source prefix sum and every interior " +
      "pack fills to the 2048 budget") {
    val rows = q("q143_bpe_pack").collect()
      .groupBy(_.getAs[String]("source"))
    rows.foreach { case (src, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
      var expect = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("tok_offset") == expect,
          s"$src: offset break at $r")
        expect += r.getAs[Long]("n_tok")
      }
      // every pack except the source's last spans >= the full budget
      // (offsets are a prefix sum, so a pack closes only by crossing it)
      val lastPack = sorted.last.getAs[Long]("pack_id")
      val byPack = sorted.groupBy(_.getAs[Long]("pack_id"))
      byPack.filter(_._1 != lastPack).foreach { case (p, prs) =>
        assert(prs.map(_.getAs[Long]("n_tok")).sum >=
          2048 - prs.map(_.getAs[Long]("pack_offset")).min,
          s"$src pack $p closed before filling: $prs")
      }
    }
  }

  test("q148: token totals are conserved across epochs, every epoch " +
      "covers all packs, and order fingerprints differ between epochs") {
    val rows = q("q148_loader_manifest").collect()
    val byEpoch = rows.groupBy(_.getAs[Int]("epoch"))
    assert(byEpoch.keySet == Set(0, 1))
    val totals = byEpoch.map { case (e, rs) =>
      e -> (rs.map(_.getAs[Long]("n_packs")).sum,
        rs.map(_.getAs[Long]("n_tokens")).sum)
    }
    assert(totals(0) == totals(1),
      s"shuffling must conserve packs/tokens: $totals")
    val shas = byEpoch.map { case (e, rs) =>
      e -> rs.map(r => (r.getAs[String]("shard"),
        r.getAs[String]("order_sha"))).toMap
    }
    assert(shas(0) != shas(1),
      "epoch permutations must yield different order fingerprints")
  }
}
