package graft

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Oracle side-tables: Spark-computed signature frames persisted for
  * the DuckDB oracle replays.
  *
  * The deterministic hash/codec kernels (e06 MinHash, e02 SimHash,
  * e09 SRP, the pure-JDK perceptual/audio/video fingerprints) have no
  * DuckDB counterpart, so a full-SQL oracle for the LSH/dedup family
  * would stop at the signature boundary — those entries were
  * rows-only checks through round 9. Persisting exactly the signature
  * frames lets each oracle read them back and independently replay
  * everything DOWNSTREAM of the kernel: the banding arithmetic, the
  * candidate self-joins, the exact verification (string-shingle
  * Jaccard / double cosine / bit_count Hamming / containment), the
  * thresholds and the ordering. That downstream half is the
  * distributed logic an oracle is for; the kernels themselves are
  * spec/fuzz-checked against plain-Scala references. d08's oracle
  * proved the replay pattern; this generalizes it.
  *
  * Written by [[Verify]] (before the query dump) to a FIXED path the
  * static oracle SQL can name. Verify-then-compare runs sequentially
  * per scale factor, so the side-tables always describe the SF the
  * compare is reading.
  */
object OracleAux {
  /** Fixed root the oracle SQL references (oracle text is static, so
    * the path cannot vary with the run's sfDir/outDir).
    */
  val Root = "/tmp/graft_oracle_aux"

  /** (side-table name, driver queries it serves, producer). */
  private val producers: Seq[(String, Set[String], (SparkSession, String) => DataFrame)] = Seq(
    ("d02_sigs", Set("d02_dedup_minhash"),
      (s, d) => operators.Dedup.d02AuxSigs(s, d)),
    ("d03_sigs", Set("d03_dedup_simhash"),
      (s, d) => operators.Dedup.d03AuxSigs(s, d)),
    // d10 shares the d06 demo corpus, so the embedding side-table
    // serves both; d10 adds only its trained centroids
    ("d06_corpus", Set("d06_embed_neardup_lsh", "d10_semantic_dedup"),
      (s, d) => operators.Dedup.d06AuxCorpus(s, d)),
    ("d10_cents", Set("d10_semantic_dedup"),
      (s, d) => operators.Dedup.d10AuxCentroids(s, d)),
    // signatures cover every vec, so s02 (single-query) and s05
    // (knn-join) share them; s04's full-corpus quantizer is exactly
    // the one s13's filtered probe reuses by design
    ("s02_sigs", Set("s02_ann_lsh", "s05_knn_join_lsh", "s07_ann_lsh_indexed"),
      (s, d) => operators.Ann.s02AuxSigs(s, d)),
    ("s04_cents", Set("s04_ann_ivf", "s13_ann_filtered_ivf",
        "s08_ann_ivf_indexed", "s11_ann_ivf_pq"),
      (s, d) => operators.Ann.s04AuxCentroids(s, d)),
    ("s10_books", Set("s10_ann_pq", "s11_ann_ivf_pq"),
      (s, d) => operators.Ann.s10AuxBooks(s, d)),
    ("s06_cents", Set("s06_knn_join_ivf"),
      (s, d) => operators.Ann.s06AuxCentroids(s, d)),
    // f01's witness is produced by an INDEPENDENT serial walk — a
    // differential oracle for the distributed BFS listing
    ("f01_expected", Set("f01_manifest"),
      (s, d) => sources.FilePipeline.f01AuxSerialWalk(s, d)),
    ("m04_sigs", Set("m04_phash_dedup"),
      (s, d) => operators.Multimodal.m04Sigs(
        operators.Multimodal.plantedImageCorpus(s, d))),
    ("m06_sigs", Set("m06_dhash_dedup"),
      (s, d) => operators.Multimodal.m06Sigs(
        operators.Multimodal.plantedToneCorpus(s, d))),
    ("m08_sigs", Set("m08_audio_dedup"),
      (s, d) => operators.Multimodal.m08Sigs(
        operators.Multimodal.plantedAudioCorpus(s, d))),
    ("m09_sigs", Set("m09_video_dedup"),
      (s, d) => operators.Multimodal.m09Sigs(
        operators.Multimodal.plantedVideoCorpus(s, d))),
    // one sig pair serves BOTH admission queries (d13 is law-equal to
    // d11 row-for-row, so they share one oracle)
    ("d11_sigs_lake", Set("d11_incr_dedup", "d13_indexed_admit"),
      (s, d) => operators.Dedup.d11AuxSigsLake(s, d)),
    ("d11_sigs_new", Set("d11_incr_dedup", "d13_indexed_admit"),
      (s, d) => operators.Dedup.d11AuxSigsNew(s, d)),
    ("s14_cents", Set("s14_kmeans_distributed"),
      (s, d) => operators.Ann.s14AuxCentroids(s, d)),
    // c13's xxhash64 split assignment (the sweep itself is replayed
    // from documents + this table in pure SQL)
    ("c13_assigned", Set("c13_leakproof_split"),
      (s, d) => operators.Corpus.c13AuxAssigned(s, d)),
    // the m07 decode-kernel deltas; scene segmentation (m07) and the
    // keyframe rollup (m10) are both replayed downstream of this
    ("m07_deltas", Set("m07_scene_detect", "m10_keyframe_sample"),
      (s, d) => operators.Multimodal.m07AuxDeltas(s, d)),
    ("m01_feats", Set("m01_multimodal"),
      (s, d) => operators.Multimodal.m01AuxFeatures(s, d)),
    ("m02_frames", Set("m02_frame_sample"),
      (s, d) => operators.Multimodal.m02AuxFrames(s, d)),
    // m14 shares m03's decoded-PCM side-table: the decimation
    // arithmetic replays downstream in SQL
    ("c26_grams", Set("c26_bloom_decontam"),
      (s, d) => operators.Corpus.c26AuxGrams(s, d)),
    ("c26_hits", Set("c26_bloom_decontam"),
      (s, d) => operators.Corpus.c26AuxHits(s, d)),
    ("m03_pcm", Set("m03_audio_windows", "m14_audio_decimate"),
      (s, d) => operators.Multimodal.m03AuxPcm(s, d)),
    // the e12 hashed-bigram bucket counts, shared by DSIR weighting
    // and classifier scoring; the ln/model memos carry the only two
    // non-SQL-replayable artifacts (StrictMath ln, trained weights)
    ("c14_feats", Set("c14_importance_weights", "c16_quality_classifier"),
      (s, d) => operators.Corpus.c14AuxFeats(s, d)),
    ("c14_ln", Set("c14_importance_weights"),
      (s, d) => operators.Corpus.c14AuxLn(s, d)),
    ("c16_model", Set("c16_quality_classifier"),
      (s, d) => operators.Corpus.c16AuxModel(s, d)),
    // MUST follow c16_model: it reads that table back instead of
    // training a third time (producers run in declaration order)
    ("c16_exp", Set("c16_quality_classifier"),
      (s, d) => operators.Corpus.c16AuxExp(s, d)),
    ("t15_ln", Set("t15_lm_score", "c28_ccnet_buckets"),
      (s, d) => operators.TextOps.t15AuxLn(s, d)),
    ("c18_cents", Set("c18_balanced_sample"),
      (s, d) => operators.Ann.c18AuxCentroids(s, d)),
    ("c05_hash", Set("c05_mixture_build", "c28_ccnet_buckets"),
      (s, d) => operators.Corpus.c05AuxHash(s, d)),
    ("c01_sigs", Set("c01_clean_corpus"),
      (s, d) => operators.Corpus.c01AuxSigs(s, d)),
    // the f10 demo's JSONL lines — the oracle re-parses the identical
    // byte strings with DuckDB's independent JSON parser (a true
    // differential check of the PERMISSIVE ingest + quarantine)
    ("f10_lines", Set("f10_jsonl_ingest"),
      (s, d) => sources.JsonlSource.f10Lines(s, d)),
    // the s16 idf ln-memo (≤ 8 rows): DuckDB recomputes BM25 + RRF
    // itself and only looks up the transcendental
    ("s16_ln", Set("s16_hybrid_search"),
      (s, d) => operators.HybridSearch.s16AuxLn(s, d)),
    // m11's payload head bytes (hex) — classification + rollup replay
    // downstream of the non-SQL codecs
    ("m11_heads", Set("m11_type_sniff"),
      (s, d) => operators.Multimodal.m11AuxHeads(s, d)),
    // m12's planted chunk walk + orig/scrub payload hashes — the
    // ancillary classification, size accounting and recovery verdict
    // replay downstream in SQL
    ("m12_chunks", Set("m12_png_scrub"),
      (s, d) => operators.Multimodal.m12AuxChunks(s, d)),
    // m13's decoded input pixels — the exact-integer pooling replays
    // downstream in SQL
    ("m13_pixels", Set("m13_image_pool"),
      (s, d) => operators.Multimodal.m13AuxPixels(s, d)),
    // t19's ln-memo over token counts — the score's only
    // transcendentals; distributions replay in SQL
    ("t19_ln", Set("t19_token_entropy"),
      (s, d) => operators.TextOps.t19AuxLn(s, d)),
    // t23's ln-memo over every (cnt, total) ratio the unigram EM
    // evaluated — the trainer's only transcendental boundary; seed,
    // every DP round, counts, and the loss prune replay in SQL
    ("t23_ln", Set("t23_unigram_train"),
      (s, d) => operators.TextOps.t23AuxLnMemo(s, d)),
    // the f11 demo's CSV lines — the oracle re-parses the identical
    // bytes with an independent RE2 field grammar
    ("f11_lines", Set("f11_csv_ingest"),
      (s, d) => sources.CsvSource.f11Lines(s, d)),
    // q28's xxhash64 per distinct part key + the linear-counting
    // ln-memo — the deterministic HLL estimator replays downstream
    ("q28_hash", Set("q28_approx_distinct"),
      (s, d) => operators.Approx.q28AuxHash(s, d)),
    // t22's xxhash64 CMS cell coordinates per distinct token — the
    // sketch build/estimate/exact-compare all replay in SQL from them
    ("t22_hash", Set("t22_cms_topk"),
      (s, d) => operators.TextOps.t22AuxHash(s, d)),
    ("q28_ln", Set("q28_approx_distinct"),
      (s, d) => operators.Approx.q28AuxLn(s, d)),
    // m15's JPEG segment walk + orig/scrub payload hashes — the
    // APPn/COM classification and accounting replay downstream
    ("m15_segs", Set("m15_jpeg_scrub"),
      (s, d) => operators.Multimodal.m15AuxSegs(s, d)),
    // m16's DCT signatures — banding + popcount verify replay
    ("m16_sigs", Set("m16_dct_dedup"),
      (s, d) => operators.Multimodal.m16AuxSigs(s, d)))

  /** Write the side-tables (all of them, or only those serving the
    * `onlyFor` query filter). A failed producer is loud on stderr and
    * skipped: its oracle compare then fails on the missing file — red
    * for that entry only, never an aborted Verify run.
    */
  def write(spark: SparkSession, sfDir: String,
      onlyFor: Option[Set[String]] = None): Unit =
    producers.foreach { case (name, serves, fn) =>
      if (onlyFor.forall(f => serves.exists(f.contains)))
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$Root/$name")
        catch {
          case NonFatal(e) =>
            System.err.println(
              s"[oracle-aux] side-table '$name' failed: ${e.getClass.getName}: ${e.getMessage}")
        }
    }
}
