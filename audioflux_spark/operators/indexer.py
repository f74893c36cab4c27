"""Index build — per-partition segment construction + salted hierarchical merge.

Pipeline (the audioFlux pipeline shape, SURVEY §7.0, re-expressed):

  range-partition docs by (conv_id, turn_idx)      | block partitioning
  assign dense docIDs (offsets + local cumcount)   | implicit positional key
  per-partition vectorized tokenize + posting build| per-frame C kernels (OMP)
  delta+varint blobs with block-max metadata       | precomputed tables
  two-phase salted repartition-by-term merge       | filterbank grouped agg
  resumable per-partition checkpoints + lineage    | isContinue tail carry

Scale design notes (100 TB / 10^12 turns):
* docIDs: no global sort materialization — range partition, count per
  partition (one cheap agg), cumulative offsets on the driver (P integers),
  then offset+cumcount inside mapInPandas. Deterministic given the input.
* the ONLY wide op on raw data is the initial repartitionByRange; everything
  until the merge is partition-local. The merge shuffles *compressed blobs*,
  not postings rows — ~1-2 bytes per posting instead of ~30.
* hot terms (Zipf head: 'hotterm' is in 40% of turns) would make
  groupBy(term) straggle; phase 1 merges within salt buckets
  (pmod(seg_id, S)), phase 2 merges ≤S pre-merged rows per term. Blob merge
  is O(1) per boundary (rebase_first_gap) because segment doc ranges are
  disjoint and ordered by seg_id.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from audioflux_spark.config import DEFAULT, EngineConfig
from audioflux_spark.functions.analyzer import doc_len_col
from audioflux_spark.functions.codec import (
    encode_positions_flat,
    encode_segment_batch_flat,
)
from audioflux_spark.plans.checkpoint import (
    Manifest,
    PartitionEntry,
    load_manifest,
    save_manifest,
)

_SEG_COLS = (
    "term string, df long, first_doc long, last_doc long, "
    "doc_blob binary, tf_blob binary, dl_blob binary, pos_blob binary, "
    "block_counts array<int>, block_firsts array<long>, block_maxes array<double>, "
    "block_doc_bytes array<int>, block_tf_bytes array<int>, block_dl_bytes array<int>, "
    "block_pos_bytes array<int>, part_counts array<long>"
)
PARTIAL_SCHEMA = "seg_id int, " + _SEG_COLS
MERGED_SCHEMA = _SEG_COLS
DOCSTORE_SCHEMA = (
    "doc_id long, conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp_ntz, doc_len long, seg_id int"
)


@dataclass(frozen=True)
class IndexMeta:
    n_docs: int
    avgdl: float
    k1: float
    b: float
    block_size: int
    n_partitions: int
    offsets: list[int]
    total_tokens: int = 0  # exact Σ doc_len (for exact cross-generation avgdl)
    # smallest avgdl any surviving partial was ENCODED with: a resumed partial
    # rebuild can shift the corpus avgdl upward, and stored block maxes from
    # the earlier encode would then under-bound scores — readers widen bounds
    # by avgdl/encode_avgdl (tf-norm is monotone in avgdl, bounded by ratio)
    encode_avgdl: float = 0.0

    def to_json(self) -> str:
        return json.dumps(self.__dict__, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "IndexMeta":
        d = json.loads(s)
        if not d.get("total_tokens"):
            d["total_tokens"] = round(d["avgdl"] * d["n_docs"])
        if not d.get("encode_avgdl"):
            d["encode_avgdl"] = d["avgdl"]
        return IndexMeta(**d)


def _partitioned_base(transcripts: DataFrame, n_partitions: int) -> tuple[DataFrame, bool]:
    """Build partitions = deterministic scan splits when possible.

    The raw-text shuffle was the build's biggest I/O (the whole corpus
    written+read through shuffle files, plus a persist) and the disk is the
    one truly serial resource on a node — so when the source already has
    enough partitions (parquet/Iceberg splits: deterministic given files and
    split config), we index each split directly: ZERO wide ops before the
    blob merge. Only under-partitioned sources get a deterministic hash
    repartition by conv_id.

    NOT repartitionByRange: Spark's RangePartitioner samples with a seed
    derived from the RDD id, so boundaries differ on every invocation — a
    resumable build needs partition assignment that is a pure function of
    the DATA (fingerprints must match across runs). docIDs are therefore
    only key-ordered WITHIN a partition; the query layer breaks score ties
    by the real (conv_id, turn_idx) keys, never by docID.

    Returns (base, shuffled): callers persist the base only when a shuffle
    happened (re-scanning a page-cached parquet is cheaper than a persist).
    """
    in_parts = transcripts.rdd.getNumPartitions()
    if in_parts >= n_partitions:
        return transcripts.sortWithinPartitions("conv_id", "turn_idx"), False
    return (
        transcripts.repartition(n_partitions, "conv_id").sortWithinPartitions(
            "conv_id", "turn_idx"
        ),
        True,
    )


def _partition_stats(base_with_pid: DataFrame, cfg: EngineConfig):
    """ONE cheap pass over the base: per-partition fingerprint (count +
    order-independent hash). Deliberately NO tokenization here — token totals
    come for free from the docstore's doc_len column after the write, so the
    corpus text is regex-scanned exactly twice (docstore + partials), not
    three times."""
    rows = (
        base_with_pid.groupBy("pid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor: order-independent and overflow-free under ANSI mode
            F.expr("bit_xor(xxhash64(conv_id, turn_idx, text))").alias("h"),
        )
        .collect()
    )
    fps = {int(r["pid"]): f"{int(r['n'])}:{int(r['h'])}" for r in rows}
    n_docs = sum(int(r["n"]) for r in rows)
    return fps, n_docs


def _offsets_from_counts(fingerprints: dict[int, str], n_partitions: int) -> list[int]:
    counts = [0] * n_partitions
    for pid, fp in fingerprints.items():
        counts[pid] = int(fp.split(":", 1)[0])
    offsets = [0] * n_partitions
    run = 0
    for p in range(n_partitions):
        offsets[p] = run
        run += counts[p]
    return offsets


def _docstore_df(with_pid: DataFrame, offsets: list[int], keep: set[int], cfg: EngineConfig) -> DataFrame:
    """Dense docID assignment, pure JVM (no Python round-trip of the text):
    doc_id = offset[pid] + row-in-partition, where row-in-partition is the
    low 33 bits of monotonically_increasing_id() (its documented layout:
    partition_index << 33 | row_in_partition) over the sorted, persisted base.
    """
    from itertools import chain

    offset_map = F.create_map(
        *chain.from_iterable(
            (F.lit(p), F.lit(o)) for p, o in enumerate(offsets)
        )
    )
    keep_list = sorted(keep)
    return (
        with_pid.withColumn("doc_len", doc_len_col("text", cfg.analyzer).cast("long"))
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        .withColumn(
            "doc_id",
            offset_map[F.col("pid")]
            + F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1)),
        )
        .filter(F.col("pid").isin(keep_list))
        .select(
            "doc_id", "conv_id", "turn_idx", "role", "text", "tool", "ts",
            "doc_len", F.col("pid").alias("seg_id"),
        )
    )


def _make_segment_fn(offsets: list[int], keep: set[int], avgdl: float, cfg: EngineConfig):
    """Arrow-native segment kernel (mapInArrow).

    Everything stays in Arrow buffers / primitive NumPy: RE2 tokenization
    (utf8_lower + split_pattern_regex), dictionary-encode for term codes,
    and Binary/List output arrays built directly from (offsets, flat values).
    Zero Python string objects, zero per-term slicing — the earlier pandas
    kernel was memory-bandwidth-bound at 32-way parallelism (object arrays +
    factorize thrash the allocator; measured 2.7-5x degradation).
    """
    import pyarrow as pa

    k1, b = cfg.bm25.k1, cfg.bm25.b
    block_size = cfg.index.block_size
    split_pat = cfg.analyzer.split_pattern
    lowercase = cfg.analyzer.lowercase
    store_pos = cfg.index.store_positions

    out_schema = pa.schema(
        [
            ("seg_id", pa.int32()),
            ("term", pa.string()),
            ("df", pa.int64()),
            ("first_doc", pa.int64()),
            ("last_doc", pa.int64()),
            ("doc_blob", pa.binary()),
            ("tf_blob", pa.binary()),
            ("dl_blob", pa.binary()),
            ("pos_blob", pa.binary()),
            ("block_counts", pa.list_(pa.int32())),
            ("block_firsts", pa.list_(pa.int64())),
            ("block_maxes", pa.list_(pa.float64())),
            ("block_doc_bytes", pa.list_(pa.int32())),
            ("block_tf_bytes", pa.list_(pa.int32())),
            ("block_dl_bytes", pa.list_(pa.int32())),
            ("block_pos_bytes", pa.list_(pa.int32())),
            ("part_counts", pa.list_(pa.int64())),
        ]
    )

    def build_segments(batches):
        import pyarrow.compute as pc

        batch_list = list(batches)
        if not batch_list:
            return
        tbl = pa.Table.from_batches(batch_list)
        if tbl.num_rows == 0:
            return
        pid = int(tbl.column("pid")[0].as_py())
        if pid not in keep:
            return
        texts = tbl.column("text").combine_chunks()
        if lowercase:
            texts = pc.utf8_lower(texts)
        toks = pc.split_pattern_regex(texts, pattern=split_pat)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        mask = pc.not_equal(flat, "")
        flat = flat.filter(mask)
        if len(flat) == 0:
            return
        parent = parent.filter(mask).to_numpy().astype(np.int64)
        n_rows = tbl.num_rows
        doc_len = np.bincount(parent, minlength=n_rows).astype(np.int64)
        denc = flat.dictionary_encode()
        codes = denc.indices.to_numpy().astype(np.int64)
        dictionary = denc.dictionary

        # single combined-key sort (term-major, doc ascending within term).
        # Without positions: a VALUE sort — original token order never needed,
        # ~8x cheaper than a two-key lexsort (this was the kernel's dominant
        # cost). With positions: one STABLE argsort — tokens appear in
        # document order, so stability alone leaves each posting's positions
        # ascending with no extra sort key.
        combined = codes * n_rows + parent
        if store_pos:
            doc_first_tok = np.cumsum(doc_len) - doc_len
            pos_tok = np.arange(combined.size, dtype=np.int64) - doc_first_tok[parent]
            order = np.argsort(combined, kind="stable")
            combined = combined[order]
            pos_tok = pos_tok[order]
        else:
            combined.sort()
        change = np.empty(combined.size, dtype=bool)
        change[0] = True
        np.not_equal(combined[1:], combined[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        tf = np.diff(np.append(starts, combined.size)).astype(np.int64)
        u = combined[starts]
        u_codes = u // n_rows
        u_local = u - u_codes * n_rows
        term_bounds = np.flatnonzero(
            np.concatenate(([True], u_codes[1:] != u_codes[:-1]))
        )
        term_ends = np.append(term_bounds[1:], u_codes.size)

        u_docs = offsets[pid] + u_local
        enc = encode_segment_batch_flat(
            u_docs, tf, doc_len[u_local], term_bounds, avgdl, k1, b, block_size
        )
        n_terms = term_bounds.size
        counts_flat = enc["counts_flat"].astype(np.int64)
        posting_blk_starts = np.cumsum(counts_flat) - counts_flat
        if store_pos:
            pos_buf, pos_offs, pos_bytes_flat = encode_positions_flat(
                pos_tok, starts, starts[term_bounds], posting_blk_starts
            )
        else:
            pos_buf = b""
            pos_offs = np.zeros(n_terms + 1, dtype=np.int32)
            pos_bytes_flat = np.zeros(posting_blk_starts.size, dtype=np.int32)

        def bin_arr(buf: bytes, offs: np.ndarray) -> pa.Array:
            return pa.Array.from_buffers(
                pa.binary(), n_terms,
                [None, pa.py_buffer(np.ascontiguousarray(offs)), pa.py_buffer(buf)],
            )

        def list_arr(offs: np.ndarray, vals: np.ndarray, typ) -> pa.Array:
            return pa.ListArray.from_arrays(
                pa.array(offs, type=pa.int32()), pa.array(vals, type=typ)
            )

        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.full(n_terms, pid, dtype=np.int32), type=pa.int32()),
                pc.take(dictionary, pa.array(u_codes[term_bounds], type=pa.int64())),
                pa.array((term_ends - term_bounds).astype(np.int64), type=pa.int64()),
                pa.array(u_docs[term_bounds], type=pa.int64()),
                pa.array(u_docs[term_ends - 1], type=pa.int64()),
                bin_arr(enc["doc_buf"], enc["doc_offsets"]),
                bin_arr(enc["tf_buf"], enc["tf_offsets"]),
                bin_arr(enc["dl_buf"], enc["dl_offsets"]),
                bin_arr(pos_buf, pos_offs),
                list_arr(enc["block_offsets"], enc["counts_flat"], pa.int32()),
                list_arr(enc["block_offsets"], enc["firsts_flat"], pa.int64()),
                list_arr(enc["block_offsets"], enc["maxes_flat"], pa.float64()),
                list_arr(enc["block_offsets"], enc["doc_bytes_flat"], pa.int32()),
                list_arr(enc["block_offsets"], enc["tf_bytes_flat"], pa.int32()),
                list_arr(enc["block_offsets"], enc["dl_bytes_flat"], pa.int32()),
                list_arr(enc["block_offsets"], pos_bytes_flat, pa.int32()),
                # one partial per term at build time: part_counts = [df]
                list_arr(
                    np.arange(n_terms + 1, dtype=np.int32),
                    (term_ends - term_bounds).astype(np.int64),
                    pa.int64(),
                ),
            ],
            schema=out_schema,
        )

    return build_segments


MERGED_COLS = [
    "term", "df", "first_doc", "last_doc", "doc_blob", "tf_blob", "dl_blob",
    "pos_blob", "block_counts", "block_firsts", "block_maxes",
    "block_doc_bytes", "block_tf_bytes", "block_dl_bytes", "block_pos_bytes",
    "part_counts",
]


def _make_merge_stream(key_cols: list[str]):
    """Arrow merge kernel (mapInArrow): merging is pure OFFSET SUBSAMPLING.

    Partial blobs are self-contained (first gap absolute), so a merged
    posting list is simply the partials' bytes back-to-back with
    ``part_counts`` recording the reset boundaries (decoded by a vectorized
    segmented cumsum — functions/codec.delta_decode_segmented). The kernel
    therefore never touches blob bytes: sort rows by (key..., first_doc),
    find group boundaries, and emit Binary/List arrays that REUSE the input
    data buffers with group-boundary offsets. No per-group Python, no byte
    rewriting — this was the worst-scaling stage as a pandas kernel
    (objects + per-boundary rebase).
    """
    import pyarrow as pa

    out_schema = pa.schema(
        [
            ("term", pa.string()),
            ("df", pa.int64()),
            ("first_doc", pa.int64()),
            ("last_doc", pa.int64()),
            ("doc_blob", pa.binary()),
            ("tf_blob", pa.binary()),
            ("dl_blob", pa.binary()),
            ("pos_blob", pa.binary()),
            ("block_counts", pa.list_(pa.int32())),
            ("block_firsts", pa.list_(pa.int64())),
            ("block_maxes", pa.list_(pa.float64())),
            ("block_doc_bytes", pa.list_(pa.int32())),
            ("block_tf_bytes", pa.list_(pa.int32())),
            ("block_dl_bytes", pa.list_(pa.int32())),
            ("block_pos_bytes", pa.list_(pa.int32())),
            ("part_counts", pa.list_(pa.int64())),
        ]
    )

    def merge_stream(batches):
        import pyarrow.compute as pc

        batch_list = list(batches)
        if not batch_list:
            return
        tbl = pa.Table.from_batches(batch_list)
        if tbl.num_rows == 0:
            return
        sort_keys = [(c, "ascending") for c in [*key_cols, "first_doc"]]
        tbl = tbl.take(pc.sort_indices(tbl, sort_keys=sort_keys)).combine_chunks()
        n = tbl.num_rows

        term_arr = tbl.column("term").combine_chunks()
        codes = term_arr.dictionary_encode().indices.to_numpy().astype(np.int64)
        change = np.ones(n, dtype=bool)
        if n > 1:
            diff = codes[1:] != codes[:-1]
            if "salt" in key_cols:
                salt = tbl.column("salt").combine_chunks().to_numpy()
                diff = diff | (salt[1:] != salt[:-1])
            change[1:] = diff
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        n_out = starts.size

        df_a = tbl.column("df").combine_chunks().to_numpy()
        fd = tbl.column("first_doc").combine_chunks().to_numpy()
        ld = tbl.column("last_doc").combine_chunks().to_numpy()

        def merged_binary(col: str) -> pa.Array:
            arr = tbl.column(col).combine_chunks()
            off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
                arr.offset : arr.offset + n + 1
            ]
            new_off = np.empty(n_out + 1, dtype=np.int32)
            new_off[:-1] = off[starts]
            new_off[-1] = off[n]
            return pa.Array.from_buffers(
                pa.binary(), n_out,
                [None, pa.py_buffer(np.ascontiguousarray(new_off)), arr.buffers()[2]],
            )

        def merged_list(col: str) -> pa.Array:
            arr = tbl.column(col).combine_chunks()
            off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
                arr.offset : arr.offset + n + 1
            ]
            new_off = np.empty(n_out + 1, dtype=np.int32)
            new_off[:-1] = off[starts]
            new_off[-1] = off[n]
            return pa.ListArray.from_arrays(
                pa.array(new_off, type=pa.int32()), arr.values
            )

        yield pa.RecordBatch.from_arrays(
            [
                pc.take(term_arr, pa.array(starts, type=pa.int64())),
                pa.array(np.add.reduceat(df_a, starts), type=pa.int64()),
                pa.array(fd[starts], type=pa.int64()),
                pa.array(ld[ends - 1], type=pa.int64()),
                merged_binary("doc_blob"),
                merged_binary("tf_blob"),
                merged_binary("dl_blob"),
                merged_binary("pos_blob"),
                merged_list("block_counts"),
                merged_list("block_firsts"),
                merged_list("block_maxes"),
                merged_list("block_doc_bytes"),
                merged_list("block_tf_bytes"),
                merged_list("block_dl_bytes"),
                merged_list("block_pos_bytes"),
                merged_list("part_counts"),
            ],
            schema=out_schema,
        )

    return merge_stream


def _phase_timer():
    """AFSPARK_BUILD_PROFILE=1 → stage wall times on stderr (scaling triage)."""
    import sys
    import time

    if os.environ.get("AFSPARK_BUILD_PROFILE", "") != "1":
        return lambda name: None
    state = {"t": time.perf_counter()}

    def mark(name: str) -> None:
        now = time.perf_counter()
        sys.stderr.write(f"BUILD_PHASE {name} {now - state['t']:.2f}s\n")
        sys.stderr.flush()
        state["t"] = now

    return mark


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    cfg: EngineConfig = DEFAULT,
    resume: bool = True,
) -> IndexMeta:
    """Build (or resume) the inverted index at index_dir.

    Layout: meta.json, manifest.json, docstore/ (parquet, partitioned by
    seg_id), segments_partial/ (parquet, partitioned by seg_id),
    segments/ (merged, range-partitioned + sorted by term).
    """
    os.makedirs(index_dir, exist_ok=True)
    mark = _phase_timer()

    base, shuffled = _partitioned_base(transcripts, cfg.index.build_partitions)
    if shuffled:
        base = base.persist()
    P = base.rdd.getNumPartitions()
    with_pid = base.withColumn("pid", F.spark_partition_id())
    # one combined pass: fingerprints + corpus stats (no separate scan)
    fps, n_docs = _partition_stats(with_pid, cfg)
    mark("stats")
    offsets = _offsets_from_counts(fps, P)

    manifest = load_manifest(index_dir) if resume else Manifest()
    done = manifest.completed_for(fps)
    # offset-shift invalidation: a fingerprint match proves THIS partition's
    # bytes are unchanged, but its docID base is a prefix-sum of EARLIER
    # partitions' counts — if any of those changed, this partition's stored
    # docIDs (docstore + partial blobs) encode the OLD base and would collide
    # with the new layout. Rebuild any done partition whose recorded offset
    # moved (or is unrecorded: legacy manifest).
    done = {pid for pid in done if manifest.entries[pid].doc_offset == offsets[pid]}
    missing = sorted(set(fps) - done)

    partial_dir = os.path.join(index_dir, "segments_partial")
    docstore_dir = os.path.join(index_dir, "docstore")

    # ghost cleanup: a resumed index_dir may carry seg_id dirs from a PREVIOUS
    # partition layout (different split config or smaller input → fewer pids).
    # Stale dirs would be swept into the merge with docIDs that collide with
    # the new offsets — delete any seg_id not in the current fingerprint set,
    # drop its manifest entry, and force a re-merge.
    ghosts = False
    for d in (partial_dir, docstore_dir):
        if os.path.isdir(d):
            for name in os.listdir(d):
                if name.startswith("seg_id="):
                    pid = int(name.split("=", 1)[1])
                    if pid not in fps:
                        shutil.rmtree(os.path.join(d, name))
                        ghosts = True
    for pid in sorted(set(manifest.entries) - set(fps)):
        del manifest.entries[pid]
        ghosts = True
    if ghosts:
        save_manifest(index_dir, manifest)

    if missing:
        keep = set(missing)
        # clean any half-written output for missing pids (idempotent re-run)
        for d in (partial_dir, docstore_dir):
            for pid in missing:
                sub = os.path.join(d, f"seg_id={pid}")
                if os.path.exists(sub):
                    shutil.rmtree(sub)

        # snappy for the build-side writes: the session default is zstd
        # (right for long-lived text tables), but the docstore write is on
        # the build's critical path and snappy encodes text ~2-3x faster at
        # a size cost the scratch layout absorbs; the posting blobs below
        # are varint streams (high-entropy bytes) where zstd is nearly pure
        # CPU overhead (guide §2.3/§6: measure compression per payload)
        _docstore_df(with_pid, offsets, keep, cfg).write.partitionBy(
            "seg_id"
        ).mode("append").option("compression", "snappy").parquet(docstore_dir)
        mark("docstore")

    # corpus token totals from the docstore's doc_len column (columnar scan
    # of one int column — the text itself is never re-tokenized for stats)
    if os.path.isdir(docstore_dir):
        total_tokens = int(
            spark.read.parquet(docstore_dir).agg(F.sum("doc_len")).first()[0] or 0
        )
    else:
        total_tokens = 0
    avgdl = (total_tokens / n_docs) if n_docs else 0.0
    mark("token_stats")

    if missing:
        with_pid.select("pid", "text").mapInArrow(
            _make_segment_fn(offsets, keep, avgdl, cfg), schema=PARTIAL_SCHEMA
        ).write.partitionBy("seg_id").mode("append").option(
            "compression", "snappy"
        ).parquet(partial_dir)
        mark("partials")

        # lineage metrics per freshly-built partition
        stats = (
            spark.read.parquet(partial_dir)
            .filter(F.col("seg_id").isin(missing))
            .groupBy("seg_id")
            .agg(
                F.count(F.lit(1)).alias("terms"),
                F.sum("df").alias("postings"),
                # blob sizes from the per-block byte-length arrays (their sum
                # IS each blob's length) — octet_length on the blobs forced
                # this stats pass to read every blob column from parquet
                F.sum(
                    F.aggregate("block_doc_bytes", F.lit(0).cast("long"),
                                lambda a, x: a + x)
                    + F.aggregate("block_tf_bytes", F.lit(0).cast("long"),
                                  lambda a, x: a + x)
                    + F.aggregate("block_dl_bytes", F.lit(0).cast("long"),
                                  lambda a, x: a + x)
                ).alias("bytes"),
            )
            .collect()
        )
        stat_by_pid = {int(r["seg_id"]): r for r in stats}
        for pid in missing:
            r = stat_by_pid.get(pid)
            manifest.entries[pid] = PartitionEntry(
                partition_id=pid,
                input_fingerprint=fps[pid],
                status="done",
                doc_offset=offsets[pid],
                terms=int(r["terms"]) if r else 0,
                postings=int(r["postings"]) if r else 0,
                bytes=int(r["bytes"]) if r else 0,
                output_path=f"segments_partial/seg_id={pid}",
            )
        mean_postings = (
            sum(e.postings for e in manifest.entries.values()) / max(len(manifest.entries), 1)
        )
        for e in manifest.entries.values():
            e.skew_ratio = (e.postings / mean_postings) if mean_postings else 0.0
        save_manifest(index_dir, manifest)
        mark("lineage")

    if shuffled:
        base.unpersist()

    # ---- merge phase: two-phase salted repartition-by-term ----
    # skip when resuming an untouched, fully-merged index
    if missing or ghosts or not os.path.exists(os.path.join(index_dir, "segments")):
        merge_segments(spark, index_dir, cfg, n_partials=(max(fps) + 1 if fps else 0))
    mark("merge")

    # partial rebuilds keep blocks encoded under an earlier (possibly smaller)
    # avgdl — track the smallest so readers can widen bounds safely
    encode_avgdl = avgdl
    meta_path = os.path.join(index_dir, "meta.json")
    if resume and done and os.path.exists(meta_path):
        with open(meta_path) as f:
            old = IndexMeta.from_json(f.read())
        if old.encode_avgdl:
            encode_avgdl = min(encode_avgdl, old.encode_avgdl)

    meta = IndexMeta(
        n_docs=n_docs,
        avgdl=avgdl,
        k1=cfg.bm25.k1,
        b=cfg.bm25.b,
        block_size=cfg.index.block_size,
        n_partitions=P,
        offsets=offsets,
        total_tokens=total_tokens,
        encode_avgdl=encode_avgdl,
    )
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        f.write(meta.to_json())
    return meta


def merge_segments(
    spark: SparkSession,
    index_dir: str,
    cfg: EngineConfig = DEFAULT,
    n_partials: int | None = None,
) -> None:
    partial_dir = os.path.join(index_dir, "segments_partial")
    out_dir = os.path.join(index_dir, "segments")
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)

    partials = spark.read.parquet(partial_dir)
    S = cfg.index.salt_buckets
    # actual partition count (scan-split partitioning may exceed the config);
    # callers that know it pass it and save a scan job
    P = (
        n_partials
        if n_partials is not None
        else int(partials.agg(F.max("seg_id")).first()[0] or 0) + 1
    )
    # final output partitions: fine enough that a Zipf-hot term range doesn't
    # become a straggler task (range partition sizes are skewed; small quanta
    # pack into waves), coarse enough to keep file counts sane. One range per
    # build partition: the r6 profile showed the merge running on half the
    # cores (Qf = P/2 left 16 tasks on 32 cores).
    Qf = max(cfg.index.build_partitions, 2)

    if P <= cfg.index.hot_term_partials * S:
        # SINGLE-PHASE: even the hottest term has ≤ hot_term_partials*S
        # partials, which one merge task absorbs comfortably — the salted
        # pre-merge would only add a full extra shuffle of the index.
        # repartitionByRange(term) puts each term's partials in one
        # partition AND makes every output file a term range (the kernel
        # emits term-sorted rows), so `term IN (...)` prunes files/row
        # groups at query time.
        # persisted: repartitionByRange executes its child TWICE (range-
        # boundary sampling pass + the real exchange), and the child here
        # is a full scan of every blob column — without the persist the
        # whole partial index is read and decoded from parquet twice
        # (measured: merge was the largest warm build phase, 3.2 s of 8.7)
        partials = partials.persist()
        merged = partials.repartitionByRange(Qf, "term").mapInArrow(
            _make_merge_stream(["term"]), schema=MERGED_SCHEMA
        )
        merged.write.mode("overwrite").option("compression", "snappy").parquet(out_dir)
        partials.unpersist()
        return

    # TWO-PHASE (cluster scale: 10^3+ build partitions → Zipf-hot terms have
    # one partial per partition and would straggle a single merge task).
    # Phase 1 pre-merges within contiguous salt chunks, bounding any task's
    # rows per term to P/S; phase 2 merges the ≤S pre-merged rows per term.
    hot = (
        partials.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_partials"))
        .filter(F.col("n_partials") > cfg.index.hot_term_partials)
        .select("term", F.lit(True).alias("is_hot"))
    )
    salted = (
        partials.join(F.broadcast(hot), on="term", how="left")
        .withColumn(
            "salt",
            F.when(
                F.col("is_hot"),
                F.floor(F.col("seg_id").cast("long") * S / P).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("is_hot")
    )
    Q = max(cfg.index.build_partitions // 2, 1)
    # persisted so the range sampler below doesn't recompute the shuffle
    p1 = (
        salted.repartition(Q, "term", "salt")
        .mapInArrow(_make_merge_stream(["term", "salt"]), schema=MERGED_SCHEMA)
        .persist()
    )
    merged = p1.repartitionByRange(Qf, "term").mapInArrow(
        _make_merge_stream(["term"]), schema=MERGED_SCHEMA
    )
    merged.write.mode("overwrite").option("compression", "snappy").parquet(out_dir)
    p1.unpersist()
