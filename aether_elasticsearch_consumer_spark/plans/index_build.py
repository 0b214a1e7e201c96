"""Inverted-index build (X3-X6) as a staged, checkpoint-resumable Spark plan.

Replaces the reference's per-doc ``es.create`` hot loop
(/root/reference/consumer/app/artifacts.py:513-550, num_messages=1) with a
batch dataflow:

  docs:      webtext → extract_text (Arrow UDF) → tokenize → doc_len
             → deterministic dense doc_id → parquet
  doclens:   per-segment varbyte array of doc lengths (scorer sidecar)
  stats:     N, avgdl folded out of the doclens sidecar (no extra scan)
  postings:  explode(tokens) → ONE shuffle to (segment_id, term_bucket)
             groups → applyInArrow assembly (dictionary-encoded terms,
             run-length tf counting, batch varbyte, flat one-row-per-block
             output with exact idf-free block-max metadata) → parquet
             partitioned by term_bucket, written straight from the group
             tasks (no re-shuffle)
  term_stats: per-term global df → parquet partitioned by term_bucket

Scale design (10^12 docs):
- **No build-time join on term.** Blocks carry ``max_impact`` =
  max(tf/(tf+k1·(1−b+b·dl/avgdl))); idf multiplies in at query time from
  the tiny per-query df lookup. This removes the one skew-prone shuffle a
  naive design needs (postings ⋈ df on Zipf-head terms).
- **Head-term lists are structurally bounded**: the shuffle key is
  (segment_id, term_bucket); a term's postings within one group never
  exceed ``docs_per_segment`` rows, so "the" is split across segments by
  construction — long-posting-list splitting without a special case.
- **Zero per-row Python**: assembly is Arrow C++ dictionary encode +
  numpy; the only Python loop slices pre-encoded byte buffers per block.
- Incremental ingest: a delta index built at a ``doc_id_offset`` merges
  with the base by pure union (plans/segments.py) — no decode, no rewrite.
- postings partitioned by ``term_bucket`` (pmod(xxhash64(term), B)) and
  sorted by (term, segment_id) within files → a term query prunes to 1/B
  of files by directory and to few row-groups by min/max.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import B as BM25_B
from .. import BLOCK_SIZE, K1
from ..functions.codec import varbyte_encode, varbyte_encode_with_lengths
from ..functions.html import extract_text
from ..functions.tokenizer import tokenize_col
from .checkpoint import content_hash, run_stage
from .doc_ids import assign_doc_ids

DEFAULT_DOCS_PER_SEGMENT = 8192
DEFAULT_TERM_BUCKETS = 16

# bench-only toggle: re-adds the round-3 docs-sidecar range exchange so
# the saved shuffle can be A/B-measured in one session; never set in code
_FORCE_RANGE_EXCHANGE = False

# A/B toggle for the round-6 map-side tf pre-aggregation (see
# postings_stage): True forces the old token-instance shuffle so the
# byte-identity of both paths can be asserted in one session
# (tests/test_assembly_edges.py); never set in production code
_FORCE_TOKEN_LEVEL = False

# A/B toggle for the round-6 blob-group shuffle: True forces the
# (doc, term, tf) row pre-aggregation shape so all three postings
# pipelines can be byte-compared in one session; never set in production
_FORCE_ROW_PREAGG = False

# one row per 128-posting block, fully flat — rows build from numpy arrays
# with zero per-row Python objects, and the query side reads plain columns
POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("segment_id", T.LongType(), False),
        T.StructField("term_bucket", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("df_seg", T.LongType(), False),
        T.StructField("block_no", T.IntegerType(), False),
        T.StructField("first_doc_id", T.LongType(), False),
        T.StructField("last_doc_id", T.LongType(), False),
        T.StructField("count", T.IntegerType(), False),
        T.StructField("max_impact", T.DoubleType(), False),
        T.StructField("doc_deltas", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        # per-block positions stream (phrase queries): for each posting in
        # order, its tf within-doc token offsets, first absolute then gap-1
        # deltas, varbyte — empty bytes when the index was built without
        # positions
        T.StructField("positions", T.BinaryType(), False),
    ]
)

DOCLENS_SCHEMA = T.StructType(
    [
        T.StructField("segment_id", T.LongType(), False),
        T.StructField("start_doc_id", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("sum_len", T.LongType(), False),
        T.StructField("lens", T.BinaryType(), False),
    ]
)


def build_docs_df(source: DataFrame, profile: str = "ascii",
                  n_buckets: int = 64, doc_id_offset: int = 0,
                  id_col: str | None = None) -> DataFrame:
    """webtext → docs with text, tokens-derived doc_len, dense doc_id.

    ``id_col``: use an existing unique int64 column as doc_id instead of
    assigning one (sparse ids are fine — the doclens sidecar densifies per
    segment); default assigns deterministic dense ids from url rank."""
    cols = set(source.columns)
    df = source
    if "text" not in cols:
        df = df.withColumn("text", extract_text("html"))
    df = df.withColumn("doc_len", F.size(tokenize_col("text", profile)))
    keep = [c for c in ("url", "warc_ts", "lang", "text", "doc_len") if c in cols or c in ("text", "doc_len")]
    if id_col:
        return df.select(F.col(id_col).cast("long").alias("doc_id"), *keep)
    df = df.select(*keep)
    return assign_doc_ids(df, "url", n_buckets=n_buckets, offset=doc_id_offset).drop("_bucket")


DL_BITS = 20  # doc_len < 2^20 packs into the low bits of one int64;
# doc_id then spans 2^43 — comfortably past the 10^12-doc target
DL_MASK = (1 << DL_BITS) - 1


TOKEN_PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("packed", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("tf", T.IntegerType(), False),
    ]
)


def make_token_pairs_arrow(profile: str = "ascii"):
    """``(packed, text)`` batches → ``(packed, term, tf)`` rows: the SPEC
    tokenizer (``tokenize_py`` — bit-identical to the Column tokenizer,
    pinned by the oracle-parity suite) plus a per-batch
    factorize/lexsort/run-length, all numpy.

    Round-6 shuffle win (guide §2.3 "aggregate before you shuffle", §4.2
    native code inside the UDF): the postings exchange used to carry one
    row per TOKEN INSTANCE (103M rows on the 400k-doc bench corpus) and
    count tf reduce-side; distinct (doc, term) pairs are 0.58× of that,
    so tf-counting map-side drops ~42% of the rows and string bytes from
    the build's one wide shuffle and from the reduce-side lexsort/Arrow
    feed. A pure-Column rewrite (array_sort + HOF run-length) was tried
    first and measured 2.25× SLOWER end-to-end — interpreted per-element
    lambda evaluation over 10^8 tokens dwarfs the shuffle savings — so
    this is the Arrow path; per-doc regex is the tokenizer spec itself,
    everything after it is batch-vectorized."""
    from ..functions.tokenizer import tokenize_py

    def gen(batches):
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            packed = batch.column("packed").to_numpy(zero_copy_only=False)
            toks = [tokenize_py(t, profile) for t in batch.column("text").to_pylist()]
            lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=n)
            total = int(lens.sum())
            if not total:
                continue
            flat = np.empty(total, dtype=object)
            off = 0
            for t in toks:
                flat[off : off + len(t)] = t
                off += len(t)
            codes, uniq = pd.factorize(flat, sort=False)
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            order = np.lexsort((codes, doc_idx))
            c, d = codes[order], doc_idx[order]
            starts = np.empty(len(c), dtype=bool)
            starts[0] = True
            np.not_equal(c[1:], c[:-1], out=starts[1:])
            starts[1:] |= d[1:] != d[:-1]
            s_idx = np.flatnonzero(starts)
            tf = np.diff(np.append(s_idx, len(c))).astype(np.int32)
            yield pa.record_batch(
                {
                    "packed": pa.array(packed[d[s_idx]], pa.int64()),
                    "term": pa.array(uniq[c[s_idx]], pa.string()),
                    "tf": pa.array(tf, pa.int32()),
                }
            )

    return gen


POSTING_GROUPS_SCHEMA = T.StructType(
    [
        T.StructField("segment_id", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("packeds", T.BinaryType(), False),
        T.StructField("tfs_blob", T.BinaryType(), False),
    ]
)


def make_posting_group_blobs_arrow(profile: str = "ascii", dps: int = 8192):
    """``(packed, text)`` batches → ONE row per (segment, term) per batch:
    ``(segment_id, term, packeds, tfs_blob)`` where the blobs are the
    group's per-posting packed int64s / tf int32s as raw little-endian
    bytes.

    Round-6 shuffle-row collapse (guide §2.3, §4.2): the postings
    exchange carried one row per (doc, term) posting — 60M rows on the
    400k-doc bench corpus — and the reduce stage's dominant cost was the
    JVM row↔Arrow conversion of those rows (~390 of 422 core-s), not the
    numpy assembly. Grouping map-side by (segment, term) cuts the row
    count ~25× (bounded by vocab × segments per batch) and turns the
    payload into opaque byte blobs the JVM moves with bulk copies; the
    assembler explodes them with ``np.frombuffer`` + ``np.repeat``.
    Output blocks are byte-identical (pinned in
    tests/test_assembly_edges.py): the assembler's lexsort is a total
    order over unique (term, doc) pairs, so arrival granularity cannot
    change any output row, and the writer's partition sort fixes file
    order. Same-machine bytes → ``np.frombuffer`` round-trips exactly;
    both ends of a shuffle share endianness by construction."""
    from ..functions.tokenizer import tokenize_py

    def gen(batches):
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            packed = batch.column("packed").to_numpy(zero_copy_only=False)
            toks = [
                tokenize_py(t, profile)
                for t in batch.column("text").to_pylist()
            ]
            lens = np.fromiter(
                (len(t) for t in toks), dtype=np.int64, count=n
            )
            total = int(lens.sum())
            if not total:
                continue
            flat = np.empty(total, dtype=object)
            off = 0
            for t in toks:
                flat[off : off + len(t)] = t
                off += len(t)
            codes, uniq = pd.factorize(flat, sort=False)
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            order = np.lexsort((codes, doc_idx))
            c, d = codes[order], doc_idx[order]
            starts = np.empty(len(c), dtype=bool)
            starts[0] = True
            np.not_equal(c[1:], c[:-1], out=starts[1:])
            starts[1:] |= d[1:] != d[:-1]
            s_idx = np.flatnonzero(starts)
            tf = np.diff(np.append(s_idx, len(c))).astype(np.int32)
            # posting-level arrays → group by (segment, term)
            p_packed = packed[d[s_idx]].astype(np.int64)
            p_code = c[s_idx]
            p_seg = (p_packed >> DL_BITS) // dps
            g_order = np.lexsort((p_code, p_seg))
            gp = p_packed[g_order]
            gc = p_code[g_order]
            gt = tf[g_order]
            gs = p_seg[g_order]
            gstart = np.empty(len(gc), dtype=bool)
            gstart[0] = True
            np.not_equal(gc[1:], gc[:-1], out=gstart[1:])
            gstart[1:] |= gs[1:] != gs[:-1]
            gidx = np.flatnonzero(gstart)
            counts = np.diff(np.append(gidx, len(gc)))
            off8 = np.zeros(len(gidx) + 1, dtype=np.int64)
            np.cumsum(counts * 8, out=off8[1:])
            off4 = np.zeros(len(gidx) + 1, dtype=np.int64)
            np.cumsum(counts * 4, out=off4[1:])
            yield pa.record_batch(
                {
                    "segment_id": pa.array(gs[gidx], pa.int64()),
                    "term": pa.array(uniq[gc[gidx]], pa.string()),
                    "packeds": _contiguous_binary(gp.tobytes(), off8),
                    "tfs_blob": _contiguous_binary(gt.tobytes(), off4),
                }
            )

    return gen


def _blob_concat(arr: "pa.Array", dtype) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate a single-chunk pa binary column's values into one numpy
    array of ``dtype`` plus per-row element counts — buffer math, no
    per-row python objects."""
    nbytes = np.dtype(dtype).itemsize
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    vals = np.ascontiguousarray(data[off[0] : off[-1]]).view(dtype)
    counts = (np.diff(off) // nbytes).astype(np.int64)
    return vals, counts


def _explode_blob_table(
    tbl: "pa.Table",
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Blob-group shuffle rows → posting-level numpy arrays
    (codes, dict_strs, term_buckets, packed, tfs) for the assembler."""
    enc = pc.dictionary_encode(tbl["term"].combine_chunks())
    codes_row = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dict_strs = enc.dictionary.to_numpy(zero_copy_only=False)
    tbs_row = (
        tbl["term_bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    packed_all, counts = _blob_concat(
        tbl["packeds"].combine_chunks(), np.int64
    )
    tf_all, _ = _blob_concat(tbl["tfs_blob"].combine_chunks(), np.int32)
    return (
        np.repeat(codes_row, counts),
        dict_strs,
        np.repeat(tbs_row, counts),
        packed_all.astype(np.int64),
        tf_all.astype(np.int64),
    )


def _contiguous_binary(buf, off: np.ndarray) -> "pa.Array":
    """Binary array whose values are contiguous slices of ``buf`` at the
    int64 ``off`` byte boundaries (len n+1) — built zero-copy from an
    offsets buffer instead of a python loop of bytes slices. Falls back
    to the slice loop past the 2 GiB int32-offset envelope (partitions
    are sized ~2M tokens, far below it)."""
    if len(off) and int(off[-1]) > np.iinfo(np.int32).max:
        return pa.array(
            [bytes(buf[off[i] : off[i + 1]]) for i in range(len(off) - 1)],
            type=pa.binary(),
        )
    return pa.Array.from_buffers(
        pa.binary(),
        len(off) - 1,
        [None, pa.py_buffer(off.astype(np.int32)), pa.py_buffer(buf)],
    )


def _assemble_postings_arrow(
    tbl: "pa.Table", avgdl: float, dps: int,
    code_dict: tuple[np.ndarray, np.ndarray] | None = None,
    term_buckets: int | None = None,
    pre: tuple[np.ndarray, ...] | None = None,
) -> "pa.Table":
    """A shuffle partition of **token-level** rows → one output row per
    128-posting block. The partition may span MANY (segment, term_bucket)
    groups: a term run breaks at every segment boundary, so block-max
    metadata and delta encodings are always per-(segment, term) exactly as
    the reader expects.

    Everything is vectorized end-to-end: terms dictionary-encode in Arrow
    C++ (strings never become Python objects), the whole partition sorts
    with ONE numpy lexsort (this replaces Spark's per-row comparator sort
    that groupBy().applyInArrow would insert — the dominant reduce-side
    cost at width, see BENCH/BASELINE.md), tf counting is run-length over
    the (term, doc) order, per-block deltas build with a masked where, and
    the partition's doc/tf streams varbyte-encode in two batch calls whose
    per-value byte lengths slice the buffer into block payloads. The only
    per-block Python work is a bytes slice.

    ``code_dict=(codes_sorted, terms_sorted)``: dictionary-coded mode —
    rows carry an int64 ``code`` instead of the term string (the shuffle
    never moves strings; bucket = code mod term_buckets), and per-block
    term strings resolve at the end via one vectorized searchsorted
    against the broadcast dictionary."""
    if pre is not None:
        # blob-group mode (round 6): posting-level arrays already exploded
        # from the (segment, term, packeds, tfs_blob) shuffle rows — see
        # make_posting_group_blobs_arrow / _explode_blob_table
        codes, dict_strs, tbs, packed, tf_in = pre
        pos_all = None
    else:
        if code_dict is None:
            enc = pc.dictionary_encode(tbl["term"].combine_chunks())
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            dict_strs = enc.dictionary.to_numpy(zero_copy_only=False)
            tbs = tbl["term_bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            codes = tbl["code"].to_numpy(zero_copy_only=False).astype(np.int64)
            tbs = None
            dict_strs = None
        packed = tbl["packed"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos_all = (
            tbl["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
            if "pos" in tbl.schema.names
            else None
        )
        # tf-preagg mode (round 6): rows arrive as (doc, term, tf) POSTINGS
        # (map-side run-length, see doc_term_tf_pairs) — no reduce-side tf
        # counting, 0.58× the rows through the sort. Mutually exclusive with
        # positions (those need the token-level stream).
        tf_in = (
            tbl["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
            if "tf" in tbl.schema.names
            else None
        )
    doc_ids_all = packed >> DL_BITS
    dls_all = packed & DL_MASK

    if pos_all is None:
        order = np.lexsort((doc_ids_all, codes))
    else:
        # positions ascending within each (term, doc) run — required for
        # the gap encoding and the phrase verifier's sorted-key merge
        order = np.lexsort((pos_all, doc_ids_all, codes))
    c_sorted = codes[order]
    d_sorted = doc_ids_all[order]
    l_sorted = dls_all[order]
    pos_sorted = pos_all[order] if pos_all is not None else None
    tb_sorted = tbs[order] if tbs is not None else None

    n_tok = len(c_sorted)
    if tf_in is not None:
        # one row per posting already: boundaries are trivial
        p_start_tok = np.arange(n_tok, dtype=np.int64)
        tfs = tf_in[order]
        p_codes = c_sorted
        p_docs = d_sorted
        p_dls = l_sorted.astype(np.float64)
    else:
        # posting boundaries: first token of each (term, doc) run → tf
        is_start = np.empty(n_tok, dtype=bool)
        is_start[0] = True
        np.not_equal(c_sorted[1:], c_sorted[:-1], out=is_start[1:])
        is_start[1:] |= d_sorted[1:] != d_sorted[:-1]
        p_start_tok = np.flatnonzero(is_start)
        tfs = np.diff(np.append(p_start_tok, n_tok))
        p_codes = c_sorted[p_start_tok]
        p_docs = d_sorted[p_start_tok]
        p_dls = l_sorted[p_start_tok].astype(np.float64)
    p_segs = p_docs // dps
    P = len(p_codes)

    # per-(term, segment) posting runs — docs sort ascending within a term,
    # so each segment's slice of the term's postings is contiguous
    t_is_start = np.empty(P, dtype=bool)
    t_is_start[0] = True
    np.not_equal(p_codes[1:], p_codes[:-1], out=t_is_start[1:])
    t_is_start[1:] |= p_segs[1:] != p_segs[:-1]
    t_starts = np.flatnonzero(t_is_start)
    t_lens = np.diff(np.append(t_starts, P))

    # 128-aligned block starts within each (term, segment) run
    rel = np.arange(P, dtype=np.int64) - np.repeat(t_starts, t_lens)
    b_is_start = (rel % BLOCK_SIZE) == 0
    b_starts = np.flatnonzero(b_is_start)
    b_ends = np.append(b_starts[1:], P)
    b_lens = (b_ends - b_starts).astype(np.int32)

    # delta stream: absolute doc id at block starts, gap-1 elsewhere
    prev = np.empty(P, dtype=np.int64)
    prev[0] = 0
    prev[1:] = p_docs[:-1]
    doc_vals = np.where(b_is_start, p_docs, p_docs - prev - 1)

    # idf-free impact — exact per-posting, so block maxes are exact bounds
    impact = tfs / (tfs + K1 * (1.0 - BM25_B + BM25_B * p_dls / avgdl))
    b_max_impact = np.maximum.reduceat(impact, b_starts)

    # batch varbyte encode; per-block payloads are CONTIGUOUS slices of
    # the partition buffer, so the binary columns build zero-copy from an
    # offsets vector over the one buffer (guide §4.2 — replaces three
    # python slice loops of n_blocks iterations each)
    doc_buf, doc_lens = varbyte_encode_with_lengths(doc_vals)
    tf_buf, tf_lens = varbyte_encode_with_lengths(tfs - 1)
    doc_off = np.zeros(P + 1, dtype=np.int64)
    np.cumsum(doc_lens, out=doc_off[1:])
    tf_off = np.zeros(P + 1, dtype=np.int64)
    np.cumsum(tf_lens, out=tf_off[1:])
    b_bounds = np.append(b_starts, P)
    doc_blobs = _contiguous_binary(doc_buf, doc_off[b_bounds])
    tf_blobs = _contiguous_binary(tf_buf, tf_off[b_bounds])

    if pos_sorted is not None:
        # token-level position stream: absolute at each posting start,
        # gap-1 within a posting (positions strictly increase per posting)
        prev_pos = np.empty(n_tok, dtype=np.int64)
        prev_pos[0] = 0
        prev_pos[1:] = pos_sorted[:-1]
        pos_vals = np.where(is_start, pos_sorted, pos_sorted - prev_pos - 1)
        pos_buf, pos_lens = varbyte_encode_with_lengths(pos_vals)
        ptok_off = np.zeros(n_tok + 1, dtype=np.int64)
        np.cumsum(pos_lens, out=ptok_off[1:])
        pst_ext = np.append(p_start_tok, n_tok)
        pos_blobs = _contiguous_binary(pos_buf, ptok_off[pst_ext[b_bounds]])
    else:
        pos_blobs = _contiguous_binary(
            b"", np.zeros(len(b_starts) + 1, dtype=np.int64)
        )

    # per-block term linkage
    b_term_idx = np.searchsorted(t_starts, b_starts, side="right") - 1
    b_block_no = ((b_starts - t_starts[b_term_idx]) // BLOCK_SIZE).astype(np.int32)
    b_codes = p_codes[b_starts]
    if dict_strs is not None:
        b_terms = dict_strs[b_codes]
        b_tb = tb_sorted[p_start_tok[b_starts]].astype(np.int32)
    else:
        codes_sorted, terms_sorted = code_dict
        b_terms = terms_sorted[np.searchsorted(codes_sorted, b_codes)]
        b_tb = (b_codes % term_buckets).astype(np.int32)
    b_df_seg = t_lens[b_term_idx].astype(np.int64)

    return pa.table(
        {
            "segment_id": pa.array(p_segs[b_starts]),
            "term_bucket": pa.array(b_tb),
            "term": pa.array(b_terms, type=pa.string()),
            "df_seg": pa.array(b_df_seg),
            "block_no": pa.array(b_block_no),
            "first_doc_id": pa.array(p_docs[b_starts]),
            "last_doc_id": pa.array(p_docs[b_ends - 1]),
            "count": pa.array(b_lens),
            "max_impact": pa.array(b_max_impact),
            "doc_deltas": doc_blobs,
            "tfs": tf_blobs,
            "positions": pos_blobs,
        }
    )


def _assemble_doclens(pdf: pd.DataFrame) -> pd.DataFrame:
    seg = int(pdf["segment_id"].iloc[0])
    ids = pdf["doc_id"].to_numpy().astype(np.int64)
    lens = pdf["doc_len"].to_numpy().astype(np.int64)
    order = np.argsort(ids)
    ids, lens = ids[order], lens[order]
    start = int(ids[0])
    # doc_ids are dense → contiguous within a segment
    dense = np.zeros(int(ids[-1]) - start + 1, dtype=np.int64)
    dense[ids - start] = lens
    return pd.DataFrame(
        [(seg, start, len(ids), int(lens.sum()), varbyte_encode(dense))],
        columns=["segment_id", "start_doc_id", "n_docs", "sum_len", "lens"],
    )


class IndexBuilder:
    """Checkpoint-resumable index build rooted at ``index_dir``.

    Layout::

        index_dir/docs/        url, doc_id, doc_len, text, ...
        index_dir/stats/       single row: N, avgdl, docs_per_segment, ...
        index_dir/doclens/     per-segment varbyte doc lengths
        index_dir/postings/    term_bucket=*/ block-compressed posting lists
        index_dir/term_stats/  term_bucket=*/ per-term global df
    """

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        profile: str = "ascii",
        docs_per_segment: int = DEFAULT_DOCS_PER_SEGMENT,
        term_buckets: int = DEFAULT_TERM_BUCKETS,
        id_buckets: int = 64,
        doc_id_offset: int = 0,
        id_col: str | None = None,
        term_coding: str = "strings",
        max_vocab_broadcast: int = 4_000_000,
        postings_partitions: int | None = None,
        with_positions: bool = False,
    ):
        """``term_coding``:

        - ``"strings"`` (default): term strings ride the one wide shuffle.
        - ``"dict"``: the shuffle carries an int64 term CODE instead. A
          pre-pass computes the distinct vocabulary (map-side reduced via
          per-doc array_distinct), ranks it per bucket, and broadcast-joins
          codes onto the token stream map-side — the shuffle moves two
          int64s per token, no strings. Falls back to ``"strings"`` when
          the vocabulary exceeds ``max_vocab_broadcast``.

          Measured (BENCH/BASELINE.md round 2): dict coding cuts shuffled
          bytes 1.83× but leaves reduce-side core-seconds UNCHANGED — the
          reduce cost is the per-row sort + Arrow transfer + assembly, not
          byte volume — while paying an extra tokenize pass for the
          vocabulary. ``"strings"`` is therefore the default; the option
          stays for byte-constrained networks (a real cluster's shuffle
          crosses NICs, where 1.83× fewer bytes IS the win).

        ``postings_partitions``: shuffle partition count for the postings
        exchange; default max(48, 3 × defaultParallelism). Size it so a
        partition's token rows (~16 B/row in Arrow) fit executor memory —
        at 10^12 docs raise it with corpus size (tokens/partition ≈
        total_tokens / partitions).

        ``with_positions``: store within-doc token offsets per posting
        (gap-1 varbyte, per-block blobs) — enables exact index-backed
        phrase queries (``IndexReader.phrase_docs``). Costs one extra int
        per token in the shuffle and ~1 byte/token on disk; off by
        default (ES analogue: index_options=docs|freqs vs positions).
        """
        if term_coding not in ("dict", "strings"):
            raise ValueError(f"unknown term_coding {term_coding!r}")
        self.spark = spark
        self.dir = Path(index_dir)
        self.profile = profile
        self.dps = docs_per_segment
        self.term_buckets = term_buckets
        self.id_buckets = id_buckets
        self.term_coding = term_coding
        self.max_vocab_broadcast = max_vocab_broadcast
        self.postings_partitions = postings_partitions
        self.with_positions = with_positions
        # delta builds start past the base index; must be a multiple of
        # docs_per_segment so segment ids never collide across a merge
        if doc_id_offset % docs_per_segment:
            raise ValueError("doc_id_offset must be a multiple of docs_per_segment")
        self.doc_id_offset = doc_id_offset
        self.id_col = id_col

    def build(self, source: DataFrame, fingerprint_extra: object = None,
              force: bool = False) -> dict:
        fp = content_hash(
            {
                "profile": self.profile,
                "dps": self.dps,
                "term_buckets": self.term_buckets,
                "id_buckets": self.id_buckets,
                "doc_id_offset": self.doc_id_offset,
                "id_col": self.id_col,
                "positions": self.with_positions,
                "source": fingerprint_extra,
                # v4: docs sidecar doc_id-sorted straight off the
                # id-assignment exchange (v3 paid an extra range shuffle
                # for the same row-group-prunable property)
                "v": 4,
            }
        )
        manifests = {}

        def check_pause() -> None:
            # cooperative pause (reference REST pause/resume analogue):
            # stop at the next stage boundary; finished stages keep their
            # manifests, so resume_job + re-run continues losslessly
            from .resources import JobPausedError, is_paused

            if is_paused(self.dir):
                raise JobPausedError(
                    f"build paused at {self.dir} (resume_job to continue); "
                    f"completed stages: {sorted(manifests)}"
                )

        check_pause()

        def docs_stage(tmp: str) -> dict:
            docs = build_docs_df(
                source, self.profile, self.id_buckets, self.doc_id_offset,
                id_col=self.id_col,
            )
            # doc_id-sorted sidecar files: point lookups (highlight
            # fragments, more_like_this seed text, phrase doc lengths,
            # term_vectors) prune by parquet row-group min/max instead of
            # scanning the whole corpus — the Lucene stored-fields
            # analogue of docid-ordered segments.
            #
            # The url-rank path needs NO extra exchange for this: the
            # id-assignment window already hash-partitions by _bucket and
            # sorts (bucket, url) within tasks, and doc_id = cumulative
            # bucket offset + url rank is MONOTONE in that sort order, so
            # each task's output is already doc_id-ascending; the local
            # sortWithinPartitions just pins the guarantee in the plan
            # (Catalyst can't prove the equivalence) without shuffling the
            # full text payload again (round-3's repartitionByRange cost
            # ~9% of build wall for layout the window provides for free).
            # Files then cover disjoint-but-interleaved bucket ranges; a
            # point id matches at most one row group per file, almost
            # always zero.
            if self.id_col or _FORCE_RANGE_EXCHANGE:
                # caller-supplied ids (compact/reindex) carry no such
                # order — a range exchange is the only way to get a
                # prunable layout
                docs = docs.repartitionByRange(F.col("doc_id"))
            (
                docs.sortWithinPartitions("doc_id")
                .write.mode("overwrite")
                .parquet(tmp + "/data")
            )
            return {}

        manifests["docs"] = run_stage("docs", self.dir / "docs", fp, docs_stage, force)
        docs = self.spark.read.parquet(str(self.dir / "docs/data"))

        def doclens_stage(tmp: str) -> dict:
            (
                docs.select(
                    (F.col("doc_id") / self.dps).cast("long").alias("segment_id"),
                    "doc_id",
                    "doc_len",
                )
                .groupBy("segment_id")
                .applyInPandas(_assemble_doclens, DOCLENS_SCHEMA)
                .write.mode("overwrite")
                .parquet(tmp + "/data")
            )
            return {}

        check_pause()
        manifests["doclens"] = run_stage(
            "doclens", self.dir / "doclens", fp, doclens_stage, force
        )

        def stats_stage(tmp: str) -> dict:
            # N/avgdl fold out of the doclens sidecar (a few rows per
            # segment). Driver-local pyarrow on the already-committed
            # sidecar: two Spark jobs for a 5-row aggregate cost seconds
            # of scheduler overhead that this stage doesn't need.
            import pyarrow.dataset as ds

            tbl = ds.dataset(str(self.dir / "doclens/data"), format="parquet").to_table(
                columns=["n_docs", "sum_len"]
            )
            N = int(pc.sum(tbl["n_docs"]).as_py())
            avgdl = float(pc.sum(tbl["sum_len"]).as_py()) / N
            import pyarrow.parquet as pq

            out = pa.table(
                {
                    "N": pa.array([N], pa.int64()),
                    "avgdl": pa.array([avgdl], pa.float64()),
                    # the avgdl the block max_impacts were computed against;
                    # a merge keeps the MIN over its inputs so the reader can
                    # inflate stored bounds by avgdl/build_avgdl (worst-case
                    # impact ratio as dl→∞) and stay exact after merges
                    "build_avgdl": pa.array([avgdl], pa.float64()),
                    "docs_per_segment": pa.array([self.dps], pa.int64()),
                    "term_buckets": pa.array([self.term_buckets], pa.int32()),
                    "profile": pa.array([self.profile], pa.string()),
                    "positions": pa.array([self.with_positions], pa.bool_()),
                }
            )
            Path(tmp, "data").mkdir(parents=True)
            pq.write_table(out, str(Path(tmp, "data", "part-00000.parquet")))
            return {"N": N, "avgdl": avgdl}

        check_pause()
        manifests["stats"] = run_stage("stats", self.dir / "stats", fp, stats_stage, force)
        st = self.spark.read.parquet(str(self.dir / "stats/data")).collect()[0]
        avgdl = float(st["avgdl"])

        def postings_stage(tmp: str) -> dict:
            # ONE wide shuffle either way: token-level rows group straight
            # to their (segment, term_bucket) assembly task; tf counting
            # happens vectorized inside the assembly UDF. avgdl rides the
            # closure, never a per-row column. (doc_id, doc_len) pack into
            # one int64 and the segment derives in the grouping expression.
            dps = self.dps
            B = self.term_buckets
            packed_col = (
                F.shiftleft(F.col("doc_id"), DL_BITS)
                + F.least(F.col("doc_len"), F.lit(DL_MASK))
            ).alias("packed")
            seg_key = (
                F.shiftright(F.col("packed"), DL_BITS) / dps
            ).cast("long").alias("segment_id")

            # token stream: positions ride along as ONE extra int column
            # only when the index stores them
            blob_mode = False
            if self.with_positions:
                # phrase keys pack (doc_id << DL_BITS | pos): a position at
                # or past 2^DL_BITS would carry into the doc_id field and
                # silently corrupt phrase matches — fail loudly at build
                # instead (round-2 advisor finding). doc_len is CAPPED at
                # DL_MASK (stats only degrade), but positions must be exact.
                pe = F.posexplode(tokenize_col("text", self.profile))
                exploded = docs.select(packed_col, pe.alias("pos", "term"))
                exploded = exploded.withColumn(
                    "pos",
                    F.when(F.col("pos") < F.lit(1 << DL_BITS), F.col("pos"))
                    .otherwise(
                        F.raise_error(
                            F.lit(
                                "positional index cannot store a doc with "
                                f">= 2^{DL_BITS} tokens (phrase-key packing "
                                "envelope); split or truncate the document"
                            )
                        ).cast("int")
                    ),
                )
                pos_cols = ["pos"]
            elif _FORCE_TOKEN_LEVEL:
                exploded = docs.select(
                    packed_col,
                    F.explode(tokenize_col("text", self.profile)).alias("term"),
                )
                pos_cols = []
            elif self.term_coding == "dict" or _FORCE_ROW_PREAGG:
                # map-side tf run-length (make_token_pairs_arrow): the
                # wide shuffle carries one row per (doc, term) with its
                # tf — 0.58× the rows of the token-instance stream;
                # output blocks are byte-identical (pinned in
                # tests/test_assembly_edges.py). Explicit 2-column select
                # before the opaque Arrow stage keeps the scan pruned
                # (guide §4.1). Dict coding keeps this shape — its
                # broadcast code join needs per-posting term rows.
                exploded = docs.select(packed_col, "text").mapInArrow(
                    make_token_pairs_arrow(self.profile), TOKEN_PAIRS_SCHEMA
                )
                pos_cols = ["tf"]
            else:
                # default strings mode (round 6, second pass): one blob
                # row per (segment, term) per map batch — ~25× fewer
                # shuffle rows than (doc, term, tf) and the payload moves
                # as opaque bytes, so the reduce stage's JVM row↔Arrow
                # conversion (its dominant cost) collapses; see
                # make_posting_group_blobs_arrow. Byte-identical output
                # pinned in tests/test_assembly_edges.py.
                blob_mode = True
                exploded = docs.select(packed_col, "text").mapInArrow(
                    make_posting_group_blobs_arrow(self.profile, dps),
                    POSTING_GROUPS_SCHEMA,
                )
                pos_cols = []

            code_dict = None
            if self.term_coding == "dict":
                # vocabulary pre-pass: per-doc array_distinct collapses the
                # token stream map-side, so the distinct shuffle moves
                # ~sum(per-doc distinct terms) rows, a fraction of tokens
                vocab = (
                    docs.select(
                        F.explode(
                            F.array_distinct(tokenize_col("text", self.profile))
                        ).alias("term")
                    )
                    .distinct()
                    .withColumn(
                        "term_bucket",
                        F.pmod(F.xxhash64("term"), F.lit(B)).cast("int"),
                    )
                )
                from pyspark.sql import Window

                w = Window.partitionBy("term_bucket").orderBy("term")
                coded = vocab.withColumn(
                    "code",
                    ((F.row_number().over(w) - 1).cast("long") * B
                     + F.col("term_bucket")),
                )
                # guard BEFORE collecting (round-5 verdict): at web-corpus
                # vocabulary sizes the driver would OOM materializing the
                # vocab just to discover it is over the threshold — one
                # cheap distributed count decides first
                if coded.count() > self.max_vocab_broadcast:
                    code_dict = None  # too big to broadcast — string path
                else:
                    vocab_pdf = coded.select("term", "code").toPandas()
                    order = np.argsort(vocab_pdf["code"].to_numpy())
                    codes_sorted = vocab_pdf["code"].to_numpy()[order]
                    terms_sorted = vocab_pdf["term"].to_numpy()[order]
                    code_dict = (codes_sorted, terms_sorted)

            if code_dict is not None:
                bc = self.spark.sparkContext.broadcast(code_dict)
                # map-side code attach: broadcast hash join, no token
                # shuffle; the wide shuffle then carries (packed, code) —
                # two int64s, zero strings
                vocab_map = self.spark.createDataFrame(
                    pd.DataFrame(
                        {"term": code_dict[1], "code": code_dict[0]}
                    )
                )
                tokens = (
                    exploded
                    .join(F.broadcast(vocab_map), "term")
                    .select("packed", "code", *pos_cols)
                )
                bucket_expr = F.pmod(F.col("code"), F.lit(B)).cast("int")

                def assemble_tbl(tbl: pa.Table) -> pa.Table:
                    return _assemble_postings_arrow(
                        tbl, avgdl, dps, code_dict=bc.value, term_buckets=B
                    )
            else:
                # term_bucket stays a JVM codegen expression either way —
                # in blob mode it evaluates over the ~25×-smaller group
                # rows instead of per posting
                tokens = exploded.withColumn(
                    "term_bucket",
                    F.pmod(F.xxhash64("term"), F.lit(B)).cast("int"),
                )
                bucket_expr = F.col("term_bucket")

                if blob_mode:

                    def assemble_tbl(tbl: pa.Table) -> pa.Table:
                        return _assemble_postings_arrow(
                            None, avgdl, dps, pre=_explode_blob_table(tbl)
                        )

                else:

                    def assemble_tbl(tbl: pa.Table) -> pa.Table:
                        return _assemble_postings_arrow(tbl, avgdl, dps)

            def assemble_partition(batches):
                bl = list(batches)
                if not bl:
                    return
                for b in assemble_tbl(pa.Table.from_batches(bl)).to_batches():
                    yield b

            # plain hash exchange + whole-partition Arrow assembly: a
            # groupBy().applyInArrow here would add a per-row comparator
            # SORT of every token row in the JVM; instead the partition
            # sorts ONCE in numpy inside the assembler (the multi-group
            # form breaks term runs at segment boundaries, so output
            # blocks are identical). Measured: ~20% postings-stage wall
            # at 32 CPUs, better width-scaling (BENCH/BASELINE.md).
            # Partition count scales with DATA (total tokens are known
            # from the stats stage — N × avgdl), capped at ~2M tokens per
            # assembly task so the per-task Arrow buffer + lexsort stay
            # cache-friendly; a fixed count went 1.9× sublinear at 1M docs.
            total_tokens = int(st["N"] * avgdl)
            n_parts = self.postings_partitions or max(
                48,
                3 * self.spark.sparkContext.defaultParallelism,
                -(-total_tokens // 2_000_000),
            )
            # identical exchange either way: the hash keys are the same
            # (segment_id long, term_bucket int) VALUES whether computed
            # per posting row (seg_key over packed) or carried on the
            # blob-group rows, so (segment, bucket) → partition assignment
            # — and therefore the output file set — is unchanged
            part_seg = (
                F.col("segment_id").cast("long") if blob_mode else seg_key
            )
            (
                tokens.repartition(n_parts, part_seg, bucket_expr)
                .mapInArrow(assemble_partition, POSTINGS_SCHEMA)
                # leading term_bucket: output ordering starts with the
                # partition column, so FileFormatWriter reuses this sort
                # instead of inserting its own partition-column sort on
                # top (round 6); per-file (term, segment, block) order is
                # unchanged
                .sortWithinPartitions(
                    "term_bucket", "term", "segment_id", "block_no"
                )
                .write.mode("overwrite")
                .partitionBy("term_bucket")
                .parquet(tmp + "/data")
            )
            return {}

        check_pause()
        manifests["postings"] = run_stage(
            "postings", self.dir / "postings", fp, postings_stage, force
        )

        def term_stats_stage(tmp: str) -> dict:
            postings = self.spark.read.parquet(str(self.dir / "postings/data"))
            (
                # sum block counts (df_seg repeats per block row of a term)
                postings.groupBy("term_bucket", "term")
                .agg(F.sum("count").alias("df"))
                .repartition("term_bucket")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .partitionBy("term_bucket")
                .parquet(tmp + "/data")
            )
            return {}

        check_pause()
        manifests["term_stats"] = run_stage(
            "term_stats", self.dir / "term_stats", fp, term_stats_stage, force
        )
        return manifests
