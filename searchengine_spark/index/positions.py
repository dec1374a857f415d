"""Optional positional postings sidecar: the high-df phrase story.

r3 VERDICT item 2: the store-verify phrase path (index/phrase.py) is
candidate-bounded — exactly right for selective phrases, O(corpus) for a
phrase of two COMMON words (every candidate doc re-analyzed in Python).
This sidecar removes that regime entirely WITHOUT touching the default
index format (positions roughly double posting bytes for a feature most
queries never use, so they are opt-in — ``build_positions`` after / beside
``build_index``):

    index_dir/positions/segment=K/bucket=B/*.parquet
        (segment, lemma, bucket, df, pdocs, pcounts, pstream)

Per (segment, lemma): ``pdocs`` is the varbyte doc-gap stream (first doc
absolute, rest delta-1 — the codec's convention), ``pcounts`` the varbyte
per-doc occurrence count (== tf), and ``pstream`` the varbyte per-doc
position deltas (first position absolute per doc, rest delta-1),
concatenated in doc order.  A POSITION is the index of a surviving source
token in the pinned analyzer's positional stream (analyzer.analyze_positions
— multi-lemma tokens occupy ONE position with several forms), so matching
is symmetric with the store-verify path by construction and the two
implementations are row-identical (tests/test_phrase_positions.py).

Query time (:func:`phrase_topk_positions`): a bucket-pruned read of the
query forms' rows, then per segment (one ``applyInPandas`` group, all
numpy) each pattern slot j becomes a sorted key set
``local_doc * K + (pos - j)`` — the union over the slot's forms — and the
phrase's start positions are the INTERSECTION of the slots' key sets.
``phrase_tf`` is the per-doc count of surviving starts.  Cost is
O(postings of the query terms) — the same class as conjunctive search —
regardless of how common the words are; no store scan, no per-row Python
re-analysis.

Lifecycle: ``build_index`` rewrites ``meta.json`` WITHOUT the
``has_positions`` flag, so any data rebuild atomically disables the
positional path (stale positions are never served); ``build_positions``
(over the rebuilt segments, or all) re-enables it, and
``streaming.incremental.rebuild_segments`` refreshes the sidecar
automatically when it exists.  Reference analog: none — the reference's
index stores no positions (`lemma`/`index` tables, SearchEngine schema);
its proximity rule is a post-AND substring heuristic
(SearchServiceImpl.java:231-264).
"""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil
from typing import TYPE_CHECKING

import numpy as np

from ..analyzer import analyze_positions
from .codec import varbyte_decode, varbyte_encode

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

POS_SCHEMA_DDL = ("segment int, lemma string, df long, pdocs binary, "
                  "pcounts binary, pstream binary, nbytes long, bucket int")
# nbytes = len(pdocs)+len(pcounts)+len(pstream), persisted so the build's
# per-segment stats aggregation is a column-pruned scan of two int columns
# (never re-reading the binary streams); sidecars written before the column
# existed read it as null and simply don't contribute stats.


def has_positions(index_dir: str) -> bool:
    """Positional serving is enabled iff meta carries the flag AND the
    sidecar has data — build_index's meta rewrite clears the flag, so a
    rebuilt index never serves stale positions."""
    try:
        with open(f"{index_dir}/meta.json") as fh:
            if not json.load(fh).get("has_positions"):
                return False
    except FileNotFoundError:
        return False
    return bool(_glob.glob(f"{index_dir}/positions/segment=*"))


def _delta_encode(vals: np.ndarray, firsts: np.ndarray) -> np.ndarray:
    """Concatenated ascending runs -> varbyte-ready gaps: absolute at each
    run start (``firsts`` boolean mask), (delta - 1) elsewhere."""
    gaps = np.empty(vals.size, dtype=np.int64)
    gaps[firsts] = vals[firsts]
    rest = ~firsts
    gaps[rest] = vals[rest] - vals[np.flatnonzero(rest) - 1] - 1
    assert np.all(gaps >= 0), "runs must be strictly increasing"
    return gaps.astype(np.uint64)


def _delta_decode(raw: np.ndarray, firsts: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_delta_encode` via one grouped cumsum."""
    if raw.size == 0:
        return raw.astype(np.int64)
    adj = raw.astype(np.int64) + 1
    adj[firsts] = raw[firsts]
    c = np.cumsum(adj)
    starts = np.flatnonzero(firsts)
    run_id = np.cumsum(firsts) - 1
    prefix = (c[starts] - adj[starts])[run_id]
    return c - prefix


def decode_term_positions(pdocs: bytes, pcounts: bytes, pstream: bytes
                          ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_ids, counts, flat_positions): positions of doc i are
    ``flat[offs[i]:offs[i]+counts[i]]`` with ``offs = cumsum(counts) -
    counts``; each doc's sublist is strictly increasing."""
    counts = varbyte_decode(pcounts).astype(np.int64)
    n_docs = counts.size
    dgaps = varbyte_decode(pdocs)
    first_doc = np.zeros(n_docs, dtype=bool)
    if n_docs:
        first_doc[0] = True
    docs = _delta_decode(dgaps, first_doc)
    raw = varbyte_decode(pstream)
    firsts = np.zeros(int(counts.sum()), dtype=bool)
    if firsts.size:
        firsts[np.cumsum(counts) - counts] = True
    flat = _delta_decode(raw, firsts)
    return docs, counts, flat


def doc_lemma_positions(docs: DataFrame, text_col: str = "content",
                        normalizer: str = "pinned",
                        forms: dict[str, tuple[str, ...]] | None = None,
                        ) -> DataFrame:
    """(repo?, doc_id, text) -> FLAT (doc_id, lemma, pos) rows, one per
    occurrence, with ZERO shuffle — a doc's positional stream is computed
    entirely map-side, mirroring the pinned ``analyze_positions`` exactly:
    position = rank of the surviving source token, multi-lemma tokens emit
    every form at ONE position.

    Executed via ``mapInArrow`` + pyarrow compute kernels over contiguous
    buffers (the same shape as analyzer.doc_term_stats_arrow — the first
    positional cut used pandas object lists per (doc, lemma) and measured
    ~3x the main build; flat primitive rows let the JVM assemble the runs
    and the merge stay pure numpy).  Only the rare exception-table tokens
    round-trip through Python."""
    from ..analyzer import _forms_table

    return _positions_kernel(docs, text_col,
                             _forms_table(normalizer, forms), False)


def doc_lemma_positions_stemmed(docs: DataFrame, text_col: str,
                                normalizer: str,
                                forms: dict[str, tuple[str, ...]] | None,
                                ) -> DataFrame:
    """The stemmer-family positional analyzer ('porter'/'stem'/
    'dict_porter'): the Arrow kernel emits surviving tokens with a
    ``raw`` provenance flag (dictionary expansions are FINAL lemmas, raw
    tokens still need stemming), then the raw subset is normalized by the
    same O(vocabulary) join the main build uses — stem each DISTINCT
    surface token once, map back onto its positions.  Provenance matters:
    an expanded form and a raw surface token can collide as strings
    ("leave" from leaves -> leave must stay "leave" while a raw "leave"
    porters to "leav")."""
    from pyspark.sql import functions as F

    from ..analyzer import dict_porter_table, stem_series, stem_vocab_map
    from ..functions.porter import porter_series

    table = dict_porter_table(forms) if normalizer == "dict_porter" else {}
    series = stem_series if normalizer == "stem" else porter_series
    # materialize the kernel output ONCE: done, raw and the vocab distinct
    # would otherwise each re-run the (expensive) positional analyzer
    tp = _positions_kernel(docs, text_col, table, True).localCheckpoint()
    done = tp.filter(~F.col("raw")).select("doc_id", "lemma", "pos")
    raw = tp.filter(F.col("raw")).select(
        "doc_id", F.col("lemma").alias("token"), "pos")
    vocab = stem_vocab_map(raw, series)
    return done.unionByName(
        raw.join(vocab, "token").select("doc_id", "lemma", "pos"))


def doc_stats_and_positions_arrow(docs: DataFrame, text_col: str = "content",
                                  normalizer: str = "pinned",
                                  forms: dict[str, tuple[str, ...]] | None = None,
                                  ) -> DataFrame:
    """ONE analysis pass emitting BOTH build inputs as a union stream:

      - stat rows       (doc_id, lemma, tf, dl, pos=NULL)   — what
        ``analyzer.doc_term_stats_arrow`` yields (value-identical,
        parity-tested), feeding the main posting merge;
      - occurrence rows (doc_id, lemma, tf=NULL, dl=NULL, pos) — what
        ``doc_lemma_positions`` / ``doc_lemma_positions_stemmed`` yield
        (value-identical), feeding the positional merge.

    This is the fused single-scan build's analyzer stage
    (``builder.build_index(positions=True)``): a positional index built
    the two-pass way tokenizes + normalizes every document TWICE — at
    100 TB the second full corpus scan is the single largest avoidable
    cost in the whole pipeline.  Everything per-doc is computed map-side
    in the same Arrow batch (zero shuffle, like both parent kernels);
    the stemmer family normalizes in-kernel over the batch's UNIQUE
    tokens (``analyzer._stem_arrow``, per-worker memo), which for the
    positional half replaces ``doc_lemma_positions_stemmed``'s
    O(vocabulary) join — same values, one stage earlier."""
    from ..analyzer import (_CAMEL_1, _CAMEL_2, _STRIP_PY, MIN_TOKEN_LEN,
                            STOP_WORDS, _forms_table, _stem_arrow,
                            dict_porter_table, stem_token)

    if normalizer == "dict_porter":
        from ..functions.porter import porter_stem as _stem_fn

        table = dict_porter_table(forms)
    elif normalizer in ("porter", "stem"):
        if normalizer == "porter":
            from ..functions.porter import porter_stem as _stem_fn
        else:
            _stem_fn = stem_token
        table = {}
    else:
        table = _forms_table(normalizer, forms)
        _stem_fn = None

    schema = "doc_id long, lemma string, tf int, dl long, pos int"
    narrowed = docs.select("doc_id", text_col)

    def _batches(it):
        import pyarrow as pa
        import pyarrow.compute as pc

        stop_set = pa.array(sorted(STOP_WORDS))
        exc_set = pa.array(list(table), type=pa.string())
        for batch in it:
            if batch.num_rows == 0:
                continue
            content = batch.column(batch.schema.get_field_index(text_col))
            x = pc.fill_null(content, "")
            x = pc.replace_substring_regex(x, pattern=_CAMEL_1[0],
                                           replacement=r"\1 \2")
            x = pc.replace_substring_regex(x, pattern=_CAMEL_2[0],
                                           replacement=r"\1 \2")
            x = pc.utf8_lower(x)
            x = pc.replace_substring_regex(x, pattern=_STRIP_PY,
                                           replacement=" ")
            lists = pc.split_pattern_regex(x, pattern=r"\s+")
            toks = pc.list_flatten(lists)
            par = pc.list_parent_indices(lists)
            keep = pc.and_(
                pc.greater_equal(pc.utf8_length(toks), MIN_TOKEN_LEN),
                pc.invert(pc.is_in(toks, value_set=stop_set)),
            )
            toks = pc.filter(toks, keep)
            par = pc.filter(par, keep)
            if len(toks) == 0:
                continue
            # position = rank of the surviving source token per doc,
            # BEFORE multi-lemma expansion (expanded forms share ONE
            # position) — identical to _positions_kernel
            parn = par.to_numpy(zero_copy_only=False).astype(np.int64)
            new_doc = np.empty(parn.size, dtype=bool)
            new_doc[0] = True
            new_doc[1:] = parn[1:] != parn[:-1]
            starts = np.flatnonzero(new_doc)
            run_len = np.diff(np.concatenate([starts, [parn.size]]))
            pos = np.arange(parn.size, dtype=np.int64) - np.repeat(
                starts, run_len)
            pos_arr = pa.array(pos, type=pa.int32())
            exc_mask = pc.is_in(toks, value_set=exc_set)
            if (pc.sum(exc_mask).as_py() or 0) > 0:
                base_mask = pc.invert(exc_mask)
                bt = pc.filter(toks, base_mask)
                bp = pc.filter(par, base_mask)
                bpos = pc.filter(pos_arr, base_mask)
                et = pc.filter(toks, exc_mask).to_pylist()
                ep = pc.filter(par, exc_mask).to_pylist()
                epos = pc.filter(pos_arr, exc_mask).to_pylist()
                xt: list[str] = []
                xp: list[int] = []
                xpos: list[int] = []
                for tkn, p_, q_ in zip(et, ep, epos):
                    for form in table[tkn]:
                        xt.append(form)
                        xp.append(p_)
                        xpos.append(q_)
                # dictionary expansions are FINAL lemmas; only the base
                # (raw) subset goes through the stemmer — the same
                # provenance rule as doc_lemma_positions_stemmed
                if _stem_fn is not None and len(bt):
                    bt = _stem_arrow(bt, _stem_fn, pa, pc)
                toks = pa.concat_arrays([bt, pa.array(xt, type=pa.string())])
                par = pa.concat_arrays([bp, pa.array(xp, type=bp.type)])
                pos_arr = pa.concat_arrays(
                    [bpos, pa.array(xpos, type=pa.int32())])
            elif _stem_fn is not None:
                toks = _stem_arrow(toks, _stem_fn, pa, pc)
            id_idx = batch.schema.get_field_index("doc_id")
            ids = pc.cast(pc.take(batch.column(id_idx), par), pa.int64())
            lemmas = pc.cast(toks, pa.string())
            n_occ = len(lemmas)
            yield pa.record_batch(
                [ids, lemmas, pa.nulls(n_occ, pa.int32()),
                 pa.nulls(n_occ, pa.int64()), pos_arr],
                names=["doc_id", "lemma", "tf", "dl", "pos"],
            )
            # stat rows off the SAME normalized arrays (tf per (doc,
            # lemma), dl = Σ tf per doc — multi-lemma expansions count
            # once per form, matching doc_term_stats_arrow)
            tf_t = (
                pa.table({"i": par, "lemma": lemmas})
                .group_by(["i", "lemma"], use_threads=False)
                .aggregate([([], "count_all")])
            )
            dl_t = (
                tf_t.group_by(["i"], use_threads=False)
                .aggregate([("count_all", "sum")])
            )
            out = tf_t.join(dl_t, keys="i", use_threads=False)
            i = out["i"].combine_chunks()
            n_st = len(i)
            yield pa.record_batch(
                [
                    pc.cast(pc.take(batch.column(id_idx), i), pa.int64()),
                    pc.cast(out["lemma"].combine_chunks(), pa.string()),
                    pc.cast(out["count_all"].combine_chunks(), pa.int32()),
                    pc.cast(out["count_all_sum"].combine_chunks(),
                            pa.int64()),
                    pa.nulls(n_st, pa.int32()),
                ],
                names=["doc_id", "lemma", "tf", "dl", "pos"],
            )

    return narrowed.mapInArrow(_batches, schema=schema)


def _positions_kernel(docs: DataFrame, text_col: str,
                      table: dict[str, tuple[str, ...]],
                      mark_raw: bool) -> DataFrame:
    from ..analyzer import _CAMEL_1, _CAMEL_2, _STRIP_PY
    from ..analyzer import MIN_TOKEN_LEN, STOP_WORDS

    schema = ("doc_id long, lemma string, pos int, raw boolean"
              if mark_raw else "doc_id long, lemma string, pos int")
    narrowed = docs.select("doc_id", text_col)

    def _batches(it):
        import pyarrow as pa
        import pyarrow.compute as pc

        stop_set = pa.array(sorted(STOP_WORDS))
        exc_set = pa.array(list(table), type=pa.string())
        for batch in it:
            if batch.num_rows == 0:
                continue
            content = batch.column(batch.schema.get_field_index(text_col))
            x = pc.fill_null(content, "")
            x = pc.replace_substring_regex(x, pattern=_CAMEL_1[0],
                                           replacement=r"\1 \2")
            x = pc.replace_substring_regex(x, pattern=_CAMEL_2[0],
                                           replacement=r"\1 \2")
            x = pc.utf8_lower(x)
            x = pc.replace_substring_regex(x, pattern=_STRIP_PY,
                                           replacement=" ")
            lists = pc.split_pattern_regex(x, pattern=r"\s+")
            toks = pc.list_flatten(lists)
            par = pc.list_parent_indices(lists)
            keep = pc.and_(
                pc.greater_equal(pc.utf8_length(toks), MIN_TOKEN_LEN),
                pc.invert(pc.is_in(toks, value_set=stop_set)),
            )
            # split_pattern_regex emits '' for leading/trailing whitespace;
            # MIN_TOKEN_LEN drops them with the short tokens
            toks = pc.filter(toks, keep)
            par = pc.filter(par, keep)
            if len(toks) == 0:
                continue
            # position over SURVIVING tokens, per doc: arange minus each
            # doc-run's first index (par is non-decreasing in token order)
            parn = par.to_numpy(zero_copy_only=False).astype(np.int64)
            new_doc = np.empty(parn.size, dtype=bool)
            new_doc[0] = True
            new_doc[1:] = parn[1:] != parn[:-1]
            starts = np.flatnonzero(new_doc)
            run_len = np.diff(np.concatenate([starts, [parn.size]]))
            pos = np.arange(parn.size, dtype=np.int64) - np.repeat(
                starts, run_len)
            pos_arr = pa.array(pos, type=pa.int32())
            # multi-lemma expansion: exception tokens are rare, so only
            # THAT subset round-trips through Python (same pos, every form)
            raw_arr = None
            exc_mask = pc.is_in(toks, value_set=exc_set)
            if (pc.sum(exc_mask).as_py() or 0) > 0:
                base_mask = pc.invert(exc_mask)
                bt = pc.filter(toks, base_mask)
                bp = pc.filter(par, base_mask)
                bpos = pc.filter(pos_arr, base_mask)
                et = pc.filter(toks, exc_mask).to_pylist()
                ep = pc.filter(par, exc_mask).to_pylist()
                epos = pc.filter(pos_arr, exc_mask).to_pylist()
                xt: list[str] = []
                xp: list[int] = []
                xpos: list[int] = []
                for tkn, p_, q_ in zip(et, ep, epos):
                    for form in table[tkn]:
                        xt.append(form)
                        xp.append(p_)
                        xpos.append(q_)
                if mark_raw:
                    # provenance: base tokens still need the stemmer,
                    # dictionary expansions are final lemmas
                    raw_arr = pa.concat_arrays([
                        pa.array(np.ones(len(bt), dtype=bool)),
                        pa.array(np.zeros(len(xt), dtype=bool)),
                    ])
                toks = pa.concat_arrays([bt, pa.array(xt, type=bt.type)])
                par = pa.concat_arrays([bp, pa.array(xp, type=bp.type)])
                pos_arr = pa.concat_arrays(
                    [bpos, pa.array(xpos, type=pa.int32())])
            elif mark_raw:
                raw_arr = pa.array(np.ones(len(toks), dtype=bool))
            id_idx = batch.schema.get_field_index("doc_id")
            cols = [
                pc.cast(pc.take(batch.column(id_idx), par), pa.int64()),
                pc.cast(toks, pa.string()),
                pos_arr,
            ]
            names = ["doc_id", "lemma", "pos"]
            if mark_raw:
                cols.append(raw_arr)
                names.append("raw")
            yield pa.record_batch(cols, names=names)

    return narrowed.mapInArrow(_batches, schema=schema)


def build_positions(docs_ingested: DataFrame, index_dir: str,
                    segments: list[int] | None = None) -> dict:
    """Build (or refresh) the positional sidecar for ``segments`` (None =
    every segment of the existing index) and set ``meta.has_positions``.

    Same at-scale shape as the main build: map-side positional analyzer
    (no shuffle), salted bounded-key partial runs, coarse (segment, bucket)
    merge-encode groups, dynamic partition overwrite with stale-dir
    deletion.  MUST run against the same corpus state as the index data
    (the caller's contract — rebuild_segments wires it for incremental
    flows)."""
    from .builder import seg_ranges_filter

    spark = docs_ingested.sparkSession
    with open(f"{index_dir}/meta.json") as fh:
        meta = json.load(fh)
    seg_size = int(meta["seg_size"])
    target = sorted(segments) if segments is not None else list(
        range(int(meta["n_segments"])))
    if not target:
        # nothing to (re)build — run the manifest/meta bookkeeping only
        # (restores has_positions after a data rebuild that touched no
        # sidecar dirs)
        return _merge_write_positions(None, index_dir, meta, [])

    docs = docs_ingested.select("doc_id", "content")
    if segments is not None:
        docs = docs.filter(seg_ranges_filter(target, seg_size))
    from .builder import index_analyzer

    norm, forms = index_analyzer(spark, index_dir, meta)
    if norm in ("pinned", "dict"):
        pos = doc_lemma_positions(docs, normalizer=norm, forms=forms)
    else:
        # stemmer family: raw-token kernel + O(vocabulary) stem join
        pos = doc_lemma_positions_stemmed(docs, "content", norm, forms)
    return _merge_write_positions(pos, index_dir, meta, target)


def _merge_write_positions(pos: DataFrame, index_dir: str, meta: dict,
                           target: list[int]) -> dict:
    """Shared back half of the positional build: salted partial runs ->
    (segment, bucket) merge-encode -> dynamic overwrite -> manifest /
    meta positional stats.  ``pos`` is the FLAT (doc_id, lemma, pos)
    occurrence stream covering (at least) the ``target`` segments'
    doc-id ranges — either freshly analyzed (:func:`build_positions`) or
    the positional half of the fused single-scan build
    (``builder.build_index(positions=True)``)."""
    from pyspark.sql import functions as F

    from .builder import hash_bucket_col

    if not target:
        return _positions_bookkeeping(None, index_dir, [])
    spark = pos.sparkSession
    seg_size = int(meta["seg_size"])
    n_buckets = int(meta["n_buckets"])
    salt = int(meta["salt"])
    seg_col = (F.col("doc_id") / seg_size).cast("int")
    # salted runs travel as two ALIGNED primitive arrays — one entry per
    # OCCURRENCE (struct-field extraction after sort_array, JVM-side);
    # sort_array over struct(doc_id, pos) yields (doc, pos) order, so the
    # merge below is pure numpy over flat buffers (no object lists)
    runs = (
        pos.withColumn("segment", seg_col)
        .filter(F.col("segment").isin(target))
        .withColumn("_salt", F.pmod(F.col("doc_id"), F.lit(salt)).cast("int"))
        .groupBy("segment", "lemma", "_salt")
        .agg(F.sort_array(
            F.collect_list(F.struct("doc_id", "pos"))).alias("run"))
        .select(
            "segment", "lemma",
            hash_bucket_col(F.col("lemma"), n_buckets).alias("bucket"),
            F.col("run.doc_id").alias("r_docs"),
            F.col("run.pos").alias("r_pos"),
        )
    )

    def _merge(pdf):
        import pandas as pd

        cols = ["segment", "lemma", "df", "pdocs", "pcounts", "pstream",
                "nbytes", "bucket"]
        if pdf.empty:
            return pd.DataFrame([], columns=cols)
        seg = int(pdf["segment"].iloc[0])
        bucket = int(pdf["bucket"].iloc[0])
        run_lens = np.fromiter((len(a) for a in pdf["r_docs"]),
                               dtype=np.int64, count=len(pdf))
        codes, lemmas = pd.factorize(pdf["lemma"], sort=True)
        rid = np.repeat(codes, run_lens)
        docs = np.concatenate(
            [np.asarray(a, dtype=np.int64) for a in pdf["r_docs"]])
        flat = np.concatenate(
            [np.asarray(a, dtype=np.int64) for a in pdf["r_pos"]])
        # runs are disjoint by salt and each is (doc, pos)-sorted, so the
        # lexsort yields strictly increasing (doc, pos) per lemma
        order = np.lexsort((flat, docs, rid))
        docs, rid, flat = docs[order], rid[order], flat[order]
        # boundaries: new (lemma, doc) pair / new lemma
        nd = np.empty(docs.size, dtype=bool)
        nd[0] = True
        nd[1:] = (rid[1:] != rid[:-1]) | (docs[1:] != docs[:-1])
        nl = np.empty(docs.size, dtype=bool)
        nl[0] = True
        nl[1:] = rid[1:] != rid[:-1]
        doc_rows = np.flatnonzero(nd)          # one row per (lemma, doc)
        counts = np.diff(np.concatenate([doc_rows, [docs.size]]))
        lem_docs = docs[doc_rows]              # per-(lemma,doc) doc ids
        lem_of_doc = rid[doc_rows]
        first_doc = nl[doc_rows]               # lemma start in doc list
        n_per_lemma = np.bincount(lem_of_doc, minlength=len(lemmas))
        doc_off = np.concatenate([[0], np.cumsum(n_per_lemma)])
        pos_off = doc_rows                     # flat start per (lemma,doc)
        dgaps = _delta_encode(lem_docs, first_doc)
        pgaps = _delta_encode(flat, nd)        # absolute at each doc start
        out = []
        for t in range(len(lemmas)):
            s, e = int(doc_off[t]), int(doc_off[t + 1])
            ps = int(pos_off[s]) if s < e else 0
            pe = (int(pos_off[e - 1] + counts[e - 1]) if s < e else 0)
            b_docs = varbyte_encode(dgaps[s:e]).tobytes()
            b_counts = varbyte_encode(counts[s:e].astype(np.uint64)).tobytes()
            b_stream = varbyte_encode(pgaps[ps:pe]).tobytes()
            out.append({
                "segment": seg,
                "lemma": lemmas[t],
                "df": int(e - s),
                "pdocs": b_docs,
                "pcounts": b_counts,
                "pstream": b_stream,
                "nbytes": len(b_docs) + len(b_counts) + len(b_stream),
                "bucket": bucket,
            })
        return pd.DataFrame(out, columns=cols)

    for s in target:
        shutil.rmtree(f"{index_dir}/positions/segment={s}",
                      ignore_errors=True)
    (
        runs.groupBy("segment", "bucket")
        .applyInPandas(_merge, schema=POS_SCHEMA_DDL)
        .repartition("segment", "bucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("segment", "bucket")
        .parquet(f"{index_dir}/positions")
    )
    return _positions_bookkeeping(spark, index_dir, target)


def _positions_bookkeeping(spark, index_dir: str, target: list[int]) -> dict:
    """Positional stats + ``has_positions`` flag maintenance.

    Per-segment positional stats ride the INDEX manifests (same lifecycle:
    a data rebuild rewrites its segments' manifests without pos keys, and
    the sidecar refresh re-adds them) so the serving broker can estimate a
    form's positional bytes from its dictionary df BEFORE any collect — the
    same estimate-before-fetch discipline as BM25 warm serving.  The agg
    scans only the TARGET segments (partition pruning) and only two int
    columns (column pruning; nbytes was persisted for exactly this).  With
    an empty ``target`` this is a pure bookkeeping repair (no Spark job)."""
    from pyspark.sql import functions as _F

    from .checkpoint import all_manifests, read_manifest, write_manifest

    stats = {
        int(r["segment"]): r
        for r in spark.read.schema(POS_SCHEMA_DDL)
        .parquet(f"{index_dir}/positions")
        .filter(_F.col("segment").isin(target))
        .groupBy("segment")
        .agg(_F.sum("df").alias("p"), _F.sum("nbytes").alias("b"))
        .collect()
    } if target else {}
    for s in target:
        m = read_manifest(index_dir, s)
        if m is None:
            continue
        r = stats.get(s)
        m["pos_posting_count"] = int(r["p"]) if r else 0
        m["pos_posting_bytes"] = (
            int(r["b"]) if r is not None and r["b"] is not None else 0)
        write_manifest(index_dir, s, m)
    tot_b = tot_p = 0
    complete = True  # every done manifest contributed positional stats?
    for m in all_manifests(index_dir):
        if "pos_posting_bytes" in m:
            tot_b += int(m["pos_posting_bytes"])
            tot_p += int(m["pos_posting_count"])
        else:
            complete = False

    # re-read meta (build_index may have updated it) and flip the flag LAST
    with open(f"{index_dir}/meta.json") as fh:
        meta = json.load(fh)
    if tot_p:
        # ratio: sound from a subset; whole-sidecar total: only when every
        # manifest contributed (same soundness rule as meta.posting_bytes)
        meta["pos_bytes_per_posting"] = round(tot_b / tot_p, 3)
    if complete and tot_p:
        meta["pos_posting_bytes"] = int(tot_b)
    else:
        meta.pop("pos_posting_bytes", None)
    # SOUNDNESS: the flag may only flip on when EVERY live segment has its
    # sidecar dir — a crash between a partial refresh and its complement
    # (or a multi-step fused build) must never re-enable an incomplete
    # sidecar: phrase_topk would auto-dispatch positional and silently
    # drop every match in the gap segments.  Dir presence is the cheap
    # completeness signal; partially-WRITTEN dirs are excluded by the
    # caller contract (each build/refresh rmtree's its target dirs before
    # writing, and untouched dirs are only trusted when the previous flag
    # was on — see build_index's `trust`).
    # a segment with no data dir has nothing to serve (deletes emptied its
    # id range) — vacuously covered, or an emptied index would wedge off
    meta["has_positions"] = all(
        os.path.isdir(f"{index_dir}/positions/segment={s}")
        or not os.path.isdir(f"{index_dir}/data/segment={s}")
        for s in range(int(meta["n_segments"])))
    with open(f"{index_dir}/meta.json", "w") as fh:
        json.dump(meta, fh, indent=1)
    return meta


def read_positions(spark: SparkSession, index_dir: str,
                   lemmas: list[str] | None = None) -> DataFrame:
    """Bucket-pruned read of the positional sidecar (same pruning contract
    as builder.read_index)."""
    from pyspark.sql import functions as F

    from .builder import hash_bucket

    with open(f"{index_dir}/meta.json") as fh:
        meta = json.load(fh)
    if not _glob.glob(f"{index_dir}/positions/segment=*"):
        return spark.createDataFrame([], POS_SCHEMA_DDL)
    df = spark.read.schema(POS_SCHEMA_DDL).parquet(f"{index_dir}/positions")
    if lemmas is not None:
        buckets = sorted({hash_bucket(x, meta["n_buckets"]) for x in lemmas})
        df = (df.filter(F.col("bucket").isin(buckets))
              .filter(F.col("lemma").isin(lemmas)))
    return df


def phrase_topk_batch(spark: SparkSession, index_dir: str,
                      phrases: dict[str, str], k: int = 10,
                      sites: dict[str, str] | None = None) -> DataFrame:
    """Score a whole PHRASE workload in one Spark job: (qid, doc_id,
    phrase_tf) — the positional twin of wand.bm25_topk_batch.  ONE
    bucket-pruned sidecar scan covers the union of all patterns' forms;
    inside each segment every form is decoded ONCE and shared across all
    phrases using it; the per-qid top-k merge is one tiny window-ranked
    shuffle.  Row-identical per qid to :func:`phrase_topk_positions`
    (parity-tested).

    ``sites`` (qid -> repo, optional per qid) completes batch API parity
    with BM25: a qid's scope becomes the same doc_id interval mask the
    single path applies (in-segment after the slot intersection, with a
    per-qid live-segment skip), an unknown site drops its qid (single-path
    parity: empty), and when EVERY qid is scoped the sidecar scan itself
    prunes to the union of their overlapping segments."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if not has_positions(index_dir):
        raise ValueError(
            "positional sidecar missing or stale (a rebuild clears "
            "meta.has_positions) — run build_positions first")
    out_schema = "qid string, doc_id long, phrase_tf long"
    empty = spark.createDataFrame([], out_schema)
    from .builder import index_analyzer

    ana = index_analyzer(spark, index_dir)
    qpat = {qid: [frozenset(p) for p in analyze_positions(ph, *ana)]
            for qid, ph in phrases.items()}
    qpat = {qid: p for qid, p in qpat.items() if p}
    if not qpat:
        return empty
    with open(f"{index_dir}/meta.json") as fh:
        seg_size = int(json.load(fh)["seg_size"])

    qiv: dict[str, list[tuple[int, int]] | None] = {q: None for q in qpat}
    qlive: dict[str, set[int] | None] = {q: None for q in qpat}
    if sites:
        from .builder import read_site_ranges
        from .wand import _overlapping_segments

        iv_cache: dict[str, list[tuple[int, int]]] = {}
        for qid in list(qpat):
            s = sites.get(qid)
            if s is None:
                continue
            if s not in iv_cache:
                iv_cache[s] = read_site_ranges(spark, index_dir, s)
            if not iv_cache[s]:
                del qpat[qid]  # unknown site owns no pages
            else:
                qiv[qid] = iv_cache[s]
                qlive[qid] = _overlapping_segments(iv_cache[s], seg_size)
        if not qpat:
            return empty
    all_forms = sorted({f for p in qpat.values() for fs in p for f in fs})

    pdf_src = read_positions(spark, index_dir, all_forms)
    if sites and all(qlive.get(q) is not None for q in qpat):
        union = sorted(set().union(*(qlive[q] for q in qpat)))
        pdf_src = pdf_src.filter(F.col("segment").isin(union))

    def _seg(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["segment"].iloc[0])
        base = seg * seg_size
        decoded: dict[str, tuple] = {}
        max_pos = 0
        for r in pdf.itertuples():
            docs, counts, flat = decode_term_positions(
                r.pdocs, r.pcounts, r.pstream)
            if flat.size:
                max_pos = max(max_pos, int(flat.max()))
            decoded[r.lemma] = (np.repeat(docs - base, counts), flat)
        K = max_pos + 2
        out_q: list[str] = []
        out_d: list[int] = []
        out_t: list[int] = []
        for qid, pattern in qpat.items():
            live = qlive.get(qid)
            if live is not None and seg not in live:
                continue  # this qid's site cannot reach this segment
            acc = _intersect_slots(pattern, decoded, K)
            if acc is None or acc.size == 0:
                continue
            ids, tf = np.unique(base + acc // K, return_counts=True)
            iv = qiv.get(qid)
            if iv is not None:
                from .wand import _mask_ids

                keep = np.isin(ids, _mask_ids(ids, iv))
                ids, tf = ids[keep], tf[keep]
                if ids.size == 0:
                    continue
            order = np.lexsort((ids, -tf))[:k]  # segment-local pre-cut
            out_q.extend([qid] * order.size)
            out_d.extend(ids[order].tolist())
            out_t.extend(tf[order].tolist())
        return pd.DataFrame({"qid": out_q, "doc_id": out_d,
                             "phrase_tf": out_t})

    local = pdf_src.groupBy("segment").applyInPandas(_seg, schema=out_schema)
    w = Window.partitionBy("qid").orderBy(F.desc("phrase_tf"),
                                          F.asc("doc_id"))
    return (
        local.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
        .orderBy("qid", F.desc("phrase_tf"), F.asc("doc_id"))
    )


def _intersect_slots(pattern: list[frozenset], decoded: dict[str, tuple],
                     K: int) -> np.ndarray | None:
    """Shared slot-intersection core: ``decoded`` maps lemma ->
    (local_doc-per-occurrence, flat positions).  Returns the surviving
    start keys (local_doc * K + start_pos), or None when some slot has no
    form in this segment."""
    slot_keys: list[np.ndarray | None] = []
    for j, fs in enumerate(pattern):
        parts = []
        for f in fs:
            if f not in decoded:
                continue
            local, flat = decoded[f]
            ok = flat >= j  # a start at pos-j must be >= 0
            parts.append(local[ok] * K + (flat[ok] - j))
        if not parts:
            return None
        slot_keys.append(np.unique(np.concatenate(parts)))
    acc: np.ndarray | None = None
    for keys in sorted(slot_keys, key=lambda a: a.size):  # rarest first
        acc = keys if acc is None else np.intersect1d(
            acc, keys, assume_unique=True)
        if acc.size == 0:
            return acc
    return acc


def phrase_topk_positions(spark: SparkSession, index_dir: str, phrase: str,
                          k: int = 10,
                          site: str | None = None) -> DataFrame:
    """Top-k (doc_id, phrase_tf) from the positional sidecar alone — exact,
    store-free, O(query-term postings) even for a phrase of two common
    words.  Row-identical to index/phrase.py's store-verify path (same
    ``analyze_positions`` pattern contract on both sides; parity-tested).

    ``site`` scopes the search to one repo exactly like BM25 serving: the
    builder's sites sidecar resolves to doc_id intervals, the sidecar scan
    is partition-pruned to overlapping segments, and matched docs are
    interval-masked after the slot intersection."""
    import pandas as pd
    from pyspark.sql import functions as F

    if not has_positions(index_dir):
        raise ValueError(
            "positional sidecar missing or stale (a rebuild clears "
            "meta.has_positions) — run build_positions first, or use the "
            "store-verify path")
    out_schema = "doc_id long, phrase_tf long"
    empty = spark.createDataFrame([], out_schema)
    from .builder import index_analyzer

    qforms = [frozenset(p) for p in
              analyze_positions(phrase, *index_analyzer(spark, index_dir))]
    if not qforms:
        return empty
    all_forms = sorted({f for fs in qforms for f in fs})
    with open(f"{index_dir}/meta.json") as fh:
        seg_size = int(json.load(fh)["seg_size"])

    intervals = None
    if site is not None:
        from .builder import read_site_ranges

        intervals = read_site_ranges(spark, index_dir, site)
        if not intervals:
            return empty  # unknown site owns no pages

    pdf_src = read_positions(spark, index_dir, all_forms)
    if intervals:
        from .wand import _overlapping_segments

        segs = sorted(_overlapping_segments(intervals, seg_size))
        pdf_src = pdf_src.filter(F.col("segment").isin(segs))

    def _seg(pdf: pd.DataFrame) -> pd.DataFrame:
        e_ = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                           "phrase_tf": pd.Series([], dtype="int64")})
        seg = int(pdf["segment"].iloc[0])
        base = seg * seg_size
        decoded: dict[str, tuple] = {}
        max_pos = 0
        for r in pdf.itertuples():
            docs, counts, flat = decode_term_positions(
                r.pdocs, r.pcounts, r.pstream)
            if flat.size:
                max_pos = max(max_pos, int(flat.max()))
            decoded[r.lemma] = (np.repeat(docs - base, counts), flat)
        K = max_pos + 2
        acc = _intersect_slots(qforms, decoded, K)
        if acc is None or acc.size == 0:
            return e_
        ids, tf = np.unique(base + acc // K, return_counts=True)
        if intervals is not None:
            from .wand import _mask_ids

            keep = np.isin(ids, _mask_ids(ids, intervals))
            ids, tf = ids[keep], tf[keep]
        return pd.DataFrame({"doc_id": ids, "phrase_tf": tf})

    local = pdf_src.groupBy("segment").applyInPandas(_seg, schema=out_schema)
    return (
        local.orderBy(F.desc("phrase_tf"), F.asc("doc_id"))
        .limit(k)
    )
