"""Top-k query over the physical index: MaxScore/block-max pruning + BM25.

SURVEY.md §4 item 2.  The reference's retrieval is a rarest-first
intersection loop (SearchServiceImpl.java:122-143); at scale this becomes:

- the index is read partition-pruned (bucket= dirs of the query terms only);
- each doc-range SEGMENT computes its local top-k independently inside one
  ``applyInPandas`` group (numpy, Arrow-batched — no per-row Python);
- segment winners merge via a global TakeOrderedAndProject.

Within a segment several exact algorithms (self-oracle-tested against each
other, SURVEY.md §5.4; the hypothesis property test asserts all modes
return bit-identical (id, score) pairs on arbitrary posting sets):

- ``exhaustive``: decode all postings of all query terms, accumulate
  idf·(k1+1)·weight per doc (np.add.at), top-k.
- ``maxscore``: safe dynamic pruning.  Pass 1 scores the rarest term's
  postings exactly (lookups into other terms decode ONLY blocks overlapping
  the candidate ids — the block directory's first/last_doc bounds drive the
  skip, this is where block-max earns its keep).  With the pass-1 threshold
  θ, terms whose upper bounds (idf·(k1+1)·max block weight) sum below θ are
  non-essential: docs appearing only in them provably cannot enter the
  top-k, so candidate generation decodes essential terms only.
- ``bmw``: Block-Max WAND (Ding & Suel, SIGIR 2011) in a vectorized
  interval form — doc-id space is cut at every block boundary, each
  interval carries Σ_t blockmax_t as a doc-wise score bound, and candidate
  generation decodes only blocks overlapping intervals whose bound reaches
  the pass-1 θ.  Block-granular pruning where MaxScore prunes whole terms.
- ``auto`` (serving default): exhaustive when the segment's posting lists
  are near-uniform in length (pruning provably degenerates and pass-1 is
  pure overhead — measured ~1.4× exhaustive), MaxScore otherwise.
  Warm suite p95 12.2 → 8.5 ms with p50 unchanged at 40k docs.

Conjunctive mode replicates the reference's AND semantics (docs must carry
every term) with the same block-skipping lookups, rarest term driving.
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

import numpy as np

from ..analyzer import analyze
from .codec import decode_block

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession


class TermPostings:
    """Decoded-on-demand view over one term's compressed postings."""

    __slots__ = ("docs_b", "tfs_b", "dls_b", "first", "last", "n", "doc_off",
                 "tf_off", "dl_off", "max_w", "df", "_cache", "_full")

    def __init__(self, postings: bytes, tfs: bytes, dls: bytes, blocks, df: int):
        self.docs_b = np.frombuffer(postings, dtype=np.uint8)
        self.tfs_b = np.frombuffer(tfs, dtype=np.uint8)
        self.dls_b = np.frombuffer(dls, dtype=np.uint8)
        bl = list(blocks)
        get = (lambda b, k, i: b[k]) if bl and isinstance(bl[0], dict) else (lambda b, k, i: b[i])
        self.first = np.array([get(b, "first_doc", 0) for b in bl], dtype=np.int64)
        self.last = np.array([get(b, "last_doc", 1) for b in bl], dtype=np.int64)
        self.n = np.array([get(b, "n", 2) for b in bl], dtype=np.int64)
        self.doc_off = np.array([get(b, "doc_off", 3) for b in bl], dtype=np.int64)
        self.tf_off = np.array([get(b, "tf_off", 4) for b in bl], dtype=np.int64)
        self.dl_off = np.array([get(b, "dl_off", 5) for b in bl], dtype=np.int64)
        self.max_w = np.array([get(b, "max_weight", 6) for b in bl], dtype=np.float64)
        self.df = df
        self._cache: dict[int, tuple] = {}
        self._full: tuple | None = None  # memoized decode_all result

    def _enc(self):
        blocks = list(zip(self.first, self.last, self.n, self.doc_off,
                          self.tf_off, self.dl_off))
        return (self.docs_b, self.tfs_b, self.dls_b, blocks)

    def block(self, i: int):
        if self._full is not None:
            # fully-decoded fast path: slice the memoized flat arrays (BMW's
            # candidate loop calls block() right after pass-1's decode_all —
            # re-decoding would both waste CPU and repopulate the per-block
            # cache decode_all just dropped)
            s = int(self.n[:i].sum())
            e = s + int(self.n[i])
            return tuple(a[s:e] for a in self._full)
        if i not in self._cache:
            self._cache[i] = decode_block(self._enc(), i)
        return self._cache[i]

    def decode_all(self):
        if self._full is None:
            parts = [self.block(i) for i in range(self.first.size)]
            if not parts:
                z = np.zeros(0, dtype=np.int64)
                self._full = (z, z, z)
            else:
                self._full = tuple(
                    np.concatenate([p[j] for p in parts]) for j in range(3)
                )
            # every lookup now takes the _full fast path, so the per-block
            # cache is dead weight — dropping it halves the decoded-postings
            # memory a warm term pins in the serving LRU
            self._cache.clear()
        return self._full

    def lookup(self, ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(tf, dl) aligned to sorted ``ids`` (0 where absent); decodes only
        blocks whose [first_doc, last_doc] range intersects ``ids``.

        Fully-decoded fast path: once every block is cached (pass 1 of any
        query decoded the term, or enough partial lookups accumulated), one
        vectorized searchsorted over the memoized concatenated arrays
        replaces the per-block loop — the warm-serving profile showed the
        per-block Python overhead (8+ numpy calls × blocks × terms)
        dominating repeated-query latency."""
        tf_out = np.zeros(ids.size, dtype=np.int64)
        dl_out = np.zeros(ids.size, dtype=np.int64)
        if ids.size == 0 or self.first.size == 0:
            return tf_out, dl_out
        if self._full is None and len(self._cache) == self.first.size:
            self.decode_all()  # all blocks cached: memoize the flat view
        if self._full is not None:
            a_ids, a_tfs, a_dls = self._full
            pos = np.searchsorted(a_ids, ids)
            pos[pos == a_ids.size] = 0  # any in-range index; masked below
            hit = a_ids[pos] == ids
            tf_out[hit] = a_tfs[pos[hit]]
            dl_out[hit] = a_dls[pos[hit]]
            return tf_out, dl_out
        # candidate block index for each id: rightmost block with first<=id
        bi = np.searchsorted(self.first, ids, side="right") - 1
        ok = (bi >= 0) & (ids <= self.last[np.clip(bi, 0, None)])
        for blk in np.unique(bi[ok]):
            b_ids, b_tfs, b_dls = self.block(int(blk))
            sel = ok & (bi == blk)
            pos = np.searchsorted(b_ids, ids[sel])
            pos = np.clip(pos, 0, b_ids.size - 1)
            hit = b_ids[pos] == ids[sel]
            rows = np.flatnonzero(sel)[hit]
            tf_out[rows] = b_tfs[pos[hit]]
            dl_out[rows] = b_dls[pos[hit]]
        return tf_out, dl_out


def _idf(n_docs: int, df: int) -> float:
    return float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))


def _score_ids(ids: np.ndarray, terms: list[TermPostings], idfs: list[float],
               k1: float, b: float, avgdl: float) -> np.ndarray:
    """Exact BM25 scores for sorted candidate ids (block-skipping lookups)."""
    scores = np.zeros(ids.size, dtype=np.float64)
    for t, idf in zip(terms, idfs):
        tf, dl = t.lookup(ids)
        nz = tf > 0
        w = np.zeros(ids.size)
        tff = tf[nz].astype(np.float64)
        w[nz] = tff / (tff + k1 * ((1.0 - b) + b * dl[nz] / avgdl))
        scores += idf * (k1 + 1.0) * w
    return scores


def _overlapping_segments(intervals: list[tuple[int, int]],
                          seg_size: int) -> set[int]:
    """Segments whose doc_id range intersects any site interval — a
    site-scoped query cannot match anywhere else (segment = doc_id //
    seg_size by construction), so every other segment's partitions are
    pruned from the scan / skipped in the warm merge."""
    out: set[int] = set()
    for lo, hi in intervals:
        out.update(range(lo // seg_size, hi // seg_size + 1))
    return out


def _mask_ids(ids: np.ndarray,
              intervals: list[tuple[int, int]] | None) -> np.ndarray:
    """Keep only ids inside the sorted disjoint ``intervals`` (site scope).
    ``None`` = no scope.  Vectorized: one searchsorted over interval lows."""
    if intervals is None or ids.size == 0:
        return ids
    lo = np.fromiter((iv[0] for iv in intervals), dtype=np.int64,
                     count=len(intervals))
    hi = np.fromiter((iv[1] for iv in intervals), dtype=np.int64,
                     count=len(intervals))
    pos = np.searchsorted(lo, ids, side="right") - 1
    ok = pos >= 0
    ok[ok] &= ids[ok] <= hi[pos[ok]]
    return ids[ok]


def _topk(ids: np.ndarray, scores: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """top-k by (score desc, doc_id asc) — deterministic.

    Large candidate sets are pre-cut with an O(n) partition on the kth
    score (keeping EVERY candidate tied at the cut, so the id tie-break
    stays exact) before the full lexsort runs on the survivors."""
    if ids.size == 0:
        return ids, scores
    if k > 0 and ids.size > 4 * k:
        kth = np.partition(scores, ids.size - k)[ids.size - k]
        keep = scores >= kth  # >= keeps ties at the cut; excluded < kth
        ids, scores = ids[keep], scores[keep]
    order = np.lexsort((ids, -scores))[: k]
    return ids[order], scores[order]


def segment_topk(term_rows: list[dict], n_docs: int, avgdl: float, k: int,
                 k1: float = 1.2, b: float = 0.75, mode: str = "maxscore",
                 conjunctive: bool = False,
                 intervals: list[tuple[int, int]] | None = None,
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Local top-k for one segment.  ``term_rows``: dicts with df (global!),
    postings/tfs/dls/blocks for each query term present in the segment."""
    terms = [TermPostings(r["postings"], r["tfs"], r["dls"], r["blocks"], r["df"])
             for r in term_rows]
    return segment_topk_terms(terms, n_docs, avgdl, k, k1, b, mode,
                              conjunctive, intervals)


def segment_topk_terms(terms: list[TermPostings], n_docs: int, avgdl: float,
                       k: int, k1: float = 1.2, b: float = 0.75,
                       mode: str = "maxscore",
                       conjunctive: bool = False,
                       intervals: list[tuple[int, int]] | None = None,
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Same as :func:`segment_topk` over PREBUILT ``TermPostings`` — the
    warm-serving path reuses cached objects so their lazily-decoded block
    caches survive across queries (repeated terms never re-decode).

    ``intervals`` (the builder's sites sidecar for one repo) scopes the
    search to a site: every candidate list is masked at generation, so θ
    comes from masked pass-1 scores (a subset of final candidates — still a
    valid lower bound) and MaxScore/BMW pruning stays provably exact under
    the mask (docs outside the essential union / dead intervals score below
    θ whether masked or not)."""
    idfs = [_idf(n_docs, t.df) for t in terms]
    if not terms:
        z = np.zeros(0, dtype=np.int64)
        return z, np.zeros(0)

    order = np.argsort([t.df for t in terms], kind="stable")  # rarest first (O1)
    terms = [terms[i] for i in order]
    idfs = [idfs[i] for i in order]

    if mode == "auto":
        # pruning pays when the rarest list is much shorter than the rest
        # (pass-1 over it is cheap and its θ excludes the common terms);
        # with near-uniform lists MaxScore degenerates to exhaustive PLUS a
        # full pass-1 — measured ~1.4× exhaustive on 3-common-term queries.
        # Segment-local df proxy: postings counts of the decoded directory.
        sizes = [int(t.n.sum()) for t in terms]
        mode = "exhaustive" if min(sizes) * 4 >= max(sizes) else "maxscore"

    if conjunctive:
        ids = _mask_ids(terms[0].decode_all()[0], intervals)
        for t in terms[1:]:
            if ids.size == 0:
                break  # early exit (SearchServiceImpl.java:136-138)
            tf, _ = t.lookup(ids)
            ids = ids[tf > 0]
        return _topk(ids, _score_ids(ids, terms, idfs, k1, b, avgdl), k)

    if mode == "exhaustive" or len(terms) == 1:
        all_ids = _mask_ids(
            np.unique(np.concatenate([t.decode_all()[0] for t in terms])),
            intervals)
        return _topk(all_ids, _score_ids(all_ids, terms, idfs, k1, b, avgdl), k)

    # pass 1 (shared by maxscore/bmw): rarest term's postings scored exactly
    c1 = _mask_ids(terms[0].decode_all()[0], intervals)
    s1 = _score_ids(c1, terms, idfs, k1, b, avgdl)
    if c1.size >= k:
        theta = np.partition(s1, -k)[-k]
    else:
        theta = -np.inf

    if mode == "bmw":
        # ---- Block-Max WAND, vectorized interval form (Ding & Suel 2011) --
        # Doc-id space is partitioned into elementary intervals at every
        # block boundary of every query term; on one interval each term's
        # contribution is bounded by the covering block's max weight, so
        #   score(d) <= ub(interval(d)) = Σ_t idf_t·(k1+1)·blockmax_t(d)
        # holds doc-wise.  Intervals with ub < θ (the pass-1 kth score)
        # provably contain no top-k doc beyond pass-1's own: any such doc
        # scores < θ <= final kth.  Candidate generation then decodes ONLY
        # blocks overlapping a live interval — block-level pruning where
        # MaxScore prunes whole terms — and filters ids to live intervals.
        # Exact: property-tested bit-identical to the exhaustive path.
        if not np.isfinite(theta):
            cand = _mask_ids(
                np.unique(np.concatenate([t.decode_all()[0] for t in terms])),
                intervals)
            return _topk(cand, _score_ids(cand, terms, idfs, k1, b, avgdl), k)
        pts = np.unique(np.concatenate(
            [np.concatenate([t.first, t.last + 1]) for t in terms]))
        iv_start = pts[:-1]  # interval i = [pts[i], pts[i+1]-1]
        ub = np.zeros(iv_start.size)
        for t, idf in zip(terms, idfs):
            if t.first.size == 0:
                continue
            bi = np.searchsorted(t.first, iv_start, side="right") - 1
            cov = bi >= 0
            cov[cov] &= iv_start[cov] <= t.last[bi[cov]]
            w = np.zeros(iv_start.size)
            w[cov] = t.max_w[bi[cov]]
            ub += idf * (k1 + 1.0) * w
        live = ub >= theta
        pref = np.concatenate(([0], np.cumsum(live)))
        parts = [c1]  # pass-1 ids (their exact scores seeded θ)
        for t in terms:
            if t.first.size == 0:
                continue
            lo = np.searchsorted(pts, t.first, side="right") - 1
            hi = np.searchsorted(pts, t.last, side="right") - 1
            blk_live = (pref[hi + 1] - pref[lo]) > 0
            for i in np.flatnonzero(blk_live):
                parts.append(t.block(int(i))[0])
        cand = _mask_ids(np.unique(np.concatenate(parts)), intervals)
        cand = cand[live[np.searchsorted(pts, cand, side="right") - 1]]
        return _topk(cand, _score_ids(cand, terms, idfs, k1, b, avgdl), k)

    # ---- MaxScore ----------------------------------------------------------
    ubs = np.array([idf * (k1 + 1.0) * (t.max_w.max() if t.max_w.size else 0.0)
                    for t, idf in zip(terms, idfs)])
    # essential terms: take by UB desc until the EXCLUDED UB sum < theta;
    # any doc outside the essential union then scores <= excluded_sum < theta
    # <= final kth score (pass-1 candidates are re-scored below), so pruning
    # is provably safe.  theta=-inf (fewer than k pass-1 docs) => no pruning.
    ub_order = np.argsort(-ubs, kind="stable")
    essential: set[int] = set()
    excluded = float(ubs.sum())
    for i in ub_order:
        if excluded < theta:
            break  # all remaining (smaller-UB) terms are non-essential
        essential.add(int(i))
        excluded -= float(ubs[i])
    essential.add(0)  # rarest term always drives (its docs seed theta)
    cand = _mask_ids(np.unique(np.concatenate(
        [terms[i].decode_all()[0] for i in sorted(essential)]
    )), intervals)
    return _topk(cand, _score_ids(cand, terms, idfs, k1, b, avgdl), k)


def gdf_lookup(spark: SparkSession, index_dir: str, qlemmas: list[str],
               meta: dict) -> list[tuple[str, int]]:
    """Pruned dictionary lookup: read only the bucket= dirs of the query
    terms and sum the per-segment df rows (the dict is (segment, bucket)-
    partitioned so partial rebuilds stay O(segment) — builder.py).
    Returns [] if the dict artifact doesn't exist."""
    import glob as _glob

    from pyspark.sql import functions as F

    from .builder import DICT_SCHEMA, hash_bucket

    if not _glob.glob(f"{index_dir}/dict/segment=*"):
        return []  # missing OR emptied-corpus dict
    buckets = sorted({hash_bucket(x, meta["n_buckets"]) for x in qlemmas})
    df = spark.read.schema(DICT_SCHEMA).parquet(f"{index_dir}/dict")
    rows = (
        df.filter(F.col("bucket").isin(buckets))
        .filter(F.col("lemma").isin(qlemmas))
        .groupBy("lemma")
        .agg(F.sum("df").alias("gdf"))
        .collect()
    )
    return [(r["lemma"], int(r["gdf"])) for r in rows]


def index_fingerprint(index_dir: str) -> tuple:
    """Cheap staleness token: (mtime_ns of meta.json, every manifest's
    (name, mtime_ns)).  Any rebuild rewrites at least one of these, so a
    warm QueryEngine can detect it with a handful of stat() calls."""
    import os

    out = []
    meta = f"{index_dir}/meta.json"
    if os.path.exists(meta):
        out.append(("meta", os.stat(meta).st_mtime_ns))
    mdir = f"{index_dir}/manifests"
    if os.path.isdir(mdir):
        for name in sorted(os.listdir(mdir)):
            if name.endswith(".json"):
                out.append((name, os.stat(f"{mdir}/{name}").st_mtime_ns))
    return tuple(out)


class QueryEngine:
    """Warm serving wrapper: caches meta, the (Spark-cached) index DataFrame
    and a bounded LRU of term rows, so each query is at most one Spark job.

    Defaults are the 10^12-file-safe ones: ``preload_dict=False`` (the full
    dictionary is O(vocabulary) — gdf comes free with the bucket-pruned term
    rows, or from a pruned dict read on the distributed path); the term-row
    cache is LRU-bounded.  Every query first checks
    :func:`index_fingerprint`: an incremental rebuild under a live engine
    invalidates the cached index DataFrame and warm term rows instead of
    silently serving stale postings."""

    def __init__(self, spark: SparkSession, index_dir: str,
                 preload_dict: bool = False, term_cache_size: int = 4096,
                 term_cache_bytes: int = 256 << 20,
                 pos_cache_size: int = 4096,
                 pos_cache_bytes: int = 256 << 20):
        self.spark = spark
        self.index_dir = index_dir
        self._preload_dict = preload_dict
        self._term_cache_size = term_cache_size
        self._term_cache_bytes = term_cache_bytes
        self._pos_cache_size = pos_cache_size
        self._pos_cache_bytes = pos_cache_bytes
        self._load()

    def _load(self) -> None:
        from collections import OrderedDict

        from .builder import read_index

        with open(f"{self.index_dir}/meta.json") as fh:
            self.meta = json.load(fh)
        self._fp = index_fingerprint(self.index_dir)
        # the index's morphology (normalizer + dict sidecar) is part of its
        # identity: queries must analyze with the table the build used
        from .builder import index_analyzer

        self._ana = index_analyzer(self.spark, self.index_dir, self.meta)
        # build-time average posting width: df * _bpp predicts a term's
        # driver-side bytes BEFORE any collect.  Indexes built before the
        # estimate existed fall back to a conservative constant.
        # _index_bytes (whole-index posting bytes) short-circuits the
        # estimate when the ENTIRE index fits under a query's threshold —
        # no term can exceed it, so small indexes skip the dict job.
        self._bpp = float(self.meta.get("bytes_per_posting") or 8.0)
        self._index_bytes: int | None = self.meta.get("posting_bytes")
        # LAZY cache: .cache() only marks the plan — bucket-pruned term reads
        # warm exactly the partitions they touch.  An eager .count() here
        # would materialize the WHOLE index (init cost + cluster cache
        # pressure O(index)) — wrong default at 10^12 files.
        self.index_df = read_index(self.spark, self.index_dir).cache()
        self._term_cache: OrderedDict[str, list] = OrderedDict()
        self._cache_nb: dict[str, int] = {}   # lemma -> cached posting bytes
        self._cache_total = 0                 # Σ _cache_nb (LRU byte bound)
        # warm PHRASE serving: positional postings get their own LRU (same
        # byte discipline; estimates use the sidecar's measured
        # pos_bytes_per_posting — a form's positional df equals its index
        # df, so the main dictionary prices both fetches)
        # fallback mirrors _bpp's: a sidecar built before the stats existed
        # must still ESTIMATE (conservatively) rather than skip the guard —
        # skipping would collect a common form's full positional stream to
        # the driver unguarded, the exact OOM the estimate exists to stop
        self._pos_bpp = float(
            self.meta.get("pos_bytes_per_posting") or 16.0)
        self._pos_bytes: int | None = self.meta.get("pos_posting_bytes")
        self._pos_cache: OrderedDict[str, list] = OrderedDict()
        self._pos_nb: dict[str, int] = {}
        self._pos_total = 0
        self._gdf_cache: dict[str, int] = {}  # lemma -> global df (tiny rows)
        self._site_cache: dict[str, list[tuple[int, int]]] = {}
        self._gdf: dict[str, int] | None = None
        if self._preload_dict:
            import os

            from pyspark.sql import functions as F

            if os.path.isdir(f"{self.index_dir}/dict"):
                from .builder import DICT_SCHEMA

                self._gdf = {
                    r["lemma"]: int(r["gdf"])
                    for r in self.spark.read.schema(DICT_SCHEMA)
                    .parquet(f"{self.index_dir}/dict")
                    .groupBy("lemma").agg(F.sum("df").alias("gdf")).collect()
                }

    def _check_fresh(self) -> None:
        if index_fingerprint(self.index_dir) != self._fp:
            self.index_df.unpersist()
            self._load()

    def topk(self, query: str, k: int = 10, mode: str = "auto",
             conjunctive: bool = False, site: str | None = None,
             offset: int = 0) -> DataFrame:
        self._check_fresh()
        gdf = None
        if self._gdf is not None:
            qlemmas = sorted(set(analyze(query, *self._ana)))
            gdf = {t: self._gdf[t] for t in qlemmas if t in self._gdf}
        return bm25_topk(self.spark, self.index_dir, query, k, mode=mode,
                         conjunctive=conjunctive, index_df=self.index_df,
                         gdf_override=gdf, site=site, offset=offset,
                         site_intervals=self._site(site))

    def topk_batch(self, queries: dict[str, str], k: int = 10,
                   mode: str = "auto", conjunctive: bool = False,
                   sites: dict[str, str] | None = None,
                   offsets: dict[str, int] | None = None) -> DataFrame:
        """Whole-workload scoring in one Spark job over the engine's cached
        index (see :func:`bm25_topk_batch`).  A preloaded dictionary skips
        the batch's gdf-lookup job; per-qid ``sites`` resolve through the
        engine's interval cache, so repeated scoped suites skip the sidecar
        reads too."""
        self._check_fresh()
        gdf = None
        if self._gdf is not None:
            lemmas = {t for q in queries.values()
                      for t in analyze(q, *self._ana)}
            gdf = {t: self._gdf[t] for t in lemmas if t in self._gdf}
        iv = {s: (self._site(s) or []) for s in set((sites or {}).values())}
        return bm25_topk_batch(self.spark, self.index_dir, queries, k,
                               mode=mode, conjunctive=conjunctive,
                               index_df=self.index_df, gdf_override=gdf,
                               sites=sites, offsets=offsets,
                               site_intervals=iv)

    def _site(self, site: str | None) -> list[tuple[int, int]] | None:
        """Cached (repo -> doc_id intervals) lookup: one pruned sites-sidecar
        read per (engine load, site) — fingerprint invalidation drops the
        cache with the rest of the warm state."""
        if site is None:
            return None
        if site not in self._site_cache:
            from .builder import read_site_ranges

            self._site_cache[site] = read_site_ranges(
                self.spark, self.index_dir, site)
        return self._site_cache[site]

    def _gdf_for(self, lemmas: list[str]) -> dict[str, int] | None:
        """Global df per lemma WITHOUT touching posting bytes: preloaded
        dict > per-engine gdf cache > one pruned dictionary read (cached for
        the engine's lifetime — a term's df is a handful of longs).  Returns
        ``None`` when the index has no dictionary artifact (legacy layout) —
        no size estimate is possible there."""
        if self._gdf is not None:
            return {t: self._gdf[t] for t in lemmas if t in self._gdf}
        missing = [t for t in lemmas if t not in self._gdf_cache]
        if missing:
            import glob as _glob

            if not _glob.glob(f"{self.index_dir}/dict/segment=*"):
                return None
            found = dict(gdf_lookup(self.spark, self.index_dir, missing,
                                    self.meta))
            for t in missing:
                self._gdf_cache[t] = int(found.get(t, 0))
        return {t: self._gdf_cache[t] for t in lemmas
                if self._gdf_cache.get(t, 0) > 0}

    def _evict(self, floor: int) -> None:
        """LRU eviction, bounded by BOTH entry count and total posting
        bytes; never drops below ``floor`` entries (the current working
        set must survive its own fetch)."""
        while len(self._term_cache) > floor and (
            len(self._term_cache) > self._term_cache_size
            or self._cache_total > self._term_cache_bytes
        ):
            lemma, _ = self._term_cache.popitem(last=False)
            self._cache_total -= self._cache_nb.pop(lemma, 0)

    def _fetch_terms(self, fetch: list[str], floor: int = 0,
                     gdf_hint: dict[str, int] | None = None) -> None:
        """One bucket-pruned Spark collect for ``fetch`` lemmas; cache
        DECODED TermPostings (global df baked in for idf) so the
        lazily-decoded block caches survive across queries — a repeated
        term costs neither a Spark job nor a varbyte decode.  ``floor``
        keeps the CURRENT working set from evicting itself when it is
        larger than the LRU bound.  Callers are expected to route
        over-estimate terms away BEFORE calling (topk_rows/prefetch do) —
        this function itself does not guard."""
        from pyspark.sql import functions as F

        from .builder import hash_bucket

        buckets = sorted({hash_bucket(x, self.meta["n_buckets"]) for x in fetch})
        fetched = (
            self.index_df.filter(F.col("bucket").isin(buckets))
            .filter(F.col("lemma").isin(fetch))
            .collect()
        )
        by_lemma: dict[str, list] = {t: [] for t in fetch}
        for r in fetched:
            by_lemma[r["lemma"]].append(r)
        for lemma, rs in by_lemma.items():
            if gdf_hint is not None and lemma in gdf_hint:
                gdf = int(gdf_hint[lemma])
            elif self._gdf is not None:
                gdf = self._gdf.get(lemma, 0)
            else:
                gdf = sum(int(r["df"]) for r in rs)
            self._gdf_cache[lemma] = gdf
            entries = [
                (
                    lemma,
                    int(r["segment"]),
                    TermPostings(
                        r["postings"], r["tfs"], r["dls"],
                        [b.asDict() if hasattr(b, "asDict") else b
                         for b in r["blocks"]],
                        gdf,
                    ),
                    len(r["postings"]) + len(r["tfs"]) + len(r["dls"]),
                )
                for r in rs
            ]
            self._cache_total -= self._cache_nb.pop(lemma, 0)
            self._term_cache[lemma] = entries
            nb = sum(e[3] for e in entries)
            self._cache_nb[lemma] = nb
            self._cache_total += nb
        self._evict(floor)

    def _drop_terms(self, lemmas: list[str]) -> None:
        """Remove specific lemmas from the term cache (the post-fetch
        backstop's cleanup: an under-estimated fetch that turned out
        over-threshold must not stay resident past the byte bound its
        floor-protected fetch just pierced), then re-run the bounded
        eviction with no floor so the cache is back inside its budget."""
        for t in lemmas:
            if t in self._term_cache:
                del self._term_cache[t]
                self._cache_total -= self._cache_nb.pop(t, 0)
        self._evict(0)

    def _drop_pos(self, forms: list[str]) -> None:
        """Positional twin of :meth:`_drop_terms`."""
        for t in forms:
            if t in self._pos_cache:
                del self._pos_cache[t]
                self._pos_total -= self._pos_nb.pop(t, 0)
        self._evict_pos(0)

    def _evict_pos(self, floor: int) -> None:
        """Positional-cache LRU eviction (same bounds discipline as
        :meth:`_evict`: entry count AND total compressed bytes, never below
        the current working set)."""
        while len(self._pos_cache) > floor and (
            len(self._pos_cache) > self._pos_cache_size
            or self._pos_total > self._pos_cache_bytes
        ):
            lemma, _ = self._pos_cache.popitem(last=False)
            self._pos_total -= self._pos_nb.pop(lemma, 0)

    def _fetch_positions(self, fetch: list[str], floor: int = 0) -> None:
        """One bucket-pruned collect of ``fetch`` forms' positional postings;
        cache them DECODED per (form, segment) — a repeated phrase costs
        neither a Spark job nor a varbyte decode.  Byte accounting uses the
        compressed stream lengths (symmetric with the term cache).  Callers
        route over-estimate forms away BEFORE calling (phrase_rows/prefetch
        do) — this function itself does not guard."""
        from .positions import decode_term_positions, read_positions

        seg_size = int(self.meta["seg_size"])
        rows = read_positions(self.spark, self.index_dir, fetch).collect()
        by_lemma: dict[str, list] = {t: [] for t in fetch}
        for r in rows:
            by_lemma[r["lemma"]].append(r)
        for lemma, rs in by_lemma.items():
            entries = []
            for r in rs:
                docs, counts, flat = decode_term_positions(
                    r["pdocs"], r["pcounts"], r["pstream"])
                base = int(r["segment"]) * seg_size
                # per-OCCURRENCE local doc ids, aligned with flat positions —
                # exactly the decoded shape _intersect_slots consumes
                occ = np.repeat(docs - base, counts)
                mx = int(flat.max()) if flat.size else 0
                nb = len(r["pdocs"]) + len(r["pcounts"]) + len(r["pstream"])
                entries.append((int(r["segment"]), occ, flat, mx, nb))
            self._pos_total -= self._pos_nb.pop(lemma, 0)
            self._pos_cache[lemma] = entries
            nb = sum(e[4] for e in entries)
            self._pos_nb[lemma] = nb
            self._pos_total += nb
        self._evict_pos(floor)

    def phrase_rows(self, phrase: str, k: int = 10, site: str | None = None,
                    local_threshold_bytes: int = 64 << 20,
                    ) -> list[tuple[int, int]]:
        """Warm phrase serving over the positional sidecar: (doc_id,
        phrase_tf) pairs, row-identical to
        :func:`positions.phrase_topk_positions` (parity-tested) — but a
        repeated phrase (or one whose forms an earlier phrase warmed) costs
        NO Spark job: slot postings come from the engine's positional LRU
        and the intersection runs driver-side in numpy.

        Same routing discipline as :meth:`topk_rows`: a phrase whose
        dict-estimated positional postings exceed ``local_threshold_bytes``
        is served by the distributed path WITHOUT collecting them (est =
        dictionary df × the sidecar's measured bytes-per-posting; a form's
        positional df equals its index df), with the post-fetch actual-size
        check as the backstop for under-estimates and for sidecars built
        before the stats existed."""
        from ..analyzer import analyze_positions
        from .positions import (
            _intersect_slots,
            has_positions,
            phrase_topk_positions,
        )

        self._check_fresh()
        if not has_positions(self.index_dir):
            raise ValueError(
                "positional sidecar missing or stale (a rebuild clears "
                "meta.has_positions) — run build_positions first, or use "
                "the store-verify path")
        qpat = [frozenset(p) for p in analyze_positions(phrase, *self._ana)]
        if not qpat:
            return []
        intervals = self._site(site)
        if site is not None and not intervals:
            return []  # unknown site owns no pages
        forms = sorted({f for fs in qpat for f in fs})

        def _distributed() -> list[tuple[int, int]]:
            out = phrase_topk_positions(
                self.spark, self.index_dir, phrase, k, site=site).collect()
            return [(r["doc_id"], r["phrase_tf"]) for r in out]

        fetch = [t for t in forms if t not in self._pos_cache]
        for t in forms:
            if t in self._pos_cache:
                self._pos_cache.move_to_end(t)
        if fetch:
            if (self._pos_bytes is None
                    or self._pos_bytes > local_threshold_bytes):
                gdf = self._gdf_for(forms)
                if gdf is not None:
                    est = sum(
                        self._pos_nb[t] if t in self._pos_cache
                        else gdf.get(t, 0) * self._pos_bpp
                        for t in forms
                    )
                    if est > local_threshold_bytes:
                        return _distributed()
            self._fetch_positions(fetch, floor=len(forms))
        if sum(self._pos_nb.get(t, 0) for t in forms) > local_threshold_bytes:
            # under-estimate / legacy-sidecar backstop: route distributed,
            # and drop the just-fetched oversized entries so they don't sit
            # floor-pinned past pos_cache_bytes until a later fetch evicts
            if fetch:
                self._drop_pos(fetch)
            return _distributed()

        seg_size = int(self.meta["seg_size"])
        live = (_overlapping_segments(intervals, seg_size)
                if intervals else None)
        by_seg: dict[int, dict[str, tuple]] = {}
        maxp: dict[int, int] = {}
        for t in forms:
            for seg, occ, flat, mx, _ in self._pos_cache.get(t, ()):
                if live is not None and seg not in live:
                    continue  # site intervals cannot reach this segment
                by_seg.setdefault(seg, {})[t] = (occ, flat)
                maxp[seg] = max(maxp.get(seg, 0), mx)
        merged_ids: list[np.ndarray] = []
        merged_tf: list[np.ndarray] = []
        for seg, decoded in by_seg.items():
            K = maxp[seg] + 2
            acc = _intersect_slots(qpat, decoded, K)
            if acc is None or acc.size == 0:
                continue
            ids, tf = np.unique(seg * seg_size + acc // K, return_counts=True)
            if intervals is not None:
                keep = np.isin(ids, _mask_ids(ids, intervals))
                ids, tf = ids[keep], tf[keep]
            merged_ids.append(ids)
            merged_tf.append(tf)
        if not merged_ids:
            return []
        ids = np.concatenate(merged_ids)
        tf = np.concatenate(merged_tf)
        order = np.lexsort((ids, -tf))[:k]
        return list(zip(ids[order].tolist(), tf[order].tolist()))

    def phrase_rows_batch(self, phrases: dict[str, str], k: int = 10,
                          sites: dict[str, str] | None = None,
                          local_threshold_bytes: int = 64 << 20,
                          ) -> dict[str, list[tuple[int, int]]]:
        """Whole phrase workload, batch-warm (r4 VERDICT item 3): ONE
        guarded positional fetch warms the union of every phrase's forms
        (the same dict-df × bytes-per-posting discipline as
        :meth:`prefetch`), then every phrase serves DRIVER-SIDE from the
        warm cache — the offline-eval symmetric of :meth:`topk_batch`.
        Returns {qid: [(doc_id, phrase_tf), ...]}, per qid row-identical
        to :meth:`phrase_rows` (parity-tested).

        A phrase whose forms the guard skipped (estimate over threshold)
        routes to the distributed positional path individually, exactly as
        the single path would — the batch never collects oversized
        postings onto the broker.  Per-qid ``sites`` resolve through the
        engine's interval cache, warmed here alongside the forms."""
        self._check_fresh()
        self.prefetch([], sites=sorted({s for s in (sites or {}).values()}),
                      local_threshold_bytes=local_threshold_bytes,
                      phrases=[phrases[q] for q in sorted(phrases)])
        return {
            qid: self.phrase_rows(
                phrases[qid], k, site=(sites or {}).get(qid),
                local_threshold_bytes=local_threshold_bytes)
            for qid in sorted(phrases)
        }

    def prefetch(self, queries: list[str], sites: list[str] | None = None,
                 local_threshold_bytes: int = 64 << 20,
                 phrases: list[str] | None = None) -> int:
        """Warm the term cache for a whole query suite in ONE bucket-pruned
        Spark job (round-4 backlog: cold first-query latency is one pruned
        collect per query; a broker restart re-warms its expected workload
        in a single scan instead).  Returns the number of lemmas fetched
        (term + positional forms).

        Honors the same byte discipline as :meth:`topk_rows`: a term whose
        dict-estimated postings exceed ``local_threshold_bytes`` is SKIPPED
        (queries using it route to the distributed path anyway, so warming
        it would only pull oversized bytes onto the broker), and the fetch
        never exceeds the engine's LRU byte budget by more than the suite's
        own (pre-checked) working set.  ``sites`` additionally warms the
        site-interval cache so site-scoped queries skip their sidecar read.
        ``phrases`` warms the POSITIONAL cache the same way (one extra
        pruned collect over the sidecar, per-form byte estimates from the
        sidecar's measured bytes-per-posting) so a phrase workload's first
        queries are as warm as its repeats."""
        self._check_fresh()
        for s in sites or ():
            self._site(s)
        lemmas = sorted({t for q in queries for t in analyze(q, *self._ana)})
        fetch = []
        for t in lemmas:
            if t in self._term_cache:
                self._term_cache.move_to_end(t)  # suite terms must survive
            else:                                # the post-fetch eviction
                fetch.append(t)
        n_fetched = 0
        if fetch:
            gdf = None
            if (self._index_bytes is None
                    or self._index_bytes > local_threshold_bytes):
                gdf = self._gdf_for(fetch)
                if gdf is not None:
                    fetch = [t for t in fetch if gdf.get(t, 0) * self._bpp
                             <= local_threshold_bytes]
            if fetch:
                self._fetch_terms(fetch, floor=len(lemmas), gdf_hint=gdf)
            n_fetched += len(fetch)

        if phrases:
            from ..analyzer import analyze_positions
            from .positions import has_positions

            if has_positions(self.index_dir):
                forms = sorted({f for ph in phrases
                                for fs in analyze_positions(ph, *self._ana)
                                for f in fs})
                pfetch = []
                for t in forms:
                    if t in self._pos_cache:
                        self._pos_cache.move_to_end(t)
                    else:
                        pfetch.append(t)
                if pfetch and (
                        self._pos_bytes is None
                        or self._pos_bytes > local_threshold_bytes):
                    gdf = self._gdf_for(pfetch)
                    if gdf is not None:
                        pfetch = [t for t in pfetch
                                  if gdf.get(t, 0) * self._pos_bpp
                                  <= local_threshold_bytes]
                if pfetch:
                    self._fetch_positions(pfetch, floor=len(forms))
                n_fetched += len(pfetch)
        return n_fetched

    def topk_rows(self, query: str, k: int = 10, mode: str = "auto",
                  conjunctive: bool = False,
                  local_threshold_bytes: int = 64 << 20,
                  site: str | None = None,
                  offset: int = 0) -> list[tuple[int, float]]:
        """Serving fast path: collect the (pruned, tiny) term rows to the
        driver and score them locally in numpy — one cheap collect instead
        of a shuffle + applyInPandas stage.  Falls back to the distributed
        path when the query's postings exceed ``local_threshold_bytes``
        (broker-style: small working sets score on the broker, big ones on
        the workers).  The size check runs BEFORE any posting bytes move:
        a term's footprint is estimated as dict-df × the build's
        bytes-per-posting, so a common term at 10^12 docs (GBs of postings)
        is routed to the workers without ever being collected — the r3
        fetch-before-guard hole.  The post-fetch actual-size guard stays as
        the backstop for under-estimates (and for legacy indexes without a
        dictionary, where no estimate is possible).  Exactness is
        identical: same segment_topk code."""
        self._check_fresh()
        if offset < 0:
            raise ValueError("offset must be >= 0")
        qlemmas = sorted(set(analyze(query, *self._ana)))
        if not qlemmas:
            return []
        intervals = self._site(site)
        if site is not None and not intervals:
            return []  # unknown site owns no pages
        kk = k + offset
        # driver-side LRU term cache: index immutable per fingerprint, so a
        # term's rows (postings bytes + blocks) are collected once and
        # repeated terms cost no Spark job at all; bounded by entry count
        # AND bytes so the cache never grows O(vocabulary) or O(hot-term)
        fetch = [t for t in qlemmas if t not in self._term_cache]
        for t in qlemmas:
            if t in self._term_cache:
                self._term_cache.move_to_end(t)
        if fetch:
            gdf = None
            if (self._index_bytes is None
                    or self._index_bytes > local_threshold_bytes):
                # dict rows only — no posting bytes move for the estimate
                gdf = self._gdf_for(qlemmas)
            if gdf is not None:
                est = sum(
                    self._cache_nb[t] if t in self._term_cache
                    else gdf.get(t, 0) * self._bpp
                    for t in qlemmas
                )
                if est > local_threshold_bytes:
                    out = bm25_topk(
                        self.spark, self.index_dir, query, k, mode=mode,
                        conjunctive=conjunctive, index_df=self.index_df,
                        gdf_override=gdf or None, site=site, offset=offset,
                        site_intervals=intervals,
                    ).collect()
                    return [(r["doc_id"], r["score"]) for r in out]
            self._fetch_terms(fetch, floor=len(qlemmas), gdf_hint=gdf)
        entries = [e for t in qlemmas for e in self._term_cache.get(t, ())]
        if not entries:
            return []
        total = sum(nb for _, _, _, nb in entries)
        if total > local_threshold_bytes:
            # under-estimate backstop: route distributed, and drop the
            # just-fetched oversized entries so they don't sit floor-pinned
            # past term_cache_bytes until a later fetch evicts them
            if fetch:
                self._drop_terms(fetch)
            out = self.topk(query, k, mode, conjunctive,
                            site=site, offset=offset).collect()
            return [(r["doc_id"], r["score"]) for r in out]
        n_terms = len({lemma for lemma, _, _, _ in entries})
        live_segs = (_overlapping_segments(intervals, int(self.meta["seg_size"]))
                     if intervals else None)
        by_seg: dict[int, list[tuple[str, TermPostings]]] = {}
        for lemma, seg, tp, _ in entries:
            if live_segs is not None and seg not in live_segs:
                continue  # site intervals cannot reach this segment
            by_seg.setdefault(seg, []).append((lemma, tp))
        merged: list[tuple[int, float]] = []
        for seg_terms in by_seg.values():
            if conjunctive and len({lm for lm, _ in seg_terms}) < n_terms:
                continue
            ids, scores = segment_topk_terms(
                [tp for _, tp in seg_terms], self.meta["n_docs"],
                self.meta["avgdl"], kk, self.meta["k1"], self.meta["b"],
                mode, conjunctive, intervals,
            )
            merged.extend(zip(ids.tolist(), scores.tolist()))
        merged.sort(key=lambda t: (-t[1], t[0]))
        return merged[offset:kk]


def bm25_topk_batch(spark: SparkSession, index_dir: str,
                    queries: dict[str, str], k: int = 10,
                    mode: str = "auto", conjunctive: bool = False,
                    index_df: DataFrame | None = None,
                    gdf_override: dict[str, int] | None = None,
                    sites: dict[str, str] | None = None,
                    offsets: dict[str, int] | None = None,
                    site_intervals: dict[str, list[tuple[int, int]]] | None = None,
                    ) -> DataFrame:
    """Score a whole query WORKLOAD in one Spark job: (qid, doc_id, score).

    Per-query distributed serving pays one scheduled job per query — fine
    interactively, wasteful for offline workloads (relevance sweeps, eval
    suites, training-data mining at 100 TB) where thousands of queries hit
    the same index.  This path amortizes everything that is per-job:

    - ONE bucket-pruned index scan covers the union of all query lemmas
      (partition pruning on bucket= exactly as the single path);
    - ONE pruned dictionary lookup fetches every lemma's global df;
    - inside each segment group the per-lemma ``TermPostings`` is built
      ONCE and shared across every query that uses the term — the varbyte
      decode cost is per (segment, distinct lemma), not per query;
    - the per-query top-k merge is one tiny shuffle of
      O(queries x segments x k) rows, window-ranked by qid.

    Semantics per query are identical to :func:`bm25_topk` (same
    ``segment_topk_terms`` code, same AND behavior: terms absent from the
    whole index drop out of the conjunction exactly like the single path,
    mirroring the reference's loop over lemmas found in the DB —
    SearchServiceImpl.java:122-143); the parity test asserts row-identity
    against the single-query path for every qid, both modes.

    ``sites``/``offsets`` (each ``qid -> value``, both optional per qid)
    complete the reference search API on the batch path too: a qid's site
    scope becomes the same doc_id interval mask the single path uses
    (masked candidate generation inside each segment — pruning stays
    exact), and its offset is served by taking top-(offset+k) per segment
    then window-ranking ``offset < rank <= offset+k`` per qid.  When every
    qid is site-scoped the index scan itself is pruned to the union of
    their overlapping segments.  ``site_intervals`` (site -> intervals)
    short-circuits sidecar reads for callers that cache them
    (QueryEngine)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .builder import read_index, read_site_ranges

    with open(f"{index_dir}/meta.json") as fh:
        meta = json.load(fh)
    from .builder import index_analyzer

    ana = index_analyzer(spark, index_dir, meta)
    qmap = {qid: sorted(set(analyze(q, *ana))) for qid, q in queries.items()}
    qmap = {qid: ls for qid, ls in qmap.items() if ls}
    out_schema = "qid string, doc_id long, score double"
    empty = spark.createDataFrame([], out_schema)

    sites = sites or {}
    if any(int(v) < 0 for v in (offsets or {}).values()):
        raise ValueError("offsets must be >= 0")
    offsets = {qid: int(v) for qid, v in (offsets or {}).items() if v}
    iv_cache: dict[str, list[tuple[int, int]]] = dict(site_intervals or {})
    qiv: dict[str, list[tuple[int, int]] | None] = {}
    for qid in list(qmap):
        s = sites.get(qid)
        if s is None:
            qiv[qid] = None
            continue
        if s not in iv_cache:
            iv_cache[s] = read_site_ranges(spark, index_dir, s)
        if not iv_cache[s]:
            del qmap[qid]  # unknown site owns no pages (single-path parity)
        else:
            qiv[qid] = iv_cache[s]
    if not qmap:
        return empty
    all_lemmas = sorted({t for ls in qmap.values() for t in ls})

    if index_df is not None:
        idx = index_df.filter(F.col("lemma").isin(all_lemmas))
    else:
        idx = read_index(spark, index_dir, all_lemmas)
    seg_size = int(meta["seg_size"])
    qsegs = {qid: (_overlapping_segments(iv, seg_size) if iv else None)
             for qid, iv in qiv.items()}
    if all(sg is not None for sg in qsegs.values()):
        # every query is site-scoped: partition-prune the shared scan to the
        # union of their live segments (same pruning as the single path)
        union = sorted(set().union(*qsegs.values()))
        idx = idx.filter(F.col("segment").isin(union))
    if gdf_override is not None:
        gdf = gdf_override
    else:
        gdf = dict(gdf_lookup(spark, index_dir, all_lemmas, meta))
        if not gdf:
            gdf = {r["lemma"]: r["gdf"] for r in
                   idx.groupBy("lemma").agg(F.sum("df").alias("gdf")).collect()}
    if not gdf:
        return empty
    n_docs, avgdl, k1, b = meta["n_docs"], meta["avgdl"], meta["k1"], meta["b"]
    # AND arity per query counts only terms that exist SOMEWHERE in the
    # index (single-path parity: its n_terms = len(gdf) of found terms)
    n_terms_q = {qid: sum(1 for t in ls if t in gdf) for qid, ls in qmap.items()}

    kk_q = {qid: k + offsets.get(qid, 0) for qid in qmap}

    def _seg(pdf):
        import pandas as pd

        seg = int(pdf["segment"].iloc[0])
        tps: dict[str, TermPostings] = {}
        for r in pdf.itertuples():
            tps[r.lemma] = TermPostings(r.postings, r.tfs, r.dls, r.blocks,
                                        int(gdf[r.lemma]))
        out_q: list[str] = []
        out_d: list[int] = []
        out_s: list[float] = []
        for qid, lemmas in qmap.items():
            live = qsegs[qid]
            if live is not None and seg not in live:
                continue  # qid's site intervals cannot reach this segment
            terms = [tps[t] for t in lemmas if t in tps]
            if not terms:
                continue
            if conjunctive and len(terms) < n_terms_q[qid]:
                continue  # a required term is absent from this segment
            ids, scores = segment_topk_terms(
                terms, n_docs, avgdl, kk_q[qid], k1, b, mode, conjunctive,
                qiv[qid])
            out_q.extend([qid] * ids.size)
            out_d.extend(ids.tolist())
            out_s.extend(scores.tolist())
        return pd.DataFrame({"qid": out_q, "doc_id": out_d, "score": out_s})

    local = idx.groupBy("segment").applyInPandas(_seg, schema=out_schema)
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = local.withColumn("_rk", F.row_number().over(w))
    if offsets:
        # per-qid pagination: broadcast-join the tiny (qid, offset) side and
        # keep offset < rank <= offset + k for each query
        off_df = spark.createDataFrame(
            [(qid, offsets.get(qid, 0)) for qid in qmap],
            "qid string, _off int")
        ranked = (
            ranked.join(F.broadcast(off_df), "qid")
            .filter((F.col("_rk") > F.col("_off"))
                    & (F.col("_rk") <= F.col("_off") + k))
            .drop("_off")
        )
    else:
        ranked = ranked.filter(F.col("_rk") <= k)
    return (
        ranked.drop("_rk")
        .orderBy("qid", F.desc("score"), F.asc("doc_id"))
    )


def bm25_topk(spark: SparkSession, index_dir: str, query: str, k: int = 10,
              mode: str = "maxscore", conjunctive: bool = False,
              index_df: DataFrame | None = None,
              gdf_override: dict[str, int] | None = None,
              site: str | None = None, offset: int = 0,
              site_intervals: list[tuple[int, int]] | None = None) -> DataFrame:
    """Distributed top-k: partition-pruned index read -> per-segment numpy
    top-k (applyInPandas) -> global ordered merge.

    ``index_df``: pass a cached ``read_index(spark, dir)`` DataFrame to
    amortize the scan across many queries (warm-path latency).

    ``site``/``offset`` complete the reference search API
    (ApiController.java `GET /api/search?query&site&offset&limit`): the
    site scope is the builder's (repo -> doc_id intervals) sidecar masked
    into per-segment candidate generation — no join against a docs table —
    and offset is served by taking top-(offset+k) per segment, then global
    OFFSET/LIMIT.  ``site_intervals`` short-circuits the sidecar read for
    callers that cache it (QueryEngine)."""
    from pyspark.sql import functions as F

    from .builder import read_index, read_site_ranges

    if offset < 0:
        raise ValueError("offset must be >= 0")
    with open(f"{index_dir}/meta.json") as fh:
        meta = json.load(fh)
    from .builder import index_analyzer

    qlemmas = sorted(set(analyze(query, *index_analyzer(spark, index_dir,
                                                        meta))))
    empty = spark.createDataFrame([], "doc_id long, score double")
    if not qlemmas:
        return empty
    intervals = site_intervals
    if site is not None and intervals is None:
        intervals = read_site_ranges(spark, index_dir, site)
    if site is not None and not intervals:
        return empty  # unknown site owns no pages

    if index_df is not None:
        base = index_df.filter(F.col("lemma").isin(qlemmas))
    else:
        base = read_index(spark, index_dir, qlemmas)
    idx = base
    if intervals:
        # partition pruning on segment=: a site's docs live only in the
        # segments its intervals overlap
        segs = sorted(_overlapping_segments(intervals, int(meta["seg_size"])))
        idx = idx.filter(F.col("segment").isin(segs))
    # global df per lemma: preloaded dict (QueryEngine) > pruned read of the
    # build-time dictionary artifact > aggregate over index rows (legacy).
    # The legacy aggregate runs over the UNscoped rows: df (hence idf) is a
    # corpus-global statistic — summing only the site's segments would score
    # the same query differently per serving path.
    if gdf_override is not None:
        gdf = gdf_override
    else:
        gdf = dict(gdf_lookup(spark, index_dir, qlemmas, meta))
        if not gdf:
            gdf = {r["lemma"]: r["gdf"] for r in
                   base.groupBy("lemma").agg(F.sum("df").alias("gdf")).collect()}
    if not gdf:
        return empty
    n_docs, avgdl, k1, b = meta["n_docs"], meta["avgdl"], meta["k1"], meta["b"]
    n_terms = len(gdf)

    def _seg(pdf):
        import pandas as pd

        if conjunctive and pdf["lemma"].nunique() < n_terms:
            return pd.DataFrame({"doc_id": [], "score": []}).astype(
                {"doc_id": "int64", "score": "float64"}
            )
        rows = [
            {"df": int(gdf[r.lemma]), "postings": r.postings, "tfs": r.tfs,
             "dls": r.dls, "blocks": r.blocks}
            for r in pdf.itertuples()
        ]
        ids, scores = segment_topk(rows, n_docs, avgdl, k + offset, k1, b,
                                   mode, conjunctive, intervals)
        return pd.DataFrame({"doc_id": ids, "score": scores})

    local = idx.groupBy("segment").applyInPandas(_seg, schema="doc_id long, score double")
    ordered = local.orderBy(F.desc("score"), F.asc("doc_id"))
    return ordered.offset(offset).limit(k) if offset else ordered.limit(k)
