"""URL-seen set (SURVEY.md §2.B E4/E5): the frontier's membership state.

Three layers, composed:

1. **Exact oracle**: ``left_anti`` join against the seen table — always
   correct, one shuffle on url. This is the correctness baseline and the
   verifier for the probabilistic paths.
2. **Partitioned Bloom blobs**: the 10^10-URL design. The seen set is held
   as one Bloom bitmap *per host-hash bucket* (BinaryType blob per bucket,
   built with ``applyInPandas``), so membership state is distributed,
   incrementally mergeable (bitwise OR), and probed via a co-partitioned
   (or broadcast, while small) join + vectorized numpy bit-test — never a
   driver-side filter. Spark's own ``DataFrame.stat.bloomFilter`` builds one
   driver-resident filter (rejected: 10^10 urls @ 1% fpp ≈ 12 GB on the
   driver); per-bucket blobs scale horizontally with the bucket count.
   Bloom guarantees no false negatives, so ``definitely_new`` is safe to
   fetch directly; the ``maybe_seen`` remainder (~fpp of candidates) goes
   through the exact anti-join — the expensive join shrinks by ~100x.
3. **Cuckoo-filter fallback** (E5): same partitioned-blob layout but
   supporting deletion (bucketed fingerprints), for recrawl semantics where
   urls age out of the seen set.

All hashing is seed-pinned (pandas siphash with fixed keys) so blobs built
on any executor are identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

BLOOM_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("blob", BinaryType(), False),
        StructField("n_items", LongType(), False),
    ]
)

_HASH_KEY_1 = "warcsparkbloomh1"
_HASH_KEY_2 = "warcsparkbloomh2"


def _hash2(urls: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    arr = urls.astype(object).to_numpy()
    h1 = pd.util.hash_array(arr, hash_key=_HASH_KEY_1)
    h2 = pd.util.hash_array(arr, hash_key=_HASH_KEY_2)
    return h1, h2


def bucket_of(url_col, n_buckets: int, key: str = "host"):
    """Deterministic bucket for membership state (JVM-side, xxhash64).

    ``key="host"`` (default) co-locates a host's urls with its blob —
    natural for politeness-adjacent locality, but an adversarially hot
    host (30% of the frontier on one host) lands 30% of the state and
    build work in ONE bucket by design. ``key="url"`` hashes the full
    url: buckets stay balanced under ANY host distribution (membership
    correctness only needs url -> deterministic bucket; nothing about
    the host is required). The key is part of the state geometry — blobs
    built under one key cannot be probed under the other (validated at
    frontier resume alongside n_buckets/m_bits)."""
    if key == "url":
        return F.pmod(F.xxhash64(url_col), F.lit(n_buckets)).cast("int")
    host = F.lower(F.regexp_extract(url_col, r"//([^/:?#]+)", 1))
    return F.pmod(F.xxhash64(host), F.lit(n_buckets)).cast("int")


def _bit_positions(h1: np.ndarray, h2: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(n, k) bit positions via double hashing h1 + i*h2 mod m."""
    i = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(
            np.int64
        )


class BloomSeenSet:
    """Partitioned-Bloom membership state.

    Parameters are explicit: ``m_bits`` per bucket and ``k`` hashes; at
    10^10 urls over 65k buckets that is ~150k urls/bucket → m_bits=2**21
    (256 KiB/blob, 16 GB total across the cluster) for ~1% fpp with k=7.
    Sandbox defaults are smaller but the layout is identical.
    """

    def __init__(
        self,
        n_buckets: int = 64,
        m_bits: int = 1 << 17,
        k: int = 7,
        bucket_key: str = "host",
    ):
        assert m_bits % 8 == 0
        assert bucket_key in ("host", "url")
        self.n_buckets = n_buckets
        self.m_bits = m_bits
        self.k = k
        self.bucket_key = bucket_key

    # -- build ----------------------------------------------------------
    def build_blobs(self, urls: DataFrame, url_col: str = "url") -> DataFrame:
        """urls -> one (bucket, blob, n_items) row per bucket. One shuffle
        on bucket; blob build is vectorized numpy inside applyInPandas."""
        m_bits, k = self.m_bits, self.k

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            arr = np.zeros(m_bits // 8, dtype=np.uint8)
            h1, h2 = _hash2(pdf["_url"])
            pos = _bit_positions(h1, h2, k, m_bits).ravel()
            np.bitwise_or.at(arr, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
            return pd.DataFrame(
                {
                    "bucket": [int(pdf["_bucket"].iloc[0])],
                    "blob": [arr.tobytes()],
                    "n_items": [len(pdf)],
                }
            )

        return (
            urls.select(
                F.col(url_col).alias("_url"),
                bucket_of(F.col(url_col), self.n_buckets, self.bucket_key).alias("_bucket"),
            )
            .groupBy("_bucket")
            .applyInPandas(build, BLOOM_SCHEMA)
        )

    def compact(self, blobs: DataFrame) -> DataFrame:
        """OR-merge a blob table that may hold several rows per bucket
        (e.g. the union of many checkpointed deltas) into one row/bucket.
        One shuffle on bucket; the OR is vectorized numpy."""
        m_bytes = self.m_bits // 8

        def merge(pdf: pd.DataFrame) -> pd.DataFrame:
            acc = np.zeros(m_bytes, dtype=np.uint8)
            n = 0
            for blob, cnt in zip(pdf["blob"], pdf["n_items"]):
                if blob is not None:
                    acc |= np.frombuffer(bytes(blob), dtype=np.uint8)
                    n += int(cnt)
            return pd.DataFrame(
                {"bucket": [int(pdf["bucket"].iloc[0])], "blob": [acc.tobytes()], "n_items": [n]}
            )

        return blobs.groupBy("bucket").applyInPandas(merge, BLOOM_SCHEMA)

    def merge_blobs(self, a: DataFrame, b: DataFrame) -> DataFrame:
        """Incremental state update: bitwise-OR blobs bucket-wise (full
        outer on bucket; missing side contributes an empty bitmap)."""
        return self.compact(a.unionByName(b))

    # -- probe ----------------------------------------------------------
    def probe(
        self,
        candidates: DataFrame,
        blobs: DataFrame,
        url_col: str = "url",
        broadcast: bool = True,
    ) -> DataFrame:
        """Adds ``maybe_seen: boolean``. Join on bucket (``broadcast=True``
        while the blob table is small; with ``broadcast=False`` both sides
        hash-partition on bucket so the join is co-located and the blob
        state NEVER collects to one node — the 10^10-URL path), then numpy
        bit-test per batch.

        Parallelism note (VERDICT r3): the ``groupBy(bucket)`` caps probe
        tasks at ``n_buckets`` — at the documented 10^10-URL geometry
        (65k buckets) that exceeds any cluster's core count, but do NOT
        ship the sandbox default (64) at scale: size n_buckets >= a few x
        total executor cores."""
        m_bits, k = self.m_bits, self.k

        def test(pdf: pd.DataFrame) -> pd.DataFrame:
            out = np.zeros(len(pdf), dtype=bool)
            if len(pdf):
                blob = pdf["blob"].iloc[0]
                if blob is not None:
                    arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                    h1, h2 = _hash2(pdf[url_col])
                    pos = _bit_positions(h1, h2, k, m_bits)
                    bits = (arr[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
                    out = bits.all(axis=1)
            res = pdf.drop(columns=["blob", "n_items"]).copy()
            res["maybe_seen"] = out
            return res

        from pyspark.sql.types import BooleanType

        with_bucket = candidates.withColumn(
            "bucket", bucket_of(F.col(url_col), self.n_buckets, self.bucket_key)
        )
        out_schema = StructType(
            list(with_bucket.schema.fields) + [StructField("maybe_seen", BooleanType())]
        )
        blob_side = F.broadcast(blobs) if broadcast else blobs
        joined = with_bucket.join(blob_side, on="bucket", how="left")
        return (
            joined.groupBy("bucket")
            .applyInPandas(test, out_schema)
            .drop("bucket")
        )

    # -- broadcast-map probe (the small-state fast path) -----------------
    def collect_blob_map(self, blobs: DataFrame) -> dict[int, bytes]:
        """Materialize the blob table as a driver dict {bucket: blob}. Used
        while total blob bytes are broadcast-sized (sandbox / small-cluster
        path); at 10^10-URL scale ``probe`` keeps the state distributed."""
        return {int(r["bucket"]): bytes(r["blob"]) for r in blobs.collect()}

    @staticmethod
    def merge_blob_map(
        blob_map: dict[int, bytes], new_blobs_rows: list
    ) -> dict[int, bytes]:
        """Driver-side incremental OR of freshly-built blobs into the map
        (mirrors merge_blobs; the written state stays distributed)."""
        out = dict(blob_map)
        for r in new_blobs_rows:
            b = int(r["bucket"])
            blob = bytes(r["blob"])
            if b in out:
                a = np.frombuffer(out[b], dtype=np.uint8) | np.frombuffer(
                    blob, dtype=np.uint8
                )
                out[b] = a.tobytes()
            else:
                out[b] = blob
        return out

    def probe_with_map(
        self, candidates: DataFrame, blob_map_bc, url_col: str = "url"
    ) -> DataFrame:
        """Adds ``maybe_seen`` via a *broadcast* of the blob map — zero
        shuffle of the candidate side (vs ``probe``'s co-partitioned join).
        ``blob_map_bc`` is a ``sc.broadcast({bucket: blob_bytes})``."""
        m_bits, k = self.m_bits, self.k

        def test(url: pd.Series, bucket: pd.Series) -> pd.Series:
            mp = blob_map_bc.value
            out = pd.Series(False, index=url.index)
            if mp and len(url):
                for b, grp in url.groupby(bucket.to_numpy()):
                    blob = mp.get(int(b))
                    if blob is None:
                        continue
                    arr = np.frombuffer(blob, dtype=np.uint8)
                    h1, h2 = _hash2(grp)
                    pos = _bit_positions(h1, h2, k, m_bits)
                    bits = (arr[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
                    out.loc[grp.index] = bits.all(axis=1)
            return out

        from pyspark.sql.types import BooleanType

        udf = F.pandas_udf(test, BooleanType())
        return candidates.withColumn(
            "maybe_seen",
            udf(F.col(url_col), bucket_of(F.col(url_col), self.n_buckets, self.bucket_key)),
        )

    def filter_new(
        self,
        candidates: DataFrame,
        blobs: DataFrame | None,
        seen_exact: DataFrame | None,
        url_col: str = "url",
    ) -> DataFrame:
        """The composed scale path: bloom-prefilter, then exact anti-join
        only for the maybe-seen sliver. With no blobs yet, pure exact path.
        Result: candidate rows that are definitely not in the seen set."""
        if blobs is None:
            if seen_exact is None:
                return candidates
            return candidates.join(
                seen_exact.select(F.col(url_col)), on=url_col, how="left_anti"
            )
        probed = self.probe(candidates, blobs, url_col)
        definitely_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
        maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
        if seen_exact is not None:
            rescued = maybe.join(
                seen_exact.select(F.col(url_col)), on=url_col, how="left_anti"
            )
            return definitely_new.unionByName(rescued)
        return definitely_new


def exact_new_urls(
    candidates: DataFrame, seen: DataFrame, url_col: str = "url"
) -> DataFrame:
    """The exact-oracle membership filter: one left_anti shuffle join."""
    return candidates.join(seen.select(F.col(url_col)), on=url_col, how="left_anti")


# ---------------------------------------------------------------------------
# Cuckoo filter (deletion-capable fallback, E5)
# ---------------------------------------------------------------------------

CUCKOO_SCHEMA = BLOOM_SCHEMA  # same (bucket, blob, n_items) layout


class CuckooSeenSet:
    """Partitioned cuckoo filter: per host-hash bucket, a table of
    ``n_slots`` uint16 fingerprints in ``buckets_per_table x 4`` layout.
    Supports delete (recrawl). Kernel is numpy; the insert loop relocates
    at most ``max_kicks`` times per item (batch-level Python, not per-row
    Spark)."""

    # bucket-derivation versioning (ADVICE r4): checkpointed cuckoo_state
    # blobs are only probe-compatible with the scheme that wrote them.
    # Bump whenever _hash_fp_idx changes how fp/idx derive from the url;
    # the frontier stamps this into every batch manifest and rebuilds the
    # blobs from the seen log on mismatch (or absence = pre-stamp legacy).
    # "keyhigh-v2": fp = low 16 bits, idx = high bits, of ONE KEY_1 hash
    # (r4 single-pass derivation; v1 used an independent KEY_2 hash for idx).
    HASH_SCHEME = "keyhigh-v2"

    def __init__(
        self,
        n_buckets: int = 64,
        table_buckets: int = 1 << 12,
        max_kicks: int = 200,
        bucket_key: str = "host",
    ):
        assert bucket_key in ("host", "url")
        # the xor alt-index is only an involution for power-of-two tables
        assert table_buckets & (table_buckets - 1) == 0
        self.n_buckets = n_buckets
        self.table_buckets = table_buckets
        self.max_kicks = max_kicks
        self.bucket_key = bucket_key

    def _hash_fp_idx(self, urls: pd.Series) -> tuple[np.ndarray, np.ndarray]:
        """ONE siphash pass per batch (r4: was two): fingerprint from the
        low 16 bits, primary bucket from the remaining bits — disjoint bit
        ranges of the same 64-bit hash, the standard cuckoo-filter
        derivation. Probe/insert/delete all flow through here, so the
        filter stays self-consistent."""
        h = pd.util.hash_array(urls.astype(object).to_numpy(), hash_key=_HASH_KEY_1)
        fp = (h & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 = empty slot
        idx = ((h >> np.uint64(16)) % np.uint64(self.table_buckets)).astype(np.int64)
        return fp, idx

    def _fingerprint(self, urls: pd.Series) -> np.ndarray:
        return self._hash_fp_idx(urls)[0]

    def _index(self, urls: pd.Series) -> np.ndarray:
        return self._hash_fp_idx(urls)[1]

    def _fp_lut(self) -> np.ndarray:
        """hash(fingerprint) for every possible uint16 fingerprint — 512 KiB
        computed once per instance. Turns the alt-index derivation (and
        each cuckoo kick) into a table lookup instead of a siphash call."""
        lut = getattr(self, "_fp_lut_cache", None)
        if lut is None:
            lut = pd.util.hash_array(
                np.arange(1 << 16, dtype=np.uint64), hash_key=_HASH_KEY_2
            )
            self._fp_lut_cache = lut
        return lut

    def _alt_index(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # (idx ^ hash(fp)) % tb is an involution for power-of-two tb, which
        # the kick loop relies on (evictee must land back in its other bucket)
        fp_hash = self._fp_lut()[fp.astype(np.int64)]
        return ((idx.astype(np.uint64) ^ fp_hash) % np.uint64(self.table_buckets)).astype(
            np.int64
        )

    def _empty_table(self) -> np.ndarray:
        return np.zeros((self.table_buckets, 4), dtype=np.uint16)

    def _kick_insert(self, table: np.ndarray, fp: int, start: int, rng, lut) -> None:
        """Classic cuckoo relocation for one item whose both buckets are
        full: evict a random resident, move it to its alternate bucket,
        repeat up to ``max_kicks``. Pure-scalar via the fp-hash LUT."""
        tb = self.table_buckets
        i = int(start)
        cur = int(fp)
        for _ in range(self.max_kicks):
            slot = rng.randrange(4)
            cur, table[i, slot] = int(table[i, slot]), cur
            i = (i ^ int(lut[cur])) % tb
            empty = np.flatnonzero(table[i] == 0)
            if empty.size:
                table[i, empty[0]] = cur
                return
        raise RuntimeError("cuckoo filter over capacity; grow table_buckets")

    def _place_all(self, table: np.ndarray, fps: np.ndarray, idxs: np.ndarray) -> int:
        """Vectorized insert kernel (VERDICT r3 #4): one array placement
        pass per candidate bucket (primary, then alternate for what didn't
        fit); the per-item kick loop runs only for the residual items whose
        both buckets filled — a handful at sane load factors.

        Slot choice: rows are first compacted (descending in-row sort —
        probe/delete semantics are slot-position-independent) so empty
        slots are contiguous at the tail, and a per-bucket occupancy array
        turns placement into ``slot = occ[bucket] + rank-within-batch``;
        items sharing a bucket get distinct ranks via a stable argsort, so
        no two writes ever collide. Membership semantics identical to
        sequential insertion."""
        import random

        alts = self._alt_index(idxs, fps)
        table[:] = np.sort(table, axis=1)[:, ::-1]  # compact: fps first
        occ = (table != 0).sum(axis=1).astype(np.int64)
        n = len(fps)
        pending = np.arange(n)
        for tgt_all in (idxs, alts):
            if not pending.size:
                break
            t = tgt_all[pending]
            order = np.argsort(t, kind="stable")
            st = t[order]
            pos = np.arange(len(st))
            starts = np.ones(len(st), dtype=bool)
            starts[1:] = st[1:] != st[:-1]
            rank = pos - np.maximum.accumulate(np.where(starts, pos, 0))
            slot = occ[st] + rank
            fits = slot < table.shape[1]
            hit = order[fits]
            table[st[fits], slot[fits]] = fps[pending][hit]
            occ += np.bincount(st[fits], minlength=self.table_buckets)
            pending = pending[order[~fits]]
        if pending.size:
            rng = random.Random(42)
            lut = self._fp_lut()
            for j in pending:
                self._kick_insert(table, int(fps[j]), int(idxs[j]), rng, lut)
        return n

    def _place_all_loop(self, table: np.ndarray, fps: np.ndarray, idxs: np.ndarray) -> int:
        """Reference per-item placement (the pre-r4 path), kept as the
        equivalence + speedup baseline for tests."""
        import random

        rng = random.Random(42)
        lut = self._fp_lut()
        alts = self._alt_index(idxs, fps)
        inserted = 0
        for fp, i1, i2 in zip(fps, idxs, alts):
            fp = np.uint16(fp)
            placed = False
            for i in (i1, i2):
                row = table[i]
                empty = np.flatnonzero(row == 0)
                if empty.size:
                    table[i, empty[0]] = fp
                    placed = True
                    break
            if not placed:
                self._kick_insert(table, int(fp), int(i1), rng, lut)
            inserted += 1
        return inserted

    def _insert_all(self, table: np.ndarray, urls: pd.Series) -> int:
        fps, idxs = self._hash_fp_idx(urls)
        return self._place_all(table, fps, idxs)

    def _insert_all_loop(self, table: np.ndarray, urls: pd.Series) -> int:
        fps, idxs = self._hash_fp_idx(urls)
        return self._place_all_loop(table, fps, idxs)

    def build_blobs(self, urls: DataFrame, url_col: str = "url") -> DataFrame:
        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            table = self._empty_table()
            n = self._insert_all(table, pdf["_url"])
            return pd.DataFrame(
                {
                    "bucket": [int(pdf["_bucket"].iloc[0])],
                    "blob": [table.tobytes()],
                    "n_items": [n],
                }
            )

        return (
            urls.select(
                F.col(url_col).alias("_url"),
                bucket_of(F.col(url_col), self.n_buckets, self.bucket_key).alias("_bucket"),
            )
            .groupBy("_bucket")
            .applyInPandas(build, CUCKOO_SCHEMA)
        )

    def insert_urls(
        self, blobs: DataFrame, urls: DataFrame, url_col: str = "url"
    ) -> DataFrame:
        """Incremental state update: insert urls into EXISTING per-bucket
        tables (full outer on bucket — new buckets start empty). This is
        the cuckoo analog of BloomSeenSet.merge_blobs and what makes the
        filter usable as mutable frontier membership state."""
        tb = self.table_buckets

        def insert(pdf: pd.DataFrame) -> pd.DataFrame:
            blob = next((b for b in pdf["blob"] if b is not None), None)
            table = (
                np.frombuffer(bytes(blob), dtype=np.uint16).reshape(tb, 4).copy()
                if blob is not None
                else self._empty_table()
            )
            todo = pdf[pdf["_url"].notna()]["_url"]
            n = int(next((x for x in pdf["n_items"] if x is not None and x == x), 0) or 0)
            if len(todo):
                n += self._insert_all(table, todo)
            return pd.DataFrame(
                {"bucket": [int(pdf["bucket"].iloc[0])], "blob": [table.tobytes()], "n_items": [n]}
            )

        with_bucket = urls.select(
            F.col(url_col).alias("_url"),
            bucket_of(F.col(url_col), self.n_buckets, self.bucket_key).alias("bucket"),
        )
        joined = blobs.join(with_bucket, on="bucket", how="full")
        return joined.groupBy("bucket").applyInPandas(insert, CUCKOO_SCHEMA)

    def delete_urls(self, blobs: DataFrame, urls: DataFrame, url_col: str = "url") -> DataFrame:
        """Remove urls from the filter (the operation Bloom cannot do)."""
        tb = self.table_buckets

        def delete(pdf: pd.DataFrame) -> pd.DataFrame:
            blob = pdf["blob"].iloc[0]
            table = (
                np.frombuffer(bytes(blob), dtype=np.uint16).reshape(tb, 4).copy()
                if blob is not None
                else self._empty_table()
            )
            todel = pdf[pdf["_url"].notna()]["_url"]
            removed = 0
            if len(todel):
                fps = self._fingerprint(todel)
                idxs = self._index(todel)
                alts = self._alt_index(idxs, fps)
                for fp, i1, i2 in zip(fps, idxs, alts):
                    for i in (i1, i2):
                        hit = np.flatnonzero(table[i] == fp)
                        if hit.size:
                            table[i, hit[0]] = 0
                            removed += 1
                            break
            n = int(pdf["n_items"].iloc[0] or 0) - removed
            return pd.DataFrame(
                {"bucket": [int(pdf["bucket"].iloc[0])], "blob": [table.tobytes()], "n_items": [n]}
            )

        with_bucket = urls.select(
            F.col(url_col).alias("_url"),
            bucket_of(F.col(url_col), self.n_buckets, self.bucket_key).alias("bucket"),
        )
        joined = blobs.join(with_bucket, on="bucket", how="left")
        return joined.groupBy("bucket").applyInPandas(delete, CUCKOO_SCHEMA)

    def probe(
        self,
        candidates: DataFrame,
        blobs: DataFrame,
        url_col: str = "url",
        broadcast: bool = True,
    ) -> DataFrame:
        """Adds ``maybe_seen``. Mirrors ``BloomSeenSet.probe``'s placement
        contract: ``broadcast=True`` ships the fingerprint tables to every
        task (fine while small); ``broadcast=False`` co-partitions BOTH
        sides on bucket so the state — which for the recrawl backend is
        *bigger* than bloom bitmaps (4x uint16 slots per table bucket) —
        never collects to one node (the 10^10-URL configuration)."""
        tb = self.table_buckets

        def test(pdf: pd.DataFrame) -> pd.DataFrame:
            out = np.zeros(len(pdf), dtype=bool)
            if len(pdf):
                blob = pdf["blob"].iloc[0]
                if blob is not None:
                    table = np.frombuffer(bytes(blob), dtype=np.uint16).reshape(tb, 4)
                    fps = self._fingerprint(pdf[url_col])
                    idxs = self._index(pdf[url_col])
                    alts = self._alt_index(idxs, fps)
                    out = ((table[idxs] == fps[:, None]).any(axis=1)) | (
                        (table[alts] == fps[:, None]).any(axis=1)
                    )
            res = pdf.drop(columns=["blob", "n_items"]).copy()
            res["maybe_seen"] = out
            return res

        from pyspark.sql.types import BooleanType

        with_bucket = candidates.withColumn(
            "bucket", bucket_of(F.col(url_col), self.n_buckets, self.bucket_key)
        )
        out_schema = StructType(
            list(with_bucket.schema.fields) + [StructField("maybe_seen", BooleanType())]
        )
        blob_side = F.broadcast(blobs) if broadcast else blobs
        return (
            with_bucket.join(blob_side, on="bucket", how="left")
            .groupBy("bucket")
            .applyInPandas(test, out_schema)
            .drop("bucket")
        )
