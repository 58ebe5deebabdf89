"""URL-seen set properties: Bloom ⊇-safety (no false negatives), exact
equivalence of the composed path, incremental merge, cuckoo insert/delete."""

import pytest
from pyspark.sql import functions as F

from warc_spark.operators.seen import BloomSeenSet, CuckooSeenSet, exact_new_urls


def urls_df(spark, ids, prefix="http://h%d.example.org/p/%d"):
    return spark.createDataFrame(
        [(prefix % (i % 7, i),) for i in ids], "url string"
    )


@pytest.fixture(scope="module")
def seen_urls(spark):
    return urls_df(spark, range(0, 500))


@pytest.fixture(scope="module")
def candidates(spark):
    # 250 overlap with seen, 250 new
    return urls_df(spark, range(250, 750))


class TestBloom:
    def test_no_false_negatives(self, spark, seen_urls, candidates):
        bloom = BloomSeenSet(n_buckets=8, m_bits=1 << 14)
        blobs = bloom.build_blobs(seen_urls)
        probed = bloom.probe(candidates, blobs)
        # every truly-seen candidate MUST be flagged maybe_seen
        truly_seen = candidates.join(seen_urls, "url", "left_semi")
        missed = truly_seen.join(
            probed.filter(~F.col("maybe_seen")).select("url"), "url", "left_semi"
        )
        assert missed.count() == 0

    def test_composed_filter_equals_exact(self, spark, seen_urls, candidates):
        bloom = BloomSeenSet(n_buckets=8, m_bits=1 << 12)  # small -> real fpp
        blobs = bloom.build_blobs(seen_urls)
        composed = bloom.filter_new(candidates, blobs, seen_urls)
        exact = exact_new_urls(candidates, seen_urls)
        a = {r.url for r in composed.collect()}
        b = {r.url for r in exact.collect()}
        assert a == b and len(a) == 250

    def test_incremental_merge(self, spark):
        bloom = BloomSeenSet(n_buckets=4, m_bits=1 << 13)
        b1 = bloom.build_blobs(urls_df(spark, range(0, 100)))
        b2 = bloom.build_blobs(urls_df(spark, range(100, 200)))
        merged = bloom.merge_blobs(b1, b2)
        probed = bloom.probe(urls_df(spark, range(0, 200)), merged)
        assert probed.filter(~F.col("maybe_seen")).count() == 0
        assert merged.agg(F.sum("n_items")).first()[0] == 200

    def test_fpp_is_bounded(self, spark, seen_urls):
        bloom = BloomSeenSet(n_buckets=8, m_bits=1 << 16)
        blobs = bloom.build_blobs(seen_urls)
        fresh = urls_df(spark, range(10_000, 11_000))
        fp = bloom.probe(fresh, blobs).filter(F.col("maybe_seen")).count()
        assert fp / 1000 < 0.05


class TestUrlBucketKey:
    """bucket_key="url": balanced state under adversarial host skew
    (a single-host corpus concentrates ALL state in one bucket under the
    default host key; url-hash buckets spread it) — same membership
    semantics."""

    def _one_host(self, spark, ids):
        return spark.createDataFrame(
            [("http://hot.example.org/p/%d" % i,) for i in ids], "url string"
        )

    def test_single_host_spreads_across_buckets(self, spark):
        urls = self._one_host(spark, range(0, 400))
        by_host = BloomSeenSet(n_buckets=8, m_bits=1 << 12, bucket_key="host")
        by_url = BloomSeenSet(n_buckets=8, m_bits=1 << 12, bucket_key="url")
        assert by_host.build_blobs(urls).count() == 1  # all state in one bucket
        spread = by_url.build_blobs(urls)
        assert spread.count() == 8  # every bucket holds a share
        assert spread.agg(F.max("n_items")).first()[0] < 400 * 0.25

    def test_membership_equivalence(self, spark, seen_urls, candidates):
        bloom = BloomSeenSet(n_buckets=8, m_bits=1 << 12, bucket_key="url")
        blobs = bloom.build_blobs(seen_urls)
        composed = bloom.filter_new(candidates, blobs, seen_urls)
        exact = exact_new_urls(candidates, seen_urls)
        assert {r.url for r in composed.collect()} == {r.url for r in exact.collect()}

    def test_cuckoo_url_key(self, spark, seen_urls, candidates):
        ck = CuckooSeenSet(n_buckets=8, table_buckets=1 << 10, bucket_key="url")
        blobs = ck.build_blobs(seen_urls)
        probed = ck.probe(candidates, blobs)
        truly_seen = candidates.join(seen_urls, "url", "left_semi")
        missed = truly_seen.join(
            probed.filter(~F.col("maybe_seen")).select("url"), "url", "left_semi"
        )
        assert missed.count() == 0


class TestCuckoo:
    def test_membership_and_delete(self, spark):
        ck = CuckooSeenSet(n_buckets=4, table_buckets=1 << 10)
        inserted = urls_df(spark, range(0, 300))
        blobs = ck.build_blobs(inserted)
        probed = ck.probe(inserted, blobs)
        assert probed.filter(~F.col("maybe_seen")).count() == 0  # no false negatives
        # delete half and re-probe: deleted urls must no longer hit
        to_delete = urls_df(spark, range(0, 150))
        blobs2 = ck.delete_urls(blobs, to_delete)
        still = ck.probe(to_delete, blobs2).filter(F.col("maybe_seen")).count()
        # deletion removes the fingerprint; rare same-fingerprint collisions allowed
        assert still <= 3
        kept = ck.probe(urls_df(spark, range(150, 300)), blobs2)
        assert kept.filter(~F.col("maybe_seen")).count() == 0
