"""Luhn card-scan PII detection and fuzzy-pair entity resolution."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbsync_spark.functions.text import luhn_valid, pii_card_scan


def _luhn_ref(num: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(num), start=1):
        d = int(ch)
        if i % 2 == 0:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def test_luhn_valid_matches_reference(spark):
    # known-valid test PANs + their single-digit corruptions
    valid = ["4539578763621486", "4716461583322103", "5500005555555559"]
    nums = list(valid)
    for v in valid:
        nums.append(v[:-1] + str((int(v[-1]) + 1) % 10))
    df = spark.createDataFrame([(n,) for n in nums], "num string")
    got = {r.num: r.ok for r in
           df.select("num", luhn_valid(F.col("num")).alias("ok")).collect()}
    for n in nums:
        assert got[n] == _luhn_ref(n), n


def test_pii_card_scan_counts_and_no_candidates(spark):
    df = spark.createDataFrame(
        [(1, "pay with 4539578763621486 thanks"),
         (2, "ref 4539578763621480 is not a card"),     # fails Luhn
         (3, "no digits here at all"),
         (4, "two cards 4539578763621486 and 5500005555555559")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in pii_card_scan(df).collect()}
    assert (rows[1].n_candidates, rows[1].n_valid) == (1, 1)
    assert (rows[2].n_candidates, rows[2].n_valid) == (1, 0)
    assert (rows[3].n_candidates, rows[3].n_valid) == (0, 0)
    assert (rows[4].n_candidates, rows[4].n_valid) == (2, 2)
    assert rows[3].doc_id == 3  # digit-free docs still present
    # md5 of empty concat for docs with no valid cards
    assert rows[2].valid_md5 == rows[3].valid_md5


def test_entity_resolution_transitive(spark):
    """a~b and b~c within one block => one entity, even if a!~c."""
    from dbsync_spark.functions.dedup import dedup_clusters, fuzzy_dedup

    mk = "the shared forty character prefix padding x"
    rows = [
        (1, mk + " aaaaaa", "en", 100),
        (2, mk + " aaabbb", "en", 100),   # dist(1,2) small
        (3, mk + " bbbbbb", "en", 100),   # dist(2,3) small
        (9, "totally unrelated content about volcanoes", "en", 100),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, "
                                     "lang string, n_chars long")
    pairs = fuzzy_dedup(df, max_dist=6)
    ents = {r.doc_id: r.canonical_id
            for r in dedup_clusters(df.select("doc_id"), pairs).collect()}
    assert ents[1] == ents[2] == ents[3] == 1
    assert ents[9] == 9
