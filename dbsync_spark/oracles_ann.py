"""Generated-at-import DuckDB oracles for the exact ANN queries.

Both oracles re-derive the FULL ANN pipeline in pure SQL (no literals
collected from the data): q_ann_srp's signed-random-projection planes are
the same md5-derived +-1 rows as similarity._srp_planes (baked here as
literals from that very function, data-independent), and q_ann_ivf's
seeded integer Lloyd rounds are unrolled as CTEs. Exactness rests on the
integer/one-rounding discipline documented in
functions/similarity.py::ivf_ann_topk_exact.
"""

from __future__ import annotations

from itertools import combinations

from dbsync_spark.functions.similarity import _srp_planes

_EXACT_RECALL_TAIL = """
exact AS (
  SELECT * FROM (
    SELECT q.query_id, c2.vec_id,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             list_dot_product(c2.e, q.qe)
               / (sqrt(list_dot_product(c2.e, c2.e))
                  * sqrt(list_dot_product(q.qe, q.qe))) DESC,
             c2.vec_id) AS rk
    FROM fc c2, (SELECT vec_id AS query_id, e AS qe FROM fc
                 WHERE vec_id < 5) q
    WHERE c2.vec_id <> q.query_id) WHERE rk <= 10
),
hits AS (
  SELECT a.query_id, count(*) AS nh
  FROM ann a JOIN exact e ON a.query_id = e.query_id AND a.vec_id = e.vec_id
  GROUP BY a.query_id
),
denom AS (SELECT query_id, count(*) AS nd FROM exact GROUP BY query_id),
recall AS (
  SELECT d.query_id, COALESCE(h.nh, 0) / d.nd AS recall_at_k
  FROM denom d LEFT JOIN hits h USING (query_id)
)
SELECT ann.query_id, ann.vec_id, ann.cosine_sim, ann.rank, r.recall_at_k
FROM ann JOIN recall r USING (query_id)
"""


def srp_oracle(dim: int = 64, n_planes: int = 6,
               probe_hamming: int = 2) -> str:
    planes = _srp_planes(dim, n_planes)
    prow = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(
            p, ",".join(str(int(x)) for x in planes[p]))
        for p in range(n_planes))
    masks = [0] + [sum(1 << b for b in bits)
                   for h in range(1, probe_hamming + 1)
                   for bits in combinations(range(n_planes), h)]
    mrow = ",".join(f"({m})" for m in masks)
    return f"""
WITH planes(p, pl) AS (VALUES
    {prow}),
masks(m) AS (VALUES {mrow}),
fc AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cb AS (
  SELECT vec_id, e,
         CAST(SUM(CASE WHEN list_dot_product(e, pl) > 0
                       THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
  FROM fc, planes GROUP BY vec_id, e
),
qb0 AS (SELECT vec_id AS query_id, e AS qe, bucket FROM cb WHERE vec_id < 5),
qb AS (SELECT query_id, qe, xor(bucket, m) AS bucket FROM qb0, masks),
pairs AS (
  SELECT DISTINCT qb.query_id, cb.vec_id,
         list_dot_product(cb.e, qb.qe)
           / (sqrt(list_dot_product(cb.e, cb.e))
              * sqrt(list_dot_product(qb.qe, qb.qe))) AS cosine_sim
  FROM cb JOIN qb USING (bucket) WHERE cb.vec_id <> qb.query_id
),
ann AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine_sim DESC, vec_id) AS rank
    FROM pairs) WHERE rank <= 10
),
{_EXACT_RECALL_TAIL.lstrip()}"""


def _ivf_assign(src: str, cent: str, out: str, nprobe: int,
                where: str = "") -> str:
    keep = "rn = 1" if nprobe == 1 else f"rn <= {nprobe}"
    return f"""{out} AS (
  SELECT vec_id, cluster FROM (
    SELECT {src}.vec_id, {cent}.cluster,
           row_number() OVER (PARTITION BY {src}.vec_id ORDER BY
             list_dot_product({src}.v::DOUBLE[], {cent}.c::DOUBLE[])
               / sqrt(list_dot_product({cent}.c::DOUBLE[],
                                       {cent}.c::DOUBLE[])) DESC,
             {cent}.cluster) AS rn
    FROM qv AS {src}, {cent} {where}) WHERE {keep}
)"""


def _ivf_sums(assign: str, out: str, dim: int) -> str:
    return f"""{out} AS (
  SELECT cluster, list(sm ORDER BY d) AS c FROM (
    SELECT cluster, d, CAST(SUM(x) AS BIGINT) AS sm FROM (
      SELECT {assign}.cluster, UNNEST(qv.v) AS x,
             UNNEST(range({dim})) AS d
      FROM {assign} JOIN qv USING (vec_id))
    GROUP BY cluster, d)
  GROUP BY cluster
)"""


def ivf_oracle(dim: int = 64, n_clusters: int = 8, nprobe: int = 3,
               scale: int = 1024) -> str:
    return f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * {scale}) AS BIGINT)) AS v
  FROM embeddings
),
seeds AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster,
         v AS c
  FROM (SELECT vec_id, v FROM qv ORDER BY vec_id LIMIT {n_clusters})
),
{_ivf_assign("x1", "seeds", "a1", 1)},
{_ivf_sums("a1", "s1", dim)},
c1 AS (SELECT s.cluster, COALESCE(s1.c, s.c) AS c
       FROM seeds s LEFT JOIN s1 USING (cluster)),
{_ivf_assign("x2", "c1", "a2", 1)},
{_ivf_sums("a2", "s2", dim)},
c2 AS (SELECT c1.cluster, COALESCE(s2.c, c1.c) AS c
       FROM c1 LEFT JOIN s2 USING (cluster)),
{_ivf_assign("x3", "c2", "ca", 1)},
{_ivf_assign("x4", "c2", "qa0", nprobe, "WHERE x4.vec_id < 5")},
pairs AS (
  SELECT DISTINCT qa0.vec_id AS query_id, ca.vec_id,
         list_dot_product(cv.v::DOUBLE[], qv2.v::DOUBLE[])
           / (sqrt(list_dot_product(cv.v::DOUBLE[], cv.v::DOUBLE[]))
              * sqrt(list_dot_product(qv2.v::DOUBLE[],
                                      qv2.v::DOUBLE[]))) AS cosine_sim
  FROM ca JOIN qv cv USING (vec_id)
       JOIN qa0 ON ca.cluster = qa0.cluster
       JOIN qv qv2 ON qv2.vec_id = qa0.vec_id
  WHERE ca.vec_id <> qa0.vec_id
),
ann AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine_sim DESC, vec_id) AS rank
    FROM pairs) WHERE rank <= 10
),
fc AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
{_EXACT_RECALL_TAIL.lstrip()}"""


def kmeans_oracle(dim: int = 64, n_clusters: int = 8,
                  scale: int = 1024) -> str:
    """(vec_id, cluster) after two integer-exact Lloyd rounds — the
    assignment prefix of ivf_oracle."""
    return f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * {scale}) AS BIGINT)) AS v
  FROM embeddings
),
seeds AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster,
         v AS c
  FROM (SELECT vec_id, v FROM qv ORDER BY vec_id LIMIT {n_clusters})
),
{_ivf_assign("x1", "seeds", "a1", 1)},
{_ivf_sums("a1", "s1", dim)},
c1 AS (SELECT s.cluster, COALESCE(s1.c, s.c) AS c
       FROM seeds s LEFT JOIN s1 USING (cluster)),
{_ivf_assign("x2", "c1", "a2", 1)},
{_ivf_sums("a2", "s2", dim)},
c2 AS (SELECT c1.cluster, COALESCE(s2.c, c1.c) AS c
       FROM c1 LEFT JOIN s2 USING (cluster)),
{_ivf_assign("x3", "c2", "ca", 1)}
SELECT vec_id, cluster FROM ca
"""
