"""Adjudicate the tpch_22_suite sequential drift (judge r8 item #4):
16.2 s (r7 driver conditions) -> 22.3 s (r8 driver conditions) while
the CONCURRENT variant improved and every constituent query's solo cell
stayed flat. The constituents being flat points at per-job scheduling
floor (22 sequential job submissions x JVM/driver overhead), not a plan
regression; this tool decides on a distribution, not two points —
same methodology as tools/merge_adjudicate.py.

Measures, quiet-gated, N repeats each of:
- tpch_22_suite   (22 queries submitted serially)
- tpch_22_concurrent (same queries, 12 driver threads)
- per-query solo times for the 3 slowest constituents (drift in a
  constituent's own cell would indicate a code cause)

Prints one JSON line; paste the verdict into NOTES.md.

Usage: python tools/tpch_adjudicate.py [n_repeats]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TPCH = [
    "q_pricing_summary", "q_min_cost_supplier", "q_top_revenue_orders",
    "q_exists_semi", "q_regional_volume", "q_forecast_revenue",
    "q_nation_volume", "q_market_share", "q_profit_by_nation",
    "q_returned_items", "q_important_parts", "q_shipmode_priority",
    "q_order_count_dist", "q_promo_share", "q_top_supplier",
    "q_supplier_counts", "q_small_qty_revenue", "q_large_volume_customers",
    "q_disjunctive_revenue", "q_excess_suppliers", "q_waiting_suppliers",
    "q_global_sales_opportunity",
]


def main() -> None:
    n_repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    from dbsync_spark.queries import QUERIES
    from dbsync_spark.session import get_spark

    spark = get_spark("tpch-adjudicate")
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="tpch_adj_")
    probes: list[float] = []

    def quiet_gate(max_waits: int = 4, threshold: float = 2.0) -> None:
        for _ in range(max_waits + 1):
            t0 = time.time()
            spark.range(3_000_000).selectExpr("sum(id * 3 % 7)").collect()
            spark.range(200_000).write.mode("overwrite").parquet(
                f"{workdir}/_probe")
            dt = time.time() - t0
            probes.append(round(dt, 3))
            if dt <= threshold:
                return
            print(f"# stall window (probe {dt:.1f}s) — waiting",
                  file=sys.stderr, flush=True)
            time.sleep(75)

    def serial() -> float:
        t0 = time.time()
        for q in TPCH:
            QUERIES[q](spark, SF_DIR).count()
        return time.time() - t0

    def concurrent() -> float:
        from concurrent.futures import ThreadPoolExecutor

        t0 = time.time()
        with ThreadPoolExecutor(12) as ex:
            list(ex.map(lambda q: QUERIES[q](spark, SF_DIR).count(), TPCH))
        return time.time() - t0

    serial()  # warm: reader caches, codegen, shuffle dirs
    runs_serial, runs_conc = [], []
    for _ in range(n_repeats):
        quiet_gate()
        runs_serial.append(round(serial(), 3))
        quiet_gate()
        runs_conc.append(round(concurrent(), 3))

    # per-constituent solo times (one quiet-gated pass, 2 repeats, min)
    per_q: dict[str, float] = {}
    quiet_gate()
    for q in TPCH:
        best = None
        for _ in range(2):
            t0 = time.time()
            QUERIES[q](spark, SF_DIR).count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        per_q[q] = round(best, 3)

    def stats(xs: list[float]) -> dict:
        s = sorted(xs)
        return {"min": s[0], "median": s[len(s) // 2], "max": s[-1],
                "runs": xs}

    out = {
        "sf_dir": SF_DIR,
        "serial": stats(runs_serial),
        "concurrent": stats(runs_conc),
        "per_query_solo_sum": round(sum(per_q.values()), 3),
        "per_query_solo": per_q,
        "scheduling_floor_estimate": round(
            min(runs_serial) - sum(per_q.values()), 3),
        "calibration_probe_s": probes,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
