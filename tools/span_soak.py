"""Per-batch cost probe for StreamingSpanIndex: feed the sf0.01 corpus
in K equal batches and time each process_batch. The graded property is
the growth SHAPE: span rescoring is touched-docs-only, so per-batch time
should stay roughly flat while the accumulated index grows K-fold (the
full-index reads are scans that grow, but the wide work keys on the
increment; at 100 TB the scans prune via wh/doc_id bucketing).

Usage: python tools/span_soak.py [K] [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    from pyspark.sql import functions as F

    from dbsync_spark.session import get_spark
    from dbsync_spark.sources.tables import read_table
    from dbsync_spark.streaming.span_index import StreamingSpanIndex

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark("span-soak")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, sf_dir, "documents")
    idx = StreamingSpanIndex(
        spark, tempfile.mkdtemp(prefix="span_soak_"))
    times = []
    for b in range(k):
        batch = docs.where(F.col("doc_id") % k == b)
        t0 = time.monotonic()
        idx.process_batch(batch, epoch_id=b)
        times.append(round(time.monotonic() - t0, 3))
        print(f"batch {b}: {times[-1]:.3f}s", flush=True)
    n = idx.current_spans().count()
    print(f"per-batch: {times}; last/first = "
          f"{times[-1] / max(times[0], 1e-9):.2f}; spans={n}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
