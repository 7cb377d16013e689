"""A/B probe: WARC source handoff — row tuples vs Arrow RecordBatches.

The Python DataSource protocol accepts either per-row tuples (pickled
through the worker) or `pa.RecordBatch`es from `read()`. The
production reader (operators/warcsource.py) yields TUPLES because this
probe measured both handoffs on the same files in one session and
tuples won at both payload shapes (results in BASELINE.md round-9
session 2): building pa.arrays in Python costs more than row pickling
saves at the parser's ~35 µs/record rate. The Arrow variant lives
ONLY here, registered under its own name, so the A/B stays
reproducible without a production knob.

Run on a quiet machine:
    python tools/probe_warc.py [n_records]          # ~100 B payloads
    PDP_PROBE_PAYLOAD=5000 python tools/probe_warc.py 20000
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402

from promptly_data_pipelines_spark.operators.warcsource import (  # noqa: E402
    WarcDataSource,
    WarcReader,
    _parse_warc_stream,
    write_warc_files,
)
from promptly_data_pipelines_spark.session import get_session  # noqa: E402

# parsed in main(), NOT at module top level: executors re-import this
# module to unpickle the probe DataSource class, with their own argv
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

_ARROW_SCHEMA = pa.schema(
    [
        ("record_id", pa.string()),
        ("warc_type", pa.string()),
        ("target_uri", pa.string()),
        ("warc_date", pa.string()),
        ("content_length", pa.int64()),
        ("payload", pa.string()),
    ]
)
_BATCH_ROWS = 512


class _ArrowWarcReader(WarcReader):
    def read(self, partition):
        def to_batch(rows):
            cols = list(zip(*rows))
            return pa.RecordBatch.from_arrays(
                [pa.array(c, type=f.type) for c, f in zip(cols, _ARROW_SCHEMA)],
                schema=_ARROW_SCHEMA,
            )

        buf: list[tuple] = []
        with open(partition.path, "rb") as fh:
            for rec in _parse_warc_stream(fh):
                buf.append(rec)
                if len(buf) >= _BATCH_ROWS:
                    yield to_batch(buf)
                    buf = []
        if buf:
            yield to_batch(buf)


class ArrowWarcDataSource(WarcDataSource):
    @classmethod
    def name(cls) -> str:
        return "pdp_warc_arrow"

    def reader(self, schema):
        return _ArrowWarcReader(self.options)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_session("pdp-probe-warc", cpus=CPUS, shuffle_partitions=CPUS)
    spark.dataSource.register(WarcDataSource)
    spark.dataSource.register(ArrowWarcDataSource)
    d = tempfile.mkdtemp(prefix="pdp_probe_warc_")
    try:
        size = int(os.environ.get("PDP_PROBE_PAYLOAD", "190"))
        rows = [(i, f"payload body {i} " + "x" * (i % size or size)) for i in range(n)]
        write_warc_files(rows, d, n_files=CPUS)
        print(f"{n} records across {CPUS} files, loadavg {os.getloadavg()}")
        for fmt in ("pdp_warc", "pdp_warc_arrow"):
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                got = (
                    spark.read.format(fmt)
                    .load(d)
                    .selectExpr("sum(content_length) AS s", "count(*) AS n")
                    .collect()[0]
                )
                runs.append(round(time.perf_counter() - t0, 3))
            assert got["n"] == n, got
            print(f"{fmt}: min {min(runs)} s  runs {runs}")
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
