"""Fast single-query parity loop for development: run one or more
named queries (registered or local tier) against their DuckDB oracles
at sf0.001 without the full pytest session.

Run:  python tools/quick_parity.py text_line_dedup graph_pagerank ...
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import duckdb

from conftest import SF_DIR, assert_oracle_match
from promptly_data_pipelines_spark.catalog import TABLES
from promptly_data_pipelines_spark.registry import (
    all_oracles,
    local_only_oracles,
    run,
)
from promptly_data_pipelines_spark.session import get_session

spark = get_session("quick-parity", cpus=4, shuffle_partitions=4)
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
oracles = {**all_oracles(), **local_only_oracles()}

for name in sys.argv[1:]:
    df = run(name, spark, SF_DIR)
    if name in oracles:
        assert_oracle_match(df, con, oracles[name], name)
        print(f"{name}: PARITY OK ({df.count()} rows)")
    else:
        print(f"{name}: rows-only ({df.count()} rows)")
