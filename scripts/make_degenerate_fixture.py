"""Degenerate-shape oracle fixture: the smallest corpus a 10^12-doc job
actually meets.

The hostile fixture (make_hostile_fixture.py) concentrates VALUE edge
cases at normal cardinality; this one concentrates CARDINALITY edge
cases — the shapes a per-day pipeline is guaranteed to hit in production
(a nearly-empty day partition, a re-crawl day that is 100% duplicates, a
single-source day) and that tiny-k algorithms (IVF k-means, LSH banding,
stratified cuts) must survive without crashing or diverging from the SQL
oracle:

  documents   6 rows: one 3-copy exact-duplicate cluster spanning two
              sources (the all-duplicate day), one single-token doc, one
              ordinary doc, one NULL text — every dedup/cluster/sample
              query runs with fewer rows than its usual strata/buckets.
  embeddings  4 rows: one exact-duplicate pair + two ordinary vectors —
              fewer points than the IVF trainer's usual centroid count
              and fewer candidates than top-k asks for (k > n).
  events      5 rows from ONE user (single-partition windows; sessionize
              with no second key), including one same-timestamp pair.
  orders /    first 5 / 8 rows of sf0.001 (joins hit mostly-empty
  lineitem    build sides; grouping sets see singleton groups).
  customer /  first 6 / 4 rows (geo bands mostly EMPTY — the banded join
  supplier    must tolerate bands with zero customers).
  part        first 5 rows; region/nation copied whole (dimensions don't
              shrink with a bad day).

Everything is sliced or constructed deterministically from
/root/testdata/sf0.001 — no wall clock, no randomness. Output defaults to
testdata_degenerate/ at the repo root; sweep with

    python3 scripts/make_degenerate_fixture.py
    python3 scripts/check_oracle.py testdata_degenerate

`--empty` writes the limiting case instead: ZERO-row fact tables
(schemas intact, dimensions still populated) — the empty day partition.
This sweep found the Spark CUBE/ROLLUP standard deviation (zero rows
where the () grouping set owes a grand-total row); both queries now
derive grouping sets from the finest aggregate and the full sweep
passes:

    python3 scripts/make_degenerate_fixture.py /tmp/testdata_empty --empty
    python3 scripts/check_oracle.py /tmp/testdata_empty
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR_BASE", "/root/testdata/sf0.001")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    REPO, "testdata_degenerate"
)


def load(name: str) -> pa.Table:
    return pq.read_table(os.path.join(SRC, f"{name}.parquet"))


def write(name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(OUT, f"{name}.parquet"))


DUP_TEXT = (
    "the quick brown fox jumps over the lazy dog and then the quick "
    "brown fox jumps over the lazy dog again and again"
)


def build_documents(base: pa.Table) -> pa.Table:
    rows = {
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [
            DUP_TEXT,
            DUP_TEXT,
            DUP_TEXT,
            "solitary",
            "an ordinary document with some plain words about a table "
            "scan and a hash join and a filter",
            None,
        ],
        "lang": ["en", "en", "fr", "en", "en", "en"],
        "source": ["src0", "src0", "src1", "src1", "src2", "src0"],
    }
    rows["n_chars"] = [len(t) if t is not None else 0 for t in rows["text"]]
    cols = []
    for f in base.schema:
        arr = pa.array(rows[f.name], type=f.type)
        cols.append(arr)
    return pa.Table.from_arrays(cols, schema=base.schema)


def build_embeddings(base: pa.Table) -> pa.Table:
    emb = base.slice(0, 4).to_pydict()
    # rows 0 and 1 become an exact-duplicate pair (similarity ties at 1.0)
    emb["embedding"][1] = list(emb["embedding"][0])
    cols = [
        pa.array(emb[f.name], type=f.type) for f in base.schema
    ]
    return pa.Table.from_arrays(cols, schema=base.schema)


def build_events(base: pa.Table) -> pa.Table:
    ev = base.slice(0, 5).to_pydict()
    uid = ev["user_id"][0]
    ev["user_id"] = [uid] * 5  # single-user day: one window partition
    ev["ts"][1] = ev["ts"][0]  # same-timestamp pair (tiebreak discipline)
    cols = [pa.array(ev[f.name], type=f.type) for f in base.schema]
    return pa.Table.from_arrays(cols, schema=base.schema)


FACTS = [
    "documents", "embeddings", "events", "orders", "lineitem",
    "customer", "supplier", "part",
]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    if "--empty" in sys.argv:
        for name in FACTS:
            write(name, load(name).slice(0, 0))
        for name in ["region", "nation"]:
            write(name, load(name))
        print(f"zero-row fixture written to {OUT}")
        return
    write("documents", build_documents(load("documents")))
    write("embeddings", build_embeddings(load("embeddings")))
    write("events", build_events(load("events")))
    for name, n in [
        ("orders", 5),
        ("lineitem", 8),
        ("customer", 6),
        ("supplier", 4),
        ("part", 5),
    ]:
        write(name, load(name).slice(0, n))
    for name in ["region", "nation"]:
        write(name, load(name))
    print(f"degenerate fixture written to {OUT}")


if __name__ == "__main__":
    main()
