"""Adversarial oracle fixture: the sf0.01 tables re-shaped to be HOSTILE.

The per-round driver gate proves Spark==DuckDB on two scales of the SAME
friendly generator; this script builds the cheapest remaining way to find a
wrong answer — a fixture that concentrates the classic cross-engine edge
cases while keeping every schema and value domain identical to
/root/testdata/sf0.01 so all 98 registered queries still apply:

  documents   zipfian source skew (src0 carries ~45% of docs); empty and
              whitespace-only texts; single-token docs; astral-plane
              unicode (emoji, math alphanumerics, CJK) and combining
              marks; quote/semicolon/regex-metachar tokens (SQL- and
              regex-escape hazards); a 10k-char single word; NULL texts
              (the friendly fixture has none); exact-duplicate clusters
              spanning sources; ONE 10^6-token document built from a
              3-token cycle + unique tail (repeat structure dedup must
              find, with O(n) not O(n^2) first-occurrence probes).
  events      one user owns ~30% of events (window/sessionize skew); a
              50-event SAME-TIMESTAMP pileup (total-order tiebreaks);
              value ties; hostile props JSON (null value, 1e308, unicode
              key, deep nesting, empty object).
  orders      one customer owns ~40% of orders; o_totalprice ties across
              orderkeys (top-1 tiebreak discipline).
  lineitem    zero / negative / 1e12 quantities and prices (ANSI overflow
              and signed-agg hazards), duplicated (orderkey, linenumber).
  embeddings  an all-zero vector (zero-norm cosine), an exact duplicate
              pair (similarity ties), a 1e-30-scale and a 1e6-scale
              vector (float32 under/overflow in dot products).
  customer /  acctbal ties, negatives and zeros; keys unchanged so the
  supplier    geo band occupancy stays below the exactness cap.

Everything is deterministic (fixed seed, no wall clock). Output dir
defaults to testdata_hostile/ at the repo root; run the full sweep with

    python3 scripts/make_hostile_fixture.py
    python3 scripts/check_oracle.py testdata_hostile
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR_BASE", "/root/testdata/sf0.01")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    REPO, "testdata_hostile"
)

rng = random.Random(5)

WORDS = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "window order data column join small line customer query the a big "
    "vector group filter"
).split()
LANGS = ["en", "de", "zh", "fr", "es"]

HOSTILE_TEXTS = [
    "",                                   # empty string
    " ",                                  # single space
    "   ",                                # runs of spaces -> '' tokens
    "hello",                              # single token
    "\U0001F980",                         # single astral-plane token
    "\U0001D518\U0001D52B\U0001D526 \U0001F980\U0001F525 "
    "汉字测试 ßẞ straße",  # astral+CJK+sharp-s
    "café café café",    # NFC vs NFD combining marks
    "it's a \"quoted\" value; DROP TABLE docs; -- comment",
    "a.b a*b a(b [c] \\d +e ^f$ {g} |h",  # regex metachars as tokens
    "x" * 10_000,                         # one 10k-char word
    "the the the the the the the the the the the the the the the the",
    "tab\tand\nnewline mixed nbsp",  # whitespace that is NOT ' '
]


def load(name: str) -> pa.Table:
    return pq.read_table(f"{SRC}/{name}.parquet")


def write(name: str, table: pa.Table, like: pa.Table) -> None:
    table = table.select(like.column_names).cast(like.schema)
    pq.write_table(table, f"{OUT}/{name}.parquet")


def zipf_source(i: int) -> str:
    # deterministic zipf-ish: src0 ~45%, src1 ~18%, src2 ~9%, tail uniform
    r = (i * 2654435761) % 100
    if r < 45:
        return "src0"
    if r < 63:
        return "src1"
    if r < 72:
        return "src2"
    return f"src{3 + (i % 17)}"


def build_documents(base: pa.Table) -> pa.Table:
    n = base.num_rows
    doc_id, text, lang, source, n_chars = [], [], [], [], []

    def add(i, t, lg):
        doc_id.append(i)
        text.append(t)
        lang.append(lg)
        source.append(zipf_source(i))
        n_chars.append(len(t) if t is not None else 0)

    base_text = base.column("text").to_pylist()
    base_lang = base.column("lang").to_pylist()
    n_inject = len(HOSTILE_TEXTS) + 2 + 6 + 1  # hostile + nulls + dups + giant
    for i in range(n - n_inject):
        add(i, base_text[i], base_lang[i])
    i = n - n_inject
    for t in HOSTILE_TEXTS:
        add(i, t, LANGS[i % 5])
        i += 1
    for _ in range(2):  # NULL texts (friendly fixture has none)
        add(i, None, LANGS[i % 5])
        i += 1
    dup = "exact duplicate cluster spans sources and langs alike"
    for _ in range(6):  # exact-dup cluster crossing sources
        add(i, dup, "en")
        i += 1
    # ONE 10^6-token document: 3-token cycle (first-occurrence probes stay
    # O(1) per gram) + a unique tail so it is not pure repetition. It gets
    # its own (source, lang) block: the registry's documented
    # fixture-scale QUADRATIC oracle twins (jaccard_pairs,
    # cosine_neardup, neardup_components' blocked pair join) materialize
    # full texts per candidate pair, and a 4.7MB text times hundreds of
    # same-block partners is a deliberate OOM, not a fairness test — the
    # singleton block keeps the giant doc on every LINEAR path (token
    # explodes, gram grids, LSH signatures, ppl, BM25) while pair oracles
    # see it only as a block of one.
    giant = "spam ham eggs " * 333_330 + " ".join(
        f"uniq{k}" for k in range(10)
    )
    doc_id.append(i)
    text.append(giant)
    lang.append("en")
    source.append("src_giant_solo")
    n_chars.append(len(giant))
    return pa.table(
        {
            "doc_id": pa.array(doc_id, pa.int64()),
            "text": pa.array(text, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "source": pa.array(source, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )


def build_events(base: pa.Table) -> pa.Table:
    df = base.to_pandas()
    n = len(df)
    # one hot user owns ~30% of events
    hot = df.index[: int(0.30 * n)]
    df.loc[hot, "user_id"] = 7
    # 50-event same-timestamp pileup for the hot user
    pile = df.index[100:150]
    df.loc[pile, "ts"] = df.loc[100, "ts"]
    df.loc[pile, "user_id"] = 7
    # value ties
    df.loc[df.index[200:240], "value"] = 42.0
    hostile_props = [
        '{"k": null}',
        '{"k": 1e308}',
        '{"k": -0.0}',
        '{"üñî": "\U0001F980"}',
        '{"k": {"nested": {"deep": [1, 2, {"x": "y"}]}}}',
        "{}",
    ]
    for j, p in enumerate(hostile_props):
        df.loc[df.index[300 + j], "props"] = p
    return pa.Table.from_pandas(df, preserve_index=False)


def build_orders(base: pa.Table) -> pa.Table:
    df = base.to_pandas()
    n = len(df)
    hot = df.index[: int(0.40 * n)]
    df.loc[hot, "o_custkey"] = 13
    # totalprice ties across many orderkeys (top-1 tiebreak hazard)
    df.loc[df.index[500:560], "o_totalprice"] = 99_999.99
    return pa.Table.from_pandas(df, preserve_index=False)


def build_lineitem(base: pa.Table) -> pa.Table:
    df = base.to_pandas()
    df.loc[df.index[10:20], "l_quantity"] = 0.0
    df.loc[df.index[20:30], "l_quantity"] = -5.0
    # extreme magnitudes are capped at 1e6: the oracle's 6-ABSOLUTE-decimal
    # rounding convention needs ~sig+6 digits of cross-engine float
    # agreement, and doubles carry ~15-16 — 1e12-scale inputs push
    # variance-family aggregates (stddev_pop) past what ANY two engines'
    # summation orders reproduce to 6dp (measured: 1e-12 RELATIVE
    # disagreement on sample_rms_var at 1e12 inputs). 1e6 still exercises
    # the ANSI-overflow and signed-agg paths inside the certifiable range.
    df.loc[df.index[30:35], "l_quantity"] = 1e6
    df.loc[df.index[40:50], "l_extendedprice"] = 1e6
    # duplicated (orderkey, linenumber) rows — key-uniqueness hazard
    dup = df.iloc[60:65].copy()
    df = __import__("pandas").concat([df.iloc[:-5], dup], ignore_index=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def build_embeddings(base: pa.Table) -> pa.Table:
    df = base.to_pandas()
    dim = len(df.loc[0, "embedding"])
    df.at[200, "embedding"] = np.zeros(dim, dtype=np.float32)  # zero norm
    df.at[202, "embedding"] = np.array(
        df.loc[201, "embedding"], dtype=np.float32
    )  # exact duplicate pair 201/202
    df.at[203, "embedding"] = np.full(dim, 1e-30, dtype=np.float32)
    df.at[204, "embedding"] = np.full(dim, 1e6, dtype=np.float32)
    return pa.Table.from_pandas(df, preserve_index=False)


def build_customer(base: pa.Table) -> pa.Table:
    df = base.to_pandas()
    df.loc[df.index[0:40], "c_acctbal"] = 0.0
    df.loc[df.index[40:80], "c_acctbal"] = -1234.56
    df.loc[df.index[80:120], "c_acctbal"] = 777.77  # ties
    return pa.Table.from_pandas(df, preserve_index=False)


def build_supplier(base: pa.Table) -> pa.Table:
    df = base.to_pandas()
    df.loc[df.index[0:5], "s_acctbal"] = 0.0
    df.loc[df.index[5:10], "s_acctbal"] = -99.99
    return pa.Table.from_pandas(df, preserve_index=False)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    passthrough = ["region", "nation", "part"]
    for name in passthrough:
        t = load(name)
        write(name, t, t)
    builders = {
        "documents": build_documents,
        "events": build_events,
        "orders": build_orders,
        "lineitem": build_lineitem,
        "embeddings": build_embeddings,
        "customer": build_customer,
        "supplier": build_supplier,
    }
    for name, fn in builders.items():
        base = load(name)
        write(name, fn(base), base)
    for name in passthrough + list(builders):
        t = pq.read_table(f"{OUT}/{name}.parquet")
        print(f"{name}: {t.num_rows} rows, schema ok")
    print(f"hostile fixture written to {OUT}")


if __name__ == "__main__":
    main()
