"""Seeded fuzz fixture: random INTERACTION mixes of the hostile classes.

The hostile fixture hand-places each cross-engine hazard once, at a fixed
row, in a fixed combination. This fuzzer draws the SAME hazard classes
(NULL/empty/whitespace/unicode/metachar texts, duplicate clusters, value
ties, same-timestamp pileups, zero/negative/extreme numerics, duplicate
and near-zero embeddings, skewed hot keys) but places them at seeded-random
rows with seeded-random parameters, so every seed exercises a different
interaction mix — a NULL text that lands in the densest LSH band, a value
tie that straddles a window frame boundary, a duplicate pair whose copies
fall in the same stratified-sample cell. Schemas and value domains stay
identical to the base fixture so all registered queries apply, and the
invariants the repo's oracles assume are preserved:

  * n_chars == len(text) (0 for NULL) — recomputed after every mutation;
  * numeric magnitudes capped at 1e6 (the 6-absolute-decimal rounding
    convention needs sig+6 digits of cross-engine float agreement);
  * no extra giant documents (the documented fixture-scale quadratic
    oracle twins materialize texts per candidate pair; the hostile
    fixture's singleton-block giant already covers that axis);
  * row order is ALSO permuted per seed (layout varies with the values).

Usage:
    python3 scripts/make_fuzz_fixture.py SEED [out_dir]
    python3 scripts/check_oracle.py testdata_fuzz_s<SEED>

Deterministic per seed; no wall clock.
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

HAZARD_TEXTS = [
    "",
    " ",
    "   ",
    "hello",
    "\U0001F980",
    "\U0001D518\U0001D52B\U0001D526 \U0001F980\U0001F525 汉字测试 ßẞ straße",
    "café café café",
    "it's a \"quoted\" value; DROP TABLE docs; -- comment",
    "a.b a*b a(b [c] \\d +e ^f$ {g} |h",
    "x" * 2_000,
    "the the the the the the the the the the the the the the the the",
    "tab\tand\nnewline mixed nbsp",
]
LANGS = ["en", "de", "zh", "fr", "es"]


def fuzz_documents(t: pa.Table, rng: random.Random) -> pa.Table:
    df = t.to_pandas()
    n = len(df)
    idx = list(range(n))

    def sample(k):
        return rng.sample(idx, min(k, n))

    for i in sample(rng.randint(3, 10)):  # NULL texts
        df.loc[i, "text"] = None
    for i in sample(rng.randint(5, 15)):  # hazard pool texts
        df.loc[i, "text"] = rng.choice(HAZARD_TEXTS)
        df.loc[i, "lang"] = rng.choice(LANGS)
    # random exact-dup clusters: c clusters of size 2..5, copies land at
    # random rows (crossing sources/langs by construction)
    for _ in range(rng.randint(2, 6)):
        members = sample(rng.randint(2, 5))
        src_text = df.loc[rng.choice(idx), "text"]
        for i in members:
            df.loc[i, "text"] = src_text
    # hot-source skew: reassign a random fraction to one hot source
    hot_frac = rng.uniform(0.1, 0.5)
    hot_src = f"src{rng.randint(0, 3)}"
    for i in sample(int(hot_frac * n)):
        df.loc[i, "source"] = hot_src
    # restore the invariant after all text mutations
    df["n_chars"] = df["text"].map(lambda s: len(s) if s is not None else 0)
    df["n_chars"] = df["n_chars"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


def fuzz_events(t: pa.Table, rng: random.Random) -> pa.Table:
    df = t.to_pandas()
    n = len(df)
    idx = list(range(n))
    # hot user owns a random fraction
    hot_user = int(df.loc[rng.randrange(n), "user_id"])
    for i in rng.sample(idx, int(rng.uniform(0.05, 0.35) * n)):
        df.loc[i, "user_id"] = hot_user
    # same-timestamp pileups: p pileups of random size at random ts
    for _ in range(rng.randint(1, 4)):
        members = rng.sample(idx, rng.randint(5, 40))
        ts = df.loc[rng.randrange(n), "ts"]
        user = hot_user if rng.random() < 0.5 else int(
            df.loc[rng.randrange(n), "user_id"]
        )
        for i in members:
            df.loc[i, "ts"] = ts
            df.loc[i, "user_id"] = user
    # value ties
    tie = round(rng.uniform(0, 100), 2)
    for i in rng.sample(idx, rng.randint(10, 60)):
        df.loc[i, "value"] = tie
    return pa.Table.from_pandas(df, preserve_index=False)


def fuzz_orders(t: pa.Table, rng: random.Random) -> pa.Table:
    df = t.to_pandas()
    n = len(df)
    idx = list(range(n))
    hot = int(df.loc[rng.randrange(n), "o_custkey"])
    for i in rng.sample(idx, int(rng.uniform(0.1, 0.4) * n)):
        df.loc[i, "o_custkey"] = hot
    tie = round(rng.uniform(1000, 200_000), 2)
    for i in rng.sample(idx, rng.randint(20, 80)):
        df.loc[i, "o_totalprice"] = tie
    return pa.Table.from_pandas(df, preserve_index=False)


def fuzz_lineitem(t: pa.Table, rng: random.Random) -> pa.Table:
    df = t.to_pandas()
    n = len(df)
    idx = list(range(n))
    for i in rng.sample(idx, rng.randint(5, 30)):
        df.loc[i, "l_quantity"] = 0.0
    for i in rng.sample(idx, rng.randint(5, 30)):
        df.loc[i, "l_quantity"] = -float(rng.randint(1, 50))
    for i in rng.sample(idx, rng.randint(5, 30)):
        # capped at 1e6 per the hostile fixture's rounding-convention note
        df.loc[i, "l_extendedprice"] = float(rng.randint(900_000, 1_000_000))
    return pa.Table.from_pandas(df, preserve_index=False)


def fuzz_embeddings(t: pa.Table, rng: random.Random) -> pa.Table:
    df = t.to_pandas()
    n = len(df)
    idx = list(range(n))
    # exact-duplicate pairs (similarity ties)
    for _ in range(rng.randint(1, 4)):
        a, b = rng.sample(idx, 2)
        df.at[b, "embedding"] = df.at[a, "embedding"]
    # near-zero-scale and large-scale vectors (within the 1e6 cap)
    for i in rng.sample(idx, rng.randint(1, 3)):
        v = np.asarray(df.at[i, "embedding"], dtype=np.float64)
        df.at[i, "embedding"] = (v * 1e-6).tolist()
    for i in rng.sample(idx, rng.randint(1, 3)):
        v = np.asarray(df.at[i, "embedding"], dtype=np.float64)
        df.at[i, "embedding"] = (v * 1e3).tolist()
    # label skew
    hot_label = df.loc[rng.randrange(n), "label"]
    for i in rng.sample(idx, int(rng.uniform(0.1, 0.4) * n)):
        df.loc[i, "label"] = hot_label
    return pa.Table.from_pandas(df, preserve_index=False)


def fuzz_balances(t: pa.Table, rng: random.Random, col: str) -> pa.Table:
    df = t.to_pandas()
    n = len(df)
    idx = list(range(n))
    tie = round(rng.uniform(-1000, 9000), 2)
    for i in rng.sample(idx, min(n, rng.randint(5, 30))):
        df.loc[i, col] = tie
    for i in rng.sample(idx, min(n, rng.randint(2, 10))):
        df.loc[i, col] = 0.0
    return pa.Table.from_pandas(df, preserve_index=False)


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit("usage: make_fuzz_fixture.py SEED [out_dir]")
    seed = int(sys.argv[1])
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, f"testdata_fuzz_s{seed}"
    )
    os.makedirs(out, exist_ok=True)
    rng = random.Random(seed)
    fuzzers = {
        "documents": fuzz_documents,
        "events": fuzz_events,
        "orders": fuzz_orders,
        "lineitem": fuzz_lineitem,
        "embeddings": fuzz_embeddings,
        "customer": lambda t, r: fuzz_balances(t, r, "c_acctbal"),
        "supplier": lambda t, r: fuzz_balances(t, r, "s_acctbal"),
    }
    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    perm_rng = np.random.Generator(np.random.PCG64(seed))
    for name in tables:
        base = pq.read_table(f"{SRC}/{name}.parquet")
        fuzzed = fuzzers[name](base, rng) if name in fuzzers else base
        fuzzed = fuzzed.select(base.column_names).cast(base.schema)
        fuzzed = fuzzed.take(perm_rng.permutation(fuzzed.num_rows))
        pq.write_table(fuzzed, f"{out}/{name}.parquet")
        print(f"{name}: {fuzzed.num_rows} rows fuzzed (seed {seed})")
    print(f"fuzz fixture written to {out}")


if __name__ == "__main__":
    main()
