#!/usr/bin/env python3
"""Full-surface DuckDB oracle compare at an arbitrary SF (round-11 directive
#2: the sf1 sweep must cover ALL oracle-backed queries, not a 10-query spot).

Dev-only tooling (sandbox python3 + duckdb — never part of the engine).
Mirrors the driver's compare contract: for every query in the Verify dump's
oracle_sql.json, run the SQL in DuckDB over the same parquet tables, align
columns by sorted name, and compare the two multisets. The compare runs
INSIDE DuckDB (EXCEPT ALL both ways) so 20M-row results finish in seconds:

  tier 1  strict equality — the verdict for every non-float column type
          (the q2 midpoint bug the sf1 spot-check caught was an
          exact-compare find, so decimals/ints/strings stay strict);
  tier 2  floats quantized to 6 significant digits (printf %.5e) — at sf1
          a 6M-row double sum legitimately drifts from DuckDB in the last
          ulps because addition order differs; a genuine value bug is
          orders of magnitude above 1e-6 relative.

Results past BIG_ROWS switch to a STREAMING multiset checksum — per side
count(*) + sum(hash(row)) over the same normalized projection (both tiers
in one aggregate pass, each side evaluated exactly once, O(1) memory).
Equal multisets give equal sums; a forged match needs a 64-bit hash-sum
collision. Rationale: materializing a 630M-row EXCEPT ALL spilled >75 GB
of DuckDB temp at sf3 and filled the disk; the checksum verified the same
query in 17 s flat.

Accuracy-contract queries (the ~19 approximate ones) are skipped here:
their dump is a (metric, value, bound, pass) summary, and their sf-level
evidence is the accuracy.json emitted by the same Verify run.

usage: compare_oracle.py <sfDir> <verifyOutDir> <reportJson> [--skip name,...]
"""
import glob
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# the exact column set graft.Accuracy.summaryDf writes — a dump carrying it
# is an accuracy-contract summary, not a row-for-row result (detected from
# the dump itself so this script never drifts from the Scala registry)
ACCURACY_SCHEMA = {"metric", "scope", "n_ref", "bound", "pass"}


def is_accuracy_dump(parts):
    import pyarrow.parquet as pq
    try:
        return set(pq.read_schema(parts[0]).names) == ACCURACY_SCHEMA
    except Exception:  # noqa: BLE001 — unreadable dump falls through to the compare's own error
        return False

FLOATY = {"FLOAT", "DOUBLE", "REAL"}

# past this row count the EXCEPT-ALL materialization is replaced by the
# streaming checksum compare (see module doc); env-overridable so the
# checksum path itself can be swept over the whole small-SF surface
BIG_ROWS = int(os.environ.get("COMPARE_BIG_ROWS", 20_000_000))


def proj_sql(col, typ, quantize):
    """Projection for the checksum compare. `typ` is the UNIFIED column type
    and every branch CASTs to it: hash() is type-sensitive in DuckDB
    (hash(1.5::DOUBLE) != hash(1.5::DECIMAL(3,1))), so hashing each side's
    native physical type would strict-fail DOUBLE-vs-DECIMAL columns that
    the EXCEPT-ALL path's implicit coercion compared fine — and hard-fail
    same-value DECIMALs of different scales.
    """
    base = f'"{col}"'
    if typ.upper() in FLOATY:
        if quantize:
            # 6-significant-digit quantization; NaN/inf format stably
            return f"printf('%.5e', CAST({base} AS DOUBLE))"
        return f"CAST({base} AS DOUBLE)"
    # TIMESTAMP_NS vs TIMESTAMP: normalize to µs for strict equality
    if typ.upper().startswith("TIMESTAMP"):
        return f"CAST({base} AS TIMESTAMP)"
    return f"CAST({base} AS {typ})"


def checksum(con, src, cols, types):
    """(n, strict_hash_sum, quantized_hash_sum) in ONE pass over `src`."""
    strict = ", ".join(proj_sql(c, t, quantize=False) for c, t in zip(cols, types))
    quant = ", ".join(proj_sql(c, t, quantize=True) for c, t in zip(cols, types))
    return con.execute(
        f"SELECT count(*), sum(hash({strict})::HUGEINT), "
        f"sum(hash({quant})::HUGEINT) FROM ({src})"
    ).fetchone()


def mismatches(con, cols, types, quantize):
    """Rows in spk not in ora plus rows in ora not in spk (multiset)."""
    def proj(col, typ):
        base = f'"{col}"'
        if typ.upper() in FLOATY:
            if quantize:
                # 6-significant-digit quantization; NaN/inf format stably
                return f"printf('%.5e', {base}) AS \"{col}\""
            return f"{base} AS \"{col}\""
        # TIMESTAMP_NS vs TIMESTAMP: normalize to µs for strict equality
        if typ.upper().startswith("TIMESTAMP"):
            return f'CAST({base} AS TIMESTAMP) AS "{col}"'
        return f'{base} AS "{col}"'
    sel = ", ".join(proj(c, t) for c, t in zip(cols, types))
    return con.execute(
        f"SELECT count(*) FROM ("
        f"(SELECT {sel} FROM spk EXCEPT ALL SELECT {sel} FROM ora) "
        f"UNION ALL "
        f"(SELECT {sel} FROM ora EXCEPT ALL SELECT {sel} FROM spk))"
    ).fetchone()[0]


def main():
    sf_dir, out_dir, report_path = sys.argv[1], sys.argv[2], sys.argv[3]
    skip = set()
    if "--skip" in sys.argv:
        skip = set(sys.argv[sys.argv.index("--skip") + 1].split(","))

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle_sql = json.load(f)

    con = duckdb.connect()
    # bounded memory + a named spill dir: an unbounded EXCEPT-ALL run once
    # spilled >75 GB into cwd/.tmp and took the whole disk down with it
    os.makedirs("/tmp/duck_spill", exist_ok=True)
    con.execute("PRAGMA memory_limit='48GB'")
    con.execute("PRAGMA temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    report = {}
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle_sql):
        if name in skip:
            n_skip += 1
            continue
        entry = {}
        try:
            parts = glob.glob(os.path.join(out_dir, name, "*.parquet"))
            if not parts:
                raise RuntimeError("no Verify dump (query errored or not run)")
            if is_accuracy_dump(parts):
                n_skip += 1
                continue
            for obj in ("spk", "ora"):
                # IF EXISTS still errors on a kind mismatch (dropping TABLE
                # x when x is a VIEW) — try both kinds
                for kind in ("TABLE", "VIEW"):
                    try:
                        con.execute(f"DROP {kind} IF EXISTS {obj}")
                    except duckdb.CatalogException:
                        pass
            con.execute(
                f"CREATE VIEW spk AS SELECT * FROM read_parquet({parts!r})")
            spk_cols = {r[0]: r[1] for r in con.execute("DESCRIBE spk").fetchall()}
            entry["spark_rows"] = con.execute("SELECT count(*) FROM spk").fetchone()[0]
            big = entry["spark_rows"] > BIG_ROWS
            # small results: materialize the oracle once (EXCEPT ALL reads
            # it twice per tier); big results stay views — each side is
            # evaluated exactly once by the single-pass checksum. The
            # small-mode materialization is CAPPED: the big/small decision
            # reads only the spark side, so a regressed (tiny) spark result
            # on a giant oracle must fail on the capped count instead of
            # materializing 600M rows
            if big:
                con.execute(f"CREATE VIEW ora AS {oracle_sql[name]}")
            else:
                con.execute(f"CREATE TABLE ora AS SELECT * FROM "
                            f"({oracle_sql[name]}) LIMIT {BIG_ROWS + 1}")
            ora_cols = {r[0]: r[1] for r in con.execute("DESCRIBE ora").fetchall()}
            cols = sorted(spk_cols)
            entry["schema_match"] = cols == sorted(ora_cols)
            # a column is float-tier if EITHER side's physical type is
            # floating (spark DOUBLE vs oracle DECIMAL compares as
            # DuckDB coerces — addition-order last-ulp drift must fall
            # into the quantized tier, not strict-fail)
            types = ["DOUBLE" if spk_cols[c].upper() in FLOATY
                     or ora_cols[c].upper() in FLOATY else spk_cols[c]
                     for c in cols] if entry["schema_match"] else []
            if big and entry["schema_match"]:
                entry["compare_mode"] = "checksum_hash64"
                sn, ss, sq = checksum(con, "SELECT * FROM spk", cols, types)
                on_, os_, oq = checksum(con, "SELECT * FROM ora", cols, types)
                entry["oracle_rows"] = on_
                entry["rows_match"] = sn == on_
                if not entry["rows_match"]:
                    entry["values_match"] = False
                elif ss == os_:
                    entry["values_match"] = True
                elif any(t.upper() in FLOATY for t in types):
                    entry["values_match"] = sq == oq
                    entry["float_tier"] = "quantized_1e-6"
                else:
                    entry["values_match"] = False
            else:
                entry["oracle_rows"] = \
                    con.execute("SELECT count(*) FROM ora").fetchone()[0]
                if not big and entry["oracle_rows"] == BIG_ROWS + 1:
                    # materialization cap hit — the true oracle count is
                    # >= this; rows_match is correctly false either way
                    # (spark_rows <= BIG_ROWS < oracle_rows)
                    entry["oracle_rows_capped"] = True
                entry["rows_match"] = entry["spark_rows"] == entry["oracle_rows"]
                if entry["rows_match"] and entry["schema_match"]:
                    strict = mismatches(con, cols, types, quantize=False)
                    if strict == 0:
                        entry["values_match"] = True
                    elif any(t.upper() in FLOATY for t in types):
                        quant = mismatches(con, cols, types, quantize=True)
                        entry["values_match"] = quant == 0
                        entry["float_tier"] = "quantized_1e-6"
                        if quant:
                            entry["value_diffs"] = quant
                    else:
                        entry["values_match"] = False
                        entry["value_diffs"] = strict
                else:
                    entry["values_match"] = False
            ok = entry["rows_match"] and entry["schema_match"] and entry["values_match"]
        except Exception as e:  # noqa: BLE001 — one bad query must not kill the sweep
            entry["err"] = f"{type(e).__name__}: {e}"[:500]
            ok = False
        n_pass += ok
        n_fail += not ok
        print(f"[compare] {name}: {'ok' if ok else 'FAIL'} "
              f"({entry.get('spark_rows', '?')} vs {entry.get('oracle_rows', '?')} rows)"
              + (f" err={entry['err']}" if "err" in entry else ""),
              flush=True)
        report[name] = entry

    doc = {
        "sf_dir": sf_dir,
        "note": "full oracle-backed sweep vs DuckDB (round-11 directive #2); "
                "accuracy-contract queries covered by accuracy.json from the "
                "same Verify run",
        "pass": n_pass, "fail": n_fail, "skipped_accuracy": n_skip,
        "queries": report,
    }
    with open(report_path, "w") as f:
        json.dump(doc, f, indent=1, default=str)
    print(f"[compare] done: {n_pass} pass, {n_fail} fail, {n_skip} accuracy-skipped")
    sys.exit(0 if n_fail == 0 else 1)


if __name__ == "__main__":
    main()
