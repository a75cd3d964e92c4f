#!/usr/bin/env python3
"""q_temporal_join oracle duals (r17, builder tooling).

The declared oracle for q_temporal_join was re-expressed in r17 from a
range LEFT JOIN (interval containment: from <= ts < to, open current
version) to the equivalent union + carry-forward window, because DuckDB
executes the per-user inequality join quadratically within heavy users
and exceeded the measured 600 s sf10 budget; the window form is a sort
plus a linear scan and verifies in-budget.

The range form stated the interval semantics INDEPENDENTLY of the
engine's own as-of union-window plan — an adversarial property worth
keeping. This script keeps it: it runs BOTH DuckDB formulations over a
scale directory's events table and asserts they are identical, so the
shipped window-form oracle remains anchored to the declarative interval
formulation at any scale a builder cares to run (cell-exact at small
scales, count+multiset-hash above fetch budgets).

Usage: temporal_oracle_duals.py <sfDir> [--hash-only]
"""
import sys

import duckdb

RANGE_FORM = """WITH marked AS (
  SELECT user_id, ts, event_id, event_type AS status,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events WHERE event_type <> 'purchase'),
changes AS (
  SELECT * FROM marked WHERE prev IS NULL OR prev <> status),
dim AS (
  SELECT user_id,
    CAST(row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS BIGINT) AS version,
    status, ts AS effective_from,
    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS effective_to
  FROM changes),
probes AS (
  SELECT event_id, user_id, ts, "value" FROM events
  WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id, p.ts, p."value", d.version, d.status
FROM probes p LEFT JOIN dim d
  ON p.user_id = d.user_id AND d.effective_from <= p.ts
  AND (d.effective_to > p.ts OR d.effective_to IS NULL)
ORDER BY p.event_id"""

ASOF_FORM = """WITH marked AS (
  SELECT user_id, ts, event_id, event_type AS status,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events WHERE event_type <> 'purchase'),
changes AS (
  SELECT * FROM marked WHERE prev IS NULL OR prev <> status),
dim AS (
  SELECT user_id,
    CAST(row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS BIGINT) AS version,
    status, ts AS effective_from
  FROM changes),
tagged AS (
  SELECT user_id, effective_from AS ts, 0 AS is_probe, version,
         NULL::BIGINT AS event_id, NULL::DOUBLE AS "value", status
  FROM dim
  UNION ALL
  SELECT user_id, ts, 1 AS is_probe, NULL::BIGINT AS version,
         event_id, "value", NULL::VARCHAR AS status
  FROM events WHERE event_type = 'purchase'),
filled AS (
  SELECT *,
    last_value(version IGNORE NULLS) OVER w AS cur_version,
    last_value(CASE WHEN is_probe = 0 THEN status END
               IGNORE NULLS) OVER w AS cur_status
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_probe, version
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT event_id, user_id, ts, "value",
       cur_version AS version, cur_status AS status
FROM filled WHERE is_probe = 1
ORDER BY event_id"""


def main():
    if len(sys.argv) < 2:
        print("usage: temporal_oracle_duals.py <sfDir> [--hash-only]",
              file=sys.stderr)
        sys.exit(2)
    sf_dir = sys.argv[1]
    hash_only = "--hash-only" in sys.argv[2:]
    import os
    con = duckdb.connect()
    path = f"{sf_dir}/events.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    # DuckDB cannot prepare CREATE VIEW, so escape single quotes in the
    # interpolated path (a quote in the path would otherwise break the
    # statement)
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{path.replace(chr(39), chr(39) * 2)}')")
    if hash_only:
        probe = ("SELECT count(*),"
                 " sum(hash(event_id, user_id, ts, \"value\","
                 " version, status)::HUGEINT) FROM ")
        a = con.execute(probe + f"({RANGE_FORM})").fetchone()
        b = con.execute(probe + f"({ASOF_FORM})").fetchone()
        same = a == b
        print(f"range n={a[0]} h={a[1]}; asof n={b[0]} h={b[1]}")
    else:
        a = con.execute(RANGE_FORM).fetchall()
        b = con.execute(ASOF_FORM).fetchall()
        same = a == b
        print(f"range rows={len(a)}; asof rows={len(b)}")
    print("EQUAL" if same else "MISMATCH")
    sys.exit(0 if same else 1)


if __name__ == "__main__":
    main()
