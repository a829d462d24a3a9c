"""SQL DML fuzz net: seeded random statement sequences (INSERT /
UPDATE / DELETE / conditional MERGE / RESTORE / OPTIMIZE / ALTER ADD
COLUMN) against a pure-Python dict model of the table state. Every
committed version's model snapshot is kept so RESTORE is modeled
exactly; after every statement the full SELECT must equal the model.
Integer columns only — no float drift in the oracle."""

import copy
import random

import pytest
from pyspark.sql import functions as F  # noqa: F401 (parity w/ suite)

from rclip_server_spark import sql as S
from rclip_server_spark.sources import versioned as V

SEEDS = [11, 23, 37, 58, 71, 94]
N_OPS = 12

# bucketed twin (r11): the SAME model, the SAME verbs — DML and
# schema evolution must be layout-equivalent now that delete vectors,
# conditional MERGE, and metadata-only ALTER work on hash-bucketed
# tables. The op pools are identical.
BUCKETED_SEEDS = [13, 29, 47, 83]


def _select_all(spark, cat, cols):
    df = S.execute(spark, f"SELECT {', '.join(cols)} FROM fz", cat)
    return sorted(tuple(r) for r in df.collect())


def _model_rows(model, cols):
    return sorted(tuple(row[c] for c in cols)
                  for row in model.values())


@pytest.mark.parametrize("layout,seed",
                         [("flat", s) for s in SEEDS]
                         + [("bucketed", s) for s in BUCKETED_SEEDS])
def test_sql_dml_fuzz(spark, tmp_path, layout, seed):
    rng = random.Random(seed)
    cat = S.Catalog(str(tmp_path / f"cat{layout}{seed}"))
    cols = ["k", "a", "b"]
    opts = "key='k'" if layout == "flat" else "key='k', buckets=4"
    S.execute(spark, "CREATE TABLE fz (k BIGINT, a BIGINT, b BIGINT) "
                     f"OPTIONS ({opts})", cat)
    model: dict = {}
    all_cols = list(cols)  # declared schema, evolves under ALTER
    next_key = 0
    # model + schema snapshot per committed version (RESTORE is
    # data-AND-schema time travel: a pre-ALTER restore re-points to
    # segments that never carried the evolved column)
    states = {V.current_version(cat.get("fz")["path"]): ({}, list(cols))}

    def _snapshot(ver):
        states[ver] = (copy.deepcopy(model), list(all_cols))

    for step in range(N_OPS):
        op = rng.choice(["insert", "insert", "update", "delete",
                         "merge", "restore", "optimize", "alter",
                         "truncate"])
        if op == "insert":
            n = rng.randint(1, 5)
            rows = []
            for _ in range(n):
                next_key += 1
                rows.append((next_key, rng.randint(-9, 9),
                             rng.randint(0, 99)))
            pad = ", NULL" * (len(all_cols) - 3)
            vals = ", ".join(f"({k}, {a}, {b}{pad})"
                             for k, a, b in rows)
            out = S.execute(spark, f"INSERT INTO fz VALUES {vals}",
                            cat)
            for k, a, b in rows:
                row = {"k": k, "a": a, "b": b}
                for c in all_cols[3:]:
                    row[c] = None
                model[k] = row
            _snapshot(out["version"])
        elif op == "update":
            m, r = rng.randint(2, 5), rng.randint(0, 1)
            # abs() keeps b NON-NEGATIVE: Spark's % is truncated
            # remainder (sign of the dividend) while Python's is
            # floored — the DELETE predicate below must never see a
            # negative operand or the model diverges from the engine
            out = S.execute(spark, f"UPDATE fz SET a = a * 2 + 1, "
                                   f"b = abs(b - k) WHERE "
                                   f"k % {m} = {r}", cat)
            for k, row in model.items():
                if k % m == r:
                    # SQL NULL propagation: NULL op x -> NULL
                    row["a"] = (None if row["a"] is None
                                else row["a"] * 2 + 1)
                    row["b"] = (None if row["b"] is None
                                else abs(row["b"] - k))
            _snapshot(out["version"])
        elif op == "delete":
            m, r = rng.randint(2, 6), rng.randint(0, 1)
            out = S.execute(spark, f"DELETE FROM fz WHERE "
                                   f"b % {m} = {r}", cat)
            model = {k: row for k, row in model.items()
                     if not (row["b"] is not None
                             and row["b"] % m == r)}
            _snapshot(out["version"])
        elif op == "merge":
            # source: some existing keys (update/delete mix) + fresh
            ex = rng.sample(sorted(model), min(len(model), 3))
            fresh = [next_key + i + 1 for i in range(2)]
            next_key += 2
            src_rows = [(k, rng.randint(0, 1)) for k in ex] + \
                       [(k, 2) for k in fresh]
            vals = " UNION ALL ".join(
                f"SELECT CAST({k} AS BIGINT) AS k, "
                f"CAST({o} AS BIGINT) AS op" for k, o in src_rows)
            out = S.execute(spark, (
                f"MERGE INTO fz t USING ({vals}) AS s "
                f"ON t.k = s.k "
                f"WHEN MATCHED AND s.op = 0 THEN DELETE "
                f"WHEN MATCHED THEN UPDATE SET a = t.a + 100 "
                f"WHEN NOT MATCHED AND s.op = 2 THEN INSERT "
                f"(k, a) VALUES (s.k, s.op * 10)"), cat)
            for k, o in src_rows:
                if k in model:
                    if o == 0:
                        del model[k]
                    elif model[k]["a"] is not None:
                        model[k]["a"] += 100
                elif o == 2:
                    row = {"k": k, "a": 20, "b": None}
                    for c in all_cols[3:]:
                        row[c] = None
                    model[k] = row
            _snapshot(out["version"])
        elif op == "restore":
            tv = rng.choice(sorted(states))
            out = S.execute(spark, f"RESTORE TABLE fz TO VERSION "
                                   f"AS OF {tv}", cat)
            model = copy.deepcopy(states[tv][0])
            all_cols = list(states[tv][1])
            _snapshot(out["version"])
        elif op == "optimize":
            out = S.execute(spark, "OPTIMIZE fz", cat)
            _snapshot(out["version"])
        elif op == "truncate":
            # reversible empty-the-table commit: rows AND pending
            # vectors go, schema stays, RESTORE can undo it
            out = S.execute(spark, "TRUNCATE TABLE fz", cat)
            model = {}
            _snapshot(out["version"])
        else:  # alter: add one evolved column, NULL everywhere
            cname = f"x{step}"
            out = S.execute(spark, f"ALTER TABLE fz ADD COLUMN "
                                   f"{cname} BIGINT", cat)
            all_cols.append(cname)
            for row in model.values():
                row[cname] = None
            _snapshot(out["version"])
        got = _select_all(spark, cat, all_cols)
        want = sorted(tuple(row.get(c) for c in all_cols)
                      for row in model.values())
        assert got == want, f"seed={seed} step={step} op={op}"
