#!/usr/bin/env python
"""Build the ADVERSARIAL star-schema fixture (and its empty twin).

The driver's correctness gate and the dtype audit both run on the
generated testdata, which is clean by construction: zero NULLs in any
column, ASCII-only text, uniform keys, no empty partitions. Real
100 TB corpora are none of those things. This script writes two small
fixture dirs with EXACTLY the testdata schemas (arrow schemas are read
from /root/testdata/sf0.001 and every table is cast to them):

* ``tests/fixtures/adv_sf``  — every table seeded with the hostile
  shapes a production pipeline actually sees: NULLs in every nullable
  column, empty/whitespace/unicode/emoji text, malformed JSON props,
  duplicate and near-duplicate documents, zero-norm and duplicate
  embeddings, rounding knife-edges (x.xx5 cents), timestamp ties and
  midnight boundaries, dangling foreign keys, customers without
  orders, orders without lineitems — plus a block of ordinary rows so
  aggregates stay non-degenerate.
* ``tests/fixtures/empty_sf`` — the same ten tables with ZERO rows
  (the empty-partition day every scheduled pipeline eventually reads).

Both are inputs to ``scripts/dtype_audit.py <dir>``: every oracled
query must produce the same canonical frame on Spark and DuckDB on
hostile data too, and must not crash on empty tables. Deterministic —
no wall clock, fixed seed; safe to regenerate (output is committed).

Run: python scripts/make_adversarial_sf.py [out_root]
"""

from __future__ import annotations

import datetime as dt
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REF_SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _ref_schema(table: str) -> pa.Schema:
    return pq.read_schema(os.path.join(REF_SF, f"{table}.parquet"))


def _write(out_dir: str, table: str, cols: dict[str, list]) -> None:
    schema = _ref_schema(table)
    n = len(next(iter(cols.values()))) if cols else 0
    assert set(cols) == set(schema.names), (table, set(cols) ^ set(schema.names))
    arrays = [pa.array(cols[f.name], type=f.type) for f in schema]
    pq.write_table(
        pa.Table.from_arrays(arrays, schema=schema),
        os.path.join(out_dir, f"{table}.parquet"),
    )
    assert all(len(v) == n for v in cols.values()), table


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# --------------------------------------------------------------- events
def _events() -> dict[str, list]:
    rng = random.Random(1234)
    rows: list[tuple] = []
    eid = 0

    def add(ts, user, etype, value, props):
        nonlocal eid
        rows.append((eid, ts, user, etype, value, props))
        eid += 1

    # ordinary block: 5 users x 3 days, all five event types, so daily
    # KPIs / funnels / retention have real mass
    types = ["view", "click", "purchase", "signup", "error"]
    for day in (1, 2, 15):
        for u in range(1, 6):
            for k in range(6):
                t = _ts(f"2024-01-{day:02d} 08:00:00") + dt.timedelta(
                    minutes=7 * k + u, seconds=u * k
                )
                add(
                    t,
                    u,
                    types[(u + k) % 5],
                    round(rng.uniform(1, 300), 2),
                    '{"k": %d}' % rng.randrange(100),
                )

    # NULL in every nullable column, one at a time and in combination
    add(_ts("2024-01-01 10:00:00"), None, "view", 10.0, '{"k": 1}')
    add(_ts("2024-01-01 10:01:00"), None, "purchase", 25.5, '{"k": 2}')
    add(_ts("2024-01-01 10:02:00"), 7, None, 11.0, '{"k": 3}')
    add(_ts("2024-01-01 10:03:00"), 7, "purchase", None, '{"k": 4}')
    add(_ts("2024-01-01 10:04:00"), 7, "view", 12.0, None)
    add(None, 7, "purchase", 13.0, '{"k": 5}')
    add(None, None, None, None, None)
    # NULL-ts VIEW for a user with purchases: DuckDB's native ASOF
    # sorts NULL timestamps last and would match it to the LATEST
    # purchase; the no-match semantics must hold on both engines
    # (found by the cross-engine fuzz, pinned here)
    add(None, 7, "view", 14.0, '{"k": 6}')

    # malformed / hostile JSON props
    for i, p in enumerate(
        [
            "",
            "{",
            "not json",
            "[]",
            "[1,2]",
            "{}",
            '{"k": null}',
            '{"k": "str"}',
            '{"k": 1, "k": 2}',
            '{"K": 3}',
            '{"k": {"nested": [1, {"deep": true}]}}',
            '{"k": 1e308}',
            '{"other": 9}',
        ]
    ):
        add(_ts("2024-01-02 09:00:00") + dt.timedelta(minutes=i), 8, "view", 1.0, p)

    # rounding knife-edges: values whose cents sit exactly on .5
    for i, v in enumerate([2.675, 0.125, 1.005, 0.005, -2.675, 1e6 + 0.005]):
        add(
            _ts("2024-01-02 12:00:00") + dt.timedelta(minutes=i),
            9,
            "purchase",
            v,
            '{"k": 9}',
        )
    # negative / zero / extreme values
    for i, v in enumerate([-50.0, 0.0, 1e-9, 987654.32]):
        add(
            _ts("2024-01-02 13:00:00") + dt.timedelta(minutes=i),
            9,
            "purchase",
            v,
            '{"k": 9}',
        )

    # timestamp boundaries and ties
    add(_ts("2024-01-15 00:00:00"), 10, "view", 5.0, '{"k": 0}')
    add(_ts("2024-01-15 23:59:59.999999"), 10, "view", 5.0, '{"k": 0}')
    add(_ts("2024-01-15 12:00:00"), 10, "click", 5.0, '{"k": 0}')
    add(_ts("2024-01-15 12:00:00"), 10, "click", 6.0, '{"k": 1}')  # exact tie
    add(_ts("2024-01-15 12:00:00"), 11, "click", 7.0, '{"k": 2}')

    # a session-gap knife-edge: consecutive events exactly 30 min apart
    t0 = _ts("2024-01-03 00:00:00")
    for k in range(4):
        add(t0 + dt.timedelta(minutes=30 * k), 12, "view", 1.0, '{"k": 1}')
    # and one 30 min + 1 us after (must break the session)
    add(
        t0 + dt.timedelta(minutes=120, microseconds=1),
        12,
        "view",
        1.0,
        '{"k": 1}',
    )

    # hot user: one user owns a large slice of a day
    for k in range(60):
        add(
            _ts("2024-01-04 06:00:00") + dt.timedelta(seconds=90 * k),
            13,
            types[k % 5],
            round(1.0 + 0.01 * k, 2),
            '{"k": %d}' % k,
        )

    # unusual event_type spellings (classifier must not match these)
    for i, et in enumerate(["PURCHASE", "Purchase", " purchase", "weird", ""]):
        add(
            _ts("2024-01-05 10:00:00") + dt.timedelta(minutes=i),
            14,
            et,
            3.0,
            '{"k": 1}',
        )

    # negative user id; user seen on one day only
    add(_ts("2024-01-06 10:00:00"), -5, "view", 2.0, '{"k": 1}')
    add(_ts("2024-01-06 11:00:00"), 999, "signup", None, '{"k": 1}')

    # numeric-edge props: BIGINT overflow (try_cast must yield NULL on
    # both engines), leading zeros, large-but-valid
    for i, p in enumerate(
        [
            '{"k": 99999999999999999999}',
            '{"k": -99999999999999999999}',
            '{"k": 007}',
            '{"k": 1234567890123}',
            '{"k": -0}',
        ]
    ):
        add(_ts("2024-01-07 09:00:00") + dt.timedelta(minutes=i), 15, "view", 1.0, p)

    cols = {k: [] for k in ("event_id", "ts", "user_id", "event_type", "value", "props")}
    for r in rows:
        for k, v in zip(cols, r):
            cols[k].append(v)
    return cols


# ------------------------------------------------------------ documents
def _documents() -> dict[str, list]:
    rng = random.Random(99)
    vocab = (
        "the fast key order sort table scan merge part window small hash "
        "join batch spark group query row data slow filter customer line "
        "value stream big agg column"
    ).split()
    texts: list[tuple] = []  # (text, lang, source)

    def sent(n, seed):
        r = random.Random(seed)
        return " ".join(r.choice(vocab) for _ in range(n))

    # ordinary block
    for i in range(30):
        texts.append(
            (sent(40 + i % 25, seed=i), ["en", "es", "de", "fr", "zh"][i % 5],
             f"src{i % 6}")
        )
    # exact duplicate group (x3) and a pair
    dup = sent(60, seed=7001)
    texts += [(dup, "en", "src0"), (dup, "en", "src1"), (dup, "de", "src2")]
    pair = sent(45, seed=7002)
    texts += [(pair, "fr", "src3"), (pair, "fr", "src3")]
    # near-duplicates: one token changed / one appended
    base = sent(50, seed=7003)
    texts += [
        (base, "en", "src4"),
        (base.replace("the", "a", 1), "en", "src4"),
        (base + " extra", "en", "src5"),
    ]
    # degenerate text shapes
    texts += [
        (None, "en", "src0"),
        ("", "en", "src0"),
        ("   ", "en", "src1"),
        ("\t\n \n", "en", "src1"),
        ("word", "en", "src2"),
        ("!!! ??? ...", "en", "src2"),
        ("12345 67890", "en", "src3"),
        ("spam " * 50, "en", "src3"),          # extreme repetition
        ("a " * 300, "en", "src4"),            # long, tiny tokens
        ("THE FAST KEY ORDER", "en", "src4"),  # upper-case
        ("MiXeD CaSe ToKeNs here", "en", "src5"),
        ("héllo wörld naïve café", "fr", "src5"),
        ("中文 文本 分析 中文", "zh", "src0"),
        ("emoji 😀 test 🚀 done", "en", "src1"),
        ("combining é mark", "en", "src2"),
        ("tab\tseparated\ttokens", "en", "src3"),
        ("trailing space ", "en", "src4"),
        (" leading space", "en", "src5"),
        ("double  space  gap", "en", "src0"),
    ]
    # PII-bearing text (the scrub/count regexes must agree across the
    # Java and RE2 dialects) and regex-metacharacter soup
    texts += [
        ("contact john.doe+spam@example.co.uk or 555-123-4567 now", "en", "src0"),
        ("server at 192.168.0.1 and bogus 999.999.999.999 octets", "en", "src1"),
        ("half@domain and @@not-an-email@ should not both match", "en", "src2"),
        ("path C:\\temp\\file.txt regex .* chars [a-z]+ (group)", "en", "src3"),
        ("two mails a@b.io c@d.org one phone 111-222-3333", "en", "src4"),
    ]
    # NULL metadata
    texts += [
        (sent(30, seed=7100), None, "src0"),
        (sent(30, seed=7101), "xx", "src1"),   # unknown lang
        (sent(30, seed=7102), "en", None),
        (sent(30, seed=7103), None, None),
        ("", None, None),
    ]
    cols = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for i, (t, lang, src) in enumerate(texts):
        cols["doc_id"].append(i)
        cols["text"].append(t)
        cols["lang"].append(lang)
        cols["source"].append(src)
        cols["n_chars"].append(None if t is None else len(t))
    return cols


# ----------------------------------------------------------- embeddings
def _embeddings() -> dict[str, list]:
    rng = random.Random(4321)
    dim = 64
    vecs: list[tuple] = []  # (embedding, label)

    def randv(seed, scale=0.4):
        r = random.Random(seed)
        return [round(r.uniform(-scale, scale), 6) for _ in range(dim)]

    for i in range(24):
        vecs.append((randv(i), i % 10))
    # exact duplicates (same vector, three ids, two labels)
    d = randv(9001)
    vecs += [(d, 1), (d, 1), (d, 2)]
    # near-duplicate: last component nudged by 1e-6
    nd = list(d)
    nd[-1] = round(nd[-1] + 1e-6, 7)
    vecs.append((nd, 1))
    # antipodal pair
    a = randv(9002)
    vecs += [(a, 3), ([-x for x in a], 3)]
    # zero vector (norm 0 — cosine must not crash or NaN-diverge)
    vecs.append(([0.0] * dim, 4))
    # one-hot, all-equal, large-magnitude, tiny-magnitude
    oh = [0.0] * dim
    oh[7] = 1.0
    vecs += [
        (oh, 5),
        ([0.1] * dim, 6),
        ([1000.0] * dim, 7),
        ([1e-30] * dim, 8),
    ]
    # negative-zero components (IEEE -0.0 must canonicalize identically
    # through norms/dots/digests on both engines)
    nz = randv(9004)
    nz[0], nz[1] = -0.0, 0.0
    vecs.append((nz, 9))
    # NULL label
    vecs.append((randv(9003), None))
    cols = {"vec_id": [], "embedding": [], "label": []}
    for i, (v, lab) in enumerate(vecs):
        cols["vec_id"].append(i)
        cols["embedding"].append(v)
        cols["label"].append(lab)
    return cols


# ------------------------------------------------------- TPC-H-ish side
def _region() -> dict[str, list]:
    names = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST", None]
    return {"r_regionkey": list(range(6)), "r_name": names}


def _nation() -> dict[str, list]:
    # 8 nations: one NULL name, one NULL region, one dangling region
    rows = [
        (0, "ALGERIA", 0), (1, "BRAZIL", 1), (2, "CHINA", 2),
        (3, "FRANCE", 3), (4, "EGYPT", 4), (5, None, 2),
        (6, "ORPHANIA", 99), (7, "NOWHERE", None),
    ]
    return {
        "n_nationkey": [r[0] for r in rows],
        "n_name": [r[1] for r in rows],
        "n_regionkey": [r[2] for r in rows],
    }


def _customer() -> dict[str, list]:
    segs = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]
    rng = random.Random(5)
    rows = []
    for i in range(20):
        rows.append(
            (i, f"Customer#{i:03d}", i % 5, round(rng.uniform(-500, 9000), 2),
             segs[i % 5])
        )
    rows += [
        (20, None, 0, 100.0, "BUILDING"),
        (21, "NullNation", None, 100.0, "BUILDING"),
        (22, "NullBal", 1, None, "MACHINERY"),
        (23, "NullSeg", 2, 0.0, None),
        (24, "WeirdSeg", 3, -0.005, "building"),
        (25, "Dangling", 99, 42.42, "HOUSEHOLD"),   # dangling nation fk
        (26, "Customer#003", 4, 9000.0, "FURNITURE"),  # duplicate name
        (27, "TieBal", 0, 100.0, "BUILDING"),       # acctbal tie w/ 20,21
        (28, "NoOrders", 1, 5000.0, "AUTOMOBILE"),  # never referenced
    ]
    return {
        "c_custkey": [r[0] for r in rows],
        "c_name": [r[1] for r in rows],
        "c_nationkey": [r[2] for r in rows],
        "c_acctbal": [r[3] for r in rows],
        "c_mktsegment": [r[4] for r in rows],
    }


def _supplier() -> dict[str, list]:
    rng = random.Random(6)
    rows = [
        (i, f"Supplier#{i:03d}", i % 5, round(rng.uniform(-100, 5000), 2))
        for i in range(12)
    ]
    rows += [
        (12, None, 0, 10.0),
        (13, "NullNation", None, 10.0),
        (14, "NullBal", 2, None),
        (15, "Dangling", 99, 7.0),
        (16, "TieBal", 3, 10.0),
    ]
    return {
        "s_suppkey": [r[0] for r in rows],
        "s_name": [r[1] for r in rows],
        "s_nationkey": [r[2] for r in rows],
        "s_acctbal": [r[3] for r in rows],
    }


def _part() -> dict[str, list]:
    brands = ["Brand#11", "Brand#22", "Brand#33"]
    types = ["ECONOMY BRASS", "STANDARD COPPER", "PROMO STEEL", "SMALL TIN"]
    rng = random.Random(7)
    rows = []
    for i in range(20):
        rows.append(
            (i, f"part {i}", brands[i % 3], types[i % 4], 1 + i % 50,
             round(rng.uniform(100, 2000), 2))
        )
    rows += [
        (20, None, "Brand#11", "ECONOMY BRASS", 5, 500.0),
        (21, "nullbrand", None, "PROMO STEEL", 5, 500.0),
        (22, "nulltype", "Brand#22", None, 5, 500.0),
        (23, "nullsize", "Brand#33", "SMALL TIN", None, 500.0),
        (24, "zerosize", "Brand#11", "SMALL TIN", 0, 500.0),
        (25, "nullprice", "Brand#22", "ECONOMY BRASS", 10, None),
        (26, "tieprice", "Brand#33", "PROMO STEEL", 10, 500.0),
        (27, "negprice", "Brand#11", "STANDARD COPPER", 10, -1.0),
    ]
    return {
        "p_partkey": [r[0] for r in rows],
        "p_name": [r[1] for r in rows],
        "p_brand": [r[2] for r in rows],
        "p_type": [r[3] for r in rows],
        "p_size": [r[4] for r in rows],
        "p_retailprice": [r[5] for r in rows],
    }


def _orders() -> dict[str, list]:
    pri = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    rng = random.Random(8)
    rows = []
    for i in range(40):
        d = _ts("1995-06-01") + dt.timedelta(days=rng.randrange(0, 2000))
        rows.append(
            (i, i % 20, "OF"[i % 2], round(rng.uniform(1000, 300000), 2), d,
             pri[i % 5])
        )
    rows += [
        (40, None, "O", 100.0, _ts("1996-05-05"), "2-HIGH"),     # null cust
        (41, 99, "O", 100.0, _ts("1996-05-06"), "2-HIGH"),       # dangling
        (42, 3, None, 100.0, _ts("1996-05-07"), "2-HIGH"),       # null status
        (43, 3, "X", 100.0, _ts("1996-05-08"), "2-HIGH"),        # odd status
        (44, 4, "O", None, _ts("1996-05-09"), "2-HIGH"),         # null price
        (45, 4, "O", 100.0, None, "2-HIGH"),                     # null date
        (46, 5, "O", 100.0, _ts("1996-05-10"), None),            # null pri
        (47, 5, "O", 100.0, _ts("1996-01-01"), "5-LOW"),         # boundary
        (48, 6, "F", 100.0, _ts("1995-12-31 23:59:59"), "5-LOW"),
        (49, 6, "O", 100.0, _ts("1996-05-10"), "1-URGENT"),      # no items
    ]
    return {
        "o_orderkey": [r[0] for r in rows],
        "o_custkey": [r[1] for r in rows],
        "o_orderstatus": [r[2] for r in rows],
        "o_totalprice": [r[3] for r in rows],
        "o_orderdate": [r[4] for r in rows],
        "o_orderpriority": [r[5] for r in rows],
    }


def _lineitem() -> dict[str, list]:
    rng = random.Random(9)
    rows = []
    for ok in range(40):
        for ln in range(1, 1 + (ok % 3) + 1):
            ship = _ts("1995-06-15") + dt.timedelta(days=rng.randrange(0, 2000))
            rows.append(
                (ok, (ok + ln) % 20, (ok + ln) % 12, ln,
                 float(1 + (ok + ln) % 50),
                 round(rng.uniform(900, 90000), 2),
                 round(rng.choice([0.0, 0.02, 0.05, 0.08, 0.1]), 2),
                 round(rng.choice([0.0, 0.03, 0.06]), 2),
                 "RAN"[ok % 3], "OF"[ok % 2], ship)
            )
    rows += [
        # NULLs, one column at a time
        (42, None, 1, 9, 1.0, 100.0, 0.0, 0.0, "N", "O", _ts("1996-06-01")),
        (42, 1, None, 10, 1.0, 100.0, 0.0, 0.0, "N", "O", _ts("1996-06-02")),
        (43, 1, 1, 9, None, 100.0, 0.0, 0.0, "N", "O", _ts("1996-06-03")),
        (43, 1, 1, 10, 1.0, None, 0.0, 0.0, "N", "O", _ts("1996-06-04")),
        (44, 2, 2, 9, 1.0, 100.0, None, 0.0, "N", "O", _ts("1996-06-05")),
        (44, 2, 2, 10, 1.0, 100.0, 0.0, None, "N", "O", _ts("1996-06-06")),
        (45, 2, 2, 9, 1.0, 100.0, 0.0, 0.0, None, "O", _ts("1996-06-07")),
        (45, 2, 2, 10, 1.0, 100.0, 0.0, 0.0, "N", None, _ts("1996-06-08")),
        (46, 3, 3, 9, 1.0, 100.0, 0.0, 0.0, "N", "O", None),
        # discount boundaries 0 and 1; quantity 0; negative price
        (46, 3, 3, 10, 0.0, 100.0, 1.0, 0.0, "A", "F", _ts("1996-06-09")),
        (47, 3, 3, 9, 5.0, -100.0, 0.0, 0.06, "R", "F", _ts("1996-06-10")),
        # the q1-style shipdate boundary and rounding knife-edge price
        (47, 4, 4, 10, 2.0, 1000.005, 0.05, 0.03, "A", "F", _ts("1998-09-02")),
        (48, 4, 4, 9, 2.0, 1000.015, 0.05, 0.03, "A", "F", _ts("1996-01-01")),
    ]
    return {
        "l_orderkey": [r[0] for r in rows],
        "l_partkey": [r[1] for r in rows],
        "l_suppkey": [r[2] for r in rows],
        "l_linenumber": [r[3] for r in rows],
        "l_quantity": [r[4] for r in rows],
        "l_extendedprice": [r[5] for r in rows],
        "l_discount": [r[6] for r in rows],
        "l_tax": [r[7] for r in rows],
        "l_returnflag": [r[8] for r in rows],
        "l_linestatus": [r[9] for r in rows],
        "l_shipdate": [r[10] for r in rows],
    }


BUILDERS = {
    "region": _region,
    "nation": _nation,
    "customer": _customer,
    "supplier": _supplier,
    "part": _part,
    "orders": _orders,
    "lineitem": _lineitem,
    "events": _events,
    "documents": _documents,
    "embeddings": _embeddings,
}


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures",
    )
    adv, empty = os.path.join(root, "adv_sf"), os.path.join(root, "empty_sf")
    os.makedirs(adv, exist_ok=True)
    os.makedirs(empty, exist_ok=True)
    for t in TABLES:
        cols = BUILDERS[t]()
        _write(adv, t, cols)
        _write(empty, t, {k: [] for k in cols})
        n = len(next(iter(cols.values())))
        print(f"{t}: adv={n} rows, empty=0")
    return 0


if __name__ == "__main__":
    sys.exit(main())
