"""Hostile-fixture generator (VERDICT r03 item #5).

The five round-2 ADVICE bugs shared one shape: correct on the benign
driver fixture, divergent on legal-but-absent data. This tool writes a
small adversarial parquet set — schema-identical to /root/testdata —
that makes that absent data present:

- NULL-dense payload columns (text/lang/source/value/props/acctbal/
  names/label; keys and event/order timestamps stay non-null — they are
  the tables' identity, and a NULL there is a different CONTRACT, not a
  dirty value).
- Multi-byte UTF-8: emoji, CJK, combining accents, RTL, zero-width
  joiners — in document text, names, and JSON props.
- Year-boundary timestamps (Dec 29 – Jan 3, plus a Feb-29 leap day):
  ISO-week and truncation rules diverge across engines exactly here.
- Zero-variance groups (constant value per group), single-row groups,
  and timestamp TIES within a user (deterministic tie-breaks or bust).
- Exact-duplicate and near-duplicate documents, empty and whitespace
  text, invalid JSON props.
- Zero vectors and exact-duplicate vectors in embeddings (0/0 cosine).
- A sibling `empty/` dir with the same schemas and ZERO rows everywhere.

Deterministic: pure table literals + a tiny LCG, no RNG state. Output:
<repo>/testdata_hostile/{hostile,empty}/<table>.parquet, consumed by
`python tools/check.py --sf testdata_hostile/hostile` and the
tests/test_hostile_sweep.py gate.

Usage: python tools/make_hostile.py
"""

from __future__ import annotations

from datetime import datetime, timedelta
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

OUT = Path(__file__).resolve().parent.parent / "testdata_hostile"


def _lcg(seed: int):
    s = seed
    while True:
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        yield s


_EMOJI = "🦜🌊🚀✨🎉🧪"
_CJK = "数据处理引擎一百太字节规模测试"
_COMBINING = "éäô"  # é ä ô via combining marks
_RTL = "البيانات"  # Arabic "data"
_ZWJ = "👩‍💻"  # woman technologist (ZWJ sequence)


def _hostile_texts() -> list[str | None]:
    base = [
        # exact duplicates (dedup must cluster them)
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",
        # near-duplicate (one token changed)
        "the quick brown fox leaps over the lazy dog",
        # emoji-dense
        f"launch day {_EMOJI} metrics look great {_EMOJI}",
        # pure CJK (no ASCII word tokens at all)
        _CJK,
        # mixed CJK + ascii
        f"spark {_CJK} engine",
        # combining marks + RTL + ZWJ
        f"caf{_COMBINING} {_RTL} {_ZWJ} done",
        # empty and whitespace-only
        "",
        "   \t  \n ",
        # single char, single emoji
        "x",
        "🦜",
        # very repetitive (repetition/entropy filters)
        "spam " * 50,
        # long-ish normal text with year-boundary dates inside
        "report for 2019-12-31 and 2020-01-01 totals nominal",
        # null bytes are illegal in parquet UTF-8; use control-ish chars
        "line1\nline2\ttabbed\rcarriage",
        # digits + punctuation only (zero stopwords, zero letters)
        "1234567890 !!! ??? ... 42",
        # uppercase shouting
        "THIS IS ALL CAPS SHOUTING TEXT",
    ]
    out: list[str | None] = []
    for i in range(60):
        if i % 7 == 3:
            out.append(None)  # NULL-dense text
        else:
            out.append(base[i % len(base)])
    return out


def build_hostile(out_dir: Path) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    g = _lcg(42)

    region = {
        "r_regionkey": pa.array([0, 1, 2], pa.int32()),
        "r_name": pa.array(["ASIA", None, f"EU{_EMOJI[0]}"], pa.string()),
    }
    _write(out_dir, "region", region)

    nation = {
        "n_nationkey": pa.array(list(range(6)), pa.int32()),
        "n_name": pa.array(["CHINA", "中国", None, "FRANCE", "Françé", "X"], pa.string()),
        "n_regionkey": pa.array([0, 0, 1, 1, 2, 2], pa.int32()),
    }
    _write(out_dir, "nation", nation)

    n_cust = 40
    segs = ["BUILDING", "AUTOMOBILE", None, "MACHINERY"]
    customer = {
        "c_custkey": pa.array(list(range(1, n_cust + 1)), pa.int64()),
        "c_name": pa.array(
            [
                None if i % 9 == 4 else f"Customer{_ZWJ}#{i}" if i % 5 == 0 else f"Customer#{i}"
                for i in range(1, n_cust + 1)
            ],
            pa.string(),
        ),
        "c_nationkey": pa.array([i % 6 for i in range(n_cust)], pa.int32()),
        # zero-variance balances for one nation; NULLs sprinkled; a
        # negative and an exact-zero balance
        "c_acctbal": pa.array(
            [
                None if i % 11 == 7 else 100.0 if i % 6 == 0 else (-50.25 if i % 13 == 2 else 0.0 if i % 17 == 3 else float((next(g) % 100000)) / 100.0)
                for i in range(n_cust)
            ],
            pa.float64(),
        ),
        "c_mktsegment": pa.array([segs[i % len(segs)] for i in range(n_cust)], pa.string()),
    }
    _write(out_dir, "customer", customer)

    supplier = {
        "s_suppkey": pa.array(list(range(1, 11)), pa.int64()),
        "s_name": pa.array([f"Supplier#{i}" if i % 3 else None for i in range(1, 11)], pa.string()),
        "s_nationkey": pa.array([i % 6 for i in range(10)], pa.int32()),
        "s_acctbal": pa.array([0.0] * 5 + [None, 1.5, -2.5, 3.5, 4.5], pa.float64()),
    }
    _write(out_dir, "supplier", supplier)

    n_part = 30
    part = {
        "p_partkey": pa.array(list(range(1, n_part + 1)), pa.int64()),
        "p_name": pa.array(
            [f"part {_CJK[i % len(_CJK)]} {i}" if i % 4 == 0 else f"plain part {i}" for i in range(1, n_part + 1)],
            pa.string(),
        ),
        "p_brand": pa.array([None if i % 10 == 5 else f"Brand#{i % 3}" for i in range(n_part)], pa.string()),
        "p_type": pa.array([f"TYPE {i % 4}" for i in range(n_part)], pa.string()),
        "p_size": pa.array([0 if i % 8 == 0 else i % 50 for i in range(n_part)], pa.int32()),
        "p_retailprice": pa.array(
            [None if i % 12 == 6 else 10.0 for i in range(n_part)], pa.float64()
        ),  # zero-variance price column
    }
    _write(out_dir, "part", part)

    # orders: every date in Dec 29 - Jan 3 (two year boundaries) plus a
    # leap day; one customer with ALL orders, several with exactly one;
    # zero-variance totalprice within status 'F'
    n_ord = 120
    boundary = [datetime(2019, 12, 29) + timedelta(days=d) for d in range(6)]
    boundary += [datetime(2020, 12, 29) + timedelta(days=d) for d in range(6)]
    boundary.append(datetime(2020, 2, 29))
    statuses = ["O", "F", "P"]
    orders = {
        "o_orderkey": pa.array(list(range(1, n_ord + 1)), pa.int64()),
        "o_custkey": pa.array(
            [1 if i % 3 == 0 else (i % n_cust) + 1 for i in range(n_ord)], pa.int64()
        ),
        "o_orderstatus": pa.array([statuses[i % 3] for i in range(n_ord)], pa.string()),
        "o_totalprice": pa.array(
            [
                None if i % 19 == 11 else (500.0 if statuses[i % 3] == "F" else float(next(g) % 900000) / 100.0)
                for i in range(n_ord)
            ],
            pa.float64(),
        ),
        "o_orderdate": pa.array(
            [boundary[i % len(boundary)] for i in range(n_ord)], pa.timestamp("us")
        ),
        "o_orderpriority": pa.array(
            [None if i % 15 == 9 else f"{(i % 5) + 1}-PRIO" for i in range(n_ord)], pa.string()
        ),
    }
    _write(out_dir, "orders", orders)

    # lineitem: ship dates straddle the boundary; one order with 7 lines
    # of the SAME part (tie-dense); quantities include 0; discount hits
    # the legal extremes 0 and 1 (1 - discount == 0 divisors)
    n_li = 400
    lineitem = {
        "l_orderkey": pa.array([(i % n_ord) + 1 for i in range(n_li)], pa.int64()),
        "l_partkey": pa.array(
            [1 if i % 10 < 3 else (i % n_part) + 1 for i in range(n_li)], pa.int64()
        ),
        "l_suppkey": pa.array([(i % 10) + 1 for i in range(n_li)], pa.int64()),
        "l_linenumber": pa.array([(i % 7) + 1 for i in range(n_li)], pa.int32()),
        "l_quantity": pa.array(
            [0.0 if i % 16 == 0 else float((i % 50) + 1) for i in range(n_li)], pa.float64()
        ),
        "l_extendedprice": pa.array(
            [0.0 if i % 23 == 0 else float(next(g) % 500000) / 100.0 for i in range(n_li)],
            pa.float64(),
        ),
        "l_discount": pa.array(
            [1.0 if i % 29 == 0 else 0.0 if i % 5 == 0 else 0.05 for i in range(n_li)],
            pa.float64(),
        ),
        "l_tax": pa.array([0.0 if i % 3 else 0.08 for i in range(n_li)], pa.float64()),
        "l_returnflag": pa.array(["R" if i % 4 == 0 else "N" for i in range(n_li)], pa.string()),
        "l_linestatus": pa.array(["O" if i % 2 else "F" for i in range(n_li)], pa.string()),
        "l_shipdate": pa.array(
            [boundary[i % len(boundary)] + timedelta(hours=i % 24) for i in range(n_li)],
            pa.timestamp("us"),
        ),
    }
    _write(out_dir, "lineitem", lineitem)

    # events: year-boundary timestamps with exact TIES (same user, same
    # ts, different event_id), a single-event user, a user whose value is
    # CONSTANT (zero variance), one event_type that only one user emits,
    # NULL value/props, unicode + invalid JSON props
    n_ev = 500
    types = ["click", "view", "purchase", "error", "登录"]
    props_pool = [
        '{"k": "v"}',
        '{"emoji": "🦜", "n": 1}',
        '{"nested": {"deep": [1, 2, 3]}}',
        "not json at all {",
        "",
        '{"rtl": "' + _RTL + '"}',
        None,
        '{"num": 1e309}',  # overflows double on parse
    ]
    ts0 = datetime(2019, 12, 31, 22, 0, 0)
    ev_ts = []
    ev_user = []
    for i in range(n_ev):
        if i < 10:  # ten-way tie on (user 1, exact same microsecond)
            ev_ts.append(datetime(2020, 1, 1, 0, 0, 0))
            ev_user.append(1)
        elif i == 10:  # the single-event user
            ev_ts.append(datetime(2020, 6, 15, 12, 0, 0))
            ev_user.append(99)
        else:
            ev_ts.append(ts0 + timedelta(minutes=(i * 7) % (6 * 24 * 60)))
            ev_user.append((i % 12) + 1)
    events = {
        "event_id": pa.array(list(range(1, n_ev + 1)), pa.int64()),
        "ts": pa.array(ev_ts, pa.timestamp("us")),
        "user_id": pa.array(ev_user, pa.int64()),
        "event_type": pa.array(
            ["solo_type" if ev_user[i] == 99 else types[i % 4 if ev_user[i] != 2 else 4] for i in range(n_ev)],
            pa.string(),
        ),
        # user 3: constant value 7.5 (zero variance); NULLs elsewhere
        "value": pa.array(
            [
                7.5 if ev_user[i] == 3 else (None if i % 13 == 8 else float(next(g) % 10000) / 100.0)
                for i in range(n_ev)
            ],
            pa.float64(),
        ),
        "props": pa.array([props_pool[i % len(props_pool)] for i in range(n_ev)], pa.string()),
    }
    _write(out_dir, "events", events)

    texts = _hostile_texts()
    langs = ["en", "zh", None, "ar", "unknown"]
    documents = {
        "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([langs[i % len(langs)] for i in range(len(texts))], pa.string()),
        "source": pa.array(
            [None if i % 8 == 5 else ["web", "books", "code"][i % 3] for i in range(len(texts))],
            pa.string(),
        ),
        "n_chars": pa.array([len(t) if t is not None else 0 for t in texts], pa.int64()),
    }
    _write(out_dir, "documents", documents)

    # embeddings: dim 8; two ZERO vectors (0/0 cosine), two exact
    # duplicates, one pair differing in the last ulp-ish element, NULL
    # labels
    dim = 8
    vecs: list[list[float]] = []
    for i in range(40):
        if i in (5, 17):
            vecs.append([0.0] * dim)
        elif i == 7:
            vecs.append(vecs[6][:])  # exact duplicate of vec 6
        elif i == 9:
            v = vecs[8][:]
            v[-1] += 1e-7
            vecs.append(v)
        else:
            vecs.append(
                [((next(g) % 2001) - 1000) / 1000.0 for _ in range(dim)]
            )
    embeddings = {
        "vec_id": pa.array(list(range(len(vecs))), pa.int64()),
        "embedding": pa.array([[float(x) for x in v] for v in vecs], pa.list_(pa.float32())),
        "label": pa.array([None if i % 10 == 9 else i % 4 for i in range(len(vecs))], pa.int32()),
    }
    _write(out_dir, "embeddings", embeddings)


def build_empty(out_dir: Path) -> None:
    """Same schemas, zero rows — every oracled query must agree with its
    oracle on emptiness (both produce 0 rows or the same constant row)."""
    out_dir.mkdir(parents=True, exist_ok=True)
    src = Path("/root/testdata/sf0.001")
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        schema = pq.read_schema(src / f"{t}.parquet")
        # strip pandas metadata; keep logical types exact
        schema = pa.schema([schema.field(i) for i in range(len(schema.names))])
        table = pa.table({f.name: pa.array([], f.type) for f in schema})
        pq.write_table(table, out_dir / f"{t}.parquet")


def _write(out_dir: Path, name: str, cols: dict) -> None:
    pq.write_table(pa.table(cols), out_dir / f"{name}.parquet")


if __name__ == "__main__":
    build_hostile(OUT / "hostile")
    build_empty(OUT / "empty")
    print(f"wrote {OUT}/hostile and {OUT}/empty")
