"""Build the local sf1.0-scale measurement replica (optimization round).

The driver's round-end bench can escalate to a driver-generated sf1.0
(BENCH_r08: ``"sf": 1.0``), but /root/testdata is read-only and only ships
sf ≤ 0.1 — so optimization A/Bs at the driver's scale need a local stand-in.
This tool replicates every sf0.1 table N× (default 10×) with CONSISTENT
key offsets (each replica's foreign keys point at its own replica of the
dimension), preserving join fan-outs and per-key densities of sf0.1:

  documents.doc_id            += i * 5 000
  orders.o_orderkey/custkey   += i * 150 000 / 15 000 (customer offset)
  customer.c_custkey          += i * 15 000
  events.event_id/user_id     += i * 100 000 / (max_user+1)
  embeddings.vec_id           += i * 2 000
  lineitem keys               += orders/part/supplier offsets
  part/supplier keys          += i * 20 000 / 1 000
  nation/region               copied (fixed dimensions)

Caveat recorded in OPTIMIZATION_r09.md: the driver's own sf1.0 keeps the
sf0.1 USER range (~670 events/user vs this replica's ~67), so j3-style
band densities must additionally be checked with ``user_id % <sf0.1
user count>`` variants. Pure pyarrow — no Spark session needed.

Usage: python make_replica.py [--src /root/testdata/sf0.1] [--dst /root/sfbig/sf1.0] [--copies 10]
"""
from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _offset_col(tbl: pa.Table, name: str, delta: int) -> pa.Table:
    idx = tbl.schema.get_field_index(name)
    col = tbl.column(idx)
    shifted = pc.add(col, pa.scalar(delta, type=col.type))
    return tbl.set_column(idx, tbl.schema.field(idx), shifted)


def replicate(src: str, dst: str, copies: int) -> None:
    os.makedirs(dst, exist_ok=True)
    base = {t: pq.read_table(os.path.join(src, f"{t}.parquet")) for t in (
        "documents", "orders", "customer", "events", "embeddings",
        "lineitem", "nation", "region", "supplier", "part",
    )}
    n_users = pc.max(base["events"].column("user_id")).as_py() + 1
    offsets = {
        "documents": {"doc_id": 5_000},
        "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
        "customer": {"c_custkey": 15_000},
        "events": {"event_id": 100_000, "user_id": n_users},
        "embeddings": {"vec_id": 2_000},
        "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
        "part": {"p_partkey": 20_000},
        "supplier": {"s_suppkey": 1_000},
        "nation": {},
        "region": {},
    }
    for t, tbl in base.items():
        offs = offsets[t]
        if not offs:
            out = tbl
        else:
            parts = []
            for i in range(copies):
                rep = tbl
                for col, unit in offs.items():
                    if i:
                        rep = _offset_col(rep, col, i * unit)
                parts.append(rep)
            out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(dst, f"{t}.parquet"))
        print(f"{t}: {tbl.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/sfbig/sf1.0")
    ap.add_argument("--copies", type=int, default=10)
    a = ap.parse_args()
    replicate(a.src, a.dst, a.copies)
